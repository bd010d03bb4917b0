"""Benchmark harness — the driver's per-round performance probe.

Builds the fulltext index end-to-end over ``$SPARK_GRAFT_SF_DIR``'s
documents (fresh every run — build throughput is metric #1), then times
the reference query set against the warm index (metric #2), plus the
headline training-data ops. Prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "build_docs_per_sec": ...,
     "query_p50_s": ..., "query_p95_s": ..., "runs": {...}, ...}

Every timed item is min-of-3 WITHIN one invocation (build included),
with the raw runs reported under "runs" — the host's ±15–25% noise
waves made single-shot snapshots read as phantom regressions.

Scaling protocol (BASELINE.md row 5): run this twice on the same input —
``SPARK_GRAFT_CPUS=8`` then ``SPARK_GRAFT_CPUS=32`` — and compare
``build_docs_per_sec``; efficiency = thr32 / (4 × thr8).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time


sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts")
)
from benchlib import REFERENCE_QUERY_SET as QUERY_SET  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    import re as _re

    _m = _re.search(r"sf(\d+(?:\.\d+)?)",
                    os.path.basename(sf_dir.rstrip("/")))
    sf = float(_m.group(1)) if _m else 0.1  # label only — never crash

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from groonga_spark.build import build_index
    from groonga_spark.search import FulltextIndex
    from groonga_spark.session import get_spark, warm_up

    spark = get_spark(
        "groonga_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    warm_up(spark)

    t_start = time.time()
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()

    idx_path = tempfile.mkdtemp(prefix="gs_bench_idx_")
    timings: dict[str, float] = {}
    # every run of every timed item, for the record: the host's
    # documented ±15–25% noise waves made single-shot snapshots
    # manufacture phantom regressions round after round — min-of-N in
    # ONE invocation is the fix, and reporting the raw runs lets the
    # next reader judge the spread.
    runs: dict[str, list[float]] = {}

    def timeit(name: str, fn, n: int = 3) -> float:
        rs = []
        for _ in range(n):
            t0 = time.time()
            fn()
            rs.append(round(time.time() - t0, 4))
        runs[name] = rs
        best = min(rs)
        timings[name] = round(best, 3)
        return best

    try:
        # ---- metric 1: end-to-end index build ----
        t0 = time.time()
        meta = build_index(spark, docs, idx_path, mode="delimit",
                           resume=False)
        build_s = time.time() - t0
        timings["index_build"] = round(build_s, 3)
        runs["index_build"] = [round(build_s, 4)]
        # two warm rebuilds (resume=False rebuilds from scratch; the
        # corpus/JVM are warm): min-of-3 for the headline build number
        for _ in range(2):
            shutil.rmtree(idx_path, ignore_errors=True)
            t0 = time.time()
            meta = build_index(spark, docs, idx_path, mode="delimit",
                               resume=False)
            runs["index_build"].append(round(time.time() - t0, 4))
        build_s = min(runs["index_build"])
        timings["index_build"] = round(build_s, 3)

        # ---- metric 2: BM25 top-10 latency, warm index ----
        idx = FulltextIndex(spark, idx_path)
        idx.search("table", k=10).collect()  # warm-up (plans, JIT, cache)
        q_times = []
        cached_times = []
        for name, q in QUERY_SET:
            # use_cache=False: measure the kernel, not the result cache
            # (reported separately below)
            q_times.append(timeit(
                name,
                lambda q=q: idx.search(q, k=10, use_cache=False).collect(),
            ))
            idx.search(q, k=10).collect()  # populate the result cache
            cached_times.append(timeit(
                f"{name}_cached",
                lambda q=q: idx.search(q, k=10).collect(),
            ))
            del timings[f"{name}_cached"]  # runs keep it; queries{} stays lean

        # ---- headline training-data ops ----
        from groonga_spark.dedup import minhash_lsh_pairs, simhash
        from groonga_spark.textstats import token_stats

        # aggregates must TOUCH the computed columns: a bare .count()
        # lets Catalyst prune every expression (the op would time a
        # zero-column scan — fixed in round 3, so token_stats/simhash
        # numbers are not comparable to earlier rounds' labels)
        timeit("token_stats", lambda: token_stats(docs).agg(
            F.sum("n_bpe_tokens"), F.count_distinct("fingerprint"),
            F.avg("quality"),
        ).collect())
        timeit("minhash_lsh", lambda: minhash_lsh_pairs(docs).count())
        timeit("simhash", lambda: simhash(docs).agg(
            F.count_distinct("simhash")).collect())

        emb_path = os.path.join(sf_dir, "embeddings.parquet")
        if os.path.exists(emb_path):
            from groonga_spark.similarity import cosine_topk

            emb = spark.read.parquet(emb_path)
            probe = [float(x) for x in emb.filter(F.col("vec_id") == 0)
                     .select("embedding").collect()[0][0]]
            timeit("embedding_topk",
                   lambda: cosine_topk(emb, probe, k=10,
                                       exclude_id=0).collect())

        total = time.time() - t_start
        out = {
            "metric": "index_build+bm25_topk+pipeline_ops",
            "value": round(total, 3),
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "n_docs": n_docs,
            "n_terms": meta["n_terms"],
            "postings_total": meta["postings_total"],
            "bytes_compressed": meta["bytes_compressed"],
            "build_s": round(build_s, 3),
            "build_docs_per_sec": round(n_docs / build_s, 1),
            "query_p50_s": round(statistics.median(q_times), 4),
            "query_p95_s": round(sorted(q_times)[
                max(0, -(-len(q_times) * 95 // 100) - 1)], 4),
            "query_cached_p50_s": round(statistics.median(cached_times), 4),
            "cpus": cpus,
            "runs_per_query": 3,
            "runs": runs,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(idx_path, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
