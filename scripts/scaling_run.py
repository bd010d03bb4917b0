"""spark-submit payload for the scaling protocol (BASELINE.md row 5).

Launched as ``spark-submit --master local[C] --py-files engine.zip
scripts/scaling_run.py <corpus_parquet> <cores> <out_json>``.
``groonga_spark`` is imported from the shipped zip — the same deployment
path a multi-executor cluster uses — NOT from the repo checkout.

Builds the full index end-to-end over the corpus, times it, runs the
reference query set against the warm index, and writes one JSON blob.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time


def main() -> None:
    corpus, cores, out_json = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(f"scaling_{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from groonga_spark.build import build_index  # from --py-files zip
    from groonga_spark.search import FulltextIndex
    from groonga_spark.session import warm_up

    docs = spark.read.parquet(corpus)
    n_docs = docs.count()
    warm_up(spark)

    idx_path = tempfile.mkdtemp(prefix=f"gs_scale_{cores}_")

    # phase attribution for the Amdahl analysis (BENCH.md): wrap the two
    # coarse phases of build_index — stage-1 segment jobs (the parallel
    # bulk) and finalize (lexicon dense ids + postings merge + doc_map,
    # with driver-side metadata ops) — so the ladder reports where the
    # serial fraction lives, not just the total
    import groonga_spark.build as _B

    phase = {}
    _orig_fin = _B.finalize_index
    _orig_ids = _B.assign_dense_ids

    def _timed_fin(*a, **kw):
        t0 = time.time()
        out = _orig_fin(*a, **kw)
        phase["finalize_s"] = round(time.time() - t0, 2)
        phase["finalize_phases"] = {
            k: round(v, 2) for k, v in _B.FINALIZE_PHASES.items()
        }
        return out

    def _timed_ids(*a, **kw):
        t0 = time.time()
        out = _orig_ids(*a, **kw)
        phase["lexicon_ids_s"] = round(
            phase.get("lexicon_ids_s", 0.0) + time.time() - t0, 2
        )
        return out

    _B.finalize_index = _timed_fin
    _B.assign_dense_ids = _timed_ids
    try:
        t0 = time.time()
        build_index(spark, docs, idx_path, mode="delimit", resume=False)
        build_s = time.time() - t0
        _B.finalize_index = _orig_fin
        _B.assign_dense_ids = _orig_ids

        idx = FulltextIndex(spark, idx_path)
        idx.search("table", k=10).collect()  # warm
        from benchlib import REFERENCE_QUERY_SET

        queries = [q for _name, q in REFERENCE_QUERY_SET]
        q_times = {}
        t0 = time.time()
        for q in queries:
            tq = time.time()
            idx.search(q, k=10).collect()
            q_times[q] = round(time.time() - tq, 3)
        query_total_s = time.time() - t0

        with open(out_json, "w") as f:
            json.dump(
                {
                    "cores": cores,
                    "n_docs": n_docs,
                    "build_s": round(build_s, 2),
                    "build_docs_per_sec": round(n_docs / build_s, 1),
                    "segments_s": round(
                        build_s - phase.get("finalize_s", 0.0), 2
                    ),
                    "finalize_s": phase.get("finalize_s"),
                    "finalize_phases": phase.get("finalize_phases"),
                    "lexicon_ids_s": phase.get("lexicon_ids_s"),
                    "query_total_s": round(query_total_s, 2),
                    "query_times": q_times,
                },
                f,
            )
    finally:
        shutil.rmtree(idx_path, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
