"""Scaling-efficiency protocol orchestrator (BASELINE.md row 5).

The north rule requires throughput scaling efficiency ≥ 0.8 between N
and 4N executors on the end-to-end index build. No real cluster exists
in this sandbox, so (per driver instruction) the SAME job runs at two
local parallelism levels on the SAME input, via the real deployment path
(``spark-submit --py-files engine.zip``).

Host caveat measured up front: this box reports 32 logical CPUs, but a
pure-CPU multiprocessing probe shows aggregate capacity ≈7.2× a single
core at 8 workers and only ≈2.9× more from 8→32 (SMT/throttling). Per
BASELINE.md, the honest N/4N pair is therefore local[2] vs local[8];
the 8→32 pair is also reported with that caveat.

Input: sf0.1 documents deterministically replicated REPL× (doc_id =
orig·REPL + r) so the build is compute-bound rather than
fixed-overhead-bound — the regime a real 100 TB build lives in.

Usage: python scripts/bench_scaling.py [--pairs 2,8[,32]] [--mult 200]
Writes BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_corpus(sf_dir: str, mult: int) -> tuple[str, int]:
    out = os.path.join(
        tempfile.gettempdir(), f"gs_scaling_corpus_{os.path.basename(sf_dir)}_{mult}"
    )
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out, corpus_count(out)
    from pyspark.sql import functions as F

    from groonga_spark.session import get_spark

    spark = get_spark("scaling_prep", master="local[8]", shuffle_partitions=8)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    big = (
        docs.crossJoin(spark.range(mult).withColumnRenamed("id", "rep"))
        .withColumn("doc_id", F.col("doc_id") * mult + F.col("rep"))
        .drop("rep")
    )
    big.repartition(64).write.mode("overwrite").parquet(out)
    n = spark.read.parquet(out).count()
    spark.stop()
    return out, n


def corpus_count(path: str) -> int:
    import duckdb

    return duckdb.sql(f"SELECT count(*) FROM '{path}/*.parquet'").fetchone()[0]


def run_level(corpus: str, cores: int, repeat: int = 1) -> dict:
    """Best-of-``repeat`` spark-submit runs WITHIN THIS INVOCATION.

    The N→4N gate is computed from one ladder — same invocation, same
    repeat count per level — so both sides of every ratio come from the
    same noise window (the previous cross-invocation-peak gate compared
    peaks with asymmetric sample counts). The best-observed cache is
    still maintained, but only as a separately-labeled capability
    figure in BENCH.md, never for the gate."""
    from groonga_spark.session import package_zip

    best = None
    for _ in range(max(repeat, 1)):
        out_json = tempfile.mktemp(suffix=f"_scale{cores}.json")
        cmd = [
            "spark-submit",
            "--master", f"local[{cores}]",
            "--driver-memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
            "--py-files", package_zip(),
            os.path.join(REPO, "scripts", "scaling_run.py"),
            corpus, str(cores), out_json,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        with open(out_json) as f:
            r = json.load(f)
        if best is None or r["build_s"] < best["build_s"]:
            best = r
    best["n_runs"] = max(repeat, 1)
    _update_peak_cache(corpus, cores, best, max(repeat, 1))
    return best


def _update_peak_cache(corpus: str, cores: int, best: dict, n: int) -> None:
    cache_path = os.path.join(
        tempfile.gettempdir(), f"gs_scaling_best_{os.path.basename(corpus)}.json"
    )
    cache = {}
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            cache = json.load(f)
    key = str(cores)
    prev = cache.get(key)
    n_observed = (prev.get("n_observed", 0) if prev else 0) + n
    if prev is None or best["build_s"] < prev["build_s"]:
        cache[key] = dict(best)
    cache[key]["n_observed"] = n_observed
    with open(cache_path, "w") as f:
        json.dump(cache, f)


def read_peak_cache(corpus: str) -> dict:
    cache_path = os.path.join(
        tempfile.gettempdir(), f"gs_scaling_best_{os.path.basename(corpus)}.json"
    )
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            return json.load(f)
    return {}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=400)
    ap.add_argument("--pairs", default="1,4,8,32")
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    levels = [int(x) for x in args.pairs.split(",")]
    corpus, n_docs = make_corpus(args.sf_dir, args.mult)
    # one ladder, same repeat per level — the gate's sole input
    results = {c: run_level(corpus, c, args.repeat) for c in levels}
    peaks = read_peak_cache(corpus)

    def eff(lo: int, hi: int) -> float:
        return round(
            results[hi]["build_docs_per_sec"]
            / ((hi / lo) * results[lo]["build_docs_per_sec"]),
            3,
        )

    report = {
        "protocol": "spark-submit --py-files, same input, one ladder, "
                    "best-of-%d per level (gate); cross-invocation peaks "
                    "reported separately" % args.repeat,
        "n_docs": n_docs,
        "levels": results,
        "peak_levels": peaks,
        "efficiency": {
            f"{lo}->{hi}": eff(lo, hi)
            for lo in levels for hi in levels
            if hi / lo in (2, 4)
        },
    }
    # the N→4N gate: smallest measured 4× pair (least distorted by the
    # host's SMT / bandwidth ceiling — see BENCH.md caveat)
    for lo, hi in ((1, 4), (2, 8), (8, 32)):
        if lo in results and hi in results:
            report["gate_N_to_4N"] = {
                "pair": f"local[{lo}] vs local[{hi}]",
                "efficiency": eff(lo, hi),
                "pass": eff(lo, hi) >= 0.8,
            }
            break
    print(json.dumps(report))
    write_bench_md(report)


def write_bench_md(r: dict) -> None:
    lines = [
        "# BENCH — measured results (scaling protocol)",
        "",
        "Protocol: end-to-end index build (read docs → shard → tokenize →",
        "encode → lineage → lexicon → final postings) over the same input",
        "at multiple parallelism levels, run via `spark-submit --master",
        "local[C] --py-files groonga_spark_pkg.zip scripts/scaling_run.py`",
        "(the engine imports from the shipped zip — the cluster deploy",
        "path). Input: sf0.1 documents deterministically replicated to",
        f"{r['n_docs']:,} docs (compute-bound regime).",
        "",
        "Methodology: the N→4N GATE comes from ONE ladder — a single",
        "invocation with the same best-of-n per level — so both sides of",
        "every ratio share a noise window. The separately-labeled peak",
        "table is the best wall clock ever observed per level across",
        "invocations (this shared sandbox shows ±25% neighbor noise; one",
        "ladder once measured 4→8 'efficiency' 1.09, i.e. super-linear,",
        "purely from noise) — a capability figure, never the gate input.",
        "",
        "Host caveat (measured): the box reports 32 logical CPUs but a",
        "pure-CPU multiprocessing probe sustains only ≈7.2× one core at 8",
        "workers and ≈2.9× more from 8→32 (SMT/throttling), so 8→32 can",
        "never express 4× even for perfectly parallel work. local[1] vs",
        "local[4] is the honest N→4N pair on this hardware; the others",
        "are reported with that caveat.",
        "",
        "| cores | build s | docs/sec | query set s | runs |",
        "|---|---|---|---|---|",
    ]
    for c, v in sorted(r["levels"].items(), key=lambda kv: int(kv[0])):
        lines.append(
            f"| local[{c}] | {v['build_s']} | {v['build_docs_per_sec']} |"
            f" {v['query_total_s']} | {v.get('n_observed', 1)} |"
        )
    if r.get("peak_levels"):
        lines += ["", "Cross-invocation PEAK throughput (capability figure,",
                  "not the gate input):", "",
                  "| cores | best build s | docs/sec | total runs |",
                  "|---|---|---|---|"]
        for c, v in sorted(r["peak_levels"].items(), key=lambda kv: int(kv[0])):
            lines.append(
                f"| local[{c}] | {v['build_s']} | {v['build_docs_per_sec']} |"
                f" {v.get('n_observed', 1)} |")
    if any(v.get("finalize_s") for v in r["levels"].values()):
        lines += [
            "", "Phase attribution (Amdahl analysis — where the serial",
            "fraction lives; segments = stage-1 shard jobs, finalize =",
            "lexicon dense ids + postings merge + doc_map + driver-side",
            "metadata, lexicon_ids ⊂ finalize):", "",
            "| cores | segments s | finalize s | lexicon_ids s |"
            " finalize share |",
            "|---|---|---|---|---|",
        ]
        for c, v in sorted(r["levels"].items(), key=lambda kv: int(kv[0])):
            fin = v.get("finalize_s") or 0.0
            share = round(100.0 * fin / v["build_s"], 1) if v["build_s"] else 0
            lines.append(
                f"| local[{c}] | {v.get('segments_s')} | {fin} |"
                f" {v.get('lexicon_ids_s')} | {share}% |"
            )
    lines += ["", "Scaling efficiency, single-ladder (thr_hi / ((hi/lo)·thr_lo)):", ""]
    for pair, e in r["efficiency"].items():
        lines.append(f"- {pair} cores: **{e}**")
    if any(v.get("finalize_s") for v in r["levels"].values()):
        def _phase_eff(key, lo, hi):
            # efficiency = (t_lo / t_hi) / (hi/lo): 1.0 = perfect scaling
            a, b = r["levels"].get(lo, {}), r["levels"].get(hi, {})
            if not (a.get(key) and b.get(key)):
                return None
            return round(a[key] / b[key] / (hi / lo), 3)
        g = r.get("gate_N_to_4N", {})
        if g:
            lo, hi = [int(x.strip("local[] ")) for x in
                      g["pair"].split(" vs ")]
            se = _phase_eff("segments_s", lo, hi)
            fe = _phase_eff("finalize_s", lo, hi)
            lines.append(
                f"- phase efficiency {lo}→{hi}: segments "
                f"**{se}**, finalize **{fe}** (speedup/(hi/lo))"
            )
    if "gate_N_to_4N" in r:
        g = r["gate_N_to_4N"]
        lines.append(
            f"- **N→4N gate ({g['pair']}): {g['efficiency']} — "
            f"{'PASS' if g['pass'] else 'FAIL'} (target ≥ 0.8)**"
        )
    path = os.path.join(REPO, "BENCH.md")
    # preserve bench_wand's marked section across rewrites
    from benchlib import extract_marked_sections

    extra = ""
    if os.path.exists(path):
        extra = extract_marked_sections(open(path).read())
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n" + extra)


if __name__ == "__main__":
    main()
