"""Hot-prefix planning/query cost vs lexicon size.

The round-2 prefix path expanded ``p*`` into an OR leaf per matching
lexicon term (driver-side list + ``term_id IN`` filter) — cost grew with
the match count. The TermRange path plans a prefix as TWO ints (the
contiguous dense-id span) and prunes the postings scan with BETWEEN, so
driver planning must be FLAT as the lexicon grows, and the kernel cost
must track the MATCHED posting volume, not the lexicon.

Here the matched volume is held constant (the same 20k-term hot prefix,
one posting each) while the total lexicon grows 1×/5×/25× via filler
vocabulary. Appends a marked section to BENCH.md + BENCH_PREFIX.json.

Usage: python scripts/bench_prefix.py [--match 20000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--match", type=int, default=20_000)
    ap.add_argument("--fillers", type=int, nargs="*",
                    default=[0, 4, 24])  # filler terms per doc (unique)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    from groonga_spark.build import build_index
    from groonga_spark.ql import TermRange, parse_query
    from groonga_spark.search import FulltextIndex
    from groonga_spark.session import get_spark

    spark = get_spark("bench_prefix", master="local[8]",
                      shuffle_partitions=16)
    rows_out = []
    for filler in args.fillers:
        # every doc: its unique hot term t<id> + `filler` unique cold terms
        n = args.match
        docs = spark.range(n).selectExpr(
            "id as doc_id",
            "concat_ws(' ', concat('t', lpad(cast(id as string), 7, '0')), "
            + (f"concat_ws(' ', transform(sequence(0, {filler - 1}), "
               f"j -> concat('z', j, 'x', lpad(cast(id as string), 7, '0'))))"
               if filler else "''")
            + ") as text",
        )
        path = os.path.join(
            tempfile.gettempdir(), f"gs_pfx_{n}_{filler}"
        )
        if not os.path.exists(os.path.join(path, "meta.json")):
            import shutil

            shutil.rmtree(path, ignore_errors=True)
            t0 = time.time()
            build_index(spark, docs, path, mode="delimit", resume=False,
                        shard_size=512)
            print(f"built lexicon {(filler + 1) * n} terms in "
                  f"{time.time() - t0:.1f}s", file=sys.stderr)
        idx = FulltextIndex(spark, path)
        n_terms = idx.meta["n_terms"]

        def plan_once():
            ast = idx._expand_ast(parse_query("t*"))
            assert isinstance(ast, TermRange) and ast.n_terms == n
            return idx._plan(ast)

        t_plan = min(_time(plan_once) for _ in range(args.repeat))
        t_query = min(
            _time(lambda: idx.search("t*", args.k, use_cache=False)
                  .collect())
            for _ in range(args.repeat)
        )
        rows_out.append({
            "lexicon_terms": int(n_terms),
            "prefix_matches": n,
            "plan_s": round(t_plan, 4),
            "query_s": round(t_query, 4),
        })
        print(f"lexicon {n_terms}: plan {t_plan:.4f}s query {t_query:.4f}s",
              file=sys.stderr)

    out = {"hot_prefix": "t*", "k": args.k, "rows": rows_out}
    with open(os.path.join(REPO, "BENCH_PREFIX.json"), "w") as f:
        json.dump(out, f, indent=1)
    _append_bench_md(out)
    print(json.dumps(out))
    spark.stop()


def _time(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def _append_bench_md(out: dict) -> None:
    lines = [
        "",
        f"## Hot-prefix cost vs lexicon size (`{out['hot_prefix']}` "
        f"matching {out['rows'][0]['prefix_matches']:,} terms, "
        f"k={out['k']})",
        "",
        "Matched posting volume held constant while the lexicon grows —",
        "the TermRange plan (two ints, BETWEEN pushdown) keeps driver",
        "planning flat; query time tracks matched volume, not lexicon.",
        "",
        "| lexicon terms | plan s | end-to-end query s |",
        "|---|---|---|",
    ]
    for r in out["rows"]:
        lines.append(
            f"| {r['lexicon_terms']:,} | {r['plan_s']} | {r['query_s']} |"
        )
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from benchlib import splice_marked_section

    splice_marked_section("bench_prefix", lines)


if __name__ == "__main__":
    main()
