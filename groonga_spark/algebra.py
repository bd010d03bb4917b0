"""Score-carrying result-set algebra over (doc_id, score) DataFrames.

Re-expresses [G: lib/table.c/db.c · grn_table_setoperation; selection ops
GRN_OP_OR/AND/AND_NOT/ADJUST in grn_table_select] — THE semantic core of
Groonga multi-predicate queries (SURVEY.md §2.7). These are NOT plain SQL
set ops: scores combine.

  OR       union; scores ADD on overlap
  AND      intersect; scores ADD
  AND_NOT  remove right side; left scores kept
  ADJUST   keep left set; add right's score where present

The in-kernel numpy twin lives in wand.py (segment-local); this DataFrame
form composes ACROSS indexes/predicates at plan level (Select API). Joins
are on doc_id — co-partitioned by doc-id-derived segment, so Catalyst
turns them into cheap shuffles; small sides should be broadcast by the
caller when known-small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm(df: DataFrame) -> DataFrame:
    return df.select("doc_id", "score")


def combine(left: DataFrame, right: DataFrame, op: str) -> DataFrame:
    """Combine two (doc_id, score) sets with a Groonga set operation."""
    left, right = _norm(left), _norm(right)
    r = right.withColumnRenamed("score", "_rs")
    if op == "or":
        return (
            left.join(r, "doc_id", "full_outer")
            .select(
                "doc_id",
                (F.coalesce(F.col("score"), F.lit(0.0)) + F.coalesce(F.col("_rs"), F.lit(0.0))).alias("score"),
            )
        )
    if op == "and":
        return left.join(r, "doc_id", "inner").select(
            "doc_id", (F.col("score") + F.col("_rs")).alias("score")
        )
    if op == "and_not":
        return left.join(r, "doc_id", "left_anti").select("doc_id", "score")
    if op == "adjust":
        return left.join(r, "doc_id", "left").select(
            "doc_id",
            (F.col("score") + F.coalesce(F.col("_rs"), F.lit(0.0))).alias("score"),
        )
    raise ValueError(f"unknown set op: {op}")
