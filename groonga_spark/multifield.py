"""Weighted multi-field (section) match — ``match_columns "title*10||body"``.

Re-expresses the reference's multi-column match with per-column weights
[G: select match_columns "title * 10 || body"; index WITH_SECTION —
lib/proc/proc_select.c builds one expr where each query term matches the
OR of the listed columns, per-column scores scaled by the weight].

Spark-first shape: instead of one index with section ids packed into the
postings (the reference's WITH_SECTION layout), each field gets its OWN
index under ``<path>/fields/<name>/`` — a partitioned layout, so a query
over ``title*10||body`` touches exactly those fields' postings and a
field can rebuild independently. Scoring is simple BM25F: per-field BM25
with the field's own df/avgdl, scaled by the column weight, summed —
score(d) = Σ_leaf Σ_field w_f · BM25_f(leaf, d).

Semantics match the reference's expansion: query ``a b`` over columns
(title, body) means (title@a OR body@a) AND (title@b OR body@b) — a doc
with `a` only in the title and `b` only in the body MATCHES. That forces
leaf-level cross-field combination (an AND of per-field full-query
results would be wrong), so the AST is evaluated here with
algebra.combine over (doc_id, score) DataFrames; each leaf×field runs
the segment kernel through FulltextIndex.match_ast.

Scale notes: q leaves × F fields kernel runs, each term_id-pruned; the
combine joins are tiny (match sets). At 10^12 docs the per-field layout
is the win — fields prune like partitions, and a weight change recosts
without touching postings.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from groonga_spark.algebra import combine
from groonga_spark.build import build_index
from groonga_spark.ql import (
    And,
    Near,
    Not,
    Or,
    Phrase,
    Prefix,
    Similar,
    Term,
    parse_query,
)
from groonga_spark.search import FulltextIndex

MANIFEST = "multifield.json"


def parse_match_columns(spec: str) -> list[tuple[str, float]]:
    """``"title * 10 || body"`` → ``[("title", 10.0), ("body", 1.0)]``."""
    out = []
    for part in spec.split("||"):
        part = part.strip()
        if not part:
            continue
        if "*" in part:
            name, w = part.split("*", 1)
            out.append((name.strip(), float(w.strip())))
        else:
            out.append((part, 1.0))
    if not out:
        raise ValueError(f"empty match_columns spec: {spec!r}")
    return out


def build_multifield_index(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    fields: list[str],
    mode: str = "delimit",
    id_col: str = "doc_id",
    **kwargs,
) -> dict:
    """Build one index per text field of ``docs`` (WITH_SECTION analogue).

    Docs with an empty/null field still count toward that field's corpus
    stats (dl = 0) — BM25F per-field avgdl stays honest.
    """
    os.makedirs(path, exist_ok=True)
    metas = {}
    for f in fields:
        metas[f] = build_index(
            spark,
            docs.select(
                F.col(id_col).alias("doc_id"),
                F.coalesce(F.col(f), F.lit("")).alias("text"),
            ),
            os.path.join(path, "fields", f),
            mode=mode,
            **kwargs,
        )
    manifest = {"fields": list(fields), "mode": mode}
    tmp = os.path.join(path, MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(path, MANIFEST))
    return {"manifest": manifest, "fields": metas}


class MultiFieldIndex:
    """Query handle over a build_multifield_index layout."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        with open(os.path.join(path, MANIFEST)) as fh:
            self.manifest = json.load(fh)
        self._fields: dict[str, FulltextIndex] = {}

    def field(self, name: str) -> FulltextIndex:
        if name not in self.manifest["fields"]:
            raise KeyError(f"unknown field {name!r}; "
                           f"indexed: {self.manifest['fields']}")
        if name not in self._fields:
            self._fields[name] = FulltextIndex(
                self.spark, os.path.join(self.path, "fields", name)
            )
        return self._fields[name]

    # -- evaluation ---------------------------------------------------------

    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame([], "doc_id long, score double")

    def _leaf(self, node, cols: list[tuple[str, float]]) -> DataFrame:
        """Weighted cross-field OR of one query leaf — the reference's
        (col1@t OR col2@t) expansion with weights; combine order = the
        match_columns listing (deterministic float sums)."""
        out = None
        for name, w in cols:
            fidx = self.field(name)
            df = fidx.match_ast(fidx._expand_ast(node))
            if w != 1.0:
                df = df.select(
                    "doc_id", (F.col("score") * F.lit(float(w))).alias("score")
                )
            out = df if out is None else combine(out, df, "or")
        return out if out is not None else self._empty()

    def _eval(self, node, cols) -> DataFrame:
        if node is None:
            return self._empty()
        if isinstance(node, (Term, Phrase, Prefix, Near, Similar)):
            # positional/similarity leaves evaluate per field through the
            # same kernel (cross-field OR like any other leaf)
            return self._leaf(node, cols)
        if isinstance(node, And):
            pos = [c for c in node.children if not isinstance(c, Not)]
            neg = [c.child for c in node.children if isinstance(c, Not)]
            acc = None
            for c in pos:
                r = self._eval(c, cols)
                acc = r if acc is None else combine(acc, r, "and")
            if acc is None:
                return self._empty()
            for c in neg:
                acc = combine(acc, self._eval(c, cols), "and_not")
            return acc
        if isinstance(node, Or):
            acc = None
            for c in node.children:
                r = self._eval(c, cols)
                acc = r if acc is None else combine(acc, r, "or")
            return acc if acc is not None else self._empty()
        if isinstance(node, Not):
            return self._empty()  # bare NOT needs a left set
        raise TypeError(type(node))

    # -- public API ---------------------------------------------------------

    def _cols(self, match_columns: str | None) -> list[tuple[str, float]]:
        if match_columns is None:
            return [(f, 1.0) for f in self.manifest["fields"]]
        return parse_match_columns(match_columns)

    def match_docs(self, query: str,
                   match_columns: str | None = None) -> DataFrame:
        """(doc_id, score) of every match under the column spec."""
        return self._eval(parse_query(query), self._cols(match_columns))

    def search(self, query: str, match_columns: str | None = None,
               k: int = 10) -> DataFrame:
        """BM25F top-k → (doc_id, score), (score desc, doc_id asc)."""
        return (
            self.match_docs(query, match_columns)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )
