"""Fulltext search API over a built index.

The distributed shape of [G: lib/proc/proc_select.c · grn_select] step 3
(selection): the driver parses the query and looks up the handful of query
terms in the lexicon (tiny, pruned scan); executors each evaluate the AST
over ONE segment's blocks (segments partition the doc-id space, so every
set operation is segment-local); a global ``orderBy(score desc, doc_id
asc).limit(k)`` merges per-segment top-k — Spark's TakeOrderedAndProject,
touching k rows per segment, not the corpus.

Scale notes: the postings scan is filtered by ``term_id IN (...)`` which
prunes parquet row groups (postings are written term_id-sorted) / Iceberg
partitions; only matched terms' blocks move. The per-segment kernel holds
q terms × that segment's blocks — bounded by segment size, independent of
corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from groonga_spark.build import IndexStore
from groonga_spark.normalize import normalize_str
from groonga_spark.ql import parse_query, query_terms
from groonga_spark.tokenize import tokenize_str
from groonga_spark.wand import SegmentQueryKernel


class FulltextIndex:
    """Query handle for an index built by build.build_index."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.store = IndexStore(path)
        self.meta = self.store.read_meta()

    @property
    def postings(self) -> DataFrame:
        return self.spark.read.parquet(self.store.p("postings"))

    @property
    def lexicon(self) -> DataFrame:
        return self.spark.read.parquet(self.store.p("lexicon"))

    @property
    def doc_map(self) -> DataFrame:
        import os

        root = self.store.p("doc_map")
        dirs = [os.path.join(root, d) for d in sorted(os.listdir(root), key=int)]
        return self.spark.read.parquet(*dirs)

    # ---------------------------------------------------------------------

    def _plan(self, ast) -> dict:
        """Driver-side planning: tokenize query texts with the INDEX's own
        tokenizer, look the tokens up in the lexicon (one pruned scan)."""
        mode = self.meta["tokenizer_mode"]
        texts = sorted(set(query_terms(ast)))
        tokens_by_text: dict[str, list] = {}
        all_tokens: set[str] = set()
        for t in texts:
            toks = [term for term, _ in tokenize_str(normalize_str(t), mode)]
            tokens_by_text[t] = toks
            all_tokens.update(toks)
        rows = (
            self.lexicon.filter(F.col("term").isin(list(all_tokens)))
            .select("term", "term_id", "df")
            .collect()
        )
        tid = {r["term"]: int(r["term_id"]) for r in rows}
        df_by_tid = {int(r["term_id"]): float(r["df"]) for r in rows}
        return {
            "tokens_by_text": {
                t: [tid.get(tok) for tok in toks]
                for t, toks in tokens_by_text.items()
            },
            "df_by_tid": df_by_tid,
            "needed_tids": sorted(set(tid.values())),
        }

    def search(self, query: str, k: int = 10) -> DataFrame:
        """BM25 top-k for a Groonga-QL query → DataFrame(doc_id, score),
        ordered by (score desc, doc_id asc)."""
        ast = parse_query(query)
        plan = self._plan(ast)
        spark = self.spark
        empty_schema = "doc_id long, score double"
        tids = plan["needed_tids"]
        if ast is None or not tids:
            return spark.createDataFrame([], empty_schema)

        stats = {
            "n_docs": float(self.meta["n_docs"]),
            "avgdl": float(self.meta["avgdl"]),
            "k1": float(self.meta["k1"]),
            "b": float(self.meta["b"]),
        }
        bplan = spark.sparkContext.broadcast(plan)
        ast_b = spark.sparkContext.broadcast(ast)

        def _run(key, pdf: pd.DataFrame) -> pd.DataFrame:
            kernel = SegmentQueryKernel(pdf, bplan.value, stats, k)
            doc, score = kernel.run(ast_b.value)
            return pd.DataFrame({"doc_id": doc, "score": score})

        blocks = self.postings.filter(F.col("term_id").isin([int(t) for t in tids]))
        per_segment = blocks.groupBy("segment").applyInPandas(
            _run, schema=empty_schema
        )
        return per_segment.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def match_docs(self, query: str) -> DataFrame:
        """All matching doc ids (no top-k) — the COUNT/filter path."""
        ast = parse_query(query)
        plan = self._plan(ast)
        spark = self.spark
        if ast is None or not plan["needed_tids"]:
            return spark.createDataFrame([], "doc_id long, score double")
        stats = {
            "n_docs": float(self.meta["n_docs"]),
            "avgdl": float(self.meta["avgdl"]),
            "k1": float(self.meta["k1"]),
            "b": float(self.meta["b"]),
        }
        bplan = spark.sparkContext.broadcast(plan)
        ast_b = spark.sparkContext.broadcast(ast)

        def _run(key, pdf: pd.DataFrame) -> pd.DataFrame:
            kernel = SegmentQueryKernel(pdf, bplan.value, stats, 1 << 62)
            doc, score = kernel.eval(ast_b.value)
            return pd.DataFrame({"doc_id": doc, "score": score})

        blocks = self.postings.filter(
            F.col("term_id").isin([int(t) for t in plan["needed_tids"]])
        )
        return blocks.groupBy("segment").applyInPandas(
            _run, schema="doc_id long, score double"
        )
