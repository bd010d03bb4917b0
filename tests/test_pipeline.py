"""End-to-end corpus curation (pipeline.py) against python oracles."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _shingle_set(text: str, n: int = 3) -> set[str]:
    w = text.split(" ")
    return ({" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}
            if len(w) >= n else set())


def test_curate_corpus(spark, docs):
    from groonga_spark.pipeline import curate_corpus

    # plant exact dup + near dup of doc 0
    r0 = docs.filter("doc_id = 0").collect()[0]
    words = r0["text"].split()
    near = " ".join(words[:-1] + ["zzz"])  # high-jaccard variant
    extra = spark.createDataFrame(
        [(600, r0["text"], r0["lang"], r0["source"], r0["n_chars"]),
         (601, near, r0["lang"], r0["source"], len(near))],
        docs.schema)
    corpus = docs.unionByName(extra)

    curated, m = curate_corpus(corpus, min_quality=0.0,
                               near_dup_threshold=0.8)
    ids = {r["doc_id"] for r in curated.select("doc_id").collect()}
    assert 0 in ids          # group survivor = min id
    assert 600 not in ids    # exact dup dropped
    assert 601 not in ids    # near dup dropped
    assert m["input_docs"] == docs.count() + 2
    assert m["after_exact_dedup"] == m["input_docs"] - 1
    assert m["after_near_dedup"] == len(ids)
    assert set(curated.columns) == set(docs.columns)


def test_curate_quality_and_lang_filters(spark, docs):
    from groonga_spark.pipeline import curate_corpus
    from groonga_spark.textstats import token_stats

    curated, m = curate_corpus(docs, min_quality=0.55,
                               near_dup_threshold=0.99)
    stats = {r["doc_id"]: r["quality"]
             for r in token_stats(docs).collect()}
    ids = {r["doc_id"] for r in curated.select("doc_id").collect()}
    # every survivor passes the threshold; near-dup pass may drop more
    assert all(stats[d] >= 0.55 for d in ids)
    assert m["after_quality_lang"] <= m["after_exact_dedup"]
