"""End-to-end training-data curation over a document corpus.

Composes the engine's dedup / text-analysis operators into the standard
web-corpus curation sequence — the workload the 100 TB deployment
exists for:

    exact dedup → quality & language filters → near-dup removal
    (MinHash-LSH candidates, exact-Jaccard confirm) → curated corpus
    + per-stage metrics.

Every stage is DataFrame algebra from dedup.py/textstats.py (all
deterministic, all JVM-or-Arrow-side); metrics are collected once at the
end from a single cached lineage, so the pipeline costs its joins, not
repeated scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from groonga_spark.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles,
)
from groonga_spark.textstats import token_stats


def near_dup_losers(docs: DataFrame, threshold: float = 0.8,
                    text_col: str = "text", id_col: str = "doc_id"
                    ) -> DataFrame:
    """Doc ids to DROP under near-dup policy "keep the smallest id of
    each duplicate group": MinHash-LSH proposes candidate pairs, exact
    shingle-Jaccard confirms ≥ threshold, and the higher id of every
    confirmed pair loses. (Transitive clusters resolve over repeated
    application; one pass removes ≥ half of every cluster — the standard
    near-dup sweep.)"""
    cand = minhash_lsh_pairs(docs, text_col=text_col, id_col=id_col)
    sh = shingles(docs, text_col=text_col, id_col=id_col).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        cand.join(a, cand.d1 == F.col("a.doc_id"))
        .join(b, (cand.d2 == F.col("b.doc_id"))
              & (F.col("a.shingle") == F.col("b.shingle")))
        .groupBy("d1", "d2").agg(F.count("*").alias("inter"))
    )
    confirmed = (
        inter.join(sizes.withColumnRenamed("doc_id", "d1")
                   .withColumnRenamed("sz", "sz1"), "d1")
        .join(sizes.withColumnRenamed("doc_id", "d2")
              .withColumnRenamed("sz", "sz2"), "d2")
        .filter(F.col("inter")
                / (F.col("sz1") + F.col("sz2") - F.col("inter"))
                >= threshold)
    )
    from groonga_spark.cacheutil import track

    return track(
        confirmed.select(F.col("d2").alias("doc_id")).distinct(),
        [sh, *getattr(cand, "_gs_persists", ())],
    )


def curate_corpus(docs: DataFrame, min_quality: float = 0.2,
                  langs: list[str] | None = None,
                  near_dup_threshold: float = 0.8,
                  text_col: str = "text", id_col: str = "doc_id"
                  ) -> tuple[DataFrame, dict]:
    """docs → (curated docs, per-stage metrics).

    Stages: exact dedup (content-hash survivor) → quality/lang filter
    (token_stats) → near-dup removal. Returns the surviving rows of the
    ORIGINAL DataFrame (all original columns) plus counts per stage.
    """
    n0 = docs.count()

    stats = token_stats(docs, text_col=text_col, id_col=id_col)
    from pyspark.sql import Window as W

    w = W.partitionBy("fingerprint").orderBy("doc_id")
    # persist the exact-dedup survivors: the tokenize+fingerprint+window
    # lineage above is the expensive pre-near-dup stage and BOTH counts
    # below consume it — uncached it would execute twice
    exact_keep = (
        stats.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    ).persist()
    quality_keep = exact_keep.filter(F.col("quality") >= min_quality)
    if langs:
        quality_keep = quality_keep.filter(F.col("pred_lang").isin(langs))
    kept_ids = quality_keep.select("doc_id").persist()
    n_exact = exact_keep.count()
    n_quality = kept_ids.count()  # materializes kept_ids off the cache
    exact_keep.unpersist()

    base = docs.join(kept_ids.withColumnRenamed("doc_id", id_col), id_col,
                     "left_semi")
    losers = near_dup_losers(base, near_dup_threshold, text_col, id_col)
    curated = base.join(losers.withColumnRenamed("doc_id", id_col), id_col,
                        "left_anti").persist()
    n_final = curated.count()
    # the count materialized `curated`; the dedup intermediates under it
    # are no longer needed — release them now, keep only `curated` cached
    # (tracked, so callers can cacheutil.release(curated) when done)
    from groonga_spark.cacheutil import release, track

    release(losers)
    kept_ids.unpersist()
    track(curated, [curated])
    metrics = {
        "input_docs": n0,
        "after_exact_dedup": n_exact,
        "after_quality_lang": n_quality,
        "after_near_dedup": n_final,
        "removed_total": n0 - n_final,
    }
    return curated, metrics
