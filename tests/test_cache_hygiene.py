"""No persist() without a paired release on every code path: after each
flow completes (and its release hook runs), Spark's CacheManager must be
empty — a leaked cache is memory + a stale-plan-substitution hazard."""

from __future__ import annotations

import pyspark.sql.functions as F


def _cache_empty(spark) -> bool:
    return bool(spark._jsparkSession.sharedState().cacheManager().isEmpty())


def test_select_close_releases_cache(spark):
    from groonga_spark.select import select

    spark.catalog.clearCache()
    df = spark.range(1000).withColumn("grp", F.col("id") % 7)
    with select(df, filter="id > 10", drilldowns=["grp"], limit=5,
                id_col="id") as res:
        assert res.n_hits == 989
        assert res.drilldowns["grp"].count() == 7
        assert not _cache_empty(spark)  # cached while open
    assert _cache_empty(spark)


def test_select_lazy_path_never_caches(spark):
    from groonga_spark.select import select

    spark.catalog.clearCache()
    df = spark.range(100).withColumn("grp", F.col("id") % 3)
    res = select(df, filter="id > 10", limit=5, id_col="id",
                 need_hit_count=False)
    assert res.n_hits == -1
    assert res.hits.count() == 5
    assert _cache_empty(spark)  # single consumer → no cache at all
    res.close()


def test_prepare_pages_build_no_leak(spark, tmp_path):
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from gen_pages import gen_pages
    from groonga_spark.build import build_index, prepare_pages
    from pyspark.sql import types as T

    spark.catalog.clearCache()
    pages = gen_pages(120, seed=3)
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ])
    pdf = spark.createDataFrame(
        [(p["url"], p["warc_ts"], p["html"], p["text"], p["lang"])
         for p in pages], schema)
    docs = prepare_pages(pdf)
    assert _cache_empty(spark)  # ids are checkpointed data, not cache
    # ids remain stable across repeated actions (pinned by checkpoint)
    a = sorted((r["url"], r["doc_id"]) for r in docs.collect())
    b = sorted((r["url"], r["doc_id"]) for r in docs.collect())
    assert a == b
    build_index(spark, docs, str(tmp_path / "idx"), mode="delimit",
                segment_size=64)
    assert _cache_empty(spark)


def test_dedup_pipeline_release(spark):
    from groonga_spark.cacheutil import release
    from groonga_spark.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
    from groonga_spark.pipeline import curate_corpus

    spark.catalog.clearCache()
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta doc {i % 5} words here") for i in range(40)],
        "doc_id long, text string")

    pairs = ngram_jaccard_pairs(docs, threshold=0.3)
    pairs.count()
    release(pairs)
    assert _cache_empty(spark)

    lsh = minhash_lsh_pairs(docs)
    lsh.count()
    release(lsh)
    assert _cache_empty(spark)

    curated, metrics = curate_corpus(docs, min_quality=0.0)
    assert metrics["after_near_dedup"] == curated.count()
    release(curated)
    assert _cache_empty(spark)
