"""load (JSON ingestion, upsert-by-key) and output formats (§2.1)."""

from __future__ import annotations

import json

from groonga_spark.load import load_json, upsert
from groonga_spark.output import to_arrow, to_json_records, to_tsv


def test_load_json_both_shapes(spark):
    objs = load_json(spark, '[{"_key": "a", "n": 1}, {"_key": "b", "n": 2}]')
    arrs = load_json(spark, '[["_key", "n"], ["a", 1], ["b", 2]]')
    assert sorted(r["_key"] for r in objs.collect()) == ["a", "b"]
    assert sorted((r["_key"], r["n"]) for r in arrs.collect()) == [
        ("a", 1), ("b", 2)
    ]


def test_upsert_last_write_wins(spark):
    base = load_json(spark, '[{"_key": "a", "n": 1}, {"_key": "b", "n": 2}]')
    incoming = load_json(spark, '[{"_key": "b", "n": 20}, {"_key": "c", "n": 3}]')
    out = {r["_key"]: r["n"] for r in upsert(base, incoming, "_key").collect()}
    assert out == {"a": 1, "b": 20, "c": 3}


def test_upsert_version_col(spark):
    base = load_json(spark, '[{"_key": "a", "n": 1, "v": 5}]')
    older = load_json(spark, '[{"_key": "a", "n": 99, "v": 3}]')
    out = upsert(base, older, "_key", version_col="v").collect()
    assert out[0]["n"] == 1  # higher version wins regardless of source


def test_output_formats(spark):
    df = load_json(spark, '[{"_key": "a", "n": 1}, {"_key": "b", "n": 2}]') \
        .orderBy("_key")
    recs = [json.loads(x) for x in to_json_records(df)]
    assert {r["_key"] for r in recs} == {"a", "b"}
    tsv = to_tsv(df)
    assert tsv.splitlines()[0].split("\t") == df.columns
    assert len(tsv.splitlines()) == 3
    tbl = to_arrow(df)
    assert tbl.num_rows == 2 and set(tbl.column_names) == set(df.columns)


def test_tableio_parquet_backend(spark, tmp_path):
    from groonga_spark.catalog import TableIO, has_iceberg

    assert not has_iceberg(spark)  # sandbox session has no Iceberg jars
    loc = str(tmp_path / "t")
    io = TableIO.for_session(spark, loc)
    assert io.backend == "parquet"
    df = spark.range(5).withColumnRenamed("id", "x")
    io.write(df)
    assert io.read().count() == 5
    io.write(spark.range(3).withColumnRenamed("id", "x"), mode="append")
    assert io.read().count() == 8
    assert io.incremental_read(None).count() == 8
