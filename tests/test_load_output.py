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


def test_upsert_intra_batch_duplicate_keys_last_wins(spark):
    """Groonga load semantics: when one payload repeats a _key, the LAST
    record in the payload wins — deterministically, not by shuffle."""
    from groonga_spark.load import load_json, upsert

    existing = spark.createDataFrame([("a", "old"), ("b", "keep")],
                                     "_key string, text string")
    incoming = load_json(spark, [
        {"_key": "a", "text": "v1"},
        {"_key": "a", "text": "v2"},
        {"_key": "a", "text": "v3"},
    ], schema="_key string, text string")
    for _ in range(3):  # stable across repeated evaluations
        got = {r["_key"]: r["text"]
               for r in upsert(existing, incoming, "_key").collect()}
        assert got == {"a": "v3", "b": "keep"}


def test_tsv_escapes_structural_characters(spark):
    from groonga_spark.output import to_tsv

    df = spark.createDataFrame(
        [(1, "tab\there"), (2, "new\nline"), (3, "back\\slash")],
        "id long, text string",
    )
    tsv = to_tsv(df.orderBy("id"))
    lines = tsv.split("\n")
    assert len(lines) == 4  # header + 3 rows, embedded newline escaped
    assert lines[1] == "1\ttab\\there"
    assert lines[2] == "2\tnew\\nline"
    assert lines[3] == "3\tback\\\\slash"


def test_to_arrow_keeps_nullable_ints(spark):
    import pyarrow as pa

    from groonga_spark.output import to_arrow

    df = spark.createDataFrame([(1,), (None,)], "v long")
    tbl = to_arrow(df)
    assert tbl.schema.field("v").type == pa.int64()
    assert tbl.column("v").null_count == 1
