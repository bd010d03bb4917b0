"""TableIO backend duality (SURVEY.md §1.3 / §7 M0): the engine's table
contract is schema-level — parquet dirs locally, Iceberg tables in prod.
These tests pin down EXACTLY which calls change between the backends, so
the "swap the layout, keep the engine" claim stays honest."""

from __future__ import annotations

from groonga_spark.catalog import TableIO, has_iceberg


def test_parquet_backend_round_trip(spark, tmp_path):
    io = TableIO(spark, str(tmp_path / "t"), backend="parquet")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    io.write(df)
    got = sorted((r["id"], r["v"]) for r in io.read().collect())
    assert got == [(1, "a"), (2, "b")]
    io.write(spark.createDataFrame([(3, "c")], "id long, v string"),
             mode="append")
    assert io.read().count() == 3
    # parquet has no snapshot log: incremental_read falls back to a full
    # read (callers use the doc-id high-water mark instead)
    assert io.incremental_read(123).count() == 3


def test_for_session_routing(spark):
    """Without the Iceberg extension the session routes filesystem paths
    AND identifiers to parquet; has_iceberg gates the other branch."""
    assert has_iceberg(spark) is False
    assert TableIO.for_session(spark, "/tmp/x").backend == "parquet"
    assert TableIO.for_session(spark, "cat.db.t").backend == "parquet"


def test_iceberg_backend_call_surface():
    """The Iceberg branch differs from parquet in exactly three calls:
    read via ``read.format("iceberg").load(ident)``, write via
    ``df.writeTo(ident).createOrReplace()/append()`` (snapshot-atomic —
    the lineage commit point), incremental read via the
    ``start-snapshot-id`` option. Verified against a recording stub
    (the real extension isn't bundled in this sandbox — import-gated,
    never on the tested path)."""
    calls: list[tuple] = []

    class FakeReader:
        def format(self, f):
            calls.append(("format", f))
            return self

        def option(self, k, v):
            calls.append(("option", k, v))
            return self

        def load(self, loc):
            calls.append(("load", loc))
            return "DF"

    class FakeSpark:
        @property
        def read(self):
            return FakeReader()

    class FakeWriteTo:
        def __init__(self, loc):
            self.loc = loc

        def createOrReplace(self):
            calls.append(("createOrReplace", self.loc))

        def append(self):
            calls.append(("append", self.loc))

    class FakeDF:
        def writeTo(self, loc):
            calls.append(("writeTo", loc))
            return FakeWriteTo(loc)

    io = TableIO(FakeSpark(), "cat.db.postings", backend="iceberg")
    assert io.read() == "DF"
    assert calls == [("format", "iceberg"), ("load", "cat.db.postings")]

    calls.clear()
    io.write(FakeDF(), mode="overwrite")
    assert calls == [("writeTo", "cat.db.postings"),
                     ("createOrReplace", "cat.db.postings")]

    calls.clear()
    io.write(FakeDF(), mode="append")
    assert calls == [("writeTo", "cat.db.postings"),
                     ("append", "cat.db.postings")]

    calls.clear()
    assert io.incremental_read(123) == "DF"
    assert calls == [("format", "iceberg"),
                     ("option", "start-snapshot-id", "123"),
                     ("load", "cat.db.postings")]

    calls.clear()
    assert io.incremental_read(None) == "DF"  # no snapshot → full read
    assert calls == [("format", "iceberg"), ("load", "cat.db.postings")]
