"""Storage catalog shim: the same engine tables as local parquet dirs or
Iceberg tables (SURVEY.md §1.3 / §7 M0).

The engine's on-disk contract is schema-level, not format-level: every
table (corpus, segments, lexicon, postings, doc_map) reads/writes
through this shim, which picks the backend per deployment:

- **parquet** (default, this sandbox): plain directories — what every
  test and bench in this repo exercises.
- **iceberg**: `catalog.table` identifiers via Spark SQL; gives the prod
  properties the docstrings reference — snapshot-atomic commits (the
  lineage commit point), partition pruning on bucket(term_id) /
  days(warc_ts), MERGE INTO for load-upsert, and incremental snapshot
  reads for streaming appends. Activated only when the session has the
  Iceberg extension (not bundled here — import-gated, never on the
  tested path).

The two backends are deliberately tiny: the engine's layout decisions
(term-range clustering, shard-disjoint blocks, metadata vs data ops)
live in build.py/search.py and hold under either.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def has_iceberg(spark: SparkSession) -> bool:
    """True iff the session can resolve the Iceberg Spark extension."""
    try:
        ext = spark.conf.get("spark.sql.extensions", "") or ""
        return "IcebergSparkSessionExtensions" in ext
    except Exception:  # noqa: BLE001
        return False


@dataclass
class TableIO:
    """Read/write one logical table. ``location`` is a filesystem path
    (parquet backend) or a ``catalog.db.table`` identifier (iceberg)."""

    spark: SparkSession
    location: str
    backend: str = "parquet"  # "parquet" | "iceberg"

    @classmethod
    def for_session(cls, spark: SparkSession, location: str) -> "TableIO":
        backend = (
            "iceberg"
            if has_iceberg(spark) and "/" not in location
            else "parquet"
        )
        return cls(spark, location, backend)

    def read(self) -> DataFrame:
        if self.backend == "iceberg":
            return self.spark.read.format("iceberg").load(self.location)
        return self.spark.read.parquet(self.location)

    def write(self, df: DataFrame, mode: str = "overwrite") -> None:
        if self.backend == "iceberg":
            # mirror the parquet backend's mode semantics — 'error' and
            # 'ignore' must not silently append
            if mode == "overwrite":
                df.writeTo(self.location).createOrReplace()
            elif mode == "append":
                df.writeTo(self.location).append()
            elif mode in ("error", "errorifexists"):
                df.writeTo(self.location).create()  # raises if it exists
            elif mode == "ignore":
                if not self.spark.catalog.tableExists(self.location):
                    df.writeTo(self.location).create()
            else:
                raise ValueError(f"unsupported write mode {mode!r}")
            return
        df.write.mode(mode).parquet(self.location)

    def incremental_read(self, from_snapshot: int | None) -> DataFrame:
        """Rows appended since ``from_snapshot`` (Iceberg incremental
        scan). The parquet backend has no snapshot log — callers use the
        doc-id high-water mark instead (streaming.append_docs)."""
        if self.backend == "iceberg" and from_snapshot is not None:
            return (
                self.spark.read.format("iceberg")
                .option("start-snapshot-id", str(from_snapshot))
                .load(self.location)
            )
        return self.read()
