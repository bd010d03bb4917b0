"""SparkSession builder tuned for the engine.

Local mode is the sandbox proxy for a multi-executor cluster: partitioning,
shuffle sizing and skew handling are configured as they would be at scale
(AQE on, shuffle partitions ~ cores), so the same plans survive a 100×
scale-up with only ``spark.sql.shuffle.partitions`` retuned.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def package_zip() -> str:
    """Build (or refresh) the engine's ``--py-files`` zip and return its
    path — the artifact a ``spark-submit --py-files engine.zip`` deploy
    ships to every executor."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    # per-user cache path: a fixed shared-/tmp name would (a) crash on
    # another user's sticky-bit-protected file and (b) let a stale or
    # foreign zip win the mtime check and get shipped to executors
    zpath = os.path.join(
        tempfile.gettempdir(), f"groonga_spark_pkg_{os.getuid()}.zip"
    )
    if not os.path.exists(zpath) or os.path.getmtime(zpath) < max(
        os.path.getmtime(os.path.join(pkg_dir, f))
        for f in os.listdir(pkg_dir)
        if f.endswith(".py")
    ):
        # unique temp name + atomic replace: two concurrent runs must
        # not interleave writes into one half-built .tmp
        fd, tmp = tempfile.mkstemp(
            suffix=".zip.tmp", dir=tempfile.gettempdir()
        )
        os.close(fd)
        with zipfile.ZipFile(tmp, "w") as z:
            for f in sorted(os.listdir(pkg_dir)):
                if f.endswith(".py"):
                    z.write(os.path.join(pkg_dir, f), f"groonga_spark/{f}")
        os.replace(tmp, zpath)
    return zpath


def _ship_package(spark: SparkSession) -> None:
    """Distribute groonga_spark to executor Python workers.

    Mirrors the ``spark-submit --py-files engine.zip`` deployment contract
    (north rule): the package is zipped once and registered with
    ``addPyFile`` so every executor — local thread or remote container —
    can unpickle our pandas/Arrow UDFs.
    """
    spark.sparkContext.addPyFile(package_zip())


def warm_up(spark: SparkSession) -> None:
    """Spin up the Python worker pool + codegen paths before timing.

    Executes one tiny pandas-UDF job across all cores so worker fork +
    numpy/pandas import cost lands here, not in the first measured job —
    the steady-state throughput a long-running cluster actually has.
    """
    import pandas as pd

    df = spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    )

    def _noop(it):
        import numpy as np  # noqa: F401

        for pdf in it:
            yield pd.DataFrame({"id": pdf["id"]})

    df.mapInPandas(_noop, schema="id long").count()


def get_spark(
    app_name: str = "groonga_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with engine defaults.

    - Arrow enabled: every UDF in this engine is a vectorized pandas/Arrow
      UDF (no per-row Python — the north rule).
    - AQE enabled: runtime coalescing + skew-join mitigation complement the
      engine's explicit head-term salting (build.py).
    - UTC session timezone: required for DuckDB-oracle comparability.
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[{}]".format(
        os.environ.get("SPARK_GRAFT_CPUS", "*")
    )
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark
