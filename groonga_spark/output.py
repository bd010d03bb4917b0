"""Output formats — the reference's result serializers (SURVEY.md §2.1,
[G: lib/output.c · grn_output_*; Arrow output via grn_arrow]) as thin
DataFrame adapters. Spark gives every format natively; these exist so a
reference user finds the familiar surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def to_json_records(df: DataFrame) -> list[str]:
    """JSON records (the default Groonga output body)."""
    return df.toJSON().collect()


def to_tsv(df: DataFrame, header: bool = True) -> str:
    """TSV text block (grn output_type tsv)."""
    rows = df.collect()
    lines = []
    if header:
        lines.append("\t".join(df.columns))
    for r in rows:
        lines.append("\t".join("" if v is None else str(v) for v in r))
    return "\n".join(lines)


def to_arrow(df: DataFrame):
    """Apache Arrow table (grn output_type apache-arrow) — zero-copy via
    Spark's Arrow collect path."""
    import pyarrow as pa

    return pa.Table.from_pandas(df.toPandas(), preserve_index=False)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """The ``dump`` equivalent: full materialization to columnar files."""
    df.write.mode(mode).parquet(path)
