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


def _tsv_escape(v) -> str:
    # backslash-escape the structural characters (the reference's tsv
    # serializer does the same [G: lib/output.c]); a raw tab/newline in
    # a cell would otherwise split the row for every consumer
    if v is None:
        return ""
    return (str(v).replace("\\", "\\\\").replace("\t", "\\t")
            .replace("\n", "\\n").replace("\r", "\\r"))


def to_tsv(df: DataFrame, header: bool = True) -> str:
    """TSV text block (grn output_type tsv); tabs/newlines/backslashes
    inside cells are backslash-escaped."""
    rows = df.collect()
    lines = []
    if header:
        lines.append("\t".join(df.columns))
    for r in rows:
        lines.append("\t".join(_tsv_escape(v) for v in r))
    return "\n".join(lines)


def to_arrow(df: DataFrame):
    """Apache Arrow table (grn output_type apache-arrow) via Spark's
    native Arrow collect (``DataFrame.toArrow``) — no pandas round-trip,
    so nullable integer columns stay int-with-nulls instead of degrading
    to float64."""
    return df.toArrow()


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """The ``dump`` equivalent: full materialization to columnar files."""
    df.write.mode(mode).parquet(path)
