"""Join idioms — Groonga's four relational access patterns as DataFrame
algebra (SURVEY.md §2.3). The reference has no general join operator;
these are the shapes it DOES have, each mapped to the Spark join type
Catalyst optimizes best.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ref_join(df: DataFrame, dim: DataFrame, fk: str, pk: str,
             cols: list[str] | None = None, prefix: str = "") -> DataFrame:
    """Reference-column traversal ``a.b.c`` [G: lib/db.c ·
    grn_obj_column, accessor chain]: an N:1 lookup — broadcast hash join
    (dimensions are small by construction in the reference's model)."""
    # alias the dimension key to a private name: Dataset.drop(name)
    # removes EVERY column with that name, so dropping the raw ``pk``
    # would also delete the fact table's join column when fk == pk
    d = dim.select(F.col(pk).alias("__ref_pk"),
                   *(cols or [c for c in dim.columns if c != pk]))
    if prefix:
        for c in d.columns:
            if c != "__ref_pk":
                d = d.withColumnRenamed(c, prefix + c)
    return (df.join(F.broadcast(d), df[fk] == d["__ref_pk"], "left")
            .drop("__ref_pk"))


def sub_filter(parent: DataFrame, child: DataFrame, parent_key: str,
               child_fk: str, condition: Column | str) -> DataFrame:
    """``sub_filter(ref_col, "expr")`` [G: lib/proc.c · func sub_filter]:
    EXISTS over a 1:N reference — left-semi join against the filtered
    child set."""
    cond = F.expr(condition) if isinstance(condition, str) else condition
    matching = child.filter(cond).select(child_fk).distinct()
    return parent.join(
        matching, parent[parent_key] == matching[child_fk], "left_semi"
    )


def anti_filter(parent: DataFrame, child: DataFrame, parent_key: str,
                child_fk: str, condition: Column | str | None = None
                ) -> DataFrame:
    """NOT EXISTS (the OP_AND_NOT composition [G: grn_table_setoperation])
    — left-anti join."""
    c = child if condition is None else child.filter(
        F.expr(condition) if isinstance(condition, str) else condition
    )
    return parent.join(
        c.select(child_fk).distinct(),
        parent[parent_key] == c[child_fk], "left_anti",
    )


_MODES = {
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "@": lambda a, b: a.contains(b),
}


def in_records(df: DataFrame, records: DataFrame,
               conditions: list[tuple[str, str, str]]) -> DataFrame:
    """``in_records(table, v…, "mode", col…)`` [G: lib/proc/
    proc_in_records.c]: keep rows of ``df`` for which SOME record in
    ``records`` satisfies every (df_col, mode, rec_col) condition —
    a semi join with a composite, per-column-operator predicate."""
    on = None
    for df_col, mode, rec_col in conditions:
        c = _MODES[mode](df[df_col], records[rec_col])
        on = c if on is None else (on & c)
    return df.join(records, on, "left_semi")
