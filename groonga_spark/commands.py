"""Groonga command façade — the reference's primary USER surface.

A reference user interacts through named commands with string parameters
(`select table Docs --query ... --drilldown lang`, `load`, `status`,
`tokenize`, …) [G: lib/proc/*.c command handlers; command syntax in the
reference docs]. This module maps those commands — with the REFERENCE
parameter names and comma-separated string conventions — onto the engine
APIs, so switching workloads is a rename, not a rewrite.

Output follows the reference's body shape for `select`:
``[[[n_hits], [[col, type], ...], row, row, ...], drilldown_bodies...]``
and plain dict/list bodies for the rest. Spark-first: every command
delegates to lazy DataFrame pipelines; only the output step collects.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

TOKENIZER_NAMES = {
    "TokenBigram": "bigram",
    "TokenTrigram": "trigram",
    "TokenDelimit": "delimit",
}


def _mode_of(tokenizer: str) -> str:
    """Reference tokenizer name (+ ``TokenNgram("n", N)``) → mode string."""
    t = tokenizer.strip()
    if t in TOKENIZER_NAMES:
        return TOKENIZER_NAMES[t]
    if t.startswith("TokenNgram"):
        import re

        m = re.search(r'"n"\s*,\s*(\d+)', t)
        return f"ngram:{m.group(1)}" if m else "bigram"
    if t in ("bigram", "trigram", "delimit") or t.startswith("ngram:"):
        return t  # already a mode string
    raise ValueError(f"unknown tokenizer {tokenizer!r}")


@dataclass
class CommandContext:
    """Holds the named tables and fulltext indexes commands operate on —
    the grn database handle equivalent."""

    spark: SparkSession
    tables: dict[str, DataFrame] = field(default_factory=dict)
    indexes: dict[str, Any] = field(default_factory=dict)  # Fulltext/MultiField
    id_cols: dict[str, str] = field(default_factory=dict)
    #: per-table reference columns, the schema property a Groonga column
    #: whose type is another table carries: {table: {fk_col: (other_table
    #: NAME, its pk col)}} — lets select resolve dot-path accessors
    #: schema-driven, like the reference [G: lib/db.c · column type =
    #: table ⇒ accessor chain]
    references: dict[str, dict[str, tuple[str, str]]] = field(
        default_factory=dict
    )

    def register(self, name: str, df: DataFrame, index=None,
                 id_col: str = "doc_id",
                 references: dict[str, tuple[str, str]] | None = None) -> None:
        self.tables[name] = df
        if index is not None:
            self.indexes[name] = index
        self.id_cols[name] = id_col
        if references:
            self.references[name] = dict(references)

    def resolve_references(self, table: str) -> dict:
        """Column-name-keyed reference map for a select over ``table``:
        the table's OWN reference columns (dot-path heads), plus other
        tables' reference columns so chained paths can hop through
        dimensions — but only when the name is NOT also a column of
        ``table`` (a foreign declaration must never hijack this table's
        same-named plain column; select() additionally restricts heads
        to actual fact columns). References to a table that is not
        (yet) registered are skipped, not an error — they only matter
        if a query actually traverses them."""
        own = self.references.get(table, {})
        fact_cols = set(self.tables[table].columns) if table in self.tables \
            else set()
        out: dict = {}
        for tname, m in self.references.items():
            if tname == table:
                continue
            for fk, (dim_name, pk) in m.items():
                if fk in own or fk in fact_cols or dim_name not in self.tables:
                    continue
                out[fk] = (self.tables[dim_name], pk)
        for fk, (dim_name, pk) in own.items():
            if dim_name in self.tables:
                out[fk] = (self.tables[dim_name], pk)
        return out


def execute(ctx: CommandContext, command: str, **params):
    """Run one reference-named command; returns the command's body."""
    fn = _COMMANDS.get(command)
    if fn is None:
        raise ValueError(f"unknown command {command!r}; "
                         f"supported: {sorted(_COMMANDS)}")
    return fn(ctx, **params)


# --------------------------------------------------------------------------
# commands
# --------------------------------------------------------------------------

def _cmd_status(ctx: CommandContext):
    import pyspark

    return {
        "version": "groonga-spark/0.2",
        "spark_version": pyspark.__version__,
        "n_tables": len(ctx.tables),
        "n_indexes": len(ctx.indexes),
        "default_command_version": 1,
    }


def _cmd_table_list(ctx: CommandContext):
    out = []
    for name, df in sorted(ctx.tables.items()):
        out.append({
            "name": name,
            "n_columns": len(df.columns),
            "has_index": name in ctx.indexes,
            "key": ctx.id_cols.get(name, "doc_id"),
        })
    return out


def _cmd_column_list(ctx: CommandContext, table: str):
    df = ctx.tables[table]
    refs = ctx.references.get(table, {})
    out = []
    for f in df.schema.fields:
        row = {"name": f.name, "type": f.dataType.simpleString()}
        if f.name in refs:
            # a reference column reports the referenced TABLE as its
            # range, the Groonga column_list convention
            row["range"] = refs[f.name][0]
        out.append(row)
    return out


def _cmd_schema(ctx: CommandContext):
    return {
        "tables": {
            name: {
                "columns": _cmd_column_list(ctx, name),
                "has_index": name in ctx.indexes,
            }
            for name in sorted(ctx.tables)
        }
    }


def _cmd_tokenize(ctx: CommandContext, tokenizer: str, string: str,
                  token_filters: str | None = None, **_):
    from groonga_spark.normalize import normalize_str
    from groonga_spark.tokenize import tokenize_str

    mode = _mode_of(tokenizer)
    if token_filters:
        for tf in token_filters.split(","):
            tf = tf.strip()
            if tf == "TokenFilterStem":
                mode += "|stem"
            elif tf.startswith("TokenFilterStopWord"):
                # reference configures the stop list on the column; the
                # façade takes it inline: TokenFilterStopWord(a;b;c)
                inner = tf[tf.find("(") + 1 : tf.rfind(")")]
                mode += "|stop:" + ",".join(inner.split(";"))
            else:
                raise ValueError(f"unknown token filter {tf!r}")
    return [{"value": t, "position": p}
            for t, p in tokenize_str(normalize_str(string), mode)]


def _cmd_normalize(ctx: CommandContext, normalizer: str, string: str, **_):
    from groonga_spark.normalize import normalize_str

    return {"normalized": normalize_str(string), "types": [], "checks": []}


def _cmd_load(ctx: CommandContext, table: str, values, key: str | None = None):
    """Upserts the TABLE only. The reference's load also maintains index
    columns in place [G: lib/proc.c · proc_load → index hooks]; immutable
    segments can't — so when the table has a registered fulltext index the
    divergence is made VISIBLE (warning + ``index_stale`` flag) instead of
    silently serving stale matches. Rebuild/append via build_index(resume=
    True) or streaming.append_docs picks the new rows up."""
    from groonga_spark.load import load_json, upsert

    incoming = load_json(ctx.spark, values)
    key = key or ctx.id_cols.get(table, "doc_id")
    if table in ctx.tables:
        ctx.tables[table] = upsert(ctx.tables[table], incoming, key)
    else:
        ctx.tables[table] = incoming
        ctx.id_cols.setdefault(table, key)
    out = {"n_loaded": incoming.count()}
    if table in ctx.indexes:
        import warnings

        warnings.warn(
            f"load into {table!r}: its fulltext index was NOT updated — "
            "select --query serves pre-load matches until the index is "
            "rebuilt/appended (build_index resume / append_docs)"
        )
        out["index_stale"] = True
    return out


def _cmd_delete(ctx: CommandContext, table: str, key: str | None = None,
                id=None, filter: str | None = None):  # noqa: A002
    from pyspark.sql import functions as F

    from groonga_spark.select import script_to_sql

    df = ctx.tables[table]
    id_col = ctx.id_cols.get(table, "doc_id")
    if filter is not None:
        doomed = df.filter(F.expr(script_to_sql(filter)))
    elif id is not None:
        doomed = df.filter(F.col(id_col) == id)
    elif key is not None:
        doomed = df.filter(F.col(id_col) == key)
    else:
        raise ValueError("delete needs key=, id= or filter=")
    # Never collect the matched ids to the driver: a `delete --filter`
    # can match billions of rows. The count comes from one aggregate;
    # the tombstone write streams the id DataFrame from the executors.
    # Pinned ONCE (same pattern as MultiFieldIndex.delete_docs): the
    # lineage is otherwise re-executed three times — count, anti-join,
    # tombstone write — and a non-deterministic filter or concurrently
    # changing source would tombstone a DIFFERENT id set than reported.
    doomed_ids = doomed.select(id_col).localCheckpoint(eager=True)
    n_deleted = doomed_ids.count()
    ctx.tables[table] = df.join(doomed_ids, id_col, "left_anti")
    idx = ctx.indexes.get(table)
    if idx is not None and hasattr(idx, "delete_docs") and n_deleted:
        idx.delete_docs(doomed_ids)
    return {"n_deleted": n_deleted}


# Hard cap on rows materialized into a command-façade select body. A
# normal select is bounded by its `limit`, but `limit=-1` (the
# reference's "all rows") would otherwise collect an unbounded result
# onto the driver. The n_hits header stays the TRUE count either way.
SELECT_BODY_MAX_ROWS = 100_000


def _select_body(res, hits_df: DataFrame) -> list:
    # fetch cap+1 so truncation is DETECTED, never silent: a limit=-1
    # ("all rows") select bigger than the cap keeps the true n_hits in
    # the header and marks the body as truncated instead of quietly
    # returning fewer rows than n_hits.
    rows = hits_df.limit(SELECT_BODY_MAX_ROWS + 1).collect()
    cols = [[f.name, f.dataType.simpleString()] for f in hits_df.schema.fields]
    header: list = [res.n_hits]
    if len(rows) > SELECT_BODY_MAX_ROWS:
        rows = rows[:SELECT_BODY_MAX_ROWS]
        header.append({"truncated": True, "cap": SELECT_BODY_MAX_ROWS})
    return [header, cols, *[list(r) for r in rows]]


def _cmd_select(
    ctx: CommandContext,
    table: str,
    query: str | None = None,
    match_columns: str | None = None,
    filter: str | None = None,  # noqa: A002
    post_filter: str | None = None,
    sort_keys: str | None = None,
    output_columns: str | None = None,
    offset: int = 0,
    limit: int = 10,
    drilldown: str | None = None,
    drilldowns: dict | None = None,
    slices: dict | None = None,
    columns: dict | None = None,
    match_escalation_threshold: int | None = None,
    adjuster: list | None = None,
    scorer: str | None = None,
    output_type: str = "python",
):
    """The reference's `select` with its parameter names/conventions:
    comma-separated sort_keys/output_columns/drilldown strings, body
    shaped ``[[[n_hits], [[col, type]...], rows...], drilldowns...]``."""
    from groonga_spark.select import select as _select

    sel_kwargs = dict(
        query=query,
        filter=filter,
        post_filter=post_filter,
        sort_keys=sort_keys,
        offset=int(offset),
        limit=int(limit),
        output_columns=output_columns,
        slices=slices,
        columns=columns,
        adjuster=adjuster,
        scorer=scorer,
        match_escalation_threshold=match_escalation_threshold,
        match_columns=match_columns,
        id_col=ctx.id_cols.get(table, "doc_id"),
    )
    refs = ctx.resolve_references(table)
    if refs:
        sel_kwargs["references"] = refs
    if drilldown is not None:
        sel_kwargs["drilldowns"] = [k.strip() for k in drilldown.split(",")]
    elif drilldowns is not None:
        sel_kwargs["drilldowns"] = drilldowns
    with _select(ctx.tables[table],
                 index=ctx.indexes.get(table), **sel_kwargs) as res:
        body = [_select_body(res, res.hits)]
        for label in (res.drilldowns or {}):
            dd = res.drilldowns[label]
            rows = dd.collect()
            cols = [[f.name, f.dataType.simpleString()]
                    for f in dd.schema.fields]
            # the reference reports the TOTAL group count in the header;
            # limit bounds rows only (same shape as [[n_hits], ...]).
            # Always prefer the pre-limit frame: with limit=0 the rows
            # are suppressed but the total group count is still reported.
            total = res.drilldown_totals[label].count() \
                if label in res.drilldown_totals else len(rows)
            body.append([[total], cols, *[list(r) for r in rows]])
    if output_type == "json":
        return json.dumps(body, default=str)
    return body


def _cmd_dump(ctx: CommandContext, table: str, path: str):
    from groonga_spark.output import write_parquet

    write_parquet(ctx.tables[table], path)
    return {"dumped": table, "path": path}


def _cmd_cache_limit(ctx: CommandContext, max: int | None = None):  # noqa: A002
    from groonga_spark.search import FulltextIndex

    prev = FulltextIndex.RESULT_CACHE_MAX
    if max is not None:
        FulltextIndex.RESULT_CACHE_MAX = int(max)
    return {"previous": prev, "current": FulltextIndex.RESULT_CACHE_MAX}


_COMMANDS = {
    "status": _cmd_status,
    "table_list": _cmd_table_list,
    "column_list": _cmd_column_list,
    "schema": _cmd_schema,
    "tokenize": _cmd_tokenize,
    "normalize": _cmd_normalize,
    "load": _cmd_load,
    "delete": _cmd_delete,
    "select": _cmd_select,
    "dump": _cmd_dump,
    "cache_limit": _cmd_cache_limit,
}
