"""Weighted multi-field (section) match — ``match_columns "title*10||body"``.

Re-expresses the reference's multi-column match with per-column weights
[G: select match_columns "title * 10 || body"; index WITH_SECTION —
lib/proc/proc_select.c builds one expr where each query term matches the
OR of the listed columns, per-column scores scaled by the weight].

Spark-first shape: instead of one index with section ids packed into the
postings (the reference's WITH_SECTION layout), each field gets its OWN
index under ``<path>/fields/<name>/`` — a partitioned layout, so a query
over ``title*10||body`` touches exactly those fields' postings and a
field can rebuild independently. Scoring is simple BM25F: per-field BM25
with the field's own df/avgdl, scaled by the column weight, summed —
score(d) = Σ_leaf Σ_field w_f · BM25_f(leaf, d).

Semantics match the reference's expansion: query ``a b`` over columns
(title, body) means (title@a OR body@a) AND (title@b OR body@b) — a doc
with `a` only in the title and `b` only in the body MATCHES. That forces
leaf-level cross-field combination (an AND of per-field full-query
results would be wrong), so the AST is evaluated here with
algebra.combine over (doc_id, score) DataFrames; each leaf×field runs
the segment kernel through FulltextIndex.match_ast.

Scale notes: q leaves × F fields kernel runs, each term_id-pruned; the
combine joins are tiny (match sets). At 10^12 docs the per-field layout
is the win — fields prune like partitions, and a weight change recosts
without touching postings.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from groonga_spark.algebra import combine
from groonga_spark.build import build_index
from groonga_spark.ql import (
    And,
    Near,
    Not,
    Or,
    Phrase,
    Prefix,
    Similar,
    Term,
    parse_query,
)
from groonga_spark.search import FulltextIndex

MANIFEST = "multifield.json"


def parse_match_columns(spec: str) -> list[tuple[str, float]]:
    """``"title * 10 || body"`` → ``[("title", 10.0), ("body", 1.0)]``."""
    out = []
    for part in spec.split("||"):
        part = part.strip()
        if not part:
            continue
        if "*" in part:
            name, w = part.split("*", 1)
            out.append((name.strip(), float(w.strip())))
        else:
            out.append((part, 1.0))
    if not out:
        raise ValueError(f"empty match_columns spec: {spec!r}")
    return out


def build_multifield_index(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    fields: list[str],
    mode: str = "delimit",
    id_col: str = "doc_id",
    **kwargs,
) -> dict:
    """Build one index per text field of ``docs`` (WITH_SECTION analogue).

    Docs with an empty/null field still count toward that field's corpus
    stats (dl = 0) — BM25F per-field avgdl stays honest.
    """
    os.makedirs(path, exist_ok=True)
    metas = {}
    for f in fields:
        metas[f] = build_index(
            spark,
            docs.select(
                F.col(id_col).alias("doc_id"),
                F.coalesce(F.col(f), F.lit("")).alias("text"),
            ),
            os.path.join(path, "fields", f),
            mode=mode,
            **kwargs,
        )
    manifest = {"fields": list(fields), "mode": mode}
    tmp = os.path.join(path, MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(path, MANIFEST))
    return {"manifest": manifest, "fields": metas}


def append_multifield(spark: SparkSession, docs: DataFrame, path: str,
                      id_col: str = "doc_id") -> dict:
    """Bring EVERY field index under ``path`` up to date with ``docs``
    (the full current table) — the repair path for the command facade's
    ``load`` → ``index_stale`` flag. Per-field streaming.append_docs
    (each field adopts its recorded tokenizer mode); only segments with
    new docs rebuild, so a micro-batch append costs O(batch), not
    O(corpus). The append contract (new, monotonically growing doc ids)
    applies per field; open handles pick the change up via their
    generation check."""
    from groonga_spark.streaming import append_docs

    with open(os.path.join(path, MANIFEST)) as fh:
        man = json.load(fh)
    out = {}
    for f in man["fields"]:
        out[f] = append_docs(
            spark,
            docs.select(
                F.col(id_col).alias("doc_id"),
                F.coalesce(F.col(f), F.lit("")).alias("text"),
            ),
            os.path.join(path, "fields", f),
            mode=None,
        )
    return out


class MultiFieldIndex:
    """Query handle over a build_multifield_index layout."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        with open(os.path.join(path, MANIFEST)) as fh:
            self.manifest = json.load(fh)
        self._fields: dict[str, FulltextIndex] = {}

    def field(self, name: str) -> FulltextIndex:
        if name not in self.manifest["fields"]:
            raise KeyError(f"unknown field {name!r}; "
                           f"indexed: {self.manifest['fields']}")
        if name not in self._fields:
            self._fields[name] = FulltextIndex(
                self.spark, os.path.join(self.path, "fields", name)
            )
        return self._fields[name]

    def delete_docs(self, doc_ids) -> None:
        """Tombstone doc ids in EVERY field index (a document deleted
        from the table disappears from all its section indexes at once
        [G: lib/db.c · grn_obj_remove → per-index-column hooks]).
        Accepts the same forms as FulltextIndex.delete_docs — a small
        driver-side iterable or a Spark DataFrame of ids (executor-side
        tombstone write). Either form is pinned ONCE before the
        per-field fan-out: a DataFrame is localCheckpoint'd so its
        lineage doesn't re-execute per field and a non-deterministic
        source can't tombstone DIFFERENT id sets in different section
        indexes; an iterable is materialized so generators survive."""
        if isinstance(doc_ids, DataFrame):
            doc_ids = doc_ids.localCheckpoint(eager=True)
        else:
            doc_ids = list(doc_ids)
        for name in self.manifest["fields"]:
            self.field(name).delete_docs(doc_ids)

    # -- evaluation ---------------------------------------------------------

    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame([], "doc_id long, score double")

    def _leaf(self, node, cols: list[tuple[str, float]]) -> DataFrame:
        """Weighted cross-field OR of one query leaf — the reference's
        (col1@t OR col2@t) expansion with weights; combine order = the
        match_columns listing (deterministic float sums)."""
        out = None
        for name, w in cols:
            fidx = self.field(name)
            df = fidx.match_ast(fidx._expand_ast(node))
            if w != 1.0:
                df = df.select(
                    "doc_id", (F.col("score") * F.lit(float(w))).alias("score")
                )
            out = df if out is None else combine(out, df, "or")
        return out if out is not None else self._empty()

    def _eval(self, node, cols) -> DataFrame:
        if node is None:
            return self._empty()
        if isinstance(node, (Term, Phrase, Prefix, Near, Similar)):
            # positional/similarity leaves evaluate per field through the
            # same kernel (cross-field OR like any other leaf)
            return self._leaf(node, cols)
        if isinstance(node, And):
            pos = [c for c in node.children if not isinstance(c, Not)]
            neg = [c.child for c in node.children if isinstance(c, Not)]
            acc = None
            for c in pos:
                r = self._eval(c, cols)
                acc = r if acc is None else combine(acc, r, "and")
            if acc is None:
                return self._empty()
            for c in neg:
                acc = combine(acc, self._eval(c, cols), "and_not")
            return acc
        if isinstance(node, Or):
            acc = None
            for c in node.children:
                r = self._eval(c, cols)
                acc = r if acc is None else combine(acc, r, "or")
            return acc if acc is not None else self._empty()
        if isinstance(node, Not):
            return self._empty()  # bare NOT needs a left set
        raise TypeError(type(node))

    # -- public API ---------------------------------------------------------

    def _cols(self, match_columns: str | None) -> list[tuple[str, float]]:
        if match_columns is None:
            return [(f, 1.0) for f in self.manifest["fields"]]
        return parse_match_columns(match_columns)

    #: synthetic tid namespace: member key = (field_idx + 1) << _FIELD_SHIFT
    #: | field-local term_id (term_ids are dense ranks, far below 2^40)
    _FIELD_SHIFT = 40

    def _pruned_plan(self, ast, cols: list[tuple[str, float]]):
        """Shape/lexicon analysis shared by the local and distributed
        pruned paths (driver-cheap: tokenize the leaves once, one pruned
        lexicon lookup per field). Returns None when the SHAPE isn't
        eligible (multi-token leaves, Prefix/Near/Similar, nested OR/AND
        mixes); "empty" when an AND leaf matches no field; else a dict:
        mode, groups/neg_tids over the mapped-tid namespace, per-mapped-
        tid df, per-field stats/tombstones, per-field raw-tid lists, and
        Σdf (posting-volume estimate)."""
        from groonga_spark.normalize import normalize_str
        from groonga_spark.tokenize import tokenize_str

        if isinstance(ast, Term):
            pos, neg, mode = [ast], [], "and"
        elif isinstance(ast, And):
            pos = [c for c in ast.children if not isinstance(c, Not)]
            neg = [c.child for c in ast.children if isinstance(c, Not)]
            if not pos or not all(isinstance(c, Term) for c in pos + neg):
                return None
            mode = "and"
        elif isinstance(ast, Or):
            pos, neg, mode = list(ast.children), [], "or"
            if not pos or not all(isinstance(c, Term) for c in pos):
                return None
        else:
            return None

        tok_mode = self.manifest["mode"]
        texts = []
        for c in pos + neg:
            toks = [t for t, _ in
                    tokenize_str(normalize_str(c.text), tok_mode)]
            if len(toks) != 1:
                return None  # multi-token leaf (ngram/phrase) → exhaustive
            texts.append(toks[0])

        # Driver-mask invariant (search.FulltextIndex._plan): past
        # TOMBSTONE_DRIVER_MAX rows the driver must never materialize the
        # tombstone set. Both pruned kernels carry per-field masks inside
        # the plan (the distributed variant broadcasts them too), so a
        # giant pre-compaction delete makes the pruned SHAPE ineligible —
        # callers fall back to the exhaustive per-field algebra, whose
        # FulltextIndex path masks executor-side past the threshold.
        est_tombs = 0
        for name, _w in cols:
            fidx = self.field(name)
            fidx._check_generation()
            est_tombs += fidx._tombstone_rows_estimate()
        if est_tombs > FulltextIndex.TOMBSTONE_DRIVER_MAX:
            return None

        shift = 1 << self._FIELD_SHIFT
        mapped: list[dict[str, int]] = []
        df_by_tid: dict[int, float] = {}
        raw_tids: list[list[int]] = []
        stats_by_field: dict[int, dict] = {}
        tombs: dict[int, object] = {}
        sum_df = 0.0
        for fi, (name, _w) in enumerate(cols):
            fidx = self.field(name)
            fidx._check_generation()
            rows = fidx._lexicon_lookup(sorted(set(texts)))
            tid_map = {t: (tid, df) for t, tid, df in rows}
            mapped.append(
                {t: (fi + 1) * shift + tid for t, (tid, _d) in tid_map.items()}
            )
            raw_tids.append(sorted({tid for tid, _ in tid_map.values()}))
            for _t, (tid, df) in tid_map.items():
                df_by_tid[(fi + 1) * shift + tid] = float(df)
                sum_df += float(df)
            stats_by_field[fi] = fidx._stats()
            tombs[fi] = fidx.tombstones()

        groups = []
        for tok in texts[: len(pos)]:
            members = []
            for fi, (_name, w) in enumerate(cols):
                mt = mapped[fi].get(tok)
                if mt is not None:
                    members.append((mt, float(w)))
            if members:
                groups.append({"kind": "or", "members": members,
                               "post": None})
            elif mode == "and":
                return "empty"  # an AND leaf matches no field
        if not groups:
            return "empty"
        neg_tids = []
        for tok in texts[len(pos):]:
            for fi in range(len(cols)):
                mt = mapped[fi].get(tok)
                if mt is not None:
                    neg_tids.append(mt)
        return {
            "mode": mode,
            "groups": groups,
            "neg_tids": neg_tids,
            "df_by_tid": df_by_tid,
            "raw_tids": raw_tids,
            "stats_by_field": stats_by_field,
            "tombs": tombs,
            "sum_df": sum_df,
        }

    def _pruned_topk(self, ast, cols: list[tuple[str, float]], k: int,
                     pp=None):
        """BM25F top-k through the interval pruner — ONE kernel call over
        members drawn from every field's postings, each member carrying
        its field's stats/weight, instead of scoring every hit of every
        field and sorting (the round-2 shape). Group model: one or-kind
        group per query leaf, members = (field, token) in match_columns
        order with weight w_f — upper bounds Σ w_f·bound_f per interval,
        so a head-term query stops after the top-k stabilizes exactly
        like the single-field path. Bit-identical to the exhaustive
        DataFrame algebra (member adds in cols order == the combine('or')
        chain; group adds in child order == the combine('and') chain).

        Returns (doc_ids, scores); "distributed" when the shape is
        eligible but the posting volume is above the driver-local cap
        (route to _pruned_topk_distributed, passing ``pp`` to avoid
        re-planning); None when the shape isn't eligible — callers fall
        back to the exhaustive evaluator."""
        import numpy as np

        from groonga_spark.wand import SegmentQueryKernel, TermPostings

        pp = pp if pp is not None else self._pruned_plan(ast, cols)
        if pp is None:
            return None
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        if pp == "empty":
            return empty

        shift = 1 << self._FIELD_SHIFT
        # Aggregate driver-volume gate: _local_blocks caps each FIELD at
        # DRIVER_QUERY_MAX_BYTES individually, so N fields could each
        # pass while their sum loads N× the cap onto the driver. Estimate
        # the total across all fields once (same formula as
        # _local_blocks: Σdf × bytes-per-posting × 2) and route to the
        # distributed path when the aggregate exceeds the cap.
        agg_est = 0.0
        for fi, (name, _w) in enumerate(cols):
            fmeta = self.field(name).meta
            bpp = (
                fmeta["bytes_compressed"] / fmeta["postings_total"]
                if fmeta.get("postings_total")
                else 8.0
            )
            f_sum_df = sum(
                d for t, d in pp["df_by_tid"].items()
                if t >> self._FIELD_SHIFT == fi + 1
            )
            agg_est += f_sum_df * bpp * 2.0
        if agg_est > self.field(cols[0][0]).DRIVER_QUERY_MAX_BYTES:
            return "distributed"

        by_tid: dict[int, TermPostings] = {}
        for fi, (name, _w) in enumerate(cols):
            tids = pp["raw_tids"][fi]
            if not tids:
                continue
            fidx = self.field(name)
            plan_f = {
                "df_by_tid": {
                    t - (fi + 1) * shift: d
                    for t, d in pp["df_by_tid"].items()
                    if t >> self._FIELD_SHIFT == fi + 1
                },
                "tid_ranges": [],
                "ranges_sum_df": 0.0,
            }
            pdf = fidx._local_blocks(tids, plan_f)
            if pdf is None:
                return "distributed"  # volume warrants the cluster
            for tid, g in pdf.groupby("term_id"):
                mt = (fi + 1) * shift + int(tid)
                by_tid[mt] = TermPostings(
                    g, pp["df_by_tid"][mt], pp["tombs"][fi],
                    pp["stats_by_field"][fi]
                )

        # drop members whose postings are absent (belt-and-braces: a
        # lexicon hit always has postings) — preserves member order
        groups = []
        for g in pp["groups"]:
            members = [(t, w) for t, w in g["members"] if t in by_tid]
            if members:
                groups.append({"kind": "or", "members": members,
                               "post": None})
            elif pp["mode"] == "and":
                return empty
        if not groups:
            return empty
        neg_tids = [t for t in pp["neg_tids"] if t in by_tid]

        kern = SegmentQueryKernel.from_term_postings(
            by_tid, pp["stats_by_field"][0], k
        )
        return kern._topk_interval_pruned(groups, pp["mode"], None, neg_tids)

    def _pruned_topk_distributed(self, ast, cols: list[tuple[str, float]],
                                 k: int, pp=None) -> DataFrame | None:
        """Cluster-scale BM25F pruned top-k: union every field's
        term_id-pruned postings (tids remapped into the field namespace),
        group by (segment, shard) — field layouts share shard boundaries
        (same segment_size/shard_size, same doc ids), so one shard group
        holds EVERY field's blocks for its doc range — and run the same
        interval-pruner kernel per shard; global top-k merge touches k
        rows per shard (TakeOrderedAndProject). None when the field
        layouts don't align (different shard geometry) — exhaustive
        fallback."""
        import pandas as pd

        pp = pp if pp is not None else self._pruned_plan(ast, cols)
        if pp is None or pp == "empty":
            return None
        geom = {
            (self.field(n).meta.get("segment_size"),
             self.field(n).meta.get("shard_size"))
            for n, _ in cols
        }
        if len(geom) != 1:
            return None  # mis-aligned shard geometry → exhaustive

        shift = 1 << self._FIELD_SHIFT
        parts = []
        for fi, (name, _w) in enumerate(cols):
            tids = pp["raw_tids"][fi]
            if not tids:
                continue
            parts.append(
                self.field(name).postings
                .filter(F.col("term_id").isin([int(t) for t in tids]))
                .withColumn(
                    "term_id",
                    (F.col("term_id") + F.lit((fi + 1) * shift)).cast("long"),
                )
            )
        if not parts:
            return None
        blocks = parts[0]
        for p in parts[1:]:
            blocks = blocks.unionByName(p)
        blocks = blocks.withColumn("shard", F.shiftright("block_id", 24))

        info = self.spark.sparkContext.broadcast({
            "groups": pp["groups"],
            "mode": pp["mode"],
            "neg_tids": pp["neg_tids"],
            "df_by_tid": pp["df_by_tid"],
            "stats_by_field": pp["stats_by_field"],
            "tombs": pp["tombs"],
            "shift_bits": self._FIELD_SHIFT,
            "k": k,
        })

        def _run(key, pdf: pd.DataFrame) -> pd.DataFrame:
            from groonga_spark.wand import SegmentQueryKernel, TermPostings

            v = info.value
            out_empty = pd.DataFrame({
                "doc_id": pd.Series(dtype="int64"),
                "score": pd.Series(dtype="float64"),
            })
            by_tid = {}
            for tid, g in pdf.groupby("term_id"):
                tid = int(tid)
                fi = (tid >> v["shift_bits"]) - 1
                by_tid[tid] = TermPostings(
                    g, v["df_by_tid"][tid], v["tombs"][fi],
                    v["stats_by_field"][fi]
                )
            groups = []
            for g in v["groups"]:
                members = [(t, w) for t, w in g["members"] if t in by_tid]
                if members:
                    groups.append({"kind": "or", "members": members,
                                   "post": None})
                elif v["mode"] == "and":
                    return out_empty  # leaf matches no field in this shard
            if not groups:
                return out_empty
            neg = [t for t in v["neg_tids"] if t in by_tid]
            kern = SegmentQueryKernel.from_term_postings(
                by_tid, v["stats_by_field"][0], v["k"]
            )
            doc, score = kern._topk_interval_pruned(
                groups, v["mode"], None, neg
            )
            return pd.DataFrame({"doc_id": doc, "score": score})

        per_shard = blocks.groupBy("segment", "shard").applyInPandas(
            _run, schema="doc_id long, score double"
        )
        return per_shard.orderBy(
            F.desc("score"), F.asc("doc_id")
        ).limit(k)

    def match_docs(self, query: str,
                   match_columns: str | None = None) -> DataFrame:
        """(doc_id, score) of every match under the column spec."""
        return self._eval(parse_query(query), self._cols(match_columns))

    def match_ast(self, ast, match_columns: str | None = None) -> DataFrame:
        """match_docs over a pre-expanded AST (select's match-escalation
        path enters here with lexicon-expanded terms that must never
        round-trip through the QL parser)."""
        return self._eval(ast, self._cols(match_columns))

    def _prefix_terms(self, prefix: str, limit: int | None = None,
                      match_columns: str | None = None) -> list[str]:
        """Per-field escalation semantics: the prefix expands against
        the UNION of the queried fields' lexicons (each field is its own
        section index with its own vocabulary [G: WITH_SECTION]), in
        match_columns order, deduplicated; each field's scan honors
        ``limit`` and the union is re-capped to it."""
        out: list[str] = []
        seen: set[str] = set()
        for name, _w in self._cols(match_columns):
            for t in self.field(name)._prefix_terms(prefix, limit=limit):
                if t not in seen:
                    seen.add(t)
                    out.append(t)
        if limit is not None and len(out) > limit:
            out = out[:limit]
        return out

    def search(self, query: str, match_columns: str | None = None,
               k: int = 10) -> DataFrame:
        """BM25F top-k → (doc_id, score), (score desc, doc_id asc).

        Eligible shapes run the interval-pruned kernel — driver-local
        for small posting volumes, per-(segment, shard) on the cluster
        past the driver cap (field layouts share shard boundaries, so
        one shard group holds every field's blocks for its doc range);
        remaining shapes fall back to the exhaustive leaf-level algebra
        + global sort."""
        ast = parse_query(query)
        cols = self._cols(match_columns)
        pp = self._pruned_plan(ast, cols)
        got = self._pruned_topk(ast, cols, k, pp=pp) if pp is not None else None
        if got == "distributed":
            dist = self._pruned_topk_distributed(ast, cols, k, pp=pp)
            if dist is not None:
                return dist
            got = None
        if got is not None:
            import pandas as pd

            out = pd.DataFrame({"doc_id": got[0], "score": got[1]})
            return self.spark.createDataFrame(
                out, "doc_id long, score double"
            )
        return (
            self.match_docs(query, match_columns)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )
