"""Per-segment query kernel: posting decode, intersection, block-max
pruning, BM25 top-k.

Re-expresses the reference's index-driven selection [G: lib/ii.c ·
grn_ii_select / grn_ii_sel; token_info cursors + result-set ops] — but
where the reference scores EVERY hit then sorts [G: lib/ii.c → grn_hash →
grn_table_sort], this kernel prunes with the skip-block metadata:

- top-k (run): multi-term block-max WAND via the INTERVAL algorithm
  (_topk_interval_pruned): doc-id space partitioned at every block edge,
  interval bounds from Σ covering-block bounds, descending-bound
  processing with a strict kth-score stop — covers AND/OR/NOT/phrase/
  near roots (phrase/near verify positions on surviving candidates
  only; NOT terms decode candidate-driven). Bit-identical to the
  exhaustive path; indexes under PRUNE_MIN_BLOCKS route to the batched
  exhaustive decode instead (cheaper at small scale / per shard);
- match (eval): rarest term (min df) decoded first [G: lib/ii.c ·
  grn_ii_estimate_size — same rarest-first idea], other terms decode ONLY
  blocks whose [min_doc_id, max_doc_id] overlap surviving candidates
  (searchsorted range pruning — the skip-list seek);
- phrase: positional adjacency via intersect of (pos - offset) arrays
  (the reference's ngram-adjacency check in token_info chaining);
- NOT: doc-id setdiff (AND-NOT of [G: grn_table_setoperation]).

Everything operates on numpy arrays decoded batch-at-once (one vb_decode
over concatenated block buffers, segmented cumsum to rebuild absolute doc
ids). Python loops occur per BLOCK or per query NODE, never per row/doc.

Scores: float64; per-term contributions accumulated in term-string-sorted
order → bit-reproducible across parallelism (rank-identity contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from groonga_spark.codec import _segmented_cumsum, vb_decode
from groonga_spark.ql import (
    And,
    Near,
    Not,
    Or,
    Phrase,
    Similar,
    Term,
    TermRange,
)
from groonga_spark.score import get_scorer

#: bench/test hook: when set to a list, pooled-path decodes append their
#: block counts here (TermPostings.decode_idx* can be monkeypatch-spied,
#: but the pooled TermRange paths never construct TermPostings)
_DECODE_SPY: list | None = None


def _spy_decodes(n: int) -> None:
    if _DECODE_SPY is not None:
        _DECODE_SPY.append(int(n))


class TermPostings:
    """Decoded postings of one term within one segment.

    ``stats`` (optional) overrides the kernel-level corpus stats for THIS
    term — the BM25F multi-field path sets it to the owning FIELD's
    (n_docs, avgdl, k1, b), so one kernel evaluates members from several
    per-field indexes with each member scored against its own corpus."""

    __slots__ = ("doc", "tf", "dl", "blocks", "decoded_mask", "df", "tomb",
                 "stats")

    def __init__(self, blocks: pd.DataFrame, df: float, tomb=None,
                 stats: dict | None = None):
        # sorted by (segment, block_id) == global doc order: segments own
        # disjoint doc ranges, shards within a segment are contiguous, and
        # block_id = shard<<24 | seq — so one TermPostings can span the
        # whole index (driver-local path) or one shard (executor path)
        self.blocks = blocks.sort_values(["segment", "block_id"]).reset_index(
            drop=True
        )
        self.df = df
        self.tomb = tomb if tomb is not None and len(tomb) else None
        self.stats = stats
        self.doc = None
        self.tf = None
        self.dl = None

    def decode_all(self) -> None:
        self._decode(np.arange(len(self.blocks)))

    def decode_overlapping(self, candidates: np.ndarray) -> None:
        """Decode only blocks whose doc range intersects candidates."""
        lo = self.blocks["min_doc_id"].to_numpy()
        hi = self.blocks["max_doc_id"].to_numpy()
        # block i survives iff ∃ candidate in [lo_i, hi_i]
        left = np.searchsorted(candidates, lo, side="left")
        keep = (left < len(candidates)) & (
            candidates[np.minimum(left, len(candidates) - 1)] <= hi
        )
        self._decode(np.flatnonzero(keep))

    def _decode(self, idx: np.ndarray) -> None:
        self.doc, self.tf, self.dl = self.decode_idx(idx)

    def decode_idx(self, idx: np.ndarray):
        """Decode the given block rows → (doc, tf, dl) arrays. Blocks are
        independent (deltas reset per block), so idx order is free."""
        if len(idx) == 0:
            return (np.empty(0, np.int64), np.empty(0, np.int64),
                    np.empty(0, np.int64))
        sub = self.blocks.iloc[idx]
        nd = sub["n_docs"].to_numpy(np.int64)
        deltas = vb_decode(b"".join(sub["doc_deltas"])).astype(np.int64)
        doc = _segmented_cumsum(deltas, nd)
        tf = vb_decode(b"".join(sub["tfs"])).astype(np.int64)
        dl = vb_decode(b"".join(sub["dls"])).astype(np.int64)
        if self.tomb is not None:
            # tombstone mask (LSM delete semantics): drop deleted docs at
            # decode; stats stay as-built until compaction
            keep = ~np.isin(doc, self.tomb, assume_unique=True)
            if not keep.all():
                doc, tf, dl = doc[keep], tf[keep], dl[keep]
        return doc, tf, dl

    def decode_idx_split(self, idx: np.ndarray) -> list[tuple]:
        """Decode the given block rows → list of per-block (doc, tf, dl)
        arrays, in ``idx`` order. ONE vb_decode per stream over the
        concatenated buffers (the batch fast path), split by the
        pre-tombstone doc counts, then masked per block — so callers can
        memoize per block without paying per-block decode overhead."""
        if len(idx) == 0:
            return []
        sub = self.blocks.iloc[idx]
        nd = sub["n_docs"].to_numpy(np.int64)
        deltas = vb_decode(b"".join(sub["doc_deltas"])).astype(np.int64)
        doc = _segmented_cumsum(deltas, nd)
        tf = vb_decode(b"".join(sub["tfs"])).astype(np.int64)
        dl = vb_decode(b"".join(sub["dls"])).astype(np.int64)
        ends = np.cumsum(nd)
        starts = ends - nd
        out = []
        for s, e in zip(starts.tolist(), ends.tolist()):
            d, t, l = doc[s:e], tf[s:e], dl[s:e]
            if self.tomb is not None:
                keep = ~np.isin(d, self.tomb, assume_unique=True)
                if not keep.all():
                    d, t, l = d[keep], t[keep], l[keep]
            out.append((d, t, l))
        return out

    def block_bounds(self, stats: dict) -> np.ndarray:
        """Block-max WAND upper bounds from stored (max_tf, min_dl) + df —
        computed at query time so they survive incremental stat drift;
        strict upper bounds under float rounding (the scorer's bound
        contract). Per-term stats (BM25F fields) take precedence for the
        NUMBERS; the scorer choice rides the query-level stats."""
        sc = get_scorer((stats or {}).get("scorer"))
        stats = self.stats or stats
        return sc.bound(
            self.blocks["max_tf"].to_numpy(np.float64),
            self.blocks["min_dl"].to_numpy(np.float64),
            sc.idf(self.df, stats["n_docs"]),
            stats["avgdl"], stats["k1"], stats["b"],
        )

    def positions_arrays(self, doc_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(doc_rep, pos) parallel arrays over blocks overlapping doc_ids,
        doc-major / position-minor sorted. All buffers of the surviving
        blocks decode in ONE vb_decode each; the only per-block Python is
        numpy slicing to split each block's [counts][deltas] stream."""
        lo = self.blocks["min_doc_id"].to_numpy()
        hi_arr = self.blocks["max_doc_id"].to_numpy()
        left = np.searchsorted(doc_ids, lo, side="left")
        keep = (left < len(doc_ids)) & (
            doc_ids[np.minimum(left, len(doc_ids) - 1)] <= hi_arr
        )
        idx = np.flatnonzero(keep)
        if len(idx) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        sub = self.blocks.iloc[idx]
        nd = sub["n_docs"].to_numpy(np.int64)
        docs_all = _segmented_cumsum(
            vb_decode(b"".join(sub["doc_deltas"])).astype(np.int64), nd
        )
        vals = vb_decode(b"".join(sub["positions"])).astype(np.int64)
        counts_parts, delta_parts = [], []
        p = 0
        for n in nd.tolist():
            cnt = vals[p : p + n]
            p += n
            ntok = int(cnt.sum())
            delta_parts.append(vals[p : p + ntok])
            p += ntok
            counts_parts.append(cnt)
        counts = np.concatenate(counts_parts)
        deltas = np.concatenate(delta_parts)
        # deltas reset to absolute at each doc start (postings.py) →
        # per-doc segmented cumsum rebuilds absolute positions
        pos_abs = _segmented_cumsum(deltas, counts)
        return np.repeat(docs_all, counts), pos_abs


def _union_add(doc: np.ndarray, score: np.ndarray,
               d: np.ndarray, s: np.ndarray):
    """One step of the OR union-merge: union doc sets, ADD scores on
    overlap. THE single implementation — the bit-identity contract
    (float add order == sequential union order) lives here, shared by
    _eval_or and the Similar token loop."""
    merged = np.union1d(doc, d)
    ms = np.zeros(len(merged), np.float64)
    if len(doc):
        ms[np.searchsorted(merged, doc)] += score
    ms[np.searchsorted(merged, d)] += s
    return merged, ms


def _ordinalize(cand: np.ndarray, rep: np.ndarray, pos: np.ndarray):
    """Map per-posting doc ids to their ORDINAL in the sorted candidate
    set (dropping docs outside it). The positional checkers pack
    (doc, pos) into one int64 key — packing the ordinal instead of the
    raw id keeps the key in range for ANY doc-id magnitude (snowflake
    ids included): ordinal < len(cand), so ordinal·KEY + pos can't wrap
    for any realistic candidate count × position width."""
    if len(rep) == 0 or len(cand) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    idx = np.searchsorted(cand, rep)
    idx = np.minimum(idx, len(cand) - 1)
    m = cand[idx] == rep
    return idx[m], pos[m]


def _score_arrays(tp: TermPostings, stats: dict) -> np.ndarray:
    sc = get_scorer((stats or {}).get("scorer"))
    stats = tp.stats or stats
    return sc.score(
        tp.tf, tp.dl, sc.idf(tp.df, stats["n_docs"]),
        stats["avgdl"], stats["k1"], stats["b"],
    )


def _topk(doc: np.ndarray, score: np.ndarray, k: int):
    """top-k by (score desc, doc_id asc) — deterministic ties."""
    if len(doc) <= k:
        order = np.lexsort((doc, -score))
        return doc[order], score[order]
    # keep everything >= the kth score so boundary ties resolve by doc_id
    kth = score[np.argpartition(-score, k - 1)[k - 1]]
    keep = np.flatnonzero(score >= kth)
    order = keep[np.lexsort((doc[keep], -score[keep]))][:k]
    return doc[order], score[order]


class SegmentQueryKernel:
    """Evaluate one query AST over one segment's blocks."""

    def __init__(self, blocks: pd.DataFrame, plan: dict, stats: dict, k: int):
        self.plan = plan  # term text → {"term_id", "df", "tokens": [...]}
        self.stats = stats
        # one scorer per query (stats["scorer"], default bm25): score fn
        # + strict block bound threaded through every kernel path
        self._sc = get_scorer(stats.get("scorer"))
        self.k = k
        self.tomb = plan.get("tombstones")
        self.by_tid: dict[int, TermPostings] = {}
        # TermRange members never build per-term frames here: a hot
        # prefix can cover 10^5+ terms, and 10^5 groupby/TermPostings
        # constructions ARE the cost at that scale. Planned (looked-up)
        # tids get eager TermPostings; range terms stay pooled in
        # self._raw and evaluate through the vectorized range paths
        # (_eval_range / _topk_range_pruned), or materialize lazily via
        # _ensure_tps_for_range for compound-query pruning (capped).
        self._raw = blocks
        planned = {int(t) for t in plan.get("df_by_tid", {})}
        if planned:
            tid_col = blocks["term_id"].to_numpy(np.int64)
            sub = (blocks if len(planned) >= len(np.unique(tid_col))
                   else blocks[np.isin(tid_col, sorted(planned))])
            for tid, g in sub.groupby("term_id"):
                df = plan["df_by_tid"].get(int(tid))
                if df is None:
                    df = float(g["df"].iloc[0])
                self.by_tid[int(tid)] = TermPostings(g, df, self.tomb)

    def _raw_tids_in(self, lo: int, hi: int) -> np.ndarray:
        """Distinct term_ids present in this kernel's blocks ∩ [lo, hi]."""
        t = self._raw["term_id"].to_numpy(np.int64)
        return np.unique(t[(t >= lo) & (t <= hi)])

    def _ensure_tps_for_range(self, lo: int, hi: int) -> list[int]:
        """Materialize TermPostings for every range member (compound-
        query pruning path — member count pre-capped by RANGE_GROUP_MAX);
        ONE groupby over the range's sub-frame, not one scan per term."""
        t = self._raw["term_id"].to_numpy(np.int64)
        m = (t >= lo) & (t <= hi)
        out = []
        missing = []
        for tid in np.unique(t[m]).tolist():
            if tid in self.by_tid:
                out.append(tid)
            else:
                missing.append(tid)
        if missing:
            sub = self._raw[m & np.isin(t, missing)]
            for tid, g in sub.groupby("term_id"):
                self.by_tid[int(tid)] = TermPostings(
                    g, float(g["df"].iloc[0]), self.tomb
                )
                out.append(int(tid))
        return sorted(out)

    @classmethod
    def from_term_postings(cls, by_tid: dict[int, TermPostings],
                           stats: dict, k: int) -> "SegmentQueryKernel":
        """Kernel over pre-built TermPostings — the BM25F multi-field
        composer enters here with members drawn from SEVERAL per-field
        indexes (synthetic tid namespace, per-member stats/tombstones on
        each TermPostings), then drives _topk_interval_pruned directly
        with its own group model."""
        self = cls.__new__(cls)
        self.plan = {"tokens_by_text": {}, "df_by_tid": {}}
        self.stats = stats
        self._sc = get_scorer(stats.get("scorer"))
        self.k = k
        self.by_tid = dict(by_tid)
        self.tomb = None
        self._raw = None  # no pooled range paths through this entry
        return self

    def _leaf_tokens(self, text: str) -> list[int] | None:
        """term text → its token term_ids (None if any token unknown)."""
        toks = self.plan["tokens_by_text"].get(text)
        if toks is None or any(t is None for t in toks):
            return None
        return toks

    def eval(self, node) -> tuple[np.ndarray, np.ndarray]:
        """→ (doc_ids sorted asc, scores)."""
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        if node is None:
            return empty
        if isinstance(node, (Term, Phrase)):
            tids = self._leaf_tokens(node.text)
            if not tids:  # unknown token (None) or zero tokens ("" / "   ")
                return empty
            if len(tids) == 1:
                return self._eval_single(tids[0])
            return self._eval_phrase(tids)
        if isinstance(node, Near):
            tids = self._leaf_tokens(node.text)
            if not tids:
                return empty
            if len(set(tids)) == 1:
                # one distinct token (*N"x x", CJK bigram runs): every doc
                # holding the token satisfies the window trivially; score
                # follows the duplicate-occurrence algebra everywhere else
                # (_intersect_scored): count × BM25
                d, s = self._eval_single(tids[0])
                return (d, s * float(len(tids))) if len(tids) > 1 else (d, s)
            return self._eval_near(tids, node.max_interval)
        if isinstance(node, Similar):
            # similar-search is an OR over the text's RARE tokens: the
            # plan-time rewrite resolves node.tids to the top-m known
            # tokens by idf (reference rare-term selection); an
            # OUT-OF-VOCABULARY token contributes nothing (unlike a
            # phrase, where an unknown token makes the whole leaf
            # unmatchable) — only all-unknown yields empty. Unresolved
            # nodes (hand-built ASTs) fall back to every known token.
            if node.tids is not None:
                tids = [t for t, _ in node.tids]
            else:
                toks = self.plan["tokens_by_text"].get(node.text) or []
                tids = [t for t in toks if t is not None]
            if not tids:
                return empty
            # OR over distinct tokens (sorted order → deterministic
            # sums; same union-merge as _eval_or — ONE implementation)
            doc = np.empty(0, np.int64)
            score = np.empty(0, np.float64)
            for t in sorted(set(tids)):
                d, s = self._eval_single(t)
                if len(d) == 0:
                    continue
                doc, score = _union_add(doc, score, d, s)
            return doc, score
        if isinstance(node, TermRange):
            return self._eval_range(node.lo_tid, node.hi_tid)
        if isinstance(node, And):
            return self._eval_and(node.children)
        if isinstance(node, Or):
            return self._eval_or(node.children)
        if isinstance(node, Not):
            # bare NOT yields nothing (matches reference: NOT needs a left set)
            return empty
        raise TypeError(type(node))

    def _range_sub(self, lo: int, hi: int) -> pd.DataFrame:
        """This kernel's block rows for term_ids in [lo, hi], sorted
        (term_id, segment, block_id) — tid-MAJOR pooled order, so any
        per-doc accumulation over the concatenated decode follows
        ascending term_id (the enumerated-OR float sequence)."""
        t = self._raw["term_id"].to_numpy(np.int64)
        return self._raw[(t >= lo) & (t <= hi)].sort_values(
            ["term_id", "segment", "block_id"]
        )

    def _bm25_pooled(self, tf: np.ndarray, dl: np.ndarray,
                     df_rep: np.ndarray) -> np.ndarray:
        """The query's scorer over pooled arrays whose df varies per
        element. idf is computed per UNIQUE df via the scorer's idf fn
        (math.log, not np.log over the array) so every element gets the
        BIT-identical idf the per-term path produces — np.log may differ
        from libm by an ulp."""
        st = self.stats
        uniq, inv = np.unique(df_rep, return_inverse=True)
        idf_u = np.asarray(
            [self._sc.idf(d, st["n_docs"]) for d in uniq.tolist()],
            np.float64,
        )
        return self._sc.score(tf, dl, idf_u[inv],
                              st["avgdl"], st["k1"], st["b"])

    def _eval_range(self, lo: int, hi: int) -> tuple[np.ndarray, np.ndarray]:
        """TermRange ≡ OR over every term_id in [lo, hi] present here,
        scores ADDING per doc in ascending-term_id order — bit-identical
        to the enumerated Or([Term…]) path (np.add.at accumulates in
        concatenation order == the sequential union-merge order, and
        0 + x == x exactly). POOLED: one vb_decode per stream over every
        range block, one bm25 pass with per-element df — zero per-term
        Python/pandas (a 10^5-term prefix is a handful of numpy passes)."""
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        sub = self._range_sub(lo, hi)
        if not len(sub):
            return empty
        _spy_decodes(len(sub))
        nd = sub["n_docs"].to_numpy(np.int64)
        doc = _segmented_cumsum(
            vb_decode(b"".join(sub["doc_deltas"])).astype(np.int64), nd
        )
        tf = vb_decode(b"".join(sub["tfs"])).astype(np.int64)
        dl = vb_decode(b"".join(sub["dls"])).astype(np.int64)
        df_rep = np.repeat(sub["df"].to_numpy(np.float64), nd)
        if self.tomb is not None and len(self.tomb):
            keep = ~np.isin(doc, self.tomb, assume_unique=False)
            if not keep.all():
                doc, tf, dl, df_rep = (doc[keep], tf[keep], dl[keep],
                                       df_rep[keep])
        if not len(doc):
            return empty
        s = self._bm25_pooled(tf, dl, df_rep)
        uniq, inv = np.unique(doc, return_inverse=True)
        agg = np.zeros(len(uniq), np.float64)
        np.add.at(agg, inv, s)
        return uniq, agg

    # --- leaves ------------------------------------------------------------

    def _eval_single(self, tid: int) -> tuple[np.ndarray, np.ndarray]:
        tp = self.by_tid.get(tid)
        if tp is None:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        tp.decode_all()
        return tp.doc, _score_arrays(tp, self.stats)

    def _docs_only(self, node) -> np.ndarray:
        d, _ = self.eval(node)
        return d

    def _phrase_checker(self, tids: list[int]):
        """→ check(cand) -> bool mask: positional adjacency, fully
        vectorized — encode (doc, pos − i) as one int64 key per
        occurrence of token i; a doc matches the phrase iff some key
        survives the intersection of all tokens' key sets (the
        reference's ngram-adjacency check without the per-doc loop). The
        position field is sized from the actual max position (≥20 bits),
        so pathological million-token docs can't alias keys."""
        tps = [self.by_tid[t] for t in tids]

        def check(cand: np.ndarray) -> np.ndarray:
            arrays = []
            max_pos = 0
            for i, tp in enumerate(tps):
                rep, pos = tp.positions_arrays(cand)
                rep, pos = _ordinalize(cand, rep, pos)
                arrays.append((i, rep, pos))
                if len(pos):
                    max_pos = max(max_pos, int(pos.max()))
            KEY = np.int64(1) << np.int64(max(20, max_pos.bit_length() + 1))
            acc = None
            for i, rep, pos in arrays:
                sel = pos >= i
                keys = rep[sel] * KEY + (pos[sel] - i)
                acc = keys if acc is None else np.intersect1d(
                    acc, keys, assume_unique=True
                )
                if len(acc) == 0:
                    return np.zeros(len(cand), bool)
            mask = np.zeros(len(cand), bool)
            mask[np.unique(acc // KEY)] = True
            return mask

        return check

    def _near_checker(self, tids: list[int], max_interval: int):
        """→ check(cand) -> bool mask: the exact near-window test (see
        _eval_near)."""
        uniq = sorted(set(tids))
        tps = [self.by_tid[t] for t in uniq]

        def check(cand: np.ndarray) -> np.ndarray:
            arrays = []
            max_pos = 0
            for tp in tps:
                rep, pos = tp.positions_arrays(cand)
                rep, pos = _ordinalize(cand, rep, pos)
                arrays.append((rep, pos))
                if len(pos):
                    max_pos = max(max_pos, int(pos.max()))
            KEY = np.int64(1) << np.int64(
                max(20, int(max_pos + max_interval).bit_length() + 1)
            )
            keys_u = [rep * KEY + pos for rep, pos in arrays]
            allp = np.concatenate(keys_u)
            allp.sort(kind="stable")
            ok = np.ones(len(allp), bool)
            N = np.int64(max_interval)
            for ku in keys_u:
                idx = np.searchsorted(ku, allp, side="left")
                has = idx < len(ku)
                ki = ku[np.minimum(idx, len(ku) - 1)]
                ok &= has & (ki <= allp + N) & (ki // KEY == allp // KEY)
                if not ok.any():
                    return np.zeros(len(cand), bool)
            mask = np.zeros(len(cand), bool)
            mask[np.unique(allp[ok] // KEY)] = True
            return mask

        return check

    def _eval_phrase(self, tids: list[int]) -> tuple[np.ndarray, np.ndarray]:
        """Adjacent-position AND over the token sequence; score = sum of
        the member tokens' BM25 (term-id order), like ngram query eval."""
        if any(self.by_tid.get(t) is None for t in tids):
            return np.empty(0, np.int64), np.empty(0, np.float64)
        cand, score = self._intersect_scored(tids)
        if len(cand) == 0:
            return cand, score
        keep = self._phrase_checker(tids)(cand)
        return cand[keep], score[keep]

    def _eval_near(self, tids: list[int], max_interval: int
                   ) -> tuple[np.ndarray, np.ndarray]:
        """Near: every token present in the doc with an occurrence set
        whose position span is ≤ max_interval. Exact check, vectorized:
        a valid window exists iff SOME occurrence p (the window minimum)
        has every token occurring in [p, p+N] — verified with one
        searchsorted per token over (doc, pos)-encoded int64 keys.
        Scores = summed member BM25 (same algebra as phrase)."""
        cand, score = self._intersect_scored(tids)
        if len(cand) == 0:
            return cand, score
        keep = self._near_checker(tids, max_interval)(cand)
        return cand[keep], score[keep]

    # --- boolean combinators ------------------------------------------------

    def _intersect_scored(self, tids: list[int]) -> tuple[np.ndarray, np.ndarray]:
        """Rarest-first intersection with block range pruning; scores
        summed in sorted-unique-term order (determinism)."""
        if not tids:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        uniq = sorted(set(tids))
        tps = {t: self.by_tid.get(t) for t in uniq}
        if any(v is None for v in tps.values()):
            return np.empty(0, np.int64), np.empty(0, np.float64)
        order = sorted(uniq, key=lambda t: (tps[t].df, t))
        rare = tps[order[0]]
        rare.decode_all()
        cand = rare.doc
        for t in order[1:]:
            if len(cand) == 0:
                return cand, np.empty(0, np.float64)
            tp = tps[t]
            tp.decode_overlapping(cand)
            cand = cand[np.isin(cand, tp.doc, assume_unique=True)]
        if len(cand) == 0:
            return cand, np.empty(0, np.float64)
        # duplicated tokens in tids (e.g. "a a") score once per occurrence:
        # one pass, weight 1 keeps the no-dup float sequence (x == 1·x)
        from collections import Counter

        c = Counter(tids)
        score = np.zeros(len(cand), np.float64)
        for t in uniq:  # fixed term-id order for float determinism
            tp = tps[t]
            ix = np.searchsorted(tp.doc, cand)
            s = _score_arrays(tp, self.stats)[ix]
            score += s if c[t] == 1 else c[t] * s
        return cand, score

    def _eval_and(self, children) -> tuple[np.ndarray, np.ndarray]:
        pos = [c for c in children if not isinstance(c, Not)]
        neg = [c.child for c in children if isinstance(c, Not)]
        # fast path: all positives are single-token terms → fused
        # rarest-first intersection
        tid_lists = []
        fused = True
        for c in pos:
            if isinstance(c, (Term, Phrase)):
                tids = self._leaf_tokens(c.text)
                if tids is None:
                    return np.empty(0, np.int64), np.empty(0, np.float64)
                if len(tids) == 1:
                    tid_lists.append(tids[0])
                    continue
            fused = False
            break
        if fused and pos:
            doc, score = self._intersect_scored(tid_lists)
        else:
            doc, score = None, None
            for c in pos:
                d, s = self.eval(c)
                if doc is None:
                    doc, score = d, s
                else:
                    # intersect, scores ADD [G: grn_table_select OP_AND]
                    common = np.isin(doc, d, assume_unique=True)
                    doc2 = doc[common]
                    ix = np.searchsorted(d, doc2)
                    doc, score = doc2, score[common] + s[ix]
                if len(doc) == 0:
                    break
            if doc is None:
                doc = np.empty(0, np.int64)
                score = np.empty(0, np.float64)
        for n in neg:
            if len(doc) == 0:
                break
            nd = self._docs_only(n)
            keep = ~np.isin(doc, nd, assume_unique=True)
            doc, score = doc[keep], score[keep]
        return doc, score

    def _eval_or(self, children) -> tuple[np.ndarray, np.ndarray]:
        """Union; scores ADD on overlap [G: grn_table_setoperation OP_OR]."""
        doc = np.empty(0, np.int64)
        score = np.empty(0, np.float64)
        for c in children:
            d, s = self.eval(c)
            if len(d) == 0:
                continue
            doc, score = _union_add(doc, score, d, s)
        return doc, score

    def _topk_single_pruned(self, tid: int) -> tuple[np.ndarray, np.ndarray]:
        """Block-max WAND for a single-term top-k: decode blocks in
        descending upper-bound order, stop once the running kth score
        strictly exceeds every remaining block's bound. Strict comparison
        + the bounds' float headroom keep results identical to the
        exhaustive path, ties and all."""
        tp = self.by_tid.get(tid)
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        if tp is None:
            return empty
        ub = tp.block_bounds(self.stats)
        order = np.argsort(-ub, kind="stable")
        CHUNK = 64
        doc = np.empty(0, np.int64)
        score = np.empty(0, np.float64)
        st = tp.stats or self.stats
        for i in range(0, len(order), CHUNK):
            if len(doc) >= self.k and score[-1] > ub[order[i]]:
                break  # kth best beats every remaining bound
            idx = order[i : i + CHUNK]
            d, tf, dl = tp.decode_idx(idx)
            s = self._sc.score(tf, dl, self._sc.idf(tp.df, st["n_docs"]),
                               st["avgdl"], st["k1"], st["b"])
            doc = np.concatenate([doc, d])
            score = np.concatenate([score, s])
            if len(doc) >= self.k:
                # keep (doc, score) sorted desc so score[-1] IS the kth
                doc, score = _topk(doc, score, self.k)
        return _topk(doc, score, self.k)

    # --- multi-term block-max pruning (interval algorithm) ------------------
    #
    # Doc-id space is partitioned at every block boundary of every query
    # term.  Each interval's upper bound is the sum of the covering blocks'
    # bounds (a term's blocks are doc-disjoint, and every block edge is a
    # boundary, so ≤1 block per term covers an interval); for AND the bound
    # is 0 when any term lacks coverage.  Intervals are processed in
    # descending-bound order; a doc's score is EXACT when its interval is
    # processed (all covering blocks decode), so once the running kth score
    # strictly exceeds the best remaining bound, the rest never decode —
    # rank-identical to the exhaustive path, ties and all.  This is the
    # block-level analogue of BMW/BMM (Ding & Suel 2011; Dimopoulos 2013).

    def _topk_interval_pruned(
        self,
        groups: list[dict],
        mode: str,
        neg_docs: np.ndarray | None = None,
        neg_tids: list[int] | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Interval-pruned top-k over ``groups``.

        A group is one query-AST child, in one of two forms:
        - ``{"kind": "or"|"and", "members": [(tid, w), ...], "post":
          checker|None}`` — kind 'or' = any member matches (plain term /
          OR-of-terms); kind 'and' = every member + an optional
          positional post check (phrase / near);
        - ``{"kind": "disjuncts", "disjuncts": [{"members": [...],
          "post": ...}, ...]}`` — a UNION of conjunctive units in child
          order (an OR child mixing plain terms with phrases/nears):
          each disjunct intersects its members (+ post check), disjunct
          sums add per doc in listed order — the exhaustive _eval_or
          sequence over mixed children.
        ``mode`` 'or' unions groups (scores add in group order — the
        exhaustive _eval_or merge sequence); ``mode`` 'and' intersects
        groups (scores add in group order — the exhaustive non-fused
        _eval_and sequence; fused callers pass sorted-unique
        single-member groups with dup-count weights to match
        _intersect_scored)."""
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))

        def _disjuncts(g) -> list[dict]:
            """Normalize a group to its disjunct list. or-kind → one
            single-member disjunct per member (np.add.at over the flat
            member concat == union-add of singleton disjuncts, so the
            float sequences are unchanged); and-kind → one disjunct."""
            if g["kind"] == "disjuncts":
                return g["disjuncts"]
            if g["kind"] == "or":
                return [{"members": [m], "post": None}
                        for m in g["members"]]
            return [{"members": g["members"], "post": g["post"]}]

        norm = [(g, _disjuncts(g)) for g in groups]
        uniq_tids = sorted({
            t for _, ds in norm for d in ds for t, _ in d["members"]
        })
        tps = {t: self.by_tid[t] for t in uniq_tids}
        lo_d = {t: tps[t].blocks["min_doc_id"].to_numpy(np.int64)
                for t in uniq_tids}
        hi_d = {t: tps[t].blocks["max_doc_id"].to_numpy(np.int64)
                for t in uniq_tids}
        ub_d = {t: tps[t].block_bounds(self.stats) for t in uniq_tids}
        bounds = np.unique(np.concatenate(
            [lo_d[t] for t in uniq_tids]
            + [hi_d[t] + 1 for t in uniq_tids]
        ))
        n_int = len(bounds) - 1
        if n_int <= 0:
            return empty

        # per-token interval structures (shared across groups)
        blk_of_int: dict[int, np.ndarray] = {}
        iub_d: dict[int, np.ndarray] = {}
        for t in uniq_tids:
            s_idx = np.searchsorted(bounds, lo_d[t])
            e_idx = np.searchsorted(bounds, hi_d[t] + 1)
            diff = np.zeros(n_int + 1, np.float64)
            np.add.at(diff, s_idx, ub_d[t])
            np.add.at(diff, e_idx, -ub_d[t])
            iub_d[t] = np.cumsum(diff[:n_int])
            counts = e_idx - s_idx
            blk = np.full(n_int, -1, np.int64)
            starts = np.repeat(s_idx, counts)
            offs = np.arange(int(counts.sum())) - np.repeat(
                np.cumsum(counts) - counts, counts
            )
            blk[starts + offs] = np.repeat(
                np.arange(len(counts), dtype=np.int64), counts
            )
            blk_of_int[t] = blk

        total_ub = np.zeros(n_int, np.float64)
        covered_all = np.ones(n_int, bool)
        for _g, ds in norm:
            g_ub = np.zeros(n_int, np.float64)
            g_cov = np.zeros(n_int, bool)
            for d in ds:
                d_ub = np.zeros(n_int, np.float64)
                d_cov = np.ones(n_int, bool)
                for t, w in d["members"]:
                    d_ub += w * iub_d[t]
                    d_cov &= iub_d[t] > 0
                # a conjunctive unit needs EVERY member token, so
                # intervals missing any member can't contain its docs
                d_ub[~d_cov] = 0.0
                g_ub += d_ub
                g_cov |= d_cov
            total_ub += g_ub
            if mode == "and":
                covered_all &= g_cov
        if mode == "and":
            total_ub[~covered_all] = 0.0
        order = np.argsort(-total_ub, kind="stable")
        order = order[total_ub[order] > 0.0]
        if len(order) == 0:
            return empty

        decoded: dict[tuple[int, int], tuple] = {}

        def _ensure_blocks(t: int, need: np.ndarray) -> None:
            """Batch-decode every not-yet-decoded block of term t in one
            vb_decode pass (per-block decode calls were the dominant cost
            of this path at small scale)."""
            new = [b for b in need.tolist() if (t, b) not in decoded]
            if not new:
                return
            splits = tps[t].decode_idx_split(np.asarray(new, np.int64))
            st = tps[t].stats or self.stats
            for b, (d, tf, dl) in zip(new, splits):
                s = self._sc.score(
                    tf, dl, self._sc.idf(tps[t].df, st["n_docs"]),
                    st["avgdl"], st["k1"], st["b"],
                )
                iid = np.searchsorted(bounds, d, side="right") - 1
                decoded[(t, b)] = (d, s, iid)

        def _member_chunk(t, w, chunk, in_chunk):
            """One member's (sorted docs, weighted scores) within the
            chunk's intervals."""
            d_parts, s_parts = [], []
            need = np.unique(blk_of_int[t][chunk])
            for b in need[need >= 0].tolist():
                d, s, iid = decoded[(t, b)]
                m = in_chunk[iid]
                if m.any():
                    d_parts.append(d[m])
                    s_parts.append(w * s[m] if w != 1.0 else s[m])
            if not d_parts:
                return None
            return np.concatenate(d_parts), np.concatenate(s_parts)

        def _disjunct_docs_scores(d, chunk, in_chunk):
            """(sorted docs, scores) of one conjunctive unit within the
            chunk's intervals: intersect members, scores Σ w·bm25 in
            member order (the exhaustive _intersect_scored sequence for
            phrase/near members, plain per-term score for singletons),
            then the positional post check on the unit's own docs."""
            per = [
                _member_chunk(t, w, chunk, in_chunk) for t, w in d["members"]
            ]
            if any(p is None for p in per):
                return None
            cand = per[0][0]
            for dd, _ in per[1:]:
                if len(cand) == 0:
                    return None
                cand = cand[np.isin(cand, dd, assume_unique=True)]
            if len(cand) == 0:
                return None
            if len(per) == 1:
                score = per[0][1]
            else:
                score = per[0][1][np.searchsorted(per[0][0], cand)].copy()
                for dd, s in per[1:]:
                    score += s[np.searchsorted(dd, cand)]
            if d["post"] is not None:
                keep = d["post"](cand)
                cand, score = cand[keep], score[keep]
                if len(cand) == 0:
                    return None
            return cand, score

        def _group_docs_scores(g_ds, chunk, in_chunk):
            """(sorted docs, aggregated scores) of one group within the
            chunk's intervals: union-add over the group's disjuncts in
            listed order (np.add.at operand order — the exhaustive
            _eval_or sequence over the child's parts)."""
            per = [
                _disjunct_docs_scores(d, chunk, in_chunk) for d in g_ds
            ]
            per = [p for p in per if p is not None]
            if not per:
                return None
            if len(per) == 1:
                return per[0]
            docs_all = np.concatenate([d for d, _ in per])
            uniq_docs, inv = np.unique(docs_all, return_inverse=True)
            agg = np.zeros(len(uniq_docs), np.float64)
            np.add.at(agg, inv, np.concatenate([s for _, s in per]))
            return uniq_docs, agg

        # candidate-driven NOT: single-token negative terms decode only
        # blocks overlapping surviving candidates, chunk by chunk (a huge
        # neg term never fully decodes); complex negs arrive pre-decoded
        # in neg_docs
        neg_state = []
        for t in (neg_tids or []):
            tp = self.by_tid.get(t)
            if tp is not None:
                neg_state.append((
                    tp,
                    tp.blocks["min_doc_id"].to_numpy(np.int64),
                    tp.blocks["max_doc_id"].to_numpy(np.int64),
                    {},
                ))

        def _neg_mask(cand: np.ndarray) -> np.ndarray:
            keep = np.ones(len(cand), bool)
            if neg_docs is not None:
                keep &= ~np.isin(cand, neg_docs, assume_unique=True)
            for tp, nlo, nhi, memo in neg_state:
                left = np.searchsorted(cand, nlo, side="left")
                hit = (left < len(cand)) & (
                    cand[np.minimum(left, len(cand) - 1)] <= nhi
                )
                hit_b = np.flatnonzero(hit)
                new = [b for b in hit_b.tolist() if b not in memo]
                if new:
                    for b, (d, _, _) in zip(
                        new, tp.decode_idx_split(np.asarray(new, np.int64))
                    ):
                        memo[b] = d
                parts = [memo[b] for b in hit_b.tolist()]
                if parts:
                    nd = np.concatenate(parts)  # blocks disjoint+sorted
                    keep &= ~np.isin(cand, nd, assume_unique=True)
            return keep

        k = self.k
        run_doc = np.empty(0, np.int64)
        run_score = np.empty(0, np.float64)
        in_chunk = np.zeros(n_int, bool)
        CHUNK = 32
        i = 0
        while i < len(order):
            if len(run_doc) >= k and run_score[-1] > total_ub[order[i]]:
                break  # kth best strictly beats every remaining interval
            chunk = order[i : i + CHUNK]
            i += CHUNK
            in_chunk[:] = False
            in_chunk[chunk] = True
            for t in uniq_tids:
                need = np.unique(blk_of_int[t][chunk])
                _ensure_blocks(t, need[need >= 0])
            if mode == "or":
                # union-add across groups in child order (the exhaustive
                # _eval_or merge sequence per doc)
                per_group = []
                for _g, ds in norm:
                    got = _group_docs_scores(ds, chunk, in_chunk)
                    if got is not None:
                        per_group.append(got)
                if not per_group:
                    continue
                docs_all = np.concatenate([d for d, _ in per_group])
                uniq_docs, inv = np.unique(docs_all, return_inverse=True)
                agg = np.zeros(len(uniq_docs), np.float64)
                np.add.at(agg, inv,
                          np.concatenate([s for _, s in per_group]))
                cand, cscore = uniq_docs, agg
            else:
                per_group = []
                ok = True
                for _g, ds in norm:
                    got = _group_docs_scores(ds, chunk, in_chunk)
                    if got is None:
                        ok = False
                        break  # a group matched nothing in these intervals
                    per_group.append(got)
                if not ok:
                    continue
                cand = per_group[0][0]
                for gd, _ in per_group[1:]:
                    if len(cand) == 0:
                        break
                    cand = cand[np.isin(cand, gd, assume_unique=True)]
                if len(cand) == 0:
                    continue
                # scores add across groups in group order (exhaustive)
                cscore = per_group[0][1][
                    np.searchsorted(per_group[0][0], cand)
                ].copy()
                for gd, gs in per_group[1:]:
                    cscore += gs[np.searchsorted(gd, cand)]
            if (neg_docs is not None or neg_state) and len(cand):
                keep = _neg_mask(cand)
                cand, cscore = cand[keep], cscore[keep]
            if len(cand) == 0:
                continue
            run_doc = np.concatenate([run_doc, cand])
            run_score = np.concatenate([run_score, cscore])
            if len(run_doc) >= k:
                # keep (doc, score) sorted desc so score[-1] IS the kth
                run_doc, run_score = _topk(run_doc, run_score, k)
        return _topk(run_doc, run_score, k)

    def _topk_range_pruned(self, lo: int, hi: int
                           ) -> tuple[np.ndarray, np.ndarray]:
        """Interval-pruned top-k for a ROOT TermRange (hot prefix).

        Unlike _topk_interval_pruned, all member terms' blocks are POOLED:
        interval bounds come from every block edge, each interval's upper
        bound is Σ covering-block bounds computed in ONE diff/cumsum pass
        over the pooled block arrays, and the working structures are
        O(total blocks) — no per-member arrays, so a prefix covering 10⁶
        lexicon terms costs the same machinery as one fat term. Decoding
        is chunk-driven and memoized; per-doc score addition happens in
        ascending-term_id block order (a doc sits in ≤1 block per term),
        reproducing _eval_range's float sequence exactly — bit-identical
        to the exhaustive path, ties and all."""
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        sub = self._range_sub(lo, hi)
        if not len(sub):
            return empty
        nd = sub["n_docs"].to_numpy(np.int64)
        blo = sub["min_doc_id"].to_numpy(np.int64)
        bhi = sub["max_doc_id"].to_numpy(np.int64)
        df_blk = sub["df"].to_numpy(np.float64)
        st = self.stats
        # per-block bounds with per-row df: idf via math.log per UNIQUE
        # df (bit-matches the per-term path), the scorer's bound formula
        uniq_df, inv_df = np.unique(df_blk, return_inverse=True)
        idf_u = np.asarray(
            [self._sc.idf(d, st["n_docs"]) for d in uniq_df.tolist()],
            np.float64,
        )
        ub = self._sc.bound(
            sub["max_tf"].to_numpy(np.float64),
            sub["min_dl"].to_numpy(np.float64),
            idf_u[inv_df], st["avgdl"], st["k1"], st["b"],
        )

        bounds = np.unique(np.concatenate([blo, bhi + 1]))
        n_int = len(bounds) - 1
        if n_int <= 0:
            return empty
        s_idx = np.searchsorted(bounds, blo)
        e_idx = np.searchsorted(bounds, bhi + 1)
        diff = np.zeros(n_int + 1, np.float64)
        np.add.at(diff, s_idx, ub)
        np.add.at(diff, e_idx, -ub)
        total_ub = np.cumsum(diff[:n_int])
        order = np.argsort(-total_ub, kind="stable")
        order = order[total_ub[order] > 0.0]
        if len(order) == 0:
            return empty

        # decode memo: pooled block idx → (docs, scores, interval ids) —
        # each new chunk batch-decodes ONE vb_decode per stream over the
        # concatenated buffers of its not-yet-seen blocks (never a
        # per-term frame, never a per-block decode call)
        decoded: dict[int, tuple] = {}
        deltas_col = sub["doc_deltas"].to_numpy(object)
        tfs_col = sub["tfs"].to_numpy(object)
        dls_col = sub["dls"].to_numpy(object)

        def _decode_new(new: np.ndarray) -> None:
            if not len(new):
                return
            _spy_decodes(len(new))
            nd_n = nd[new]
            doc = _segmented_cumsum(
                vb_decode(b"".join(deltas_col[new])).astype(np.int64), nd_n
            )
            tf = vb_decode(b"".join(tfs_col[new])).astype(np.int64)
            dl = vb_decode(b"".join(dls_col[new])).astype(np.int64)
            dfr = np.repeat(df_blk[new], nd_n)
            keep = None
            if self.tomb is not None and len(self.tomb):
                keep = ~np.isin(doc, self.tomb, assume_unique=False)
                doc, tf, dl, dfr = doc[keep], tf[keep], dl[keep], dfr[keep]
                nd_k = np.add.reduceat(
                    keep.astype(np.int64), np.cumsum(nd_n) - nd_n
                ) if len(nd_n) else np.empty(0, np.int64)
            else:
                nd_k = nd_n
            s = self._bm25_pooled(tf, dl, dfr)
            iid = np.searchsorted(bounds, doc, side="right") - 1
            ends = np.cumsum(nd_k)
            starts = ends - nd_k
            for j, b in enumerate(new.tolist()):
                sl = slice(int(starts[j]), int(ends[j]))
                decoded[b] = (doc[sl], s[sl], iid[sl])

        k = self.k
        run_doc = np.empty(0, np.int64)
        run_score = np.empty(0, np.float64)
        in_chunk = np.zeros(n_int, bool)
        CHUNK = 32
        i = 0
        while i < len(order):
            if len(run_doc) >= k and run_score[-1] > total_ub[order[i]]:
                break  # kth best strictly beats every remaining interval
            chunk = order[i : i + CHUNK]
            i += CHUNK
            chunk_sorted = np.sort(chunk)
            # pooled blocks covering ANY chunk interval (searchsorted
            # against the 32 sorted interval ids — no interval→block map)
            pos = np.searchsorted(chunk_sorted, s_idx, side="left")
            hit = (pos < len(chunk_sorted)) & (
                chunk_sorted[np.minimum(pos, len(chunk_sorted) - 1)] < e_idx
            )
            need = np.flatnonzero(hit)  # ascending == (term_id, block) order
            _decode_new(np.asarray(
                [b for b in need.tolist() if b not in decoded], np.int64
            ))
            in_chunk[:] = False
            in_chunk[chunk] = True
            d_parts, s_parts = [], []
            for b in need.tolist():
                d, s, iid = decoded[b]
                m = in_chunk[iid]
                if m.any():
                    d_parts.append(d[m])
                    s_parts.append(s[m])
            if not d_parts:
                continue
            docs_all = np.concatenate(d_parts)
            uniq, inv = np.unique(docs_all, return_inverse=True)
            agg = np.zeros(len(uniq), np.float64)
            np.add.at(agg, inv, np.concatenate(s_parts))
            run_doc = np.concatenate([run_doc, uniq])
            run_score = np.concatenate([run_score, agg])
            if len(run_doc) >= k:
                # keep (doc, score) sorted desc so score[-1] IS the kth
                run_doc, run_score = _topk(run_doc, run_score, k)
        return _topk(run_doc, run_score, k)

    #: a TermRange inside a compound query enumerates its members (the
    #: terms present in THIS kernel's blocks) for the generic interval
    #: pruner, whose per-member interval arrays are O(members ×
    #: intervals) — past this cap the query falls back to exhaustive
    #: (root-level ranges use _topk_range_pruned, which pools blocks
    #: and has no per-member arrays, so no cap applies there)
    RANGE_GROUP_MAX = 256

    def _range_members(self, lo: int, hi: int) -> list[int] | None:
        """tids of this kernel's terms inside [lo, hi], ascending, with
        TermPostings materialized; None when too many for the per-member
        interval machinery."""
        if len(self._raw_tids_in(lo, hi)) > self.RANGE_GROUP_MAX:
            return None
        return self._ensure_tps_for_range(lo, hi)

    def _or_disjuncts(self, children) -> list[dict] | None:
        """Or-under-And children → disjunct list in child order: plain
        single-token terms become singleton disjuncts, phrase/near
        leaves become multi-member disjuncts with their positional post
        checks. None → not pruneable. A TermRange child may NOT join
        (the exhaustive _eval_or adds its PRE-aggregated sum —
        ((s_a)+(s_r1+s_r2)) — while disjunct-per-term would add
        ((s_a+s_r1)+s_r2), a different float sequence); ranges under an
        OR-under-AND take the exhaustive path."""
        out = []
        for c in children:
            if not isinstance(c, (Term, Phrase, Near)):
                return None
            g = self._leaf_group(c)
            if g == "empty":
                continue  # unknown/empty leaf contributes nothing
            out.append({"members": g["members"],
                        "post": g.get("post")})
        return out

    #: below this many total blocks the exhaustive path's single batched
    #: decode beats the interval machinery (measured crossover; the
    #: distributed per-shard kernels almost always land here)
    PRUNE_MIN_BLOCKS = 512

    def _leaf_group(self, node):
        """Term/Phrase/Near/Similar leaf → group dict; "empty" when the
        leaf cannot match anything here; None → not pruneable."""
        if isinstance(node, Similar):
            # rare-term-bounded *S ≡ OR over its selected tokens: an
            # or-kind group whose members add in ascending-tid order —
            # exactly the exhaustive Similar eval's _union_add sequence
            # (missing/OOV members contribute nothing there too)
            if node.tids is not None:
                stids = sorted({t for t, _ in node.tids})
            else:
                toks = self.plan["tokens_by_text"].get(node.text) or []
                stids = sorted({t for t in toks if t is not None})
            stids = [t for t in stids if t in self.by_tid]
            if not stids:
                return "empty"
            return {"kind": "or", "members": [(t, 1.0) for t in stids],
                    "post": None}
        tids = self._leaf_tokens(node.text)
        if not tids:
            return "empty"
        if isinstance(node, Near) and len(set(tids)) == 1:
            # degenerate Near: window check is trivial; keep the duplicate-
            # occurrence weight (count × BM25 — mirrors eval())
            if tids[0] not in self.by_tid:
                return "empty"
            return {"kind": "or", "members": [(tids[0], float(len(tids)))],
                    "post": None}
        if len(tids) == 1:
            if tids[0] not in self.by_tid:
                return "empty"
            return {"kind": "or", "members": [(tids[0], 1.0)], "post": None}
        from collections import Counter

        cnt = Counter(tids)
        if any(t not in self.by_tid for t in cnt):
            return "empty"
        post = (self._near_checker(tids, node.max_interval)
                if isinstance(node, Near) else self._phrase_checker(tids))
        return {
            "kind": "and",
            "members": [(t, float(cnt[t])) for t in sorted(cnt)],
            "post": post,
        }

    def _pruned_multi(self, ast):
        """Route prunable roots to the interval pruner: multi-token
        Term/Phrase/Near leaves, ORs of leaves, and ANDs whose positive
        children are leaves or ORs of single-token leaves (phrases and
        nears ride along as "and"-kind groups with positional post
        checks). None → exhaustive fallback."""
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        if len(self._raw) < self.PRUNE_MIN_BLOCKS:
            return None  # tiny posting set: decode-all is cheaper
        if isinstance(ast, TermRange):
            # hot prefix at the root: pooled-block interval pruning — no
            # per-member structures, so NO member cap applies
            return self._topk_range_pruned(ast.lo_tid, ast.hi_tid)
        if isinstance(ast, Similar):
            g = self._leaf_group(ast)
            if g == "empty":
                return empty
            if len(g["members"]) == 1:
                return self._topk_single_pruned(g["members"][0][0])
            return self._topk_interval_pruned([g], "or")
        if isinstance(ast, (Phrase, Term, Near)):
            g = self._leaf_group(ast)
            if g == "empty":
                return empty
            if g["kind"] == "or" and g["members"][0][1] == 1.0:
                return self._topk_single_pruned(g["members"][0][0])
            if g["kind"] == "or":  # weighted single token (degenerate Near)
                return self._topk_interval_pruned([g], "or")
            return self._topk_interval_pruned([g], "and")
        if isinstance(ast, Or):
            groups = []
            for c in ast.children:
                if isinstance(c, TermRange):
                    # one group per range CHILD (members aggregate inside
                    # the group first — the exhaustive per-child order)
                    mem = self._range_members(c.lo_tid, c.hi_tid)
                    if mem is None:
                        return None
                    if mem:
                        groups.append({"kind": "or",
                                       "members": [(t, 1.0) for t in mem],
                                       "post": None})
                    continue
                if not isinstance(c, (Term, Phrase, Near, Similar)):
                    return None
                g = self._leaf_group(c)
                if g == "empty":
                    continue  # contributes nothing, like the exhaustive OR
                groups.append(g)
            if not groups:
                return empty
            if (len(groups) == 1 and groups[0]["kind"] == "or"
                    and len(groups[0]["members"]) == 1
                    and groups[0]["members"][0][1] == 1.0):
                return self._topk_single_pruned(groups[0]["members"][0][0])
            return self._topk_interval_pruned(groups, "or")
        if isinstance(ast, And):
            pos = [c for c in ast.children if not isinstance(c, Not)]
            neg = [c.child for c in ast.children if isinstance(c, Not)]
            if not pos:
                return None
            fused_tids = []
            fused = True
            for c in pos:
                if isinstance(c, (Term, Phrase)):
                    t = self._leaf_tokens(c.text)
                    if not t:  # AND with an unmatchable leaf → empty
                        return empty
                    if len(t) == 1:
                        fused_tids.append(t[0])
                        continue
                fused = False  # multi-token leaf / OR / TermRange child
                break
            if fused:
                # all-single-token AND: sorted-unique groups with dup
                # weights — the exhaustive _intersect_scored order
                from collections import Counter

                cnt = Counter(fused_tids)
                if any(t not in self.by_tid for t in cnt):
                    return empty
                groups = [{"kind": "or", "members": [(t, float(cnt[t]))],
                           "post": None} for t in sorted(cnt)]
            else:
                # general shape: positives are leaves (single-token,
                # phrase, near) or ORs of single-token leaves; groups add
                # in child order — the exhaustive non-fused order
                groups = []
                for c in pos:
                    if isinstance(c, TermRange):
                        mem = self._range_members(c.lo_tid, c.hi_tid)
                        if mem is None:
                            return None
                        if not mem:
                            return empty  # range matches nothing here
                        groups.append({"kind": "or",
                                       "members": [(t, 1.0) for t in mem],
                                       "post": None})
                    elif isinstance(c, (Term, Phrase, Near, Similar)):
                        g = self._leaf_group(c)
                        if g == "empty":
                            return empty  # an AND child can't match
                        groups.append(g)
                    elif isinstance(c, Or):
                        dis = self._or_disjuncts(c.children)
                        if dis is None:
                            return None
                        if not dis:
                            return empty  # OR child matches nothing
                        groups.append({"kind": "disjuncts",
                                       "disjuncts": dis})
                    else:
                        return None
            neg_docs = None
            neg_tids: list[int] = []
            complex_negs = []
            for n in neg:
                t = (self._leaf_tokens(n.text)
                     if isinstance(n, (Term, Phrase)) else None)
                if t is not None and len(t) == 1:
                    neg_tids.append(t[0])  # candidate-driven masking
                elif t is not None and len(t) == 0:
                    continue  # unmatchable neg removes nothing
                else:
                    complex_negs.append(n)
            if complex_negs:
                nd = np.empty(0, np.int64)
                for n in complex_negs:
                    nd = np.union1d(nd, self._docs_only(n))
                neg_docs = nd
            return self._topk_interval_pruned(groups, "and", neg_docs,
                                              neg_tids)
        return None

    def run(self, ast) -> tuple[np.ndarray, np.ndarray]:
        # single-token leaf at the root → block-max WAND pruned path
        if isinstance(ast, (Term, Phrase)):
            tids = self._leaf_tokens(ast.text)
            if tids is not None and len(tids) == 1:
                return self._topk_single_pruned(tids[0])
        pruned = self._pruned_multi(ast)
        if pruned is not None:
            return pruned
        doc, score = self.eval(ast)
        if len(doc) == 0:
            return doc, score
        return _topk(doc, score, self.k)
