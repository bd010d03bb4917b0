"""Scoring — BM25 default plus a pluggable scorer registry.

The reference defaults to a tf-based ``_score`` with pluggable scorers
[G: lib/scorer.c · grn_scorer_register; scorer_tf_idf]; this engine
standardizes on BM25 (k1=1.2, b=0.75, params recorded in index meta):

    idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d,t) = idf(t) * tf / (tf + k1 * (1 - b + b * dl / avgdl))

``register_scorer`` is the §2.11 extension point: a scorer is a
(score_fn, block_upper_bound_fn[, idf_fn]) triple threaded through
every WAND kernel — the bound fn MUST be a STRICT per-block upper
bound of the score fn or pruning silently drops true hits. Ships
``tf_idf`` as the second scorer [G: lib/scorer.c · scorer_tf_idf].
Query-time selection: ``FulltextIndex.search(..., scorer="tf_idf")``.
Custom scorers registered on the driver only work on the driver-local
query path; distributed queries resolve the scorer by NAME on the
executors, so a custom scorer there must be registered import-time in
a module the executors load.

All math is float64 end-to-end; per-term contributions are summed in
term-sorted order (wand.py) so scores are bit-reproducible across
parallelism — the rank-identity contract (BASELINE.md row 3).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable

import numpy as np

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


def idf(df: float, n_docs: float) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25(
    tf: np.ndarray,
    dl: np.ndarray,
    df: float,
    n_docs: float,
    avgdl: float,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> np.ndarray:
    """Vectorized BM25 for one term over posting arrays."""
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    denom = tf + k1 * (1.0 - b + b * dl / avgdl)
    return idf(df, n_docs) * tf / denom


def block_upper_bounds(
    max_tf: np.ndarray,
    min_dl: np.ndarray,
    idf_el,
    avgdl: float,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> np.ndarray:
    """Per-block upper bound of any member score (monotone in tf, anti-
    monotone in dl) — THE block-max WAND bound, derived at query time
    from stored (max_tf, min_dl) so it stays valid as global stats move.
    ``idf_el`` is a scalar (one term) or per-block array (the pooled
    TermRange path); ×(1+1e-9) keeps the bound a STRICT upper bound
    under float rounding — the pruned≡exhaustive contract depends on
    every caller using THIS one formula."""
    # coerce like bm25 does for tf/dl: the 1e-9 headroom only covers
    # float64 rounding — float32 inputs would void the strict-bound
    # guarantee (~6e-8 relative error) and let a true member outscore it
    max_tf = np.asarray(max_tf, np.float64)
    min_dl = np.asarray(min_dl, np.float64)
    denom = max_tf + k1 * (1.0 - b + b * min_dl / avgdl)
    return idf_el * max_tf / denom * (1.0 + 1e-9)


# ---------------------------------------------------------------------------
# scorer registry (§2.11 extension point)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Scorer:
    """One scorer = elementwise score + STRICT per-block upper bound.

    ``score(tf, dl, idf_el, avgdl, k1, b)`` — float64 array of per-
    posting scores; ``idf_el`` is a scalar (one term) or a per-element
    array (pooled TermRange path) precomputed by ``idf_fn`` — compute
    idf per UNIQUE df with math.log, never np.log over the array (ulp
    differences break bit-identity). ``bound(max_tf, min_dl, idf_el,
    avgdl, k1, b)`` must satisfy bound ≥ every member score of the
    block, including under float rounding (add (1+1e-9) headroom unless
    the formula is monotone-exact)."""

    name: str
    score: Callable
    bound: Callable
    idf: Callable


def _bm25_score(tf, dl, idf_el, avgdl, k1, b) -> np.ndarray:
    tf = np.asarray(tf).astype(np.float64)
    dl = np.asarray(dl).astype(np.float64)
    denom = tf + k1 * (1.0 - b + b * dl / avgdl)
    return idf_el * tf / denom


def _tf_idf_score(tf, dl, idf_el, avgdl, k1, b) -> np.ndarray:
    """[G: lib/scorer.c · scorer_tf_idf] — tf × idf; dl-independent, so
    its block bound needs no dl term."""
    return idf_el * np.asarray(tf).astype(np.float64)


def _tf_idf_bound(max_tf, min_dl, idf_el, avgdl, k1, b) -> np.ndarray:
    # ×(1+1e-9): per-block the product is a monotone-exact bound, but
    # the interval pruner SUMS covering-block bounds via diff/cumsum
    # while a doc's exact score sums per-term products directly — the
    # two float orders can differ by ulps, so the bound needs the same
    # strictness headroom BM25 carries (≫ the ~1e-12 accumulated error)
    return idf_el * np.asarray(max_tf, np.float64) * (1.0 + 1e-9)


SCORERS: dict[str, Scorer] = {}


def register_scorer(name: str, score_fn: Callable,
                    block_upper_bound_fn: Callable,
                    idf_fn: Callable = idf) -> Scorer:
    """Register a scorer under ``name`` for query-time selection
    (``search(..., scorer=name)``) — the reference's
    grn_scorer_register [G: lib/scorer.c]. The bound fn contract is the
    whole pruning correctness story: it must upper-bound score_fn over
    any posting with tf ≤ max_tf and dl ≥ min_dl."""
    sc = Scorer(name, score_fn, block_upper_bound_fn, idf_fn)
    SCORERS[name] = sc
    return sc


def get_scorer(name: str | None) -> Scorer:
    sc = SCORERS.get(name or "bm25")
    if sc is None:
        raise KeyError(
            f"unknown scorer {name!r} (registered: {sorted(SCORERS)}); "
            "custom scorers must be register_scorer()-ed in a module "
            "the executors import for distributed queries"
        )
    return sc


def _tf_score(tf, dl, idf_el, avgdl, k1, b) -> np.ndarray:
    """The reference's DEFAULT ``_score`` is tf-based [G: lib/expr.c ·
    GRN_OP_MATCH score accumulation]; on a WITH_WEIGHT weighted-vector
    index tf IS the element weight, so this scorer returns Σ weights."""
    return np.asarray(tf).astype(np.float64)


def _tf_bound(max_tf, min_dl, idf_el, avgdl, k1, b) -> np.ndarray:
    # no headroom needed: tf values are integers, and integer-valued
    # float64 adds/subtracts (incl. the interval pruner's diff/cumsum)
    # are EXACT below 2^53 — the bound can never round under a score
    return np.asarray(max_tf, np.float64)


register_scorer("bm25", _bm25_score, block_upper_bounds)
register_scorer("tf_idf", _tf_idf_score, _tf_idf_bound)
register_scorer("tf", _tf_score, _tf_bound, idf_fn=lambda df, n_docs: 1.0)
