"""BM25 scoring — the engine's standard scorer (BASELINE.json).

The reference defaults to a tf-based ``_score`` with pluggable scorers
[G: lib/scorer.c · grn_scorer_register; scorer_tf_idf]; this engine
standardizes on BM25 (k1=1.2, b=0.75, params recorded in index meta):

    idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d,t) = idf(t) * tf / (tf + k1 * (1 - b + b * dl / avgdl))

All math is float64 end-to-end; per-term contributions are summed in
term-sorted order (wand.py) so scores are bit-reproducible across
parallelism — the rank-identity contract (BASELINE.md row 3).
"""

from __future__ import annotations

import math

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
