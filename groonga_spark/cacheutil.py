"""Explicit cache ownership for DataFrames built on persisted intermediates.

Spark's CacheManager substitutes persisted plans into ANY later query by
plan equality, so a leaked ``persist()`` is both a memory leak and a
stale-data hazard when source files are rewritten in place (see
build.assign_dense_ids). Every function in this package that persists an
intermediate therefore *tracks* it on the DataFrame it returns; whoever
runs the final action calls :func:`release` (idempotent) when done.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_gs_persists"


def track(df: DataFrame, persists) -> DataFrame:
    """Attach persisted intermediates (plus any already tracked on them)
    to ``df`` so release(df) can unpersist the whole chain."""
    chain: list[DataFrame] = []
    for p in persists:
        chain.extend(getattr(p, _ATTR, ()))
        chain.append(p)
    setattr(df, _ATTR, [*getattr(df, _ATTR, ()), *chain])
    return df


def release(df: DataFrame) -> None:
    """Unpersist every intermediate tracked on ``df`` (idempotent). The
    DataFrame itself stays valid — re-execution is deterministic, just
    uncached."""
    for p in getattr(df, _ATTR, ()):
        p.unpersist()
    setattr(df, _ATTR, [])
