"""Text normalization — the byte-identity contract surface.

Re-expresses Groonga's NormalizerNFKC* family [G: lib/normalizer.c ·
grn_normalizer_normalize; generated tables lib/nfkc*.c]: Unicode NFKC
decomposition/composition plus case unification. Groonga ships ~50k LoC of
generated codepoint tables; we use Python's ``unicodedata`` (same Unicode
NFKC algorithm) applied batch-wise over Arrow columns.

CONTRACT (frozen, versioned): ``normalize_text`` defines the normalized
form every downstream stage (tokenizer, lexicon, query parser) sees.
Changing it invalidates every built index — bump NORMALIZER_VERSION and
rebuild. Golden byte-identity tests: tests/test_tokenize.py.
"""

from __future__ import annotations

import unicodedata

import pandas as pd

NORMALIZER_VERSION = "nfkc-lower-1"


def normalize_str(s: str) -> str:
    """NFKC + lowercase. Single-string form (query side, fixtures)."""
    return unicodedata.normalize("NFKC", s).lower()


def normalize_series(s: pd.Series) -> pd.Series:
    """Vectorized batch form (index side).

    pandas' ``.str.normalize`` / ``.str.lower`` run the tight loop in
    pandas' C dispatch over an Arrow-delivered batch — this is the
    "vectorized pandas UDF" tier of the north rule (no per-row Python at
    the DataFrame layer).
    """
    return s.fillna("").str.normalize("NFKC").str.lower()
