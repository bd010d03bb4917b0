"""HTML → text extraction — the per-url byte-identity contract.

The input corpus (BASELINE.json input_hint) carries both ``html:binary``
and ``text:string``; the contract is that extraction of ``html`` recovers
``text`` byte-identically per url. Extraction is a vectorized pandas
stage: strip tags, unescape entities, join block-level text.

Supported shape (FIXTURES.md §1.2): ``<html><head><title>..</title></head>
<body><p>..</p>[<p>..</p>…]</body></html>``; multiple ``<p>`` blocks join
with "\n". General tag-soup HTML is out of scope v1 (the generator and
extractor are the two halves of one frozen contract, golden-tested in
tests/test_extract.py).
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd

EXTRACTOR_VERSION = "p-blocks-1"

_P_RE = re.compile(r"<p>(.*?)</p>", re.DOTALL)


def extract_text_str(html_bytes: bytes) -> str:
    s = html_bytes.decode("utf-8")
    return "\n".join(_html.unescape(m) for m in _P_RE.findall(s))


def extract_text_series(html_col: pd.Series) -> pd.Series:
    """Vectorized batch form: binary html → extracted text."""
    s = html_col.map(lambda b: b.decode("utf-8") if b is not None else "")
    blocks = s.str.findall(_P_RE)
    return blocks.map(lambda ms: "\n".join(_html.unescape(m) for m in ms))
