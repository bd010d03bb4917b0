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


# --------------------------------------------------------------------------
# URL canonicalization (pipeline helper for url-keyed dedup)
# --------------------------------------------------------------------------

def canonical_url(col):
    """Canonical form of a URL for dedup / latest-per-url grouping
    (prepare_pages partitions by url; crawls carry the same page under
    trivially-different URLs). Pure Column algebra (codegen, no UDF):

    - scheme and host lowercase (path/query case preserved — it is
      significant on most servers);
    - fragment stripped (never sent to the server);
    - tracking params dropped (utm_*, fbclid, gclid);
    - default ports stripped (:80 http, :443 https);
    - empty leftover '?' and dangling '&' cleaned up.
    """
    from pyspark.sql import functions as F

    u = F.regexp_replace(col, r"#.*$", "")                    # fragment
    # scheme-less crawl records ('www.example.com/a', protocol-relative
    # '//host/p') default to http so they group with their canonical
    # form instead of yielding a malformed '://...' string
    u = F.when(
        u.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://"), u
    ).otherwise(F.concat(F.lit("http://"), F.regexp_replace(u, r"^//", "")))
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    )
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.substring(hostport, 1, F.length(hostport) - 3),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.substring(hostport, 1, F.length(hostport) - 4),
    ).otherwise(hostport)
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", "")
    # drop tracking params wherever they sit in the query string
    rest = F.regexp_replace(rest, r"([?&])(utm_[^=&]*|fbclid|gclid)=[^&]*", "$1")
    rest = F.regexp_replace(rest, r"&&+", "&")      # a=1&&b=2 → a=1&b=2
    rest = F.regexp_replace(rest, r"\?&", "?")      # ?&x=1 → ?x=1
    rest = F.regexp_replace(rest, r"[?&]+$", "")    # trailing ? / &
    return F.concat(scheme, F.lit("://"), host, rest)
