"""Scalar-function surface — Groonga's callable procs re-expressed as
Spark Column expressions (SURVEY.md §2.8).

Every function here is registered in FUNCTIONS and stays JVM-side
(whole-stage codegen) except snippet/highlight, which are Arrow-batched
pandas UDFs (string surgery Spark lacks). Reference loci:
[G: lib/proc.c + lib/proc/proc_*.c + plugins/functions/*.c].
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# string  [G: lib/proc.c · func string_length/string_slice; plugins/functions/string.c]
# --------------------------------------------------------------------------


def string_length(col) -> Column:
    """Normalized-character count (Groonga counts normalized chars)."""
    return F.length(col)


def string_slice(col, start, length) -> Column:
    """0-based slice (Groonga) → Spark 1-based substring shim."""
    return F.substring(col, start + 1, length)


def string_tokenize(col, mode: str = "bigram") -> Column:
    """[G: lib/proc/proc_tokenize.c · proc_tokenize] as an Arrow UDF →
    array<struct<term,pos>>."""
    from pyspark.sql import types as T

    from groonga_spark.normalize import normalize_series
    from groonga_spark.tokenize import tokenize_batch

    schema = T.ArrayType(
        T.StructType(
            [T.StructField("term", T.StringType()), T.StructField("pos", T.IntegerType())]
        )
    )

    @F.pandas_udf(schema)
    def _tok(s: pd.Series) -> pd.Series:
        rows, terms, pos = tokenize_batch(normalize_series(s), mode)
        out: list[list] = [[] for _ in range(len(s))]
        for r, t, p in zip(rows.tolist(), terms, pos.tolist()):
            out[r].append((t, p))
        return pd.Series(out)

    return _tok(col)


def edit_distance(a, b) -> Column:
    return F.levenshtein(a, b)


# --------------------------------------------------------------------------
# snippet / highlight  [G: lib/proc/proc_snippet.c, proc_highlight.c]
# --------------------------------------------------------------------------


def _regex_repl_escape(s: str) -> str:
    """Escape a literal string for use inside an re.sub REPLACEMENT."""
    return s.replace("\\", "\\\\")


def snippet_udf(keywords: list[str], width: int = 100, max_n: int = 3,
                open_tag: str = "", close_tag: str = ""):
    """KWIC extraction: up to max_n windows of ``width`` chars around
    keyword hits (case-insensitive on normalized text).

    Vectorized: per WINDOW (max_n, small) × per KEYWORD, `.str.find`
    locates the next admissible hit and `.str.replace` wraps tags across
    the whole Arrow batch — the regex work is never per-row Python; the
    only per-row ops left are plain C-speed string slices. Equivalent to
    the sequential spec: repeatedly take the leftmost keyword hit whose
    window start lies past the previous window's end."""
    from pyspark.sql import types as T

    pat = re.compile("|".join(re.escape(k) for k in keywords), re.IGNORECASE)
    kws = [k.lower() for k in keywords]
    wrap_repl = (
        f"{_regex_repl_escape(open_tag)}\\g<0>{_regex_repl_escape(close_tag)}"
        if (open_tag or close_tag) else None
    )
    # the vectorized scan admits EVERY occurrence position; finditer (the
    # sequential spec) yields only non-overlapping matches. The two agree
    # unless some keyword occurrence can START inside another match:
    # either a proper suffix of k1 is a prefix of k2 (k2 straddles k1's
    # end) or k2 sits wholly inside k1 past position 0. Detect once; fall
    # back to the sequential scan when overlap is possible.
    overlap_possible = any(
        (k1[i:] == k2[: len(k1) - i] if len(k1) - i <= len(k2)
         else k2 == k1[i : i + len(k2)])
        for k1 in kws for k2 in kws
        for i in range(1, len(k1))
    )
    # re.IGNORECASE matches via casefolding-style equivalences that
    # str.lower() does not perform ('ſ'≡'s', 'K'≡'k'), and some case
    # mappings change string LENGTH ('İ'.lower() → 'i̇'), which would
    # misalign the vectorized offsets against the original text. If any
    # KEYWORD carries such a character the vectorized scan can never be
    # trusted; for text rows we check per batch below.
    fold_unsafe_keywords = any(k.casefold() != k.lower() for k in kws)

    def _one_sequential(text):
        if text is None:
            return []
        out = []
        last_end = -1
        for m in pat.finditer(text):
            if len(out) >= max_n:
                break
            lo = max(0, m.start() - width // 2)
            hi = min(len(text), lo + width)
            if lo <= last_end:
                continue
            frag = text[lo:hi]
            if open_tag or close_tag:
                frag = pat.sub(
                    lambda mm: f"{open_tag}{mm.group(0)}{close_tag}", frag
                )
            out.append(frag)
            last_end = hi
        return out

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _snip(s: pd.Series) -> pd.Series:
        import numpy as np

        if overlap_possible or fold_unsafe_keywords:
            return s.map(_one_sequential)
        text = s.fillna("")
        lower = text.str.lower()
        # Rows whose lowercase differs in length from the original
        # (e.g. 'İ' → 'i̇') would misalign slice offsets, and rows where
        # casefold ≠ lower carry IGNORECASE-only equivalences the
        # vectorized .str.find cannot see — route the batch through the
        # sequential spec when any such row exists (rare in practice).
        if ((lower.str.len() != text.str.len())
                | (text.str.casefold() != lower)).any():
            return s.map(_one_sequential)
        n = text.str.len().to_numpy(np.int64)
        # last_end < 0 ⇒ first window admits any hit (lo = max(0, ·) ≥ 0)
        last_end = np.full(len(s), -1, np.int64)
        frag_cols: list[pd.Series] = []
        for _w in range(max_n):
            # next admissible hit: leftmost keyword occurrence at
            # position ≥ p0, where lo = max(0, pos − width/2) > last_end
            p0 = np.where(last_end < 0, 0, last_end + width // 2 + 1)
            tail = pd.Series(
                [t[p:] for t, p in zip(lower.tolist(), p0.tolist())]
            )
            pos = np.full(len(s), -1, np.int64)
            for k in kws:
                f = tail.str.find(k).to_numpy(np.int64)
                hit = f >= 0
                pos = np.where(
                    hit & ((pos < 0) | (f < pos)), f, pos
                )
            hit = pos >= 0
            start = p0 + pos
            lo = np.maximum(0, start - width // 2)
            hi = np.minimum(n, lo + width)
            frag = pd.Series(
                [
                    t[int(a):int(b)] if h else None
                    for t, a, b, h in zip(
                        text.tolist(), lo.tolist(), hi.tolist(),
                        hit.tolist(),
                    )
                ]
            )
            if wrap_repl is not None:
                frag = frag.str.replace(pat, wrap_repl, regex=True)
            frag_cols.append(frag)
            last_end = np.where(hit, hi, np.iinfo(np.int64).max - width)
        out = [
            [f for f in frags if f is not None]
            for frags in zip(*(c.tolist() for c in frag_cols))
        ]
        # nulls in, empty snippet lists out (the sequential spec)
        return pd.Series(out, index=s.index)

    return _snip


def _html_esc(x: str) -> str:
    """html.escape(quote=False) semantics, shared by the highlighters."""
    return x.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def highlight_html_udf(keywords: list[str]):
    """Wrap keyword hits in <span class="keyword">…</span> with the
    surrounding text HTML-escaped, like [G: lib/proc/proc_highlight.c ·
    highlight_html]. Matching runs on the SOURCE text — escaping first
    would stop keywords containing & < > from ever matching and let
    keywords match INSIDE generated entities ('lt' in '&lt;'), the
    reference scans the raw column.

    Rows without any of & < > take a vectorized `.str.replace` (escape
    is the identity there, so match-then-escape ≡ the single template
    replace); only rows carrying escapable characters pay the per-row
    segment walk."""
    from pyspark.sql import types as T

    pat = re.compile("|".join(re.escape(k) for k in keywords), re.IGNORECASE)
    tmpl = r'<span class="keyword">\g<0></span>'

    def _one(text: str) -> str:
        out, last = [], 0
        for m in pat.finditer(text):
            out.append(_html_esc(text[last:m.start()]))
            out.append(f'<span class="keyword">{_html_esc(m.group(0))}</span>')
            last = m.end()
        out.append(_html_esc(text[last:]))
        return "".join(out)

    @F.pandas_udf(T.StringType())
    def _hl(s: pd.Series) -> pd.Series:
        mask = s.str.contains(r"[&<>]", regex=True, na=False)
        if not mask.any():
            return s.str.replace(pat, tmpl, regex=True)
        out = s.copy()
        out[~mask] = s[~mask].str.replace(pat, tmpl, regex=True)
        out[mask] = s[mask].map(_one, na_action="ignore")
        return out

    return _hl


def highlight_udf(spec: list[tuple[str, str, str]],
                  html_escape: bool = False):
    """[G: lib/proc/proc_highlight.c · highlight] — PER-KEYWORD tag
    pairs: ``spec = [(keyword, open_tag, close_tag), ...]``, optional
    HTML escaping of the surrounding text (the reference's trailing
    ``{"html_escape": true}`` map argument).

    One combined alternation regex (leftmost-FIRST, matching the
    reference's scan order — list more-specific keywords first) with a
    per-MATCH callable picking that keyword's tags. Per-match Python is
    deliberate: unlike highlight_html's single shared tag there is no
    string template for N tag pairs, and highlight runs over the final
    top-k page (≤ limit rows), never a corpus scan."""
    from pyspark.sql import types as T

    if not spec:
        raise ValueError("highlight needs at least one (keyword, open, close)")
    pat = re.compile(
        "|".join(f"({re.escape(k)})" for k, _o, _c in spec), re.IGNORECASE
    )
    tags = [(o, c) for _k, o, c in spec]

    def _repl(m: re.Match) -> str:
        o, c = tags[m.lastindex - 1]
        return f"{o}{m.group(0)}{c}"

    _esc = _html_esc

    def _one_escape(text: str) -> str:
        # match on the SOURCE text (escaping first would break keywords
        # containing & < > — 'AT&T' never occurs in 'AT&amp;T'), then
        # escape the non-tag segments: unmatched text and the matched
        # keyword occurrence, with the caller's tags inserted raw
        out, last = [], 0
        for m in pat.finditer(text):
            o, c = tags[m.lastindex - 1]
            out.append(_esc(text[last:m.start()]))
            out.append(f"{o}{_esc(m.group(0))}{c}")
            last = m.end()
        out.append(_esc(text[last:]))
        return "".join(out)

    @F.pandas_udf(T.StringType())
    def _hl(s: pd.Series) -> pd.Series:
        if html_escape:
            return s.map(_one_escape, na_action="ignore")
        return s.str.replace(pat, _repl, regex=True)

    return _hl


def highlight_full_udf(normalizer: str, html_escape: bool,
                       spec: list[tuple[str, str, str]]):
    """[G: lib/proc/proc_highlight.c · highlight_full] — the explicit
    form: ``highlight_full(column, normalizer, use_html_escape,
    keyword1, open1, close1, ...)``. Same engine as ``highlight``; the
    normalizer argument is validated against the engine's frozen
    normalizer (NormalizerAuto ≈ NFKC + casefold, normalize.py) — other
    normalizers aren't part of the frozen contract."""
    if normalizer not in ("NormalizerAuto", "NormalizerNFKC"):
        raise ValueError(
            f"unsupported normalizer {normalizer!r}: the engine freezes "
            "NFKC normalization (SURVEY.md §2.9a); use NormalizerAuto"
        )
    return highlight_udf(spec, html_escape=html_escape)


# --------------------------------------------------------------------------
# index-meta functions  [G: plugins/functions/index_column.c]
# --------------------------------------------------------------------------


def index_column_df_ratio(index, term: str | None = None):
    """[G: plugins/functions/index_column.c · index_column_df_ratio] —
    per-term document-frequency ratio df / N. The data is a lexicon
    column join'd with meta; this wrapper names it. ``term=None``
    returns the ratio for every lexicon term."""
    n_docs = max(1, int(index.meta["n_docs"]))
    out = index.lexicon.select(
        "term", "df", (F.col("df") / F.lit(float(n_docs))).alias("df_ratio")
    )
    if term is not None:
        out = out.filter(F.col("term") == term)
    return out


def index_column_source_records(index, term: str):
    """[G: plugins/functions/index_column.c · index_column_source_records]
    — the doc ids whose postings contain ``term``: the index-backed
    reverse traversal as a named callable (exact Term AST — no QL
    parsing, so metacharacters in the term are safe)."""
    from groonga_spark.ql import Term

    return index.match_ast(Term(term)).select("doc_id")


# --------------------------------------------------------------------------
# math / misc  [G: lib/proc.c · func math_abs, number_round, rand, now]
# --------------------------------------------------------------------------


def math_abs(col) -> Column:
    return F.abs(col)


def number_round(col, scale: int = 0) -> Column:
    return F.round(col, scale)


def now() -> Column:
    return F.current_timestamp()


def rand(max: int | None = None, seed: int | None = None) -> Column:  # noqa: A002
    """[G: lib/proc.c · func rand] — ``rand()`` → double in [0, 1),
    ``rand(max)`` → int in [0, max). Non-deterministic by nature (the
    reference seeds from time); pass ``seed`` for reproducible runs —
    with a fixed seed AND a fixed partitioning Spark's rand is
    deterministic, which is why only the seeded form appears in tests
    and no oracle exists (DuckDB's PRNG can't match Spark's)."""
    r = F.rand(seed) if seed is not None else F.rand()
    if max is None:
        return r
    return F.floor(r * F.lit(int(max))).cast("long")


# --------------------------------------------------------------------------
# time_classify_*  [G: plugins/functions/time.c · time_classify_*]
# --------------------------------------------------------------------------

_UNITS = {"second", "minute", "hour", "day", "week", "month", "year"}


def time_classify(unit: str, col) -> Column:
    if unit not in _UNITS:
        raise ValueError(f"unknown unit {unit}")
    return F.date_trunc(unit, col)


def time_classify_minute_interval(col, n: int) -> Column:
    """Floor ts to n-minute buckets (time_classify_*_interval family).
    F.floor, NOT cast('long'): casting truncates toward zero, which
    pushes pre-epoch timestamps one interval too LATE."""
    secs = F.unix_timestamp(col)
    return F.timestamp_seconds(
        F.floor(secs / (n * 60)).cast("long") * (n * 60)
    )


def time_format(col, fmt: str) -> Column:
    return F.date_format(col, fmt)


def time_format_iso8601(col) -> Column:
    return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")


# --------------------------------------------------------------------------
# vector_*  [G: lib/proc.c / plugins/functions/vector.c]
# --------------------------------------------------------------------------


def vector_size(col) -> Column:
    return F.size(col)


def vector_slice(col, i: int, n: int) -> Column:
    return F.slice(col, i + 1, n)


def vector_new(*cols) -> Column:
    return F.array(*cols)


def vector_find(col, value) -> Column:
    """0-based index or -1, from Spark's 1-based array_position."""
    return (F.array_position(col, value) - 1).cast("long")


def vector_join(col, sep: str) -> Column:
    return F.array_join(col, sep)


# --------------------------------------------------------------------------
# predicates  [G: lib/proc.c · func between/in_values/all_records]
# --------------------------------------------------------------------------


def between(col, lo, lo_border: str, hi, hi_border: str) -> Column:
    for b in (lo_border, hi_border):
        if b not in ("include", "exclude"):
            # the reference rejects unknown border specifiers; treating a
            # typo ('inclusive') as exclusive silently drops boundary rows
            raise ValueError(f"between border must be 'include' or "
                             f"'exclude', got {b!r}")
    left = col >= lo if lo_border == "include" else col > lo
    right = col <= hi if hi_border == "include" else col < hi
    return left & right


def in_values(col, *values) -> Column:
    return col.isin(*values)


def all_records() -> Column:
    return F.lit(True)


# --------------------------------------------------------------------------
# geo functions  [G: lib/geo.c · grn_geo_distance{,_rectangle,_sphere},
# geo_in_circle, geo_in_rectangle; GeoPoint "lat x lon" literals]
#
# Pure Column algebra — no UDF. Points are "latxlon" strings: values
# with a '.' are degrees, bare integers are milliseconds of arc (the
# reference's GeoPoint convention). Distances in meters on the IUGG
# mean radius R = 6371008.8 m (our documented constant — the reference's
# internal constants are not copied):
#   rectangular: R · √(Δφ² + (Δλ·cos((φ1+φ2)/2))²)  (fast, small areas)
#   sphere:      haversine great-circle
# --------------------------------------------------------------------------

GEO_RADIUS_M = 6371008.8


def _geo_part(point, idx: int) -> Column:
    p = F.split(point, "x")[idx]
    # degrees if a decimal point is present, else milliseconds of arc
    return F.when(p.contains("."), p.cast("double")).otherwise(
        p.cast("double") / F.lit(3600000.0)
    )


def _geo_col(point) -> Column:
    # strings are COLUMN NAMES (the convention across this module);
    # pass literal points as F.lit("35.68x139.76")
    return point if isinstance(point, Column) else F.col(point)


def geo_lat(point) -> Column:
    return _geo_part(_geo_col(point), 0)


def geo_lon(point) -> Column:
    return _geo_part(_geo_col(point), 1)


def geo_distance(a, b, approx: str = "rectangular") -> Column:
    """Distance in meters between two "latxlon" points."""
    a, b = _geo_col(a), _geo_col(b)
    la1, lo1 = F.radians(geo_lat(a)), F.radians(geo_lon(a))
    la2, lo2 = F.radians(geo_lat(b)), F.radians(geo_lon(b))
    if approx in ("rectangular", "rect"):
        x = (lo2 - lo1) * F.cos((la1 + la2) / F.lit(2.0))
        y = la2 - la1
        return F.sqrt(x * x + y * y) * F.lit(GEO_RADIUS_M)
    if approx in ("sphere", "sphr"):
        h = (
            F.pow(F.sin((la2 - la1) / 2), F.lit(2.0))
            + F.cos(la1) * F.cos(la2)
            * F.pow(F.sin((lo2 - lo1) / 2), F.lit(2.0))
        )
        return F.lit(2.0 * GEO_RADIUS_M) * F.asin(F.sqrt(h))
    raise ValueError(f"unknown geo approximation {approx!r} "
                     "(rectangular | sphere)")


def geo_in_circle(point, center, radius_m, approx: str = "rectangular") -> Column:
    """True iff point lies within radius_m meters of center."""
    r = radius_m if isinstance(radius_m, Column) else F.lit(float(radius_m))
    return geo_distance(point, center, approx) <= r


def geo_in_rectangle(point, top_left, bottom_right) -> Column:
    """True iff point lies in the lat/lon-aligned rectangle."""
    p, tl, br = _geo_col(point), _geo_col(top_left), _geo_col(bottom_right)
    return (
        (geo_lat(p) <= geo_lat(tl)) & (geo_lat(p) >= geo_lat(br))
        & (geo_lon(p) >= geo_lon(tl)) & (geo_lon(p) <= geo_lon(br))
    )


FUNCTIONS = {
    "string_length": string_length,
    "string_slice": string_slice,
    "string_tokenize": string_tokenize,
    "edit_distance": edit_distance,
    "snippet": snippet_udf,
    "highlight_html": highlight_html_udf,
    "math_abs": math_abs,
    "number_round": number_round,
    "now": now,
    "rand": rand,
    "time_classify": time_classify,
    "time_classify_minute_interval": time_classify_minute_interval,
    "time_format": time_format,
    "time_format_iso8601": time_format_iso8601,
    "vector_size": vector_size,
    "vector_slice": vector_slice,
    "vector_new": vector_new,
    "vector_find": vector_find,
    "vector_join": vector_join,
    "between": between,
    "in_values": in_values,
    "all_records": all_records,
    "geo_distance": geo_distance,
    "geo_in_circle": geo_in_circle,
    "geo_in_rectangle": geo_in_rectangle,
}
