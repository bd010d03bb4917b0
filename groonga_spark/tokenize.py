"""Groonga-style tokenizers, vectorized with numpy over codepoint arrays.

Re-expresses [G: lib/tokenizers.c · TokenBigram / TokenDelimit] semantics
(see SURVEY.md §2.9b). The reference tokenizes record-at-a-time inside a C
cursor [G: lib/token_cursor.c · grn_token_cursor_next]; here a whole Arrow
batch of documents is tokenized at once:

  1. concatenate the batch into one string, decode to a uint32 codepoint
     array (one C call: ``str.encode('utf-32-le')`` → ``np.frombuffer``);
  2. classify every codepoint with a precomputed class table (SPACE /
     ALPHA / DIGIT / SYMBOL / NGRAM);
  3. run-length segment (numpy diff/flatnonzero), never crossing document
     boundaries;
  4. expand runs to tokens with repeat/arange arithmetic — whole tokens
     for alpha/digit/symbol runs, overlapping bigrams + trailing unigram
     for NGRAM (CJK) runs;
  5. slice token strings out of the joined string (the only per-token
     Python step — string materialization for Arrow).

TOKENIZER SEMANTICS (frozen; golden fixtures tests/golden_tokens.jsonl):

``bigram``  — Groonga TokenBigram class: continuous runs of alphabet,
  digit, or symbol codepoints each emit ONE whole token (runs do not merge
  across classes: "abc123" → "abc","123"); CJK-script runs of length n emit
  n-1 overlapping bigrams plus a trailing unigram (run length 1 → one
  unigram); whitespace is skipped. Positions are sequential token-stream
  indices per document.

``delimit`` — Groonga TokenDelimit class: split on Unicode whitespace
  runs only; punctuation stays inside tokens.

``trigram`` / ``ngram:N`` — TokenTrigram and the generalized TokenNgram:
  CJK runs of length L emit L tokens, token i = cp[i : i+N] clipped at
  the run end (trailing partial grams, the reference's behavior). Word
  classes are unchanged. N-gram queries should be ≥ N chars (short
  queries only match trailing partials; the reference's gram-prefix
  search is out of scope v1).

TOKEN FILTERS — composable stages appended to the mode string
[G: plugins/token_filters/ · TokenFilterStopWord / TokenFilterStem]:

  ``<base>|stop:w1,w2,...``  drop exact tokens (applied to normalized
      tokens; surviving tokens KEEP their original positions, so phrases
      across a removed stop word do NOT match — reference behavior);
  ``<base>|stem``            stem-lite English suffix stripper (ies→y,
      ing, ed, es, s — ASCII-alpha tokens only; deliberately minimal,
      deterministic, and replicated in the DuckDB oracle — not Porter).

Filters run in listed order, identically at index and query time (the
mode string is frozen into index meta). The encoded fast path applies
them at VOCAB level (O(distinct terms) string work, never per token).

Input must already be normalized (normalize.py). Query and index sides use
THIS SAME function — the single source of truth the rank-identity contract
depends on.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd

SPACE, ALPHA, DIGIT, SYMBOL, NGRAM = 0, 1, 2, 3, 4

_TABLE_LIMIT = 0x30000  # BMP + SMP + CJK Ext B; above → range fallback

# CJK-script ranges that bigram (Han, Kana, Hangul, Bopomofo, Yi).
_NGRAM_RANGES = (
    (0x1100, 0x11FF),   # Hangul Jamo
    (0x2E80, 0x2FDF),   # CJK radicals / Kangxi
    (0x3040, 0x30FF),   # Hiragana, Katakana
    (0x3105, 0x312F),   # Bopomofo
    (0x3130, 0x318F),   # Hangul compat Jamo
    (0x31A0, 0x31BF),   # Bopomofo ext
    (0x31F0, 0x31FF),   # Katakana phonetic ext
    (0x3400, 0x4DBF),   # CJK Ext A
    (0x4E00, 0x9FFF),   # CJK Unified
    (0xA000, 0xA48F),   # Yi
    (0xAC00, 0xD7AF),   # Hangul syllables
    (0xF900, 0xFAFF),   # CJK compat
    (0xFF66, 0xFF9F),   # halfwidth Katakana (pre-NFKC input safety)
    (0x20000, 0x2FFFF),  # CJK Ext B..F
)

_CLASS_TABLE: np.ndarray | None = None


def _build_class_table() -> np.ndarray:
    """Codepoint → class lookup, built once per process from unicodedata.

    The reference bakes equivalent tables at code-generation time
    [G: lib/nfkc*.c]; we derive them at import from the same Unicode
    character database. ~0.1 s once per executor process.
    """
    import unicodedata

    t = np.full(_TABLE_LIMIT, SYMBOL, dtype=np.uint8)
    for lo, hi in _NGRAM_RANGES:
        if lo < _TABLE_LIMIT:
            t[lo : min(hi + 1, _TABLE_LIMIT)] = NGRAM
    ngram = t == NGRAM
    for cp in range(_TABLE_LIMIT):
        if ngram[cp]:
            continue
        ch = chr(cp)
        if ch.isspace():
            t[cp] = SPACE
            continue
        cat = unicodedata.category(ch)
        c0 = cat[0]
        if c0 == "L" or c0 == "M":  # letters; combining marks bind to them
            t[cp] = ALPHA
        elif cat == "Nd":
            t[cp] = DIGIT
        # else SYMBOL (default)
    return t


def _class_table() -> np.ndarray:
    global _CLASS_TABLE
    if _CLASS_TABLE is None:
        _CLASS_TABLE = _build_class_table()
    return _CLASS_TABLE


def _classify(cp: np.ndarray) -> np.ndarray:
    table = _class_table()
    cls = np.where(cp < _TABLE_LIMIT, table[np.minimum(cp, _TABLE_LIMIT - 1)], SYMBOL)
    if (cp >= _TABLE_LIMIT).any():
        # planes 3+ are Han extensions → NGRAM
        cls = np.where((cp >= 0x30000) & (cp <= 0x3FFFF), NGRAM, cls).astype(np.uint8)
    return cls.astype(np.uint8)


@functools.lru_cache(maxsize=256)
def parse_mode(mode: str) -> tuple[str, int, tuple[tuple[str, object], ...]]:
    """``"trigram|stop:the,a|stem"`` → ("ngram", 3, (("stop", {...}),
    ("stem", None))). The full string is what build_index freezes into
    index meta, so query-side tokenization replays the same stages.
    Cached (immutable result): the encode hot path parses the same mode
    string once per batch for offsets and once for filters."""
    parts = mode.split("|")
    base = parts[0]
    if base.startswith(("pattern:", "split:")):
        # regex bases [G: lib/tokenizers.c · pattern tokenizer /
        # TokenDelimit with a custom pattern]: the regex itself may
        # contain '|', so filters are parsed GREEDILY FROM THE RIGHT
        # (trailing parts that look like filters) and everything before
        # them re-joins into the regex. A regex whose literal tail is
        # '|stem' or '|stop:…' must spell it '(?:stem)' etc.
        n_f = 0
        for p in reversed(parts[1:]):
            if p == "stem" or p.startswith("stop:"):
                n_f += 1
            else:
                break
        pat_parts = parts[: len(parts) - n_f]
        filt_parts = parts[len(parts) - n_f :]
        full = "|".join(pat_parts)
        kind, _, rx = full.partition(":")
        import re as _re

        _re.compile(rx)  # fail fast on a bad pattern
        n: object = rx
        parts = [base, *filt_parts]
    elif base == "bigram":
        kind, n = "ngram", 2
    elif base == "trigram":
        kind, n = "ngram", 3
    elif base.startswith("ngram:"):
        kind, n = "ngram", int(base[6:])
        if n < 1:
            raise ValueError(f"ngram size must be >= 1: {mode}")
    elif base == "delimit":
        kind, n = "delimit", 0
    else:
        raise ValueError(f"unknown tokenizer mode: {mode}")
    filters: list[tuple[str, object]] = []
    for p in parts[1:]:
        if p.startswith("stop:"):
            filters.append(
                ("stop", frozenset(w for w in p[5:].split(",") if w))
            )
        elif p == "stem":
            filters.append(("stem", None))
        else:
            raise ValueError(f"unknown token filter: {p!r} in {mode}")
    return kind, n, tuple(filters)


def stem_lite(t: str) -> str:
    """Minimal deterministic English suffix stripper (NOT Porter) —
    ASCII-alpha tokens only; rules mirrored in the DuckDB oracle SQL."""
    if not (t.isascii() and t.isalpha()):
        return t
    n = len(t)
    if n > 4 and t.endswith("ies"):
        return t[:-3] + "y"
    if n > 5 and t.endswith("ing"):
        return t[:-3]
    if n > 4 and t.endswith("ed"):
        return t[:-2]
    if n > 3 and t.endswith("es"):
        return t[:-2]
    if n > 3 and t.endswith("s") and not t.endswith("ss"):
        return t[:-1]
    return t


def _token_offsets(
    texts: list[str], mode: str
):
    """Shared core: → (joined, cp, row_idx, tok_start, tok_end, pos) or
    None for an empty batch."""
    kind, ngram_n, _ = parse_mode(mode)
    joined = "".join(texts)
    if not joined:
        return None

    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    n = len(cp)
    doc_ends = np.cumsum(np.fromiter((len(t) for t in texts), np.int64, len(texts)))

    if kind in ("pattern", "split"):
        # regex tokenizers: spans come from re (codepoint offsets ==
        # the cp-array/joined-string indexing the shared tail uses).
        # pattern: tokens = the regex's non-overlapping MATCHES
        # split:   regex matches are DELIMITERS; tokens = the gaps.
        # Per-document finditer (regex is not vectorizable) — these
        # modes trade the numpy fast path for expressiveness, which the
        # reference's pattern tokenizers do too.
        import re as _re

        rx = _re.compile(ngram_n)  # ngram_n carries the regex for these
        s_l: list[int] = []
        e_l: list[int] = []
        off = 0
        for t in texts:
            if kind == "pattern":
                for m in rx.finditer(t):
                    if m.end() > m.start():
                        s_l.append(off + m.start())
                        e_l.append(off + m.end())
            else:
                prev = 0
                for m in rx.finditer(t):
                    if m.start() > prev:
                        s_l.append(off + prev)
                        e_l.append(off + m.start())
                    prev = max(prev, m.end())
                if len(t) > prev:
                    s_l.append(off + prev)
                    e_l.append(off + len(t))
            off += len(t)
        tok_start = np.asarray(s_l, np.int64)
        tok_end = np.asarray(e_l, np.int64)
        return _offsets_tail(joined, cp, doc_ends, tok_start, tok_end)

    cls = _classify(cp)
    if kind == "delimit":
        cls = np.where(cls == SPACE, SPACE, ALPHA).astype(np.uint8)

    # run starts: position 0, class changes, document boundaries
    change = np.flatnonzero(cls[1:] != cls[:-1]) + 1
    starts = np.unique(np.concatenate([np.array([0], np.int64), change, doc_ends[:-1]]))
    starts = starts[starts < n]
    ends = np.append(starts[1:], n)
    run_cls = cls[starts]

    word_mask = (run_cls == ALPHA) | (run_cls == DIGIT) | (run_cls == SYMBOL)
    ng_mask = run_cls == NGRAM

    # whole-token runs → one token each
    w_start = starts[word_mask]
    w_end = ends[word_mask]

    # NGRAM runs of length L → L tokens (overlapping N-grams + trailing
    # partials; N=2 is classic TokenBigram)
    g_start = starts[ng_mask]
    g_end = ends[ng_mask]
    g_len = g_end - g_start
    total_g = int(g_len.sum())
    if total_g:
        rep_start = np.repeat(g_start, g_len)
        offs = np.arange(total_g) - np.repeat(np.cumsum(g_len) - g_len, g_len)
        t_start = rep_start + offs
        t_end = np.minimum(t_start + max(ngram_n, 1), np.repeat(g_end, g_len))
    else:
        t_start = np.empty(0, np.int64)
        t_end = np.empty(0, np.int64)

    tok_start = np.concatenate([w_start, t_start])
    tok_end = np.concatenate([w_end, t_end])
    order = np.argsort(tok_start, kind="stable")
    tok_start = tok_start[order]
    tok_end = tok_end[order]
    return _offsets_tail(joined, cp, doc_ends, tok_start, tok_end)


def _offsets_tail(joined, cp, doc_ends, tok_start, tok_end):
    """Shared tail of _token_offsets: start-ordered token spans →
    (joined, cp, row_idx, tok_start, tok_end, pos)."""
    if len(tok_start) == 0:
        return None

    row_idx = np.searchsorted(doc_ends, tok_start, side="right")
    # in-document position = token index within its document's stream
    first_of_doc = np.flatnonzero(np.diff(row_idx, prepend=row_idx[0] - 1))
    pos = np.arange(len(tok_start)) - np.repeat(
        first_of_doc, np.diff(first_of_doc, append=len(tok_start))
    )
    return joined, cp, row_idx.astype(np.int64), tok_start, tok_end, pos.astype(np.int64)


def tokenize_batch(
    texts: "pd.Series | list[str]", mode: str = "bigram"
) -> tuple[np.ndarray, list[str], np.ndarray]:
    """Tokenize a batch of (already normalized) texts.

    Returns ``(row_idx, terms, pos)`` — parallel arrays of the exploded
    token stream: ``row_idx[i]`` is the 0-based index into ``texts`` of
    token ``terms[i]`` at in-document position ``pos[i]``.
    """
    if isinstance(texts, pd.Series):
        texts = texts.tolist()
    texts = ["" if t is None else t for t in texts]
    r = _token_offsets(texts, mode)
    if r is None:
        return np.empty(0, np.int64), [], np.empty(0, np.int64)
    joined, _, row_idx, tok_start, tok_end, pos = r
    # string materialization (per-token slice of one Python str; C-level)
    terms = [joined[s:e] for s, e in zip(tok_start.tolist(), tok_end.tolist())]
    _, _, filters = parse_mode(mode)
    for fname, arg in filters:
        if fname == "stop" and terms:
            keep = np.array([t not in arg for t in terms], bool)
            if not keep.all():
                terms = [t for t, k in zip(terms, keep) if k]
                row_idx, pos = row_idx[keep], pos[keep]  # positions keep gaps
        elif fname == "stem":
            terms = [stem_lite(t) for t in terms]
    return row_idx, terms, pos


_R1 = np.uint64(0x9E3779B97F4A7C15)   # odd → invertible mod 2^64
_R2 = np.uint64(0xC2B2AE3D27D4EB4F)
_R1_INV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))
_R2_INV = np.uint64(pow(0xC2B2AE3D27D4EB4F, -1, 1 << 64))


def _segment_hashes(cp: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                    r: np.uint64, r_inv: np.uint64) -> np.ndarray:
    """Polynomial hash of cp[s:e) per (s, e), all uint64 wraparound:
    H = (P[e] − P[s]) · r⁻ˢ with P[k] = Σ_{j<k} cp[j]·rʲ."""
    n = len(cp)
    with np.errstate(over="ignore"):
        pw = np.multiply.accumulate(
            np.concatenate([[np.uint64(1)], np.full(n - 1, r, np.uint64)])
        )
        inv_pw = np.multiply.accumulate(
            np.concatenate([[np.uint64(1)], np.full(n - 1, r_inv, np.uint64)])
        )
        prefix = np.concatenate(
            [[np.uint64(0)], np.add.accumulate(cp.astype(np.uint64) * pw)]
        )
        return (prefix[ends] - prefix[starts]) * inv_pw[starts]


def tokenize_batch_encoded(
    texts: "pd.Series | list[str]", mode: str = "bigram"
) -> tuple[np.ndarray, np.ndarray, list[str], np.ndarray]:
    """Tokenize a batch → ``(row_idx, codes, uniq_terms, pos)``.

    The index-build fast path: per-token Python strings are NEVER built.
    Tokens are deduplicated at the codepoint level — key = (length,
    first codepoint, two independent 64-bit polynomial hashes; collision
    needs all four equal, ~2⁻¹²⁸) — and only each distinct term's string
    is materialized (one slice per VOCAB entry, not per token).
    ``codes`` index into ``uniq_terms``; code order is the dedup key
    order, not lexicographic — callers must not rely on it.
    """
    if isinstance(texts, pd.Series):
        texts = texts.tolist()
    texts = ["" if t is None else t for t in texts]
    r = _token_offsets(texts, mode)
    if r is None:
        return (np.empty(0, np.int64), np.empty(0, np.int64), [],
                np.empty(0, np.int64))
    joined, cp, row_idx, tok_start, tok_end, pos = r
    h1 = _segment_hashes(cp, tok_start, tok_end, _R1, _R1_INV)
    h2 = _segment_hashes(cp, tok_start, tok_end, _R2, _R2_INV)
    length = (tok_end - tok_start).astype(np.uint64)
    first = cp[tok_start].astype(np.uint64)
    with np.errstate(over="ignore"):
        mixed = (h1 + h2 * _R1 + length * _R2 + first * np.uint64(0x100000001B3))
    # ONE int64 argsort (radix-friendly) instead of a structured-void
    # comparison sort; runs of equal `mixed` are then VERIFIED against
    # the full (h2, length, first) tuple — a disagreement (≈2⁻⁶⁴ per
    # shard) falls back to the exact lexsort
    order = np.argsort(mixed, kind="stable")
    ms = mixed[order]
    new_run = np.empty(len(ms), bool)
    new_run[0] = True
    new_run[1:] = ms[1:] != ms[:-1]
    run_id = np.cumsum(new_run) - 1
    starts = np.flatnonzero(new_run)
    for arr in (h2, length, first):
        a = arr[order]
        if (np.maximum.reduceat(a, starts) != np.minimum.reduceat(a, starts)).any():
            order = np.lexsort((h2, h1, first, length))
            ks = np.stack([length, first, h1, h2])[:, order]
            new_run[0] = True
            new_run[1:] = (ks[:, 1:] != ks[:, :-1]).any(axis=0)
            run_id = np.cumsum(new_run) - 1
            starts = np.flatnonzero(new_run)
            break
    codes = np.empty(len(order), np.int64)
    codes[order] = run_id
    first_idx = order[starts]
    uniq_terms = [
        joined[tok_start[i] : tok_end[i]] for i in first_idx.tolist()
    ]
    # token filters at VOCAB level: O(distinct terms) string work, the
    # exploded stream is only masked/remapped (never re-materialized)
    _, _, filters = parse_mode(mode)
    for fname, arg in filters:
        if fname == "stop":
            stopped = np.array([t in arg for t in uniq_terms], bool)
            if stopped.any():
                tok_keep = ~stopped[codes]
                row_idx = row_idx[tok_keep]
                pos = pos[tok_keep]          # positions keep gaps
                codes = codes[tok_keep]
                kept = np.flatnonzero(~stopped)
                remap = np.full(len(uniq_terms), -1, np.int64)
                remap[kept] = np.arange(len(kept))
                codes = remap[codes]
                uniq_terms = [uniq_terms[i] for i in kept.tolist()]
        elif fname == "stem":
            stemmed = np.array([stem_lite(t) for t in uniq_terms],
                               dtype=object)
            uniq2, inv = np.unique(stemmed, return_inverse=True)
            codes = inv[codes]
            uniq_terms = uniq2.tolist()
    return row_idx, codes, uniq_terms, pos


def tokenize_str(text: str, mode: str = "bigram") -> list[tuple[str, int]]:
    """Single-string convenience (query side, golden tests)."""
    _, terms, pos = tokenize_batch([text], mode)
    return list(zip(terms, pos.tolist()))
