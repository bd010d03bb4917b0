"""Text analysis for training-data curation: token counting, quality
scoring, language-ID heuristics, document fingerprinting.

These extend the engine beyond the reference (Groonga exposes
tokenization [G: lib/proc/proc_tokenize.c] but no corpus-quality ops) with
the filters a web-scale pretraining pipeline applies per document. All
deterministic, all JVM-side Column algebra (whole-stage codegen; zero
Python per row), so the driver's DuckDB oracle can recompute each one
exactly and results are stable across cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation.
# ASCII classes on purpose — identical semantics in Java regex (Spark)
# and RE2 (DuckDB oracle).
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"

# Minimal stopword marker sets (per-language function words). The corpus
# vocabulary is synthetic, so these are the mechanism's fixture, not a
# linguistic claim.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["und", "der", "die", "das", "ein", "ist"],
    "es": ["el", "la", "los", "de", "que", "es"],
    "fr": ["le", "la", "les", "des", "est", "une"],
}


def words(text_col) -> Column:
    """Whitespace tokens, empties dropped (split on single spaces — the
    corpus is whitespace-normalized upstream)."""
    return F.filter(F.split(text_col, " "), lambda x: x != F.lit(""))


def ws_token_count(text_col) -> Column:
    return F.size(words(text_col))


def bpe_token_count(text_col) -> Column:
    """Token count under the BPE-ish pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(text_col, F.lit(BPE_PATTERN), 0))


def stopword_ratio(text_col, lang: str = "en") -> Column:
    # try_divide + coalesce: an empty/whitespace-only doc (0 tokens) is
    # ratio 0.0, not DIVIDE_BY_ZERO under Spark 4's default ANSI mode
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    ws = words(text_col)
    return F.coalesce(
        F.try_divide(
            F.size(F.filter(ws, lambda x: F.array_contains(sw, x))),
            F.size(ws),
        ),
        F.lit(0.0),
    )


def avg_word_len(text_col) -> Column:
    """Mean token length = non-space chars / token count (0.0 for an
    empty doc — ANSI-safe, see stopword_ratio)."""
    return F.coalesce(
        F.try_divide(
            F.length(F.regexp_replace(text_col, " ", "")),
            ws_token_count(text_col),
        ),
        F.lit(0.0),
    )


def quality_score(text_col) -> Column:
    """Composite document-quality score in [0, 1].

    0.4·min(tokens/100, 1) + 0.3·(1 − en-stopword ratio) +
    0.3·min(avg word len/8, 1) — a linear stand-in for the usual
    Gopher-style heuristic stack; each component is its own column in
    ``token_stats`` so pipelines can re-weight.
    """
    n = ws_token_count(text_col).cast("double")
    return (
        F.lit(0.4) * F.least(n / 100.0, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - stopword_ratio(text_col))
        + F.lit(0.3) * F.least(avg_word_len(text_col) / 8.0, F.lit(1.0))
    )


def lang_scores(text_col) -> dict[str, Column]:
    """Per-language marker-hit counts (the n-gram-heuristic backbone)."""
    ws = words(text_col)

    def _contains(arr):
        # single-arg lambda on purpose: a 2-arg lambda would be read by
        # F.filter as (element, index)
        return lambda x: F.array_contains(arr, x)

    out = {}
    for lang, sw in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in sw])
        out[lang] = F.size(F.filter(ws, _contains(arr)))
    return out


def lang_id(text_col) -> Column:
    """argmax over marker counts; ties → language-code ascending; no
    markers at all → 'und' (BCP-47 undetermined)."""
    scores = lang_scores(text_col)
    ordered = sorted(scores)  # tie-break: asc lang code wins via > on prior max
    pred = F.lit("und")
    best = F.lit(-1)
    for lang in reversed(ordered):  # iterate desc so asc code wins ties with >=
        s = scores[lang]
        cond = (s > 0) & (s >= best)
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
        best = F.when(cond, s).otherwise(best)
    return pred


def doc_fingerprint(text_col) -> Column:
    """Stable 64-bit-equivalent fingerprint: first 16 hex chars of md5 of
    whitespace-collapsed text (cheap exact-dup / shard-routing key)."""
    return F.substring(
        F.md5(F.trim(F.regexp_replace(text_col, r"\s+", " "))), 1, 16
    )


def round4(col) -> Column:
    """Half-up rounding as arithmetic: floor(x·10⁴ + ½)/10⁴.

    Engine round() implementations disagree on exact decimal halves
    (Spark BigDecimal-HALF_UP on the double's true value vs DuckDB's
    decimal-string rounding) — and this corpus's ratios ARE exact
    decimals. Arithmetic rounding gives bit-identical results wherever
    the input doubles are bit-identical, which they are (same IEEE op
    sequence on both engines).
    """
    return F.floor(col * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)


def token_stats(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-doc curation features in one narrow pass (no shuffle)."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ws_token_count(t).alias("n_tokens"),
        bpe_token_count(t).alias("n_bpe_tokens"),
        round4(stopword_ratio(t)).alias("stop_ratio"),
        round4(avg_word_len(t)).alias("avg_word_len"),
        round4(quality_score(t)).alias("quality"),
        lang_id(t).alias("pred_lang"),
        doc_fingerprint(t).alias("fingerprint"),
    )
