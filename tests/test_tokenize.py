"""Tokenizer/normalizer byte-identity golden tests (SURVEY.md §5.2.1).

Model: the reference's golden command suites
[G: test/command/suite/tokenizers/*, .../normalizers/*] — tiny fixture →
exact expected output.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from groonga_spark.normalize import normalize_str, normalize_series
from groonga_spark.tokenize import tokenize_batch, tokenize_str

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_tokens.jsonl")


def _cases():
    with open(GOLDEN) as f:
        return [json.loads(line) for line in f if line.strip()]


@pytest.mark.parametrize("case", _cases(), ids=lambda c: c["id"])
def test_golden(case):
    got = tokenize_str(normalize_str(case["text"]), mode=case["mode"])
    expected = [(e["term"], e["pos"]) for e in case["expected"]]
    assert got == expected


def test_batch_equals_per_string():
    """Batch tokenization must be independent of batching (the index and
    query sides may batch differently; results must not differ)."""
    texts = [normalize_str(c["text"]) for c in _cases() if c["mode"] == "bigram"]
    rows, terms, pos = tokenize_batch(texts, "bigram")
    per_doc: dict[int, list] = {i: [] for i in range(len(texts))}
    for r, t, p in zip(rows.tolist(), terms, pos.tolist()):
        per_doc[r].append((t, p))
    for i, t in enumerate(texts):
        assert per_doc[i] == tokenize_str(t, "bigram"), texts[i]


def test_batch_boundaries_do_not_merge():
    """Adjacent docs in one batch never merge runs across the boundary."""
    rows, terms, pos = tokenize_batch(["abc", "def"], "bigram")
    assert terms == ["abc", "def"]
    assert rows.tolist() == [0, 1]
    assert pos.tolist() == [0, 0]
    rows, terms, pos = tokenize_batch(["日本", "語"], "bigram")
    assert terms == ["日本", "本", "語"]
    assert rows.tolist() == [0, 0, 1]


def test_normalize_series_matches_str():
    import pandas as pd

    raw = [c["text"] for c in _cases()] + [None]
    s = normalize_series(pd.Series(raw, dtype=object))
    for i, t in enumerate(raw):
        assert s.iloc[i] == (normalize_str(t) if t is not None else "")


def test_positions_sequential_per_doc():
    texts = ["one two three", "四五六 seven", ""]
    rows, terms, pos = tokenize_batch(texts, "bigram")
    rows = np.asarray(rows)
    pos = np.asarray(pos)
    for d in np.unique(rows):
        p = pos[rows == d]
        assert p.tolist() == list(range(len(p)))


def test_encoded_tokenizer_equivalence_property():
    """tokenize_batch_encoded must reproduce tokenize_batch exactly —
    hash-dedup (2×64-bit polynomial hashes) may never merge distinct
    tokens or split equal ones. Random unicode incl. CJK, digits,
    symbols, combining chars."""
    import unicodedata

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from groonga_spark.tokenize import tokenize_batch, tokenize_batch_encoded

    alphabet = st.sampled_from(
        list("abcxyz012 .,!狗日本語処理検索ΩΔ中文字") + ["́", "゙"]
    )
    texts_strategy = st.lists(
        st.text(alphabet=alphabet, min_size=0, max_size=60),
        min_size=0, max_size=12,
    )

    @settings(max_examples=150, deadline=None)
    @given(texts_strategy, st.sampled_from(["bigram", "delimit"]))
    def check(texts, mode):
        norm = [unicodedata.normalize("NFKC", t).lower() for t in texts]
        r1, terms, p1 = tokenize_batch(norm, mode)
        r2, codes, uniq, p2 = tokenize_batch_encoded(norm, mode)
        assert (r1 == r2).all() and (p1 == p2).all()
        assert [uniq[c] for c in codes.tolist()] == terms

    check()


def test_trigram_and_configurable_ngram():
    from groonga_spark.tokenize import tokenize_str

    assert tokenize_str("日本語処理", "trigram") == [
        ("日本語", 0), ("本語処", 1), ("語処理", 2), ("処理", 3), ("理", 4)]
    assert tokenize_str("日本語処理", "ngram:4") == [
        ("日本語処", 0), ("本語処理", 1), ("語処理", 2), ("処理", 3), ("理", 4)]
    # word classes unchanged by gram size
    assert tokenize_str("abc 日本", "trigram") == [
        ("abc", 0), ("日本", 1), ("本", 2)]
    import pytest

    with pytest.raises(ValueError):
        tokenize_str("x", "ngram:0")


def test_stop_word_filter_keeps_position_gaps():
    from groonga_spark.tokenize import tokenize_str

    toks = tokenize_str("the big apple", "delimit|stop:the")
    assert toks == [("big", 1), ("apple", 2)]  # gap at position 0 kept


def test_stem_lite_rules():
    from groonga_spark.tokenize import stem_lite

    assert stem_lite("cities") == "city"
    assert stem_lite("running") == "runn"
    assert stem_lite("merged") == "merg"
    assert stem_lite("tables") == "tabl"
    assert stem_lite("glass") == "glass"      # -ss protected
    assert stem_lite("is") == "is"            # too short
    assert stem_lite("word,") == "word,"      # non-alpha untouched
    assert stem_lite("日本語") == "日本語"      # non-ascii untouched


def test_filters_identical_in_both_tokenize_paths():
    from groonga_spark.tokenize import tokenize_batch, tokenize_batch_encoded

    texts = ["the tables were merged", "a feeding frenzy", "stop the stops"]
    for mode in ("delimit|stop:the,a|stem", "bigram|stem", "trigram|stop:the"):
        r1, t1, p1 = tokenize_batch(texts, mode)
        r2, c2, u2, p2 = tokenize_batch_encoded(texts, mode)
        got1 = sorted(zip(r1.tolist(), t1, p1.tolist()))
        got2 = sorted(zip(r2.tolist(), [u2[c] for c in c2.tolist()], p2.tolist()))
        assert got1 == got2, mode
