"""snippet/highlight vectorized pandas paths vs the sequential spec
(the reference KWIC algorithm [G: lib/proc/proc_snippet.c])."""

from __future__ import annotations

import html as _html
import random
import re

import pytest
from pyspark.sql import functions as F


def _snippet_ref(text, keywords, width, max_n, open_tag, close_tag):
    """The sequential KWIC spec the vectorized UDF must reproduce."""
    pat = re.compile("|".join(re.escape(k) for k in keywords), re.IGNORECASE)
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
            frag = pat.sub(lambda mm: f"{open_tag}{mm.group(0)}{close_tag}",
                           frag)
        out.append(frag)
        last_end = hi
    return out


def _highlight_ref(text, keywords):
    # reference semantics: match on the SOURCE text, then escape the
    # non-tag segments (escaping first would break &/</> keywords and
    # let keywords match inside generated entities)
    pat = re.compile("|".join(re.escape(k) for k in keywords), re.IGNORECASE)
    if text is None:
        return None
    out, last = [], 0
    for m in pat.finditer(text):
        out.append(_html.escape(text[last:m.start()], quote=False))
        out.append('<span class="keyword">'
                   f'{_html.escape(m.group(0), quote=False)}</span>')
        last = m.end()
    out.append(_html.escape(text[last:], quote=False))
    return "".join(out)


def _texts():
    rng = random.Random(7)
    vocab = ["spark", "SPARK", "merge", "fast", "x", "<b>", "&", "Spark"]
    rows = [None, "", "spark", "no hits here at all"]
    for _ in range(60):
        rows.append(" ".join(rng.choice(vocab)
                             for _ in range(rng.randrange(1, 60))))
    return rows


@pytest.mark.parametrize("width,max_n,tags", [
    (20, 3, ("", "")),
    (8, 2, ("[", "]")),
    (50, 1, ("<em>", "</em>")),
])
def test_snippet_matches_sequential_spec(spark, width, max_n, tags):
    from groonga_spark.functions import snippet_udf

    rows = _texts()
    df = spark.createDataFrame([(i, t) for i, t in enumerate(rows)],
                               "i long, text string")
    snip = snippet_udf(["spark", "merge"], width=width, max_n=max_n,
                       open_tag=tags[0], close_tag=tags[1])
    got = {r["i"]: list(r["snips"])
           for r in df.select("i", snip(F.col("text")).alias("snips"))
           .collect()}
    for i, t in enumerate(rows):
        want = _snippet_ref(t, ["spark", "merge"], width, max_n, *tags)
        assert got[i] == want, (i, t)


def test_snippet_self_overlapping_keywords(spark):
    """Keywords whose occurrences can overlap (finditer yields only
    NON-overlapping matches) must still match the sequential spec —
    the UDF detects the border and falls back to the per-row scan."""
    from groonga_spark.functions import snippet_udf

    rows = ["x aaaaa", "aaaa b aaaa", "", "no hits", "aabcabc abc"]
    for kws, width, max_n in [(["aa"], 2, 3), (["abc", "b"], 6, 2),
                              (["ab", "ba"], 4, 3)]:
        df = spark.createDataFrame([(i, t) for i, t in enumerate(rows)],
                                   "i long, text string")
        snip = snippet_udf(kws, width=width, max_n=max_n)
        got = {r["i"]: list(r["snips"])
               for r in df.select("i", snip(F.col("text")).alias("snips"))
               .collect()}
        for i, t in enumerate(rows):
            assert got[i] == _snippet_ref(t, kws, width, max_n, "", ""), \
                (kws, i, t)


def test_highlight_matches_sequential_spec(spark):
    from groonga_spark.functions import highlight_html_udf

    rows = _texts()
    df = spark.createDataFrame([(i, t) for i, t in enumerate(rows)],
                               "i long, text string")
    hl = highlight_html_udf(["spark", "&"])
    got = {r["i"]: r["html"]
           for r in df.select("i", hl(F.col("text")).alias("html"))
           .collect()}
    for i, t in enumerate(rows):
        assert got[i] == _highlight_ref(t, ["spark", "&"]), (i, t)


def test_rand(spark):
    """rand() ∈ [0,1); rand(max) ∈ [0,max) as long; seeded form is
    reproducible on a fixed partitioning (the only form tests may use)."""
    from groonga_spark.functions import rand

    df = spark.range(0, 200, 1, 2)  # fixed partitioning for determinism
    a = [r["r"] for r in df.select(rand(seed=42).alias("r")).collect()]
    b = [r["r"] for r in df.select(rand(seed=42).alias("r")).collect()]
    assert a == b
    assert all(0.0 <= x < 1.0 for x in a)
    m = [r["m"] for r in df.select(rand(6, seed=7).alias("m")).collect()]
    assert set(m) <= set(range(6)) and len(set(m)) > 1


def test_snippet_length_changing_case_folds(spark):
    """Unicode case mappings that change string LENGTH ('İ' → 'i̇')
    would misalign the vectorized lower-case offsets against the
    original text; such rows must fall back to the sequential spec."""
    from groonga_spark.functions import snippet_udf

    rows = [
        "İİİİİİ kitap okuyorum",      # len('İ'.lower()) == 2 → shift
        "plain kitap here",            # safe row in the same batch
        "ﬀﬀ kitap",                     # 'ﬀ' casefolds to 'ff'
        None,
    ]
    for width, max_n, tags in [(10, 2, ("", "")), (12, 1, ("[", "]"))]:
        df = spark.createDataFrame([(i, t) for i, t in enumerate(rows)],
                                   "i long, text string")
        snip = snippet_udf(["kitap"], width=width, max_n=max_n,
                           open_tag=tags[0], close_tag=tags[1])
        got = {r["i"]: list(r["snips"])
               for r in df.select("i", snip(F.col("text")).alias("snips"))
               .collect()}
        for i, t in enumerate(rows):
            want = _snippet_ref(t, ["kitap"], width, max_n, *tags)
            assert got[i] == want, (i, t, got[i], want)


def test_highlight_per_keyword_tags(spark):
    from groonga_spark.functions import highlight_full_udf, highlight_udf

    df = spark.createDataFrame(
        [("Data beats model; DATAMODEL data",), ("a < b & model",), (None,)],
        "text string",
    )
    spec = [("data", "<b>", "</b>"), ("model", "<i>", "</i>")]
    got = [r[0] for r in
           df.select(highlight_udf(spec)(F.col("text"))).collect()]
    assert got[0] == "<b>Data</b> beats <i>model</i>; <b>DATA</b><i>MODEL</i> <b>data</b>"
    assert got[1] == "a < b & <i>model</i>"  # no escaping by default
    assert got[2] is None

    esc = [r[0] for r in
           df.select(highlight_udf(spec, html_escape=True)(F.col("text")))
           .collect()]
    assert esc[1] == "a &lt; b &amp; <i>model</i>"

    full = [r[0] for r in
            df.select(highlight_full_udf("NormalizerAuto", True, spec)(
                F.col("text"))).collect()]
    assert full == esc
    with pytest.raises(ValueError, match="unsupported normalizer"):
        highlight_full_udf("NormalizerMeCab", False, spec)
    with pytest.raises(ValueError, match="at least one"):
        from groonga_spark.functions import highlight_udf as h
        h([])


def test_index_meta_functions(spark, tmp_path):
    from groonga_spark.build import build_index
    from groonga_spark.functions import (
        index_column_df_ratio,
        index_column_source_records,
    )
    from groonga_spark.search import FulltextIndex

    docs = spark.createDataFrame(
        [(0, "red fish"), (1, "blue fish"), (2, "red wine"), (3, "plain")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "meta_idx")
    build_index(spark, docs, path, mode="delimit")
    idx = FulltextIndex(spark, path)

    ratios = {r["term"]: r["df_ratio"]
              for r in index_column_df_ratio(idx).collect()}
    assert ratios["fish"] == pytest.approx(2 / 4)
    assert ratios["red"] == pytest.approx(2 / 4)
    assert ratios["plain"] == pytest.approx(1 / 4)
    one = index_column_df_ratio(idx, "wine").collect()
    assert len(one) == 1 and one[0]["df_ratio"] == pytest.approx(1 / 4)

    recs = {r["doc_id"]
            for r in index_column_source_records(idx, "red").collect()}
    assert recs == {0, 2}


def test_highlight_escape_matches_on_source_text(spark):
    """html_escape must not break keywords containing & < >: matching
    runs on the SOURCE text (the reference scans the raw column), then
    the non-tag segments are escaped — escaping first would rewrite
    'AT&T' to 'AT&amp;T' and the keyword could never match."""
    from groonga_spark.functions import highlight_udf

    df = spark.createDataFrame(
        [("AT&T rocks",), ("x<y and AT&T",), ("no match here",)],
        "text string",
    )
    spec = [("AT&T", "<b>", "</b>"), ("x<y", "<i>", "</i>")]
    got = [r[0] for r in
           df.select(highlight_udf(spec, html_escape=True)(F.col("text")))
           .collect()]
    assert got[0] == "<b>AT&amp;T</b> rocks"
    assert got[1] == "<i>x&lt;y</i> and <b>AT&amp;T</b>"
    assert got[2] == "no match here"


def test_between_rejects_unknown_border(spark):
    from groonga_spark.functions import between

    with pytest.raises(ValueError, match="border"):
        between(F.col("x"), 0, "inclusive", 10, "include")


def test_highlight_html_matches_on_source(spark):
    """Keywords containing escapable chars must match, and keywords must
    NOT match inside generated entities ('lt' in '&lt;')."""
    from groonga_spark.functions import highlight_html_udf

    df = spark.createDataFrame(
        [("AT&T wins",), ("a < b lt here",)], "text string"
    )
    got = [r[0] for r in
           df.select(highlight_html_udf(["AT&T", "lt"])(F.col("text")))
           .collect()]
    assert got[0] == '<span class="keyword">AT&amp;T</span> wins'
    assert got[1] == 'a &lt; b <span class="keyword">lt</span> here'
