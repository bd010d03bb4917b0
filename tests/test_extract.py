"""HTML→text extraction byte-identity contract (FIXTURES.md §2)."""

from __future__ import annotations

import pandas as pd

from groonga_spark.extract import extract_text_series, extract_text_str
from gen_pages import gen_pages


def test_generator_roundtrip_byte_identity():
    pages = gen_pages(300, seed=42)
    for p in pages:
        got = extract_text_str(p["html"])
        assert got == p["text"], p["url"]
        assert got.encode("utf-8") == p["text"].encode("utf-8")


def test_series_matches_scalar():
    pages = gen_pages(50, seed=7)
    s = extract_text_series(pd.Series([p["html"] for p in pages]))
    for i, p in enumerate(pages):
        assert s.iloc[i] == p["text"]


def test_multi_paragraph_and_entities():
    h = b"<html><head><title>t</title></head><body><p>a &amp; b</p><p>c &lt;d&gt;</p></body></html>"
    assert extract_text_str(h) == "a & b\nc <d>"


def test_determinism_across_calls():
    a = gen_pages(100, seed=42)
    b = gen_pages(100, seed=42)
    assert a == b


def test_canonical_url(spark):
    """URL canonicalization for url-keyed dedup: lowercase scheme/host,
    fragment stripped, tracking params dropped, default ports removed,
    path/query case preserved."""
    from pyspark.sql import functions as F

    from groonga_spark.extract import canonical_url

    cases = [
        ("HTTP://Example.COM/Path?a=1#frag", "http://example.com/Path?a=1"),
        ("https://Site.org:443/x?utm_source=t&b=2",
         "https://site.org/x?b=2"),
        ("http://h.com:80/p?utm_a=1&utm_b=2", "http://h.com/p"),
        ("http://h.com/p?a=1&fbclid=xyz&b=2", "http://h.com/p?a=1&b=2"),
        ("http://h.com/p?gclid=q", "http://h.com/p"),
        ("https://h.com:8443/p", "https://h.com:8443/p"),  # non-default port
        ("http://h.com/CaseSensitive/Path", "http://h.com/CaseSensitive/Path"),
        ("http://h.com/p#a#b", "http://h.com/p"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["c"] for r in
           df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [w for _, w in cases]


def test_canonical_url_schemeless_defaults_to_http(spark):
    from pyspark.sql import functions as F

    from groonga_spark.extract import canonical_url

    df = spark.createDataFrame(
        [("www.example.com/a?b=1",),
         ("//CDN.Example.com/x",),
         ("HTTP://Example.COM:80/a?utm_source=s&id=2#f",)],
        "url string",
    )
    got = [r[0] for r in df.select(canonical_url(F.col("url"))).collect()]
    assert got == [
        "http://www.example.com/a?b=1",
        "http://cdn.example.com/x",
        "http://example.com/a?id=2",
    ]
