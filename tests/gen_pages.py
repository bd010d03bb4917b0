"""Deterministic synthetic Common-Crawl-style ``pages`` generator.

FIXTURES.md §1.2: pure function of (i, seed); same url → same bytes at any
scale/parallelism, so per-url byte-identity is checkable across runs.
Text mix: 80% ASCII Zipf word soup, 15% NFKC-trap chars, 5% CJK runs.
~5% duplicate urls with later warc_ts (exercises latest-per-url dedup).
"""

from __future__ import annotations

import datetime
import hashlib
import html as _html

_VOCAB_SIZE = 30000
_NFKC_TRAPS = ["ﬁle", "①", "②", "㎞", "Ａｂｃ", "ＸＹＺ", "½", "Ⅳ"]
_CJK_CHARS = "日本語処理検索索引転置圧縮分散高速化データ解析"
_EPOCH = datetime.datetime(2024, 1, 1)


def _rand(i: int, salt: str) -> int:
    h = hashlib.sha256(f"{salt}:{i}".encode()).digest()
    return int.from_bytes(h[:8], "big")


def _zipf_word(r: int) -> str:
    # Quadratic skew, NOT true Zipf: P(w_k) ∝ 2k+1, so HIGH indices are
    # the frequent ones and the skew is mild (top word in <1% of docs).
    # FROZEN as-is — the tokenizer byte-identity goldens hash these
    # exact bytes. Head-term / high-df coverage comes from the driver
    # testdata corpora (e.g. 'table' in 77% of docs), not this fixture.
    rank = (r % (_VOCAB_SIZE * _VOCAB_SIZE)) ** 0.5
    return f"w{int(rank)}"


def gen_text(i: int, seed: int = 42) -> str:
    r0 = _rand(i, f"text{seed}")
    n_words = 20 + r0 % 180
    kind = r0 % 100
    words = [_zipf_word(_rand(i * 1000 + j, f"w{seed}")) for j in range(n_words)]
    if kind >= 95:  # 5% CJK runs interleaved
        for j in range(0, n_words, 7):
            r = _rand(i * 77 + j, f"cjk{seed}")
            run = "".join(
                _CJK_CHARS[(r >> (4 * t)) % len(_CJK_CHARS)] for t in range(2 + r % 5)
            )
            words[j] = run
    elif kind >= 80:  # 15% NFKC traps sprinkled
        for j in range(0, n_words, 11):
            words[j] = _NFKC_TRAPS[_rand(i + j, f"trap{seed}") % len(_NFKC_TRAPS)]
    return " ".join(words)


def gen_page(i: int, seed: int = 42) -> dict:
    # no n_docs arg: same url -> same bytes at ANY scale, by construction
    dup = _rand(i, f"dup{seed}") % 100 < 5 and i >= 20
    base = i - (1 + _rand(i, f"dupof{seed}") % 19) if dup else i
    url = f"https://site{base % 1000}.example/p/{base}"
    text = gen_text(base, seed)
    ts = _EPOCH + datetime.timedelta(
        seconds=i * 37 + (_rand(i, f"ts{seed}") % 1000000 if dup else 0)
    )
    title = f"Page {base}"
    htm = (
        f"<html><head><title>{title}</title></head>"
        f"<body><p>{_html.escape(text, quote=False)}</p></body></html>"
    ).encode("utf-8")
    langs = ["en", "fr", "es", "de", "zh"]
    return {
        "url": url,
        "warc_ts": ts,
        "html": htm,
        "text": text,
        "lang": langs[_rand(base, f"lang{seed}") % 5],
    }


def gen_pages(n_docs: int, seed: int = 42) -> list[dict]:
    return [gen_page(i, seed) for i in range(n_docs)]


def pages_df(spark, n_docs: int, seed: int = 42, n_partitions: int = 8):
    """pages as a Spark DataFrame with the contract schema."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    rows = [
        (p["url"], p["warc_ts"], p["html"], p["text"], p["lang"])
        for p in gen_pages(n_docs, seed)
    ]
    return spark.createDataFrame(rows, schema).repartition(n_partitions)
