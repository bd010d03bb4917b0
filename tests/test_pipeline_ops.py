"""Unit tests for the training-data pipeline ops (dedup, similarity,
text stats, multimodal plumbing) against independent python/numpy
oracles over the sf0.001 corpus."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def doc_rows(docs):
    return [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_rows(emb):
    rows = emb.select("vec_id", "embedding").collect()
    return {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}


# --------------------------------------------------------------------------
# dedup
# --------------------------------------------------------------------------

def _shingle_set(text: str, n: int = 3) -> set[str]:
    w = text.split(" ")
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)} if len(w) >= n else set()


def test_exact_dup_groups(spark, docs, doc_rows):
    from groonga_spark.dedup import exact_dup_groups

    got = {r["content_hash"]: (r["n_docs"], r["keep_id"])
           for r in exact_dup_groups(docs).collect()}
    by_hash: dict[str, list[int]] = {}
    for d, t in doc_rows:
        by_hash.setdefault(hashlib.md5(t.encode()).hexdigest(), []).append(d)
    assert got == {h: (len(ids), min(ids)) for h, ids in by_hash.items()}


def test_drop_exact_dups_keeps_min_id(spark, docs):
    from pyspark.sql import functions as F

    from groonga_spark.dedup import drop_exact_dups

    dup = docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 100000))
    kept = drop_exact_dups(dup)
    assert kept.count() == docs.count()
    assert kept.agg(F.max("doc_id")).collect()[0][0] < 100000


def test_ngram_jaccard_pairs_match_bruteforce(spark, docs, doc_rows):
    from groonga_spark.dedup import ngram_jaccard_pairs

    got = {(r["d1"], r["d2"]): r["jaccard"]
           for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()}
    sh = {d: _shingle_set(t) for d, t in doc_rows}
    want = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            if not inter:
                continue
            j = inter / (len(sh[a]) + len(sh[b]) - inter)
            if j >= 0.5:
                want[(a, b)] = round(j, 4)
    assert got == want


def test_minhash_lsh_finds_planted_near_dups(spark, docs, doc_rows):
    from groonga_spark.dedup import minhash_lsh_pairs

    cands = {(r["d1"], r["d2"]) for r in minhash_lsh_pairs(docs).collect()}
    sh = {d: _shingle_set(t) for d, t in doc_rows}
    ids = sorted(sh)
    high = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            if inter and inter / (len(sh[a]) + len(sh[b]) - inter) >= 0.9:
                high.add((a, b))
    assert high, "corpus should contain planted near-dups"
    # 16 hashes / 4 bands: P(miss at j=0.9) = (1-0.9^4)^4 ≈ 1.3e-2 per pair
    recall = len(high & cands) / len(high)
    assert recall >= 0.9, (recall, high - cands)


def test_simhash_fingerprints(spark, docs, doc_rows):
    from groonga_spark.dedup import simhash

    got = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert set(got) == {d for d, _ in doc_rows}
    assert all(len(v) == 64 and set(v) <= {"0", "1"} for v in got.values())

    # independent python oracle for a few docs
    for d, t in doc_rows[:5]:
        votes = np.zeros(64, np.int64)
        for term in t.split(" "):
            if not term:
                continue
            h = hashlib.md5(term.encode()).hexdigest()
            bits = "".join(f"{int(c, 16):04b}" for c in h[:16])
            votes += np.where(np.frombuffer(bits.encode(), np.uint8) == ord("1"), 1, -1)
        want = "".join("1" if v > 0 else "0" for v in votes)
        assert got[d] == want, d


def test_simhash_hamming(spark):
    from pyspark.sql import functions as F

    from groonga_spark.dedup import simhash_hamming

    df = spark.createDataFrame([("0110", "0101")], "a string, b string")
    assert df.select(simhash_hamming(F.col("a"), F.col("b")).alias("h")).collect()[0]["h"] == 2


# --------------------------------------------------------------------------
# similarity
# --------------------------------------------------------------------------

def _cos(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.dot(a, b) / math.sqrt(np.dot(a, a) * np.dot(b, b)))


def test_cosine_topk_matches_numpy(spark, emb, emb_rows):
    from groonga_spark.similarity import cosine_topk

    probe = emb_rows[0]
    got = [(r["vec_id"], r["sim"]) for r in
           cosine_topk(emb, list(probe), k=10, exclude_id=0).collect()]
    sims = sorted(
        ((vid, _cos(v, probe)) for vid, v in emb_rows.items() if vid != 0),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    assert [g[0] for g in got] == [w[0] for w in sims]
    for (_, gs), (_, ws) in zip(got, sims):
        assert abs(gs - round(ws, 4)) <= 1e-9


def test_lsh_bucketed_topk_finds_planted_neighbors(spark):
    """The guarantee hyperplane LSH actually offers: vectors at high
    cosine land in the probe's bucket neighborhood. Plant near-dups of a
    probe among deterministic noise and require the ANN path to surface
    them at rank 1..n."""
    from groonga_spark.similarity import lsh_bucketed_topk

    rng = np.random.RandomState(7)
    base = rng.randn(64)
    rows = []
    for i in range(200):
        rows.append((i, (rng.randn(64)).astype(float).tolist()))
    for j, eps in ((500, 0.05), (501, 0.1), (502, 0.2)):  # planted near-dups
        rows.append((j, (base + eps * rng.randn(64)).astype(float).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [r["vec_id"] for r in
           lsh_bucketed_topk(df, list(base), k=5, n_planes=8,
                             hamming_radius=1).collect()]
    assert got[:3] == [500, 501, 502], got


def test_embedding_dup_pairs_threshold(spark, emb, emb_rows):
    from groonga_spark.similarity import embedding_dup_pairs

    got = {(r["i"], r["j"]) for r in embedding_dup_pairs(emb, threshold=0.4).collect()}
    ids = sorted(emb_rows)
    want = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
            if _cos(emb_rows[a], emb_rows[b]) >= 0.4}
    assert got == want


# --------------------------------------------------------------------------
# textstats
# --------------------------------------------------------------------------

def test_token_stats_against_python(spark, docs, doc_rows):
    from groonga_spark.textstats import STOPWORDS, token_stats

    got = {r["doc_id"]: r for r in token_stats(docs).collect()}
    en = set(STOPWORDS["en"])
    for d, t in doc_rows[:20]:
        w = [x for x in t.split(" ") if x]
        row = got[d]
        assert row["n_tokens"] == len(w)
        assert row["fingerprint"] == hashlib.md5(
            " ".join(t.split()).encode()
        ).hexdigest()[:16]
        stop = sum(1 for x in w if x in en) / len(w)
        assert abs(row["stop_ratio"] - stop) < 1e-3
        assert 0.0 <= row["quality"] <= 1.0
        assert row["pred_lang"] in ("de", "en", "es", "fr", "und")


def test_bpe_token_count(spark):
    from pyspark.sql import functions as F

    from groonga_spark.textstats import bpe_token_count

    df = spark.createDataFrame([("ab 12 c!",)], "text string")
    # tokens: ab | 12 | c | !
    assert df.select(bpe_token_count(F.col("text")).alias("n")).collect()[0]["n"] == 4


# --------------------------------------------------------------------------
# multimodal
# --------------------------------------------------------------------------

def test_media_pipeline(spark, docs, doc_rows):
    from groonga_spark.multimodal import (
        documents_as_media,
        extract_features,
        frame_sample_offsets,
        media_fingerprint,
    )

    media = documents_as_media(docs)
    fp = {r["media_id"]: (r["n_bytes"], r["payload_md5"])
          for r in media_fingerprint(media).collect()}
    for d, t in doc_rows[:10]:
        raw = t.encode()
        assert fp[d] == (len(raw), hashlib.md5(raw).hexdigest())

    feats = {r["media_id"]: r for r in extract_features(media, dim=8).collect()}
    for d, t in doc_rows[:5]:
        a = np.frombuffer(t.encode(), np.uint8).astype(np.float64)
        assert feats[d]["n_bytes"] == len(a)
        assert abs(feats[d]["byte_mean"] - round(a.mean(), 4)) < 1e-9
        got_f = np.array(feats[d]["feature"])
        idx = np.arange(len(a)) % 8
        want = np.round(
            np.bincount(idx, weights=a, minlength=8)
            / np.maximum(np.bincount(idx, minlength=8), 1) / 255.0, 6)
        assert np.allclose(got_f, want)

    offs = frame_sample_offsets(media, every_n_bytes=64, max_frames=4)
    rows = offs.filter(offs.media_id == doc_rows[0][0]).collect()
    n = len(doc_rows[0][1].encode())
    want_n = min((n - 1) // 64 + 1, 4)
    assert [r["byte_offset"] for r in rows] == [64 * i for i in range(want_n)]


def test_real_decode_is_marked_stub(spark, docs):
    from groonga_spark.multimodal import documents_as_media, extract_features

    with pytest.raises(NotImplementedError):
        extract_features(documents_as_media(docs), decode="real")


def test_embedding_dups_lsh_recall_vs_brute(spark):
    """Banded-LSH near-dup pairs: subset of brute force (exact cosine
    confirms), with ≥95% recall on planted high-sim near-dups."""
    import numpy as np

    from groonga_spark.cacheutil import release
    from groonga_spark.similarity import (
        embedding_dup_pairs,
        embedding_dup_pairs_lsh,
    )

    rng = np.random.RandomState(5)
    rows = []
    for i in range(100):
        v = rng.randn(64)
        w = v + rng.randn(64) * 0.02        # cos ≈ 0.987
        rows.append((2 * i, (v / np.linalg.norm(v)).tolist()))
        rows.append((2 * i + 1, (w / np.linalg.norm(w)).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    brute = {(r["i"], r["j"])
             for r in embedding_dup_pairs(emb, threshold=0.9).collect()}
    lsh_df = embedding_dup_pairs_lsh(emb, threshold=0.9)
    lsh = {(r["i"], r["j"]) for r in lsh_df.collect()}
    release(lsh_df)

    assert lsh <= brute                      # never a false positive
    planted = {(2 * i, 2 * i + 1) for i in range(100)} & brute
    assert len(planted) >= 90                # the fixture actually planted
    recall = len(lsh & planted) / len(planted)
    assert recall >= 0.95, recall


def test_contamination(spark):
    """Benchmark n-gram overlap: exact semantics on hand-built cases +
    the broadcast-hash-join plan shape (no shuffle on the corpus side
    before the join)."""
    from groonga_spark.dedup import contamination

    docs = spark.createDataFrame(
        [(0, "a b c d e f g h"),      # shares the 6-gram c..h
         (1, "x y z w v u t s"),      # clean
         (2, "c d e f g h i j"),      # shares c..h
         (3, "a b c"),                # too short for n=6
         (4, "c d e f g h c d e f g h")],  # shares it twice (count 1 distinct)
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("c d e f g h q r",), ("nothing here overlaps at all ok",)],
        "text string",
    )
    out = contamination(docs, bench, n=6)
    got = {r["doc_id"]: r["n_contaminated_ngrams"] for r in out.collect()}
    assert got == {0: 1, 2: 1, 4: 1}

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ngram_jaccard_prefix_equals_classic(spark, docs):
    """Prefix-filtered exact Jaccard (AllPairs/PPJoin) must return the
    IDENTICAL pair set + scores as the classic all-shingle self-join —
    the prefix-filtering lemma guarantees no candidate is lost."""
    from groonga_spark.cacheutil import release
    from groonga_spark.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    for t in (0.3, 0.5, 0.8):
        classic = ngram_jaccard_pairs(docs, n=3, threshold=t)
        pref = ngram_jaccard_pairs_prefix(docs, n=3, threshold=t)
        got_c = sorted((r["d1"], r["d2"], r["jaccard"])
                       for r in classic.collect())
        got_p = sorted((r["d1"], r["d2"], r["jaccard"])
                       for r in pref.collect())
        release(classic)
        release(pref)
        assert got_c == got_p, t


def test_ngram_jaccard_prefix_skips_head_shingles(spark):
    """The candidate join must exclude a corpus-wide head shingle from
    every long doc's prefix (rarest-first order) — the skew killer."""
    import random

    rng = random.Random(5)
    # every doc shares the head trigram "the same head"; tails differ
    rows = [
        (d, "the same head " + " ".join(
            f"w{rng.randrange(1000)}" for _ in range(20)))
        for d in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from groonga_spark.cacheutil import release
    from groonga_spark.dedup import ngram_jaccard_pairs_prefix, shingles

    from pyspark.sql import functions as F

    out = ngram_jaccard_pairs_prefix(docs, n=3, threshold=0.5)
    pairs = out.collect()
    release(out)
    assert pairs == []  # tails all differ → no pair reaches 0.5

    # and the head shingle is in NO doc's prefix (all docs are long)
    sh = shingles(docs, 3)
    sdf = sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
    from pyspark.sql import Window as W

    ranked = (
        sh.join(sdf, "shingle")
        .withColumn("rk", F.row_number().over(
            W.partitionBy("doc_id").orderBy("sdf", "shingle")))
        .join(sh.groupBy("doc_id").agg(F.count("*").alias("sz")), "doc_id")
        .filter(F.col("rk") <= F.col("sz")
                - F.ceil(F.lit(0.5) * F.col("sz")) + 1)
    )
    head_in_prefix = ranked.filter(F.col("shingle") == "the same head").count()
    assert head_in_prefix == 0


def test_ivf_full_probe_is_exact(spark, emb, emb_rows):
    """nprobe == n_centroids must reproduce the exact brute-force top-k:
    the cluster assignment PARTITIONS the corpus, so probing every
    cluster loses and duplicates nothing."""
    from groonga_spark.similarity import cosine_topk, ivf_bucketed_topk

    probe = emb_rows[0]
    want = [(r["vec_id"], r["sim"]) for r in
            cosine_topk(emb, list(probe), k=10, exclude_id=0).collect()]
    got = [(r["vec_id"], r["sim"]) for r in
           ivf_bucketed_topk(emb, list(probe), k=10, n_centroids=8,
                             nprobe=8, exclude_id=0).collect()]
    assert got == want


def test_ivf_assignment_partitions_corpus(spark, emb):
    """Every vector lands in exactly one cluster in [0, k)."""
    from pyspark.sql import functions as F

    from groonga_spark.similarity import ivf_assign, ivf_centroids

    cents = ivf_centroids(emb, n_centroids=8)
    assert len(cents) == 8
    a = ivf_assign(emb, cents)
    assert a.count() == emb.count()
    rng = a.agg(F.min("cluster"), F.max("cluster")).first()
    assert rng[0] >= 0 and rng[1] < 8
    # deterministic: same centroids + same data -> identical assignment
    b = ivf_assign(emb, cents)
    assert (a.select("vec_id", "cluster").exceptAll(
        b.select("vec_id", "cluster")).count() == 0)


def test_ivf_pruned_probe_recall_on_planted_clusters(spark):
    """nprobe < n_centroids prunes the scan but must keep near-perfect
    recall when the data IS clustered (the IVF premise; the sf
    embeddings table is near-uniform in 64-dim, where no ANN structure
    can beat brute force -- the full-probe exactness test covers it).
    8 planted clusters, members = center + small deterministic noise."""
    import hashlib as _h

    from groonga_spark.similarity import cosine_topk, ivf_bucketed_topk

    def unit(seed, dim=32):
        v = np.array([int(_h.md5(f"{seed}|{d}".encode()).hexdigest()[:4], 16)
                      - 0x8000 for d in range(dim)], float)
        return v / np.linalg.norm(v)

    rows, centers = [], []
    vid = 0
    for c in range(8):
        base = unit(f"c{c}")
        centers.append(base)
        for m in range(40):
            v = base + 0.15 * unit(f"c{c}m{m}")
            rows.append((vid, c, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(
        [(i, v) for i, _c, v in rows], "vec_id long, embedding array<double>"
    )
    hits = tot = 0
    for pid in (0, 45, 170, 290):
        probe = rows[pid][2]
        want = {r["vec_id"] for r in
                cosine_topk(df, probe, k=10, exclude_id=pid).collect()}
        got = {r["vec_id"] for r in
               ivf_bucketed_topk(df, probe, k=10, n_centroids=8,
                                 nprobe=2, exclude_id=pid).collect()}
        hits += len(got & want)
        tot += len(want)
    assert hits / tot >= 0.95, (hits, tot)


def test_token_stats_empty_doc_is_ansi_safe(spark):
    """Empty / whitespace-only docs must yield ratio 0.0, not a
    DIVIDE_BY_ZERO under Spark 4's default ANSI mode."""
    from groonga_spark.textstats import token_stats

    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "real words here")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in token_stats(df).collect()}
    assert rows[0]["n_tokens"] == 0
    assert rows[0]["stop_ratio"] == 0.0
    assert rows[0]["avg_word_len"] == 0.0
    assert rows[1]["stop_ratio"] == 0.0
    assert rows[2]["n_tokens"] == 3


def test_frame_sample_offsets_keeps_empty_media(spark):
    """Empty-payload media keep one NULL-frame row instead of silently
    vanishing from the output."""
    from groonga_spark.multimodal import frame_sample_offsets

    media = spark.createDataFrame(
        [(0, bytearray(b"0123456789" * 20)), (1, bytearray(b""))],
        "media_id long, payload binary",
    )
    got = frame_sample_offsets(media, every_n_bytes=64, max_frames=4)
    rows = {r["media_id"]: r for r in got.collect()}
    assert 1 in rows and rows[1]["frame_no"] is None
    assert got.filter("media_id = 0").count() == 4
