"""Deduplication operators for large-scale training-data pipelines.

Exact (hash groupBy), n-gram Jaccard, MinHash+LSH (shingle → minhash →
band → bucket self-join), and SimHash fingerprinting — the dedup family a
100 TB web-text corpus needs before training. The reference engine has no
dedup operators (its unit of identity is the table key [G: lib/hash.c ·
grn_hash_add]); these extend the engine with the standard web-corpus
algorithms (Broder 1997 MinHash; Charikar 2002 SimHash), expressed
entirely as JVM-side DataFrame algebra — no Python in the hot path.

Determinism contract: every hash is ``md5`` of an explicit string, so
results are reproducible across engines (the driver's DuckDB oracle
recomputes them bit-identically) and across cluster sizes.

Scale notes (10^12 docs):
- shingling/minhash is a narrow map (no shuffle); the only shuffles are
  the per-doc signature agg and the band-bucket self-join;
- the band self-join is the skew risk: a degenerate bucket (e.g. empty
  docs) explodes quadratically. ``lsh_candidate_pairs`` caps bucket size
  (``max_bucket``) — buckets above the cap are dropped and reported,
  mirroring the head-term salting rationale in build.py;
- exact dedup groups by md5(text): 1 shuffle of (hash → min id), with
  map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_dup_groups(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content hash: (content_hash, n_docs, keep_id).

    ``keep_id`` = min doc id of the group — the canonical survivor. A
    plain hash aggregation: map-side partial combine makes the shuffle
    O(distinct hashes), not O(rows).

    Identity = md5 of the RAW text (byte-exact duplicates). This is a
    deliberately different contract from pipeline.curate_corpus's
    near-dup fingerprint (textstats.doc_fingerprint collapses
    whitespace): exact dedup must never merge texts that differ, even
    by formatting; the curation pipeline's canonicalization is a
    near-dup choice layered above it.
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"),
                    F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def drop_exact_dups(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Keep only each group's min-id survivor (the dedup'd corpus)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# --------------------------------------------------------------------------
# shingles (word n-grams) — shared by Jaccard + MinHash
# --------------------------------------------------------------------------

def shingles(docs: DataFrame, n: int = 3, text_col: str = "text",
             id_col: str = "doc_id", distinct: bool = True) -> DataFrame:
    """(doc_id, shingle) — word n-gram shingle set, all JVM-side.

    Split on single spaces (the corpus is whitespace-normalized; for raw
    web text run normalize/extract first). ``transform(sequence(...))``
    builds the n-grams inside codegen; no UDF, no shuffle.
    """
    w = F.split(F.col(text_col), " ")
    grams = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - F.lit(n)),
            lambda i: F.array_join(F.slice(w, i + F.lit(1), n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = docs.select(F.col(id_col).alias("doc_id"),
                      F.explode(grams).alias("shingle"))
    return out.distinct() if distinct else out


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: (d1, d2, jaccard ≥ threshold).

    inter(a,b) via shingle self-join + count; |a∪b| = |a|+|b|−inter.
    The self-join shuffles on ``shingle`` — at corpus scale, frequent
    shingles are the skew (same head-term phenomenon as the index build);
    prefer minhash_lsh for 10^12 docs and keep this as the exact verifier
    on candidate pairs.
    """
    sh = shingles(docs, n, text_col, id_col).persist()
    # sh is tracked on the returned DataFrame — consumers release via
    # cacheutil.release(result) after their final action
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "d1")
                   .withColumnRenamed("sz", "sz1"), "d1")
        .join(sizes.withColumnRenamed("doc_id", "d2")
              .withColumnRenamed("sz", "sz2"), "d2")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", F.round("jaccard", 4).alias("jaccard"))
    )
    from groonga_spark.cacheutil import track

    return track(out, [sh])


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def minhash_signatures(docs: DataFrame, num_hashes: int = 16, n: int = 3,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(doc_id, h0..h{H-1}) — MinHash signature over the shingle set.

    ONE md5 per shingle (was one per shingle PER FAMILY — the dominant
    bench cost): the 128-bit digest's two 28-bit halves g1, g2 feed a
    classic universal family ``v_i = (A_i·g1 + B_i·g2 + C_i) mod
    2^31−1`` (16-bit odd A/B → every product < 2^45, exact in int64 on
    any engine); the signature component is the numeric min. Portable:
    the DuckDB oracle computes the identical arithmetic. Computed
    entirely with array higher-order functions (array_min ∘ transform
    over the per-doc shingle set): a NARROW map — zero shuffles until
    the LSH band self-join. Docs with no shingles (fewer than n tokens)
    carry no signature, like an empty set.
    """
    w = F.split(F.col(text_col), " ")
    grams = F.when(
        F.size(w) >= n,
        F.array_distinct(F.transform(
            F.sequence(F.lit(0), F.size(w) - F.lit(n)),
            lambda i: F.array_join(F.slice(w, i + F.lit(1), n), " "),
        )),
    ).otherwise(F.array().cast("array<string>"))
    # pack (g1, g2) = (first, next) 7 hex chars of md5 into one int64
    packed = F.transform(
        F.transform(F.col("_grams"), F.md5),
        lambda m: F.conv(F.substring(m, 1, 7), 16, 10).cast("long")
        * F.lit(1 << 28)
        + F.conv(F.substring(m, 8, 7), 16, 10).cast("long"),
    )

    def _family(i):
        a, b, c = minhash_family_consts(i)
        return lambda v: (
            F.lit(a) * F.shiftright(v, 28)
            + F.lit(b) * (v % F.lit(1 << 28))
            + F.lit(c)
        ) % F.lit(2147483647)

    cols = [F.col(id_col).alias("doc_id")]
    for i in range(num_hashes):
        cols.append(
            F.array_min(F.transform(F.col("_packed"), _family(i))).alias(f"h{i}")
        )
    return (
        docs.withColumn("_grams", grams)
        .filter(F.size("_grams") > 0)
        .withColumn("_packed", packed)
        .select(*cols)
    )


def minhash_family_consts(i: int) -> tuple[int, int, int]:
    """(A_i, B_i, C_i) of hash family i — shared with the DuckDB oracle
    so signatures are bit-identical across engines."""
    return 2 * i + 3, 2 * i + 101, i * 7919 + 1


def lsh_band_buckets(sig: DataFrame, bands: int = 4,
                     rows_per_band: int = 4) -> DataFrame:
    """(doc_id, band, bucket) — band key = md5 of the band's signature
    slice. Docs sharing any (band, bucket) are candidate near-dups."""
    cols = []
    for b in range(bands):
        parts = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        cols.append(F.struct(F.lit(b).alias("band"),
                             F.md5(F.concat_ws("|", *parts)).alias("bucket")))
    return sig.select(
        "doc_id", F.explode(F.array(*cols)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))


def minhash_lsh_pairs(docs: DataFrame, num_hashes: int = 16, bands: int = 4,
                      n: int = 3, text_col: str = "text",
                      id_col: str = "doc_id",
                      max_bucket: int = 10_000) -> DataFrame:
    """Candidate near-dup pairs (d1 < d2) from banded MinHash LSH.

    With 16 hashes / 4 bands / 4 rows, P(candidate) ≈ 1−(1−j⁴)⁴ — steep
    around j≈0.6, the classic near-dup operating point. ``max_bucket``
    drops degenerate buckets (> cap members) before the quadratic
    self-join — the explicit skew guard.
    """
    if num_hashes % bands:
        raise ValueError(
            f"num_hashes ({num_hashes}) must divide evenly into bands "
            f"({bands}): trailing hashes would be silently ignored, "
            "changing the LSH operating point"
        )
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, n, text_col, id_col)
    bk = lsh_band_buckets(sig, bands, rows_per_band)
    sized = bk.withColumn(
        "n_in_bucket", F.count("*").over(Window.partitionBy("band", "bucket"))
    ).filter(F.col("n_in_bucket") <= max_bucket).drop("n_in_bucket")
    # persist: both sides of the self-join read this; without it the whole
    # shingle→signature pipeline (16 md5 min-aggs) executes twice.
    # (Session-lifetime cache: if the INPUT files are rewritten in place
    # mid-session, Spark's plan-matching cache substitution would serve
    # stale buckets — re-create the session or clearCache() after
    # rewriting a corpus in place.)
    sized = sized.persist()
    a, b = sized.alias("a"), sized.alias("b")
    out = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    from groonga_spark.cacheutil import track

    return track(out, [sized])


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def _nibble_expr(p: int) -> str:
    """SQL for the value of hex digit ``p`` (0-based) of column ``h``."""
    return f"(instr('{HEX}', substring(h, {p + 1}, 1)) - 1)"


def simhash_bit_exprs(shift_fmt=None) -> list[str]:
    """The 64 per-token ±1 bit contributions as SQL strings.

    Engine-portable generator: ``shift_fmt(expr, s)`` renders a right
    shift (Spark: ``shiftright(e, s)``; DuckDB: ``(e >> s)``), so the
    Spark operator and the DuckDB oracle are generated from the same
    definition — bit i (MSB-first within each hex nibble) of md5(term).
    """
    if shift_fmt is None:
        shift_fmt = lambda e, s: f"shiftright({e}, {s})"  # noqa: E731
    out = []
    for p in range(16):
        for j in range(4):
            bit = f"({shift_fmt(_nibble_expr(p), 3 - j)} & 1)"
            out.append(f"(2 * {bit} - 1)")
    return out


def simhash(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash) — 64-bit SimHash as a '0'/'1' bit string.

    Per token occurrence: md5 → 64 bits → ±1 votes; fingerprint bit = 1
    iff the vote sum is positive. One explode + one groupBy(doc_id) with
    64 partially-aggregated sums — the shuffle carries 64 longs per doc,
    not per token. The bitstring output keeps it sign-free and portable.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "").withColumn("h", F.md5("term"))
    aggs = [
        F.sum(F.expr(e)).alias(f"s{i}")
        for i, e in enumerate(simhash_bit_exprs())
    ]
    votes = toks.groupBy("doc_id").agg(*aggs)
    bits = F.concat(*[
        F.when(F.col(f"s{i}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(64)
    ])
    return votes.select("doc_id", bits.alias("simhash"))


def simhash_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two simhash bit strings (codegen-only)."""
    pairs = F.zip_with(F.split(a, ""), F.split(b, ""),
                       lambda x, y: (x != y).cast("int"))
    return F.aggregate(pairs, F.lit(0), lambda acc, v: acc + v)


# --------------------------------------------------------------------------
# benchmark contamination (train/test n-gram overlap)
# --------------------------------------------------------------------------

def contamination(docs: DataFrame, benchmark: DataFrame, n: int = 13,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_text_col: str = "text") -> DataFrame:
    """Docs sharing any word n-gram with a benchmark/eval set — the
    standard train-test contamination check an LLM data pipeline runs
    before training (n=13 is the common convention). The reference has
    no such operator; this extends the engine like the dedup family.

    Spark-first shape: the benchmark side is small by construction (eval
    sets), so its DISTINCT n-grams broadcast; the corpus side stays a
    narrow codegen map (explode n-grams → xxhash64) into a broadcast
    hash join keyed on the 8-byte hash with the shingle string as an
    equality residual (hash collisions can't produce false positives,
    and the join key stays fixed-width at 10^12-doc scale). The only
    shuffles run AFTER the join, over the (small) hit set — the per-doc
    distinct-count aggregation; the exploded corpus n-grams never
    shuffle.

    → (doc_id, n_contaminated_ngrams), docs with ≥1 shared n-gram.
    """
    # distinct=False: the per-doc count_distinct below already dedups,
    # and a distinct() here would shuffle the ENTIRE exploded n-gram set
    # before the broadcast join — the corpus side must stay a narrow map
    corpus = shingles(docs, n=n, text_col=text_col, id_col=id_col,
                      distinct=False)
    corpus = corpus.withColumn("_h", F.xxhash64("shingle"))
    bench = (
        shingles(
            benchmark.select(
                F.monotonically_increasing_id().alias("doc_id"),
                F.col(bench_text_col).alias("text"),
            ),
            n=n,
        )
        .select("shingle").distinct()
        .withColumn("_h", F.xxhash64("shingle"))
    )
    hits = corpus.join(F.broadcast(bench), ["_h", "shingle"], "inner")
    return hits.groupBy(F.col("doc_id")).agg(
        F.count_distinct("shingle").alias("n_contaminated_ngrams")
    )


def ngram_jaccard_pairs_prefix(docs: DataFrame, n: int = 3,
                               threshold: float = 0.5,
                               text_col: str = "text",
                               id_col: str = "doc_id") -> DataFrame:
    """EXACT n-gram Jaccard pairs via prefix filtering (AllPairs/PPJoin,
    Bayardo et al. 2007 — public literature): same output as
    ngram_jaccard_pairs, WITHOUT the head-shingle self-join skew.

    Under a global rarest-first shingle order, two sets with
    J(a,b) ≥ t MUST share a token within each set's first
    ``|s| − ⌈t·|s|⌉ + 1`` tokens (the prefix-filtering lemma) — so the
    candidate self-join runs over PREFIX tokens only, which are by
    construction the rarest (head shingles fall outside every long
    doc's prefix; the quadratic bucket problem disappears). Candidates
    also pass the length filter ``t·|a| ≤ |b|``; exact intersections
    are then counted only for candidate pairs.

    Shuffles: shingle-df agg, per-doc rank (doc-bounded window), the
    prefix self-join (rare keys), and the pair-restricted verify join —
    all linear in data moved, none quadratic in a bucket."""
    sh = shingles(docs, n, text_col, id_col).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sdf = sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
    ranked = (
        sh.join(sdf, "shingle")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("sdf", "shingle")
            ),
        )
        .join(sizes, "doc_id")
        # prefix length L = |s| − ⌈t·|s|⌉ + 1
        .filter(
            F.col("rk")
            <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
        )
        .select("doc_id", "shingle", "sz")
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    cand = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        # length filter: J ≥ t ⇒ t·|a| ≤ |b| and t·|b| ≤ |a|
        .filter(
            (F.col("b.sz") >= F.lit(threshold) * F.col("a.sz"))
            & (F.col("a.sz") >= F.lit(threshold) * F.col("b.sz"))
        )
        .select(F.col("a.doc_id").alias("d1"),
                F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    # exact verify on candidates only: count shared shingles per pair
    s1 = sh.withColumnRenamed("doc_id", "d1")
    s2 = sh.withColumnRenamed("doc_id", "d2")
    inter = (
        cand.join(s1, "d1")
        .join(s2, ["d2", "shingle"])
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "d1")
                   .withColumnRenamed("sz", "sz1"), "d1")
        .join(sizes.withColumnRenamed("doc_id", "d2")
              .withColumnRenamed("sz", "sz2"), "d2")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", F.round("jaccard", 4).alias("jaccard"))
    )
    from groonga_spark.cacheutil import track

    return track(out, [sh])
