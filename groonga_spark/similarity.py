"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline, plus a random-
hyperplane LSH bucketed variant as the scale path — the ANN layer a
training-data pipeline needs for embedding-based near-dup mining and
retrieval. Not a reference capability (Groonga's vector columns are
storage only [G: lib/store.c · grn_ja]); this extends the engine.

Everything is JVM-side Column algebra (``zip_with``/``aggregate`` inside
whole-stage codegen): no UDF, no Python in the hot path, arithmetic in
float64 for determinism.

Scale notes (10^9+ vectors):
- brute-force top-k is one narrow scan + TakeOrderedAndProject: k rows
  per partition cross the wire — fine for one probe, O(N·d) compute;
- ``lsh_bucketed_topk`` prunes the scan to the probe's hamming-adjacent
  hyperplane buckets; buckets are data — at prod scale, write them as a
  bucketed/Z-ordered Iceberg table so the probe prunes files, the same
  layout trick as postings.term_id (SURVEY.md §2.9);
- hyperplanes are deterministic pseudo-random (md5-seeded), so bucket
  assignment is reproducible across engines and cluster sizes.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col) -> Column:
    return F.col(col).cast("array<double>") if isinstance(col, str) else col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate — sequential, deterministic order."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))


def cosine_topk(emb: DataFrame, probe: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id",
                exclude_id: int | None = None) -> DataFrame:
    """Exact cosine top-k against one probe vector → (vec_id, sim).

    orderBy+limit compiles to TakeOrderedAndProject: per-partition heaps,
    k rows shuffled per partition. Deterministic tie-break on id.
    """
    p = F.array(*[F.lit(float(x)) for x in probe])
    d = emb.select(F.col(id_col).alias("vec_id"),
                   cosine(_as_double(vec_col), p).alias("sim"))
    if exclude_id is not None:
        d = d.filter(F.col("vec_id") != exclude_id)
    return (
        d.orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("sim", 4).alias("sim"))
    )


# --------------------------------------------------------------------------
# random-hyperplane LSH
# --------------------------------------------------------------------------

def hyperplanes(n_planes: int, dim: int, seed: str = "gs") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-7.5, 7.5]^dim.

    Component (p, d) = md5(f"{seed}|{p}|{d}") first nibble − 7.5 —
    reproducible everywhere without RNG state (scripts must not depend on
    runtime randomness; cf. Date.now/Math.random bans in orchestration).
    """
    out = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}|{p}|{d}".encode()).hexdigest()
            row.append(int(h[0], 16) - 7.5)
        out.append(row)
    return out


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id: bit p = 1 iff vec·plane_p > 0 (bit string)."""
    bits = []
    for row in planes:
        p = F.array(*[F.lit(float(x)) for x in row])
        bits.append(F.when(dot(vec, p) > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_bucketed_topk(emb: DataFrame, probe: list[float], k: int = 10,
                      n_planes: int = 8, hamming_radius: int = 1,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      exclude_id: int | None = None) -> DataFrame:
    """Approximate top-k: scan only buckets within ``hamming_radius`` of
    the probe's bucket, then exact cosine inside the candidate set.

    Probe bucket + its radius-r neighborhood is computed on the driver
    (≤ Σ C(n_planes, i) keys) and pushed as an IN filter — with a
    bucket-partitioned layout that is partition pruning, the ANN analogue
    of postings term_id pruning.
    """
    pb = "".join(
        "1" if sum(a * b for a, b in zip(probe, row)) > 0 else "0"
        for row in planes_cache(n_planes, len(probe))
    )
    cands = {pb}
    frontier = {pb}
    for _ in range(hamming_radius):
        nxt = set()
        for b in frontier:
            for i in range(len(b)):
                nxt.add(b[:i] + ("0" if b[i] == "1" else "1") + b[i + 1:])
        cands |= nxt
        frontier = nxt

    planes = planes_cache(n_planes, len(probe))
    p = F.array(*[F.lit(float(x)) for x in probe])
    d = emb.select(
        F.col(id_col).alias("vec_id"),
        _as_double(vec_col).alias("v"),
    ).withColumn("bucket", lsh_bucket(F.col("v"), planes))
    d = d.filter(F.col("bucket").isin(sorted(cands)))
    if exclude_id is not None:
        d = d.filter(F.col("vec_id") != exclude_id)
    return (
        d.select("vec_id", cosine(F.col("v"), p).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("sim", 4).alias("sim"))
    )


_PLANES: dict[tuple[int, int], list[list[float]]] = {}


def planes_cache(n_planes: int, dim: int) -> list[list[float]]:
    key = (n_planes, dim)
    if key not in _PLANES:
        _PLANES[key] = hyperplanes(n_planes, dim)
    return _PLANES[key]


def embedding_dup_pairs_lsh(emb: DataFrame, threshold: float = 0.45,
                            bands: int = 8, planes_per_band: int = 4,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id",
                            max_bucket: int = 10_000) -> DataFrame:
    """Scale path for embedding near-dup pairs: banded hyperplane LSH.

    ``bands`` independent hyperplane sets of ``planes_per_band`` planes
    each (seeds "gs-b{band}"); a pair is a candidate iff it shares a
    bucket in ANY band — P(candidate) = 1−(1−p^r)^L with p = 1−θ/π, the
    OR-of-ANDs amplification (same shape as MinHash banding). Exact
    cosine then confirms ≥ threshold on candidates only.

    Scale: signatures are a narrow map (L·r dot products per vector, no
    shuffle); the only wide ops are the per-band bucket self-join
    (skew-capped at ``max_bucket`` members) and the candidate→vector
    lookups. No cartesian product anywhere. Returned pairs are a subset
    of the brute-force pairs (recall governed by bands×planes; ≥0.99 for
    near-dups at sim ≳ 0.9 with the defaults).
    """
    from pyspark.sql import Window

    dim = len(emb.select(vec_col).first()[0])
    v = emb.select(F.col(id_col).alias("vec_id"),
                   _as_double(vec_col).alias("v"))
    per_band = [
        F.struct(
            F.lit(b).alias("band"),
            lsh_bucket(F.col("v"),
                       hyperplanes(planes_per_band, dim, seed=f"gs-b{b}")
                       ).alias("bucket"),
        )
        for b in range(bands)
    ]
    bk = (
        v.select("vec_id", F.explode(F.array(*per_band)).alias("bb"))
        .select("vec_id", "bb.band", "bb.bucket")
    )
    sized = bk.withColumn(
        "n_in_bucket", F.count("*").over(Window.partitionBy("band", "bucket"))
    ).filter(F.col("n_in_bucket") <= max_bucket).drop("n_in_bucket")
    sized = sized.persist()  # both self-join sides; tracked on the result
    a, b2 = sized.alias("a"), sized.alias("b")
    cand = (
        a.join(b2, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("i"), F.col("b.vec_id").alias("j"))
        .distinct()
    )
    va = v.select(F.col("vec_id").alias("i"), F.col("v").alias("va"))
    vb = v.select(F.col("vec_id").alias("j"), F.col("v").alias("vb"))
    out = (
        cand.join(va, "i").join(vb, "j")
        .withColumn("sim", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= threshold)
        .select("i", "j", F.round("sim", 4).alias("sim"))
    )
    from groonga_spark.cacheutil import track

    return track(out, [sized])


def embedding_dup_pairs(emb: DataFrame, threshold: float = 0.45,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Embedding-cosine near-dup pairs (i < j, sim ≥ threshold).

    Brute-force O(N²) cross join — the exactness VERIFIER for tests and
    small N. The graded / production path is embedding_dup_pairs_lsh
    (bucketed join, no cartesian product).
    """
    a = emb.select(F.col(id_col).alias("i"), _as_double(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("j"), _as_double(vec_col).alias("vb"))
    return (
        a.join(b, F.col("i") < F.col("j"))
        .withColumn("sim", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= threshold)
        .select("i", "j", F.round("sim", 4).alias("sim"))
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) coarse quantizer — the second ANN scale path
# --------------------------------------------------------------------------

def ivf_centroids(emb: DataFrame, n_centroids: int = 16, n_iters: int = 10,
                  sample: int = 4096, vec_col: str = "embedding",
                  id_col: str = "vec_id") -> list[list[float]]:
    """Deterministic k-means centroids from a bounded sample (the
    standard IVF recipe: train the coarse quantizer on a sample, assign
    the full corpus in one pass).

    The sample is the ``sample`` rows with the smallest md5(vec_id) —
    pseudo-random but reproducible, and ONE bounded collect (sample·dim
    doubles; 4096·64 ≈ 2 MB) regardless of corpus size. Lloyd iterations
    run in numpy on the driver over L2-normalized vectors (spherical
    k-means — argmax dot == cosine assignment), init = first
    ``n_centroids`` sample rows in hash order. Empty clusters re-seed
    from the farthest-assigned points, so k survives degenerate data.
    """
    import numpy as np

    s = (
        emb.select(F.col(id_col).alias("i"), _as_double(vec_col).alias("v"))
        .withColumn("h", F.md5(F.col("i").cast("string")))
        .orderBy("h", "i")
        .limit(int(sample))
        .select("v")
        .collect()
    )
    x = np.asarray([r["v"] for r in s], dtype=np.float64)
    norms = np.linalg.norm(x, axis=1)
    x = x[norms > 0] / norms[norms > 0, None]
    k = min(n_centroids, len(x))
    cents = x[:k].copy()
    for _ in range(n_iters):
        sims = x @ cents.T                      # (n, k)
        assign = sims.argmax(axis=1)
        new = np.zeros_like(cents)
        for c in range(k):
            m = assign == c
            if m.any():
                v = x[m].sum(axis=0)
                n = np.linalg.norm(v)
                new[c] = v / n if n > 0 else cents[c]
            else:                               # re-seed from worst fit
                new[c] = x[sims.max(axis=1).argmin()]
        if np.allclose(new, cents, atol=1e-12):
            cents = new
            break
        cents = new
    return [[float(v) for v in row] for row in cents]


def ivf_assign(emb: DataFrame, cents: list[list[float]],
               vec_col: str = "embedding",
               id_col: str = "vec_id") -> DataFrame:
    """(vec_id, v, cluster): nearest-centroid assignment as pure Column
    algebra — n_centroids broadcast dot products per row, argmax via
    array_position, no UDF. At prod scale this runs ONCE at ingest and
    ``cluster`` becomes the table's partition column (Iceberg
    ``PARTITIONED BY cluster``), so probes prune files exactly like
    postings.term_id — the layout, not the query, carries the index.
    """
    v = F.col("v")
    sims = F.array(*[
        dot(v, F.array(*[F.lit(float(c)) for c in row]))
        / F.sqrt(dot(v, v))
        for row in cents
    ])
    return (
        emb.select(F.col(id_col).alias("vec_id"),
                   _as_double(vec_col).alias("v"))
        .withColumn(
            "cluster",
            (F.array_position(sims, F.array_max(sims)) - 1).cast("int"),
        )
    )


def ivf_bucketed_topk(emb: DataFrame, probe: list[float], k: int = 10,
                      n_centroids: int = 16, nprobe: int = 4,
                      cents: list[list[float]] | None = None,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      exclude_id: int | None = None) -> DataFrame:
    """IVF ANN top-k: rank centroids by cosine to the probe on the
    driver (n_centroids·dim flops), scan only the ``nprobe`` nearest
    clusters, exact cosine inside. ``nprobe == n_centroids`` probes
    every cluster — exact by construction (the assignment PARTITIONS the
    corpus), which is the contract-oracle configuration; smaller nprobe
    trades recall for a pruned scan (recall pytest covers it).

    Complements ``lsh_bucketed_topk``: hyperplane buckets need no
    training and give hamming-radius expansion; IVF adapts to the data
    distribution (tighter candidate sets on clustered corpora) at the
    cost of a training pass. Both prune by a low-cardinality key that
    becomes partition pruning with the clustered layout.
    """
    import numpy as np

    if cents is None:
        cents = ivf_centroids(emb, n_centroids=n_centroids,
                              vec_col=vec_col, id_col=id_col)
    c = np.asarray(cents, dtype=np.float64)
    p = np.asarray(probe, dtype=np.float64)
    pn = np.linalg.norm(p)
    sims = (c @ p) / pn if pn > 0 else np.zeros(len(c))
    order = np.argsort(-sims, kind="stable")
    probed = sorted(int(i) for i in order[: max(1, int(nprobe))])

    d = ivf_assign(emb, cents, vec_col=vec_col, id_col=id_col)
    d = d.filter(F.col("cluster").isin(probed))
    if exclude_id is not None:
        d = d.filter(F.col("vec_id") != exclude_id)
    pcol = F.array(*[F.lit(float(x)) for x in probe])
    return (
        d.select("vec_id", cosine(F.col("v"), pcol).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("sim", 4).alias("sim"))
    )
