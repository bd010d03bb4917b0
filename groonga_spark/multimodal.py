"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a typed metadata
struct, and implements the Spark-side machinery a multimodal training
pipeline needs — schema, batching, partition-friendly feature extraction
via ``mapInPandas`` — with the actual media decode STUBBED: the sandbox
has no image/audio libraries, so ``decode=\"real\"`` raises
NotImplementedError, and ``decode=\"fake\"`` runs a deterministic
byte-level stand-in (numpy over the raw payload) that exercises the full
Arrow path: schema in, batch iteration, vectorized kernel, schema out.

Not a reference capability (Groonga stores blobs in the jagged-array
column [G: lib/store.c · grn_ja] but has no media ops); this extends the
engine for training-data work.

Scale notes: payloads dominate bytes — never shuffle them. Feature
extraction is a narrow ``mapInPandas`` (no shuffle); downstream joins
carry only (media_id, features). Frame sampling emits offsets, not
frames, so the expansion is metadata-only until a consumer decodes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),          # image | audio | video
    T.StructField("payload", T.BinaryType()),        # opaque encoded bytes
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, byte_mean double, "
    "byte_std double, feature array<double>"
)


def _fake_decode_features(payload: pd.Series, dim: int) -> np.ndarray:
    """Deterministic stand-in for decode→feature-extract.

    Feature d = mean of payload bytes at positions ≡ d (mod dim), scaled
    to [0,1] — pure numpy over the Arrow-delivered buffers, the exact
    batch shape a real decoder (PIL/torchvision/librosa) would slot into.
    """
    out = np.zeros((len(payload), dim), dtype=np.float64)
    n_bytes = np.zeros(len(payload), np.int64)
    means = np.zeros(len(payload), np.float64)
    stds = np.zeros(len(payload), np.float64)
    for i, buf in enumerate(payload):       # per-document (not per-row-element)
        if buf is None or len(buf) == 0:
            continue
        a = np.frombuffer(bytes(buf), dtype=np.uint8).astype(np.float64)
        n = len(a)
        idx = np.arange(n) % dim
        sums = np.bincount(idx, weights=a, minlength=dim)
        cnts = np.maximum(np.bincount(idx, minlength=dim), 1)
        out[i] = sums / cnts / 255.0
        # byte stats in the same pass (one decode touch per payload).
        # Exact-integer moments: Σx and Σx² are exact in float64 (byte
        # values, n < 2^45), so mean/std are bit-reproducible across
        # engines regardless of summation order — the oracle (DuckDB)
        # computes the same two moments and gets identical doubles.
        n_bytes[i] = n
        sx = float(a.sum())
        sxx = float((a * a).sum())
        m = sx / n
        means[i] = m
        stds[i] = np.sqrt(max(sxx / n - m * m, 0.0))
    return out, n_bytes, means, stds


def extract_features(media: DataFrame, dim: int = 16,
                     decode: str = "fake") -> DataFrame:
    """media(media_id, kind, payload, meta) → per-item feature rows.

    ``decode="real"`` is the marked stub — wire PIL/librosa here in an
    environment that has them; the Spark plumbing (schema, batching,
    vectorized kernel signature) is identical either way.
    """
    if decode == "real":
        raise NotImplementedError(
            "real media decode requires image/audio libraries not present "
            "in this environment; use decode='fake' for the deterministic "
            "byte-level stand-in"
        )
    if decode != "fake":
        raise ValueError(f"unknown decode mode {decode!r}")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, n_bytes, means, stds = _fake_decode_features(
                pdf["payload"], dim
            )
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": n_bytes,
                # floor(x·1e4+0.5)/1e4: engines disagree on decimal
                # halves (np.round is half-even, SQL round half-away)
                "byte_mean": np.floor(means * 1e4 + 0.5) / 1e4,
                "byte_std": np.floor(stds * 1e4 + 0.5) / 1e4,
                "feature": list(np.round(feats, 6)),
            })

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def frame_sample_offsets(media: DataFrame, every_n_bytes: int = 1 << 16,
                         max_frames: int = 16) -> DataFrame:
    """Video "frame sampling" as byte-offset metadata (decode deferred).

    Emits (media_id, frame_no, byte_offset) — JVM-side sequence/explode,
    no payload bytes move. A real pipeline maps offsets → keyframes in
    the decode stage.
    """
    n = F.octet_length("payload")
    offs = F.when(
        n > 0,
        F.slice(
            F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes)),
            1, max_frames,
        ),
    ).otherwise(F.array().cast("array<long>"))
    # posexplode_OUTER: empty/null payloads keep their media row (one
    # NULL-frame row) instead of silently vanishing — a left join by
    # media_id downstream still sees the item
    return media.select(
        "media_id",
        F.posexplode_outer(offs).alias("frame_no", "byte_offset"),
    )


def media_fingerprint(media: DataFrame) -> DataFrame:
    """(media_id, n_bytes, payload_md5) — exact-dup key for binary
    payloads, all JVM-side (md5 over binary)."""
    return media.select(
        "media_id",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


def documents_as_media(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Adapter: treat a text corpus's UTF-8 bytes as a media table —
    the deterministic fixture for exercising the binary path in tests
    and oracle checks (payload = encode(text))."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.create_map(F.lit("src"), F.lit("documents")).alias("meta"),
    )
