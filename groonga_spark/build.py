"""Index build pipeline: segments → blocks → merge → queryable index.

Re-expresses the reference's offline index construction [G: lib/ii.c ·
grn_ii_buffer_open/append/commit] and its buffer→chunk compaction
[G: lib/ii.c · buffer_flush, buffer_merge] as an idempotent, resumable
Spark pipeline (SURVEY.md §2.9d):

Stage 1 (per segment, checkpointed — the resume unit):
  docs slice → tokenize (mapInPandas, numpy kernels) → head-term salting
  → repartition(term, salt) + sortWithinPartitions → encode_partition
  (postings.py) → ``segments/<k>/`` block parquet + ``doc_map/<k>/`` +
  a committed ``lineage/`` row with metrics. Resume = skip segments that
  already have a committed lineage row.

Stage 2 (finalize — the multi-way segment merge):
  all block partials → lexicon (term → deterministic dense term_id) →
  attach term_id + df + exact block_max_score → final ``postings/``
  sorted by term_id (parquet row-group pruning ≈ the PAT-trie seek).
  Segments own disjoint doc-id ranges, so merging a term's blocks is
  ordered concatenation — no posting re-encode.

Skew: head terms are salted into doc-contiguous sub-ranges
(``salt = (doc_id - lo) * S // seg_len``), so one giant term's postings
spread over ≤ MAX_SALTS shuffle groups while blocks stay disjoint and
ordered — the explicit skew handling the north rule requires.

On-disk layout under an index root (local parquet; Iceberg tables in
prod — same schemas, see SURVEY.md §1.3):
  segments/<k>/   block partials keyed by term string
  doc_map/<k>/    (doc_id, url?, dl, segment)
  lineage/        (segment, status, docs_tokenized, postings_emitted,
                   bytes_compressed, started_at, finished_at)
  lexicon/        (term, term_id, df, cf)
  postings/       final blocks keyed by term_id
  meta.json       corpus stats + frozen contract versions
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from groonga_spark import score as score_mod
from groonga_spark.normalize import NORMALIZER_VERSION, normalize_series
from groonga_spark.postings import BLOCK_SCHEMA, encode_partition
from groonga_spark.tokenize import tokenize_batch

DEFAULT_SEGMENT_SIZE = 1 << 20          # docs per segment
SALT_TARGET = 50_000                    # postings per shuffle group
MAX_SALTS = 200


# --------------------------------------------------------------------------
# tokenize stage
# --------------------------------------------------------------------------

def tokens_df(docs: DataFrame, mode: str, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(doc_id, text) → exploded (doc_id, term, pos, dl) token stream.

    One mapInPandas pass: normalization + tokenization + per-doc length,
    all numpy/pandas-vectorized (tokenize.py). ``dl`` (doc token count)
    rides along on every row so the posting encoder never needs a
    doc-length join.
    """

    def _tok(it):
        for pdf in it:
            texts = normalize_series(pdf[text_col])
            rows, terms, pos = tokenize_batch(texts, mode)
            if len(rows) == 0:
                continue
            counts = np.bincount(rows, minlength=len(pdf)).astype(np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy()[rows],
                    "term": terms,
                    "pos": pos,
                    "dl": counts[rows],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        _tok, schema="doc_id long, term string, pos long, dl long"
    )


# --------------------------------------------------------------------------
# deterministic dense ids (scalable global rank)
# --------------------------------------------------------------------------

def assign_dense_ids(
    df: DataFrame, key: str, out_col: str, start: int = 0
) -> DataFrame:
    """key-sorted dense ids WITHOUT a single-partition window.

    ``row_number() over (order by key)`` collapses to one partition — dead
    at 10^8+ keys. Instead: range-repartition by key, sort within
    partitions, count per partition (one small job), then attach
    ``prefix_offset + arange`` per partition via mapInPandas. Ids depend
    only on the key ordering, not on partition boundaries → deterministic
    at any parallelism.
    """
    spark = df.sparkSession
    d = df.repartitionByRange(F.col(key)).sortWithinPartitions(key)
    d = d.persist(StorageLevel.MEMORY_AND_DISK)
    counts = (
        d.select(F.spark_partition_id().alias("_pid"))
        .groupBy("_pid")
        .count()
        .collect()
    )
    by_pid = {r["_pid"]: r["count"] for r in counts}
    offsets = {}
    acc = start
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]
    boff = spark.sparkContext.broadcast(offsets)
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in d.schema.fields]
        + [f"{out_col} long"]
    )

    def _attach(it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = boff.value.get(pid, 0)
        seen = 0
        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = np.arange(base + seen, base + seen + len(pdf), dtype=np.int64)
            seen += len(pdf)
            yield pdf

    out = d.mapInPandas(_attach, schema=out_schema)
    return out


# --------------------------------------------------------------------------
# pages preparation (Common-Crawl-shaped input)
# --------------------------------------------------------------------------

def prepare_pages(pages: DataFrame, use_html: bool = True) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → docs(doc_id, url, text, lang).

    - latest-per-url dedup (``row_number over (partition by url order by
      warc_ts desc, ...) = 1`` — the as-of idiom; SURVEY.md §2.3);
    - text extracted from html (byte-identity contract, extract.py) when
      ``use_html``, else the provided text column;
    - deterministic dense doc ids = rank of url (assign_dense_ids).
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("url").orderBy(F.desc("warc_ts"), F.desc(F.crc32(F.col("html"))))
    latest = (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if use_html:
        from groonga_spark.extract import extract_text_series

        def _ext(it):
            for pdf in it:
                yield pd.DataFrame(
                    {
                        "url": pdf["url"],
                        "text": extract_text_series(pdf["html"]),
                        "lang": pdf["lang"],
                    }
                )

        docs = latest.mapInPandas(_ext, schema="url string, text string, lang string")
    else:
        docs = latest.select("url", "text", "lang")
    return assign_dense_ids(docs, "url", "doc_id")


# --------------------------------------------------------------------------
# the index store
# --------------------------------------------------------------------------

@dataclass
class IndexStore:
    """Filesystem layout + meta for one index. Local parquet dirs; the
    prod deployment swaps each path for an Iceberg table (same schema)."""

    path: str

    def p(self, *parts: str) -> str:
        return os.path.join(self.path, *parts)

    @property
    def meta_path(self) -> str:
        return self.p("meta.json")

    def read_meta(self) -> dict:
        with open(self.meta_path) as f:
            return json.load(f)

    def write_meta(self, meta: dict) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1, sort_keys=True)
        os.replace(tmp, self.meta_path)

    def committed_segments(self, spark: SparkSession) -> set[int]:
        if not os.path.isdir(self.p("lineage")):
            return set()
        rows = (
            spark.read.parquet(self.p("lineage"))
            .filter(F.col("status") == "committed")
            .select("segment")
            .distinct()
            .collect()
        )
        return {r["segment"] for r in rows}


# --------------------------------------------------------------------------
# stage 1: per-segment build (the checkpoint / resume unit)
# --------------------------------------------------------------------------

def build_segment(
    spark: SparkSession,
    store: IndexStore,
    docs: DataFrame,
    segment: int,
    lo: int,
    hi: int,
    mode: str,
    salt_target: int = SALT_TARGET,
) -> dict:
    """Tokenize + encode one segment (doc ids in [lo, hi)) and commit it."""
    t0 = time.time()
    seg_docs = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    toks = tokens_df(seg_docs, mode).persist(StorageLevel.MEMORY_AND_DISK)

    # explicit head-term skew handling: measure df per term (cheap partial
    # agg), give terms above salt_target a doc-contiguous salt in [0, S)
    head = (
        toks.groupBy("term")
        .count()
        .filter(F.col("count") > salt_target)
        .withColumn(
            "n_salt",
            F.least(F.lit(MAX_SALTS), F.ceil(F.col("count") / salt_target)).cast("int"),
        )
        .drop("count")
    )
    seg_len = max(1, hi - lo)
    salted = (
        toks.join(F.broadcast(head), "term", "left")
        .withColumn("n_salt", F.coalesce(F.col("n_salt"), F.lit(1)))
        .withColumn(
            "salt",
            ((F.col("doc_id") - F.lit(lo)) * F.col("n_salt") / F.lit(seg_len))
            .cast("int"),
        )
        .drop("n_salt")
    )

    shuffled = salted.repartition("term", "salt").sortWithinPartitions(
        "term", "salt", "doc_id", "pos"
    )

    def _encode(it):
        pdfs = [p for p in it]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        yield encode_partition(pdf, segment)

    blocks = shuffled.mapInPandas(_encode, schema=BLOCK_SCHEMA)
    seg_dir = store.p("segments", str(segment))
    blocks.write.mode("overwrite").parquet(seg_dir)

    # doc_map slice: every doc in range, with its token count (0 if empty)
    dls = toks.groupBy("doc_id").agg(F.max("dl").alias("dl"))
    doc_cols = ["doc_id"] + [c for c in ("url", "lang") if c in docs.columns]
    doc_map = (
        seg_docs.select(*doc_cols)
        .join(dls, "doc_id", "left")
        .withColumn("dl", F.coalesce(F.col("dl"), F.lit(0)).cast("long"))
        .withColumn("segment", F.lit(segment).cast("int"))
    )
    doc_map.write.mode("overwrite").parquet(store.p("doc_map", str(segment)))
    toks.unpersist()

    # metrics off the committed files (exactly what was written)
    written = spark.read.parquet(seg_dir)
    m = written.agg(
        F.coalesce(F.sum("n_docs"), F.lit(0)).alias("postings"),
        F.coalesce(
            F.sum(
                F.length("doc_deltas")
                + F.length("tfs")
                + F.length("dls")
                + F.length("positions")
            ),
            F.lit(0),
        ).alias("bytes"),
    ).collect()[0]
    n_docs_seg = spark.read.parquet(store.p("doc_map", str(segment))).count()

    lineage = {
        "segment": segment,
        "status": "committed",
        "docs_tokenized": int(n_docs_seg),
        "postings_emitted": int(m["postings"]),
        "bytes_compressed": int(m["bytes"]),
        "started_at": t0,
        "finished_at": time.time(),
    }
    spark.createDataFrame(
        [
            (
                lineage["segment"],
                lineage["status"],
                lineage["docs_tokenized"],
                lineage["postings_emitted"],
                lineage["bytes_compressed"],
                lineage["started_at"],
                lineage["finished_at"],
            )
        ],
        "segment int, status string, docs_tokenized long, postings_emitted long,"
        " bytes_compressed long, started_at double, finished_at double",
    ).coalesce(1).write.mode("append").parquet(store.p("lineage"))
    return lineage


# --------------------------------------------------------------------------
# stage 2: multi-way merge + lexicon + final postings
# --------------------------------------------------------------------------

def finalize_index(
    spark: SparkSession,
    store: IndexStore,
    mode: str,
    k1: float = score_mod.K1_DEFAULT,
    b: float = score_mod.B_DEFAULT,
    segment_size: int = DEFAULT_SEGMENT_SIZE,
) -> dict:
    seg_root = store.p("segments")
    seg_dirs = [
        os.path.join(seg_root, d) for d in sorted(os.listdir(seg_root), key=int)
    ]
    blocks = spark.read.parquet(*seg_dirs)

    # lexicon: df/cf roll up from block partials; dense ids by term order
    lex = blocks.groupBy("term").agg(
        F.sum("n_docs").alias("df"), F.sum("sum_tf").alias("cf")
    )
    lex = assign_dense_ids(lex, "term", "term_id")
    lex.write.mode("overwrite").parquet(store.p("lexicon"))
    lex = spark.read.parquet(store.p("lexicon"))

    # consolidated doc_map + corpus stats
    dm_root = store.p("doc_map")
    dm_dirs = [
        os.path.join(dm_root, d) for d in sorted(os.listdir(dm_root), key=int)
    ]
    doc_map = spark.read.parquet(*dm_dirs)
    stats = doc_map.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(stats["n"]), float(stats["avgdl"] or 0.0)

    # final postings: attach term_id + df, exact per-block score bound
    @F.pandas_udf("double")
    def _block_max_score(tfs: pd.Series, dls: pd.Series, dfs: pd.Series) -> pd.Series:
        from groonga_spark.codec import vb_decode

        out = np.empty(len(tfs), np.float64)
        for i in range(len(tfs)):
            tf = vb_decode(tfs.iloc[i]).astype(np.float64)
            dl = vb_decode(dls.iloc[i]).astype(np.float64)
            out[i] = score_mod.bm25(tf, dl, float(dfs.iloc[i]), n_docs, avgdl, k1, b).max()
        return pd.Series(out)

    final = (
        blocks.join(lex.select("term", "term_id", "df"), "term")
        .withColumn("block_max_score", _block_max_score("tfs", "dls", "df"))
        .drop("term", "df")
    )
    (
        final.repartitionByRange(F.col("term_id"))
        .sortWithinPartitions("term_id", "segment", "block_id")
        .write.mode("overwrite")
        .parquet(store.p("postings"))
    )

    lineage = spark.read.parquet(store.p("lineage"))
    totals = lineage.filter(F.col("status") == "committed").agg(
        F.sum("postings_emitted").alias("p"), F.sum("bytes_compressed").alias("b")
    ).collect()[0]

    meta = {
        "format_version": 1,
        "n_docs": n_docs,
        "avgdl": avgdl,
        "k1": k1,
        "b": b,
        "tokenizer_mode": mode,
        "normalizer_version": NORMALIZER_VERSION,
        "segment_size": segment_size,
        "n_segments": len(seg_dirs),
        "n_terms": lex.count(),
        "postings_total": int(totals["p"] or 0),
        "bytes_compressed": int(totals["b"] or 0),
    }
    store.write_meta(meta)
    return meta


# --------------------------------------------------------------------------
# the end-to-end build
# --------------------------------------------------------------------------

def build_index(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    mode: str = "delimit",
    segment_size: int = DEFAULT_SEGMENT_SIZE,
    salt_target: int = SALT_TARGET,
    resume: bool = True,
    fail_after_segments: int | None = None,
) -> dict:
    """Build (or resume) a full index over docs(doc_id, text, ...).

    ``fail_after_segments`` is a test hook: raise after N segment commits
    to exercise resume-after-kill (BASELINE.md row 6).
    """
    store = IndexStore(path)
    os.makedirs(path, exist_ok=True)

    bounds = docs.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    if bounds[0] is None:
        raise ValueError("empty corpus")
    max_id = int(bounds[1])
    n_segments = max_id // segment_size + 1

    done = store.committed_segments(spark) if resume else set()
    built = 0
    for seg in range(n_segments):
        if seg in done:
            continue
        build_segment(
            spark,
            store,
            docs,
            seg,
            seg * segment_size,
            (seg + 1) * segment_size,
            mode,
            salt_target,
        )
        built += 1
        if fail_after_segments is not None and built >= fail_after_segments:
            raise RuntimeError(f"injected failure after {built} segments")

    return finalize_index(spark, store, mode, segment_size=segment_size)
