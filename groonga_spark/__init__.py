"""groonga_spark — a PySpark-native fulltext analytics engine.

A brand-new implementation (NOT a port) of the query / data-processing
capabilities of the reference engine (ohkubo/groonga — a Groonga tree;
see SURVEY.md): inverted-index build (term-sorted docID deltas, varbyte
compression, skip-block metadata), multi-way segment merge with explicit
skew salting, BM25 top-k with block-max WAND, Groonga-style bigram /
whitespace tokenization with NFKC normalization, drilldowns, score-carrying
result-set algebra, and the scalar-function surface — re-expressed as
idiomatic Spark: DataFrames + vectorized Arrow/pandas UDFs, with Catalyst
doing pushdown/pruning and partitioning/skew handled explicitly.

Reference citations in docstrings use the convention ``[G: path · symbol]``
meaning "the public groonga/groonga source tree" (the /root/reference mount
was empty at survey time — SURVEY.md §0); they identify the capability
being re-expressed, not code that was copied.
"""

__version__ = "0.2.0"

from groonga_spark.session import get_spark  # noqa: F401

__all__ = [
    "get_spark",
    # lazy-imported public surface (heavy deps load on first use):
    # build_index, compact_index, FulltextIndex, select, curate_corpus
]


def __getattr__(name):  # PEP 562 lazy exports
    if name in ("build_index", "compact_index", "prepare_pages"):
        from groonga_spark import build

        return getattr(build, name)
    if name == "FulltextIndex":
        from groonga_spark.search import FulltextIndex

        return FulltextIndex
    if name == "select":
        from groonga_spark.select import select

        return select
    if name == "curate_corpus":
        from groonga_spark.pipeline import curate_corpus

        return curate_corpus
    if name in ("MultiFieldIndex", "build_multifield_index"):
        from groonga_spark import multifield

        return getattr(multifield, name)
    if name in ("CommandContext", "execute"):
        from groonga_spark import commands

        return getattr(commands, name)
    if name == "release":
        from groonga_spark.cacheutil import release

        return release
    raise AttributeError(name)
