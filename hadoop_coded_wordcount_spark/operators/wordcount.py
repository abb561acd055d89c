"""Word count — the reference's one and only query, Spark-first.

Reference semantics (SURVEY.md §2.1, reference WordCount.java):

* O1 scan: text lines            → ``documents.text`` column scan
* O2 tokenize+flatten            → ``explode(split(text, '\\s+'))``
  (reference WordCount.java:44-63 tokenizes with StringTokenizer)
* O3 locality enrichment         → ``source`` column / broadcast dim join
  (reference WordCount.java:48-58 + FileLocationsLookup.java:62-65 attach
  HDFS replica hostnames; in Spark, physical locality belongs to the
  scheduler, so the *provenance* column plays that role in the data model)
* O4 key construction            → groupBy columns
* O5+O9 partial+final aggregation→ ``groupBy().count()`` — Catalyst compiles
  this to partial HashAggregate → Exchange → final HashAggregate, i.e. the
  combiner (reference WordCount.java:95-114) and reducer
  (reference WordCount.java:226-261) for free, map-side combine included
* O6 hash partitioning           → the Exchange's hashpartitioning
* O8 sort grouping               → engine-internal; user-visible orderBy
* O10 projection                 → select(word, count)
* O11 sink                       → caller's ``df.write`` (queries return DFs)

The coded-shuffle XOR path (reference WordCount.java:125-209) is a wire-level
optimization that Spark's sort-based compressed shuffle already owns — see
``plans/coded_demo.py`` (working XOR pairing + decode over mapPartitions,
accumulator-counted) for the didactic analog and ``plans/metrics.py``
(executed-plan SQLMetrics) for the PACKETS_SENT counter surface (reference
WordCountDriver.java:17-20).

Scale notes: tokenize+count is embarrassingly parallel; the single shuffle is
on ``word`` (high cardinality, low skew after map-side partial agg). At
100 TB the only knob that matters is keeping the partial aggregate's hash map
in memory — Spark spills it automatically — and letting AQE coalesce the
post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "tokenize",
    "wordcount",
    "wordcount_by_source",
    "wordcount_provenance",
    "topk_words",
]

#: Whitespace tokenizer, identical semantics to Java's StringTokenizer on
#: default delimiters (reference WordCount.java:45-47): split on runs of
#: whitespace, drop empty tokens.
TOKEN_PATTERN = r"\s+"


def tokenize(df: DataFrame, text_col: str = "text", out_col: str = "word") -> DataFrame:
    """O2: one row per whitespace-delimited token.

    ``split`` + ``explode`` stays inside whole-stage codegen (Generate +
    Project) — no Python boundary. Empty tokens (leading whitespace) are
    filtered to match StringTokenizer semantics.
    """
    return (
        df.select(F.explode(F.split(F.col(text_col), TOKEN_PATTERN)).alias(out_col))
        .where(F.col(out_col) != "")
    )


def wordcount(documents: DataFrame) -> DataFrame:
    """The flagship: SELECT word, COUNT(*) FROM tokens GROUP BY word.

    Exercises O1,O2,O4,O5,O6,O8,O9,O10 of SURVEY.md §2.1 in one plan:
    FileScan(text) → Project+Generate → HashAggregate(partial) →
    Exchange(hashpartitioning(word)) → HashAggregate(final).
    """
    return (
        tokenize(documents)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def wordcount_by_source(documents: DataFrame) -> DataFrame:
    """GroupedWord analog: count per (provenance, word) composite key.

    The reference's intermediate key is (splitLocations[], word)
    (reference GroupedWord.java:12-16); the ``source`` column is the
    data-model-visible provenance axis. Adds one grouping column — same
    single-shuffle plan.
    """
    return (
        documents.select(
            "source", F.explode(F.split("text", TOKEN_PATTERN)).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("source", "word")
        .agg(F.count("*").alias("cnt"))
    )


def wordcount_provenance(documents: DataFrame) -> DataFrame:
    """O3 analog: broadcast-join a tiny location catalog onto the counts.

    The reference joins each record against BlockLocationInfo.xml via an
    in-memory point lookup (reference FileLocationsLookup.java:62-65) — a
    map-side broadcast join. Here the catalog is derived from the distinct
    sources (bounded, tiny) and joined with an explicit ``F.broadcast`` hint,
    so the big side never shuffles for the join.
    """
    catalog = (
        documents.select("source")
        .distinct()
        .select(
            "source",
            F.concat(F.lit("node-"), F.substring("source", -1, 1)).alias("home_node"),
        )
    )
    counts = wordcount_by_source(documents)
    return (
        counts.join(F.broadcast(catalog), "source", "left")
        .select("source", "home_node", "word", "cnt")
    )


def topk_words(documents: DataFrame, k: int = 100) -> DataFrame:
    """Top-k words by count. orderBy+limit compiles to TakeOrderedAndProject:
    each partition keeps a k-row heap, the driver merges k·P rows — no global
    sort at any scale. Ties broken on word for determinism.
    """
    return wordcount(documents).orderBy(F.desc("cnt"), F.asc("word")).limit(k)
