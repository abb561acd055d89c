"""Central query registry: name → (spark, sf_dir) → DataFrame, plus the
DuckDB oracle SQL for each query.

This is the engine's public query surface, consumed by ``__spark_entry__.py``
(the driver contract) and by ``bench.py``. Every operator from SURVEY.md §2
gets an entry here; oracle-less entries (non-SQL-expressible ops) are listed
in ``QUERIES`` only and carry unit tests instead.

Column-name discipline: the driver's compare sorts columns by name before
hashing, so every computed column is aliased identically in the Spark plan
and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .sources.catalog import load_table
from .operators import wordcount as wc

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Word-count family — the reference's full query surface (SURVEY.md §2.1)
# ---------------------------------------------------------------------------

_TOKENS_SQL = (
    "SELECT unnest(string_split_regex(text, '\\s+')) AS word FROM documents"
)


@register(
    "wordcount",
    f"""
    SELECT word, COUNT(*) AS cnt
    FROM ({_TOKENS_SQL})
    WHERE word <> ''
    GROUP BY word
    """,
)
def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wc.wordcount(load_table(spark, sf_dir, "documents"))


@register(
    "wordcount_by_source",
    """
    SELECT source, word, COUNT(*) AS cnt
    FROM (
      SELECT source, unnest(string_split_regex(text, '\\s+')) AS word
      FROM documents
    )
    WHERE word <> ''
    GROUP BY source, word
    """,
)
def q_wordcount_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wc.wordcount_by_source(load_table(spark, sf_dir, "documents"))


@register(
    "wordcount_provenance",
    """
    WITH counts AS (
      SELECT source, word, COUNT(*) AS cnt
      FROM (
        SELECT source, unnest(string_split_regex(text, '\\s+')) AS word
        FROM documents
      )
      WHERE word <> ''
      GROUP BY source, word
    ),
    catalog AS (
      SELECT DISTINCT source, 'node-' || right(source, 1) AS home_node
      FROM documents
    )
    SELECT counts.source AS source, home_node, word, cnt
    FROM counts LEFT JOIN catalog USING (source)
    """,
)
def q_wordcount_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wc.wordcount_provenance(load_table(spark, sf_dir, "documents"))


@register(
    "topk_words",
    f"""
    SELECT word, COUNT(*) AS cnt
    FROM ({_TOKENS_SQL})
    WHERE word <> ''
    GROUP BY word
    ORDER BY cnt DESC, word ASC
    LIMIT 100
    """,
)
def q_topk_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wc.topk_words(load_table(spark, sf_dir, "documents"), k=100)
