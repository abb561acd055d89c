"""Null/empty/degenerate-input semantics — the seams a SQL engine must
get right that small green fixtures don't exercise."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_coded_wordcount_spark.operators import dedup as dd
from hadoop_coded_wordcount_spark.operators import wordcount as wc


def test_null_group_keys_form_one_group(spark):
    df = spark.createDataFrame(
        [("a", 1), (None, 2), (None, 3), ("b", 4)], ["k", "v"]
    )
    out = {r.k: (r.cnt, r.s) for r in
           df.groupBy("k").agg(F.count("*").alias("cnt"),
                               F.sum("v").alias("s")).collect()}
    assert out[None] == (2, 5)  # SQL semantics: nulls group together
    assert out["a"] == (1, 1)


def test_null_join_keys_never_match(spark):
    left = spark.createDataFrame([(1, "x"), (None, "y")], ["k", "l"])
    right = spark.createDataFrame([(1, "p"), (None, "q")], ["k", "r"])
    inner = left.join(right, "k").collect()
    assert len(inner) == 1 and inner[0].k == 1
    anti = left.join(right, "k", "left_anti").collect()
    assert [r.l for r in anti] == ["y"]  # null-keyed row survives anti


def test_empty_input_through_aggregation(spark):
    df = spark.createDataFrame([], "word string")
    docs = df.select(F.col("word").alias("text"))
    assert wc.wordcount(docs).count() == 0
    # global (ungrouped) agg over empty input still yields one row
    row = docs.agg(F.count("*").alias("n")).collect()[0]
    assert row.n == 0


def test_dedup_handles_whitespace_only_and_empty_text(spark):
    rows = [
        (0, "", "en", "s", 0),
        (1, "   ", "en", "s", 3),
        (2, "real text here", "en", "s", 14),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    # exact dedup keeps all three (texts differ byte-wise)
    assert dd.dedup_exact(docs).count() == 3
    # shingling drops token-less docs instead of crashing
    assert {r.doc_id for r in dd.shingled(docs).collect()} == {2}
    # simhash skips token-less docs
    assert {r.doc_id for r in dd.simhash64(docs).collect()} == {2}


def test_wordcount_multispace_and_leading_whitespace(spark):
    docs = spark.createDataFrame([("  a  b   a ",)], ["text"])
    out = {r.word: r.cnt for r in wc.wordcount(docs).collect()}
    assert out == {"a": 2, "b": 1}


def test_text_operators_survive_null_and_empty_text(spark):
    """Null text, empty text, whitespace-only text — the malformed rows a
    real crawl emits — must not crash any text operator; they drop or
    pass through with sane values, never raise."""
    from hadoop_coded_wordcount_spark.operators import dedup as dd
    from hadoop_coded_wordcount_spark.operators import textstats as ts

    docs = spark.createDataFrame(
        [
            (1, None, "en", "src-a", 0),
            (2, "", "en", "src-a", 0),
            (3, "   ", "en", "src-b", 3),
            (4, "real text here and more real text here", "en", "src-b", 38),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    # projections/filters: only the real doc survives where required
    assert ts.text_stats(docs).count() == 1
    assert ts.quality_score(docs).count() == 1
    assert ts.token_count(docs).count() == 4  # counts are 0, not errors
    assert dd.shingled(docs).count() == 1
    assert dd.dedup_exact(docs).count() >= 1  # null text groups fine
    sketch = ts.token_frequency_sketch(docs).collect()[0]
    assert sketch.n_tokens == 8
