"""End-to-end checks for the word-count family (reference's full surface)."""

from __future__ import annotations

from conftest import SF0001, SF001
from oracle_harness import compare

from hadoop_coded_wordcount_spark.operators.wordcount import tokenize, wordcount
from hadoop_coded_wordcount_spark.sources.catalog import load_table


def test_tokenize_matches_stringtokenizer_semantics(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("  leading",), ("trailing  ",), ("one",)], ["text"]
    )
    toks = [r.word for r in tokenize(df).collect()]
    assert sorted(toks) == ["a", "b", "c", "leading", "one", "trailing"]


def test_wordcount_counts(spark):
    df = spark.createDataFrame([("x y x",), ("y",)], ["text"])
    rows = {r.word: r.cnt for r in wordcount(df).collect()}
    assert rows == {"x": 2, "y": 2}


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert df.columns == ["word", "cnt"]


def test_wordcount_family_vs_oracle(spark):
    for name in (
        "wordcount",
        "wordcount_by_source",
        "wordcount_provenance",
        "topk_words",
    ):
        res = compare(name, spark, SF001, verbose=True)
        assert res["rows"] and res["schema"] and res["exact"], (name, res)
