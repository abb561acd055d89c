"""Cross-engine tokenizer-dialect battery (round 10).

Java's ``\\s`` (every Spark regex) includes vertical tab ``\\x0b``;
RE2's (every DuckDB regex) does not. Before round 10 a document
containing ``\\x0b`` tokenized differently on the two engines — dormant
on the driver's corpora (scanned: zero exotic-whitespace rows at all
SFs) but a real divergence, found by adversarial probing of the ingest
screen. Every whitespace class in the DuckDB oracles (and the shared
Spark/oracle ``BPE_ISH_PATTERN``, where adding ``\\x0b`` is a Java
no-op) now carries the explicit ``\\x0b`` alignment. This battery pins
operator == oracle on text the gate corpora never exercise: control
whitespace including the ``\\x0b`` suspect, unicode, emoji, CJK, regex
metacharacters, NULL text/lang, sub-n-token and empty docs.
"""

from __future__ import annotations

import shutil

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry

SRC = "/root/testdata/sf0.001"

ROWS = [
    (1, "plain three token doc", "en", "src1"),
    (2, "  leading and trailing spaces doc  ", "en", "src2"),
    (3, "tab\tsep\nnewline\rcr tokens here", "en", "src3"),
    (4, "one two", "en", "src4"),
    (5, "", "en", "src5"),
    (6, "emoji \U0001F600 test token \U0001F600 again", "en", "src6"),
    (7, "cjk 中文 分词 测试 词元", "zh", "src7"),
    (8, "punct, a. b! c? d; e:", "en", "src8"),
    (9, "a b c a b c a b c", "en", "src9"),
    (10, "x\x0by vertical tab doc here", "en", "src2"),
    (12, "quote ' double \" backslash \\ pipe | token", "en", "src4"),
    (20, "the same shared near dup text body", "en", "src2"),
    (21, "the same shared near dup text body", "en", "src15"),
    (22, "the same shared near dup text tail", "de", "src16"),
    (31, None, "en", "src1"),
    (32, "null lang still tokenizes fine", None, "src3"),
]

# every text-family query that diverged (or could) on the battery before
# the alignment; wordcount/token_count/text_stats were the loudest
QUERIES = [
    "wordcount",
    "wordcount_by_source",
    "topk_words",
    "text_stats",
    "lang_id",
    "quality_score",
    "token_count",
    "dedup_exact",
    "dedup_fingerprint",
    "char_entropy",
    "hapax_rate",
    "readability_scores",
    "minhash_signatures",
    "simhash64",
    "unigram_surprisal",
    "token_coverage_topk",
    "ttr_by_lang",
    "zipf_fit",
    "gopher_quality_flags",
    "winnowing_fingerprint",
    "passage_dedup",
    "gopher_repetition",
]

# The BPE oracles (_bpe_oracle, registry.py) encode vocab state as a
# '|'-delimited symbol string — a DOCUMENTED precondition that document
# text contains no '|' (the Spark side is array-native and total). They
# get the battery with the pipe doc's '|' removed; the precondition on
# the driver's corpora is asserted below.
BPE_QUERIES = ["tokenizer_fertility", "bpe_train_merges", "bpe_encode_tokens"]


def _mk_battery(tmp_path_factory, rows):
    d = tmp_path_factory.mktemp("dialect")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        shutil.copy(f"{SRC}/{t}.parquet", str(d / f"{t}.parquet"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len().astype("Int64")
    pdf.to_parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def battery_dir(tmp_path_factory):
    return _mk_battery(tmp_path_factory, ROWS)


@pytest.fixture(scope="module")
def bpe_battery_dir(tmp_path_factory):
    rows = [
        (i, t.replace("|", "respecting the precondition") if t else t, g, s)
        for i, t, g, s in ROWS
    ]
    return _mk_battery(tmp_path_factory, rows)


def _compare(spark, duck_dir, name):
    qs, osql = entry.queries(), entry.oracle_sql()
    sdf = qs[name](spark, duck_dir)
    sp = pd.DataFrame(
        [r.asDict() for r in sdf.collect()], columns=sdf.columns
    )
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{duck_dir}/{t}.parquet')"
        )
    dk = con.execute(osql[name]).fetchdf()
    c = sorted(sp.columns)
    assert (
        sp.reindex(c, axis=1)
        .sort_values(c)
        .reset_index(drop=True)
        .astype(str)
        .equals(
            dk.reindex(c, axis=1)
            .sort_values(c)
            .reset_index(drop=True)
            .astype(str)
        )
    ), name


@pytest.mark.parametrize("name", QUERIES)
def test_text_oracle_survives_adversarial_text(spark, battery_dir, name):
    _compare(spark, battery_dir, name)


@pytest.mark.parametrize("name", BPE_QUERIES)
def test_bpe_oracle_survives_adversarial_text(spark, bpe_battery_dir, name):
    _compare(spark, bpe_battery_dir, name)


def test_gate_corpora_satisfy_the_bpe_separator_precondition():
    """_bpe_oracle's docstring claims the no-'|'-in-text precondition is
    asserted in tests — make that true: no document at any driver SF
    contains the separator (or \\x1e, the obvious alternative)."""
    con = duckdb.connect()
    for sf in ("0.001", "0.01", "0.1"):
        n = con.execute(
            "SELECT count(*) FROM read_parquet("
            f"'/root/testdata/sf{sf}/documents.parquet') "
            "WHERE text LIKE '%|%' OR text LIKE '%' || chr(30) || '%'"
        ).fetchone()[0]
        assert n == 0, sf
