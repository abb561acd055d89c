"""UDF-surface and multimodal-plumbing tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hadoop_coded_wordcount_spark.functions import pandas_surface as pu
from hadoop_coded_wordcount_spark.operators import multimodal as mm
from hadoop_coded_wordcount_spark.operators import wordcount as wc
from hadoop_coded_wordcount_spark.sources.catalog import load_table

SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "  The  Quick   FOX ", "en", "srcA", 19),
        (1, "fox fox the", "en", "srcA", 11),
        (2, "über straße", "de", "srcB", 11),  # multi-byte utf-8
    ]
    return spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )


def test_scalar_udf_normalizes(docs):
    out = {r.doc_id: r.normalized for r in pu.normalize_text(docs).collect()}
    assert out[0] == "the quick fox"
    assert out[2] == "über straße"


def test_grouped_map_matches_builtin_wordcount(spark):
    """The pandas combiner must agree exactly with the JVM-side
    wordcount_by_source on the real table — same semantics, two engines."""
    documents = load_table(spark, SF001, "documents")
    udf_rows = {
        (r.source, r.word): r.cnt
        for r in pu.wordcount_combiner_pandas(documents).collect()
    }
    builtin_rows = {
        (r.source, r.word): r.cnt
        for r in wc.wordcount_by_source(documents).collect()
    }
    assert udf_rows == builtin_rows


def test_grouped_agg_k_stats(spark):
    events = load_table(spark, SF001, "events")
    out = pu.grouped_k_stats(events).collect()
    assert len(out) == 5  # event types
    for r in out:
        assert r.k_sum > 0 and r.n > 0
        assert r.k_mean == pytest.approx(r.k_sum / r.n, abs=1e-6)


def test_multimodal_schema_and_features(docs):
    feats = mm.media_features(mm.to_multimodal(docs))
    assert feats.schema.simpleString() == (
        "struct<doc_id:bigint,media_type:string,n_bytes:int,"
        "header:string,byte_checksum:bigint>"
    )
    rows = {r.doc_id: r for r in feats.collect()}
    # multi-byte text: n_bytes > n_chars
    assert rows[2].n_bytes == len("über straße".encode("utf-8"))
    assert rows[0].header == "20205468"  # '  Th' in hex
    assert rows[0].media_type == "text/plain;src=srcA"


def test_multimodal_streams_batches(spark, docs):
    """mapInPandas must handle multiple Arrow batches — force 1-row
    batches and check nothing is dropped or duplicated."""
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
    try:
        out = mm.media_features(mm.to_multimodal(docs)).collect()
        assert sorted(r.doc_id for r in out) == [0, 1, 2]
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")


def test_decode_media_is_stub():
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"\x89PNG", "image/png")


def test_row_udf_surface_matches_builtin(spark):
    """The row-at-a-time F.udf surface (SURVEY §2.3's UDF row) exists and
    agrees with the builtin twin. It stays OUT of every hot path by
    policy: per-row Python crossing is ~10-100× slower than the
    Arrow-batched pandas_udf, which is itself the fallback after
    builtins — this test is the API demonstration, not a pattern."""
    from pyspark.sql.types import IntegerType

    @F.udf(IntegerType())
    def ws_tokens(text: str) -> int:
        return len([t for t in (text or "").split() if t])

    docs = load_table(spark, SF001, "documents").limit(100)
    got = docs.select("doc_id", ws_tokens("text").alias("n")).collect()
    want = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id",
            F.size(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias("n"),
        ).collect()
    }
    assert {r.doc_id: r.n for r in got} == want


def test_chunk_documents_overlap_windows(spark):
    """overlap > 0 produces sliding windows: consecutive chunks share
    exactly `overlap` tokens and every token is covered."""
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], ["doc_id", "text"]
    )
    rows = sorted(
        pu.chunk_documents(docs, chunk_tokens=4, overlap=2).collect(),
        key=lambda r: r.chunk_idx,
    )
    chunks = [r.chunk.split() for r in rows]
    assert chunks[0] == ["t0", "t1", "t2", "t3"]
    assert chunks[1] == ["t2", "t3", "t4", "t5"]  # 2-token overlap
    assert chunks[-1][-1] == "t9"  # full coverage
    for a, b in zip(chunks, chunks[1:]):
        assert a[-2:] == b[:2]
