"""Pandas-UDF surface — the engine's Python extension points.

The reference's only "UDF" mechanism is its hard-coded Mapper/Combiner/
Reducer classes (reference WordCount.java:26,76,226). Spark's equivalents,
demonstrated here with one production-shaped example each:

* **scalar pandas_udf** — Arrow-batched column transform (the Map);
* **applyInPandas grouped map** — per-group pandas computation (the
  Combiner's moral equivalent: reference WordCount.java:95-114 receives a
  sorted group and emits aggregated records);
* **pandas_udf grouped agg** — per-group scalar reduction (the Reducer,
  reference WordCount.java:226-261).

UDFs are the slow path by design (serialize → Python → deserialize, per
batch): everything expressible in built-in functions elsewhere in this
repo stays JVM-side. These exist for the semantics Spark can't express —
and they are Arrow-vectorized (pandas ops on whole batches), never
row-at-a-time Python.

Determinism discipline for the oracle: string ops and integer sums only —
no float accumulation in Python (numpy's pairwise summation does not match
a SQL engine's sequential fold ulp-for-ulp).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "normalize_text",
    "wordcount_combiner_pandas",
    "grouped_k_stats",
    "chunk_documents",
]


@F.pandas_udf(StringType())
def _normalize_udf(s: pd.Series) -> pd.Series:
    """lower + trim + collapse whitespace, vectorized over the Arrow batch."""
    return s.str.lower().str.strip().str.replace(r"\s+", " ", regex=True)


def normalize_text(documents: DataFrame) -> DataFrame:
    """Scalar pandas UDF demo: text normalization.

    (The same expression exists JVM-side in ``dedup.dedup_fingerprint``;
    here it is the Arrow-batch reference implementation — the shape any
    custom Python normalization, e.g. unicode NFC or HTML stripping,
    plugs into.)"""
    return documents.select(
        "doc_id", _normalize_udf(F.col("text")).alias("normalized")
    )


_WC_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("word", StringType()),
        StructField("cnt", LongType()),
    ]
)


def wordcount_combiner_pandas(documents: DataFrame) -> DataFrame:
    """Grouped-map ``applyInPandas``: the reference combiner re-expressed.

    Each ``source`` group arrives as one pandas DataFrame; the function
    tokenizes and emits (source, word, cnt) partial counts — exactly what
    the reference combiner does per map task (reference
    WordCount.java:95-114), except the group key is the provenance column
    rather than HDFS block locations.

    Scale note: one shuffle on source, then per-group pandas. Groups must
    fit in executor memory — fine for bounded provenance cardinality; for
    unbounded keys use the built-in ``wordcount_by_source`` (partial
    hash-agg, no such limit). That trade is exactly why UDFs are the
    fallback, not the default.
    """

    def combine(pdf: pd.DataFrame) -> pd.DataFrame:
        words = (
            pdf["text"]
            .str.split(r"\s+", regex=True)
            .explode()
        )
        words = words[words != ""]
        counts = words.value_counts().sort_index()
        return pd.DataFrame(
            {
                "source": pdf["source"].iloc[0],
                "word": counts.index,
                "cnt": counts.values,
            }
        )

    return documents.select("source", "text").groupBy("source").applyInPandas(
        combine, schema=_WC_SCHEMA
    )


@F.pandas_udf(LongType())
def _k_sum_udf(k: pd.Series) -> int:
    """Grouped-agg pandas UDF: exact integer sum (order-independent, so
    safe under any partitioning — float sums would not be)."""
    return int(k.sum())


@F.pandas_udf(LongType())
def _k_count_udf(k: pd.Series) -> int:
    """Row count as a pandas UDF — Spark disallows mixing group-agg pandas
    UDFs with built-in aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT),
    so the count crosses the same Arrow boundary."""
    return len(k)


def grouped_k_stats(events: DataFrame) -> DataFrame:
    """Grouped aggregation with a pandas UDF: sum of the JSON ``k``
    property per event type. The JSON parse stays JVM-side (``from_json``
    — cheap, codegen'd); only the numeric reduction crosses into Python,
    keeping the Arrow payload to one int64 column."""
    k = F.from_json("props", "k BIGINT").getField("k")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            _k_sum_udf("k").alias("k_sum"),
            _k_count_udf("k").alias("n"),
        )
        .select(
            "event_type",
            "k_sum",
            "n",
            F.round(F.col("k_sum").cast("double") / F.col("n"), 6).alias("k_mean"),
        )
    )


def chunk_documents(
    documents: DataFrame, chunk_tokens: int = 32, overlap: int = 0
) -> DataFrame:
    """Python UDTF: one document row → many fixed-size token chunks.

    The table-function API is the fourth Python extension point (after
    scalar/grouped-map/grouped-agg): ``eval`` yields any number of rows
    per input. Chunking is *the* training-data table function — documents
    become ~N-token windows for tokenization/packing. The rule here
    (whitespace tokens, fixed window, optional ``overlap`` for sliding
    training windows) is deliberately
    SQL-expressible so the DuckDB oracle replays it exactly; a BPE-aware
    chunker with overlap plugs into the same shape.

    Scale: a UDTF is a per-partition Python generator — no shuffle of its
    own; the explode factor lands in the scan stage. Python crossing cost
    applies: for rules SQL can express, the JVM path (explode over
    ``F.sequence`` + ``F.slice``) wins — the UDTF earns its cost only
    when the chunking logic needs a real tokenizer.
    """
    if not 0 <= overlap < chunk_tokens:
        # caught here, not inside the UDTF: stride <= 0 would otherwise
        # surface as a worker-side ValueError (range step 0) or, worse,
        # silently yield no chunks on a negative stride
        raise ValueError(
            f"require 0 <= overlap < chunk_tokens, got overlap={overlap}, "
            f"chunk_tokens={chunk_tokens}"
        )
    import re

    from pyspark.sql.functions import udtf

    @udtf(
        returnType="doc_id bigint, chunk_idx int, chunk string, n_tokens int"
    )
    class ChunkDocs:
        def eval(self, doc_id, text):
            toks = [t for t in re.split(r"\s+", text or "") if t]
            stride = chunk_tokens - overlap
            idx = 0
            for i in range(0, len(toks), stride):
                part = toks[i : i + chunk_tokens]
                yield doc_id, idx, " ".join(part), len(part)
                idx += 1
                if i + chunk_tokens >= len(toks):
                    break  # last window reached the end; no empty tail

    from ..sources.catalog import ensure_parallelism

    spark = documents.sparkSession
    # Spread the narrow scan first: a single parquet file is one input
    # split, so without this the UDTF's Python generator runs on ONE
    # worker regardless of cores (no-op at real scale — same rationale
    # as every other compute-heavy documents operator).
    docs = ensure_parallelism(documents.select("doc_id", "text"))
    # TVF invocation over a relation: register and call via SQL (the
    # DataFrame API has no table-argument binding for UDTFs yet). The
    # view name is per-call unique so concurrent queries can't collide.
    import uuid

    spark.udtf.register("chunk_documents_udtf", ChunkDocs)
    view = f"hcw_udtf_src_{uuid.uuid4().hex[:12]}"
    docs.createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT c.* FROM {view}, LATERAL chunk_documents_udtf(doc_id, text) c"
    )


def compression_ratio_quality(documents) -> "DataFrame":
    """Compression-ratio quality signal (the Gopher-family repetition
    filter): zlib-deflate each document (level 6, fixed) and report
    bytes_out/bytes_in plus the keep verdict at the published ~0.3
    floor — highly repetitive/templated text compresses far below
    normal prose, and the ratio needs no tokenizer, no LM, no
    vocabulary. stdlib zlib is deterministic for a fixed level and
    input, but no SQL engine can replay DEFLATE, so this rides the
    rows-only gate with planted-fixture tests (the multimodal_features
    precedent).

    Runs as an Arrow-batched pandas UDF — bytes never leave the
    executor, one pass, embarrassingly parallel.
    """
    import pandas as pd
    import pyspark.sql.functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def ratio(texts: pd.Series) -> pd.Series:
        import zlib

        def one(t):
            if not t:
                return None
            raw = t.encode("utf-8")
            return round(len(zlib.compress(raw, 6)) / len(raw), 6)

        return texts.map(one)

    scored = documents.select(
        "doc_id",
        "source",
        F.length("text").cast("bigint").alias("n_chars"),
        ratio(F.col("text")).alias("compression_ratio"),
    )
    return scored.select(
        "doc_id",
        "source",
        "n_chars",
        "compression_ratio",
        (F.col("compression_ratio") >= 0.3).cast("int").alias("keep"),
    )
