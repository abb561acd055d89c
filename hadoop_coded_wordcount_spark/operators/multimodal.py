"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the media itself is an opaque
``binary`` column (or a pointer into object storage) with typed metadata
alongside; decode/resize/frame-sample run as Arrow-batched Python over
``mapInPandas``, and everything relational (filtering, joining, routing by
metadata) stays JVM-side so Catalyst can prune and push down *before* any
byte reaches Python.

The decode step itself is STUBBED here — image/audio codecs are not in
this environment (``decode_media`` raises NotImplementedError; the fake
feature extractor is deterministic bytes math) — but the Spark-side
surface is real and tested: schema, batch iteration, partition-size
control, and the metadata join path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

__all__ = ["to_multimodal", "decode_media", "media_features", "media_integrity"]

#: Output schema of the feature extractor (DDL form for mapInPandas).
FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, header string, "
    "byte_checksum bigint"
)


def to_multimodal(documents: DataFrame) -> DataFrame:
    """Shape the documents table as a multimodal table: an opaque binary
    payload plus typed metadata columns. (Stand-in payload: the utf-8
    bytes of the text column; a real pipeline lands image/audio bytes or
    object-store pointers here — the engine-side schema is identical.)"""
    return documents.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.concat(F.lit("text/plain;src="), F.col("source")).alias("media_type"),
        F.struct(
            F.col("n_chars").alias("n_chars"), F.col("lang").alias("lang")
        ).alias("meta"),
    )


def decode_media(payload: bytes, media_type: str):
    """STUB — media decoding requires codec libraries not present in this
    environment. A real deployment implements this with PIL/ffmpeg/etc.
    and calls it inside :func:`media_features`' batch loop."""
    raise NotImplementedError(
        "media decode requires codec libraries; wire PIL/ffmpeg here"
    )


def media_features(multimodal: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas``.

    The iterator-of-batches form never materializes a partition in memory
    — each Arrow batch is processed and yielded independently, which is
    what lets a 100 TB binary column stream through a fixed-size Python
    worker. Features here are deterministic bytes math (length, header
    bytes, additive checksum) standing in for the decoder's output
    (embedding, dimensions, duration, ...).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len),
                    "header": payloads.map(lambda b: bytes(b[:4]).hex()),
                    "byte_checksum": payloads.map(
                        lambda b: sum(b) % (1 << 31)
                    ),
                }
            )

    return multimodal.mapInPandas(extract, schema=FEATURE_SCHEMA)


def media_integrity(documents: DataFrame) -> DataFrame:
    """Per-media-type integrity rollup — entirely JVM-side binary ops.

    The relational half of the multimodal pattern: routing, counting,
    sizing, and content-hashing binary payloads need no Python at all
    (``length``/``sha2`` work on BINARY), so the integrity/manifest pass a
    media pipeline runs before any decode is a plain codegen'd aggregate.
    Exactly-oracled (byte lengths and sha256 agree across engines) —
    unlike the decode path, which is stubbed.
    """
    mm = to_multimodal(documents)
    return mm.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.count_distinct(F.sha2("payload", 256)).alias("distinct_payloads"),
    )
