"""Stream-stream joins and streaming deduplication.

Two Structured Streaming capabilities with no batch twin:

* **interval join of two streams** — clicks ⋈ views per user where the
  view precedes the click by at most a bounded interval. Both sides are
  unbounded, so the join is only executable because the *time-range
  condition plus watermarks* bound how much of each side must be kept:
  Spark buffers each side in the state store and evicts rows once the
  other side's watermark passes their join-window. Without the interval
  condition the state would grow forever — that constraint is the whole
  design, not an optimization.
* **dropDuplicatesWithinWatermark** — streaming exact dedup. Batch dedup
  (``dedup.dedup_exact``) sees the whole corpus; a stream cannot, so the
  guarantee is scoped: duplicates arriving within the watermark horizon
  are dropped, and state for a key is freed once the watermark passes it.
  This is the ingest-time companion of the batch dedup operators — run it
  at the stream head to thin obvious repeats, then batch-dedup the stored
  corpus exactly.

Both operators keep state bounded by *event time*, which is the property
that lets them run for months on a cluster — state size tracks the
watermark horizon, not the stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .windows import _as_event_time

__all__ = ["clicks_after_views", "dedup_within_watermark", "enrich_with_static"]


def clicks_after_views(
    views: DataFrame,
    clicks: DataFrame,
    max_gap: str = "30 minutes",
    lateness: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Attribute each click to view events within ``max_gap`` before it.

    The join condition is equi (user_id) + interval (view.ts ∈
    [click.ts − max_gap, click.ts]); state eviction needs BOTH sides
    watermarked. Output carries the pair of event ids and the gap in
    seconds — the streaming analog of the batch as-of join
    (``relational.join_asof``), except every qualifying view matches,
    not only the latest.

    ``how="left_outer"`` keeps unattributed clicks: Spark holds them in
    state until the view-side watermark passes their join window — only
    then can "no view will ever arrive" be decided — and emits them
    null-padded. Outer results therefore trail the watermark; a batch
    that never advances it past the window keeps them buffered (the test
    pushes a late dummy event for exactly this reason).
    """
    v = (
        _as_event_time(views).withWatermark("ts", lateness)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    c = (
        _as_event_time(clicks).withWatermark("ts", lateness)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    cond = (
        (F.col("v_user") == F.col("c_user"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (
            F.col("view_ts")
            >= F.col("click_ts") - F.expr(f"INTERVAL {max_gap}")
        )
    )
    return c.join(v, cond, how).select(
        "click_id",
        F.col("c_user").alias("user_id"),
        "view_id",
        (
            F.col("click_ts").cast("long") - F.col("view_ts").cast("long")
        ).alias("gap_sec"),
    )


def dedup_within_watermark(
    stream: DataFrame, lateness: str = "10 minutes"
) -> DataFrame:
    """Streaming exact dedup on content identity within the watermark.

    Keys on the event's content hash (id-independent — re-sent events get
    new ids but identical payloads), so retransmissions and at-least-once
    replays collapse. State per key is dropped once the watermark passes
    it — bounded memory at any stream length.
    """
    keyed = stream.withColumn(
        "content_key",
        F.sha2(
            F.concat_ws(
                "|",
                F.col("user_id").cast("string"),
                F.col("event_type"),
                F.col("ts").cast("string"),
                F.col("value").cast("string"),
            ),
            256,
        ),
    )
    return _as_event_time(keyed).withWatermark(
        "ts", lateness
    ).dropDuplicatesWithinWatermark(
        ["content_key"]
    )


def enrich_with_static(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: enrich each streaming row with a broadcast
    dimension — the third join modality next to batch-batch and
    stream-stream, and the common shape for routing/annotation at the
    stream head (event type → category, user → tenant, ...).

    Unlike stream-stream, this needs NO watermark and NO join state: the
    static side is just re-read (and with the broadcast hint, shipped
    once per executor) each micro-batch, so the stream side stays a
    stateless map — the 100 TB/day shape for reference-data enrichment.
    The static side may even be updated between batches (each batch sees
    the current table); only the stream side is incremental.
    """
    return stream.join(F.broadcast(dim), on)
