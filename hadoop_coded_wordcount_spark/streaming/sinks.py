"""Streaming sinks beyond the built-ins — the ``foreachBatch`` bridge.

``writeStream.format(...)`` covers append-style sinks; ``foreachBatch``
is the production pattern for everything else: each micro-batch arrives
as a *batch* DataFrame, so the full batch write surface (partitioned
parquet, merge/upsert into a table format, JDBC, multi-sink fan-out)
composes with streaming without a dedicated connector.

Scale notes: the batch handler runs on the driver but its DataFrame
operations execute distributed as usual; idempotence across retries comes
from (batch_id, deterministic path/merge-key) — exactly what
``append_batches_to_parquet`` demonstrates by routing every batch to a
``batch_id=N`` partition directory (replayed batches overwrite their own
partition, never duplicate into another).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

__all__ = ["idempotent_parquet_batch_writer", "append_batches_to_parquet"]


def idempotent_parquet_batch_writer(
    path: str,
) -> Callable[[DataFrame, int], None]:
    """The exactly-once ``foreachBatch`` handler: route every micro-batch
    to its own ``batch_id=N`` partition directory with overwrite.

    Streaming gives at-least-once handler invocation — after a crash
    between the write and the checkpoint commit, the SAME batch id is
    replayed. Keying the write target on batch_id makes the replay a
    self-overwrite (idempotent), so downstream readers of ``path`` see
    exactly-once output. This is the general recipe: (batch_id,
    deterministic target) — the same shape works as a MERGE key for
    table formats or a dedup key for JDBC."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return handle


def append_batches_to_parquet(
    stream: DataFrame, path: str, checkpoint: str
) -> "pyspark.sql.streaming.StreamingQuery":  # noqa: F821
    """Write each micro-batch of ``stream`` into a batch-id-partitioned
    parquet layout. Restart-safe: a replayed batch id overwrites only its
    own partition (see :func:`idempotent_parquet_batch_writer`)."""
    handle = idempotent_parquet_batch_writer(path)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime="0 seconds")
        .start()
    )
