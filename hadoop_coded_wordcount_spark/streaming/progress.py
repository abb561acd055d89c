"""Streaming progress metrics — the O12 counter surface for streams.

The reference's research-observable output is a pair of job counters
(PACKETS_SENT / ENCODED_PACKETS_SENT, reference WordCountDriver.java:17-20);
``plans/metrics.py`` maps that to executed-plan SQLMetrics for batch. This
module is the streaming analog: every micro-batch publishes a
StreamingQueryProgress (input rows, processing rates, per-stateful-operator
state rows/memory), and :func:`run_with_progress` aggregates those into one
communication/state profile for a finite (AvailableNow) run.

At 100 TB the same numbers feed backpressure dashboards and state-store
capacity planning; nothing here is test-only plumbing.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

__all__ = ["run_with_progress", "progress_totals"]


def progress_totals(progresses: list[dict[str, Any]]) -> dict[str, int]:
    """Fold a list of StreamingQueryProgress dicts into totals:
    micro-batch count, input rows, and state-store rows/memory from the
    LAST progress carrying state operators (state is a level, not a
    flow — summing it across batches would double-count)."""
    totals = {
        "n_batches": 0,
        "input_rows_total": 0,
        "state_rows_last": 0,
        "state_memory_bytes_last": 0,
    }
    for p in progresses:
        if p is None:
            continue
        totals["n_batches"] += 1
        totals["input_rows_total"] += int(p.get("numInputRows") or 0)
        ops = p.get("stateOperators") or []
        if ops:
            totals["state_rows_last"] = sum(
                int(o.get("numRowsTotal") or 0) for o in ops
            )
            totals["state_memory_bytes_last"] = sum(
                int(o.get("memoryUsedBytes") or 0) for o in ops
            )
    return totals


def run_with_progress(
    sdf: DataFrame,
    checkpoint_dir: str,
    query_name: str = "hcw_progress_run",
    output_mode: str = "append",
    timeout_sec: int = 120,
) -> dict[str, int]:
    """Run a finite AvailableNow pass of a streaming DataFrame into the
    noop sink and return its aggregated progress profile.

    The noop sink executes every operator and row with zero output I/O —
    the same measurement discipline as ``bench.materialize`` — so the
    profile measures the streaming plan, not a sink.
    """
    import json

    spark = sdf.sparkSession
    # recentProgress only RETAINS the last numRecentProgressUpdates
    # entries (default 100) — a >100-micro-batch run would silently
    # undercount the "aggregated profile". Raise the retention for this
    # run and hard-fail if a run ever fills it, instead of lying.
    retain_key = "spark.sql.streaming.numRecentProgressUpdates"
    n_keep = 10_000
    try:
        prev = spark.conf.get(retain_key)
    except Exception:
        prev = None
    spark.conf.set(retain_key, str(n_keep))
    q = (
        sdf.writeStream.format("noop")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(timeout_sec)
        if not finished:
            # returning partial totals as if complete would be silent
            # data loss; the caller asked for a FINITE AvailableNow run
            raise TimeoutError(
                f"streaming run {query_name!r} did not finish within "
                f"{timeout_sec}s"
            )
        # recentProgress returns JSON strings on some PySpark versions and
        # dicts on others; normalize.
        progs = []
        for p in q.recentProgress:
            progs.append(json.loads(p) if isinstance(p, str) else p)
    finally:
        q.stop()  # idempotent after termination; kills the leak on timeout
        if prev is None:
            spark.conf.unset(retain_key)
        else:
            spark.conf.set(retain_key, prev)
    if len(progs) >= n_keep:
        raise RuntimeError(
            f"progress buffer filled ({n_keep}); totals would undercount"
        )
    return progress_totals(progs)
