"""Structured Streaming tests — deterministic file-source fixtures
(FIXTURES.md §3.3): batch-equivalence under AvailableNow, late-data drop
past the watermark, and session merging across micro-batches."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hadoop_coded_wordcount_spark.sources.catalog import load_table
from hadoop_coded_wordcount_spark.streaming import windows as sw

SF0001 = "/root/testdata/sf0.001"

_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, "
    "event_type string, value double"
)


def _mk_events(spark, rows):
    df = spark.createDataFrame(
        [(i, ts, uid, et, 1.0) for i, (ts, uid, et) in enumerate(rows)],
        ["event_id", "ts_str", "user_id", "event_type", "value"],
    )
    return df.select(
        "event_id",
        F.col("ts_str").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )


def test_streaming_equals_batch_available_now(spark, tmp_path):
    """AvailableNow over a file source must reproduce the batch windowed
    counts exactly on the driver events table."""
    events = load_table(spark, SF0001, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "src")
    events.write.parquet(src)

    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    q = (
        sw.watermarked_tumbling(stream, width="1 hour", lateness="10 minutes")
        .writeStream.format("memory")
        .queryName("t_stream_eq")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (str(r.window_start), r.event_type): r.cnt
        for r in spark.sql("SELECT * FROM t_stream_eq").collect()
    }
    batch = sw.tumbling_counts(events, width="1 hour")
    want = {}
    for r in batch.collect():
        want[(r.window_start, r.event_type)] = r.cnt
    # append mode only emits windows the final watermark passed; everything
    # emitted must match batch, and coverage must be near-total
    assert got, "stream produced no windows"
    for key, cnt in got.items():
        assert want[key] == cnt
    assert len(got) >= len(want) - 10  # tail windows may still be open


def test_late_data_dropped_past_watermark(spark, tmp_path):
    """A row older than (max event time - lateness) must not change its
    already-finalized window."""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    batch1 = _mk_events(
        spark,
        [
            ("2024-01-01 09:00:01", 1, "click"),
            ("2024-01-01 09:04:59", 1, "click"),
            ("2024-01-01 09:15:00", 2, "click"),
            ("2024-01-01 09:40:00", 1, "click"),  # watermark -> 09:30
        ],
    )
    batch1.write.parquet(str(src / "b1"))

    stream = spark.readStream.schema(_SCHEMA).parquet(str(src) + "/*")
    q = (
        sw.watermarked_tumbling(stream, width="10 minutes", lateness="10 minutes")
        .writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        # late row for the [09:00, 09:10) window, far behind the 09:30
        # watermark -> must be dropped; plus a fresh row advancing time
        batch2 = _mk_events(
            spark,
            [
                ("2024-01-01 09:01:00", 1, "click"),  # LATE -> dropped
                ("2024-01-01 10:00:00", 1, "click"),  # watermark -> 09:50
            ],
        )
        batch2.write.parquet(str(src / "b2"))
        q.processAllAvailable()
        # push the watermark past every window of interest so append emits
        batch3 = _mk_events(spark, [("2024-01-01 10:30:00", 1, "click")])
        batch3.write.parquet(str(src / "b3"))
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {
        str(r.window_start): r.cnt
        for r in spark.sql("SELECT * FROM t_late").collect()
    }
    # [09:00,09:10): 2 on-time rows; the late third row did NOT count
    assert rows["2024-01-01 09:00:00"] == 2
    assert rows["2024-01-01 09:10:00"] == 1
    assert rows["2024-01-01 09:40:00"] == 1


def test_session_window_merges_across_batches(spark, tmp_path):
    """Events within the gap but in different micro-batches must merge
    into one session."""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    _mk_events(
        spark,
        [
            ("2024-01-01 09:00:00", 1, "click"),
            ("2024-01-01 09:10:00", 1, "click"),
        ],
    ).write.parquet(str(src / "b1"))

    stream = spark.readStream.schema(_SCHEMA).parquet(str(src) + "/*")
    q = (
        sw.watermarked_session(stream, gap="30 minutes", lateness="5 minutes")
        .writeStream.format("memory")
        .queryName("t_sess")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        _mk_events(
            spark,
            [
                ("2024-01-01 09:20:00", 1, "click"),  # merges (gap 10min)
                ("2024-01-01 13:00:00", 1, "click"),  # new session + wm push
            ],
        ).write.parquet(str(src / "b2"))
        q.processAllAvailable()
        _mk_events(spark, [("2024-01-01 18:00:00", 1, "click")]).write.parquet(
            str(src / "b3")
        )
        q.processAllAvailable()
    finally:
        q.stop()

    rows = [
        (str(r.session_start), r.n_events)
        for r in spark.sql(
            "SELECT * FROM t_sess WHERE user_id = 1 ORDER BY session_start"
        ).collect()
    ]
    assert rows[0] == ("2024-01-01 09:00:00", 3)  # merged across batches
    assert rows[1] == ("2024-01-01 13:00:00", 1)


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState must carry per-user state across
    micro-batches: totals after batch 2 include batch 1."""
    from hadoop_coded_wordcount_spark.streaming.stateful import (
        running_user_totals,
    )

    src = tmp_path / "src"
    src.mkdir()
    _mk_events(
        spark,
        [
            ("2024-01-01 09:00:00", 1, "click"),
            ("2024-01-01 09:01:00", 1, "click"),
            ("2024-01-01 09:02:00", 2, "click"),
        ],
    ).write.parquet(str(src / "b1"))

    stream = spark.readStream.schema(_SCHEMA).parquet(str(src) + "/*")
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        _mk_events(
            spark,
            [
                ("2024-01-01 09:10:00", 1, "click"),
                ("2024-01-01 09:11:00", 3, "click"),
            ],
        ).write.parquet(str(src / "b2"))
        q.processAllAvailable()
    finally:
        q.stop()

    # memory sink in update mode appends every emission; the latest row
    # per user carries the cumulative state
    latest = {}
    for r in spark.sql("SELECT * FROM t_state").collect():
        prev = latest.get(r.user_id)
        if prev is None or r.batches_seen > prev.batches_seen:
            latest[r.user_id] = r
    assert latest[1].n_events == 3 and latest[1].batches_seen == 2
    assert latest[2].n_events == 1
    assert latest[3].n_events == 1
    assert latest[1].value_sum == 3.0  # value fixed at 1.0 per event


def test_stateful_running_totals_equals_batch(spark, tmp_path):
    """Batch-equivalence for the running-totals state machine (VERDICT
    r8 item 5): after the stream drains, the latest emission per user
    must equal the plain batch groupBy over the same events. This pins
    the SEMANTICS running_user_totals and running_user_totals_v2 share
    through the API that executes in this env (applyInPandasWithState);
    the v2 execution test stays skip-annotated while google.protobuf is
    absent, but the state machine itself is verified here against real
    data across multiple micro-batches."""
    events = load_table(spark, SF0001, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "src")
    events.repartition(4).write.parquet(src)

    from hadoop_coded_wordcount_spark.streaming.stateful import (
        running_user_totals,
    )

    q = (
        running_user_totals(
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        .writeStream.format("memory")
        .queryName("t_state_batch_eq")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    latest = {}
    for r in spark.sql("SELECT * FROM t_state_batch_eq").collect():
        prev = latest.get(r.user_id)
        if prev is None or r.batches_seen > prev.batches_seen:
            latest[r.user_id] = r
    got = {
        u: (r.n_events, round(r.value_sum, 6)) for u, r in latest.items()
    }
    want = {
        r.user_id: (r.n, round(r.vsum, 6))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("vsum"))
        .collect()
    }
    assert len(want) > 1
    assert got == want
    # state carried across micro-batches, not rebuilt per batch: at
    # least one user appeared in more than one of the 4 file-batches
    assert any(r.batches_seen > 1 for r in latest.values())


def test_rocksdb_state_store_provider(spark, tmp_path):
    """Windowed aggregation on the RocksDB state store — the at-scale
    backend: state lives off-heap/on-disk per task instead of in executor
    memory, so key cardinality is bounded by disk, not heap. The test
    proves the provider actually engages (RocksDB custom metrics in the
    query progress) and that results are identical to the default
    HDFS-backed provider."""
    events = load_table(spark, SF0001, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "src")
    events.write.parquet(src)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(_SCHEMA).parquet(src)
        q = (
            sw.watermarked_tumbling(stream, width="1 hour", lateness="10 minutes")
            .writeStream.format("memory")
            .queryName("t_rocksdb")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        progress = q.recentProgress
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )

    # provider engaged: RocksDB-specific metrics appear in state operators
    custom = {
        k
        for p in progress
        for op in (p["stateOperators"] if isinstance(p, dict) else [])
        for k in op.get("customMetrics", {})
    }
    if not custom:  # recentProgress objects, not dicts, on some versions
        import json

        custom = {
            k
            for p in progress
            for op in json.loads(p.json).get("stateOperators", [])
            for k in op.get("customMetrics", {})
        }
    assert any("rocksdb" in k.lower() for k in custom), custom

    got = {
        (r.window_start, r.event_type, r.cnt)
        for r in spark.sql("SELECT * FROM t_rocksdb").collect()
    }
    want = {
        (r.window_start, r.event_type, r.cnt)
        for r in sw.tumbling_counts(events, width="1 hour").collect()
    }
    # append mode withholds windows the watermark hasn't passed; every
    # emitted window must match its batch twin, and most windows emit
    assert got and got <= want


def test_foreachbatch_parquet_sink_roundtrip(spark, tmp_path):
    """foreachBatch bridges streaming to the batch write surface: every
    micro-batch lands in its own batch_id partition, and the union of
    partitions equals the streamed input."""
    from hadoop_coded_wordcount_spark.streaming.sinks import (
        append_batches_to_parquet,
    )

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")

    _mk_events(
        spark,
        [("2024-01-01 09:00:00", 1, "click"), ("2024-01-01 09:01:00", 2, "view")],
    ).write.parquet(str(src / "b1"))

    stream = spark.readStream.schema(_SCHEMA).parquet(str(src) + "/*")
    q = append_batches_to_parquet(stream, out, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        _mk_events(spark, [("2024-01-01 09:05:00", 3, "click")]).write.parquet(
            str(src / "b2")
        )
        q.processAllAvailable()
    finally:
        q.stop()

    back = spark.read.parquet(out)
    assert back.count() == 3
    assert {r.user_id for r in back.collect()} == {1, 2, 3}
    # at least two distinct batch partitions were written
    assert back.select("batch_id").distinct().count() >= 2


def test_foreachbatch_replay_is_exactly_once(spark, tmp_path):
    """Crash-replay simulation: foreachBatch is at-least-once, so the SAME
    batch id can be delivered twice (failure between write and checkpoint
    commit). The idempotent handler must make the second delivery a
    self-overwrite — downstream readers see exactly-once output."""
    from hadoop_coded_wordcount_spark.streaming.sinks import (
        idempotent_parquet_batch_writer,
    )

    out = str(tmp_path / "out")
    handle = idempotent_parquet_batch_writer(out)
    b0 = _mk_events(
        spark,
        [("2024-01-01 09:00:00", 1, "click"), ("2024-01-01 09:01:00", 2, "view")],
    )
    b1 = _mk_events(spark, [("2024-01-01 09:05:00", 3, "click")])

    handle(b0, 0)
    handle(b1, 1)
    handle(b0, 0)  # replay of batch 0 after a simulated crash
    handle(b0, 0)  # replays are idempotent any number of times

    back = spark.read.parquet(out)
    assert back.count() == 3  # no duplicates from the replays
    assert {r.user_id for r in back.collect()} == {1, 2, 3}
    assert back.select("batch_id").distinct().count() == 2


def test_stream_stream_interval_join(spark, tmp_path):
    """Clicks join views per user within a 30-minute lookback; a view
    outside the interval and a foreign user's view must not match."""
    from hadoop_coded_wordcount_spark.streaming import joins as sj

    rows = [
        ("2024-01-01 09:00:00", 1, "view"),   # id 0: in window for click@09:20
        ("2024-01-01 08:30:00", 1, "view"),   # id 1: 50 min before -> excluded
        ("2024-01-01 09:20:00", 1, "click"),  # id 2
        ("2024-01-01 09:10:00", 2, "view"),   # id 3: other user
        ("2024-01-01 09:30:00", 2, "click"),  # id 4: matches id 3 only
    ]
    src = str(tmp_path / "src")
    _mk_events(spark, rows).write.parquet(src)

    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    joined = sj.clicks_after_views(
        stream.where(F.col("event_type") == "view"),
        stream.where(F.col("event_type") == "click"),
        max_gap="30 minutes",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.click_id, r.view_id, r.gap_sec)
        for r in spark.sql("SELECT * FROM t_ssj").collect()
    }
    assert got == {(2, 0, 1200), (4, 3, 1200)}


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Identical payloads with different event ids collapse to one row;
    distinct payloads survive."""
    from hadoop_coded_wordcount_spark.streaming import joins as sj

    rows = [
        ("2024-01-01 09:00:00", 1, "click"),  # id 0
        ("2024-01-01 09:00:00", 1, "click"),  # id 1: retransmission of id 0
        ("2024-01-01 09:05:00", 1, "click"),  # id 2: distinct ts
        ("2024-01-01 09:00:00", 2, "click"),  # id 3: distinct user
    ]
    src = str(tmp_path / "src")
    _mk_events(spark, rows).write.parquet(src)

    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    q = (
        sj.dedup_within_watermark(stream)
        .writeStream.format("memory")
        .queryName("t_sdedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = spark.sql("SELECT * FROM t_sdedup").collect()
    assert len(out) == 3
    # exactly one of the two retransmitted copies survived
    assert sum(1 for r in out if r.user_id == 1 and str(r.ts).startswith("2024-01-01 09:00")) == 1


def test_stream_stream_left_outer_join_emits_unmatched(spark, tmp_path):
    """Left-outer stream-stream join: the unattributed click emits
    null-padded only after the watermark passes its join window."""
    from hadoop_coded_wordcount_spark.streaming import joins as sj

    src = tmp_path / "src"
    src.mkdir()
    _mk_events(
        spark,
        [
            ("2024-01-01 09:00:00", 1, "view"),   # id 0
            ("2024-01-01 09:20:00", 1, "click"),  # id 1: matches id 0
            ("2024-01-01 09:30:00", 2, "click"),  # id 2: NO view ever
        ],
    ).write.parquet(str(src / "b1"))

    stream = spark.readStream.schema(_SCHEMA).parquet(str(src) + "/*")
    joined = sj.clicks_after_views(
        stream.where(F.col("event_type") == "view"),
        stream.where(F.col("event_type") == "click"),
        max_gap="30 minutes",
        lateness="5 minutes",
        how="left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ssj_outer")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        # push BOTH sides' watermarks far past every join window — each
        # side's watermark advances only from events that reach ITS
        # withWatermark node, so the dummy batch carries a view AND a
        # click (the global watermark is the min of the two)
        _mk_events(
            spark,
            [("2024-01-01 12:00:00", 9, "view"),
             ("2024-01-01 12:00:00", 9, "click")],
        ).write.parquet(str(src / "b2"))
        q.processAllAvailable()
        _mk_events(
            spark,
            [("2024-01-01 14:00:00", 9, "view"),
             ("2024-01-01 14:00:00", 9, "click")],
        ).write.parquet(str(src / "b3"))
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {r.user_id: (r.view_id, r.gap_sec) for r in
            spark.sql("SELECT * FROM t_ssj_outer").collect()
            if r.user_id in (1, 2)}
    assert rows[1] == (0, 1200)        # matched pair intact
    assert rows[2] == (None, None)     # unmatched click, null-padded


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    """Stream-static join: every micro-batch row is enriched from the
    static dim with no watermark and no join state; rows with no dim
    match drop (inner join), exactly as in batch."""
    from hadoop_coded_wordcount_spark.streaming.joins import enrich_with_static

    src = tmp_path / "src"
    src.mkdir()
    _mk_events(
        spark,
        [
            ("2024-01-01 09:00:00", 1, "click"),
            ("2024-01-01 09:01:00", 2, "view"),
            ("2024-01-01 09:02:00", 3, "purchase"),
        ],
    ).write.parquet(str(src / "b1"))
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement")],
        ["event_type", "category"],
    )
    stream = spark.readStream.schema(_SCHEMA).parquet(str(src) + "/*")
    out = str(tmp_path / "out")
    q = (
        enrich_with_static(stream, dim, "event_type")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = spark.read.parquet(out)
    got = {(r.user_id, r.category) for r in back.collect()}
    # 'purchase' has no dim row -> dropped; the rest enriched
    assert got == {(1, "engagement"), (2, "engagement")}


def test_transform_with_state_v2_matches_v1(spark, tmp_path):
    """The Spark 4 transformWithStateInPandas port of the running-totals
    state machine must carry state across micro-batches exactly like the
    applyInPandasWithState original (same keys, same cumulative totals).
    State v2 requires the RocksDB state store provider, and its
    Python<->JVM state protocol needs google.protobuf — skip where that
    package isn't installed (the operator itself imports fine)."""
    pytest.importorskip("google.protobuf")
    from hadoop_coded_wordcount_spark.streaming.stateful import (
        running_user_totals_v2,
    )

    src = tmp_path / "src"
    src.mkdir()
    _mk_events(
        spark,
        [
            ("2024-01-01 09:00:00", 1, "click"),
            ("2024-01-01 09:01:00", 1, "click"),
            ("2024-01-01 09:02:00", 2, "click"),
        ],
    ).write.parquet(str(src / "b1"))

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(_SCHEMA).parquet(str(src) + "/*")
        q = (
            running_user_totals_v2(stream)
            .writeStream.format("memory")
            .queryName("t_state_v2")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
            _mk_events(
                spark,
                [
                    ("2024-01-01 09:10:00", 1, "click"),
                    ("2024-01-01 09:11:00", 3, "click"),
                ],
            ).write.parquet(str(src / "b2"))
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    latest = {}
    for r in spark.sql(
        "SELECT * FROM t_state_v2 ORDER BY batches_seen"
    ).collect():
        latest[r.user_id] = (r.n_events, r.value_sum, r.batches_seen)
    # user 1: 2 events in batch 1 + 1 in batch 2, state carried across
    assert latest[1] == (3, 3.0, 2)
    assert latest[2] == (1, 1.0, 1)
    assert latest[3] == (1, 1.0, 1)


def test_transform_with_state_v2_plan_builds(spark, tmp_path):
    """Without google.protobuf only execution is blocked — plan
    construction and the output schema of the state-v2 operator must
    still work (guards the operator wiring itself)."""
    from hadoop_coded_wordcount_spark.streaming.stateful import (
        running_user_totals_v2,
    )

    src = tmp_path / "src"
    src.mkdir()
    _mk_events(spark, [("2024-01-01 09:00:00", 1, "click")]).write.parquet(
        str(src / "b1")
    )
    stream = spark.readStream.schema(_SCHEMA).parquet(str(src) + "/*")
    df = running_user_totals_v2(stream)
    assert df.isStreaming
    assert df.schema.simpleString() == (
        "struct<user_id:bigint,n_events:bigint,value_sum:double,"
        "batches_seen:bigint>"
    )


def test_streaming_distinct_users_equals_batch(spark, tmp_path):
    """Streaming can't count_distinct (unbounded per-group state); the
    dedupe-then-count twin must reproduce the batch distinct counts for
    every window the watermark finalized."""
    events = load_table(spark, SF0001, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "src")
    events.write.parquet(src)

    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    q = (
        sw.watermarked_distinct_users(stream, width="1 hour", lateness="10 minutes")
        .writeStream.format("memory")
        .queryName("t_distinct_eq")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        str(r.window_start): r.distinct_users
        for r in spark.sql("SELECT * FROM t_distinct_eq").collect()
    }
    want = {
        r.window_start: r.distinct_users
        for r in sw.tumbling_distinct_users(events, width="1 hour").collect()
    }
    assert got, "stream produced no windows"
    for key, n in got.items():
        assert want[key] == n
    assert len(got) >= len(want) - 10


def test_streaming_progress_profile(spark, tmp_path):
    """The streaming O12 surface: an AvailableNow run over the events
    table reports its input rows exactly and nonzero windowed-agg state."""
    from hadoop_coded_wordcount_spark.streaming import progress as sp

    events = load_table(spark, SF0001, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    n = events.count()
    src = str(tmp_path / "src")
    events.write.parquet(src)
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    profile = sp.run_with_progress(
        sw.watermarked_tumbling(stream, width="1 hour", lateness="10 minutes"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        query_name="t_progress",
    )
    assert profile["input_rows_total"] == n
    assert profile["n_batches"] >= 1
    assert profile["state_rows_last"] > 0  # windowed agg holds state


def test_debounce_stream_equals_batch_distinct(spark, tmp_path):
    """dropDuplicatesWithinWatermark over a finite stream must produce
    exactly the batch DISTINCT of the same key projection — including
    collapsing a planted duplicate delivery."""
    events = load_table(spark, SF0001, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    # plant at-least-once redelivery: the same rows appended twice
    dup = events.unionAll(events.limit(200))
    src = str(tmp_path / "src")
    dup.write.parquet(src)

    batch = {
        (r.user_id, r.event_type, r.minute)
        for r in sw.debounced_events(
            spark.read.schema(_SCHEMA).parquet(src)
        ).collect()
    }

    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    q = (
        sw.debounced_events(stream)
        .writeStream.format("memory")
        .queryName("t_debounce")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.event_type, r.minute)
        for r in spark.sql("SELECT * FROM t_debounce").collect()
    }
    assert got == batch


def test_stream_stream_interval_join_equals_batch(spark, tmp_path):
    """The watermarked stream-stream interval join must emit exactly the
    batch join's pair set once the finite stream drains (two-sided time
    bounds make the state finite AND the result complete)."""
    events = load_table(spark, SF0001, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "src")
    events.write.parquet(src)

    batch = {
        (r.user_id, r.click_id, r.view_id, r.gap_us)
        for r in sw.click_view_attribution(
            spark.read.schema(_SCHEMA).parquet(src)
        ).collect()
    }
    assert batch  # non-degenerate fixture

    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    q = (
        sw.click_view_attribution(stream)
        .writeStream.format("memory")
        .queryName("t_attrib")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.click_id, r.view_id, r.gap_us)
        for r in spark.sql("SELECT * FROM t_attrib").collect()
    }
    assert got == batch


def test_minute_dedup_within_watermark_equals_batch(spark, tmp_path):
    """dropDuplicatesWithinWatermark over a finite AvailableNow run must
    produce exactly the batch DISTINCT key set, including collapsing
    injected same-minute duplicates."""
    import datetime

    t = datetime.datetime(2024, 3, 1, 9, 0, 0)
    rows = []
    eid = 0
    for u in range(5):
        for k in range(4):  # 4 duplicates in the same minute
            rows.append(
                (eid, t + datetime.timedelta(seconds=10 * k), u, "click", 1.0)
            )
            eid += 1
        rows.append(
            (eid, t + datetime.timedelta(minutes=5 + u), u, "view", 1.0)
        )
        eid += 1
    events = spark.createDataFrame(rows, _SCHEMA)
    src = str(tmp_path / "dd_src")
    events.write.parquet(src)

    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    q = (
        sw.minute_deduped_events(stream)
        .writeStream.format("memory")
        .queryName("t_minute_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.user_id, r.event_type, r.minute)
        for r in spark.sql("SELECT * FROM t_minute_dedup").collect()
    }
    want = {
        (r.user_id, r.event_type, r.minute)
        for r in sw.minute_deduped_events(events).collect()
    }
    # 5 users x (1 click-minute + 1 view-minute) = 10 keys from 25 rows
    assert want and len(want) == 10
    assert got == want


def test_windowed_topk_stream_equals_batch(spark, tmp_path):
    """The update-mode count + foreachBatch rank decomposition must land
    on exactly the batch windowed top-k once the stream drains."""
    events = load_table(spark, SF0001, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "src")
    events.write.parquet(src)

    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    q = sw.windowed_topk_stream(
        stream,
        sink_table="topk_snap",
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = {
        (r.window_start, r.event_type): (r.cnt, r.rnk)
        for r in spark.sql(
            "SELECT * FROM global_temp.topk_snap"
        ).collect()
    }
    want = {
        (r.window_start, r.event_type): (r.cnt, r.rnk)
        for r in sw.windowed_topk(events).collect()
    }
    assert got == want
    assert all(rnk <= 3 for _, rnk in got.values())


def test_windowed_topk_stream_compacts_state(spark, tmp_path):
    """ADVICE r8: the durable state must not accumulate one delta dir
    per micro-batch forever (O(batches^2) cumulative re-read, small-file
    proliferation). With compact_every=2 over 6 micro-batches, the state
    dir must end with one compacted generation and at most
    compact_every-1 live delta dirs — and the view must still equal the
    batch twin exactly."""
    import os

    events = load_table(spark, SF0001, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "src")
    events.repartition(6).write.parquet(src)

    ckpt = str(tmp_path / "ckpt")
    q = sw.windowed_topk_stream(
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        sink_table="topk_snap_compact",
        checkpoint=ckpt,
        # files arrive in arbitrary time order (repartition shuffles rows
        # across them), so disarm watermark late-drops — this test is
        # about state compaction, not lateness semantics
        lateness="365 days",
        compact_every=2,
    )
    q.awaitTermination(180)

    state = os.path.join(ckpt, "topk_state")
    delta_dir = os.path.join(state, "delta")
    deltas = (
        [d for d in os.listdir(delta_dir) if d.startswith("bid=")]
        if os.path.isdir(delta_dir)
        else []
    )
    gens = [
        d
        for d in os.listdir(os.path.join(state, "compact"))
        if d.startswith("gen=")
    ]
    assert len(gens) == 1, gens
    assert len(deltas) <= 1, deltas  # compact_every - 1

    got = {
        (r.window_start, r.event_type): (r.cnt, r.rnk)
        for r in spark.sql(
            "SELECT * FROM global_temp.topk_snap_compact"
        ).collect()
    }
    want = {
        (r.window_start, r.event_type): (r.cnt, r.rnk)
        for r in sw.windowed_topk(events).collect()
    }
    assert got == want


def test_windowed_topk_stream_restart_keeps_finalized_windows(
    spark, tmp_path
):
    """Restart from the checkpointLocation must NOT lose windows
    finalized before the restart: the accumulated state is durable
    (parquet under the checkpoint), so a second run over new-only input
    rebuilds the full view — the regression the driver-side-dict
    version had."""
    events = load_table(spark, SF0001, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    first = events.orderBy("event_id").limit(400)
    rest = events.join(first.select("event_id"), "event_id", "left_anti")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    first.write.mode("append").parquet(src)

    q = sw.windowed_topk_stream(
        spark.readStream.schema(_SCHEMA).parquet(src),
        sink_table="topk_snap_restart",
        checkpoint=ckpt,
    )
    q.awaitTermination(120)
    after_first = spark.sql(
        "SELECT * FROM global_temp.topk_snap_restart"
    ).count()
    assert after_first > 0

    # "restart": a brand-new query over the same source + checkpoint,
    # with the remaining rows appended — only they are new input
    rest.write.mode("append").parquet(src)
    q2 = sw.windowed_topk_stream(
        spark.readStream.schema(_SCHEMA).parquet(src),
        sink_table="topk_snap_restart",
        checkpoint=ckpt,
    )
    q2.awaitTermination(120)

    got = {
        (r.window_start, r.event_type): (r.cnt, r.rnk)
        for r in spark.sql(
            "SELECT * FROM global_temp.topk_snap_restart"
        ).collect()
    }
    want = {
        (r.window_start, r.event_type): (r.cnt, r.rnk)
        for r in sw.windowed_topk(events).collect()
    }
    assert got == want


def test_topk_state_collapse_immune_to_gc_leftovers(spark, tmp_path):
    """The compaction commit claims GC failures cannot corrupt the
    durable top-k view: the max_by collapse over (all generations + all
    deltas) equals the collapse over the clean layout. Plant exactly
    that crash: a compacted generation written but NO delta deleted,
    plus a stale older generation — the snapshot must equal the
    all-deltas truth row for row."""
    import os

    from hadoop_coded_wordcount_spark.streaming.windows import (
        _topk_state_snapshot,
    )

    def write_delta(root, bid, rows):
        df = spark.createDataFrame(
            [(w, e, c, bid) for (w, e, c) in rows],
            "window_start string, event_type string, cnt long, "
            "batch_id long",
        )
        df.write.mode("overwrite").parquet(
            os.path.join(root, "delta", "bid=%d" % bid)
        )

    # six batches; keys re-counted across batches (cnt grows), one key
    # appears late, one stops updating early (a finalized window)
    history = {
        0: [("w1", "click", 3), ("w1", "view", 5)],
        1: [("w1", "click", 7), ("w2", "click", 2)],
        2: [("w1", "view", 9), ("w2", "click", 4)],
        3: [("w2", "view", 1)],
        4: [("w1", "click", 11), ("w2", "view", 6)],
        5: [("w3", "buy", 8)],
    }

    clean = str(tmp_path / "clean")
    crashed = str(tmp_path / "crashed")
    for root in (clean, crashed):
        for bid, rows in history.items():
            write_delta(root, bid, rows)

    truth = {
        (r.window_start, r.event_type): (r.cnt, r.batch_id)
        for r in _topk_state_snapshot(spark, clean).collect()
    }
    assert truth[("w1", "click")] == (11, 4)
    assert truth[("w1", "view")] == (9, 2)
    assert truth[("w3", "buy")] == (8, 5)

    # crash layout: gen=3 written (collapse of bids 0..3) but deltas
    # 0..3 NOT deleted, plus a stale gen=1 from an earlier compaction
    for gen_bid in (1, 3):
        upto = {
            k: v
            for b in range(gen_bid + 1)
            for k, v in [
                ((w, e), (c, b)) for (w, e, c) in history[b]
            ]
        }
        df = spark.createDataFrame(
            [(w, e, c, b) for (w, e), (c, b) in upto.items()],
            "window_start string, event_type string, cnt long, "
            "batch_id long",
        )
        df.write.mode("overwrite").parquet(
            os.path.join(crashed, "compact", "gen=%d" % gen_bid)
        )

    got = {
        (r.window_start, r.event_type): (r.cnt, r.batch_id)
        for r in _topk_state_snapshot(spark, crashed).collect()
    }
    assert got == truth


def test_topk_state_snapshot_empty_before_first_batch(spark, tmp_path):
    """ADVICE r9: before the first committed delta (fresh checkpoint, or
    a restart-time caller) the snapshot must be an EMPTY state frame,
    not a spark.read.parquet() crash on zero paths."""
    from hadoop_coded_wordcount_spark.streaming.windows import (
        _topk_state_snapshot,
    )

    snap = _topk_state_snapshot(spark, str(tmp_path / "nonexistent"))
    assert snap.collect() == []
    assert [f.name for f in snap.schema.fields] == [
        "window_start",
        "event_type",
        "cnt",
        "batch_id",
    ]


def test_topk_state_snapshot_ignores_torn_uncommitted_writes(
    spark, tmp_path
):
    """ADVICE r9: a crash DURING a delta/generation write (before the
    _SUCCESS commit marker lands) leaves partial part-files that could
    undercount a key at that batch_id. The collapse must treat the torn
    dir as if it were never written."""
    import os

    from hadoop_coded_wordcount_spark.streaming.windows import (
        _topk_state_snapshot,
    )

    root = str(tmp_path / "state")
    good = spark.createDataFrame(
        [("w1", "click", 3, 0), ("w1", "view", 5, 0)],
        "window_start string, event_type string, cnt long, batch_id long",
    )
    good.write.mode("overwrite").parquet(
        os.path.join(root, "delta", "bid=0")
    )
    # torn bid=1: one part-file landed (undercounting w1/click at 1
    # instead of its true 9) but the job never committed — no _SUCCESS
    torn = spark.createDataFrame(
        [("w1", "click", 1, 1)],
        "window_start string, event_type string, cnt long, batch_id long",
    )
    torn_dir = os.path.join(root, "delta", "bid=1")
    torn.coalesce(1).write.mode("overwrite").parquet(torn_dir)
    os.remove(os.path.join(torn_dir, "_SUCCESS"))

    got = {
        (r.window_start, r.event_type): (r.cnt, r.batch_id)
        for r in _topk_state_snapshot(spark, root).collect()
    }
    assert got == {("w1", "click"): (3, 0), ("w1", "view"): (5, 0)}


def test_topk_state_survives_disabled_success_markers(spark, tmp_path):
    """ADVICE r10: with mapreduce.fileoutputcommitter.marksuccessfuljobs
    =false no dir ever carries _SUCCESS, and filtering on the marker
    would silently make ALL accumulated state invisible — inverted data
    loss. Pin: under that conf the snapshot reads every state dir (with
    a warning); torn-write protection is explicitly forfeited."""
    import warnings

    from hadoop_coded_wordcount_spark.streaming.windows import (
        _topk_state_snapshot,
    )

    root = str(tmp_path / "state")
    delta = f"{root}/delta/bid=0"
    spark.createDataFrame(
        [("2024-01-01 00:00:00", "click", 7, 0)],
        "window_start string, event_type string, cnt bigint, batch_id bigint",
    ).write.parquet(delta)
    # simulate the marker-less committer: writes land with no _SUCCESS
    import os

    os.remove(os.path.join(delta, "_SUCCESS"))
    conf = spark._jsc.hadoopConfiguration()
    conf.set("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            rows = _topk_state_snapshot(spark, root).collect()
        assert [(r.event_type, r.cnt) for r in rows] == [("click", 7)]
        assert any("marksuccessfuljobs" in str(w.message) for w in caught)
    finally:
        conf.set("mapreduce.fileoutputcommitter.marksuccessfuljobs", "true")
    # markers back on: the marker-less dir is now (correctly) invisible
    assert _topk_state_snapshot(spark, root).collect() == []
