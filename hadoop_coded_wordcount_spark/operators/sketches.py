"""KMV (k-minimum-values) distinct-count sketches — the theta-sketch
family's core, built two ways to pin the scale story.

The reference's only aggregate is an exact SUM (reference
WordCount.java:95-114); a 100-TB engine also needs *mergeable* cardinality
sketches: per-partition partial sketches that shrink the shuffle to
``k`` values per (partition, group) regardless of input size, union-merge
at the reducer, and an estimate whose error is ~1/sqrt(k).

Estimator: hash every value to a uniform ``u ∈ [0,1)`` (xxhash64 →
affine map), retain the ``k`` smallest distinct ``u`` per group. With
``m`` retained values and ``u_k`` the k-th smallest:

* ``m < k``  → the group's distinct count is simply ``m`` (exact modulo
  64-bit hash collisions);
* ``m == k`` → estimate ``(k-1)/u_k`` (the classic KMV / bottom-k
  estimator).

Because the retained set ("k smallest distinct hashes") is a pure
function of the VALUE SET — independent of partitioning, batch order, or
merge order — both implementations below produce bit-identical
estimates, which the tests assert.

Two physical strategies:

* :func:`kmv_distinct` — JVM-only: distinct (group, u) pairs, per-group
  bottom-k via row_number window. Simple and codegen'd, but the shuffle
  carries every distinct pair — same volume as an exact count-distinct.
  The right choice when you wanted the exact count's shuffle anyway or
  |distinct| is modest.
* :func:`kmv_distinct_partial` — the 100-TB shape: an Arrow-batched
  ``mapInPandas`` pass keeps the k smallest per group PER PARTITION
  (bounded memory: k floats × |groups|), emits one bounded array row per
  (partition, group), and the final merge is an ordinary partial-agg'd
  ``groupBy`` whose input is ≤ |partitions|×|groups| rows — the shuffle
  no longer scales with the data.

:func:`kmv_merge` demonstrates the sketch algebra: union the per-group
retained sets into a single global-cardinality estimate without
rescanning the data.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = [
    "kmv_distinct",
    "kmv_distinct_partial",
    "kmv_merge",
    "bitmap_distinct",
    "bitmap_distinct_global",
    "hll_sketch_distinct",
    "DEFAULT_K",
]

DEFAULT_K = 256


def _uniform_hash(value_col: str) -> Column:
    """xxhash64 → uniform double in [0,1). The +2^63 / 2^64 affine map is
    exact in double for the top 53 bits, which is all the estimator uses."""
    h = F.xxhash64(F.col(value_col)).cast("double")
    return (h + F.lit(float(2**63))) / F.lit(float(2**64))


def _estimate(k: int) -> list[Column]:
    m = F.col("m")
    return [
        m.alias("retained"),
        F.when(m < k, m.cast("double"))
        .otherwise(F.lit(float(k - 1)) / F.col("kth"))
        .alias("kmv_est"),
    ]


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = DEFAULT_K
) -> DataFrame:
    """Per-group KMV distinct estimate, JVM window strategy.

    Plan: project (group, u) → distinct (one partial-agg'd shuffle) →
    row_number window (reuses the distinct's hash partitioning — no
    second exchange) → filter rn ≤ k → tiny final agg.
    """
    pairs = df.select(
        F.col(group_col), _uniform_hash(value_col).alias("u")
    ).distinct()
    w = Window.partitionBy(group_col).orderBy("u")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("m"), F.max("u").alias("kth"))
        .select(group_col, *_estimate(k))
    )


def kmv_distinct_partial(
    df: DataFrame, group_col: str, value_col: str, k: int = DEFAULT_K
) -> DataFrame:
    """Per-group KMV distinct estimate, mergeable-partial strategy.

    Stage 1 (narrow, no shuffle): mapInPandas keeps the k smallest
    distinct u per group within each partition and emits them as ONE
    array row per (partition, group).
    Stage 2: groupBy(group) merges the bounded partials — collect the
    arrays (≤ |partitions| of them, each ≤ k), flatten, distinct, sort,
    keep k. The shuffle volume is |partitions|×|groups|×k doubles,
    independent of row count.
    """
    pairs = df.select(F.col(group_col).alias("g"), _uniform_hash(value_col).alias("u"))

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict = {}
        for pdf in batches:
            for g, sub in pdf.groupby("g", sort=False):
                prev = state.get(g)
                cat = (
                    pd.concat([prev, sub["u"]]) if prev is not None else sub["u"]
                )
                state[g] = cat.drop_duplicates().nsmallest(k)
        if state:
            yield pd.DataFrame(
                {"g": list(state), "us": [s.tolist() for s in state.values()]}
            )

    gtype = pairs.schema["g"].dataType.simpleString()
    partials = pairs.mapInPandas(partial, schema=f"g {gtype}, us array<double>")
    merged = F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("us")))), 1, k
    )
    return (
        partials.groupBy("g")
        .agg(merged.alias("ks"))
        .select(
            F.col("g").alias(group_col),
            F.size("ks").alias("m"),
            F.element_at("ks", F.least(F.size("ks"), F.lit(k))).alias("kth"),
        )
        .select(group_col, *_estimate(k))
    )


def kmv_merge(df: DataFrame, group_col: str, value_col: str, k: int = DEFAULT_K) -> DataFrame:
    """Global distinct estimate by UNIONING the per-group sketches — the
    mergeability property that makes KMV a sketch rather than a sample:
    the k smallest of the union of per-group bottom-k sets equals the
    bottom-k of the full value multiset, so the global estimate needs no
    second scan. (Values shared by two groups count once: the union is a
    set union, exactly like theta-sketch union.)
    """
    pairs = df.select(
        F.col(group_col), _uniform_hash(value_col).alias("u")
    ).distinct()
    w = Window.partitionBy(group_col).orderBy("u")
    retained = pairs.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    )
    global_k = (
        retained.select("u")
        .distinct()
        .orderBy("u")
        .limit(k)
    )
    return global_k.agg(
        F.count(F.lit(1)).alias("m"), F.max("u").alias("kth")
    ).select(*_estimate(k))


def bitmap_distinct(events: DataFrame, key: str = "user_id",
                    group: str = "event_type") -> DataFrame:
    """EXACT distinct-count at sketch cost — Spark's bitmap aggregate
    family (``bitmap_bucket_number`` / ``bitmap_bit_position`` /
    ``bitmap_construct_agg``, Spark 3.5+): integer keys fold into fixed
    4 KB bitmaps per (group, 32k-wide bucket), so the shuffle after the
    map-side partial agg carries ``|groups| × |key range|/32768``
    bitmap rows — independent of ROW count, unlike exact
    count-distinct whose shuffle carries every distinct pair.

    The middle tier of the engine's cardinality ladder: exact
    count-distinct (full pairs shuffle) > **bitmap (exact, bounded
    shuffle, needs bounded-int keys)** > KMV/HLL (approximate, O(k)
    any-type keys). Count and OR-merge are both partial-aggregable;
    the same bitmaps also union across groups (``bitmap_or_agg``) for a
    global exact count with no rescan — asserted in tests.
    """
    seg = (
        events.groupBy(
            F.col(group),
            F.expr(f"bitmap_bucket_number({key})").alias("bkt"),
        )
        .agg(F.expr(f"bitmap_construct_agg(bitmap_bit_position({key}))").alias("bm"))
    )
    return (
        seg.groupBy(group)
        .agg(F.expr("sum(bitmap_count(bm))").alias("n_distinct"))
    )


def bitmap_distinct_global(events: DataFrame, key: str = "user_id",
                           group: str = "event_type") -> DataFrame:
    """OR-merge the per-(group, bucket) bitmaps of :func:`bitmap_distinct`
    into a single exact global distinct count — sketch-algebra twin of
    :func:`kmv_merge`, but lossless."""
    seg = (
        events.groupBy(
            F.col(group),
            F.expr(f"bitmap_bucket_number({key})").alias("bkt"),
        )
        .agg(F.expr(f"bitmap_construct_agg(bitmap_bit_position({key}))").alias("bm"))
    )
    return (
        seg.groupBy("bkt")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .agg(F.expr("sum(bitmap_count(bm))").alias("n_distinct_global"))
    )


def hll_sketch_distinct(events: DataFrame, key: str = "user_id",
                        group: str = "event_type",
                        lg_k: int = 14) -> DataFrame:
    """Apache DataSketches HLL surface (``hll_sketch_agg`` /
    ``hll_sketch_estimate``, Spark 3.5+): per-group cardinality sketches
    whose BINARY representation is the cross-system interchange format —
    the same bytes load in Druid/Hive/Pinot/the datasketches-python lib,
    which is the practical reason to pick it over Spark's own HLL++
    (``approx_count_distinct``, no exposed sketch bytes).

    Emits both the per-group estimate and the sketch bytes; the
    mergeability twin (``hll_union_agg`` over these bytes == one-shot
    global sketch) is asserted in tests. Estimate-only output (no DuckDB
    sketch twin) → rows-only oracle, same policy as ``approx_distinct``.
    """
    return (
        events.groupBy(group)
        .agg(F.expr(f"hll_sketch_agg({key}, {lg_k})").alias("sk"))
        .select(
            group,
            F.expr("CAST(round(hll_sketch_estimate(sk)) AS BIGINT)").alias(
                "approx_users"
            ),
            F.length("sk").alias("sketch_bytes"),
        )
    )
