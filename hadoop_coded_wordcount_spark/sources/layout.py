"""Data-layout optimization: Z-order (Morton-curve) file clustering.

At 100 TB the cheapest predicate is the one that never reads the data:
parquet min/max footer statistics skip whole files/row-groups when a
file's value range misses the filter. A range sort on ONE column gives
that column perfect skipping and every other column none; interleaving
the bits of several columns (the Z-/Morton curve) gives each
participating column locality, so multi-dimensional point/range filters
prune on ALL of them. This module is engine-side layout tooling — the
write-time half of predicate pushdown.

Everything is built-in bit arithmetic (``shiftleft``/``bitwiseOR`` over a
fixed bit budget) — codegen'd, no UDF; the write is
``repartitionByRange`` on the Z-value (range-partitions the curve) +
``sortWithinPartitions`` (orders rows inside each file so row-group
statistics are tight too).

Reference scope note: the reference engine has no storage layer at all
(it reads text lines — reference WordCount.java:44); this module exists
for the 100 TB posture the brief demands, not for reference parity.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["zvalue", "write_zordered", "compact_small_files"]


def zvalue(cols: list[str], bits: int = 16) -> Column:
    """Morton (Z-curve) key: interleave the low ``bits`` bits of each
    column. Columns must be non-negative integers (hash or rank-encode
    anything else first — at scale you'd rank via ``ntile`` so skew in
    raw values doesn't collapse the curve).

    ``bits``×|cols| must stay ≤ 63 (the result is a BIGINT). 16 bits per
    dimension ≈ 65k distinct curve positions per column — enough for
    file-level pruning, where only the high bits matter.
    """
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must fit in a signed 64-bit key")
    parts = []
    for ci, c in enumerate(cols):
        col = F.col(c).cast("bigint")
        for b in range(bits):
            # bit b of column ci lands at interleaved position
            # b*len(cols) + ci
            parts.append(
                F.shiftleft(
                    F.shiftright(col, b).bitwiseAND(F.lit(1)),
                    b * len(cols) + ci,
                )
            )
    return functools.reduce(lambda a, b: a.bitwiseOR(b), parts)


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8, bits: int = 16
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of ``cols``.

    ``repartitionByRange`` on the Z-value assigns each output file a
    contiguous curve segment (tight per-file min/max on every
    participating column); ``sortWithinPartitions`` tightens row-group
    stats inside each file. The helper column is dropped before the
    write — a projection after the sort preserves row order.
    """
    z = zvalue(cols, bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_small_files(
    spark,
    src_dir: str,
    dest_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within: list[str] | None = None,
) -> int:
    """Small-files compaction: rewrite a fragmented parquet directory into
    ~``target_file_bytes`` files. Returns the output file count.

    The small-files problem is the silent 100-TB killer on the READ side:
    every file costs a footer fetch, a scheduler task, and a row-group
    whose statistics prune nothing; a table of 10 KB files makes a scan
    metadata-bound. Streaming sinks and over-parallel writers produce
    exactly that, so compaction is a standing maintenance job.

    Sizing uses the SOURCE's actual on-disk bytes (compressed) rather
    than row counts — the one number that transfers across schemas. The
    rewrite is ``repartition(n)`` (round-robin, even output sizes); pass
    ``sort_within`` to restore clustering (compaction is the natural
    moment to re-sort — same write, better statistics; for
    multi-dimensional clustering use :func:`write_zordered` instead).
    """
    import glob
    import os

    files = [
        f
        for f in glob.glob(os.path.join(src_dir, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    ]
    total = sum(os.path.getsize(f) for f in files)
    n = max(1, -(-total // target_file_bytes))  # ceil-div
    df = spark.read.parquet(src_dir).repartition(n)
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    df.write.mode("overwrite").parquet(dest_dir)
    out = [
        f
        for f in glob.glob(os.path.join(dest_dir, "*.parquet"))
        if os.path.isfile(f)
    ]
    return len(out)
