"""Packed-vector helpers shared across the similarity/ML-eval families —
the unit-normalize-once + unrolled-codegen-dot discipline documented in
similarity.embedding_neardup_pairs, importable without pulling the whole
similarity module into consumers."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def as_double_unit(embeddings: DataFrame) -> DataFrame:
    """(vec_id, label, ne): the embedding cast to double and unit-
    normalized once per row, so any later pairwise dot IS the cosine.
    Zero vectors are dropped (no direction, no cosine)."""
    emb = F.transform("embedding", lambda x: x.cast("double"))
    base = embeddings.select("vec_id", "label", emb.alias("emb"))
    nrm = F.sqrt(
        F.aggregate(
            F.transform("emb", lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        base.withColumn("nrm", nrm)
        .where(F.col("nrm") > 0)
        .select(
            "vec_id",
            "label",
            F.transform("emb", lambda x: x / F.col("nrm")).alias("ne"),
        )
    )


def dot_unrolled_cols(a: Column | str, b: Column | str, dim: int) -> Column:
    """Left-to-right unrolled dot from a 0.0 seed — codegen arithmetic,
    bit-identical to a DuckDB list_reduce fold (see
    similarity.dot_unrolled for the full rationale). String operands
    build the chain as ONE JVM-parsed ``F.expr`` — identical analyzed
    tree, ~3·dim fewer py4j round-trips per plan construction."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(
            "0.0D + " + " + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(dim))
        )
    if isinstance(a, str) or isinstance(b, str):  # mixed call (ADVICE r12)
        a, b = F.col(a) if isinstance(a, str) else a, (
            F.col(b) if isinstance(b, str) else b
        )
    out = F.lit(0.0)
    for i in range(dim):
        out = out + a[i] * b[i]
    return out
