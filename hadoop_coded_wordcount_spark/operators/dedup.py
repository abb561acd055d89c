"""Deduplication operators — the LLM-training-pipeline extension surface.

The reference engine has no dedup (its one query is word count,
reference WordCount.java); these operators are the brief's beyond-reference
extension, designed 100 TB-first:

* **exact dedup** — one shuffle on a 256-bit content hash, never on the
  full text;
* **fingerprint dedup** — normalize → hash → group; the canonical
  "cluster by content" shape;
* **MinHash-LSH fuzzy dedup** — the scale path: signatures are fixed-size
  per doc, candidate generation is a *band-bucket equi-join* (shuffle on
  16-byte band keys), and the quadratic exact-Jaccard verify runs only
  inside tiny candidate buckets. Never all-pairs.
* **n-gram Jaccard pairs** — the exact (verify-stage) computation, exposed
  as its own blocked query so the DuckDB oracle can check the arithmetic
  end-to-end at small SF.
* **SimHash** — 64-bit near-dup fingerprint; Hamming-ball candidates via
  pigeonhole banding on 16-bit chunks.

Everything is built-in Spark SQL expressions (whole-stage codegen,
Arrow-free, no Python in the hot path). Hashes are ``xxhash64`` — a fixed,
documented Spark built-in, so signatures are stable across sessions,
clusters, and versions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = [
    "tokens_col",
    "shingled",
    "dedup_exact",
    "dedup_fingerprint",
    "ngram_jaccard_pairs",
    "minhash_wide",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "lsh_tuning_curve",
    "connected_components",
    "connected_components_star",
    "dedup_clusters",
    "simhash64",
    "simhash_pairs",
    "passage_dedup",
    "containment_pairs",
    "duplicate_spans",
    "keep_best_per_cluster",
]


def tokens_col(text_col: str = "text") -> Column:
    """Whitespace tokens with empties dropped (same semantics as the
    word-count tokenizer, operators/wordcount.py)."""
    return F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")


def shingled(documents: DataFrame, n: int = 3) -> DataFrame:
    """doc_id, lang, grams: distinct word n-gram shingles per document.

    Docs with fewer than ``n`` tokens are dropped (they have no n-gram and
    near-dup semantics degenerate); the DuckDB oracle applies the same
    filter.

    The raw rows are spread via :func:`ensure_parallelism` before the
    gram construction — otherwise a single-file scan fuses the whole
    shingle compute into one task (no-op when the scan is already wide).
    """
    from ..sources.catalog import ensure_parallelism

    toks = tokens_col()
    src = ensure_parallelism(documents.select("doc_id", "lang", "text"))
    with_toks = src.select("doc_id", "lang", toks.alias("toks")).where(
        F.size("toks") >= n
    )
    # The when() guard makes the expression TOTAL: Catalyst's
    # InferFiltersFromGenerate infers `size(grams) > 0` from any
    # downstream explode and may evaluate it BEFORE the size(toks) >= n
    # filter (predicates reorder freely) — an unguarded element_at then
    # faults on short docs under strict semantics.
    grams = F.when(
        F.size("toks") >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at("toks", i + k + 1) for k in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return with_toks.select("doc_id", "lang", grams.alias("grams"))


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(documents: DataFrame) -> DataFrame:
    """Keep the lowest doc_id per exact text value.

    Deterministic by construction (``dropDuplicates`` keeps an *arbitrary*
    row — unusable under an oracle). The window partitions on the 256-bit
    content hash, so the shuffle key is 32 bytes regardless of document
    size; at 100 TB the text column itself never routes a shuffle.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    return (
        documents.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )


def dedup_fingerprint(documents: DataFrame) -> DataFrame:
    """Near-exact dedup clusters by normalized content fingerprint.

    Normalization (lower + trim + collapse whitespace) catches the
    formatting-only duplicates exact hashing misses; sha256 gives a
    collision-safe 32-byte group key. Output: one row per distinct
    fingerprint with its copy count and canonical (min) doc id — the
    groupBy is partial-aggregated map-side, so shuffle rows ==
    distinct-fingerprint count, not document count.
    """
    fp = F.sha2(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), 256)
    return (
        documents.groupBy(fp.alias("fingerprint"))
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("canonical_id"),
        )
    )


# ---------------------------------------------------------------------------
# Fuzzy dedup — exact blocked Jaccard (verify stage) and MinHash-LSH (scale)
# ---------------------------------------------------------------------------

def _jaccard(a_grams: Column, b_grams: Column) -> Column:
    """Exact set Jaccard from two distinct-element arrays, in integer
    arithmetic until the final division (bit-identical across engines)."""
    isect = F.size(F.array_intersect(a_grams, b_grams))
    union = F.size(a_grams) + F.size(b_grams) - isect
    return isect.cast("double") / union


def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    block_on: str | None = "lang",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact word-n-gram Jaccard, blocked on a key.

    This is the *verify* computation: quadratic within a block, so it is
    only viable where blocks are bounded. At 100 TB the candidate pairs
    must come from :func:`minhash_lsh_pairs` (band-bucket join) and this
    exact Jaccard runs per-candidate — the oracle checks its arithmetic
    here at small SF where the lang-block is affordable. ``block_on=None``
    disables blocking (all pairs — test/fixture scale only).
    """
    # Jaccard is computed over xxhash64'd shingles: set sizes (and hence
    # the Jaccard value) are preserved up to 64-bit collisions, and a long
    # intersect is several times cheaper than a string intersect.
    g = (shingled(documents, n) if shingles is None else shingles).select(
        "doc_id",
        "lang",
        F.transform("grams", lambda s: F.xxhash64(s)).alias("grams"),
    )
    # Two parallelism traps hide in this self-join at small-file scale:
    # (1) the block key alone has |blocks| (5 langs) join keys → ≤5 tasks
    # for the quadratic verify; (2) the corpus is one parquet file, so a
    # broadcast join would inherit the scan's single task. Salt side A,
    # replicate side B across the salts, and *explicitly* repartition both
    # sides on the (block, salt) keys: the pair work then spreads over
    # |blocks|×SALTS hash partitions no matter what the input layout or
    # AQE's size-based coalescing (which under-provisions here — output
    # work is quadratic in input bytes) would choose.
    # Granularity: pair-verify work is quadratic per (block, salt) cell,
    # so cells must be much finer than cores for the stragglers to even
    # out — 8 partitions per core measured ~2.3× faster than 2/core here.
    # The cost of more salts is side-B replication (×salts), which is
    # linear and cheap relative to the quadratic verify it balances.
    salts = 64
    nparts = 8 * documents.sparkSession.sparkContext.defaultParallelism
    keys = ([block_on] if block_on is not None else []) + ["salt"]
    a = (
        g.withColumn("salt", F.pmod(F.hash("doc_id"), F.lit(salts)))
        .repartition(nparts, *keys)
        .alias("a")
    )
    b = (
        g.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
        .repartition(nparts, *keys)
        .alias("b")
    )
    # Lossless size prune: j = |∩|/|∪| <= min(|A|,|B|)/max(|A|,|B|), so a
    # pair whose size ratio is below threshold can't pass the filter —
    # reject it before paying for the intersect.
    sa, sb = F.size(F.col("a.grams")), F.size(F.col("b.grams"))
    cond = (
        (F.col("a.salt") == F.col("b.salt"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (
            F.least(sa, sb).cast("double") / F.greatest(sa, sb)
            >= F.lit(threshold)
        )
    )
    if block_on is not None:
        cond = (F.col(f"a.{block_on}") == F.col(f"b.{block_on}")) & cond
    j = _jaccard(F.col("a.grams"), F.col("b.grams"))
    return (
        a.join(b, cond)
        .where(j >= threshold)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(j, 6).alias("jaccard"),
        )
    )


def _signature_col(k: int) -> Column:
    """MinHash signature expression over a ``grams`` string-array column.

    Each of the k hash functions is ``xxhash64(seed_i, shingle)`` —
    seeding by a literal first argument gives k independent, deterministic
    permutation surrogates with one pass over the shingle array
    (``array_min`` of a ``transform``; no explode, no shuffle)."""

    # ONE JVM-parsed expr string (optimization r12): the Column-object
    # loop (k array_min(transform(...)) builders) cost ~6·k py4j round
    # trips per plan construction; the parsed tree is identical — the
    # int literal seed, the single-arg lambda, the same array_min fold.
    return F.expr(
        "array("
        + ", ".join(
            f"array_min(transform(grams, s -> xxhash64({i}, s)))"
            for i in range(k)
        )
        + ")"
    )


_MINHASH_P = 2_147_483_647  # 2^31 - 1, Mersenne prime


def minhash_params(k: int) -> list[tuple[int, int]]:
    """The k (a_i, b_i) pairs of the Carter–Wegman family
    ``h_i(x) = (a_i·x + b_i) mod p`` — deterministic per index i (seeded
    PRNG), so the operator and the DuckDB oracle generate the identical
    family for any k."""
    import random

    out = []
    for i in range(k):
        rng = random.Random(0x5EED0000 + i)
        out.append((rng.randrange(1, _MINHASH_P), rng.randrange(0, _MINHASH_P)))
    return out


def minhash_wide(
    documents: DataFrame,
    n: int = 3,
    k: int = 32,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """The wide (doc_id, m0..m{k-1}) MinHash frame shared by
    :func:`minhash_signatures` (which unpivots it for the gate-friendly
    row schema) and :func:`lsh_tuning_curve` (which bands it per config).

    Shape: explode shingles once → one md5 + mod per gram → one
    groupBy(doc_id) with k codegen'd min-aggregates (partial map-side, so
    the shuffle carries k longs per doc). The repartition before the
    explode spreads gram hashing across cores on a single-file scan and
    pre-aligns the groupBy (no second exchange). ``shingles`` lets a
    caller share one persisted :func:`shingled` frame across several
    consumers (the tuning sweep's truth set reads the same grams).
    """
    g = shingled(documents, n) if shingles is None else shingles
    nparts = 2 * documents.sparkSession.sparkContext.defaultParallelism
    h = F.md5("gram")
    # explode_OUTER, deliberately: a plain explode makes Catalyst push
    # `size(grams) > 0 AND isnotnull(grams)` down to the scan, and those
    # predicates re-derive the ENTIRE tokenize+shingle expression per row
    # (measured 14.1 s vs 2.6 s at sf0.1 — the r5 bench regression).
    # shingled() already guarantees non-empty gram arrays, so the outer
    # variant emits the identical rows with no pushed re-evaluation.
    ex = (
        g.repartition(nparts, "doc_id")
        .select("doc_id", F.explode_outer("grams").alias("gram"))
        .select(
            "doc_id",
            (
                F.conv(F.substring(h, 1, 14), 16, 10).cast("long")
                % F.lit(_MINHASH_P)
            ).alias("x"),
        )
    )
    # k JVM-parsed aggregate exprs (optimization r12): same trees as the
    # Column loop — int literals a, b < 2^31 and the Mersenne modulus
    # parse to the same types the F.lit calls produced.
    return ex.groupBy("doc_id").agg(
        *[
            F.expr(f"MIN(({a} * x + {b}) % {_MINHASH_P}) AS m{i}")
            for i, (a, b) in enumerate(minhash_params(k))
        ]
    )


def minhash_signatures(documents: DataFrame, n: int = 3, k: int = 32) -> DataFrame:
    """k-permutation MinHash signature per document, one row per
    ``(doc_id, perm)`` with the 31-bit minimum hash.

    Signature size is k longs per doc regardless of document length — the
    property that makes fuzzy dedup linear at 100 TB.

    Hash family: Carter–Wegman ``h_i(x) = (a_i·x + b_i) mod p`` with
    ``p = 2³¹−1`` over ``x = (56-bit half of md5(gram)) mod p`` — pure
    integer arithmetic (``a_i·x < 2⁶²``, no overflow), pairwise-
    independent (an UNREDUCED affine family ``h1 + i·h2`` is NOT: the
    argmin gram correlates across i and signature agreement badly
    overestimates Jaccard — measured, caught by the estimate-tracks-
    Jaccard property test). md5 exists in DuckDB, so unlike the previous
    seeded-xxhash64 basis every minimum is value-checked by the external
    oracle. The exploded (doc_id, perm, minhash) projection replaces the
    earlier ``array<bigint>`` signature column, which the driver harness
    cannot canonicalize (r4 gate error: pandas sort on list cells).

    Shape: explode shingles once → one md5 + mod per gram → one
    groupBy(doc_id) with k codegen'd min-aggregates (partial map-side, so
    the shuffle carries k longs per doc) → unpivot to rows. The
    repartition before the explode spreads gram hashing across cores on a
    single-file scan and pre-aligns the groupBy (no second exchange).
    """
    sig = minhash_wide(documents, n, k)
    perms = F.expr(
        "array("
        + ", ".join(
            f"named_struct('perm', {i}, 'minhash', m{i})" for i in range(k)
        )
        + ")"
    )
    return sig.select("doc_id", F.explode(perms).alias("p")).select(
        "doc_id", "p.perm", "p.minhash"
    )


def minhash_lsh_pairs(
    documents: DataFrame,
    n: int = 3,
    k: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Fuzzy-dedup pairs via banded LSH over MinHash signatures.

    The 100 TB shape, end to end:

    1. signatures: linear scan, no shuffle;
    2. banding: k/bands rows per band hashed to one 8-byte bucket key;
       explode to (band, bucket, doc) — bands× row multiplier, tiny rows;
    3. candidates: *equi-join on (band, bucket)* — only docs agreeing on
       an entire band ever meet;
    4. verify: exact Jaccard on the candidate set only.

    Band geometry targets the detection threshold: a pair at Jaccard j
    becomes a candidate with prob 1-(1-j^r)^b; the S-curve midpoint is
    ≈(1/b)^(1/r). Defaults (k=32, b=16, r=2) put the midpoint at 0.25 so
    recall at the verify threshold 0.5 is ≈99% and ≈1-1e-11 at j=0.9 —
    tuned for *dedup* (recall-critical above threshold, false candidates
    are cheap because verify prunes them). For a higher-threshold use case
    (e.g. 0.8), raise r to sharpen the curve and cut candidate volume.

    Returns (doc_a, doc_b, jaccard) with exact jaccard >= threshold.

    Single-pass discipline: shingles, the k-hash signature, and the
    hashed gram set (longs — a long intersect is several times cheaper
    than a string intersect, collision odds ~n²/2⁶⁴) are all computed in
    ONE projection and persisted; banding and both verify-join sides read
    the cached table instead of re-shingling the corpus three times
    (measured ~2× on the whole operator). In production this intermediate
    *is* the signature table you'd write to storage once.
    """
    r = k // bands
    g = shingled(documents, n)
    sig_table = g.select(
        "doc_id",
        _signature_col(k).alias("signature"),
        F.transform("grams", lambda s: F.xxhash64(s)).alias("hgrams"),
    ).persist()

    band_structs = F.expr(
        "array("
        + ", ".join(
            f"named_struct('band', {b}, 'bucket', xxhash64("
            + ", ".join(
                f"element_at(signature, {b * r + j + 1})" for j in range(r)
            )
            + "))"
            for b in range(bands)
        )
        + ")"
    )
    buckets = sig_table.select(
        "doc_id", F.explode(band_structs).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")

    cand = (
        buckets.alias("x")
        .join(
            buckets.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )

    ga = sig_table.select(
        F.col("doc_id").alias("doc_a"), F.col("hgrams").alias("grams_a")
    )
    gb = sig_table.select(
        F.col("doc_id").alias("doc_b"), F.col("hgrams").alias("grams_b")
    )
    j = _jaccard(F.col("grams_a"), F.col("grams_b"))
    return (
        cand.join(ga, "doc_a")
        .join(gb, "doc_b")
        .where(j >= threshold)
        .select("doc_a", "doc_b", F.round(j, 6).alias("jaccard"))
    )


def connected_components(
    edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Connected components by min-label propagation — the step that turns
    near-dup *pairs* into dedup *clusters* (keep one doc per component).

    Iterative by nature (no closed SQL form in Spark): each round, every
    node takes the min of its own label and its neighbors' labels; the
    loop stops when a full round changes nothing. Convergence needs
    O(diameter) rounds — near-dup components are tiny clusters, so 2–3
    rounds in practice.

    Scale discipline for iterative DataFrame algorithms:

    * ``localCheckpoint(eager)`` every round — otherwise the lineage (and
      the physical plan) doubles per iteration and the job dies on plan
      explosion long before data size matters. On a cluster, prefer
      ``checkpoint()`` to survive executor loss.
    * the convergence probe is ``limit(1).count()`` on the changed set —
      a driver-side *scalar*, not a collect of data;
    * each round is one self-contained shuffle (edge⋈label + groupBy
      min) — the classic label-propagation round; for graphs with huge
      skewed components, switch to the large-star/small-star variant
      (alternating contractions bound the per-round blowup).

    Input: (doc_a, doc_b) pairs. Output: (doc_id, cluster_id) for every
    node that appears in an edge, cluster_id = min doc_id in the
    component.
    """
    # Checkpoint the edge list BEFORE iterating: every round joins against
    # it, and without materialization the whole upstream pipeline (here,
    # the LSH candidate generation + verify) would re-execute per round —
    # measured ~2× on the full clustering query.
    sym = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(
            edges.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = sym.join(
            labels, sym["src"] == labels["node"]
        ).select(F.col("dst").alias("node"), "label")
        new_labels = (
            labels.union(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # Falling through with changes pending means some component's
        # diameter exceeds max_iter and its labels are NOT converged —
        # returning them silently would split one component into several.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "a component's diameter exceeds max_iter — raise max_iter "
            "(min-label propagation needs O(diameter) rounds)"
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def dedup_clusters(
    documents: DataFrame, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Near-duplicate clusters: MinHash-LSH pairs → connected components.

    The end-to-end fuzzy-dedup pipeline a training-data run executes:
    generate verified near-dup pairs at scale (banded LSH, exact-Jaccard
    verify), then union them into clusters so exactly one canonical doc
    (the min id) survives per group.
    """
    edges = minhash_lsh_pairs(documents, n=n, threshold=threshold).select(
        "doc_a", "doc_b"
    )
    return connected_components(edges)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(documents: DataFrame) -> DataFrame:
    """64-bit SimHash per document (Charikar fingerprint).

    Each token's hash votes ±1 on every bit; the fingerprint takes the
    majority sign per bit. Near-duplicate documents land at small Hamming
    distance.

    The 64 vote bits come from the first 16 hex chars of ``md5(tok)``,
    split into two 32-bit halves (``hi`` = hex 1–8 → bits 32–63, ``lo`` =
    hex 9–16 → bits 0–31). md5 + integer shifts exist identically in
    DuckDB, so the full fingerprint is value-checked by the external
    oracle — the previous xxhash64 basis had no DuckDB twin and left this
    operator permanently rows-only.

    Shape: explode tokens → one md5 per row, two conv() halves → 64
    conditional-sum aggregates (one per bit) → recombine into a long. The
    64 sums stay inside whole-stage codegen and partial-aggregate
    map-side, so the shuffle carries 64 ints per doc — measured ~50×
    faster than the "obvious" nested higher-order-function formulation
    (aggregate over zip_with over transform), which falls out of codegen
    into interpreted expression evaluation per token×bit.
    """
    from ..sources.catalog import ensure_parallelism

    src = ensure_parallelism(documents.select("doc_id", "lang", "text"))
    hh = F.md5("tok")
    toks = src.select(
        "doc_id", "lang", F.explode(tokens_col()).alias("tok")
    ).select(
        "doc_id",
        "lang",
        F.conv(F.substring(hh, 9, 8), 16, 10).cast("long").alias("lo"),
        F.conv(F.substring(hh, 1, 8), 16, 10).cast("long").alias("hi"),
    )
    # JVM-parsed expr strings (optimization r12): same trees as the
    # Column loops (~450 py4j round trips saved per plan construction).
    bit_sums = [
        F.expr(
            "SUM(CASE WHEN (SHIFTRIGHT("
            f"{'lo' if i < 32 else 'hi'}, {i % 32}) & 1) = 1 "
            f"THEN 1 ELSE -1 END) AS b{i}"
        )
        for i in range(64)
    ]
    grouped = toks.groupBy("doc_id", "lang").agg(*bit_sums)
    simhash = F.expr(
        " | ".join(
            f"(CASE WHEN b{i} > 0 THEN SHIFTLEFT(CAST(1 AS BIGINT), {i}) "
            "ELSE CAST(0 AS BIGINT) END)"
            for i in range(64)
        )
    )
    return grouped.select("doc_id", "lang", simhash.alias("simhash"))


def simhash_pairs(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup candidate pairs by SimHash Hamming distance, via banding.

    Pigeonhole: two 64-bit hashes within Hamming distance 3 agree exactly
    on at least one of four 16-bit chunks — so candidates come from an
    equi-join on (chunk_idx, chunk_value), never an all-pairs scan. The
    exact Hamming distance (``bit_count(a XOR b)``) then filters the
    candidates.

    The signature table is persisted before the self-join: a broadcast
    self-join computes each side independently (no ReusedExchange —
    measured), which would double the token-hashing cost. Signatures are
    8 bytes + key per doc, so the cache stays trivial at any corpus size
    — in production this table would be *written* once and scanned twice.
    """
    s = simhash64(documents).persist()
    chunks = F.expr(
        "array("
        + ", ".join(
            f"named_struct('chunk', {c}, 'val', "
            f"SHIFTRIGHT(simhash, {c * 16}) & {0xFFFF})"
            for c in range(4)
        )
        + ")"
    )
    b = s.select("doc_id", "simhash", F.explode(chunks).alias("cc")).select(
        "doc_id", "simhash", "cc.chunk", "cc.val"
    )
    ham = F.bit_count(
        F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
    )
    return (
        b.alias("x")
        .join(
            b.alias("y"),
            (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.val") == F.col("y.val"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .where(ham <= max_hamming)
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
    )


def passage_dedup(documents: DataFrame, passage_tokens: int = 4) -> DataFrame:
    """Cross-document passage-level duplication report: chop every
    document into non-overlapping ``passage_tokens``-token windows and,
    per document, count how many of its passages also occur verbatim in
    at least one OTHER document.

    This is the tier between exact-document dedup (``dedup_exact``) and
    near-dup (``minhash_lsh``): web-scale corpora are full of documents
    that are globally unique but assembled from boilerplate passages
    (navigation text, license blocks, quoted replies); passage-level
    counts are what a curation pipeline thresholds to drop or rewrite
    them.

    Scale posture (100 TB): passages shuffle as 8-byte xxhash64 keys —
    the text itself never routes a shuffle (same discipline as
    ``dedup_exact``, but the narrower hash: this operator COUNTS
    duplication rather than deleting rows, so a ~1e-10 64-bit collision
    odds is the right trade against an 8× smaller shuffle key; the
    deletion-grade sha256 fingerprint stays in ``dedup_exact``). The
    DuckDB oracle hashes with sha256 instead — any injective-in-practice
    hash yields identical counts, which is itself a useful property to
    pin. The per-doc passage arrays are persisted before the
    explode (a computed-array explode straight out of its projection
    measured ~30× slower than exploding a materialized row — see
    ``pipeline.contamination_check``), and both the frequency count and
    the join-back scan that one cached frame. Per-passage-hash
    count-distinct partial-aggregates map-side; the join back to
    passages is an equi-join on the hash, so candidate volume is bounded
    by passage frequency, never quadratic.
    """
    from ..sources.catalog import ensure_parallelism

    p = passage_tokens
    base = (
        ensure_parallelism(documents.select("doc_id", "text"))
        .select("doc_id", tokens_col().alias("tk"))
        .where(F.size("tk") >= p)
    )
    npass = F.floor(F.size("tk") / p).cast("bigint")
    pas = base.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0).cast("bigint"), npass - 1),
            lambda i: F.xxhash64(
                F.concat_ws(" ", F.slice("tk", i * p + 1, F.lit(p)))
            ),
        ).alias("ph"),
    ).persist()
    ex = pas.select("doc_id", F.explode("ph").alias("h"))
    freq = ex.groupBy("h").agg(F.count_distinct("doc_id").alias("ndocs"))
    dup = F.sum(F.when(F.col("ndocs") > 1, 1).otherwise(0)).cast("bigint")
    return (
        ex.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            dup.alias("n_dup_passages"),
        )
        .select(
            "doc_id",
            "n_passages",
            "n_dup_passages",
            F.round(
                F.col("n_dup_passages") / F.col("n_passages"), 6
            ).alias("dup_ratio"),
        )
    )


def connected_components_star(
    edges: DataFrame, max_iter: int = 15
) -> DataFrame:
    """Connected components by large-star/small-star contraction — the
    O(log n)-round alternative to :func:`connected_components`' min-label
    propagation (which needs O(diameter) rounds and so degrades on long
    chains). Algorithm: Kiveris et al., "Connected Components in
    MapReduce and Beyond" (SoCC 2014).

    State is a directed edge list L with every edge (big, small),
    big > small — a forest of partial pointers toward each component's
    minimum. Each round alternates:

    * **large-star**: for each node u over its FULL neighborhood Γ(u),
      let m = min(Γ(u) ∪ {u}); rewire every *larger* neighbor v > u to
      (v, m). Doubles pointer shortcuts — the contraction step.
    * **small-star**: for each node u over its *smaller* neighbors N(u),
      let m = min(N(u)); rewire u and every v ∈ N(u)\\{m} to (v, m).
      Flattens partial stars.

    Both steps preserve the big>small invariant and the component
    partition; at fixpoint L is exactly {(node, component_min)} for every
    non-root node. Convergence is detected by an (edge-count, hash-sum)
    signature — two driver-side scalars per round, no data collect — and
    non-convergence within ``max_iter`` raises rather than returning a
    partially-contracted (wrong) labeling.

    Scale: every round is two self-contained (groupBy min + join)
    shuffles over the CURRENT edge list, which only shrinks; rounds are
    logarithmic in component size, so a 100-long chain that costs
    label-propagation 100 rounds closes in ~5. ``localCheckpoint`` per
    round bounds plan growth (use ``checkpoint()`` on a real cluster).

    Input: (doc_a, doc_b) pairs, any orientation, self-loops ignored.
    Output: (doc_id, cluster_id) for every node in an edge,
    cluster_id = min doc_id of the component.
    """
    L = (
        edges.select(
            F.greatest("doc_a", "doc_b").alias("a"),
            F.least("doc_a", "doc_b").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sig = None
    for _ in range(max_iter):
        # -- large-star: full symmetric neighborhood ---------------------
        sym = L.select("a", "b").union(
            L.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = sym.groupBy(F.col("a").alias("u")).agg(
            F.min("b").alias("mn")
        )
        mins = mins.select("u", F.least("mn", "u").alias("m"))
        big = (
            sym.where(F.col("b") > F.col("a"))  # larger neighbors v of u=a
            .join(mins, sym["a"] == mins["u"])
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        # -- small-star: smaller neighbors only --------------------------
        sm_min = big.groupBy(F.col("a").alias("u")).agg(
            F.min("b").alias("m")
        )
        # ONE lazy checkpoint per alternation (not one per star): the
        # convergence-signature job below materializes it, so each round
        # costs a single job and the plan still resets to O(1) depth.
        L = (
            big.join(sm_min, big["a"] == sm_min["u"])
            .select(
                F.col("b").alias("a"), F.col("m").alias("b")
            )  # rewire smaller neighbors to m
            .union(sm_min.select(F.col("u").alias("a"), F.col("m").alias("b")))
            .where(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        new_sig = L.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal(38,0) accumulator: a sum of int64 hashes overflows
            # long under ANSI; decimal is exact and never overflows here.
            F.coalesce(
                F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).collect()[0]
        new_sig = (new_sig["n"], new_sig["h"])
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "alternation rounds"
        )
    roots = L.select(F.col("b").alias("doc_id")).distinct()
    return (
        L.select(F.col("a").alias("doc_id"), F.col("b").alias("cluster_id"))
        .union(roots.select("doc_id", F.col("doc_id").alias("cluster_id")))
        .distinct()
    )


def containment_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    block_on: str | None = "lang",
    prefix_filter: bool = True,
) -> DataFrame:
    """Asymmetric near-duplication: shingle-set CONTAINMENT
    ``C(X, Y) = |X ∩ Y| / |X|`` — the measure Jaccard misses. A wire
    story embedded in a longer article, or a doc that is 90% boilerplate
    template, has high containment but low Jaccard (the union is
    dominated by the larger doc), so a Jaccard-threshold dedup keeps
    both. Broder's original resemblance/containment pairing.

    The asymmetry kills Jaccard's size-ratio prune (a tweet inside a
    book still has containment 1 at any size gap), so candidate
    generation must come from the sets themselves. Default path:
    **prefix filtering** (the SSJoin/PPJoin family) — sort each doc's
    hashed shingles canonically; if ``C(X, Y) >= t`` then at least
    ``ceil(t·|X|)`` of X's shingles are in Y, so by pigeonhole X's first
    ``|X| - ceil(t·|X|) + 1`` shingles MUST intersect Y. Candidates are
    an equi-join of X-prefix shingles against the full inverted index —
    EXACT recall by construction (unlike MinHash banding, whose recall
    for containment is probabilistic and poor at low Jaccard), candidate
    volume bounded by prefix-shingle frequency instead of block size².
    The verify stage then runs the intersection only on candidate pairs:
    equi-joins end to end, no quadratic cell anywhere. (At 100 TB the
    classic refinement is ordering shingles by ascending global
    frequency so prefixes hold the rarest shingles; hash order is the
    zero-extra-pass approximation.)

    ``prefix_filter=False`` keeps the salted quadratic block join
    (every same-block pair verified) — the reference implementation the
    equality test pins the filtered path against.

    One unordered candidate pair computes the intersection once and
    emits BOTH orientations that clear the threshold:
    (doc_contained, doc_container, containment).
    """
    g = shingled(documents, n).select(
        "doc_id",
        "lang",
        F.array_sort(
            F.transform("grams", lambda s: F.xxhash64(s))
        ).alias("grams"),
    )
    if prefix_filter:
        paired = _containment_candidates_prefix(g, threshold, block_on)
    else:
        paired = _containment_pairs_blocked(g, block_on)
    c_ab = F.col("ni").cast("double") / F.col("na")  # A contained in B
    c_ba = F.col("ni").cast("double") / F.col("nb")  # B contained in A
    fwd = paired.where(c_ab >= threshold).select(
        F.col("da").alias("doc_contained"),
        F.col("db").alias("doc_container"),
        F.round(c_ab, 6).alias("containment"),
    )
    rev = paired.where(c_ba >= threshold).select(
        F.col("db").alias("doc_contained"),
        F.col("da").alias("doc_container"),
        F.round(c_ba, 6).alias("containment"),
    )
    return fwd.union(rev)


def _containment_candidates_prefix(
    g: DataFrame, threshold: float, block_on: str | None
) -> DataFrame:
    """(da, db, na, nb, ni) for unordered pairs surviving the prefix
    filter. ``g`` carries canonically sorted hashed shingles; it is
    persisted because three stages scan it (prefix explode, index
    explode, verify join-back) — at production scale this cache is the
    signature table you'd materialize once."""
    g = g.persist()
    # ceil on a FLOAT product is a recall hazard: when t·n is
    # mathematically an integer m but fl(t·n) rounds a hair above it,
    # ceil returns m+1 and the prefix shrinks below the pigeonhole
    # minimum. Nudging down by 1e-9 before ceil can only LENGTHEN the
    # prefix (more candidates, never fewer) — exact recall is preserved
    # for any threshold expressible to 9 decimals.
    plen = (
        F.size("grams")
        - F.ceil(F.lit(threshold) * F.size("grams") - F.lit(1e-9)).cast("int")
        + 1
    )
    blk = [block_on] if block_on is not None else []
    pre = g.select(
        F.col("doc_id").alias("doc_x"),
        *blk,
        F.explode(F.slice("grams", 1, plen)).alias("sh"),
    )
    idx = g.select(
        F.col("doc_id").alias("doc_y"),
        *[F.col(c).alias(f"{c}_y") for c in blk],
        F.explode("grams").alias("sh"),
    )
    import functools

    cond = [pre["sh"] == idx["sh"], pre["doc_x"] != idx["doc_y"]]
    if block_on is not None:
        cond.append(pre[block_on] == idx[f"{block_on}_y"])
    cand = (
        pre.join(idx, functools.reduce(lambda a, b: a & b, cond))
        .select(
            F.least("doc_x", "doc_y").alias("da"),
            F.greatest("doc_x", "doc_y").alias("db"),
        )
        .distinct()
    )
    ga = g.select(
        F.col("doc_id").alias("da"),
        F.col("grams").alias("grams_a"),
    )
    gb = g.select(
        F.col("doc_id").alias("db"),
        F.col("grams").alias("grams_b"),
    )
    return (
        cand.join(ga, "da")
        .join(gb, "db")
        .select(
            "da",
            "db",
            F.size("grams_a").alias("na"),
            F.size("grams_b").alias("nb"),
            F.size(F.array_intersect("grams_a", "grams_b")).alias("ni"),
        )
    )


def _containment_pairs_blocked(
    g: DataFrame, block_on: str | None
) -> DataFrame:
    """(da, db, na, nb, ni) by salted quadratic block join — the
    reference path (see :func:`ngram_jaccard_pairs` for the salting
    rationale); every same-block pair pays the intersect."""
    salts = 64
    nparts = 8 * g.sparkSession.sparkContext.defaultParallelism
    keys = ([block_on] if block_on is not None else []) + ["salt"]
    a = (
        g.withColumn("salt", F.pmod(F.hash("doc_id"), F.lit(salts)))
        .repartition(nparts, *keys)
        .alias("a")
    )
    b = (
        g.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
        .repartition(nparts, *keys)
        .alias("b")
    )
    sa, sb = F.size(F.col("a.grams")), F.size(F.col("b.grams"))
    cond = (
        F.col("a.salt") == F.col("b.salt")
    ) & (F.col("a.doc_id") < F.col("b.doc_id"))
    if block_on is not None:
        cond = (F.col(f"a.{block_on}") == F.col(f"b.{block_on}")) & cond
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    return (
        a.join(b, cond)
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            sa.alias("na"),
            sb.alias("nb"),
            inter.alias("ni"),
        )
        .where(F.col("ni") > 0)
    )


def duplicate_spans(documents: DataFrame, w: int = 8) -> DataFrame:
    """Maximal cross-document duplicated-COVERAGE spans: every run of
    consecutive tokens in which EACH w-token window occurs verbatim in
    at least one other document — reported per document as
    (doc_id, span_start, span_tokens), 0-based token offsets. Note the
    merge semantics: adjacent duplicated windows merge even when they
    match DIFFERENT partner documents, so a merged span is a region
    fully covered by duplicated windows, not necessarily one contiguous
    substring of a single partner (the same semantics ExactSubstr-style
    pipelines act on — every token in the span lies inside some
    duplicated w-gram and is removable).

    This is the exact-substring dedup tier (the duplicated-substring
    removal step of LLM training-data pipelines, conventionally done
    with suffix arrays on one machine): unlike :func:`passage_dedup`'s
    non-overlapping fixed windows, the STRIDE-1 windows here detect a
    duplicated run at any alignment, and the island merge recovers the
    full maximal span (a duplicated run of L >= w tokens produces
    L - w + 1 consecutive duplicated window starts, which merge back to
    one (start, L) span).

    Distributed shape instead of a suffix array: ① one projection
    computes the md5 of each of the ~n_tokens sliding windows per doc
    (the explode multiplies rows, never bytes — each row is a 32-char
    hash + two ints); ② a map-side-combined count-distinct-docs per
    window hash marks the duplicated ones; ③ a semi join keeps
    duplicated window starts; ④ the classic gaps-and-islands window
    (lag + running flag-sum, partitioned per doc — parallel across
    docs) merges adjacent starts into maximal spans. Shuffles carry
    hashes and ints only; the text never leaves stage ①.
    """
    from pyspark.sql.window import Window

    from ..sources.catalog import ensure_parallelism

    src = ensure_parallelism(documents.select("doc_id", "text"))
    toked = src.select("doc_id", tokens_col().alias("toks")).where(
        F.size("toks") >= w
    )
    # total expression (same InferFiltersFromGenerate hazard as shingled)
    wins = F.when(
        F.size("toks") >= w,
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - w),
            lambda i: F.md5(F.concat_ws(" ", F.slice("toks", i + 1, w))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    win_rows = toked.select(
        "doc_id", F.posexplode(wins).alias("pos", "h")
    )
    dup = (
        win_rows.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    hits = win_rows.join(dup, "h", "left_semi").select("doc_id", "pos")
    wseq = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(wseq)
    is_new = F.when(prev.isNull() | (F.col("pos") - prev > 1), 1).otherwise(0)
    isl = hits.select(
        "doc_id",
        "pos",
        F.sum(is_new).over(
            wseq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("island"),
    )
    return isl.groupBy("doc_id", "island").agg(
        F.min("pos").cast("int").alias("span_start"),
        (F.max("pos") - F.min("pos") + w).cast("int").alias("span_tokens"),
    ).select("doc_id", "span_start", "span_tokens")


def keep_best_per_cluster(documents: DataFrame) -> DataFrame:
    """End-to-end near-dup RESOLUTION — the step most dedup surfaces stop
    short of: LSH candidate pairs → star-contraction components → keep
    exactly the highest-quality member of every duplicate cluster
    (singletons keep themselves). The output is the actionable keep/drop
    list a curation pipeline consumes, one row per scored document.

    Composition of three already-verified operators (minhash_lsh_pairs,
    connected_components_star, textstats.quality_score), so each stage
    keeps its own scale shape: banded LSH (no all-pairs), O(log n)
    contraction rounds, single-projection scoring. The final argmax is a
    row_number over (quality DESC, doc_id) on the ROUNDED quality — both
    engines rank identical values, so the keep flag cannot flip on float
    noise. Both windows (rank, cluster size) share one cluster_id
    exchange.
    """
    from pyspark.sql.window import Window

    from .textstats import quality_score

    edges = minhash_lsh_pairs(documents).select("doc_a", "doc_b")
    labels = connected_components_star(edges)
    q = quality_score(documents).select("doc_id", "quality")
    labeled = q.join(labels, "doc_id", "left").select(
        "doc_id",
        "quality",
        F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
    )
    w_rank = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    w_all = Window.partitionBy("cluster_id")
    return labeled.select(
        "doc_id",
        "cluster_id",
        "quality",
        (F.row_number().over(w_rank) == 1).alias("keep"),
        F.count(F.lit(1)).over(w_all).alias("cluster_size"),
    )


def dedup_incremental(
    documents: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Incremental (cross-corpus) near-dup screen: which docs of the NEW
    ingest near-duplicate something already in the EXISTING corpus — the
    nightly-batch question, as opposed to the within-corpus pair scan.
    Halves are derived from the source id here (src0-9 existing,
    src10-19 new); a production pipeline passes two frames.

    Shape: reuses the banded-LSH pair scan (:func:`minhash_lsh_pairs` —
    candidates only inside LSH buckets, exact-Jaccard verify), then
    classifies each pair by half and keeps cross pairs only; per new doc
    the best existing match survives via one window (max jaccard, min
    id). The half map joins on doc_id — key-partitioned, no broadcast of
    a corpus-sized frame.
    """
    half = documents.select(
        "doc_id",
        (F.regexp_extract("source", r"(\d+)$", 1).cast("int") < 10).alias(
            "is_existing"
        ),
    )
    pairs = minhash_lsh_pairs(documents, threshold=threshold)
    j = (
        pairs.join(
            half.select(
                F.col("doc_id").alias("doc_a"),
                F.col("is_existing").alias("ex_a"),
            ),
            "doc_a",
        )
        .join(
            half.select(
                F.col("doc_id").alias("doc_b"),
                F.col("is_existing").alias("ex_b"),
            ),
            "doc_b",
        )
        .where(F.col("ex_a") != F.col("ex_b"))
        .select(
            F.when(F.col("ex_a"), F.col("doc_b"))
            .otherwise(F.col("doc_a"))
            .alias("new_doc_id"),
            F.when(F.col("ex_a"), F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("matched_doc_id"),
            "jaccard",
        )
    )
    w = Window.partitionBy("new_doc_id").orderBy(
        F.desc("jaccard"), F.asc("matched_doc_id")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("new_doc_id", "matched_doc_id", "jaccard")
    )


def lsh_tuning_curve(
    documents: DataFrame,
    n: int = 3,
    k: int = 32,
    threshold: float = 0.5,
    configs: tuple[tuple[int, int], ...] = ((16, 2), (8, 4), (4, 8)),
    sample_hex: tuple = ("0", "1", "2", "3"),
) -> DataFrame:
    """Band-geometry tuning sweep for MinHash LSH: for each (bands, rows)
    split of the k-hash signature, the candidate-pair volume and its
    recall/precision against the exact near-dup truth set — the
    measurement loop you run BEFORE burning cluster-days on a 100 TB
    dedup with the wrong S-curve.

    The whole sweep runs on a deterministic md5 DOCUMENT SAMPLE
    (first hex digit of md5(doc_id) in ``sample_hex`` — 4/16 = 25% by
    default; VERDICT r5 item 4): the S-curve is a statistical property,
    so measuring it on a fixed sample is the audit's honest production
    shape, and it makes the exact-truth quadratic (the one superlinear
    stage) linear-ish — 16× fewer candidate cells at the default rate.
    Truth is the exact Jaccard ≥ threshold pair set over the sample,
    language-blocked (:func:`ngram_jaccard_pairs` — word-shingle sets
    across languages are disjoint on this corpus). Band buckets are md5
    over the ':'-joined signature slice, and the sample predicate is
    md5-replayable too, so the whole sweep — sample, signatures, bands,
    candidates, hits — is replayed value-exact by the external oracle.

    Scale: one sampled signature pass (persisted, shared by all
    configs), one (band, bucket) equi-join per config — the candidate
    join is the LSH join itself on the sample; tune the sample rate,
    not the query shape, as the corpus grows.
    """
    sampled = documents.where(
        F.substring(
            F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1
        ).isin(*sample_hex)
    )
    g = shingled(sampled, n).persist()
    sig = minhash_wide(sampled, n, k, shingles=g).persist()
    truth = (
        ngram_jaccard_pairs(sampled, n=n, threshold=threshold, shingles=g)
        .select("doc_a", "doc_b", F.lit(1).alias("t"))
        .persist()
    )
    n_truth = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth"))
    per_config = []
    for bands, r in configs:
        assert bands * r <= k
        band_structs = F.expr(
            "array("
            + ", ".join(
                f"named_struct('band', {i}, 'bucket', md5(CAST(concat_ws(':'"
                + "".join(
                    f", CAST(m{i * r + j} AS STRING)" for j in range(r)
                )
                + ") AS BINARY)))"
                for i in range(bands)
            )
            + ")"
        )
        buckets = sig.select(
            "doc_id", F.explode(band_structs).alias("bb")
        ).select("doc_id", "bb.band", "bb.bucket")
        cand = (
            buckets.alias("x")
            .join(
                buckets.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("x.doc_id") < F.col("y.doc_id")),
            )
            .select(
                F.col("x.doc_id").alias("doc_a"),
                F.col("y.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        per_config.append(
            cand.join(truth, ["doc_a", "doc_b"], "left").agg(
                F.lit(bands).cast("int").alias("bands"),
                F.lit(r).cast("int").alias("rows_per_band"),
                F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
                F.coalesce(F.sum("t"), F.lit(0))
                .cast("bigint")
                .alias("n_tp"),
            )
        )
    from ..sources.catalog import finish_cached

    out = per_config[0]
    for c in per_config[1:]:
        out = out.unionAll(c)
    return finish_cached(
        out.join(F.broadcast(n_truth)).select(
            "bands",
            "rows_per_band",
            "n_candidates",
            "n_tp",
            "n_truth",
            F.round(
                F.col("n_tp").cast("double")
                / F.nullif(F.col("n_truth").cast("double"), F.lit(0.0)),
                6,
            ).alias("recall"),
            F.round(
                F.col("n_tp").cast("double")
                / F.nullif(F.col("n_candidates").cast("double"), F.lit(0.0)),
                6,
            ).alias("precision"),
        ),
        g,
        sig,
        truth,
    )


def dedup_token_impact(documents: DataFrame) -> DataFrame:
    """Per-source dedup IMPACT report: how many whitespace tokens each
    dedup tier would remove — the budget sheet a curation pipeline
    reads before deciding which tiers to run at 100 TB (exact dedup is
    ~free; the near tier costs an LSH pass — this query says what each
    buys, per source).

    Tiers (each independent; exact dups are usually a subset of the
    near clusters, so the columns overlap by design and are reported
    side by side, not summed):

    * exact — a doc is removable when any smaller doc_id anywhere in
      the corpus carries byte-identical text (md5 grouping; removal
      attributes to the doc's OWN source).
    * near — docs the keep-best rule drops
      (:func:`keep_best_per_cluster`: LSH pairs → star components →
      quality argmax per cluster).

    Scale shape: one md5 window over (hash)-keyed groups, the
    already-bounded keep-best composition, and one source-keyed
    partial aggregate; nothing new shuffles document text.
    """
    toks = tokens_col()
    base = documents.select(
        "doc_id",
        "source",
        F.size(toks).cast("bigint").alias("n_tok"),
        F.md5(F.col("text").cast("binary")).alias("h"),
    )
    wmin = Window.partitionBy("h")
    exact_flag = (F.min("doc_id").over(wmin) < F.col("doc_id")).cast("int")
    flagged = base.withColumn("exact_dup", exact_flag)
    keep = keep_best_per_cluster(documents).select(
        "doc_id", F.col("keep").cast("int").alias("keep")
    )
    return (
        flagged.join(keep, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum(F.col("exact_dup") * F.col("n_tok"))
            .cast("bigint")
            .alias("exact_removable_tokens"),
            F.sum((1 - F.coalesce("keep", F.lit(1))) * F.col("n_tok"))
            .cast("bigint")
            .alias("near_removable_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "exact_removable_tokens",
            "near_removable_tokens",
            F.round(
                F.col("exact_removable_tokens").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("exact_removable_pct"),
            F.round(
                F.col("near_removable_tokens").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("near_removable_pct"),
        )
    )


def dedup_capture_recapture(documents: DataFrame) -> DataFrame:
    """Capture–recapture audit of near-dup coverage: treat the MinHash
    LSH pair set and the SimHash pair set as two independent "surveys"
    of the same duplicate population and apply the Chapman estimator
    N̂ = (n₁+1)(n₂+1)/(m+1) − 1 (m = pairs both methods caught) — the
    ecology trick that answers the unanswerable-by-one-method question
    "how many near-dup pairs exist that NEITHER sweep sees?", plus
    each method's implied coverage. The engine auditing its own
    recall without ground truth.

    Exactness: three integer counts and two rounded IEEE expressions.
    Scale: composes two banded pipelines (never all-pairs); the
    overlap join runs on the two pair sets, not the corpus.
    """
    a = minhash_lsh_pairs(documents).select("doc_a", "doc_b")
    b = simhash_pairs(documents).select("doc_a", "doc_b")
    n1 = a.agg(F.count(F.lit(1)).cast("bigint").alias("n_minhash"))
    n2 = b.agg(F.count(F.lit(1)).cast("bigint").alias("n_simhash"))
    m = (
        a.join(b, ["doc_a", "doc_b"])
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlap"))
    )
    j = n1.crossJoin(n2).crossJoin(m)
    n1d = F.col("n_minhash").cast("double")
    n2d = F.col("n_simhash").cast("double")
    md = F.col("n_overlap").cast("double")
    chapman = F.round(
        ((n1d + F.lit(1.0)) * (n2d + F.lit(1.0))) / (md + F.lit(1.0))
        - F.lit(1.0),
        6,
    )
    out = j.withColumn("chapman_total", chapman)
    cov = lambda c: F.when(  # noqa: E731
        F.col("chapman_total") > 0,
        F.round(c / F.col("chapman_total"), 6),
    )
    return out.select(
        "n_minhash",
        "n_simhash",
        "n_overlap",
        "chapman_total",
        cov(n1d).alias("coverage_minhash"),
        cov(n2d).alias("coverage_simhash"),
    )
