"""Streaming MinHash-LSH ingest dedup — "does this arriving document
near-duplicate anything already ingested?", answered at ingest time
(SURVEY §13; the streaming twin of ``operators/dedup.py``'s
``dedup_incremental`` nightly batch).

Reference parity: the reference engine has no streaming surface (it is a
batch MapReduce wordcount, /root/reference/src/wordcount/WordCount.java);
this operator extends the engine's LLM-data-pipeline family the way the
brief directs — ingest-time dedup is what a 100 TB training-data pipeline
runs in front of its corpus store.

Three stages, only the last stateful:

1. :func:`ingest_features` — stateless, JVM-side, per micro-batch:
   shingle → MinHash signature → per-band bucket hash, built from the
   SAME expression builders as the batch LSH scan
   (``operators/dedup.py``: ``tokens_col``/``_signature_col`` and the
   ``minhash_lsh_pairs`` band construction), so stream signatures and
   buckets are bit-identical to the batch leg — the stream==batch
   pinning strategy every ``streaming/`` twin uses. One row per
   (doc, band) leaves this stage; the text column does NOT (signatures
   shuffle, text never does — the same principle that makes the batch
   LSH scale).
2. :func:`exact_resend_filter` — exact-dup fast path:
   ``dropDuplicatesWithinWatermark`` on the content sha256 drops exact
   re-sends inside the watermark horizon with Spark-managed bounded
   state. Equality dedup only — it cannot flag-and-keep and cannot
   verify a similarity threshold, which is why stage 3 exists. Run it
   as its own query in front of the near-dup screen (chaining a
   watermark dedup into ``applyInPandasWithState`` inside one streaming
   query is outside Spark's supported multi-stateful combinations).
3. :func:`ingest_neardup_stream` — near-dup bucket state
   (``applyInPandasWithState``, update mode): state keyed by
   ``(band, bucket)`` — the LSH bucket, the only key under which
   near-duplicates are guaranteed to collide. Per bucket the state
   holds a CAPPED list of representatives (doc_id + signature). An
   arriving doc probes its bucket, estimates Jaccard against each
   representative as the matching-minhash fraction, emits its best
   match over threshold, and appends itself if the bucket has room.

Bounded-state argument (the 100 TB posture):

* *Bucket cap* — a bucket past ``cap`` members is either boilerplate
  (members already flagged against the first ``cap`` representatives) or
  a band-hash collision storm; overflow appends are dropped and COUNTED
  (the ``bucket_overflow`` output column), never silently absorbed. The
  cost is missed matches against the (cap+1)-th+ variant of
  already-flagged content — recall on fresh content is unaffected.
* *Timeout horizon* — buckets idle past ``timeout_ms`` expire via
  ``GroupStateTimeout.ProcessingTimeTimeout``, so live-bucket count is
  bounded by bucket-arrival rate × horizon, not by history. Ingest-time
  dedup answers "seen in the last T"; the beyond-horizon question stays
  with the nightly ``dedup_incremental`` batch — the standard lambda
  split, stated here rather than hidden.
* *No text in state* — representatives store doc_id + signature only
  (k longs ≈ 256 bytes at k=32); verification is signature-estimated
  Jaccard. The batch operator's exact-Jaccard verify needs both shingle
  sets — at ingest time that would mean corpus-sized text state, so the
  streaming twin accepts the estimator and documents the delta (est vs
  exact differs by the standard MinHash ±1/√k error; the
  batch-equivalence test compares pair SETS against a batch replay of
  the identical estimator, and against ``dedup_incremental`` with a
  margin).

Why not a stream-stream self-join on band_hash: it needs the full ingest
history on both sides inside the watermark — state grows with the
corpus, exactly what the bucket cap avoids. Why
``applyInPandasWithState`` and not ``transformWithStateInPandas``: the
Spark-4 API's Python<->JVM protocol needs google.protobuf, absent in
this environment (the ``running_user_totals_v2`` precedent,
``streaming/stateful.py``); the state machine here is API-portable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import _signature_col, tokens_col

__all__ = [
    "ingest_features",
    "exact_resend_filter",
    "ingest_neardup_stream",
]

MATCH_SCHEMA = (
    "doc_id bigint, matched_doc_id bigint, est_jaccard double, "
    "band int, bucket bigint, bucket_size int, bucket_overflow bigint"
)
# representatives as parallel columns — doc_ids[i] owns the k-slice
# sigs[i*k:(i+1)*k]; a flat long array round-trips the state store
# without nested-array serialization
_STATE_SCHEMA = "doc_ids array<bigint>, sigs array<bigint>, overflow bigint"


def ingest_features(
    stream: DataFrame, n: int = 3, k: int = 32, bands: int = 16
) -> DataFrame:
    """Stateless per-document LSH features: (doc_id, signature, band,
    bucket), one row per (doc, band).

    Expression-identical to the batch leg: grams replicate
    ``operators/dedup.py:shingled`` (distinct word n-grams, docs with
    fewer than n tokens dropped, the total-expression ``when`` guard
    against predicate reordering) minus its ``ensure_parallelism``
    repartition — ``df.rdd`` is illegal on a stream, and a stream source
    arrives already split across tasks; the signature is
    ``_signature_col`` and the band buckets are ``xxhash64`` over r=k/bands
    consecutive signature entries, both exactly as ``minhash_lsh_pairs``
    builds them, so stream buckets equal batch buckets bit-for-bit.
    """
    r = k // bands
    toks = tokens_col()
    with_toks = stream.select("doc_id", toks.alias("toks")).where(
        F.size("toks") >= n
    )
    grams = F.when(
        F.size("toks") >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at("toks", i + j + 1) for j in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    sig = with_toks.select("doc_id", grams.alias("grams")).select(
        "doc_id", _signature_col(k).alias("signature")
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[
                        F.element_at("signature", b * r + j + 1)
                        for j in range(r)
                    ]
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    return sig.select(
        "doc_id", "signature", F.explode(band_structs).alias("bb")
    ).select("doc_id", "signature", "bb.band", "bb.bucket")


def exact_resend_filter(
    stream: DataFrame, ts_col: str = "ts", lateness: str = "10 minutes"
) -> DataFrame:
    """Exact-dup fast path: drop byte-identical re-sends inside the
    watermark horizon, keyed on the content sha256 so the (potentially
    large) text is compared via a 32-byte digest. Spark manages the
    bounded key state and expires it past the watermark — the same
    at-least-once cleanup shape as ``streaming/joins.py``'s content-key
    dedup, applied to the document ingest."""
    return (
        stream.withColumn("text_sha", F.sha2(F.col("text"), 256))
        .withWatermark(ts_col, lateness)
        .dropDuplicatesWithinWatermark(["text_sha"])
        .drop("text_sha")
    )


def _make_update(k: int, threshold: float, cap: int, timeout_ms: int | None):
    """Build the per-bucket state update. Pure Python by design so tests
    drive it directly with a fake GroupState (the JVM-backed one only
    exists inside a running query)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle past the horizon: the bucket's representatives expire;
            # beyond-horizon matches belong to the nightly batch leg
            state.remove()
            return
        band, bucket = key
        if state.exists:
            doc_ids, flat, overflow = state.get
            doc_ids, flat = list(doc_ids), list(flat)
        else:
            doc_ids, flat, overflow = [], [], 0
        # deterministic arrival order inside a micro-batch: partition
        # order is scheduler-dependent, doc_id order is not (and equals
        # ingest order wherever ids are assigned at ingest)
        arrivals: list[tuple[int, list[int]]] = []
        for pdf in pdfs:
            arrivals.extend(
                (int(r.doc_id), [int(v) for v in r.signature])
                for r in pdf.itertuples(index=False)
            )
        arrivals.sort(key=lambda a: a[0])
        out: list[tuple] = []
        for doc_id, sig in arrivals:
            over = [
                (sum(a == b for a, b in zip(sig, rep)) / k, rep_id)
                for idx, rep_id in enumerate(doc_ids)
                if rep_id != doc_id
                for rep in [flat[idx * k : (idx + 1) * k]]
            ]
            over = [(e, rid) for e, rid in over if e >= threshold]
            if over:
                # highest estimate wins; ties break to the lowest doc_id
                # (the batch operator's max-jaccard/min-id convention)
                best_est, best_id = max(over, key=lambda t: (t[0], -t[1]))
                out.append(
                    (
                        doc_id,
                        best_id,
                        round(best_est, 6),
                        band,
                        bucket,
                        len(doc_ids),
                        overflow,
                    )
                )
            if doc_id in doc_ids:
                continue  # exact resend that reached stage 3: no re-append
            if len(doc_ids) < cap:
                doc_ids.append(doc_id)
                flat.extend(sig)
            else:
                overflow += 1
        state.update((doc_ids, flat, overflow))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "matched_doc_id",
                    "est_jaccard",
                    "band",
                    "bucket",
                    "bucket_size",
                    "bucket_overflow",
                ],
            )

    return update


def ingest_neardup_stream(
    stream: DataFrame,
    n: int = 3,
    k: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
    cap: int = 32,
    timeout_ms: int | None = None,
) -> DataFrame:
    """The stage-3 near-dup screen over a (doc_id, text, ...) document
    stream: emits ``(doc_id, matched_doc_id, est_jaccard, band, bucket,
    bucket_size, bucket_overflow)`` for every arriving doc whose
    signature-estimated Jaccard against a stored bucket representative
    reaches ``threshold``. A doc colliding with state in several bands
    emits per band; best-match-per-doc is one stateless groupBy away in
    the consumer (``max_by(matched_doc_id, est_jaccard)`` per batch) —
    kept OUT of this query because a second stateful aggregation behind
    ``applyInPandasWithState`` is not a supported combination.

    Output mode must be ``update``. ``timeout_ms=None`` keeps state
    forever (test/backfill mode); production passes the ingest horizon.
    """
    timeout = (
        GroupStateTimeout.NoTimeout
        if timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        ingest_features(stream, n=n, k=k, bands=bands)
        .groupBy("band", "bucket")
        .applyInPandasWithState(
            _make_update(k, threshold, cap, timeout_ms),
            outputStructType=MATCH_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
