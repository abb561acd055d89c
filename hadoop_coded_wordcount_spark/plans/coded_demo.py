"""Didactic coded-shuffle (XOR multicast) demo — reference O7.

The reference's research novelty is its combiner's ``cacheOrSend``
(reference WordCount.java:125-209): when two partial counts live on
replica sets that differ in exactly one node and hash to different
reducers, their counts are XOR-ed into one 2-word packet emitted to both
destinations — index coding à la Coded MapReduce (Li, Maddah-Ali, Suh,
Avestimehr, IEEE Trans. IT 2018) — counted by the
PACKETS_SENT / ENCODED_PACKETS_SENT counters
(reference WordCountDriver.java:17-20).

This is a wire-protocol optimization below Spark's public API (SURVEY.md
§4.3): Spark's sort-based compressed shuffle with map-side combine owns
that slot, so the engine does NOT reimplement it in the query path. This
module is the *didactic* reproduction the survey promised: an RDD
``mapPartitions`` pipeline that performs the pairing/encoding with working
decode (the reference's own decode is buggy — it looks up the wrong key,
reference WordCount.java:255-258 — so we implement the textbook scheme it
intended), counting packets with LongAccumulators, the Spark analog of
Hadoop counters.

Scheme (r=2 replication over 3 nodes, the reference's hard-coded topology,
reference BlockLocationInfo.xml:2-36): a partial count computed on node A
for a split replicated on {A,B} is *locally known* at B too. For partials
(w1,{A,B}) and (w2,{A,C}) both combined at A, node A multicasts one packet
(w1^w2) to B and C: B knows w1 (its replica) and decodes w2; C knows w2
and decodes w1. One packet, two deliveries — the r× communication saving.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import SparkSession

__all__ = ["coded_shuffle_demo"]

NODES = ("node1", "node2", "node3")


def _replicas(source: str) -> tuple[str, str]:
    """Deterministic 2-of-3 replica assignment per source (the demo's
    BlockLocationInfo.xml analog)."""
    i = sum(ord(c) for c in source) % 3
    return (NODES[i], NODES[(i + 1) % 3])


def coded_shuffle_demo(
    spark: SparkSession, docs_rows: list[tuple[str, str]]
) -> dict:
    """Run the coded-shuffle wordcount demo over (source, text) rows.

    Returns {word_counts, packets_sent, encoded_packets_sent,
    naive_packets, saving_ratio} where ``word_counts`` is proven equal to
    the plain computation after XOR decode. Demo-scale only (the decode
    verification gathers packets driver-side); the *engine's* wordcount is
    ``operators/wordcount.py``.
    """
    sc = spark.sparkContext
    packets_sent = sc.accumulator(0)
    encoded_sent = sc.accumulator(0)

    rdd = sc.parallelize(docs_rows, numSlices=4)

    # A partition plays the role of an input split: its id keys the partial
    # counts, because a replica node's "local knowledge" is exactly the
    # partials *of splits it stores* (it can recompute them from its copy).
    def partials_of(split_id: int, rows):
        counts: dict[tuple[tuple[str, str], str], int] = defaultdict(int)
        for source, text in rows:
            locs = _replicas(source)
            for w in text.split():
                if w:
                    counts[(locs, w)] += 1
        for (locs, w), c in sorted(counts.items()):
            yield (split_id, locs, w, c)

    # Combine + encode per split: XOR-pair partials whose replica sets
    # overlap in exactly one node (reference WordCount.java:159-183:
    # for r=2, |union| - |overlap| == 2) so each coded packet serves the
    # two non-shared nodes; residue flushed plain
    # (reference WordCount.java:212-223).
    def encode(split_id: int, rows):
        cache: list[tuple[tuple[str, str], str, int]] = []
        for _sid, locs, w, c in partials_of(split_id, rows):
            paired = False
            for idx, (plocs, pw, pc) in enumerate(cache):
                if len(set(locs) & set(plocs)) == 1:
                    yield ("coded", split_id, (pw, plocs), (w, locs), pc ^ c)
                    encoded_sent.add(1)
                    packets_sent.add(1)
                    cache.pop(idx)
                    paired = True
                    break
            if not paired:
                cache.append((locs, w, c))
        for locs, w, c in cache:
            yield ("plain", split_id, (w, locs), None, c)
            packets_sent.add(1)

    packets = rdd.mapPartitionsWithIndex(encode).collect()

    # Ground-truth partials (same partitioning, no coding) give both the
    # naive packet count and each node's local knowledge for decode.
    truth = rdd.mapPartitionsWithIndex(partials_of).collect()
    local_know: dict[str, dict] = {n: {} for n in NODES}
    for split_id, locs, w, c in truth:
        for n in locs:
            local_know[n][(split_id, w, locs)] = c

    decoded: dict[str, int] = defaultdict(int)
    for p in packets:
        if p[0] == "plain":
            kind, _sid, (w, _locs), _, c = p
            decoded[w] += c
        else:
            kind, sid, (w1, locs1), (w2, locs2), x = p
            # the node in locs1\locs2 stores w1's data, recomputes w1's
            # partial locally, and XORs it out to learn w2 — and vice versa
            for target, known_key, want in (
                ((set(locs1) - set(locs2)).pop(), (sid, w1, locs1), w2),
                ((set(locs2) - set(locs1)).pop(), (sid, w2, locs2), w1),
            ):
                known = local_know[target].get(known_key)
                assert known is not None, "pairing invariant broken"
                decoded[want] += x ^ known

    plain: dict[str, int] = defaultdict(int)
    for _sid, _locs, w, c in truth:
        plain[w] += c
    assert dict(decoded) == dict(plain), "XOR decode must round-trip"

    naive = len(truth)  # one packet per per-split partial
    return {
        "word_counts": dict(plain),
        "packets_sent": packets_sent.value,
        "encoded_packets_sent": encoded_sent.value,
        "naive_packets": naive,
        "saving_ratio": packets_sent.value / max(1, naive),
    }
