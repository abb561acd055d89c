"""Fixture tests for the round-5 third-session additions: semantics
pinned on hand-built inputs (the oracle sweep covers the real tables)."""

from __future__ import annotations

import pyspark.sql.functions as F

from hadoop_coded_wordcount_spark.operators import (
    pipeline as pl,
    relational as rel,
    similarity as sim,
    sketches as sk,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )


# --- Misra-Gries two-pass heavy hitters ---------------------------------


def test_mg_heavy_hitters_exact_output(spark):
    """Output must equal the exact set {word: cnt*k > N} with exact
    counts, regardless of what the sketch pass kept."""
    rows = [(i, "a " * 30 + "b " * 10 + f"u{i}", "en", "s") for i in range(8)]
    docs = _docs(spark, rows)
    # N = 8*(30+10+1) = 328; k=4 -> threshold cnt > 82: only 'a' (240).
    got = {
        r.word: r.cnt
        for r in sk.misra_gries_heavy_hitters(docs, k=4, capacity=8).collect()
    }
    assert got == {"a": 240}


def test_mg_heavy_hitters_tiny_capacity_still_exact(spark):
    """A capacity barely above k still yields the exact answer — the
    recount pass, not the sketch accuracy, owns correctness."""
    rows = [(i, "x " * 50 + f"w{i} y z", "en", "s") for i in range(6)]
    docs = _docs(spark, rows)
    # N = 6*53 = 318; k=3 -> threshold 106: only 'x' (300).
    got = {
        r.word: r.cnt
        for r in sk.misra_gries_heavy_hitters(docs, k=3, capacity=4).collect()
    }
    assert got == {"x": 300}


# --- Token-budget waterfilling ------------------------------------------


def test_waterfill_allocation_conserves_budget(spark):
    """sum(alloc) == budget, saturated sources contribute all they
    have, unsaturated ones share one fill level."""
    rows = []
    sizes = {"tiny": 10, "small": 40, "big": 300, "huge": 650}
    did = 0
    for src, n in sizes.items():
        rows.append((did, "t " * n, "en", src))
        did += 1
    out = {
        r.source: r
        for r in pl.token_budget_waterfill(_docs(spark, rows)).collect()
    }
    total = sum(sizes.values())  # 1000 -> budget 500
    assert sum(r.alloc_tokens for r in out.values()) == total // 2
    assert out["tiny"].saturated and out["tiny"].alloc_tokens == 10.0
    assert out["small"].saturated and out["small"].alloc_tokens == 40.0
    # remaining 450 splits evenly over the two unsaturated sources
    assert not out["big"].saturated
    assert out["big"].alloc_tokens == out["huge"].alloc_tokens == 225.0
    assert out["huge"].epochs == round(225.0 / 650, 6)


def test_waterfill_no_saturation_when_uniform(spark):
    """Equal availabilities at a 50% budget: nobody saturates, every
    source gets exactly half its tokens."""
    rows = [(i, "t " * 100, "en", f"s{i}") for i in range(4)]
    out = pl.token_budget_waterfill(_docs(spark, rows)).collect()
    assert all(not r.saturated and r.alloc_tokens == 50.0 for r in out)


# --- ABC classification ---------------------------------------------------


def test_abc_classes_partition_all_parts(spark):
    # Ranked desc: 400 (cum 0.4), 300 (0.7) -> A; 150 (0.85), 100
    # (0.95) -> B; five 1% parts -> C.
    revs = [400.0, 300.0, 100.0, 150.0] + [10.0] * 5
    li = spark.createDataFrame(
        [(1, i, r, 0.0) for i, r in enumerate(revs)],
        "l_orderkey bigint, l_partkey bigint, l_extendedprice double,"
        " l_discount double",
    )
    got = {r.abc_class: r for r in rel.abc_classification(li).collect()}
    assert got["A"].n_parts == 2 and got["A"].class_revenue == 700.0
    assert got["B"].n_parts == 2 and got["C"].n_parts == 5
    assert sum(r.n_parts for r in got.values()) == len(revs)
    assert abs(sum(r.revenue_share for r in got.values()) - 1.0) < 1e-6


# --- k-anonymity -----------------------------------------------------------


def test_k_anonymity_counts_small_classes(spark):
    cust = spark.createDataFrame(
        # band 0: 5 customers (nation 1, seg A); band -1: 1 customer.
        [(i, 1, "A", 10.0 * i) for i in range(5)] + [(9, 2, "B", -5.0)],
        "c_custkey bigint, c_nationkey int, c_mktsegment string,"
        " c_acctbal double",
    )
    row = rel.k_anonymity(cust).collect()[0]
    assert row.n_classes == 2 and row.min_k == 1
    assert row.classes_k_lt_5 == 1 and row.n_customers == 6
    assert row.at_risk_share == round(1 / 6, 6)


# --- int8 recall -----------------------------------------------------------


def test_int8_recall_bounds_and_self_exclusion(spark):
    """Recall lies in [0,1]; identical-direction vectors rank exactly and
    a query never retrieves itself."""
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], 0) for i in range(40)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    r = sim.int8_recall(emb, k=5, query_mod=10, dim=8, salts=4).collect()[0]
    assert r.n_queries == 4
    assert 0.0 <= r.min_recall_at_k <= r.mean_recall_at_k <= 1.0


# --- decile migration ------------------------------------------------------


def test_decile_migration_total_order_and_counts(spark):
    import datetime

    rows = []
    for c in range(10):
        rows.append(
            (100 + c, c, 100.0 * (c + 1), datetime.datetime(1997, 3, 1))
        )
        # reverse the spend ranking in 1998 -> perfect anti-diagonal
        rows.append(
            (200 + c, c, 100.0 * (10 - c), datetime.datetime(1998, 3, 1))
        )
    orders = spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_totalprice double,"
        " o_orderdate timestamp",
    )
    got = rel.decile_migration(orders).collect()
    assert sum(r.n_customers for r in got) == 10
    m = {(r.decile_from, r.decile_to) for r in got}
    # customer with top 1997 spend (c=9) has the lowest 1998 spend
    assert (1, 10) in m and (10, 1) in m


# --- HLL set algebra -------------------------------------------------------


def test_hll_set_ops_union_bounds_and_exact_flags(spark):
    """Union estimate >= each side's estimate (register max-merge can
    only raise Z-mass); exact counts match the construction."""
    rows = []
    eid = 0
    import datetime

    t = datetime.datetime(2024, 1, 1)
    for u in range(40):
        rows.append((eid, t, u, "view", 1.0)); eid += 1
    for u in range(20, 60):
        rows.append((eid, t, u, "purchase", 1.0)); eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double",
    )
    from hadoop_coded_wordcount_spark.operators.sketches import hll_set_ops

    r = hll_set_ops(ev).collect()[0]
    assert r.exact_a == 40 and r.exact_b == 40 and r.exact_intersect == 20
    assert r.est_union >= max(r.est_a, r.est_b) - 1e-6
    assert abs(r.est_intersect - (r.est_a + r.est_b - r.est_union)) < 1e-6


# --- Session-type lift -----------------------------------------------------


def test_session_type_lift_perfect_cooccurrence(spark):
    """Two types always together in every session -> lift = 1/support
    relation: P(a,b)=P(a)=P(b)=1 so lift = 1.0."""
    import datetime

    rows = []
    eid = 0
    for u in range(5):
        t = datetime.datetime(2024, 1, 1, 8, 0)
        rows.append((eid, t, u, "view", 1.0)); eid += 1
        rows.append(
            (eid, t + datetime.timedelta(minutes=1), u, "click", 1.0)
        ); eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double",
    )
    got = rel.session_type_lift(ev).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.type_a, r.type_b) == ("click", "view")
    assert r.n_both == 5 and r.support == 1.0 and r.lift == 1.0


def test_session_type_lift_gap_splits_sessions(spark):
    """A >30 min gap separates the two types into different sessions —
    no pair row survives."""
    import datetime

    t = datetime.datetime(2024, 1, 1, 8, 0)
    ev = spark.createDataFrame(
        [
            (0, t, 1, "view", 1.0),
            (1, t + datetime.timedelta(minutes=45), 1, "click", 1.0),
        ],
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double",
    )
    assert rel.session_type_lift(ev).count() == 0


# --- Vocabulary drift movers ----------------------------------------------


def test_token_drift_movers_flags_the_shifted_word(spark):
    """A word present only in the new slice tops the movers; a word
    with identical share in both slices shows ~zero delta."""
    from hadoop_coded_wordcount_spark.operators import textstats as ts

    rows = []
    for i in range(0, 40, 2):  # even = reference
        rows.append((i, "base " * 50, "en", "s"))
    for i in range(1, 40, 2):  # odd = new crawl
        rows.append((i, "base " * 25 + "drifted " * 25, "en", "s"))
    got = {r.word: r for r in ts.token_drift_movers(_docs(spark, rows)).collect()}
    # mirror-image movers: 'base' lost exactly the share 'drifted' gained
    assert got["drifted"].cnt_ref == 0 and got["drifted"].share_delta == 0.5
    assert got["base"].share_delta == -0.5 and len(got) == 2


# --- Exact Shapley channel attribution ------------------------------------


def test_shapley_attribution_hand_computed(spark):
    """Two channels, hand-worked lattice: v(∅)=1, v({a})=1/2, v({b})=0,
    v({a,b})=1 → φ(a)=0.25, φ(b)=-0.25 (Shapley terms written out in
    the docstring math, weights ½ each)."""
    import datetime

    t = datetime.datetime(2024, 1, 1)
    rows = [
        (0, t, 1, "a", 1.0),
        (1, t, 1, "purchase", 1.0),
        (2, t, 2, "a", 1.0),
        (3, t, 3, "a", 1.0),
        (4, t, 3, "b", 1.0),
        (5, t, 3, "purchase", 1.0),
        (6, t, 4, "b", 1.0),
        (7, t, 5, "purchase", 1.0),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double",
    )
    got = {r.channel: r.shapley_credit for r in rel.shapley_attribution(ev).collect()}
    assert got == {"a": 0.25, "b": -0.25}


def test_shapley_attribution_single_channel_is_marginal(spark):
    """One channel: φ = v({c}) - v(∅) exactly (the only coalition pair)."""
    import datetime

    t = datetime.datetime(2024, 1, 1)
    rows = [
        (0, t, 1, "c", 1.0),
        (1, t, 1, "purchase", 1.0),
        (2, t, 2, "c", 1.0),
        (3, t, 3, "purchase", 1.0),
        (4, t, 4, "purchase", 1.0),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double",
    )
    got = {r.channel: r.shapley_credit for r in rel.shapley_attribution(ev).collect()}
    # v({c}) = 1/2, v(∅) = 1 (both bare-purchase users convert)
    assert got == {"c": -0.5}
