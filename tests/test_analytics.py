"""Fixture tests for the round-5 analytics additions: semantics pinned on
hand-built inputs (the oracle sweep covers the real tables)."""

from __future__ import annotations

import pyspark.sql.functions as F

from hadoop_coded_wordcount_spark.operators import relational as rel


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )


def test_market_basket_pairs_hand_baskets(spark):
    """Two baskets sharing the pair (1,2); pair (1,3) appears once and
    falls below min_support."""
    lineitem = spark.createDataFrame(
        [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 3)],
        "l_orderkey bigint, l_partkey bigint",
    )
    part = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "p_partkey bigint, p_name string"
    )
    got = rel.market_basket_pairs(lineitem, part, min_support=2).collect()
    assert [(r.part_a, r.part_b, r.support) for r in got] == [(1, 2, 2)]


def test_market_basket_dedups_same_part_lines(spark):
    """Re-ordered same-part lines in one basket must not inflate support
    (distinct-parts-per-order before the pair join)."""
    lineitem = spark.createDataFrame(
        [(10, 1), (10, 1), (10, 2)], "l_orderkey bigint, l_partkey bigint"
    )
    part = spark.createDataFrame(
        [(1, "a"), (2, "b")], "p_partkey bigint, p_name string"
    )
    got = rel.market_basket_pairs(lineitem, part, min_support=1).collect()
    assert [(r.part_a, r.part_b, r.support) for r in got] == [(1, 2, 1)]


def test_interpurchase_intervals_single_order_customers_excluded(spark):
    import datetime

    d = datetime.datetime
    orders = spark.createDataFrame(
        [
            (1, 100, d(2020, 1, 1)),
            (2, 100, d(2020, 1, 11)),
            (3, 200, d(2020, 5, 1)),  # single order -> no gap
        ],
        "o_orderkey bigint, o_custkey bigint, o_orderdate timestamp",
    )
    customer = spark.createDataFrame(
        [(100, "SEG_A"), (200, "SEG_B")], "c_custkey bigint, c_mktsegment string"
    )
    got = rel.interpurchase_intervals(orders, customer).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.c_mktsegment, r.n_gaps, r.mean_gap_days, r.min_gap_days) == (
        "SEG_A",
        1,
        10.0,
        10,
    )


def test_multi_touch_attribution_splits_evenly(spark):
    """One purchase of value 9.0 with 3 in-window clicks on two dates:
    each click gets 3.0; an out-of-window click gets nothing."""
    import datetime

    d = datetime.datetime
    rows = [
        (1, d(2020, 1, 10, 12), 7, "purchase", 9.0),
        (2, d(2020, 1, 9, 1), 7, "click", 0.0),
        (3, d(2020, 1, 9, 2), 7, "click", 0.0),
        (4, d(2020, 1, 8, 5), 7, "click", 0.0),
        (5, d(2019, 12, 1, 0), 7, "click", 0.0),  # outside 7-day window
        (6, d(2020, 1, 9, 3), 8, "click", 0.0),  # other user
    ]
    got = {
        r.click_date: (r.n_touches, r.attributed_revenue)
        for r in rel.multi_touch_attribution(_events(spark, rows)).collect()
    }
    assert got == {"2020-01-09": (2, 6.0), "2020-01-08": (1, 3.0)}


def test_benford_shares_sum_to_one_and_chi_nonnegative(spark):
    orders = spark.createDataFrame(
        [(float(v),) for v in [1, 19, 23, 34, 45, 56, 67, 78, 89, 91, 120]],
        "o_totalprice double",
    )
    got = rel.benford_digits(orders).collect()
    assert abs(sum(r.obs_share for r in got) - 1.0) < 1e-6
    assert all(r.chi_square >= 0 for r in got)
    assert len({r.chi_square for r in got}) == 1  # same statistic every row
    # digit extraction is string-based: 120 -> '1'
    ones = [r for r in got if r.digit == "1"]
    assert ones and ones[0].n == 3  # 1, 19, 120


def test_sequence_match_counts_partition_invariant(spark):
    import datetime

    d = datetime.datetime
    rows = [
        # user 1: e,e,e consecutive -> match
        (1, d(2020, 1, 1, 0), 1, "error", 0.0),
        (2, d(2020, 1, 1, 1), 1, "error", 0.0),
        (3, d(2020, 1, 1, 2), 1, "error", 0.0),
        # user 2: errors separated by a view -> no match
        (4, d(2020, 1, 1, 0), 2, "error", 0.0),
        (5, d(2020, 1, 1, 1), 2, "view", 0.0),
        (6, d(2020, 1, 1, 2), 2, "error", 0.0),
        (7, d(2020, 1, 1, 3), 2, "error", 0.0),
    ]
    ev = _events(spark, rows)
    got = {r.matched: r.n_users for r in rel.sequence_match_users(ev).collect()}
    assert got == {True: 1, False: 1}
    got2 = {
        r.matched: r.n_users
        for r in rel.sequence_match_users(ev.repartition(7)).collect()
    }
    assert got2 == got


def test_psi_drift_identical_periods_near_zero(spark):
    """When both periods draw the same values, every PSI term is ~0 (the
    smoothing keeps it finite, not exactly zero for unequal sizes)."""
    import datetime

    d = datetime.datetime
    rows = [(i, float(100 + (i * 37) % 900), d(1996, 1, 1)) for i in range(200)]
    rows += [
        (1000 + i, float(100 + (i * 37) % 900), d(1999, 1, 1))
        for i in range(200)
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey bigint, o_totalprice double, o_orderdate timestamp"
    )
    got = rel.psi_drift(orders).collect()
    assert len(got) == 10
    assert sum(abs(r.psi_term) for r in got) < 1e-3


def test_rfm_segments_cover_all_customers(spark):
    from conftest import SF001

    from hadoop_coded_wordcount_spark.sources.catalog import load_table

    orders = load_table(spark, SF001, "orders")
    got = rel.rfm_segments(orders)
    n_cust = orders.select("o_custkey").distinct().count()
    assert got.agg(F.sum("n_customers")).collect()[0][0] == n_cust
    scores = got.select("r_score", "f_score", "m_score").collect()
    assert all(
        1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
        for r in scores
    )


def test_weighted_median_is_weighted_not_plain(spark):
    """A heavy-quantity cheap line must drag the weighted median below
    the unweighted one."""
    lineitem = spark.createDataFrame(
        [(1, 1, 1, 98.0, 10.0), (2, 1, 2, 100.0, 1.0), (3, 1, 3, 200.0, 1.0)],
        "l_orderkey bigint, l_partkey bigint, l_linenumber int, "
        "l_extendedprice double, l_quantity double",
    )
    part = spark.createDataFrame([(1, "B")], "p_partkey bigint, p_brand string")
    got = rel.weighted_median_price(lineitem, part).collect()
    assert got[0].weighted_median_price == 98.0


def test_clv_cohort_monotone_and_consistent(spark):
    """Per cohort, cumulative revenue is non-decreasing in age, and
    age-0 exists for every cohort (the first order defines it)."""
    from conftest import SF001

    from hadoop_coded_wordcount_spark.sources.catalog import load_table

    rows = rel.clv_cohort(load_table(spark, SF001, "orders")).collect()
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_mo, []).append(r)
    for mo, rs in by_cohort.items():
        rs.sort(key=lambda r: r.age_months)
        assert rs[0].age_months == 0, mo
        cums = [r.cum_revenue for r in rs]
        assert all(a <= b + 1e-9 for a, b in zip(cums, cums[1:])), mo


# ---- round-6 additions: SCD2, MERGE, target encoding, bootstrap CI ----


def _orders(spark, rows):
    return spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_totalprice double,"
        " o_orderdate timestamp, o_orderpriority string",
    )


def test_scd2_intervals_change_history(spark):
    import datetime

    d = datetime.datetime
    orders = _orders(
        spark,
        [
            (1, 7, 10.0, d(2020, 1, 1), "LOW"),
            (2, 7, 10.0, d(2020, 2, 1), "LOW"),
            (3, 7, 10.0, d(2020, 3, 1), "HIGH"),
            (4, 7, 10.0, d(2020, 4, 1), "LOW"),
        ],
    )
    got = sorted(
        rel.scd2_compressed(orders).collect(), key=lambda r: r.version
    )
    assert [
        (r.version, r.priority, r.n_orders, r.valid_from, r.valid_to)
        for r in got
    ] == [
        (1, "LOW", 2, "2020-01-01", "2020-03-01"),
        (2, "HIGH", 1, "2020-03-01", "2020-04-01"),
        (3, "LOW", 1, "2020-04-01", None),
    ]


def test_scd2_same_day_ties_break_on_orderkey(spark):
    import datetime

    d = datetime.datetime
    orders = _orders(
        spark,
        [
            (2, 7, 10.0, d(2020, 1, 1), "HIGH"),
            (1, 7, 10.0, d(2020, 1, 1), "LOW"),
        ],
    )
    got = sorted(
        rel.scd2_compressed(orders).collect(), key=lambda r: r.version
    )
    assert [(r.version, r.priority) for r in got] == [(1, "LOW"), (2, "HIGH")]


def test_merge_apply_reconstructs_direct_snapshot(spark):
    """INSERT / UPDATE / DELETE / unchanged all present; the merged
    output must equal the newer snapshot computed directly."""
    import datetime

    d = datetime.datetime
    # c2 = 2020-12-31, c1 = c2-90d = 2020-10-02; window = 180 days.
    orders = _orders(
        spark,
        [
            # cust 1: active only in the OLD window -> DELETE
            (1, 1, 100.0, d(2020, 5, 1), "X"),
            # cust 2: active in both, changed (new order in gap) -> UPDATE
            (2, 2, 100.0, d(2020, 9, 1), "X"),
            (3, 2, 50.0, d(2020, 11, 1), "X"),
            # cust 3: active only in the NEW window -> INSERT
            (4, 3, 70.0, d(2020, 12, 1), "X"),
            # cust 4: one order inside BOTH windows -> unchanged
            (5, 4, 30.0, d(2020, 9, 15), "X"),
            # anchor for c2
            (6, 5, 10.0, d(2020, 12, 31), "X"),
        ],
    )
    got = {
        r.o_custkey: (r.n_orders, r.revenue)
        for r in rel.merge_apply_changes(orders).collect()
    }
    assert 1 not in got  # deleted
    assert got[2] == (2, 150.0)  # updated (both orders inside new window)
    assert got[3] == (1, 70.0)  # inserted
    assert got[4] == (1, 30.0)  # unchanged carried from base
    assert got[5] == (1, 10.0)


def test_target_encoding_excludes_own_fold(spark):
    import hashlib

    from hadoop_coded_wordcount_spark.operators import pipeline as pl

    def fold(ck):
        return (
            int(hashlib.md5(str(ck).encode()).hexdigest()[:13], 16) % 5
        )

    # two customers guaranteed in different folds
    a, b = 1, 2
    while fold(b) == fold(a):
        b += 1
    import datetime

    d = datetime.datetime
    orders = _orders(
        spark,
        [(1, a, 10.0, d(2020, 1, 1), "X"), (2, b, 30.0, d(2020, 1, 1), "X")],
    )
    customer = spark.createDataFrame(
        [(a, "SEG"), (b, "SEG")], "c_custkey bigint, c_mktsegment string"
    )
    got = {
        r.fold: r for r in pl.target_encoding(orders, customer).collect()
    }
    # each fold's encoding is the OTHER fold's mean
    assert got[fold(a)].oof_mean == 30.0
    assert got[fold(b)].oof_mean == 10.0
    assert got[fold(a)].fold_mean == 10.0


def test_subsample_ci_matches_python_replay(spark):
    import datetime
    import hashlib
    from decimal import Decimal

    from hadoop_coded_wordcount_spark.operators import mleval as ml

    d = datetime.datetime
    rows = [
        (k, 1, float(100 + 7 * k), d(2020, 1, 1), "X") for k in range(1, 41)
    ]
    orders = _orders(spark, rows)
    got = ml.subsample_ci(orders, n_replicates=64).collect()[0]

    def member(k, b):
        h = hashlib.md5(f"{k}:{b}".encode()).hexdigest()[:13]
        return int(h, 16) % 2 == 0

    means = []
    for b in range(64):
        sel = [Decimal(f"{100 + 7 * k}.00") for k in range(1, 41) if member(k, b)]
        means.append((round(float(sum(sel)) / len(sel), 6), b))
    means.sort()
    assert got.n_replicates == 64
    assert got.ci_lo == means[1][0]  # rank 2 of 64
    assert got.ci_hi == means[62][0]  # rank 63 of 64
    assert got.point_mean == round(sum(100 + 7 * k for k in range(1, 41)) / 40, 6)


def test_association_rules_hand_baskets(spark):
    """Four baskets: {1,2} x2, {3,4}, {1,3}. Lift separates the tight
    (3,4) association (lift 2.0) from the popular-but-diluted (1,2)
    (lift 4/3); confidence is direction-sensitive."""
    lineitem = spark.createDataFrame(
        [(10, 1), (10, 2), (11, 1), (11, 2), (12, 3), (12, 4), (13, 1), (13, 3)],
        "l_orderkey bigint, l_partkey bigint",
    )
    got = {
        (r.antecedent, r.consequent): r
        for r in rel.association_rules(lineitem, min_support=1).collect()
    }
    assert got[(2, 1)].confidence == 1.0
    assert got[(1, 2)].confidence == 0.666667
    assert got[(1, 2)].lift == got[(2, 1)].lift == 1.333333
    assert got[(3, 4)].lift == got[(4, 3)].lift == 2.0
    assert got[(3, 4)].confidence == 0.5 and got[(4, 3)].confidence == 1.0
    # ordering: highest lift first, ties by antecedent
    first = min(got.values(), key=lambda r: (-r.lift, r.antecedent, r.consequent))
    assert (first.antecedent, first.consequent) == (3, 4)


def test_watermark_lateness_hand_arrivals(spark):
    """Arrival order (event_id) vs event time: event 3 arrives 2 min
    late behind the high-water mark set by event 2."""
    import datetime

    from hadoop_coded_wordcount_spark.operators import relational as rel

    d = datetime.datetime
    ev = spark.createDataFrame(
        [
            (1, d(2024, 1, 1, 10, 0), 7, "view", 0.0, ""),
            (2, d(2024, 1, 1, 10, 10), 7, "view", 0.0, ""),
            (3, d(2024, 1, 1, 10, 8), 7, "view", 0.0, ""),  # 120 s late
            (4, d(2024, 1, 1, 10, 11), 7, "view", 0.0, ""),
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    got = {
        r.delay_sec: r
        for r in rel.watermark_lateness(ev, delays_sec=(0, 60, 300)).collect()
    }
    assert got[0].n_dropped == 1 and got[0].max_late_sec == 120
    assert got[60].n_dropped == 1  # 120 > 60
    assert got[300].n_dropped == 0  # within a 5-minute watermark
    assert got[0].frac_dropped == 0.25


def test_seasonal_decompose_recovers_planted_pattern(spark):
    """A flat level 10 with +5 bumps at hour 6 over several days: the
    trend hovers near the mixed mean, the hour-6 seasonal index is
    positive and the largest, and decomposition is additive
    (x == trend + seasonal + residual wherever all parts exist)."""
    import datetime

    from hadoop_coded_wordcount_spark.operators import relational as rel

    d = datetime.datetime
    rows = []
    eid = 0
    for day in range(1, 6):
        for hour in range(24):
            n = 10 + (5 if hour == 6 else 0)
            for _ in range(n):
                rows.append(
                    (eid, d(2024, 1, day, hour), 7, "view", 0.0, "")
                )
                eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    out = rel.seasonal_decompose(ev).collect()
    seas = {}
    for r in out:
        hod = int(r.hour_ts[11:13])
        if r.seasonal is not None:
            seas[hod] = r.seasonal
        if r.trend is not None and r.seasonal is not None:
            assert abs(r.x - (r.trend + r.seasonal + r.residual)) < 1e-6
    assert max(seas, key=seas.get) == 6
    assert seas[6] > 3  # the planted +5 bump, minus MA smearing


def test_clamped_balance_reflection_identity(spark):
    """Deltas +5, -10, +3 for one supplier: a naive prefix sum would go
    negative; the clamp floors it at zero (bal path 5, 0, 3), which the
    reflection identity must reproduce exactly."""
    import datetime

    from hadoop_coded_wordcount_spark.operators import relational as rel

    d = datetime.datetime
    lineitem = spark.createDataFrame(
        [
            # (orderkey, suppkey, linenumber, qty, returnflag, shipdate)
            (1, 9, 1, 5.0, "R", d(2020, 1, 1)),
            (2, 9, 1, 10.0, "N", d(2020, 1, 2)),
            (3, 9, 1, 3.0, "R", d(2020, 1, 3)),
        ],
        "l_orderkey bigint, l_suppkey bigint, l_linenumber int,"
        " l_quantity double, l_returnflag string, l_shipdate timestamp",
    )
    r = rel.clamped_running_balance(lineitem).collect()[0]
    assert r.n_moves == 3
    assert r.final_balance == 3  # not -2: the drain was clamped
    assert r.peak_balance == 5
    assert r.n_stockout_drains == 1  # the -10 hit an empty shelf


def test_position_attribution_u_shape(spark):
    """Purchase of 10.0 with 4 touches on distinct dates: first and
    last get 4.0 each, the two middles 1.0 each; a single-touch path
    takes the full value."""
    import datetime

    from hadoop_coded_wordcount_spark.operators import relational as rel

    d = datetime.datetime
    rows = [
        (1, d(2024, 1, 10, 12), 7, "purchase", 10.0, ""),
        (2, d(2024, 1, 6, 1), 7, "click", 0.0, ""),
        (3, d(2024, 1, 7, 1), 7, "click", 0.0, ""),
        (4, d(2024, 1, 8, 1), 7, "click", 0.0, ""),
        (5, d(2024, 1, 9, 1), 7, "click", 0.0, ""),
        # second user: single touch
        (6, d(2024, 1, 10, 12), 8, "purchase", 6.0, ""),
        (7, d(2024, 1, 9, 2), 8, "click", 0.0, ""),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    got = {
        (r.click_date, r.position): r.attributed_revenue
        for r in rel.position_attribution(ev).collect()
    }
    assert got[("2024-01-06", "first")] == 4.0
    assert got[("2024-01-09", "last")] == 4.0
    assert got[("2024-01-07", "middle")] == 1.0
    assert got[("2024-01-08", "middle")] == 1.0
    assert got[("2024-01-09", "first")] == 6.0  # single touch, user 8
    assert abs(sum(got.values()) - 16.0) < 1e-9  # mass conserved


def test_overdispersion_separates_poisson_from_bursty(spark):
    """A constant-rate stream has variance 0 (fano 0, underdispersed);
    an alternating 0/20 stream is strongly overdispersed."""
    import datetime

    from hadoop_coded_wordcount_spark.operators import relational as rel

    d = datetime.datetime
    rows = []
    eid = 0
    for h in range(24):
        for _ in range(5):  # 'steady': exactly 5/hour
            rows.append((eid, d(2024, 1, 1, h), 1, "steady", 0.0, ""))
            eid += 1
        n_bursty = 35 if h % 2 == 0 else 5  # alternating burst/lull
        for _ in range(n_bursty):
            rows.append((eid, d(2024, 1, 1, h), 1, "bursty", 0.0, ""))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    got = {r.event_type: r for r in rel.overdispersion_index(ev).collect()}
    assert got["steady"].fano == 0.0
    assert not got["steady"].is_overdispersed
    assert got["bursty"].is_overdispersed and got["bursty"].fano > 1


def _orders_prices(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderkey bigint, o_orderpriority string, o_totalprice double"
    )


def test_ks_test_disjoint_supports_give_d_one(spark):
    """High-priority prices all below, low all above: ECDFs separate
    completely at the boundary, so D = 1 exactly."""
    rows = [(i, "1-URGENT", float(i)) for i in range(1, 5)] + [
        (i, "5-LOW", float(100 + i)) for i in range(1, 5)
    ]
    got = rel.ks_test(_orders_prices(spark, rows)).collect()[0]
    assert (got.n1, got.n2) == (4, 4)
    assert got.d_num == 16 and got.ks_d == 1.0


def test_ks_test_identical_samples_give_d_zero(spark):
    """The same values in both groups: the lattice difference
    cum1*n2 - cum2*n1 is 0 at every step."""
    rows = [(i, "1-URGENT", float(i % 3)) for i in range(3)] + [
        (10 + i, "5-LOW", float(i % 3)) for i in range(3)
    ]
    got = rel.ks_test(_orders_prices(spark, rows)).collect()[0]
    assert got.d_num == 0 and got.ks_d == 0.0 and got.p_approx == 2.0


def test_mann_whitney_hand_ranks(spark):
    """g1 = {1,2}, g2 = {3,4}: R1 = 1+2 = 3, U1 = 3 - 3 = 0, so
    2*U1 = 0; z = (0 - 4)/(2*sqrt(4*5/12)) = -2/sqrt(5/3)."""
    rows = [
        (1, "1-URGENT", 1.0),
        (2, "1-URGENT", 2.0),
        (3, "5-LOW", 3.0),
        (4, "5-LOW", 4.0),
    ]
    got = rel.mann_whitney_u(_orders_prices(spark, rows)).collect()[0]
    assert (got.n1, got.n2, got.u1_x2) == (2, 2, 0)
    assert got.z == round(-4 / (2 * (2 * 2 / 12 * 5) ** 0.5), 6)


def test_mann_whitney_all_tied_u_is_half(spark):
    """Every value equal: average ranks make R1 = n1*(n+1)/2, so
    2*U1 = n1*n2 exactly (U at its null mean)."""
    rows = [(i, "1-URGENT", 7.0) for i in range(2)] + [
        (10 + i, "5-LOW", 7.0) for i in range(3)
    ]
    got = rel.mann_whitney_u(_orders_prices(spark, rows)).collect()[0]
    assert got.u1_x2 == 2 * 3  # == n1*n2 -> numerator of z is 0


def test_acf_alternating_series_is_minus_one_at_lag_one(spark):
    """A strict two-state alternation has r1 = -1, r2 = +1 (up to the
    truncated-endpoint correction; with 8 full periods the planted signs
    dominate)."""
    rows = []
    for t in range(16):
        n_ev = 3 if t % 2 == 0 else 1
        for j in range(n_ev):
            rows.append(
                (t * 10 + j, f"2024-01-01 {t:02d}:15:00", 1, "view", 1.0)
            )
    events = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.lag: r.acf for r in rel.acf_hourly_counts(events, max_lag=2).collect()}
    # exact rational: sum of u_t*u_{t+k} over truncated series / sum u^2
    assert got[1] == round(-15 / 16, 6)
    assert got[2] == round(14 / 16, 6)


def test_acf_zero_fills_missing_hours(spark):
    """A gap hour enters the grid as x=0 rather than being skipped:
    series (2,_,2) over 3 hours -> mean 4/3, u = (2,-4,2)*3."""
    rows = [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 00:30:00"),
            (3, "2024-01-01 02:00:00"), (4, "2024-01-01 02:30:00")]
    events = spark.createDataFrame(
        rows, "event_id bigint, ts string"
    ).withColumn("ts", F.to_timestamp("ts")).select(
        "event_id", "ts", F.lit(1).alias("user_id"),
        F.lit("view").alias("event_type"), F.lit(1.0).alias("value")
    )
    got = {r.lag: r.acf for r in rel.acf_hourly_counts(events, max_lag=1).collect()}
    # u = (2, -4, 2): r1 = (2*-4 + -4*2)/(4+16+4) = -16/24
    assert got[1] == round(-16 / 24, 6)


def test_sprt_crosses_up_on_pure_successes(spark):
    """All purchases: llr climbs by 0.470004/trial and crosses ln(19)
    at trial 7 (7*0.470004 = 3.290028 >= 2.944439)."""
    events = _events(
        spark,
        [(i, None, 1, "purchase", 1.0) for i in range(1, 10)],
    ).withColumn("ts", F.to_timestamp(F.lit("2024-01-01")))
    got = rel.sprt_conversion(events).collect()[0]
    assert got.decision == "accept_h1"
    assert got.n_at_decision == 7 and got.succ_at_decision == 7
    assert got.n_total == 9


def test_sprt_no_decision_on_short_mixed_stream(spark):
    """Too few trials to cross either boundary: explicit no_decision
    row with NULL decision point, not an empty frame."""
    events = _events(
        spark,
        [(1, None, 1, "purchase", 1.0), (2, None, 1, "view", 1.0)],
    ).withColumn("ts", F.to_timestamp(F.lit("2024-01-01")))
    got = rel.sprt_conversion(events).collect()
    assert len(got) == 1
    assert got[0].decision == "no_decision"
    assert got[0].decision_event is None and got[0].n_total == 2


def test_gap_fill_interp_linear_between_anchors(spark):
    """Anchors at hours 0 and 3 with values 1.0 and 4.0: hours 1, 2
    interpolate to 2.0, 3.0; no edge rows inside the span."""
    events = _events(
        spark,
        [
            (1, None, 7, "view", 1.0),
            (2, None, 7, "view", 4.0),
        ],
    ).withColumn(
        "ts",
        F.when(F.col("event_id") == 1, F.to_timestamp(F.lit("2024-01-01 00:10:00")))
        .otherwise(F.to_timestamp(F.lit("2024-01-01 03:20:00"))),
    )
    got = {r.hr.hour: r for r in rel.gap_fill_interp(events).collect()}
    assert got[0].fill_kind == "obs" and got[0].v_filled == 1.0
    assert got[1].fill_kind == "interp" and got[1].v_filled == 2.0
    assert got[2].fill_kind == "interp" and got[2].v_filled == 3.0
    assert got[3].fill_kind == "obs" and got[3].v_filled == 4.0


def test_gap_fill_interp_edges_stay_null(spark):
    """Two users sharing a global grid: user 8 has one event in the
    middle hour, so its other grid hours are edges with NULL fill."""
    events = _events(
        spark,
        [
            (1, None, 7, "view", 1.0),
            (2, None, 7, "view", 2.0),
            (3, None, 8, "view", 9.0),
        ],
    ).withColumn(
        "ts",
        F.when(F.col("event_id") == 1, F.to_timestamp(F.lit("2024-01-01 00:00:00")))
        .when(F.col("event_id") == 2, F.to_timestamp(F.lit("2024-01-01 02:00:00")))
        .otherwise(F.to_timestamp(F.lit("2024-01-01 01:00:00"))),
    )
    got = {(r.user_id, r.hr.hour): r for r in rel.gap_fill_interp(events).collect()}
    assert got[(8, 0)].fill_kind == "edge" and got[(8, 0)].v_filled is None
    assert got[(8, 1)].fill_kind == "obs" and got[(8, 1)].v_filled == 9.0
    assert got[(8, 2)].fill_kind == "edge"
    assert got[(7, 1)].fill_kind == "interp" and got[(7, 1)].v_filled == 1.5


def test_quantile_normalize_identical_sources_zero_shift(spark):
    """Two sources with identical length distributions: every bin's
    reference equals the source mean -> shift 0 everywhere."""
    from hadoop_coded_wordcount_spark.operators import pipeline as pl
    rows = [(i, "x", "en", "a", 10 * (i % 5)) for i in range(10)] + [
        (100 + i, "x", "en", "b", 10 * (i % 5)) for i in range(10)
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    got = pl.quantile_normalize_sources(docs, n_bins=5).collect()
    assert len(got) == 10
    assert all(r.shift == 0.0 for r in got)


def test_quantile_normalize_shift_direction(spark):
    """Source b is uniformly 100 chars longer: its shift is -100 .. 0
    ... exactly -50 per bin against the cross-source mean."""
    from hadoop_coded_wordcount_spark.operators import pipeline as pl
    rows = [(i, "x", "en", "a", 100 + i) for i in range(10)] + [
        (100 + i, "x", "en", "b", 200 + i) for i in range(10)
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    got = pl.quantile_normalize_sources(docs, n_bins=5).collect()
    for r in got:
        assert r.shift == (50.0 if r.source == "a" else -50.0)


def test_dq_rule_battery_flags_planted_violations(spark):
    from hadoop_coded_wordcount_spark.operators import pipeline as pl
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 50.0, "2024-01-01", "1-URGENT"),
            (1, 11, "F", -5.0, "2024-01-01", "1-URGENT"),  # dup key, bad price
            (2, None, "X", 60.0, "1980-01-01", "1-URGENT"),  # null fk, bad status, stale
        ],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    lineitem = spark.createDataFrame(
        [(1, 5.0, 0.1), (99, 200.0, 1.5)],  # orphan with bad qty+disc
        "l_orderkey bigint, l_quantity double, l_discount double",
    )
    got = {r.rule: r for r in pl.dq_rule_battery(orders, lineitem).collect()}
    assert got["orders.custkey_not_null"].n_violations == 1
    assert got["orders.totalprice_in_range"].n_violations == 1
    assert got["orders.status_in_domain"].n_violations == 1
    assert got["orders.orderkey_unique"].n_violations == 1
    assert got["orders.orderdate_fresh"].n_violations == 1
    assert got["lineitem.quantity_in_range"].n_violations == 1
    assert got["lineitem.discount_in_range"].n_violations == 1
    assert got["lineitem.orderkey_fk"].n_violations == 1
    assert not got["lineitem.orderkey_fk"]["pass"]


def test_holt_winters_constant_series_is_flat(spark):
    """A constant daily series: level = const, trend = 0, every season
    component 0, forecast = const — for every day past the first
    season; the first 6 days carry NULL state."""
    rows = []
    eid = 0
    for d in range(1, 15):
        for _ in range(5):
            eid += 1
            rows.append((eid, f"2024-01-{d:02d} 10:00:00", 1, "view", 1.0))
    events = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.day: r for r in rel.holt_winters_daily(events).collect()}
    assert got["2024-01-03"].level is None
    for d in range(7, 15):
        r = got[f"2024-01-{d:02d}"]
        assert (r.level, r.trend, r.season_next, r.forecast_next) == (
            5.0, 0.0, 0.0, 5.0
        )


def test_holt_winters_tracks_planted_weekly_season(spark):
    """Two identical weeks with a day-2 spike: by the end of week 2 the
    one-step forecast for the next day-2 carries a positive seasonal
    component (it learned the spike's phase)."""
    rows = []
    eid = 0
    for d in range(1, 15):
        n = 9 if d % 7 == 2 else 3
        for _ in range(n):
            eid += 1
            rows.append((eid, f"2024-01-{d:02d} 10:00:00", 1, "view", 1.0))
    events = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.day: r for r in rel.holt_winters_daily(events).collect()}
    # day 9 (phase 2) is a spike day: the state after day 8 predicts it
    # with the learned positive seasonal component s_2 = y_2 - y_7 = 6
    r = got["2024-01-08"]
    assert r.season_next == 6.0
    assert r.forecast_next > r.level


def test_permutation_test_strong_effect_rejects(spark):
    """Disjoint price supports: the observed gap tops every relabeled
    gap, so p = 1/(R+1) exactly."""
    rows = [(i, "1-URGENT", 1000.0 + i) for i in range(20)] + [
        (100 + i, "5-LOW", 1.0 + i) for i in range(20)
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey bigint, o_orderpriority string, o_totalprice double"
    )
    got = rel.permutation_test_price(orders).collect()[0]
    assert (got.n1, got.n2, got.n_reps) == (20, 20, 64)
    assert got.p_value == round((got.n_extreme + 1) / 65, 6)
    assert got.p_value <= round(5 / 65, 6)  # at most a few flukes


def test_permutation_test_null_effect_accepts(spark):
    """Identical distributions in both groups: the observed gap is
    ~zero and relabelings beat it often — p lands high."""
    rows = [(i, "1-URGENT", float(100 + i % 10)) for i in range(20)] + [
        (100 + i, "5-LOW", float(100 + i % 10)) for i in range(20)
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey bigint, o_orderpriority string, o_totalprice double"
    )
    got = rel.permutation_test_price(orders).collect()[0]
    assert got.obs_diff == 0.0
    assert got.p_value == 1.0  # every |rep diff| >= 0


def _orders_did(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderkey bigint, o_orderpriority string, o_totalprice double, o_orderdate string"
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))


def test_diff_in_diff_parallel_trends_give_zero(spark):
    """Both groups shift +10 across the boundary: the shared trend
    cancels, DiD = 0."""
    rows = []
    k = 0
    for pri, base in [("1-URGENT", 100.0), ("5-LOW", 50.0)]:
        for date, bump in [("1997-06-01", 0.0), ("1998-06-01", 10.0)]:
            for i in range(5):
                k += 1
                rows.append((k, pri, base + bump + i, date))
    got = rel.diff_in_diff(_orders_did(spark, rows)).collect()[0]
    assert got.did == 0.0
    assert got.mean_treat_post - got.mean_treat_pre == 10.0


def test_diff_in_diff_recovers_planted_effect(spark):
    """Treated group gains an extra +7 beyond the shared +10 trend."""
    rows = []
    k = 0
    for pri, base, extra in [("1-URGENT", 100.0, 7.0), ("5-LOW", 50.0, 0.0)]:
        for date, bump in [("1997-06-01", 0.0), ("1998-06-01", 10.0)]:
            for i in range(4):
                k += 1
                rows.append((k, pri, base + bump + (bump and extra) + i, date))
    got = rel.diff_in_diff(_orders_did(spark, rows)).collect()[0]
    assert got.did == 7.0


def test_item_item_cosine_popularity_normalization(spark):
    """Pairs with equal co-occurrence: the one between NICHE parts
    outranks the one between popular parts."""
    rows = []
    # parts 1,2 co-occur 3x and appear ONLY together (cos = 1)
    for o in (10, 11, 12):
        rows += [(o, 1), (o, 2)]
    # parts 3,4 co-occur 3x but each also appears alone 6x
    for o in (20, 21, 22):
        rows += [(o, 3), (o, 4)]
    for o in range(30, 36):
        rows.append((o, 3))
    for o in range(40, 46):
        rows.append((o, 4))
    li = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")
    got = {(r.part_a, r.part_b): r.cosine for r in rel.item_item_cosine(li).collect()}
    assert got[(1, 2)] == 1.0
    assert got[(3, 4)] == round(3 / 9, 6)


def test_jarque_bera_symmetric_vs_skewed(spark):
    """A symmetric quantity distribution has skewness 0; planting a
    heavy right tail drives skewness and the JB statistic up."""
    sym = [(i, "S", float(1 + i % 5)) for i in range(200)]
    skw = [(i, "K", 1.0 if i % 10 else 50.0) for i in range(200)]
    li = spark.createDataFrame(
        sym + skw, "l_orderkey bigint, l_returnflag string, l_quantity double"
    )
    got = {r.l_returnflag: r for r in rel.jarque_bera(li).collect()}
    assert got["S"].skewness == 0.0
    assert got["K"].skewness > 2.0
    assert got["K"].jb_stat > got["S"].jb_stat


def test_ipw_ate_recovers_within_stratum_effect(spark):
    """Confounded marginals (treatment concentrates in the high-value
    stratum) but a constant +5 within-stratum effect: the stratified
    ATE is exactly 5 while the naive pooled gap is inflated."""
    rows = []
    k = 0
    # stratum A: base 100, 3 treated / 1 control
    for pri in ["1-URGENT"] * 3 + ["5-LOW"]:
        k += 1
        rows.append((k, 1, pri, 100.0 + (5.0 if pri == "1-URGENT" else 0.0)))
    # stratum B: base 10, 1 treated / 3 control
    for pri in ["1-URGENT"] + ["5-LOW"] * 3:
        k += 1
        rows.append((k, 2, pri, 10.0 + (5.0 if pri == "1-URGENT" else 0.0)))
    orders = spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_orderpriority string, o_totalprice double"
    )
    customer = spark.createDataFrame(
        [(1, "A"), (2, "B")], "c_custkey bigint, c_mktsegment string"
    )
    got = {r.c_mktsegment: r for r in rel.ipw_ate(orders, customer).collect()}
    assert got["A"].gap == 5.0 and got["B"].gap == 5.0
    assert got["__ate__"].weighted_term == 5.0
    assert got["A"].propensity == 0.75 and got["B"].propensity == 0.25


def test_markov_eval_learns_deterministic_chain(spark):
    """Train users alternate view->click strictly; test users follow
    the same rule -> accuracy 1.0 for both states."""
    rows = []
    eid = 0
    for u in (2, 4, 3, 5):  # two train (even), two test (odd)
        for t in range(6):
            eid += 1
            et = "view" if t % 2 == 0 else "click"
            rows.append((eid, f"2024-01-01 00:{t:02d}:00", u, et, 1.0))
    events = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.cur: r for r in rel.markov_next_event_eval(events).collect()}
    assert got["view"].pred == "click" and got["view"].accuracy == 1.0
    assert got["click"].pred == "view" and got["click"].accuracy == 1.0


def test_markov_eval_unseen_state_uses_fallback(spark):
    """A current state absent from training predicts the train-majority
    next type instead of dropping the pair."""
    rows = [
        # train user 2: view -> click -> view
        (1, "2024-01-01 00:00:00", 2, "view", 1.0),
        (2, "2024-01-01 00:01:00", 2, "click", 1.0),
        (3, "2024-01-01 00:02:00", 2, "view", 1.0),
        # test user 1: error (unseen cur) -> click
        (4, "2024-01-01 00:00:00", 1, "error", 1.0),
        (5, "2024-01-01 00:01:00", 1, "click", 1.0),
    ]
    events = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.cur: r for r in rel.markov_next_event_eval(events).collect()}
    # train nxt counts: click 1, view 1 -> tie broken to 'click'
    assert got["error"].pred == "click"
    assert got["error"].n_correct == 1


def test_forecast_eval_mase_perfect_seasonal_series(spark):
    """A strict weekly pattern: the seasonal-naive forecast is exact
    (MAE 0) while HW's warm-up error is positive, so eval rows exist
    and the naive MAE lower-bounds the comparison... on a noisy series
    (spike every 3rd day breaks the weekly phase) the HW model must
    beat naive: mase < 1."""
    rows = []
    eid = 0
    for d in range(1, 29):
        n = 4 + (3 if d % 7 == 0 else 0)
        for _ in range(n):
            eid += 1
            rows.append((eid, f"2024-01-{d:02d} 09:00:00", 1, "view", 1.0))
    events = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = rel.forecast_eval_mase(events).collect()[0]
    # weekly-exact series: naive is perfect from day 8 on
    assert got.mae_naive == 0.0
    assert got.n_eval == 21


def test_hit_rate_counts_recoverable_baskets(spark):
    """Parts 1,2 co-occur in every train basket: any test basket {1,2}
    is a guaranteed hit; a test basket with a never-seen pairing
    cannot hit. Output stays a single exact-ratio row."""
    rows = []
    # enough train baskets that some orderkeys land in folds 0-3
    for o in range(1, 60):
        rows += [(o, 1), (o, 2)]
    li = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")
    got = rel.hit_rate_at_k(li).collect()[0]
    # every test basket is {1,2}: holdout 2, query 1 -> neighbor hit
    assert got.n_baskets > 0
    assert got.n_hits == got.n_baskets and got.hit_rate == 1.0


def test_funnel_significance_planted_gap(spark):
    """Cohort A sessions always click after view; cohort B never does:
    rates 1.0 vs 0.0 and a strongly positive z."""
    rows = []
    eid = 0
    for u in (2, 4, 6, 8, 1, 3, 5, 7):
        for s in range(3):
            eid += 1
            rows.append((eid, f"2024-01-0{s+1} 10:00:00", u, "view", 1.0))
            if u % 2 == 0:
                eid += 1
                rows.append((eid, f"2024-01-0{s+1} 10:05:00", u, "click", 1.0))
    events = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.transition: r for r in rel.funnel_significance(events).collect()}
    r = got["view->click"]
    assert (r.rate_a, r.rate_b) == (1.0, 0.0)
    assert (r.n1, r.n2) == (12, 12)
    assert r.z > 4
    # no session reaches click in cohort B -> purchase step still emits
    assert got["click->purchase"].n2 == 0


def test_mde_power_shrinks_with_sample_size(spark):
    """Doubling the cohort sizes must shrink the detectable effect by
    ~1/sqrt(2) at the same baseline rate."""
    def mk(n_users):
        rows = []
        eid = 0
        for u in range(n_users):
            eid += 1
            et = "purchase" if u % 5 == 0 else "view"
            rows.append((eid, "2024-01-01 10:00:00", u, et, 1.0))
        return spark.createDataFrame(
            rows, "event_id bigint, ts string, user_id bigint, event_type string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))

    small = rel.mde_power_analysis(mk(100)).collect()[0]
    big = rel.mde_power_analysis(mk(200)).collect()[0]
    assert small.baseline_rate == big.baseline_rate == 0.2
    assert big.mde_abs < small.mde_abs
    assert abs(big.mde_abs / small.mde_abs - 2 ** -0.5) < 0.01


def test_hhi_monopoly_vs_uniform(spark):
    """One-supplier nation: HHI = 10000, effective competitors 1; a
    4-equal-supplier nation: HHI = 2500, effective competitors 4."""
    li = spark.createDataFrame(
        [(1, 100.0, 0.0)] + [(10 + s, 25.0, 0.0) for s in range(4)],
        "l_suppkey bigint, l_extendedprice double, l_discount double",
    )
    supplier = spark.createDataFrame(
        [(1, 1)] + [(10 + s, 2) for s in range(4)],
        "s_suppkey bigint, s_nationkey bigint",
    )
    nation = spark.createDataFrame(
        [(1, "MONO"), (2, "QUAD")], "n_nationkey bigint, n_name string"
    )
    got = {r.n_name: r for r in
           rel.market_concentration_hhi(li, supplier, nation).collect()}
    assert got["MONO"].hhi == 10000.0
    assert got["MONO"].effective_competitors == 1.0
    assert got["QUAD"].hhi == 2500.0
    assert got["QUAD"].effective_competitors == 4.0


def test_retention_decay_recovers_planted_halving(spark):
    """A cohort that halves every month: ln r = -ln2 * age exactly, so
    the fitted decay is -ln2 and the half-life is 1 month."""
    rows = []
    k = 0
    n0 = 32
    for age in range(5):
        active = n0 >> age  # 32,16,8,4,2
        for c in range(active):
            k += 1
            rows.append((k, c, f"2020-{1 + age:02d}-10"))
    orders = spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_orderdate string"
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    got = rel.retention_decay_fit(orders).collect()[0]
    import math
    assert got.n_points == 5
    assert abs(got.decay_rate - (-math.log(2))) < 1e-5
    assert abs(got.half_life_months - 1.0) < 1e-4


def test_burstiness_metronome_vs_bursty(spark):
    """Equal gaps -> sigma=0 -> B=-1; a heavy-tailed gap mix pushes B
    positive; a single-gap user is excluded."""
    rows = []
    eid = 0
    # user 1: metronome, 5 events 60s apart
    for t in range(5):
        eid += 1
        rows.append((eid, f"2024-01-01 10:{t:02d}:00", 1, "view", 1.0))
    # user 2: bursty -- gaps 1,1,1,3600 seconds
    for t, sec in enumerate([0, 1, 2, 3, 3603]):
        eid += 1
        rows.append((eid, None, 2, "view", 1.0))
        rows[-1] = (eid, f"2024-01-01 {10 + sec // 3600:02d}:{(sec % 3600) // 60:02d}:{sec % 60:02d}", 2, "view", 1.0)
    # user 3: one event only -> excluded
    eid += 1
    rows.append((eid, "2024-01-01 10:00:00", 3, "view", 1.0))
    events = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.user_id: r for r in rel.user_burstiness(events).collect()}
    assert set(got) == {1, 2}
    assert got[1].burstiness == -1.0 and got[1].cv == 0.0
    assert got[2].burstiness > 0.2  # (cv-1)/(cv+1) with cv=1.73


def test_xcorr_planted_lead(spark):
    """y is x shifted one hour later: the cross-correlation peaks at
    lag +1 (x leads y) and is lower at lag 0."""
    rows = []
    eid = 0
    for t in range(20):
        n_err = 5 if t % 3 == 0 else 1
        for _ in range(n_err):
            eid += 1
            rows.append((eid, f"2024-01-01 {t:02d}:10:00", 1, "error", 1.0))
    for t in range(20):
        src = t - 1
        n_p = 5 if src >= 0 and src % 3 == 0 else 1
        for _ in range(n_p):
            eid += 1
            rows.append((eid, f"2024-01-01 {t:02d}:40:00", 2, "purchase", 1.0))
    events = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.lag: r.xcorr for r in rel.cross_correlation_types(events).collect()}
    assert got[1] == max(got.values())
    assert got[1] > 0.8 and got[1] > got[0]


def test_time_to_convert_hand_gaps(spark):
    """3 viewers, 2 convert with gaps 60s and 180s; pre-view purchases
    don't count; percentiles interpolate the 2-point set."""
    rows = [
        # user 1: view at t0, purchase 60s later
        (1, "2024-01-01 10:00:00", 1, "view", 1.0),
        (2, "2024-01-01 10:01:00", 1, "purchase", 1.0),
        # user 2: purchase BEFORE view (ignored), then +180s after view
        (3, "2024-01-01 09:00:00", 2, "purchase", 1.0),
        (4, "2024-01-01 10:00:00", 2, "view", 1.0),
        (5, "2024-01-01 10:03:00", 2, "purchase", 1.0),
        # user 3: view only
        (6, "2024-01-01 10:00:00", 3, "view", 1.0),
        # user 4: purchase only -> not a viewer
        (7, "2024-01-01 10:00:00", 4, "purchase", 1.0),
    ]
    events = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = rel.time_to_convert(events).collect()[0]
    assert (got.n_viewers, got.n_converted) == (3, 2)
    assert got.conversion_rate == round(2 / 3, 6)
    assert got.p50_s == 120.0  # midpoint of {60, 180}
    assert got.p90_s == round(60 + 0.9 * 120, 6)


def test_price_elasticity_planted_slope(spark):
    """Parts engineered on an exact log-log line with slope -2: the
    regression recovers elasticity -2 with r2 = 1 (up to 6-dp term
    rounding); a 2-part brand is excluded."""
    import math
    rows = []
    part_rows = []
    for i, price in enumerate([10.0, 20.0, 40.0, 80.0]):
        pk = i + 1
        part_rows.append((pk, "ELASTIC"))
        # one line per part, fractional quantity exactly on the curve
        rows.append((pk, math.exp(10) / price ** 2, price))
    part_rows += [(100, "TINY"), (101, "TINY")]
    rows += [(100, 1.0, 5.0), (101, 1.0, 6.0)]
    li = spark.createDataFrame(
        rows, "l_partkey bigint, l_quantity double, l_extendedprice double"
    )
    part = spark.createDataFrame(part_rows, "p_partkey bigint, p_brand string")
    got = {r.p_brand: r for r in rel.price_elasticity(li, part).collect()}
    assert set(got) == {"ELASTIC"}
    assert abs(got["ELASTIC"].elasticity + 2.0) < 0.01
    assert got["ELASTIC"].r2 > 0.999


def test_npv_discounts_by_month_age(spark):
    """Two orders: month 0 at 100 and month 1 at 100 -> NPV = 100 +
    95; a single-order customer has ratio exactly 1."""
    orders = spark.createDataFrame(
        [
            (1, 1, 100.0, "2020-01-15"),
            (2, 1, 100.0, "2020-02-15"),
            (3, 2, 50.0, "2020-03-01"),
        ],
        "o_orderkey bigint, o_custkey bigint, o_totalprice double, o_orderdate string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    customer = spark.createDataFrame(
        [(1, "A"), (2, "B")], "c_custkey bigint, c_mktsegment string"
    )
    got = {r.c_mktsegment: r for r in rel.npv_clv(orders, customer).collect()}
    assert got["A"].avg_revenue == 200.0
    assert got["A"].avg_npv == 195.0
    assert got["B"].discount_ratio == 1.0


def test_spearman_monotone_nonlinear_is_one(spark):
    """y = x^3 (monotone, nonlinear): Spearman 1.0 exactly; reversing
    the order gives -1."""
    up = [(i, "U", float(i), float(i) ** 3) for i in range(1, 21)]
    dn = [(100 + i, "D", float(i), -(float(i) ** 3)) for i in range(1, 21)]
    li = spark.createDataFrame(
        up + dn,
        "l_orderkey bigint, l_returnflag string, l_quantity double, l_extendedprice double",
    )
    got = {r.l_returnflag: r.spearman_rho
           for r in rel.spearman_correlation(li).collect()}
    assert got["U"] == 1.0 and got["D"] == -1.0


def test_spearman_ties_average_ranks(spark):
    """All-x-tied input: rank variance 0 -> rho NULL (undefined), not a
    crash or a fake 0."""
    li = spark.createDataFrame(
        [(i, "T", 5.0, float(i)) for i in range(5)],
        "l_orderkey bigint, l_returnflag string, l_quantity double, l_extendedprice double",
    )
    got = rel.spearman_correlation(li).collect()
    assert got[0].spearman_rho is None


def test_rd_detects_planted_jump(spark):
    """Below the cutoff priority is rare (1 in 5), above it common
    (4 in 5): the RD jump recovers ~+0.6 at the boundary."""
    rows = []
    k = 0
    for i in range(200):
        price = 100000.0 + i * 245.0  # left side, stays below the cutoff
        k += 1
        rows.append((k, "1-URGENT" if i % 5 == 0 else "5-LOW", price))
    for i in range(200):
        price = 150000.0 + i * 245.0  # right side
        k += 1
        rows.append((k, "5-LOW" if i % 5 == 0 else "1-URGENT", price))
    orders = spark.createDataFrame(
        rows, "o_orderkey bigint, o_orderpriority string, o_totalprice double"
    )
    got = rel.regression_discontinuity(orders).collect()[0]
    assert got.n_left == 200 and got.n_right == 200
    assert 0.4 < got.rd_jump < 0.8


def test_cramers_v_perfect_association(spark):
    """Status fully determines priority: V = 1 for a square table."""
    rows = []
    for i in range(60):
        status = ["O", "F", "P"][i % 3]
        pri = {"O": "1-URGENT", "F": "3-MEDIUM", "P": "5-LOW"}[status]
        rows.append((i, status, pri))
    orders = spark.createDataFrame(
        rows, "o_orderkey bigint, o_orderstatus string, o_orderpriority string"
    )
    got = rel.cramers_v(orders).collect()[0]
    assert got.cramers_v == 1.0


def test_growth_accounting_hand_lifecycle(spark):
    """Customer A: months 0,1,3 (retained in 1, churn charged to 2,
    resurrected in 3). Customer B: month 1 only (new in 1, churn in
    2). Quick ratio NULL where churn is 0."""
    rows = [
        (1, 10, "2020-01-05"), (2, 10, "2020-02-05"), (3, 10, "2020-04-05"),
        (4, 20, "2020-02-10"),
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_orderdate string"
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    got = {r.m: r for r in rel.growth_accounting(orders).collect()}
    m0 = (2020 - 1995) * 12 + 0
    assert got[m0].n_new == 1 and got[m0].n_churned == 0
    assert got[m0].quick_ratio is None
    assert got[m0 + 1].n_new == 1 and got[m0 + 1].n_retained == 1
    assert got[m0 + 3].n_resurrected == 1 and got[m0 + 3].n_new == 0
    # month 2 has no active rows -> absent; its churn of 2 customers is
    # not reported (active-months-only contract, documented)
    assert (m0 + 2) not in got
    assert got[m0 + 3].n_churned == 0  # nobody active in m2 to churn


def test_dau_mau_bounds(spark):
    """A user active every day has stickiness contribution 1; one
    active a single day dilutes it: avg_dau=(2+1*1)/2... verify exact
    small case: 2 days, u1 both days, u2 day 1 only."""
    rows = [
        (1, "2024-01-01 10:00:00", 1), (2, "2024-01-02 10:00:00", 1),
        (3, "2024-01-01 11:00:00", 2),
    ]
    events = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint"
    ).withColumn("ts", F.to_timestamp("ts")).select(
        "event_id", "ts", "user_id", F.lit("view").alias("event_type"),
        F.lit(1.0).alias("value")
    )
    got = rel.dau_mau_stickiness(events).collect()[0]
    assert (got.n_days, got.mau) == (2, 2)
    assert got.avg_dau == 1.5
    assert got.stickiness == 0.75


def test_rank_movers_detects_swap(spark):
    """Two months, two parts swapping ranks, one new entrant: the
    mover list carries the swap and ranks the absent-month entrant
    from beyond the field."""
    rows = [
        # month m1: A=100, B=50 ; month m2: A=10, B=60, C=55
        (1, 1, 100.0, 0.0, "2001-06-15"),
        (2, 2, 50.0, 0.0, "2001-06-15"),
        (3, 1, 10.0, 0.0, "2001-07-15"),
        (4, 2, 60.0, 0.0, "2001-07-15"),
        (5, 3, 55.0, 0.0, "2001-07-15"),
    ]
    li = spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_partkey bigint, l_extendedprice double, l_discount double, l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    part = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "p_partkey bigint, p_name string"
    )
    got = {r.l_partkey: r for r in rel.rank_movers(li, part).collect()}
    assert got[1].rk_prev == 1 and got[1].rk_now == 3
    assert got[2].rk_prev == 2 and got[2].rk_now == 1
    assert got[3].rk_prev == 3 and got[3].rk_now == 2  # absent -> worst+1


def test_srm_flags_broken_randomizer(spark):
    """60/40 on 1000 users is a textbook SRM: chi2 = 40 >> 10.828."""
    rows = []
    eid = 0
    for u in range(1, 1201):
        # users 1..1200 odd/even would be 50/50; drop 200 odd users
        if u % 2 == 1 and u > 800:
            continue
        eid += 1
        rows.append((eid, "2024-01-01 10:00:00", u, "view", 1.0))
    events = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = rel.ab_srm_check(events).collect()[0]
    assert (got.n_a, got.n_b) == (600, 400)
    assert got.srm_chi2 == 40.0 and bool(got.srm_flag)


def test_quantile_shift_planted_tail_move(spark):
    """Post period shifts ONLY the upper tail (+100 on the top half):
    d_p10 = 0 while d_p90 = 100."""
    rows = []
    k = 0
    for i in range(100):
        k += 1
        rows.append((k, float(100 + i), "1997-06-01"))
    for i in range(100):
        k += 1
        v = 100 + i + (100.0 if i >= 50 else 0.0)
        rows.append((k, float(v), "1998-06-01"))
    orders = spark.createDataFrame(
        rows, "o_orderkey bigint, o_totalprice double, o_orderdate string"
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    got = rel.quantile_shift(orders).collect()[0]
    assert got.d_p10 == 0.0
    assert got.d_p90 == 100.0


def test_session_depth_hist_caps_tail(spark):
    """Sessions of depth 1, 3, and 14: the 14 lands in the cap-10
    bucket; shares sum to 1."""
    rows = []
    eid = 0
    for u, depth in [(1, 1), (2, 3), (3, 14)]:
        for t in range(depth):
            eid += 1
            rows.append((eid, f"2024-01-01 10:{t:02d}:00", u, "view", 1.0))
    events = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.depth_bucket: r for r in rel.session_depth_hist(events).collect()}
    assert set(got) == {1, 3, 10}
    assert got[10].n_sessions == 1
    assert abs(sum(r.share for r in got.values()) - 1.0) < 2e-6  # 6dp rounding


def test_rolling_7d_actives_dedups_across_window(spark):
    """A user active on days 1 and 3 counts ONCE in day-3's 7-day
    window; a user outside the trailing window drops out."""
    rows = [
        (1, "2024-01-01 10:00:00", 1),
        (2, "2024-01-03 10:00:00", 1),
        (3, "2024-01-01 10:00:00", 2),
        (4, "2024-01-09 10:00:00", 3),
    ]
    events = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint"
    ).withColumn("ts", F.to_timestamp("ts")).select(
        "event_id", "ts", "user_id", F.lit("view").alias("event_type"),
        F.lit(1.0).alias("value")
    )
    got = {r.day: r for r in rel.rolling_7d_actives(events).collect()}
    assert got["2024-01-03"].w7au == 2  # user 1 deduped, user 2 in window
    assert got["2024-01-09"].w7au == 2  # day 3 (user 1) still in, day 1 out
    assert got["2024-01-09"].days_in_window == 2


def test_p_chart_flags_planted_spike(spark):
    """9 calm days at 1% errors and one day at 50%: only the spike day
    crosses the 3-sigma limit."""
    rows = []
    eid = 0
    for d in range(1, 11):
        for i in range(100):
            eid += 1
            err = (i < 50) if d == 5 else (i < 1)
            rows.append(
                (eid, f"2024-01-{d:02d} 10:00:00", 1,
                 "error" if err else "view", 1.0)
            )
    events = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.day: r for r in rel.p_chart_errors(events).collect()}
    flagged = [d for d, r in got.items() if r.out_of_control]
    assert flagged == ["2024-01-05"]
    assert got["2024-01-05"].p_day == 0.5


def test_joint_histogram_shares_and_independence(spark):
    """Independent uniform bins: every cell share equals its expected
    share; shares sum to 1."""
    rows = []
    k = 0
    for qb in (5.0, 30.0):          # two qty bins
        for pr in (5000.0, 15000.0):  # two price bins
            for _ in range(10):
                k += 1
                rows.append((k, qb, pr))
    li = spark.createDataFrame(
        rows, "l_orderkey bigint, l_quantity double, l_extendedprice double"
    )
    got = rel.joint_histogram(li).collect()
    assert len(got) == 4
    assert all(r.share == r.expected_share == 0.25 for r in got)


def test_anova_separates_flat_from_diurnal(spark):
    """A flat hourly series gives F ~ 0; a strong 2-level diurnal
    pattern gives a large F."""
    def mk(amplitude):
        rows = []
        eid = 0
        for d in range(1, 11):
            for h in range(0, 24, 2):
                # day-parity jitter = within-group noise; amplitude =
                # the hour-of-day (between-group) signal under test
                n = 5 + (d % 2) + (amplitude if h < 12 else 0)
                for _ in range(n):
                    eid += 1
                    rows.append((eid, f"2024-01-{d:02d} {h:02d}:00:00", 1, "view", 1.0))
        return spark.createDataFrame(
            rows, "event_id bigint, ts string, user_id bigint, event_type string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))

    flat = rel.anova_hour_of_day(mk(0)).collect()[0]
    wavy = rel.anova_hour_of_day(mk(10)).collect()[0]
    assert flat.ms_between == 0.0  # jitter is day-wise, not hour-wise
    assert flat.f_stat == 0.0
    assert wavy.f_stat > 100  # planted diurnal signal dwarfs the jitter


def test_open_order_age_hand_ages(spark):
    """Two open orders aged 10 and 30 days vs the dataset max date;
    closed orders don't count but do set the clock."""
    orders = spark.createDataFrame(
        [
            (1, "O", "2024-03-01"),
            (2, "O", "2024-03-21"),
            (3, "F", "2024-03-31"),  # closed, defines d_max
        ],
        "o_orderkey bigint, o_orderstatus string, o_orderdate string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    got = {r.o_orderstatus: r for r in rel.open_order_age(orders).collect()}
    assert got["O"].n_open == 2
    assert got["O"].mean_age_d == 20.0
    assert got["O"].p50_age_d == 20.0  # midpoint of {10, 30}
