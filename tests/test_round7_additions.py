"""Round-7 operator additions: DSIR selection and the data-selection /
statistics wave."""

from __future__ import annotations

from hadoop_coded_wordcount_spark.operators import pipeline as pl


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    )


class TestDsirSelection:
    def test_target_like_doc_outranks_raw_like(self, spark):
        target_text = "alpha beta alpha beta alpha beta alpha beta"
        noise_text = "zulu yankee zulu yankee zulu yankee zulu yankee"
        rows = [
            # the target slice (lang=en) is pure alpha/beta
            *[(i, target_text, "en", "tgt", 40) for i in range(4)],
            # the raw-only slice is pure zulu/yankee
            *[(10 + i, noise_text, "de", "raw", 40) for i in range(4)],
            # candidate source: one target-like doc, one raw-like doc
            (100, target_text, "de", "cand", 40),
            (101, noise_text, "de", "cand", 40),
        ]
        out = {
            r.doc_id: r
            for r in pl.dsir_selection(_docs(spark, rows)).collect()
            if r.source == "cand"
        }
        assert out[100].dsir_weight > out[101].dsir_weight
        assert out[100].sel_rank == 1 and out[101].sel_rank == 2

    def test_per_source_k_and_rank_bounds(self, spark):
        rows = [
            (i, f"tok{i} tok{i + 1} tok{i + 2} tok{i + 3}", "en", "s", 30)
            for i in range(8)
        ]
        out = pl.dsir_selection(_docs(spark, rows), k_per_source=3).collect()
        assert len(out) == 3
        assert sorted(r.sel_rank for r in out) == [1, 2, 3]
        # weights are ranked descending with doc_id tiebreak
        by_rank = sorted(out, key=lambda r: r.sel_rank)
        ws = [(-r.dsir_weight, r.doc_id) for r in by_rank]
        assert ws == sorted(ws)

    def test_short_docs_drop(self, spark):
        rows = [
            (0, "solo", "en", "s", 4),  # <2 tokens: no bigram, dropped
            (1, "two tokens here", "en", "s", 15),
        ]
        out = pl.dsir_selection(_docs(spark, rows)).collect()
        assert [r.doc_id for r in out] == [1]
        assert out[0].n_bigrams == 2


class TestCoverageGreedy:
    def test_greedy_picks_marginal_not_total(self, spark):
        # doc 0 covers grams A+B (6 tokens -> 4 grams); doc 1 covers A
        # (3 grams); doc 2 covers disjoint C (3 grams). Greedy takes doc 0
        # first, then doc 2 (marginal 3) over doc 1 (marginal 0).
        rows = [
            (0, "a b c d e f", "en", "s", 11),
            (1, "a b c d", "en", "s", 7),
            (2, "x y z w", "en", "s", 7),
        ]
        out = sorted(
            pl.coverage_greedy_selection(_docs(spark, rows), k=3).collect(),
            key=lambda r: r.sel_rank,
        )
        assert [r.doc_id for r in out[:2]] == [0, 2]
        assert out[0].marginal_gain == 4 and out[1].marginal_gain == 2
        # doc 1 contributes zero new grams -> saturated corpus ends early
        assert len(out) == 2
        assert out[1].covered_grams == 6 and out[1].coverage_pct == 1.0

    def test_tie_breaks_to_smallest_doc_id(self, spark):
        rows = [
            (5, "p q r s", "en", "s", 7),
            (3, "m n o t", "en", "s", 7),
        ]
        out = sorted(
            pl.coverage_greedy_selection(_docs(spark, rows), k=2).collect(),
            key=lambda r: r.sel_rank,
        )
        assert [r.doc_id for r in out] == [3, 5]


class TestBhFdr:
    def test_planted_hot_hour_rejected_uniform_not(self, spark):
        from datetime import datetime, timedelta

        from hadoop_coded_wordcount_spark.operators import relational as rel

        t0 = datetime(2024, 1, 1, 0, 0, 0)
        rows = []
        eid = 0
        # type "hot": 240 events in hour 3, 10 in every other hour
        for h in range(24):
            for i in range(240 if h == 3 else 10):
                rows.append((eid, t0 + timedelta(hours=h, seconds=i), 1,
                             "hot", 0.0))
                eid += 1
        # type "flat": exactly uniform, 10 per hour
        for h in range(24):
            for i in range(10):
                rows.append((eid, t0 + timedelta(hours=h, seconds=i), 2,
                             "flat", 0.0))
                eid += 1
        ev = spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )
        out = {(r.event_type, r.hod): r for r in rel.bh_fdr(ev).collect()}
        assert len(out) == 48
        assert out[("hot", 3)].significant == 1
        assert out[("hot", 3)].p_rank == 1
        assert all(r.significant == 0 for k, r in out.items()
                   if k[0] == "flat")
        # p-values are valid probabilities and ranks are a permutation
        assert all(0.0 <= r.p_value <= 1.0 for r in out.values())
        assert sorted(r.p_rank for r in out.values()) == list(range(1, 49))


class TestDoremiWeights:
    def test_rare_vocab_domain_upweighted(self, spark):
        # "hard" uses rare tokens (high NLL under the corpus unigram LM);
        # "easy" repeats the corpus-dominant token. DoReMi must push
        # weight above uniform for hard, below for easy, and keep the
        # smoothing floor.
        common = "the the the the the the the the"
        rows = [
            *[(i, common, "en", "easy", 30) for i in range(6)],
            (10, "qqq www rrr sss ttt uuu vvv xxx", "en", "hard", 30),
        ]
        out = {r.source: r for r in
               pl.doremi_weights(_docs(spark, rows)).collect()}
        assert set(out) == {"easy", "hard"}
        assert out["hard"].ell > out["easy"].ell
        assert out["hard"].weight > 0.5 > out["easy"].weight
        floor = 0.05 / 2
        assert out["easy"].weight >= floor
        s = out["easy"].weight + out["hard"].weight
        assert abs(s - 1.0) < 0.01  # smoothing mix keeps ~normalized


class TestPsmCaliperMatch:
    def test_nearest_control_and_caliper(self, spark):
        from hadoop_coded_wordcount_spark.operators import mleval as ml

        cust = spark.createDataFrame(
            [
                # nation 1: treated at score 0.5 (acctbal 50); controls at
                # 0 (bal 10) and 1.0 (bal 90) equidistant -> tie takes the
                # LOWER-score (prev) control.
                (1, 1, 50.0, "AUTOMOBILE"),
                (2, 1, 10.0, "BUILDING"),
                (3, 1, 90.0, "BUILDING"),
                # nation 2: lone treated, nearest control outside caliper
                # by construction (scores 0 vs 1).
                (4, 2, 5.0, "AUTOMOBILE"),
                (5, 2, 99.0, "BUILDING"),
            ],
            "c_custkey bigint, c_nationkey bigint, c_acctbal double, "
            "c_mktsegment string",
        )
        orders = spark.createDataFrame(
            [(100, 1, 300.0), (101, 2, 100.0), (102, 3, 200.0)],
            "o_orderkey bigint, o_custkey bigint, o_totalprice double",
        )
        out = {r.c_nationkey: r
               for r in ml.psm_caliper_match(cust, orders).collect()}
        # nation 1: tie -> matched to control 2 (spend 100); ATT = 200
        # but caliper 0.05 < 0.5 distance -> unmatched. Use wide caliper.
        out_wide = {r.c_nationkey: r
                    for r in ml.psm_caliper_match(
                        cust, orders, caliper=1.0).collect()}
        n1 = out_wide[1]
        assert n1.n_treated == 1 and n1.n_matched == 1
        assert n1.att_spend == 200.0  # 300 (treated) - 100 (prev control)
        # default caliper: both nations unmatched, ATT null
        assert out[1].n_matched == 0 and out[1].att_spend is None
        assert out[2].n_matched == 0 and out[2].att_spend is None


class TestCoxPh:
    @staticmethod
    def _frames(spark, treated_churns):
        from datetime import date

        cust, orders = [], []
        okey = 0
        for i in range(10):
            # treated
            cust.append((i, 0, 100.0, "AUTOMOBILE"))
            okey += 1
            orders.append((okey, i, 10.0, date(2024, 1, 1)))
            if not treated_churns:
                okey += 1
                orders.append((okey, i, 10.0, date(2024, 12, 31)))
            # control: active to window end
            cust.append((100 + i, 0, 100.0, "BUILDING"))
            okey += 1
            orders.append((okey, 100 + i, 10.0, date(2024, 1, 1)))
            okey += 1
            orders.append((okey, 100 + i, 10.0, date(2024, 12, 31)))
        c = spark.createDataFrame(
            cust, "c_custkey bigint, c_nationkey bigint, c_acctbal double, "
            "c_mktsegment string"
        )
        o = spark.createDataFrame(
            orders, "o_orderkey bigint, o_custkey bigint, "
            "o_totalprice double, o_orderdate date"
        )
        return c, o

    def test_planted_hazard_detected(self, spark):
        from hadoop_coded_wordcount_spark.operators import mleval as ml

        c, o = self._frames(spark, treated_churns=True)
        row = ml.cox_ph_binary(c, o).collect()[0]
        # all 10 treated churn (duration 0), all controls censored
        assert row.n_events == 10 and row.s1_events == 10
        assert row.beta > 1.0 and row.hazard_ratio > 3.0

    def test_symmetric_null_stays_zero(self, spark):
        from hadoop_coded_wordcount_spark.operators import mleval as ml

        c, o = self._frames(spark, treated_churns=False)
        row = ml.cox_ph_binary(c, o).collect()[0]
        assert row.n_events == 0 or row.beta == 0.0
        assert row.n_treated == 10 and row.n_control == 10


class TestKruskalWallis:
    def test_hand_computed_tied_case(self, spark):
        from datetime import datetime

        from hadoop_coded_wordcount_spark.operators import relational as rel

        t0 = datetime(2024, 1, 1)
        ev = spark.createDataFrame(
            [
                (1, t0, 1, "a", 1.0),
                (2, t0, 1, "a", 1.0),
                (3, t0, 1, "b", 2.0),
                (4, t0, 1, "b", 2.0),
            ],
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double",
        )
        row = rel.kruskal_wallis(ev).collect()[0]
        # midranks 1.5/1.5/3.5/3.5 -> H = 2.4; ties: C = 1-12/60 = 0.8
        assert row.n == 4 and row.k_groups == 2 and row.df == 1
        assert row.h_stat == 2.4
        assert row.tie_correction == 0.8
        assert row.h_adjusted == 3.0


class TestAlsRank1:
    def test_block_structure_recovered(self, spark):
        from hadoop_coded_wordcount_spark.operators import mleval as ml

        # two disjoint blocks: heavy raters on brand A, light on brand B.
        # rank-1 v-factors must rank A above B.
        orders = spark.createDataFrame(
            [(k, k) for k in range(1, 7)],
            "o_orderkey bigint, o_custkey bigint",
        )
        part = spark.createDataFrame(
            [(1, "A"), (2, "B")], "p_partkey bigint, p_brand string"
        )
        li = []
        for k in range(1, 4):  # custs 1-3: 5 purchases of A
            li += [(k, 1)] * 5
        for k in range(4, 7):  # custs 4-6: 1 purchase of B
            li += [(k, 2)]
        lineitem = spark.createDataFrame(
            li, "l_orderkey bigint, l_partkey bigint"
        )
        out = {r.p_brand: r
               for r in ml.als_rank1(orders, lineitem, part).collect()}
        assert out["A"].v_factor > out["B"].v_factor > 0
        assert out["A"].n_custs == 3 and out["A"].n_ratings == 15
        assert out["B"].n_custs == 3 and out["B"].n_ratings == 3


class TestSpectralBisection:
    def test_two_cliques_separated(self, spark):
        from hadoop_coded_wordcount_spark.operators import graph as gr

        # two 4-cliques {0..3} and {10..13} joined by one bridge 3-10
        edges = []
        for grp in (range(4), range(10, 14)):
            g = list(grp)
            for i in range(len(g)):
                for j in range(i + 1, len(g)):
                    edges.append((g[i], g[j]))
        edges.append((3, 10))
        e = spark.createDataFrame(edges, "src bigint, dst bigint")
        out = gr.spectral_bisection(e).collect()
        side = {r.suppkey: r.side for r in out}
        assert len({side[n] for n in range(4)}) == 1
        assert len({side[n] for n in range(10, 14)}) == 1
        assert side[0] != side[10]
        # fiedler values are normalized to [-1, 1] by the pivot
        assert all(abs(r.fiedler) <= 1.0 for r in out)


class TestPacfHourly:
    def test_ar1_series_pacf_cuts_off_after_lag1(self, spark):
        from datetime import datetime, timedelta

        from hadoop_coded_wordcount_spark.operators import relational as rel

        # deterministic AR(1)-flavored hourly counts: x_t alternates with
        # strong lag-1 structure; PACF lag 1 must dominate lag >= 2.
        t0 = datetime(2024, 1, 1)
        xs = []
        x = 20
        for t in range(96):
            x = 10 + (x % 7) * 3  # deterministic recurrence, lag-1 memory
            xs.append(x)
        rows = []
        eid = 0
        for t, x in enumerate(xs):
            for i in range(x):
                rows.append((eid, t0 + timedelta(hours=t, seconds=i),
                             1, "a", 0.0))
                eid += 1
        ev = spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )
        out = {r.lag: r for r in rel.pacf_hourly(ev).collect()}
        assert set(out) == {1, 2, 3, 4, 5, 6}
        assert out[1].pacf == out[1].acf  # Durbin-Levinson base case
        assert abs(out[1].pacf) > abs(out[4].pacf)
        assert all(abs(r.pacf) <= 1.0 for r in out.values())


class TestNegbinFit:
    def test_overdispersed_series_fits_nb(self, spark):
        from datetime import datetime, timedelta

        from hadoop_coded_wordcount_spark.operators import relational as rel

        t0 = datetime(2024, 1, 1)
        rows, eid = [], 0
        # bursty: alternating 0 and 10 events per hour -> var >> mean
        for h in range(48):
            for i in range(10 if h % 2 == 0 else 0):
                rows.append((eid, t0 + timedelta(hours=h, seconds=i),
                             1, "bursty", 0.0))
                eid += 1
        ev = spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )
        row = rel.negbin_fit(ev).collect()[0]
        # dense grid spans first to last NON-EMPTY hour: 47 hours
        assert row.n_hours == 47
        assert row.dispersion > 1.0 and row.r_hat > 0
        assert 0.0 < row.p_hat < 1.0
        # MoM identity: r(1-p)/p == mean
        m = row.r_hat * (1 - row.p_hat) / row.p_hat
        assert abs(m - row.mean_cnt) < 1e-3
        assert row.zero_frac == round(23 / 47, 6)


class TestKeynessTerms:
    def test_overrepresented_term_tops_its_source(self, spark):
        from hadoop_coded_wordcount_spark.operators import textstats as ts

        rows = [
            (0, "apple apple apple banana", "en", "a", 24),
            (1, "apple apple banana cherry", "en", "a", 25),
            (2, "banana cherry cherry banana", "en", "b", 27),
            (3, "cherry banana cherry cherry", "en", "b", 27),
        ]
        out = ts.keyness_terms(_docs(spark, rows)).collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r.source, []).append(r)
        a_top = min(by_src["a"], key=lambda r: r.rnk)
        b_top = min(by_src["b"], key=lambda r: r.rnk)
        # apple appears ONLY in source a; cherry is concentrated in b
        assert a_top.term == "apple" and a_top.cnt_corpus == 5
        assert b_top.term == "cherry"
        assert all(r.g2 > 0 for r in out)

    def test_only_overrepresented_terms_and_rank_bound(self, spark):
        from hadoop_coded_wordcount_spark.operators import textstats as ts

        rows = [
            (0, "x x x x y", "en", "a", 9),
            (1, "y y y y x", "en", "b", 9),
        ]
        out = ts.keyness_terms(_docs(spark, rows), top=1).collect()
        got = {(r.source, r.term) for r in out}
        # each source surfaces only ITS over-used term at rank 1
        assert got == {("a", "x"), ("b", "y")}
        assert all(r.rnk == 1 for r in out)


class TestEcodOutliers:
    def _orders(self, spark, rows):
        return spark.createDataFrame(
            rows, "o_orderkey bigint, o_custkey bigint, "
            "o_totalprice decimal(18,2)"
        )

    def test_extreme_spender_scores_highest(self, spark):
        from decimal import Decimal

        from hadoop_coded_wordcount_spark.operators import mleval as ml

        rows = []
        k = 0
        # 10 ordinary customers: 2 orders of ~100 each
        for c in range(10):
            for _ in range(2):
                rows.append((k, c, Decimal("100.00"))); k += 1
        # customer 99: single massive order -> right-tail spend AND
        # left-tail order count
        rows.append((k, 99, Decimal("50000.00")))
        out = ml.ecod_outliers(self._orders(spark, rows), k=3).collect()
        assert out[0].o_custkey == 99
        assert out[0].ecod_score >= out[1].ecod_score
        assert len(out) == 3

    def test_k_limit_and_tiebreak(self, spark):
        from decimal import Decimal

        from hadoop_coded_wordcount_spark.operators import mleval as ml

        rows = [(i, i, Decimal("10.00")) for i in range(6)]
        out = ml.ecod_outliers(self._orders(spark, rows), k=4).collect()
        assert len(out) == 4
        # identical scores everywhere -> custkey ascending tiebreak
        assert [r.o_custkey for r in out] == [0, 1, 2, 3]


class TestBm25PrfTopk:
    def test_expansion_retrieves_query_free_doc(self, spark):
        from hadoop_coded_wordcount_spark.operators import textstats as ts

        # q1..q5 are the 5 highest-df terms -> the seed query. The top
        # feedback docs all carry "expansion"; doc 100 contains ONLY
        # "expansion", so pass 1 cannot see it but PRF must.
        base = "q1 q2 q3 q4 q5"
        rows = [
            *[(i, f"{base} expansion", "en", "s", 30) for i in range(6)],
            (100, "expansion expansion expansion", "en", "s", 30),
            (101, "unrelated words only here", "en", "s", 25),
        ]
        out = ts.bm25_prf_topk(_docs(spark, rows), k=10).collect()
        got = {r.doc_id: r for r in out}
        assert 100 in got and got[100].n_matched == 1
        assert 101 not in got
        # feedback docs match all 5 seed terms + the expansion term
        assert got[0].n_matched == 6

    def test_scores_descend_and_k_bounds(self, spark):
        from hadoop_coded_wordcount_spark.operators import textstats as ts

        rows = [
            (i, "alpha beta gamma delta epsilon " + ("alpha " * i).strip(),
             "en", "s", 40)
            for i in range(8)
        ]
        out = ts.bm25_prf_topk(_docs(spark, rows), k=5).collect()
        assert len(out) == 5
        scores = [r.bm25 for r in out]
        assert scores == sorted(scores, reverse=True)


class TestQteDeciles:
    def test_uniform_shift_shows_in_every_decile(self, spark):
        from decimal import Decimal

        from hadoop_coded_wordcount_spark.operators import mleval as ml

        cust = spark.createDataFrame(
            [(i, "AUTOMOBILE" if i < 20 else "BUILDING")
             for i in range(40)],
            "c_custkey bigint, c_mktsegment string",
        )
        # treated spend = control spend + 50 at matching quantiles
        rows, k = [], 0
        for i in range(20):  # treated: 150..340
            rows.append((k, i, Decimal(str(150 + 10 * i)))); k += 1
        for i in range(20, 40):  # control: 100..290
            rows.append((k, i, Decimal(str(100 + 10 * (i - 20))))); k += 1
        orders = spark.createDataFrame(
            rows, "o_orderkey bigint, o_custkey bigint, "
            "o_totalprice decimal(18,2)"
        )
        out = sorted(ml.qte_deciles(cust, orders).collect(),
                     key=lambda r: r.decile)
        assert [r.decile for r in out] == list(range(1, 10))
        assert all(r.n_treated == 20 and r.n_control == 20 for r in out)
        assert all(abs(r.qte - 50.0) < 1e-6 for r in out)

    def test_customers_without_orders_count_as_zero(self, spark):
        from decimal import Decimal

        from hadoop_coded_wordcount_spark.operators import mleval as ml

        cust = spark.createDataFrame(
            [(0, "AUTOMOBILE"), (1, "AUTOMOBILE"), (2, "BUILDING"),
             (3, "BUILDING")],
            "c_custkey bigint, c_mktsegment string",
        )
        orders = spark.createDataFrame(
            [(0, 0, Decimal("100.00")), (1, 2, Decimal("100.00"))],
            "o_orderkey bigint, o_custkey bigint, "
            "o_totalprice decimal(18,2)",
        )
        out = ml.qte_deciles(cust, orders).collect()
        # both arms are {0, 100}: identical distributions -> QTE 0
        assert all(r.qte == 0.0 for r in out)
        assert all(r.n_treated == 2 and r.n_control == 2 for r in out)


class TestLogrankSegments:
    def _frames(self, spark, cust_rows, order_rows):
        cust = spark.createDataFrame(
            cust_rows, "c_custkey bigint, c_mktsegment string"
        )
        orders = spark.createDataFrame(
            order_rows, "o_orderkey bigint, o_custkey bigint, "
            "o_orderdate date"
        )
        return cust, orders

    def test_fast_churning_treated_arm_flags(self, spark):
        from datetime import date

        from hadoop_coded_wordcount_spark.operators import relational as rel

        cust_rows = [(i, "AUTOMOBILE") for i in range(1, 6)] + [
            (i, "BUILDING") for i in range(11, 17)
        ]
        rows, k = [], 0
        # treated: first 01-01, last 01-15 -> churned at t=0
        for c in range(1, 6):
            rows.append((k, c, date(2024, 1, 1))); k += 1
            rows.append((k, c, date(2024, 1, 15))); k += 1
        # control: active through year end -> censored at t=12
        for c in range(11, 16):
            rows.append((k, c, date(2024, 1, 1))); k += 1
            rows.append((k, c, date(2024, 12, 20))); k += 1
        rows.append((k, 16, date(2024, 12, 31)))  # pins window end
        cust, orders = self._frames(spark, cust_rows, rows)
        r = rel.logrank_segments(cust, orders).collect()[0]
        assert r.n_treated == 5 and r.n_control == 6
        assert r.o_treated == 5 and r.e_treated < 3
        assert r.chi2 > 6 and r.z_score > 0
        assert r.p_value < 0.01

    def test_identical_arms_accept_null(self, spark):
        from datetime import date

        from hadoop_coded_wordcount_spark.operators import relational as rel

        cust_rows = [(1, "AUTOMOBILE"), (2, "AUTOMOBILE"),
                     (3, "AUTOMOBILE"), (11, "BUILDING"),
                     (12, "BUILDING"), (13, "BUILDING")]
        rows, k = [], 0
        for c in (1, 2, 11, 12):  # churn at t=0 in both arms
            rows.append((k, c, date(2024, 1, 1))); k += 1
            rows.append((k, c, date(2024, 1, 10))); k += 1
        for c in (3, 13):  # censored, pin the window end
            rows.append((k, c, date(2024, 1, 1))); k += 1
            rows.append((k, c, date(2024, 12, 31))); k += 1
        cust, orders = self._frames(spark, cust_rows, rows)
        r = rel.logrank_segments(cust, orders).collect()[0]
        assert r.o_treated == 2 and r.e_treated == 2.0
        assert r.chi2 == 0.0 and r.z_score == 0.0
        assert r.p_value > 0.99


class TestQlmDirichletTopk:
    def test_smoothing_scores_zero_tf_docs_and_ranks_by_density(self, spark):
        from hadoop_coded_wordcount_spark.operators import textstats as ts

        # q1..q5 dominate df -> the query. doc 0 is dense in q1 (short),
        # doc 1 has the same tf but is diluted, doc 50 never mentions a
        # query term yet must still receive a (collection-smoothed) score.
        rows = [
            (0, "q1 q2 q3 q4 q5 q1 q1", "en", "s", 30),
            (1, "q1 q2 q3 q4 q5 q1 q1 " + "pad " * 40, "en", "s", 200),
            *[(2 + i, "q1 q2 q3 q4 q5", "en", "s", 20) for i in range(4)],
            (50, "nothing relevant at all", "en", "s", 23),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint"
        )
        out = ts.qlm_dirichlet_topk(docs, k=10).collect()
        got = {r.doc_id: r for r in out}
        assert 50 in got and got[50].n_matched == 0
        assert got[50].qlm < got[0].qlm
        # same query-term tf, shorter doc wins (length normalization)
        assert got[0].qlm > got[1].qlm
        # scores descend, doc_id breaks ties
        scores = [(r.qlm, r.doc_id) for r in out]
        assert scores == sorted(scores, key=lambda s: (-s[0], s[1]))


class TestPeriodogramHourly:
    def test_daily_cycle_dominates(self, spark):
        from datetime import datetime, timedelta

        from hadoop_coded_wordcount_spark.operators import relational as rel

        import math

        t0 = datetime(2024, 1, 1)
        rows, eid = [], 0
        for h in range(240):  # 10 days
            # "daily": smooth cosine intensity, period 24 h (an impulse
            # train would split energy equally across ALL harmonics)
            n_daily = 5 + round(4 * math.cos(2 * math.pi * h / 24))
            for i in range(n_daily):
                rows.append((eid, t0 + timedelta(hours=h, seconds=i),
                             1, "daily", 0.0)); eid += 1
            # "flat": constant 3/hour -> no cycle at any period
            for i in range(3):
                rows.append((eid, t0 + timedelta(hours=h, seconds=i),
                             1, "flat", 0.0)); eid += 1
        ev = spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )
        out = rel.periodogram_hourly(ev).collect()
        by = {(r.event_type, r.period): r for r in out}
        # 4 candidate periods per type, grid = 240 hours
        assert {r.period for r in out} == {24, 12, 8, 6}
        assert all(r.n_hours == 240 for r in out)
        daily_top = [r for r in out
                     if r.event_type == "daily" and r.power_rank == 1]
        assert daily_top[0].period == 24
        # the 24h line carries far more energy than any flat-series line
        flat_max = max(r.power for r in out if r.event_type == "flat")
        assert by[("daily", 24)].power > 10 * max(flat_max, 1e-9)


class TestHuberIrls:
    def test_outlier_downweighted_and_fit_recovers(self, spark):
        from decimal import Decimal

        from hadoop_coded_wordcount_spark.operators import mleval as ml

        # clean line y = 2x + 10 with mild alternating noise, plus one
        # gross outlier that drags the OLS slope
        rows = []
        for i in range(1, 41):
            noise = 1 if i % 2 == 0 else -1
            rows.append((i, Decimal(i), Decimal(2 * i + 10 + noise)))
        rows.append((99, Decimal(50), Decimal(5000)))
        li = spark.createDataFrame(
            rows, "l_orderkey bigint, l_quantity decimal(12,2), "
            "l_extendedprice decimal(12,2)"
        )
        out = {r.iter: r for r in ml.huber_irls(li).collect()}
        assert sorted(out) == [0, 1, 2, 3]
        # OLS is dragged far above the true slope; IRLS walks it back
        assert out[0].slope > 2.5
        assert abs(out[3].slope - 2.0) < abs(out[0].slope - 2.0)
        assert out[3].slope < out[0].slope
        # the gross outlier sits beyond delta in every reweighted round
        assert out[1].n_downweighted >= 1
        assert out[3].n_downweighted >= 1
        assert out[0].n_downweighted == 0
        assert out[1].delta == round(1.345 * out[1].s0, 6)


class TestPairwiseWelch:
    def test_shifted_type_flags_only_against_others(self, spark):
        from datetime import datetime, timedelta

        from hadoop_coded_wordcount_spark.operators import relational as rel

        t0 = datetime(2024, 1, 1)
        rows, eid = [], 0
        for i in range(200):
            v = 10.0 + (0.1 if i % 2 == 0 else -0.1)
            rows.append((eid, t0 + timedelta(seconds=eid), 1, "a", v))
            eid += 1
            rows.append((eid, t0 + timedelta(seconds=eid), 1, "b", v))
            eid += 1
            # "c" is shifted far above a and b
            rows.append((eid, t0 + timedelta(seconds=eid), 1, "c", v + 5))
            eid += 1
        ev = spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )
        out = {(r.type_a, r.type_b): r
               for r in rel.pairwise_welch_bonferroni(ev).collect()}
        assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
        assert all(r.n_tests == 3 for r in out.values())
        assert out[("a", "b")].significant == 0
        assert out[("a", "c")].significant == 1
        assert out[("b", "c")].significant == 1
        assert out[("a", "c")].mean_diff == -5.0
        # Bonferroni never lowers a p-value
        assert all(r.p_bonferroni >= r.p_value for r in out.values())


class TestAnnMapAtK:
    def test_ap_bounded_by_recall_and_valid(self, spark):
        from hadoop_coded_wordcount_spark.operators import similarity as sim
        from hadoop_coded_wordcount_spark.sources.catalog import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        ap = {r.query_id: r for r in sim.ann_map_at_k(emb).collect()}
        rc = {r.query_id: r
              for r in sim.ann_recall_metrics(emb).collect()}
        assert set(ap) == set(rc) and ap
        for qid, r in ap.items():
            assert 0.0 <= r.ap_at_k <= 1.0
            # each P@r term is <= 1, so AP <= n_hits/k = recall@k
            assert r.ap_at_k <= rc[qid].recall_at_k + 1e-9
            assert r.n_hits == rc[qid].n_hits
            # a first-rank hit implies AP gets the full P@1 = 1 term
            if rc[qid].mrr == 1.0:
                assert r.ap_at_k >= round(1.0 / 10, 6)


class TestEncodingAnomaly:
    def test_planted_anomalies_counted_per_source(self, spark):
        from hadoop_coded_wordcount_spark.operators import textstats as ts

        rows = [
            (0, "clean text here", "en", "good", 15),
            (1, "more clean text", "en", "good", 15),
            (2, "broken �� char", "en", "bad", 16),
            (3, "ctrl\x01byte", "en", "bad", 9),
            (4, "mojibake Ã© and â€œquotesâ€\x9d", "en", "bad", 25),
        ]
        out = {r.source: r
               for r in ts.encoding_anomaly(_docs(spark, rows)).collect()}
        good, bad = out["good"], out["bad"]
        assert good.n_flagged == 0 and good.frac_flagged == 0.0
        assert good.sum_repl == good.sum_ctrl == good.sum_moji == 0
        assert bad.n_flagged == 3 and bad.frac_flagged == 1.0
        assert bad.sum_repl == 2 and bad.sum_ctrl == 1
        assert bad.sum_moji == 3  # one A-tilde + two a-circumflex-euro
        # \x9d is C1, not C0: deliberately NOT counted as a ctrl byte
        assert bad.repl_per_10k > 0 and good.repl_per_10k == 0.0


class TestKneserNeyBigram:
    def test_continuation_penalty_and_formula(self, spark):
        from hadoop_coded_wordcount_spark.operators import textstats as ts

        # "francisco" always follows "san" (single context); "the"
        # follows many distinct contexts with the same pair counts.
        text = ("san francisco san francisco san francisco "
                "a the b the c the")
        rows = [(0, text, "en", "s", len(text))]
        out = {(r.w1, r.w2): r
               for r in ts.kneser_ney_bigram(_docs(spark, rows)).collect()}
        bt = len(out)  # bigram types
        for (w1, w2), r in out.items():
            c1 = sum(x.cnt for (a, _), x in out.items() if a == w1)
            t1 = sum(1 for (a, _) in out if a == w1)
            l2 = sum(1 for (_, b) in out if b == w2)
            expect = round((r.cnt - 0.75) / c1
                           + ((0.75 * t1) / c1) * (l2 / bt), 6)
            assert abs(r.cond_p_kn - expect) < 1e-9, (w1, w2)
            assert r.cond_p_mle == round(r.cnt / c1, 6)
        # the continuation model: "the" completes 3 contexts,
        # "francisco" only 1 -> the redistributed backoff mass (kn minus
        # the discounted MLE term) favors "the"
        def backoff(key):
            r = out[key]
            c1 = sum(x.cnt for (a, _), x in out.items() if a == key[0])
            return r.cond_p_kn - (r.cnt - 0.75) / c1

        assert backoff(("a", "the")) > backoff(("san", "francisco"))


class TestBurrowsDelta:
    def test_same_style_sources_are_close(self, spark):
        from hadoop_coded_wordcount_spark.operators import textstats as ts

        # a and b share the same function-word profile; c inverts it
        style1 = "the of and the of the a a of the"
        style2 = "zz zz zz zz qq qq qq ww ww ee"
        rows = [
            *[(i, style1, "en", "a", 30) for i in range(3)],
            *[(10 + i, style1, "en", "b", 30) for i in range(3)],
            *[(20 + i, style2, "en", "c", 30) for i in range(3)],
        ]
        out = {(r.source_a, r.source_b): r
               for r in ts.burrows_delta(_docs(spark, rows)).collect()}
        assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
        assert out[("a", "b")].delta == 0.0
        assert out[("a", "c")].delta > 1.0
        assert out[("b", "c")].delta == out[("a", "c")].delta
        assert all(r.n_words >= 1 for r in out.values())


class TestTCloseness:
    def test_skewed_class_raises_t(self, spark):
        from hadoop_coded_wordcount_spark.operators import relational as rel

        rows = []
        k = 0
        # nations 1 and 2: 50/50 mixes dominating the global; nation 3:
        # a small all-"A" class far from the global distribution
        for nat in (1, 2):
            for seg in ("A", "B") * 10:
                rows.append((k, nat, float(k % 3), seg)); k += 1
        for _ in range(4):
            rows.append((k, 3, float(k % 3), "A")); k += 1
        cust = spark.createDataFrame(
            rows, "c_custkey bigint, c_nationkey bigint, "
            "c_acctbal double, c_mktsegment string"
        )
        r = rel.t_closeness(cust).collect()[0]
        assert r.n_classes == 3
        # global = 24A/20B; the all-A class: t = |1-24/44|/2+|0-20/44|/2
        assert r.max_t == 0.454545
        assert r.classes_t_gt_02 == 1 and r.classes_t_gt_03 == 1
        assert r.frac_customers_exposed == round(4 / 44, 6)

    def test_uniform_classes_pass(self, spark):
        from hadoop_coded_wordcount_spark.operators import relational as rel

        rows = [(i, i % 3, 0.0, "A" if i % 2 == 0 else "B")
                for i in range(60)]
        cust = spark.createDataFrame(
            rows, "c_custkey bigint, c_nationkey bigint, "
            "c_acctbal double, c_mktsegment string"
        )
        r = rel.t_closeness(cust).collect()[0]
        assert r.max_t == 0.0 and r.classes_t_gt_02 == 0
        assert r.frac_customers_exposed == 0.0


class TestLeveneBf:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )

    def test_unequal_spread_inflates_w(self, spark):
        from datetime import datetime, timedelta

        from hadoop_coded_wordcount_spark.operators import relational as rel

        t0 = datetime(2024, 1, 1)
        rows, k = [], 0
        for i in range(60):
            # tight group: deviations 1/-1/3 around 100
            rows.append((k, t0 + timedelta(seconds=k), 1, "tight",
                         100.0 + (1.0, -1.0, 3.0)[i % 3])); k += 1
            # wide group: deviations 50/-50/70
            rows.append((k, t0 + timedelta(seconds=k), 1, "wide",
                         100.0 + (50.0, -50.0, 70.0)[i % 3])); k += 1
        r = rel.levene_bf(self._ev(spark, rows)).collect()[0]
        assert r.k_groups == 2 and r.n == 120
        assert r.df1 == 1 and r.df2 == 118
        # mean |z|: ~1.67 vs ~56.7, F crit at these dfs is ~3.9
        assert r.w_stat > 30

    def test_equal_spread_w_near_zero(self, spark):
        from datetime import datetime, timedelta

        from hadoop_coded_wordcount_spark.operators import relational as rel

        t0 = datetime(2024, 1, 1)
        rows, k = [], 0
        for i in range(42):
            v = (5.0, -5.0, 15.0)[i % 3]
            rows.append((k, t0 + timedelta(seconds=k), 1, "a", 10.0 + v)); k += 1
            rows.append((k, t0 + timedelta(seconds=k), 1, "b", 90.0 + v)); k += 1
        r = rel.levene_bf(self._ev(spark, rows)).collect()[0]
        # identical spreads, different means: Levene sees NO difference
        assert r.w_stat == 0.0


class TestSyntheticControl:
    def test_matching_donor_dominates_and_gap_reads_effect(self, spark):
        from datetime import date

        from hadoop_coded_wordcount_spark.operators import mleval as ml

        # nations: 0 = treated, 1 = perfect pre-period twin, 2 = far off.
        # Post-period: treated jumps by +8/month; donors stay flat.
        cust = spark.createDataFrame(
            [(i, i) for i in range(3)],
            "c_custkey bigint, c_nationkey bigint",
        )
        rows, k = [], 0
        for m in range(1, 13):  # 12 months of 2024
            base = 4 + (m % 2)  # 5,4,5,4,... per month
            lift = 8 if m > 6 else 0
            for _ in range(base + lift):  # nation 0
                rows.append((k, 0, date(2024, m, 1))); k += 1
            for _ in range(base):  # nation 1: twin pre AND post
                rows.append((k, 1, date(2024, m, 1))); k += 1
            for _ in range(base + 20):  # nation 2: distant donor
                rows.append((k, 2, date(2024, m, 1))); k += 1
        orders = spark.createDataFrame(
            rows, "o_orderkey bigint, o_custkey bigint, o_orderdate date"
        )
        out = {r.month_idx: r
               for r in ml.synthetic_control(cust, orders).collect()}
        assert len(out) == 12
        assert all(out[i].period == "pre" for i in range(1, 7))
        assert all(out[i].period == "post" for i in range(7, 13))
        # pre-period: twin matches exactly, far donor carries ~0 weight
        for i in range(1, 7):
            assert abs(out[i].gap) < 0.1
        # post-period gap reads the planted +8 lift
        for i in range(7, 13):
            assert 7.5 < out[i].gap < 8.5


class TestFellegiSunterEm:
    def test_em_separates_planted_duplicates(self, spark):
        from hadoop_coded_wordcount_spark.operators import mleval as ml

        # 10 "duplicate" pairs agree on everything; background pairs in
        # the same blocks agree on nothing beyond the block key
        rows = []
        k = 0
        for i in range(10):
            # dup twins: same segment, same fine band, same name suffix
            rows.append((k, f"Customer#00{i}7", i, 100.0 + i * 0.5, "AUTO")); k += 1
            rows.append((k, f"Customer#01{i}7", i, 100.0 + i * 0.5, "AUTO")); k += 1
            # a non-matching third record in the same (nation, blk)
            rows.append((k, f"Customer#02{i}3", i, 150.0 + i, "BLDG")); k += 1
        cust = spark.createDataFrame(
            rows, "c_custkey bigint, c_name string, c_nationkey bigint, "
            "c_acctbal double, c_mktsegment string"
        )
        out = ml.fellegi_sunter_em(cust).collect()
        by = {(r.g1, r.g2, r.g3): r for r in out}
        full = by[(1, 1, 1)]
        none = by.get((0, 0, 0)) or by.get((0, 0, 1)) or by.get((0, 1, 0))
        assert full.n_pairs == 10
        assert full.is_match == 1 and full.posterior > 0.9
        assert none is not None and none.is_match == 0
        assert none.posterior < 0.1
        r0 = out[0]
        # fitted parameters are shared across rows and are probabilities
        assert all(0.0 <= v <= 1.0 for v in
                   (r0.pi, r0.m1, r0.m2, r0.m3, r0.u1, r0.u2, r0.u3))
        # match class learned HIGHER agreement rates than non-match
        assert r0.m1 > r0.u1 and r0.m2 > r0.u2


class TestTextTilingCohesion:
    def test_topic_seam_is_weakest_boundary(self, spark):
        from hadoop_coded_wordcount_spark.operators import textstats as ts

        # doc 0: 3 blocks of 20 tokens — blocks 0/1 share vocabulary,
        # block 2 is a disjoint topic -> boundary 1 is the seam (cos 0)
        b_a = ("alpha beta gamma delta " * 5).strip()
        b_c = ("omega psi chi phi " * 5).strip()
        doc0 = f"{b_a} {b_a} {b_c}"
        # doc 1: homogeneous -> high cohesion everywhere
        doc1 = ("alpha beta " * 30).strip()
        rows = [(0, doc0, "en", "s", len(doc0)),
                (1, doc1, "en", "s", len(doc1))]
        out = {r.doc_id: r
               for r in ts.text_tiling_cohesion(_docs(spark, rows)).collect()}
        d0 = out[0]
        assert d0.n_blocks == 3 and d0.n_boundaries == 2
        assert d0.weakest_boundary == 1 and d0.min_cohesion == 0.0
        d1 = out[1]
        assert d1.n_blocks == 3 and d1.min_cohesion == 1.0
        assert d1.mean_cohesion == 1.0
        # doc with a seam has lower mean than the homogeneous doc
        assert d0.mean_cohesion < 1.0


class TestCmhTest:
    def _frames(self, spark, cust_rows, order_rows):
        cust = spark.createDataFrame(
            cust_rows, "c_custkey bigint, c_nationkey bigint, "
            "c_mktsegment string"
        )
        orders = spark.createDataFrame(
            order_rows, "o_orderkey bigint, o_custkey bigint, "
            "o_orderdate date"
        )
        return cust, orders

    def test_consistent_association_flags(self, spark):
        from datetime import date

        from hadoop_coded_wordcount_spark.operators import relational as rel

        # two nations; in BOTH, AUTOMOBILE churns far more often
        cust_rows, order_rows, k, cid = [], [], 0, 0
        for nat in (1, 2):
            for seg, churned, n in (("AUTOMOBILE", 1, 8),
                                    ("AUTOMOBILE", 0, 2),
                                    ("BUILDING", 1, 2),
                                    ("BUILDING", 0, 8)):
                for _ in range(n):
                    cust_rows.append((cid, nat, seg))
                    last = date(2024, 1, 10) if churned else date(2024, 12, 28)
                    order_rows.append((k, cid, date(2024, 1, 1))); k += 1
                    order_rows.append((k, cid, last)); k += 1
                    cid += 1
        order_rows.append((k, 9999, date(2024, 12, 31)))  # pin window end
        cust_rows.append((9999, 1, "BUILDING"))
        cust, orders = self._frames(spark, cust_rows, order_rows)
        r = rel.cmh_test(cust, orders).collect()[0]
        assert r.n_strata == 2
        assert r.sum_a == 16  # 8 exposed churners per nation
        assert r.sum_a > r.sum_e
        assert r.cmh > 3.84 and r.p_value < 0.05  # chi2(1) 5% crit
        assert r.or_mh > 4

    def test_no_association_accepts_null(self, spark):
        from datetime import date

        from hadoop_coded_wordcount_spark.operators import relational as rel

        cust_rows, order_rows, k, cid = [], [], 0, 0
        for nat in (1, 2):
            for seg in ("AUTOMOBILE", "BUILDING"):
                for churned in (1, 0):
                    for _ in range(5):  # perfectly balanced
                        cust_rows.append((cid, nat, seg))
                        last = (date(2024, 1, 10) if churned
                                else date(2024, 12, 28))
                        order_rows.append((k, cid, date(2024, 1, 1))); k += 1
                        order_rows.append((k, cid, last)); k += 1
                        cid += 1
        order_rows.append((k, 9999, date(2024, 12, 31)))
        cust_rows.append((9999, 1, "BUILDING"))
        cust, orders = self._frames(spark, cust_rows, order_rows)
        r = rel.cmh_test(cust, orders).collect()[0]
        assert r.p_value > 0.5
        assert 0.5 < r.or_mh < 2.0


class TestWassersteinSourceLengths:
    def test_shifted_lengths_measured_in_tokens(self, spark):
        from hadoop_coded_wordcount_spark.operators import textstats as ts

        rows = []
        k = 0
        for n in (10, 20, 30, 40, 50):
            rows.append((k, "w " * n, "en", "short", 2 * n)); k += 1
            # long: exactly +100 tokens at matching quantiles
            rows.append((k, "w " * (n + 100), "en", "long", 2 * n)); k += 1
            rows.append((k, "w " * n, "en", "same", 2 * n)); k += 1
        out = {(r.source_a, r.source_b): r
               for r in ts.wasserstein_source_lengths(
                   _docs(spark, rows)).collect()}
        assert out[("long", "short")].w1_tokens == 100.0
        assert out[("same", "short")].w1_tokens == 0.0
        assert out[("long", "same")].w1_tokens == 100.0
        assert all(r.n_docs_a == 5 and r.n_docs_b == 5
                   for r in out.values())


class TestCompressionRatioQuality:
    def test_repetitive_text_compresses_below_prose(self, spark):
        from hadoop_coded_wordcount_spark.functions import (
            pandas_surface as pu,
        )

        rep = "spam " * 400
        prose = " ".join(
            f"w{i}x{i * 7 % 13}q{i * 11 % 17}" for i in range(400)
        )
        rows = [(0, rep, "en", "s", len(rep)),
                (1, prose, "en", "s", len(prose)),
                (2, "", "en", "s", 0)]
        out = {r.doc_id: r
               for r in pu.compression_ratio_quality(
                   _docs(spark, rows)).collect()}
        assert out[0].compression_ratio < 0.05 and out[0].keep == 0
        assert out[1].compression_ratio > 0.3 and out[1].keep == 1
        assert out[2].compression_ratio is None
        # determinism: fixed zlib level -> exact repeatable value
        import zlib
        exp = round(len(zlib.compress(rep.encode(), 6)) / len(rep.encode()), 6)
        assert out[0].compression_ratio == exp


class TestSaxHourly:
    def test_diurnal_pattern_reads_as_symbols(self, spark):
        from datetime import datetime, timedelta

        from hadoop_coded_wordcount_spark.operators import relational as rel

        t0 = datetime(2024, 1, 1)
        rows, eid = [], 0
        # 48 hours: 12 quiet hours (1/h) then 12 busy (9/h), repeated
        for h in range(48):
            n = 1 if (h // 12) % 2 == 0 else 9
            for i in range(n):
                rows.append((eid, t0 + timedelta(hours=h, seconds=i),
                             1, "diurnal", 0.0)); eid += 1
        ev = spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )
        r = rel.sax_hourly(ev).collect()[0]
        # 48 hours / 4-hour segments = 12 symbols
        assert r.n_segments == 12
        assert len(r.sax) == 12
        # quiet half maps below the mean (a), busy half above (d)
        assert r.sax == "aaadddaaaddd"

    def test_constant_series_is_excluded(self, spark):
        from datetime import datetime, timedelta

        from hadoop_coded_wordcount_spark.operators import relational as rel

        t0 = datetime(2024, 1, 1)
        rows = [(i, t0 + timedelta(hours=i), 1, "flat", 0.0)
                for i in range(24)]
        ev = spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )
        # zero variance -> no defined z-quantization -> no row
        assert rel.sax_hourly(ev).collect() == []


class TestHurstHourly:
    def test_trending_series_is_persistent_noise_is_not(self, spark):
        import hashlib
        from datetime import datetime, timedelta

        from hadoop_coded_wordcount_spark.operators import relational as rel

        t0 = datetime(2024, 1, 1)
        rows, eid = [], 0
        for h in range(128):
            # "trend": counts ramp 1..128 -> block means keep diverging
            for i in range(h + 1):
                rows.append((eid, t0 + timedelta(hours=h, seconds=i),
                             1, "trend", 0.0)); eid += 1
            # "noise": deterministic hash in 1..8, no memory
            n = int(hashlib.md5(str(h).encode()).hexdigest(), 16) % 8 + 1
            for i in range(n):
                rows.append((eid, t0 + timedelta(hours=h, seconds=i),
                             1, "noise", 0.0)); eid += 1
        ev = spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )
        out = {r.event_type: r for r in rel.hurst_hourly(ev).collect()}
        assert out["trend"].n_scales == 5
        assert out["noise"].n_scales == 5
        # ramping series: variance of block means barely decays -> H ~ 1
        assert out["trend"].hurst > 0.85
        # memoryless series: Var(m) ~ 1/m -> H ~ 0.5
        assert 0.3 < out["noise"].hurst < 0.7
        assert out["trend"].hurst > out["noise"].hurst
        for r in out.values():
            assert r.hurst == round(1.0 + r.var_slope / 2.0, 6)


class TestLjungBox:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )

    def test_cyclic_series_rejects_noise_does_not(self, spark):
        import hashlib
        from datetime import datetime, timedelta

        from hadoop_coded_wordcount_spark.operators import relational as rel

        t0 = datetime(2024, 1, 1)
        cyc, eid = [], 0
        for h in range(96):
            n = 10 if h % 4 < 2 else 2  # strong lag-4 cycle
            for i in range(n):
                cyc.append((eid, t0 + timedelta(hours=h, seconds=i),
                            1, "e", 0.0)); eid += 1
        r1 = rel.ljung_box(self._ev(spark, cyc)).collect()[0]
        assert r1.n_lags == 8 and r1.n == 96
        assert r1.q_stat > 20 and r1.reject_white_noise == 1
        assert r1.p_value < 0.01

        noise, eid = [], 0
        for h in range(96):
            n = int(hashlib.md5(str(h).encode()).hexdigest(), 16) % 6 + 1
            for i in range(n):
                noise.append((eid, t0 + timedelta(hours=h, seconds=i),
                              1, "e", 0.0)); eid += 1
        r2 = rel.ljung_box(self._ev(spark, noise)).collect()[0]
        assert r2.q_stat < r1.q_stat
        assert r2.reject_white_noise == 0


class TestTwoPassExactMedian:
    def _li(self, spark, vals):
        from decimal import Decimal

        return spark.createDataFrame(
            [(i, Decimal(str(v))) for i, v in enumerate(vals)],
            "l_orderkey bigint, l_extendedprice decimal(12,2)",
        )

    def test_odd_and_even_and_bucket_boundary(self, spark):
        from hadoop_coded_wordcount_spark.operators import relational as rel

        # odd n: exact middle value
        r = rel.two_pass_exact_median(
            self._li(spark, [10, 5000, 99999, 3, 7])).collect()[0]
        assert r.n == 5 and r.median == 10.0
        # even n with the two central stats in DIFFERENT 1000-buckets
        r = rel.two_pass_exact_median(
            self._li(spark, [100, 900, 1100, 2000])).collect()[0]
        assert r.n == 4 and r.median == (900 + 1100) / 2
        # all values equal
        r = rel.two_pass_exact_median(
            self._li(spark, [42] * 6)).collect()[0]
        assert r.median == 42.0


class TestImageAhashNeardup:
    def test_planted_pixel_perturbations_found(self, spark):
        from hadoop_coded_wordcount_spark.operators import multimodal as mm

        rows = [(i, "t", "en", "s", 1) for i in range(40)]
        out = mm.image_ahash_neardup(_docs(spark, rows)).collect()
        pairs = {(r.doc_a, r.doc_b): r.hamming for r in out}
        # every decade plants (10k, 10k+1) as a +1-pixel near-dup
        for base in (0, 10, 20, 30):
            assert (base, base + 1) in pairs, pairs
            assert pairs[(base, base + 1)] <= 4
        # unrelated md5 images must not pass the verify
        assert all(a % 10 == 0 and b == a + 1 for a, b in pairs)

    def test_binary_roundtrip_preserves_pixels(self, spark):
        import hashlib

        from hadoop_coded_wordcount_spark.operators import multimodal as mm

        rows = [(7, "t", "en", "s", 1)]  # 7 % 10 not in (0 pair): base=7
        px = mm.pgm_pixels(mm.synth_pgm_corpus(_docs(spark, rows))).collect()
        got = px[0].pixels
        want = []
        for r in range(16):
            want += list(hashlib.md5(f"7:{r}".encode()).digest())
        assert got == want


class TestAudioFeatures:
    def test_square_wave_statistics_are_exact(self, spark):
        from hadoop_coded_wordcount_spark.operators import multimodal as mm

        rows = [(0, "t", "en", "s", 1), (5, "t", "en", "s", 1)]
        out = {r.doc_id: r
               for r in mm.audio_features(_docs(spark, rows)).collect()}
        # doc 0: hp=4, amp=1000 -> constant |v| = 1000 -> RMS == peak
        r0 = out[0]
        assert r0.n_samples == 160 and r0.peak == 1000
        assert r0.rms == 1000.0
        # square wave flips sign every hp samples: 160/4 - 1 segments
        assert r0.zcr == round((160 // 4 - 1) / 159, 6)
        # doc 5: hp=9, amp=1050
        r5 = out[5]
        assert r5.peak == 1050 and r5.rms == 1050.0
        # crossings happen at each half-period boundary within range
        assert r5.zcr == round((160 // 9) / 159, 6)


class TestKmRmst:
    def test_all_retained_gives_full_horizon(self, spark):
        from datetime import date

        from hadoop_coded_wordcount_spark.operators import relational as rel

        # every customer active through the window end -> S(t) = 1
        rows, k = [], 0
        for c in range(5):
            rows.append((k, c, date(2024, 1, 1))); k += 1
            rows.append((k, c, date(2024, 12, 31))); k += 1
        orders = spark.createDataFrame(
            rows, "o_orderkey bigint, o_custkey bigint, o_orderdate date"
        )
        r = rel.km_rmst(orders).collect()[0]
        # single bucket at t=12, survival 1.0
        assert r.survival_at_horizon == 1.0
        assert r.rmst_days == 30.0 * r.n_buckets

    def test_churn_shrinks_rmst(self, spark):
        from datetime import date

        from hadoop_coded_wordcount_spark.operators import relational as rel

        rows, k = [], 0
        for c in range(4):  # churners: gone after January
            rows.append((k, c, date(2024, 1, 1))); k += 1
            rows.append((k, c, date(2024, 1, 15))); k += 1
        for c in range(10, 12):  # survivors
            rows.append((k, c, date(2024, 1, 1))); k += 1
            rows.append((k, c, date(2024, 12, 31))); k += 1
        orders = spark.createDataFrame(
            rows, "o_orderkey bigint, o_custkey bigint, o_orderdate date"
        )
        r = rel.km_rmst(orders).collect()[0]
        # S drops to 2/6 at t=0, stays there to the horizon
        assert r.survival_at_horizon == round(2 / 6, 6)
        assert r.rmst_days < 30.0 * r.n_buckets


class TestMaxDrawdown:
    def test_planted_trough(self, spark):
        from datetime import datetime, timedelta

        from hadoop_coded_wordcount_spark.operators import relational as rel

        t0 = datetime(2024, 1, 1)
        vals = [10, 10, -15, -10, 30, -5]  # peak 20 -> trough -5: dd 25
        rows = [(i, t0 + timedelta(hours=i), 1, "e", float(v))
                for i, v in enumerate(vals)]
        ev = spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )
        r = rel.max_drawdown(ev).collect()[0]
        assert r.max_drawdown == 25.0
        assert r.peak_at_trough == 20.0
        assert r.trough_ts == "2024-01-01 03:00:00"

    def test_monotone_series_has_zero_drawdown(self, spark):
        from datetime import datetime, timedelta

        from hadoop_coded_wordcount_spark.operators import relational as rel

        t0 = datetime(2024, 1, 1)
        rows = [(i, t0 + timedelta(hours=i), 1, "e", 1.5)
                for i in range(10)]
        ev = spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )
        r = rel.max_drawdown(ev).collect()[0]
        assert r.max_drawdown == 0.0
        # ties on dd=0 resolve to the earliest row
        assert r.trough_ts == "2024-01-01 00:00:00"


class TestDedupCaptureRecapture:
    def test_chapman_estimate_bounds_both_methods(self, spark):
        from hadoop_coded_wordcount_spark.operators import dedup as dd
        from hadoop_coded_wordcount_spark.sources.catalog import load_table

        docs = load_table(spark, "/root/testdata/sf0.01", "documents")
        r = dd.dedup_capture_recapture(docs).collect()[0]
        assert r.n_minhash > 0 and r.n_simhash > 0
        # the population estimate can never undercut either survey
        assert r.chapman_total >= max(r.n_minhash, r.n_simhash) - 1
        assert r.n_overlap <= min(r.n_minhash, r.n_simhash)
        if r.chapman_total > 0:
            assert 0 < r.coverage_minhash <= 1.001
            assert 0 < r.coverage_simhash <= 1.001


class TestTheilDecomposition:
    def _frames(self, spark, spend_by_cust_seg):
        from decimal import Decimal

        cust = spark.createDataFrame(
            [(c, seg) for c, (seg, _) in spend_by_cust_seg.items()],
            "c_custkey bigint, c_mktsegment string",
        )
        orders = spark.createDataFrame(
            [(c, c, Decimal(str(x)))
             for c, (_, x) in spend_by_cust_seg.items()],
            "o_orderkey bigint, o_custkey bigint, "
            "o_totalprice decimal(18,2)",
        )
        return cust, orders

    def test_equal_spend_zero_inequality(self, spark):
        from hadoop_coded_wordcount_spark.operators import relational as rel

        data = {i: ("A" if i < 3 else "B", 100.0) for i in range(6)}
        r = rel.theil_decomposition(*self._frames(spark, data)).collect()[0]
        assert r.theil_total == 0.0
        assert r.theil_between == 0.0 and r.theil_within == 0.0

    def test_between_segment_gap_shows_in_decomposition(self, spark):
        from hadoop_coded_wordcount_spark.operators import relational as rel

        # equal WITHIN segments, 9x gap BETWEEN them
        data = {0: ("A", 100.0), 1: ("A", 100.0),
                2: ("B", 900.0), 3: ("B", 900.0)}
        r = rel.theil_decomposition(*self._frames(spark, data)).collect()[0]
        assert r.theil_within == 0.0
        assert r.theil_between > 0.2
        assert abs(r.theil_total - (r.theil_between + r.theil_within)) < 1e-4
        assert r.between_share > 0.99


class TestBradleyTerrySources:
    def test_dominance_order_recovered(self, spark):
        from hadoop_coded_wordcount_spark.operators import mleval as ml

        # same length & distinct ratio everywhere; punctuation density
        # is the ONLY quality lever, so the ordering is unambiguous
        good = " ".join(f"w{i}" for i in range(60))
        mid = " ".join(f"w{i}!!!" for i in range(60))
        bad = " ".join(f"w{i}!!!!!!!!!!" for i in range(60))
        rows = []
        k = 0
        for lang in ("en", "de", "fr"):
            for _ in range(3):
                rows.append((k, good, lang, "s_good", 100)); k += 1
                rows.append((k, mid, lang, "s_mid", 100)); k += 1
                rows.append((k, bad, lang, "s_bad", 100)); k += 1
        out = {r.source: r
               for r in ml.bradley_terry_sources(_docs(spark, rows)).collect()}
        assert out["s_good"].rank == 1
        assert out["s_good"].bt_strength > out["s_mid"].bt_strength
        assert out["s_mid"].bt_strength > out["s_bad"].bt_strength
        # every source played both rivals in all 3 langs
        assert all(r.games == 6 for r in out.values())
        assert out["s_good"].wins == 6 and out["s_bad"].wins == 0


class TestIpfRaking:
    def test_margins_converge_to_uniform(self, spark):
        from collections import defaultdict

        from hadoop_coded_wordcount_spark.operators import mleval as ml

        # skewed 2x2: segments and bands both unbalanced
        rows, k = [], 0
        for seg, bal, n in (("A", 500.0, 30), ("A", 1500.0, 10),
                            ("B", 500.0, 5), ("B", 1500.0, 15)):
            for _ in range(n):
                rows.append((k, seg, bal)); k += 1
        cust = spark.createDataFrame(
            rows, "c_custkey bigint, c_mktsegment string, c_acctbal double"
        )
        out = ml.ipf_raking(cust).collect()
        assert len(out) == 4
        seg_m, band_m = defaultdict(float), defaultdict(float)
        for r in out:
            seg_m[r.seg] += r.w_fitted
            band_m[r.band] += r.w_fitted
            assert r.raking_factor == round(r.w_fitted / r.n_raw, 6)
        total = sum(seg_m.values())
        # after 3 rounds both margins sit within 1% of uniform
        for m in (*seg_m.values(), *band_m.values()):
            assert abs(m - total / 2) < total * 0.01
        # under-sampled cells get up-weighted, over-sampled down
        by = {(r.seg, r.band): r for r in out}
        assert by[("B", 0)].raking_factor > 1.0
        assert by[("A", 0)].raking_factor < 1.0


class TestPriceIndexFisher:
    def test_uniform_price_rise_reads_exactly(self, spark):
        from datetime import date
        from decimal import Decimal

        from hadoop_coded_wordcount_spark.operators import relational as rel

        # two parts, prices +20% in the second half, quantities shift
        rows, k = [], 0
        for pk, p0, p1, q0, q1 in ((1, 10.0, 12.0, 5, 8),
                                   (2, 50.0, 60.0, 4, 2)):
            for _ in range(2):
                rows.append((k, pk, Decimal(str(q0 / 2)),
                             Decimal(str(p0 * q0 / 2)),
                             date(2024, 1, 15))); k += 1
                rows.append((k, pk, Decimal(str(q1 / 2)),
                             Decimal(str(p1 * q1 / 2)),
                             date(2024, 12, 15))); k += 1
        li = spark.createDataFrame(
            rows, "l_orderkey bigint, l_partkey bigint, "
            "l_quantity decimal(18,2), l_extendedprice decimal(18,2), "
            "l_shipdate date"
        )
        r = rel.price_index_fisher(li).collect()[0]
        assert r.n_parts == 2
        # every price rose exactly 20% -> all three indices = 1.2
        assert r.laspeyres == 1.2
        assert r.paasche == 1.2
        assert r.fisher == 1.2

    def test_fisher_between_l_and_p(self, spark):
        from datetime import date
        from decimal import Decimal

        from hadoop_coded_wordcount_spark.operators import relational as rel

        # heterogeneous price moves + quantity substitution -> L != P
        rows, k = [], 0
        for pk, p0, p1, q0, q1 in ((1, 10.0, 20.0, 10, 2),
                                   (2, 50.0, 50.0, 2, 10)):
            rows.append((k, pk, Decimal(q0), Decimal(str(p0 * q0)),
                         date(2024, 1, 15))); k += 1
            rows.append((k, pk, Decimal(q1), Decimal(str(p1 * q1)),
                         date(2024, 12, 15))); k += 1
        li = spark.createDataFrame(
            rows, "l_orderkey bigint, l_partkey bigint, "
            "l_quantity decimal(18,2), l_extendedprice decimal(18,2), "
            "l_shipdate date"
        )
        r = rel.price_index_fisher(li).collect()[0]
        assert r.laspeyres > r.paasche  # substitution bias, the classic
        assert r.paasche <= r.fisher <= r.laspeyres


class TestBassDiffusion:
    def test_planted_s_curve_recovers_market_size(self, spark):
        import math
        from datetime import date

        from hadoop_coded_wordcount_spark.operators import mleval as ml

        # simulate a Bass process: M=1000, p=0.03, q=0.4, monthly steps
        M, p, q = 1000, 0.03, 0.4
        N, rows, k, cid = 0, [], 0, 0
        for t in range(24):
            n_t = round((p + q * N / M) * (M - N))
            for _ in range(n_t):
                rows.append((k, cid, date(2022 + t // 12, t % 12 + 1, 5)))
                k += 1; cid += 1
            N += n_t
        orders = spark.createDataFrame(
            rows, "o_orderkey bigint, o_custkey bigint, o_orderdate date"
        )
        r = ml.bass_diffusion(orders).collect()[0]
        assert r.c < 0 < r.a
        # market size recovered within 5%
        assert abs(r.m_hat - M) / M < 0.05
        assert abs(r.p_hat - p) < 0.01
        assert abs(r.q_hat - q) < 0.05
        want_peak = math.log(q / p) / (p + q)
        assert abs(r.peak_t - want_peak) < 1.0


class TestSeasonalStrength:
    def test_diurnal_signal_scores_near_one(self, spark):
        import hashlib
        import math
        from datetime import datetime, timedelta

        from hadoop_coded_wordcount_spark.operators import relational as rel

        t0 = datetime(2024, 1, 1)
        rows, eid = [], 0
        for h in range(240):
            # cyclic: clean cosine day-shape
            n = 5 + round(4 * math.cos(2 * math.pi * h / 24))
            for i in range(n):
                rows.append((eid, t0 + timedelta(hours=h, seconds=i),
                             1, "cyclic", 0.0)); eid += 1
            # noisy: memoryless hash counts
            n = int(hashlib.md5(str(h).encode()).hexdigest(), 16) % 9 + 1
            for i in range(n):
                rows.append((eid, t0 + timedelta(hours=h, seconds=i),
                             1, "noisy", 0.0)); eid += 1
        ev = spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )
        out = {r.event_type: r
               for r in rel.seasonal_strength(ev).collect()}
        assert out["cyclic"].seasonal_strength > 0.9
        assert out["noisy"].seasonal_strength < 0.5
        assert all(0.0 <= r.seasonal_strength <= 1.0
                   for r in out.values())
        assert all(r.n_hours == 240 for r in out.values())


class TestSeasonalMannKendall:
    def _orders(self, spark, monthly_counts):
        from datetime import date

        rows, k = [], 0
        for (y, m), n in monthly_counts.items():
            for _ in range(n):
                rows.append((k, 1, date(y, m, 10))); k += 1
        return spark.createDataFrame(
            rows, "o_orderkey bigint, o_custkey bigint, o_orderdate date"
        )

    def test_seasonal_growth_detected(self, spark):
        from hadoop_coded_wordcount_spark.operators import relational as rel

        # every month grows year over year: all within-season pairs +1
        counts = {(y, m): 10 + 5 * (y - 2020)
                  for y in (2020, 2021, 2022, 2023) for m in range(1, 13)}
        r = rel.seasonal_mann_kendall(self._orders(spark, counts)).collect()[0]
        assert r.n_months == 48 and r.n_seasons == 12
        assert r.s == 12 * 6  # C(4,2) concordant pairs per season
        assert r.z_score > 3 and r.p_value < 0.01

    def test_pure_seasonality_is_not_trend(self, spark):
        from hadoop_coded_wordcount_spark.operators import relational as rel

        # December spike every year, otherwise flat: no within-season
        # movement at all -> S = 0
        counts = {(y, m): (50 if m == 12 else 10)
                  for y in (2020, 2021, 2022, 2023) for m in range(1, 13)}
        r = rel.seasonal_mann_kendall(self._orders(spark, counts)).collect()[0]
        assert r.s == 0
        # all-tied seasons zero the variance -> NULL z, no false trend
        assert r.z_score is None or abs(r.z_score) < 1


class TestWordAdaptation:
    def test_bursty_word_beats_poisson_function_word_does_not(self, spark):
        from hadoop_coded_wordcount_spark.operators import textstats as ts

        rows = []
        # "the": once per doc, everywhere (function word, no adaptation)
        # "zebra": rare across docs but repeated where present (bursty)
        for i in range(20):
            text = "the filler" + (" zebra zebra zebra zebra" if i < 3
                                   else " other words here")
            rows.append((i, text, "en", "s", len(text)))
        out = {r.term: r
               for r in ts.word_adaptation(_docs(spark, rows), top=30)
               .collect()}
        the, zebra = out["the"], out["zebra"]
        assert the.df1 == 20 and the.df2 == 0 and the.adaptation == 0.0
        assert zebra.df1 == 3 and zebra.df2 == 3
        assert zebra.adaptation == 1.0
        # bursty word adapts far above its Poisson expectation
        assert zebra.adaptation_ratio > 2
        assert zebra.poisson_expect < 0.5
