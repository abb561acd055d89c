"""Fixture tests for the model-evaluation family (operators/mleval.py):
AUC-ROC, calibration bins, mutual information — semantics pinned on
hand-built event streams (the oracle sweep covers the real tables)."""

from __future__ import annotations

import datetime

from hadoop_coded_wordcount_spark.operators import mleval as ml

D = datetime.datetime


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double",
    )


def _user(rows, uid, clicks, views, purchase):
    t = D(2024, 1, 1, 12)
    eid = len(rows) * 100
    for i in range(clicks):
        rows.append((eid + i, t, uid, "click", 0.0))
    for i in range(views):
        rows.append((eid + 50 + i, t, uid, "view", 0.0))
    if purchase:
        rows.append((eid + 99, t, uid, "purchase", float(purchase)))


def test_auc_perfect_separation(spark):
    rows = []
    _user(rows, 1, clicks=3, views=0, purchase=100)
    _user(rows, 2, clicks=2, views=0, purchase=100)
    _user(rows, 3, clicks=1, views=0, purchase=0)
    _user(rows, 4, clicks=0, views=1, purchase=0)
    # mean purchase value = 50 -> users 1,2 positive; scores separate
    # positives from negatives perfectly.
    got = ml.auc_roc(_events(spark, rows)).collect()[0]
    assert (got.n_users, got.n_pos, got.n_neg) == (4, 2, 2)
    assert got.auc == 1.0


def test_auc_ties_count_half(spark):
    rows = []
    _user(rows, 1, clicks=2, views=0, purchase=100)  # pos, score 2
    _user(rows, 2, clicks=2, views=0, purchase=0)  # neg, score 2 (tie)
    _user(rows, 3, clicks=1, views=0, purchase=100)  # pos, score 1
    _user(rows, 4, clicks=0, views=1, purchase=0)  # neg, score 0
    # pairs: (1,2) tie=.5  (1,4) win  (3,2) loss  (3,4) win -> 2.5/4
    got = ml.auc_roc(_events(spark, rows)).collect()[0]
    assert got.auc == 0.625


def test_auc_degenerate_single_class_is_null(spark):
    rows = []
    _user(rows, 1, clicks=2, views=0, purchase=0)
    _user(rows, 2, clicks=1, views=0, purchase=0)
    # zero purchases -> mean threshold 0, no user exceeds it -> no
    # positives -> NULLIF guard yields NULL, not a crash.
    got = ml.auc_roc(_events(spark, rows)).collect()[0]
    assert got.n_pos == 0 and got.auc is None


def test_calibration_bins_hand_users(spark):
    rows = []
    _user(rows, 1, clicks=1, views=1, purchase=30)  # p=.5 bin 5, y=1
    _user(rows, 2, clicks=1, views=3, purchase=0)  # p=.25 bin 2, y=0
    _user(rows, 3, clicks=0, views=1, purchase=0)  # p=0 bin 0, y=0
    got = {
        r.bin: r for r in ml.calibration_bins(_events(spark, rows)).collect()
    }
    assert set(got) == {0, 2, 5}
    assert got[5].n == 1 and got[5].frac_pos == 1.0
    assert got[5].mean_pred == 0.5
    # brier for bin 5: (0.5 - 1)^2 = 0.25
    assert got[5].brier == 0.25
    assert got[2].mean_pred == 0.25 and got[2].frac_pos == 0.0
    assert got[0].mean_pred == 0.0 and got[0].brier == 0.0


def test_calibration_p1_lands_in_bin9(spark):
    rows = []
    _user(rows, 1, clicks=2, views=0, purchase=10)  # p=1.0 -> bin 9 (cap)
    got = ml.calibration_bins(_events(spark, rows)).collect()
    assert [r.bin for r in got] == [9]


def test_mutual_information_independent_is_zero(spark):
    rows = []
    eid = 0
    for hour in (0, 1):
        for etype in ("click", "view"):
            for _ in range(5):
                rows.append(
                    (eid, D(2024, 1, 1, hour), 1, etype, 0.0)
                )
                eid += 1
    got = ml.mutual_information(_events(spark, rows)).collect()[0]
    assert got.mi_nats == 0.0
    assert got.nmi == 0.0


def test_mutual_information_deterministic_pair(spark):
    rows = []
    for i in range(5):
        rows.append((i, D(2024, 1, 1, 0), 1, "click", 0.0))
        rows.append((100 + i, D(2024, 1, 1, 1), 1, "view", 0.0))
    got = ml.mutual_information(_events(spark, rows)).collect()[0]
    # perfectly dependent 2x2: MI = H = ln 2; per-term rounding to 6dp
    # makes each 0.5*ln2 term 0.346574, summing to 0.693148.
    assert got.mi_nats == 0.693148
    assert got.h_type == 0.693148
    assert got.h_hour == 0.693148
    assert got.nmi == 1.0
