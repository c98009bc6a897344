"""Semantic pins for adaboost_two_stumps, ks_normality_price and
event_rate_test."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from cocktailsdb_spark.operators import corpus, events, relational as rel


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars int"
    )


def test_adaboost_reweights_to_a_different_split(spark):
    # label y=1 is lang == STUMP_LABEL_LANG ('en'). Design:
    #   A: 20 docs (5 tok, 100 ch, en), B: 20 docs (50 tok, 100 ch, en),
    #   C: 20 docs (50 tok, 3000 ch, fr), D: 2 noise docs (5 tok, 3000 ch, en)
    # Round 1 picks f2<=0.1 (only D wrong, eps=2/62); the reweight makes
    # D heavy, and round 2's best split flips to f1 (left A+D pure y=1).
    rows, i = [], 0

    def add(n, ntok, nch, lang):
        nonlocal i
        for _ in range(n):
            rows.append((i, " ".join(f"w{j % 7}" for j in range(ntok)),
                         lang, nch))
            i += 1

    add(20, 5, 100, "en")
    add(20, 50, 100, "en")
    add(20, 50, 3000, "fr")
    add(2, 5, 3000, "en")
    r = corpus.adaboost_two_stumps(_docs(spark, rows)).collect()[0]
    assert r.n_docs == 62
    assert r.r1_feature == "f2"
    assert r.r1_error == pytest.approx(2.0 / 62.0, abs=1e-6)
    assert r.alpha1 > 1.0
    assert r.r2_feature == "f1"
    # stump-2 weighted error: C's weight share = 40/240
    assert r.r2_error == pytest.approx(40.0 / 240.0, abs=1e-6)
    # ensemble still only misses the 2 noise docs
    assert r.train_acc_round1 == pytest.approx(60.0 / 62.0, abs=1e-6)
    assert r.train_acc_ensemble == pytest.approx(60.0 / 62.0, abs=1e-6)


def test_adaboost_round2_error_is_weighted(spark):
    # sanity: weighted round-2 error stays in (0, 1) and alphas finite
    rows = []
    for i in range(40):
        y = i % 3 == 0
        text = " ".join("t" for _ in range(10 + (i % 4) * 10))
        rows.append((i, text, "es" if y else "en", 500 + 100 * (i % 5)))
    r = corpus.adaboost_two_stumps(_docs(spark, rows)).collect()[0]
    assert 0.0 < r.r2_error < 1.0
    assert abs(r.alpha2) < 10.0


def _orders(spark, ys):
    rows = [
        (datetime(1996, 1, 1) + timedelta(days=i), float(v))
        for i, v in enumerate(ys)
    ]
    return spark.createDataFrame(rows, "o_orderdate timestamp, o_totalprice double")


def test_ks_normality_uniform_rejected_at_scale(spark):
    # a flat uniform grid over a wide range is far from normal: D well
    # above 0.886/sqrt(n) for n = 400
    ys = [1000.0 + 10.0 * (i % 400) for i in range(400)]
    r = rel.ks_normality_price(_orders(spark, ys)).collect()[0]
    assert r.n_rows == 400
    assert r.reject_normal_05 == 1 or r.d_stat > 0.04
    # uniform-vs-normal KS distance is a known ~0.06 at matched moments
    assert 0.03 < r.d_stat < 0.12


def test_ks_normality_binary_mass_rejected(spark):
    ys = [100.0] * 50 + [200.0] * 50
    r = rel.ks_normality_price(_orders(spark, ys)).collect()[0]
    # two-point mass: EDF jumps 0.5 at each atom vs smooth normal CDF
    assert r.d_stat > 0.25
    assert r.reject_normal_05 == 1


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_event_rate_test_doubled_rate(spark):
    rows = []
    eid = 0
    # week 1 (Jan 1-7): 1 error/day; Jan 8-21 (14 days): 4 errors/day
    for d in range(7):
        rows.append((eid, datetime(2024, 1, 1 + d, 10), 1, "error")); eid += 1
    for d in range(14):
        for k in range(4):
            rows.append((eid, datetime(2024, 1, 8 + d, 6 + k), 1, "error")); eid += 1
    # non-error events to pin the span
    rows.append((eid, datetime(2024, 1, 1, 0), 2, "view")); eid += 1
    rows.append((eid, datetime(2024, 1, 21, 23), 2, "view"))
    r = events.event_rate_test(_events(spark, rows)).collect()[0]
    assert r.days_pre == 7 and r.days_post == 14
    assert r.rate_pre == pytest.approx(1.0, abs=1e-6)
    assert r.rate_post == pytest.approx(4.0, abs=1e-6)
    assert r.rate_ratio == pytest.approx(4.0, abs=1e-6)
    assert r.z_score < -3.0  # rate rose -> pre-minus-post is negative
