"""Semantic pins for rmst_retention, tukey_hsd_priority and
frequent_token_subsample."""

from __future__ import annotations

from datetime import datetime

import pytest

from cocktailsdb_spark.operators import corpus, relational as rel


def _orders_km(spark, lifetimes):
    # lifetime d: two orders (Jan 1, Jan 1+d) in 2000 -> all events
    rows = []
    for i, d in enumerate(lifetimes):
        rows.append((i, datetime(2000, 1, 1)))
        rows.append((i, datetime(2000, 1, 1 + d)))
    return spark.createDataFrame(rows, "o_custkey long, o_orderdate timestamp")


def test_rmst_textbook_curve(spark):
    # lifetimes 1,1,2,4 (all events): S(1)=0.5, S(2)=0.25, S(4)=0
    # RMST(tau=3) = 1*1 (0..1) + 0.5*1 (1..2) + 0.25*1 (2..3) = 1.75
    r = rel.rmst_retention(_orders_km(spark, [1, 1, 2, 4]), tau=3).collect()[0]
    assert r.tau_days == 3
    assert r.rmst_days == pytest.approx(1.75, abs=1e-4)
    assert r.survival_at_tau == pytest.approx(0.25, abs=1e-5)


def test_rmst_tail_beyond_last_event(spark):
    # lifetimes 1,1 -> S(1)=0; RMST(5) = 1*1 + 0*4 = 1
    r = rel.rmst_retention(_orders_km(spark, [1, 1]), tau=5).collect()[0]
    assert r.rmst_days == pytest.approx(1.0, abs=1e-6)
    assert r.survival_at_tau == 0.0


def _orders_pri(spark, groups):
    rows = []
    i = 0
    for g, vals in groups.items():
        for v in vals:
            rows.append((i, datetime(1996, 1, 1), g, float(v)))
            i += 1
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderdate timestamp, o_orderpriority string,"
        " o_totalprice double",
    )


def test_tukey_flags_separated_pair(spark):
    df = _orders_pri(
        spark,
        {
            "a": [10, 11, 12, 13, 14] * 4,
            "b": [10.5, 11.5, 12.5, 13.5, 14.5] * 4,
            "c": [100, 101, 102, 103, 104] * 4,
        },
    )
    out = {(r.group_a, r.group_b): r for r in rel.tukey_hsd_priority(df).collect()}
    assert len(out) == 3
    assert out[("a", "c")].significant == 1
    assert out[("b", "c")].significant == 1
    assert out[("a", "b")].significant == 0
    # Tukey-Kramer q for a vs c: diff 90, MSW = pooled within var
    assert out[("a", "c")].q_stat > out[("a", "b")].q_stat


def test_tukey_mean_diff_sign_and_value(spark):
    df = _orders_pri(spark, {"a": [10, 20], "b": [30, 40]})
    r = rel.tukey_hsd_priority(df).collect()[0]
    assert r.mean_diff == pytest.approx(-20.0, abs=1e-9)


def test_subsample_drops_frequent_keeps_rare(spark):
    # 'the' dominates (~96% of tokens): p_keep ~ sqrt(t/f)+t/f << 1;
    # rare terms have f < t -> p_keep = 1 (all kept)
    docs = spark.createDataFrame(
        [(d, " ".join(["the"] * 96 + [f"rare{d}_{j}" for j in range(4)]))
         for d in range(50)],
        "doc_id long, text string",
    )
    r = corpus.frequent_token_subsample(docs).collect()[0]
    assert r.n_tokens == 50 * 100
    assert r.vocab_before == 1 + 50 * 4
    # every rare token kept -> vocab_after keeps all rare terms
    assert r.vocab_after >= 50 * 4
    # 'the' has f = 0.96 -> p ~ sqrt(1e-4/.96)+1e-4/.96 ~ 0.0103
    # kept ~ 200 rare + ~50 of 4800 'the' -> rate well under 10%
    assert r.kept_rate < 0.10
    assert r.n_kept >= 200
