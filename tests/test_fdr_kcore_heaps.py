"""Semantic pins for bh_fdr_brand_price (BH step-up), kcore_peel
(bounded peeling) and heaps_law_fit (vocabulary-growth OLS)."""

from __future__ import annotations

import math

import pytest

from cocktailsdb_spark.operators import corpus, graph, relational as rel


# --- BH FDR -----------------------------------------------------------------


def _li(spark, rows):
    return spark.createDataFrame(rows, "l_partkey long, l_extendedprice double")


def _part(spark, brands):
    return spark.createDataFrame(
        [(k, b) for k, b in brands], "p_partkey long, p_brand string"
    )


def test_bh_fdr_separated_brand_rejected(spark):
    # brand X prices ~ 1000, brands Y/Z ~ 10: X is wildly significant,
    # Y and Z (vs rest including X) also differ -> check BH mechanics run
    # and ranks are 1..3 with monotone thresholds
    rows = [(1, 1000.0 + i) for i in range(20)]
    rows += [(2, 10.0 + i % 3) for i in range(20)]
    rows += [(3, 11.0 + i % 3) for i in range(20)]
    out = rel.bh_fdr_brand_price(
        _li(spark, rows), _part(spark, [(1, "X"), (2, "Y"), (3, "Z")])
    ).collect()
    by_brand = {r.brand: r for r in out}
    assert sorted(r.bh_rank for r in out) == [1, 2, 3]
    assert by_brand["X"].p_value == pytest.approx(0.0, abs=1e-6)
    assert by_brand["X"].rejected == 1
    # thresholds are q*i/m: 0.05/3, 0.10/3, 0.15/3
    thr = {r.bh_rank: r.bh_threshold for r in out}
    assert thr[1] == pytest.approx(0.05 / 3, abs=2e-6)
    assert thr[3] == pytest.approx(0.05, abs=2e-6)


def test_bh_fdr_null_world_accepts(spark):
    # two brands drawn from the SAME values -> |z| small, nothing rejected
    rows = [(1, float(v)) for v in range(100)]
    rows += [(2, float(v)) for v in range(100)]
    out = rel.bh_fdr_brand_price(
        _li(spark, rows), _part(spark, [(1, "A"), (2, "B")])
    ).collect()
    assert all(r.rejected == 0 for r in out)
    assert all(r.p_value > 0.9 for r in out)  # z == 0 -> p == 1


def test_norm_sf_matches_math_erfc(spark):
    # the A&S polynomial vs the true tail at a few points (|err| < 7.5e-8)
    df = spark.range(1).select(
        *[
            rel._norm_sf_expr(rel.F.lit(float(x))).alias(f"q{i}")
            for i, x in enumerate([0.0, 0.5, 1.0, 1.96, 3.0])
        ]
    )
    got = df.collect()[0]
    for i, x in enumerate([0.0, 0.5, 1.0, 1.96, 3.0]):
        true = 0.5 * math.erfc(x / math.sqrt(2.0))
        assert got[f"q{i}"] == pytest.approx(true, abs=1e-7)


# --- k-core -----------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_kcore_triangle_with_pendant(spark):
    # K4 (nodes 1-4, all pairs) + pendant node 5 attached to 1:
    # k=3 peel removes 5 round 1; K4 survives (degree 3 each)
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    out = graph.kcore_peel(_edges(spark, k4 + [(1, 5)]), k=3, rounds=3).collect()[0]
    assert out.n_nodes_start == 5
    assert out.n_alive == 4
    assert out.n_edges_alive == 6
    assert out.min_degree_alive == 3
    assert out.k == 3 and out.rounds == 3


def test_kcore_chain_peels_to_empty(spark):
    # path graph 1-2-3-4: max degree 2 < k=3 -> empty core, NULL min degree
    out = graph.kcore_peel(
        _edges(spark, [(1, 2), (2, 3), (3, 4)]), k=3, rounds=2
    ).collect()[0]
    assert out.n_alive == 0 and out.n_edges_alive == 0
    assert out.min_degree_alive is None


def test_kcore_cascade_needs_rounds(spark):
    # triangle 1-2-3 with a tail 3-4, 4-5: k=2 -> round 1 drops 5,
    # round 2 drops 4; triangle survives. With rounds=1 the tail node 4
    # is still alive (its degree was 2 before 5 vanished).
    e = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    r1 = graph.kcore_peel(_edges(spark, e), k=2, rounds=1).collect()[0]
    r2 = graph.kcore_peel(_edges(spark, e), k=2, rounds=2).collect()[0]
    assert r1.n_alive == 4
    assert r2.n_alive == 3 and r2.n_edges_alive == 3


# --- Heaps' law -------------------------------------------------------------


def test_heaps_power_law_recovered(spark):
    # synthetic corpus where doc i introduces exactly ceil(sqrt growth)
    # vocabulary: V(N) = N^0.5 exactly when each doc d has 2d+1 tokens of
    # which... simpler: every doc has T distinct NEW terms + T old terms
    # -> V grows linearly in N: beta ~= 1 after the fit
    docs = []
    for d in range(40):
        new = [f"w{d}_{t}" for t in range(5)]
        old = ["the"] * 5
        docs.append((d, " ".join(new + old)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = corpus.heaps_law_fit(df).collect()[0]
    assert out.n_points >= 8
    assert out.vocab_total == 40 * 5 + 1
    assert out.tokens_total == 40 * 10
    # V(N) = N/2 + 1 ~ linear -> beta near 1
    assert 0.9 <= out.heaps_beta <= 1.05


def test_heaps_constant_vocab_beta_zero(spark):
    # same 3 words in every doc -> V flat -> beta ~ 0
    df = spark.createDataFrame(
        [(d, "a b c a b c") for d in range(30)], "doc_id long, text string"
    )
    out = corpus.heaps_law_fit(df).collect()[0]
    assert out.vocab_total == 3
    assert abs(out.heaps_beta) <= 0.05
