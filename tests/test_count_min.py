"""Semantic pins for count_min_heavy (operators/corpus.py): one-sided
error, exact recovery without collisions, and forced-collision behavior."""

from __future__ import annotations

from cocktailsdb_spark.operators import corpus


def _docs(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_estimates_exact_without_collisions(spark):
    # 5 distinct terms over d=4 rows of w=2048 buckets: an overestimate
    # needs the same pair to collide in ALL four independent lanes —
    # probability ~(1/2048)^4 per pair, i.e. structurally zero here.
    texts = ["alpha alpha beta", "beta gamma", "alpha delta epsilon"]
    out = corpus.count_min_heavy(_docs(spark, texts), k=10).collect()
    got = {r.term: r for r in out}
    assert got["alpha"].exact_count == 3 and got["alpha"].cm_estimate == 3
    assert got["beta"].exact_count == 2
    for r in out:
        assert r.cm_estimate >= r.exact_count
        assert r.overestimate == r.cm_estimate - r.exact_count == 0
    # ordering: exact desc, term asc
    assert [r.term for r in out[:2]] == ["alpha", "beta"]


def test_topk_limits_output(spark):
    texts = [" ".join(f"t{i}" for i in range(30))]
    out = corpus.count_min_heavy(_docs(spark, texts), k=7).collect()
    assert len(out) == 7
