"""Semantic pins for knn_classify (operators/similarity.py) and
keyness_terms (operators/corpus.py), hand-computed on tiny frames."""

from __future__ import annotations

import math

from cocktailsdb_spark.operators import corpus, similarity


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_knn_classify_majority_and_tiebreak(spark):
    # cluster A around (1,0) labelled 0; cluster B around (0,1) labelled 1
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.01], 0),
        (2, [0.98, 0.02], 0),
        (3, [0.0, 1.0], 1),
        (4, [0.01, 0.99], 1),
        (5, [0.02, 0.98], 1),
    ]
    out = {r.query_id: r for r in similarity.knn_classify(_emb(spark, rows), [0, 3], k=3).collect()}
    # query 0's 3 NN: vecs 1,2 (label 0) and one B vec (label 1) -> majority 0
    assert out[0].predicted_label == 0 and out[0].n_votes == 2
    assert out[0].true_label == 0 and out[0].correct == 1
    assert out[3].predicted_label == 1 and out[3].correct == 1


def test_knn_classify_vote_tie_prefers_smaller_label(spark):
    # k=2 with one neighbour from each cluster -> 1-1 tie -> label 0 wins
    rows = [
        (0, [1.0, 1.0], 9),
        (1, [1.0, 0.9], 0),
        (2, [0.9, 1.0], 1),
        (3, [-1.0, -1.0], 1),
    ]
    out = {r.query_id: r for r in similarity.knn_classify(_emb(spark, rows), [0], k=2).collect()}
    assert out[0].n_votes == 1 and out[0].predicted_label == 0
    assert out[0].correct == 0  # truth is 9


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _g2(a, b, ta, tb):
    tot = ta + tb
    ea = (a + b) * (ta / tot)
    eb = (a + b) * (tb / tot)
    s = 0.0
    if a > 0:
        s += a * math.log(a / ea)
    if b > 0:
        s += b * math.log(b / eb)
    return 2.0 * s


def test_keyness_overused_focus_term(spark):
    # 'foo' dominates en docs, 'bar' dominates the rest; 'base' is flat
    rows = [
        (1, "en", " ".join(["foo"] * 8 + ["base"] * 4)),
        (2, "de", " ".join(["bar"] * 8 + ["base"] * 4)),
    ]
    out = {r.term: r for r in corpus.keyness_terms(_docs(spark, rows), min_count=4, top_n=10).collect()}
    ta, tb = 12, 12
    assert out["foo"].n_focus == 8 and out["foo"].n_ref == 0
    assert out["foo"].direction == 1 and out["bar"].direction == -1
    want = _g2(8, 0, ta, tb)
    assert abs(out["foo"].g2 - want) <= 1e-6
    # balanced term has zero keyness
    assert out["base"].g2 == 0.0
    # ranking: foo/bar (8 exclusive uses) above base
    assert out["foo"].g2 > out["base"].g2


def test_keyness_min_count_filter(spark):
    rows = [
        (1, "en", "rare common common common common"),
        (2, "fr", "common common common common common"),
    ]
    out = {r.term: r for r in corpus.keyness_terms(_docs(spark, rows), min_count=3, top_n=10).collect()}
    assert "rare" not in out and "common" in out


def test_mine_hard_negatives_picks_and_margin(spark):
    rows = [
        (0, [1.0, 0.0], 0),      # anchor
        (1, [0.99, 0.01], 0),    # closest same-label -> positive
        (2, [0.5, 0.5], 0),      # same label, farther
        (3, [0.9, 0.1], 1),      # closest different-label -> hard negative
        (4, [0.0, 1.0], 1),
    ]
    out = {r.anchor_id: r for r in similarity.mine_hard_negatives(_emb(spark, rows), [0]).collect()}
    r = out[0]
    assert r.pos_id == 1 and r.neg_id == 3
    assert r.pos_sim > r.neg_sim
    assert abs(r.margin - round(r.pos_sim - r.neg_sim, 6)) <= 1e-9


def test_mine_hard_negatives_drops_anchor_without_both_sides(spark):
    # all candidates share the anchor's label -> no hard negative -> no row
    rows = [(0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0), (2, [0.8, 0.2], 0)]
    assert similarity.mine_hard_negatives(_emb(spark, rows), [0]).collect() == []


def test_zipf_fit_exact_power_law(spark):
    # verify slope/r2 against a plain-python OLS on the same (ln rank,
    # ln freq) pairs for a 4-term geometric frequency profile
    import math

    from cocktailsdb_spark.operators import corpus as co

    words = []
    freqs = [16, 8, 4, 2]
    for i, f in enumerate(freqs):
        words += [f"w{i}"] * f
    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    row = co.zipf_fit(docs, top_v=10).collect()[0]
    xs = [math.log(r + 1) for r in range(4)]
    ys = [math.log(f) for f in freqs]
    n = 4.0
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    syy = sum(y * y for y in ys)
    cov, vx, vy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    assert row.n_terms == 4
    assert abs(row.slope - cov / vx) <= 1e-6
    assert abs(row.r2 - (cov * cov) / (vx * vy)) <= 1e-6
    assert row.slope < 0


def test_mmr_prefers_diverse_over_redundant(spark):
    # anchor 0 at (1,0). Candidates 1,2 are near-clones of each other and
    # most relevant; 3 is exactly orthogonal to 1 (zero redundancy) with
    # small positive relevance. Pure top-3 relevance = [1, 2, 3]; under
    # MMR the clone 2's score is ~(rel-1)/2 < 0 while 3's is rel3/2 > 0,
    # so the diverse 3 must take rank 2.
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.95, 0.05], 0),
        (2, [0.949, 0.051], 0),
        (3, [0.05, -0.95], 0),
        (4, [-1.0, 0.2], 0),
    ]
    out = similarity.mmr_diversify(
        _emb(spark, rows), [0], k=3, n_candidates=4, lam=0.5
    ).collect()
    order = [r.vec_id for r in sorted(out, key=lambda r: r.rank)]
    assert order[0] == 1  # pure relevance first pick
    assert order[1] == 3  # diversity beats the near-clone
    assert order[2] == 2
    ranks = [r.rank for r in out]
    assert sorted(ranks) == [1, 2, 3]


def test_ndcg_perfect_when_ivf_matches_exact(spark):
    # well-separated clusters: every query's bucket contains its true
    # neighbours, and nDCG is bounded in [0, 1] with idcg >= dcg
    rows = [(i, [1.0, 0.01 * i], 0) for i in range(6)]
    out = similarity.ndcg_ivf(_emb(spark, rows), [0, 1], k=3).collect()
    for r in out:
        assert 0.0 <= r.ndcg <= 1.0
        assert r.dcg <= r.idcg + 1e-9
