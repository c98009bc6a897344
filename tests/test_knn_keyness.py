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
