"""Semantic pins for the model-evaluation operators
(operators/evaluation.py), hand-computed on tiny corpora — independent
of the DuckDB oracle. The pairwise-comparison AUC model here is the
textbook O(P·N) definition; the engine's rank-free histogram form must
agree with it exactly on ties."""

from __future__ import annotations

import math

from cocktailsdb_spark.operators import evaluation as ev


def _docs(spark, rows):
    # (doc_id, lang, text, n_chars)
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string, n_chars int"
    )


def _p_py(lang, text, n_chars):
    toks = text.split(" ")
    f = (
        1.0,
        len(toks) / 100.0,
        n_chars / 1000.0,
        len(set(toks)) / len(toks),
    )
    z = 0.0
    for w, x in zip(ev.EVAL_WEIGHTS, f):
        z = z + w * x
    p = 1.0 / (1.0 + math.exp(-z))
    return math.floor(p * 1e6 + 0.5) / 1e6


def _auc_py(pairs):
    pos = [p for y, p in pairs if y == 1]
    neg = [p for y, p in pairs if y == 0]
    s = 0.0
    for pp in pos:
        for pn in neg:
            s += 1.0 if pp > pn else (0.5 if pp == pn else 0.0)
    return s / (len(pos) * len(neg))


ROWS = [
    (1, "en", "a b c d e f g h", 40),
    (2, "en", "a a a a a a a a a a a a", 30),
    (3, "de", "x y z x y z", 25),
    (4, "fr", "m n o p q r s t u v w", 800),
    (5, "en", "k " * 499 + "k", 900),  # 500 tokens, 1 distinct
    (6, "es", "a b c d e f g h", 40),  # score-tied with doc 1
]


def test_scored_matches_python_model(spark):
    out = {r.y: None for r in []}
    got = ev.scored(_docs(spark, ROWS)).collect()
    exp = sorted(
        ((1 if lang == "en" else 0), _p_py(lang, text, n)) for _, lang, text, n in ROWS
    )
    assert sorted((r.y, r.p) for r in got) == exp


def test_eval_report_confusion_counts(spark):
    row = ev.classifier_eval_report(_docs(spark, ROWS)).collect()[0]
    scores = [
        ((1 if lang == "en" else 0), _p_py(lang, text, n))
        for _, lang, text, n in ROWS
    ]
    tp = sum(1 for y, p in scores if y == 1 and p >= 0.5)
    fp = sum(1 for y, p in scores if y == 0 and p >= 0.5)
    fn = sum(1 for y, p in scores if y == 1 and p < 0.5)
    tn = sum(1 for y, p in scores if y == 0 and p < 0.5)
    assert (row.tp, row.fp, row.fn, row.tn) == (tp, fp, fn, tn)
    assert row.n == len(ROWS) == tp + fp + fn + tn
    assert row.accuracy == math.floor((tp + tn) / len(ROWS) * 1e6 + 0.5) / 1e6


def test_roc_auc_matches_pairwise_definition_with_ties(spark):
    row = ev.roc_auc(_docs(spark, ROWS)).collect()[0]
    scores = [
        ((1 if lang == "en" else 0), _p_py(lang, text, n))
        for _, lang, text, n in ROWS
    ]
    want = _auc_py(scores)
    assert row.n_pos == 3 and row.n_neg == 3
    assert abs(row.auc - want) <= 1e-6
    # docs 1 and 6 are identical text with different labels -> a true tie
    # crosses the class boundary, so the 0.5 credit is actually exercised
    assert len({p for y, p in scores}) < len(scores)


def test_calibration_bins_partition_and_clamp(spark):
    rows = ROWS + [(7, "en", "t " * 1999 + "t", 950)]  # p quantizes to 1.0
    out = ev.calibration_bins(_docs(spark, rows)).collect()
    assert sum(r.n for r in out) == len(rows)
    assert max(r.bin for r in out) == ev.EVAL_CAL_BINS - 1  # clamped, not bin 10
    for r in out:
        assert 0 <= r.bin < ev.EVAL_CAL_BINS
        assert 0 <= r.pos_rate <= 1.0
        assert r.n_pos <= r.n


def test_gains_lift_totals(spark):
    out = ev.gains_lift_table(_docs(spark, ROWS)).collect()
    last = out[-1]  # lowest bin row = whole corpus
    assert last.cum_n == len(ROWS)
    assert last.capture_rate == 1.0
    assert last.cum_lift == 1.0
    caps = [r.capture_rate for r in out]
    assert caps == sorted(caps)  # monotone as the slice widens


def test_isotonic_calibration_monotone_and_matches_pav(spark):
    """Constructed bins with a monotonicity violation: the minimax
    formula must reproduce classic PAV pooling and the output must be
    non-decreasing in bin order."""
    from cocktailsdb_spark.operators import evaluation

    # bin rates 0.2, 0.8, 0.4: PAV pools bins 1,2 -> (4+2)/10 = 0.6;
    # iso = .2, .6, .6 — drive the PAV math through a stubbed
    # calibration frame (the entry's scoring path has its own oracle)
    import pyspark.sql.functions as F
    from unittest import mock

    bins = spark.createDataFrame(
        [(0, 5, 1), (1, 5, 4), (2, 5, 2)], "bin int, n long, n_pos long"
    ).select("bin", "n", "n_pos",
             F.lit(0.0).alias("mean_score"), F.lit(0.0).alias("pos_rate"))
    with mock.patch.object(
        evaluation, "calibration_bins", return_value=bins
    ):
        rows = {r.bin: r for r in evaluation.isotonic_calibration(None).collect()}
    assert rows[0].isotonic_rate == 0.2
    assert rows[1].isotonic_rate == 0.6
    assert rows[2].isotonic_rate == 0.6
    vals = [rows[b].isotonic_rate for b in sorted(rows)]
    assert vals == sorted(vals)
