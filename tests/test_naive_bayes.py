"""Semantic pins for naive_bayes_langid (operators/text.py): separable
corpus recovery, prior dominance on ambiguous docs, smoothing behavior."""

from __future__ import annotations

from cocktailsdb_spark.operators import text as T


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_separable_vocab_perfect_confusion_diagonal(spark):
    rows = [
        (1, "der hund lief", "de"),
        (2, "der der hund", "de"),
        (3, "the dog ran", "en"),
        (4, "the the dog", "en"),
    ]
    out = {(r.lang, r.predicted): r.n_docs for r in T.naive_bayes_langid(_docs(spark, rows)).collect()}
    assert out == {("de", "de"): 2, ("en", "en"): 2}


def test_prior_breaks_ambiguous_docs(spark):
    # 'shared' appears equally in both classes per-token after smoothing;
    # doc 5 is pure 'shared' -> the 3-vs-1 prior decides: predicted 'en'.
    rows = [
        (1, "shared alpha", "en"),
        (2, "shared beta", "en"),
        (3, "shared gamma", "en"),
        (4, "shared delta", "de"),
        (5, "shared shared", "de"),
    ]
    out = {(r.lang, r.predicted): r.n_docs for r in T.naive_bayes_langid(_docs(spark, rows)).collect()}
    # doc 5 by hand (V=5 terms, T_en=6, T_de=4, c(shared,en)=3, c(shared,de)=3):
    #   de: 2·ln((3+1)/(4+5)) + ln(2/5) = -2.538
    #   en: 2·ln((3+1)/(6+5)) + ln(3/5) = -2.534  -> en wins on the prior
    assert out[("de", "en")] >= 1


def test_unseen_cross_class_terms_are_smoothed_not_fatal(spark):
    # 'zug' never appears in en training text; an en doc containing it
    # still scores finitely and en wins on its majority tokens.
    rows = [
        (1, "the cat sat", "en"),
        (2, "the cat ran", "en"),
        (3, "zug fahren", "de"),
        (4, "the cat zug", "en"),
    ]
    out = {(r.lang, r.predicted): r.n_docs for r in T.naive_bayes_langid(_docs(spark, rows)).collect()}
    assert out.get(("en", "en"), 0) == 3


def test_single_corpus_tokenize_in_final_plan(spark):
    """r14: the model build (vocab / counts / totals) derives from ONE
    materialized (lang, term) count frame, so the only explode left in
    the final plan is the scoring pass — a regression re-attaching the
    model subtrees to the corpus scan re-adds explodes here."""
    rows = [
        (1, "der hund lief", "de"),
        (2, "the dog ran", "en"),
    ]
    from tools.plan_audit import fmt_plan

    plan = fmt_plan(T.naive_bayes_langid(_docs(spark, rows)))
    assert plan.lower().count("explode") <= 1, plan
