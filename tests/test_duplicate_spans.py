"""Semantic pins for duplicate_spans (operators/dedup.py), hand-computed
on tiny corpora — window merging, island breaks, intra-doc-only repeats."""

from __future__ import annotations

from cocktailsdb_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _words(*groups):
    return " ".join(groups)


def test_overlapping_windows_merge_into_one_span(spark):
    # docs 1 and 2 share a 10-token run: with n=4 that is 7 duplicated
    # start positions, all overlapping -> ONE span covering 10 tokens
    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    rows = [
        (1, f"a1 a2 {shared} a3"),
        (2, f"b1 {shared} b2 b3 b4"),
    ]
    out = {r.doc_id: r for r in dedup.duplicate_spans(_docs(spark, rows), n=4).collect()}
    assert out[1].n_spans == 1 and out[1].dup_tokens == 10
    assert out[2].n_spans == 1 and out[2].dup_tokens == 10
    assert out[1].n_tokens == 13
    assert out[1].dup_fraction == round(10 / 13, 6) or abs(
        out[1].dup_fraction - 10 / 13
    ) < 1e-6


def test_disjoint_shared_runs_stay_separate_spans(spark):
    # two shared 4-gram runs separated by >n unshared tokens -> 2 spans
    r1 = "x1 x2 x3 x4"
    r2 = "y1 y2 y3 y4"
    rows = [
        (1, f"{r1} f1 f2 f3 f4 f5 {r2}"),
        (2, f"{r1} g1 g2 g3 g4 g5 g6 g7 {r2}"),
    ]
    out = {r.doc_id: r for r in dedup.duplicate_spans(_docs(spark, rows), n=4).collect()}
    assert out[1].n_spans == 2 and out[1].dup_tokens == 8
    assert out[2].n_spans == 2 and out[2].dup_tokens == 8


def test_intra_doc_repeat_alone_is_not_duplication(spark):
    # doc 3 repeats its own phrase; no other doc shares it -> no row
    rows = [
        (3, "p q r s p q r s p q r s"),
        (4, "completely different words here today friend"),
    ]
    out = dedup.duplicate_spans(_docs(spark, rows), n=4).collect()
    assert out == []


def test_short_docs_excluded(spark):
    rows = [(5, "a b c"), (6, "a b c")]
    # 3 tokens < n=4 -> no grams, no rows
    assert dedup.duplicate_spans(_docs(spark, rows), n=4).collect() == []
