"""Semantic pins for the document-quality filter operators
(operators/filters.py) and TF-IDF (operators/corpus.py) — hand-computed
expectations on tiny frames, independent of the DuckDB oracle."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cocktailsdb_spark.operators import corpus, filters


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_repetition_stats_hand_computed(spark):
    # "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] → 5 total, 2 distinct
    d = _docs(spark, [(1, "en", "a b a b a b")])
    [r] = filters.repetition_stats(d).collect()
    assert (r.n_grams, r.distinct_grams) == (5, 2)
    assert r.dup_gram_frac == 0.6
    assert r.top_gram == "a b"  # cnt 3 beats "b a" cnt 2
    # 3 occurrences x 3 chars over 11 chars = 0.8182 (qround 4dp)
    assert r.top_gram_char_frac == 0.8182


def test_repetition_stats_tiebreak_and_short_doc(spark):
    d = _docs(
        spark,
        [
            (1, "en", "z y z y"),  # "z y" x2 beats "y z" x1
            (2, "en", "solo"),  # too short for a 2-gram: drops out
        ],
    )
    rows = {r.doc_id: r for r in filters.repetition_stats(d).collect()}
    assert set(rows) == {1}
    assert rows[1].top_gram == "y z" or rows[1].top_gram == "z y"
    assert rows[1].top_gram == "z y"


def test_pii_redact_counts_and_placeholders(spark):
    d = _docs(
        spark,
        [
            (1, "en", "mail bob@corp.example.com and call 555-123-4567"),
            (2, "en", "server at 192.168.1.17 and 10.0.0.5"),
            (3, "en", "nothing sensitive here"),
        ],
    )
    rows = {r.doc_id: r for r in filters.pii_redact(d).collect()}
    assert rows[1].clean_text == "mail <EMAIL> and call <PHONE>"
    assert (rows[1].n_emails, rows[1].n_phones, rows[1].n_ips) == (1, 1, 0)
    assert rows[2].clean_text == "server at <IP> and <IP>"
    assert rows[2].n_ips == 2
    assert rows[3].clean_text == "nothing sensitive here"
    assert (rows[3].n_emails, rows[3].n_phones, rows[3].n_ips) == (0, 0, 0)


def test_hash_split_deterministic_and_stable_under_repartition(spark):
    d = _docs(spark, [(i, "en", "x") for i in range(200)])
    once = {r.doc_id: r.split for r in filters.hash_split(d).collect()}
    again = {
        r.doc_id: r.split
        for r in filters.hash_split(d.repartition(7, "doc_id")).collect()
    }
    assert once == again
    # thresholds actually produce all three splits on 200 ids
    assert set(once.values()) == {"train", "valid", "test"}
    frac_train = sum(v == "train" for v in once.values()) / len(once)
    assert 0.7 < frac_train < 0.9


def test_tfidf_top_terms_hand_computed(spark):
    # 3 docs; "rare" only in doc 1, "common" everywhere.
    d = _docs(
        spark,
        [
            (1, "en", "common rare rare"),
            (2, "en", "common common other"),
            (3, "en", "common other other"),
        ],
    )
    out = corpus.tfidf_top_terms(d, top_k=2)
    rows = {(r.doc_id, r.term): r for r in out.collect()}
    r = rows[(1, "rare")]
    assert (r.tf, r.df) == (2, 1)
    expect = 2 * (math.log((3 + 1) / (1 + 1)) + 1)
    assert abs(r.tfidf - expect) < 1e-3
    assert r.rank == 1  # idf-boosted rare term outranks common
    assert rows[(1, "common")].rank == 2
    # every doc has exactly top_k rows (3 distinct terms ≥ 2 each)
    assert len(rows) == 6


def test_tfidf_ranks_unique_per_doc(spark, sf_dir):
    from cocktailsdb_spark.tables import load

    out = corpus.tfidf_top_terms(load(spark, sf_dir, "documents"))
    dup = (
        out.groupBy("doc_id", "rank")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0


def test_inject_pii_is_deterministic_salt(spark):
    d = _docs(spark, [(3, "en", "base"), (4, "en", "base"), (5, "en", "base")])
    rows = {r.doc_id: r.text for r in filters.inject_pii(d).collect()}
    assert rows[3] == "base user3@mail.example.com"
    assert rows[4] == "base 555-867-5309"
    assert rows[5] == "base 10.0.0.5"


def test_k_anonymity_report_gate(spark):
    df = spark.createDataFrame(
        [(i, i % 2, "A") for i in range(10)] + [(99, 7, "B")],
        "c_custkey long, c_nationkey int, c_mktsegment string",
    )
    r = filters.k_anonymity_report(df, k=5).collect()[0]
    # classes: (0,A)=5, (1,A)=5, (7,B)=1 → one singleton below k
    assert r["min_class_size"] == 1
    assert r["n_classes"] == 3
    assert r["n_rows"] == 11
    assert r["n_rows_below_k"] == 1
    assert abs(r["pct_below_k"] - 1 / 11) < 1e-6
    # the release-gate-passes case
    ok = filters.k_anonymity_report(df.filter("c_mktsegment = 'A'"), k=5).collect()[0]
    assert ok["n_rows_below_k"] == 0 and ok["pct_below_k"] == 0.0
