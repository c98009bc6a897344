"""§2.8 UDF/UDAF/UDTF surface: Python table function + grouped-agg pandas
UDF, pinned against hand-computed expectations."""

from __future__ import annotations

from cocktailsdb_spark.operators import udx


def test_udtf_chunk_spans_cover_every_token(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(100))), (2, "only two")],
        "doc_id long, text string",
    )
    rows = udx.chunk_spans(spark, docs).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 100 tokens, stride 48 → starts 1, 49, 97
    spans = sorted((r["start_tok"], r["n_tokens"]) for r in by_doc[1])
    assert spans == [(1, 64), (49, 52), (97, 4)]
    # every token index in [1, 100] is covered by some span
    covered = set()
    for s, n in spans:
        covered.update(range(s, s + n))
    assert covered == set(range(1, 101))
    # doc 2: 2 tokens → one span
    assert [(r["start_tok"], r["n_tokens"]) for r in by_doc[2]] == [(1, 2)]


def test_udaf_median_matches_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (1, 99.0), (2, 5.0), (2, 7.0)],
        "k long, v double",
    )
    got = {r["k"]: r["median_value"] for r in udx.median_by_key(df, "k", "v").collect()}
    assert got == {1: 20.0, 2: 6.0}


def test_polymorphic_udtf_schema_follows_n(spark):
    from cocktailsdb_spark.operators import udx

    docs = spark.createDataFrame(
        [(1, "a b c d")], "doc_id long, text string"
    )
    two = udx.ngram_cols(spark, docs, n=2)
    assert two.columns == ["doc_id", "w1", "w2"]
    assert two.count() == 3
    four = udx.ngram_cols(spark, docs, n=4)
    assert four.columns == ["doc_id", "w1", "w2", "w3", "w4"]
    rows = four.collect()
    assert len(rows) == 1 and (rows[0].w1, rows[0].w4) == ("a", "d")


def test_arrow_token_stats_nulls_and_values(spark):
    from cocktailsdb_spark.operators import udx

    docs = spark.createDataFrame(
        [(1, "a bb ccc"), (2, None)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in udx.arrow_token_stats(docs).collect()}
    assert (out[1].n_tokens, out[1].n_chars) == (3, 8)
    # NULL text coalesces to "" -> one empty token, zero chars (matches
    # the DuckDB twin's string_split('') semantics)
    assert (out[2].n_tokens, out[2].n_chars) == (1, 0)


def test_cogroup_asof_matches_jvm_asof(spark):
    import datetime as dt

    from cocktailsdb_spark.operators import events as E
    from cocktailsdb_spark.operators import udx

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        (1, t(10), 1, "purchase", 1.0, None),
        (2, t(10), 1, "signup", 1.0, None),    # same-ts inclusive tie
        (3, t(5), 1, "signup", 1.0, None),
        (4, t(3), 2, "purchase", 1.0, None),   # purchase before any signup
        (5, t(7), 2, "signup", 1.0, None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    jvm = {(r.purchase_id, r.signup_id) for r in E.asof_latest(ev).collect()}
    pdx = {(r.purchase_id, r.signup_id) for r in udx.cogroup_asof_pandas(ev).collect()}
    assert jvm == pdx == {(1, 2), (4, None)}
