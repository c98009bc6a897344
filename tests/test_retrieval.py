"""Semantic pins for the retrieval operators (operators/retrieval.py):
hand-computed BM25 on a tiny corpus and posting-list construction,
independent of the DuckDB oracle."""

from __future__ import annotations

import math

from cocktailsdb_spark.operators import retrieval


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _bm25_score(pairs, dl, avgdl, n_docs, k1=1.2, b=0.75):
    """pairs: list of (tf, df) per matched query term for one doc."""
    total = 0
    for tf, df in pairs:
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        c = idf * (tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl)))
        total += math.floor(c * 1e6 + 0.5)
    return total / 1e6


def test_bm25_hand_computed(spark):
    d = _docs(
        spark,
        [
            (1, "en", "data data query x"),  # both query terms, tf 2 + 1
            (2, "en", "data x y z"),  # one term
            (3, "en", "u v w z"),  # no match: absent from output
        ],
    )
    out = retrieval.bm25_rank(d, query_terms=("data", "query"), top_k=10)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2}
    avgdl = 4.0
    exp1 = _bm25_score([(2, 2), (1, 1)], dl=4, avgdl=avgdl, n_docs=3)
    exp2 = _bm25_score([(1, 2)], dl=4, avgdl=avgdl, n_docs=3)
    assert rows[1].score == exp1
    assert rows[2].score == exp2
    assert rows[1].rank == 1 and rows[1].n_terms_hit == 2
    assert rows[2].rank == 2 and rows[2].n_terms_hit == 1


def test_bm25_top_k_cuts(spark):
    d = _docs(spark, [(i, "en", "data x") for i in range(20)])
    out = retrieval.bm25_rank(d, query_terms=("data",), top_k=5).collect()
    assert len(out) == 5
    # identical scores → doc_id ascending tiebreak
    assert [r.doc_id for r in out] == [0, 1, 2, 3, 4]


def test_term_bucket_python_matches_jvm(spark):
    """The probe computes query-term buckets with zlib.crc32 on the
    driver; the index writer partitions with F.crc32 on executors — the
    two must agree for every term or probes silently miss postings."""
    terms = ["data", "query", "window", "a", "ünïcode", "", "x" * 50]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {
        r.term: r.b
        for r in df.select(
            "term", retrieval._term_bucket_col(__import__("pyspark").sql.functions.col("term")).alias("b")
        ).collect()
    }
    for t in terms:
        assert got[t] == retrieval._term_bucket_py(t), t


def test_bm25_stored_equals_inplan(spark, tmp_path):
    """The at-rest probe must be row-identical to the in-plan ranker —
    same scores (manifest integer stats → same IEEE avgdl division),
    same order."""
    docs = _docs(
        spark,
        [
            (1, "en", "data data query x"),
            (2, "en", "data x y z"),
            (3, "en", "u v w z"),
            (4, "en", "query query data window w"),
        ],
    )
    src = str(tmp_path / "docs_src.parquet")
    docs.write.parquet(src)
    ix = str(tmp_path / "postings_ix")
    retrieval.postings_index_write(spark, docs, ix, src)
    stored = retrieval.bm25_rank_stored(
        spark, ix, query_terms=("data", "query", "window")
    ).collect()
    inplan = retrieval.bm25_rank(
        docs, query_terms=("data", "query", "window")
    ).collect()
    assert stored == inplan
    assert len(stored) == 3  # doc 3 matches nothing


def test_postings_upsert_equals_full_rebuild(spark, tmp_path):
    """Append-postings + additive manifest stats must give bit-identical
    probe results to rebuilding the index over base ∪ delta (BM25's
    global inputs are all additive)."""
    base = _docs(
        spark,
        [(1, "en", "data data query x"), (2, "en", "data x y z"), (3, "en", "u v w")],
    )
    delta = _docs(
        spark, [(4, "en", "query query data window w"), (5, "en", "window data")]
    )
    src = str(tmp_path / "src.parquet")
    base.write.parquet(src)
    ix_incr = str(tmp_path / "ix_incr")
    retrieval.postings_index_write(spark, base, ix_incr, src)
    retrieval.postings_index_upsert(spark, ix_incr, delta)
    ix_full = str(tmp_path / "ix_full")
    retrieval.postings_index_write(spark, base.unionByName(delta), ix_full, src)
    got = retrieval.bm25_rank_stored(spark, ix_incr).collect()
    want = retrieval.bm25_rank_stored(spark, ix_full).collect()
    assert got == want and len(got) == 4

    from cocktailsdb_spark.sources.formats import _read_manifest

    m = _read_manifest(ix_incr, "_MANIFEST")
    assert m["version"] == 2 and m["n_docs"] == 5 and m["sum_dl"] == 4 + 4 + 3 + 5 + 2


def test_crashed_upsert_segment_is_invisible(spark, tmp_path):
    """A crashed upsert = segment files on disk, manifest not yet
    swapped. The probe must serve the PREVIOUS index exactly — postings
    and stats stay consistent because both only become visible via the
    manifest pointer."""
    base = _docs(spark, [(1, "en", "data data query x"), (2, "en", "data x y z")])
    delta = _docs(spark, [(3, "en", "query data window")])
    src = str(tmp_path / "src.parquet")
    base.write.parquet(src)
    ix = str(tmp_path / "ix")
    retrieval.postings_index_write(spark, base, ix, src)
    before = retrieval.bm25_rank_stored(spark, ix).collect()
    # simulate the crash: segment written, manifest never updated
    import os

    retrieval._write_postings_segment(delta, os.path.join(ix, "seg2"))
    after = retrieval.bm25_rank_stored(spark, ix).collect()
    assert after == before
    # completing the upsert publishes postings AND stats together
    retrieval.postings_index_upsert(spark, ix, delta)
    full = retrieval.bm25_rank_stored(spark, ix).collect()
    assert {r.doc_id for r in full} == {1, 2, 3}


def test_compaction_preserves_probe_and_drops_old_segments(spark, tmp_path):
    import os

    base = _docs(spark, [(1, "en", "data data query x"), (2, "en", "data x y z")])
    delta = _docs(spark, [(3, "en", "query data window")])
    src = str(tmp_path / "src.parquet")
    base.write.parquet(src)
    ix = str(tmp_path / "ix")
    retrieval.postings_index_write(spark, base, ix, src)
    retrieval.postings_index_upsert(spark, ix, delta)
    before = retrieval.bm25_rank_stored(spark, ix).collect()
    retrieval.postings_index_compact(spark, ix)
    assert retrieval.bm25_rank_stored(spark, ix).collect() == before

    from cocktailsdb_spark.sources.formats import _read_manifest

    m = _read_manifest(ix, "_MANIFEST")
    assert m["segments"] == ["seg3"] and m["version"] == 3
    assert not os.path.exists(os.path.join(ix, "seg1"))
    assert not os.path.exists(os.path.join(ix, "seg2"))
    # single-segment compaction is a no-op
    retrieval.postings_index_compact(spark, ix)
    assert _read_manifest(ix, "_MANIFEST")["version"] == 3


def test_bm25_stored_refuses_wrong_bucket_constant(spark, tmp_path):
    import pytest

    from cocktailsdb_spark.sources.formats import _read_manifest, _write_manifest

    docs = _docs(spark, [(1, "en", "data x")])
    src = str(tmp_path / "src.parquet")
    docs.write.parquet(src)
    ix = str(tmp_path / "ix")
    retrieval.postings_index_write(spark, docs, ix, src)
    m = _read_manifest(ix, "_MANIFEST")
    _write_manifest(ix, {**m, "params": {"buckets": 7}}, "_MANIFEST")
    with pytest.raises(ValueError, match="different bucket constant"):
        retrieval.bm25_rank_stored(spark, ix)


def _ranking(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rank int")


def test_rrf_fuse_hand_computed(spark):
    lex = _ranking(spark, [(10, 1), (20, 2), (30, 3)])
    sem = _ranking(spark, [(20, 1), (40, 2)])
    out = {r.doc_id: r for r in retrieval.rrf_fuse({"lex": lex, "sem": sem}).collect()}
    assert set(out) == {10, 20, 30, 40}

    def recip(rank, k0=60):
        return math.floor(1e6 / (k0 + rank)) / 1e6

    # doc 20 is in both rankings → the fused winner
    assert out[20].rrf_score == recip(2) + recip(1)
    assert (out[20].lex_rank, out[20].sem_rank, out[20].n_rankers) == (2, 1, 2)
    assert out[20].rank == 1
    assert out[10].rrf_score == recip(1)
    assert out[10].sem_rank is None and out[10].n_rankers == 1
    # doc 10 (lex rank 1) beats doc 40 (sem rank 2) beats doc 30 (lex rank 3)
    assert [r.doc_id for r in sorted(out.values(), key=lambda r: r.rank)] == [
        20, 10, 40, 30,
    ]


def test_rrf_fuse_top_k_and_tiebreak(spark):
    # equal reciprocal scores → doc_id ascending decides the fused order
    lex = _ranking(spark, [(5, 1), (3, 2)])
    sem = _ranking(spark, [(7, 1), (9, 2)])
    out = retrieval.rrf_fuse({"lex": lex, "sem": sem}, top_k=3).collect()
    assert [r.doc_id for r in out] == [5, 7, 3]
    assert [r.rank for r in out] == [1, 2, 3]


def test_phrase_match_hand_computed(spark):
    d = _docs(
        spark,
        [
            (1, "en", "data query x data query"),  # two occurrences
            (2, "en", "query data"),  # reversed — no match
            (3, "en", "x data query y"),  # one, offset start
            (4, "en", "data x query"),  # gap — no match
        ],
    )
    out = {r.doc_id: r for r in retrieval.phrase_match(d, ("data", "query")).collect()}
    assert set(out) == {1, 3}
    assert (out[1].n_occurrences, out[1].first_pos) == (2, 1)
    assert (out[3].n_occurrences, out[3].first_pos) == (1, 2)


def test_phrase_match_repeated_terms(spark):
    d = _docs(spark, [(1, "en", "a a a b"), (2, "en", "a b a")])
    out = {r.doc_id: r for r in retrieval.phrase_match(d, ("a", "a")).collect()}
    assert set(out) == {1}
    assert out[1].n_occurrences == 2  # positions (1,2) and (2,3)
    three = retrieval.phrase_match(d, ("a", "a", "b")).collect()
    assert [(r.doc_id, r.n_occurrences, r.first_pos) for r in three] == [(1, 1, 2)]


def test_snippet_extract_hand_computed(spark):
    d = _docs(
        spark,
        [
            (1, "en", "a b c data e f g h"),  # hit mid — full ±2 window
            (2, "en", "query b c"),  # hit at start — clipped left
            (3, "en", "a b c d window"),  # hit at end — clipped right
            (4, "en", "x y z"),  # no hit — absent
            (5, "en", "a data b query c"),  # two hits — first wins
        ],
    )
    out = {
        r.doc_id: r
        for r in retrieval.snippet_extract(
            d, ("data", "query", "window"), radius=2
        ).collect()
    }
    assert set(out) == {1, 2, 3, 5}
    assert (out[1].first_term, out[1].first_pos, out[1].snippet) == (
        "data", 4, "b c data e f",
    )
    assert (out[2].first_term, out[2].first_pos, out[2].snippet) == (
        "query", 1, "query b c",
    )
    assert (out[3].first_term, out[3].first_pos, out[3].snippet) == (
        "window", 5, "c d window",
    )
    assert (out[5].first_term, out[5].first_pos, out[5].snippet) == (
        "data", 2, "a data b query",
    )


def test_terms_near_hand_computed(spark):
    d = _docs(
        spark,
        [
            (1, "en", "data x window"),  # dist 2 — within 3
            (2, "en", "window y y data"),  # dist 3, reversed order — within
            (3, "en", "data a b c window"),  # dist 4 — out
            (4, "en", "data window data"),  # pairs: (1,2)=1, (2,3)=1
        ],
    )
    out = {r.doc_id: r for r in retrieval.terms_near(d, "data", "window", 3).collect()}
    assert set(out) == {1, 2, 4}
    assert (out[1].n_pairs, out[1].min_dist) == (1, 2)
    assert (out[2].n_pairs, out[2].min_dist) == (1, 3)
    assert (out[4].n_pairs, out[4].min_dist) == (2, 1)


def test_inverted_index_postings(spark):
    d = _docs(spark, [(1, "en", "a b a"), (2, "en", "b a")])
    out = {r.term: r for r in retrieval.inverted_index(d).collect()}
    assert (out["a"].n_docs, out["a"].n_postings) == (2, 3)
    assert out["a"].postings == "1:1,1:3,2:2"
    assert (out["b"].n_docs, out["b"].n_postings) == (2, 2)
    assert out["b"].postings == "1:2,2:1"


def test_inverted_index_cap_bounds_postings_not_counts(spark):
    d = _docs(spark, [(i, "en", "hot hot hot") for i in range(10)])
    [r] = retrieval.inverted_index(d, max_postings=4).collect()
    assert r.n_postings == 30  # exact count survives the cap
    assert r.postings.count(",") == 3  # list itself is capped at 4 entries
    assert r.postings == "0:1,0:2,0:3,1:1"


def test_bool_search_clause_semantics(spark):
    d = _docs(
        spark,
        [
            (1, "en", "data query window"),  # must ok, 1 should — in
            (2, "en", "data query"),  # must ok, 0 should — out (min_should)
            (3, "en", "data window stream"),  # missing must 'query' — out
            (4, "en", "data query stream dup"),  # must_not hit — out
            (5, "en", "data query vector stream"),  # must ok, 2 should — in
        ],
    )
    out = {
        r.doc_id: r
        for r in retrieval.bool_search(
            d,
            must=("data", "query"),
            should=("window", "stream", "vector"),
            must_not=("dup",),
            min_should=1,
        ).collect()
    }
    assert set(out) == {1, 5}
    assert (out[1].n_must, out[1].n_should) == (2, 1)
    assert (out[5].n_must, out[5].n_should) == (2, 2)


def test_bool_search_score_is_bm25_over_scoring_terms(spark):
    d = _docs(
        spark,
        [
            (1, "en", "data query window x"),
            (2, "en", "data a b c"),
            (3, "en", "query window y z"),
        ],
    )
    [r] = retrieval.bool_search(
        d, must=("data",), should=("query", "window"), must_not=(), min_should=1
    ).collect()
    assert r.doc_id == 1
    # df over docs containing each term: data 2, query 2, window 2; dl=4
    exp = _bm25_score([(1, 2), (1, 2), (1, 2)], dl=4, avgdl=4.0, n_docs=3)
    assert r.score == exp
    assert (r.n_must, r.n_should, r.rank) == (1, 2, 1)


# --- prefix_completions ------------------------------------------------------


def _ac_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_prefix_completions_ranking_and_self_match(spark):
    from cocktailsdb_spark.operators.retrieval import prefix_completions

    texts = ["scan scan scan scale", "scale score", "scan score score"]
    out = prefix_completions(_ac_docs(spark, texts), min_count=2, k=2).collect()
    by_pfx = {}
    for r in out:
        by_pfx.setdefault(r.prefix, []).append((r.rank, r.term, r.n))
    # 'sc' -> scan(4) then score(3); k=2 drops scale(2)
    assert by_pfx["sc"] == [(1, "scan", 4), (2, "score", 3)]
    # full term is its own completion
    assert by_pfx["scan"] == [(1, "scan", 4)]
    # 'sca' -> scan then scale
    assert by_pfx["sca"] == [(1, "scan", 4), (2, "scale", 2)]


def test_prefix_completions_min_count_and_maxlen(spark):
    from cocktailsdb_spark.operators.retrieval import prefix_completions

    texts = ["rare supercalifragilistic supercalifragilistic"]
    out = prefix_completions(_ac_docs(spark, texts), max_len=4, min_count=2, k=3).collect()
    # 'rare' occurs once -> excluded entirely; long term truncates at 4
    prefixes = {r.prefix for r in out}
    assert prefixes == {"s", "su", "sup", "supe"}
