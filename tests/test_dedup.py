"""Dedup family on planted duplicates (the fixture corpus has none, so the
tests construct exact and near duplicates and check each detector fires)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cocktailsdb_spark.operators import dedup

BASE = "the quick brown fox jumps over the lazy dog and runs far away today"
NEAR = "the quick brown fox jumps over the lazy dog and runs far away tonight"
OTHER = "completely different content with no overlap whatsoever in any gram here"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE, "en", "src1"),
        (1, BASE, "en", "src2"),      # exact dup of 0
        (2, NEAR, "en", "src3"),      # near dup of 0 (one token differs)
        (3, OTHER, "en", "src4"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs, "text", "doc_id")
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {0, 2, 3}  # lowest id wins for the exact pair


def test_latest_wins_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "a", "2021-01-01"), (1, "b", "2021-01-02"), (2, "c", "2021-01-01")],
        "k long, v string, modified string",
    )
    out = dedup.latest_wins(df, ["k"], ["modified", "v"])
    assert {(r["k"], r["v"]) for r in out.collect()} == {(1, "b"), (2, "c")}


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (0, 1) in found          # exact pair → jaccard 1.0
    assert (0, 2) in found or (1, 2) in found  # near pair above 0.5
    assert not any(3 in p for p in found)


def test_simhash_near_dup(docs):
    fps = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert fps[0] == fps[1]  # identical text → identical fingerprint
    ham_near = bin(fps[0] ^ fps[2]).count("1")
    ham_far = bin(fps[0] ^ fps[3]).count("1")
    assert ham_near < ham_far  # near dup closer than unrelated doc


def test_minhash_lsh_finds_near_dup(spark, docs):
    pairs = dedup.minhash_lsh_pairs(docs, spark, threshold=0.5).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (0, 1) in found


def test_embedding_near_dup(spark):
    v = [1.0] * 8
    near = [1.0] * 7 + [1.1]
    orth = [1.0, -1.0] * 4
    df = spark.createDataFrame(
        [(0, v, 1), (1, near, 1), (2, orth, 1)],
        "vec_id long, embedding array<float>, label int",
    )
    out = dedup.embedding_near_dup(df, threshold=0.95).collect()
    assert {(r["vec_a"], r["vec_b"]) for r in out} == {(0, 1)}
