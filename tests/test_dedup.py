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
    rows = {r["doc_id"]: r for r in dedup.simhash(docs).collect()}
    # identical text → identical 64-bit fingerprint (hex + all 4 bands)
    assert rows[0]["simhash"] == rows[1]["simhash"]
    assert len(rows[0]["simhash"]) == 16  # 64 bits, 4 × 4 hex chars
    # packed hex string agrees with the band ints
    for b in range(4):
        assert rows[0]["simhash"][4 * b : 4 * b + 4] == format(rows[0][f"band{b}"], "04x")
    fp = lambda r: int(r["simhash"], 16)
    ham_near = bin(fp(rows[0]) ^ fp(rows[2])).count("1")
    ham_far = bin(fp(rows[0]) ^ fp(rows[3])).count("1")
    assert ham_near < ham_far  # near dup closer than unrelated doc


def test_simhash_banding_recall_and_max_hamming_guard(docs):
    import pytest as _pytest

    pairs = dedup.simhash_near_dup_pairs(docs, max_hamming=3).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (0, 1) in found  # hamming 0 — always recalled
    # 4 bands only guarantee recall up to hamming 3; asking for more raises
    with _pytest.raises(ValueError):
        dedup.simhash_near_dup_pairs(docs, max_hamming=4)


def test_simhash_64bit_banding_shrinks_candidates(spark, sf_dir):
    """The round-1 weakness: 16-bit fingerprints with 8-bit bands collide
    massively. Rebuild that degenerate banding from band3 (low 16 bits) and
    show the 4×16-bit banding yields strictly fewer candidate pairs on the
    real documents fixture."""
    from pyspark.sql import functions as F

    from cocktailsdb_spark.constants import SIMHASH_BANDS
    from cocktailsdb_spark.tables import load

    fps = dedup.simhash(load(spark, sf_dir, "documents")).cache()

    def n_candidates(bands):
        a, b = bands.alias("a"), bands.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_val") == F.col("b.band_val"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select("a.doc_id", "b.doc_id")
            .distinct()
            .count()
        )

    wide = None
    for b in range(SIMHASH_BANDS):
        sel = fps.select(
            "doc_id", F.lit(b).alias("band_id"), F.col(f"band{b}").alias("band_val")
        )
        wide = sel if wide is None else wide.unionByName(sel)
    narrow = fps.select(
        "doc_id", F.lit(0).alias("band_id"), (F.col("band3") % 256).alias("band_val")
    ).unionByName(
        fps.select("doc_id", F.lit(1).alias("band_id"), (F.col("band3") / 256).cast("int").alias("band_val"))
    )
    n_wide, n_narrow = n_candidates(wide), n_candidates(narrow)
    fps.unpersist()
    assert n_wide < n_narrow, f"64-bit banding should shrink candidates: {n_wide} vs {n_narrow}"


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


def test_edit_distance_pairs_blocking_and_verify(spark):
    from cocktailsdb_spark.operators.dedup import edit_distance_pairs

    df = spark.createDataFrame(
        [("red bolt",), ("red belt",), ("red b",), ("ted bolt",), ("blue cap",)],
        "p_name string",
    )
    out = {(r.name_a, r.name_b): r.dist
           for r in edit_distance_pairs(df, max_dist=2).collect()}
    # same first-letter block, dist 1 → matched
    assert out[("red belt", "red bolt")] == 1
    # "red b" is 3 edits from "red bolt" → filtered by the verify step
    assert ("red b", "red bolt") not in out
    # "ted bolt" is 1 edit from "red bolt" but a DIFFERENT block: missed
    # by design (documented candidate-recall blocking)
    assert not any("ted bolt" in k for k in out)
    assert all(a < b for a, b in out)  # canonical pair ordering


def test_dedup_canonical_decision(spark, sf_dir):
    """Exactly one canonical per cluster; singletons keep themselves; the
    kept member has the cluster's max quality (id-asc tiebreak)."""
    from cocktailsdb_spark.operators.dedup import dedup_canonical
    from cocktailsdb_spark.operators.text import quality_score
    from cocktailsdb_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    out = dedup_canonical(docs).collect()
    assert len(out) == docs.count()  # one decision per document
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    q = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    for cid, members in by_cluster.items():
        canons = [r for r in members if r["is_canonical"]]
        assert len(canons) == 1, cid
        assert all(r["n_members"] == len(members) for r in members)
        best = max(members, key=lambda r: (q[r["doc_id"]], -r["doc_id"]))
        assert canons[0]["doc_id"] == best["doc_id"]
        if len(members) == 1:
            assert members[0]["doc_id"] == cid


def test_boilerplate_ngrams_detects_shared_phrase(docs):
    # BASE appears verbatim in docs 0, 1 and (minus the last token) 2 —
    # every 5-gram not touching the final token is shared by 3 docs
    out = dedup.boilerplate_ngrams(docs, n=5, min_docs=3)
    grams = {r["gram"]: r["n_docs"] for r in out.collect()}
    assert "the quick brown fox jumps" in grams
    assert grams["the quick brown fox jumps"] == 3
    # nothing from the unrelated doc reaches the threshold
    assert not any("whatsoever" in g for g in grams)


def test_boilerplate_coverage_ratio(docs):
    out = {r["doc_id"]: r for r in dedup.boilerplate_coverage(docs, n=5, min_docs=3).collect()}
    # doc 3 shares no grams: zero boilerplate, ratio 0
    assert out[3]["n_boiler"] == 0 and out[3]["boiler_ratio"] == 0.0
    # docs 0/1 are pure boilerplate except grams touching their last token
    # (doc 2's divergence point): 14 tokens → 10 grams, 9 boilerplate
    assert out[0]["n_grams"] == 10
    assert out[0]["n_boiler"] == 9
    assert 0.0 < out[2]["boiler_ratio"] < 1.0


def test_boilerplate_short_docs_excluded(spark):
    df = spark.createDataFrame(
        [(0, "too short"), (1, "also tiny")], "doc_id long, text string"
    )
    assert dedup.boilerplate_coverage(df, n=5, min_docs=2).count() == 0


def test_semantic_dedup_greedy_keep_first(spark):
    # two tight clusters; within each, all vectors are near-identical →
    # exactly the lowest id of each cell survives at a high threshold
    rows = [
        (0, [1.0, 0.0, 0.0, 0.01], 0),
        (1, [1.0, 0.0, 0.0, 0.02], 0),
        (2, [0.99, 0.01, 0.0, 0.0], 0),
        (10, [0.0, 1.0, 0.0, 0.01], 1),
        (11, [0.0, 0.99, 0.01, 0.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["vec_id"]: r for r in dedup.semantic_dedup(df, threshold=0.9).collect()}
    assert len(out) == 5  # every vector classified exactly once
    assert out[0]["kept"] and out[10]["kept"]
    assert not any(out[i]["kept"] for i in (1, 2, 11))
    # cells follow the label clusters
    assert out[0]["cell"] == out[1]["cell"] == out[2]["cell"]
    assert out[10]["cell"] == out[11]["cell"] != out[0]["cell"]


def test_semantic_dedup_fixture_partition(spark, sf_dir):
    from cocktailsdb_spark.tables import load

    out = dedup.semantic_dedup(load(spark, sf_dir, "embeddings"))
    total = load(spark, sf_dir, "embeddings").count()
    agg = out.groupBy("kept").count().collect()
    counts = {r["kept"]: r["count"] for r in agg}
    assert sum(counts.values()) == total
    assert counts.get(True, 0) > 0  # something always survives


def test_semantic_dedup_scaled_keeps_superset(spark, sf_dir):
    """The (cell × plane-bucket) form compares only WITHIN sub-buckets,
    so it can only ever drop fewer vectors than the per-cell form: its
    survivor set must be a superset, its cells must agree, and every
    vector classifies exactly once. Near-identical vectors (the greedy
    pin's tight clusters) share every hyperplane sign, so there the
    scaled form reproduces the naive survivors exactly."""
    from cocktailsdb_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    naive = {r["vec_id"]: r for r in dedup.semantic_dedup(emb).collect()}
    scaled = {r["vec_id"]: r for r in dedup.semantic_dedup_scaled(emb).collect()}
    assert set(naive) == set(scaled)
    for vid, r in scaled.items():
        assert r["cell"] == naive[vid]["cell"]
        if naive[vid]["kept"]:
            assert r["kept"]  # superset: scaled never drops a naive survivor

    # full-width 64-dim synthetic clusters (4-dim vectors against 64-dim
    # planes would null every projection and park everything in bucket 0
    # — the sub-bucketing would go unexercised, ADVICE-style vacuous)
    def v64(head, scale):
        return [float(x) * scale for x in head] + [0.0] * (64 - len(head))

    u0, u1 = [1.0, 0.3, -0.2, 0.05], [-0.4, 1.0, 0.25, -0.1]
    rows = [
        # exact scalar multiples: cosine is exactly 1 (>= any threshold)
        # and sign(proj(c*u)) == sign(proj(u)) for c > 0, so cluster-mates
        # land in the SAME sub-bucket by construction — the sub-bucketing
        # is exercised with real non-zero projections but cannot split a
        # duplicate pair
        (0, v64(u0, 1.0), 0),
        (1, v64(u0, 2.0), 0),
        (2, v64(u0, 0.5), 0),
        (10, v64(u1, 1.0), 1),
        (11, v64(u1, 3.0), 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {
        r["vec_id"]: r
        for r in dedup.semantic_dedup_scaled(df, threshold=0.9).collect()
    }
    assert len({out[i]["bucket"] for i in (0, 1, 2)}) == 1
    assert out[0]["kept"] and out[10]["kept"]
    assert not any(out[i]["kept"] for i in (1, 2, 11))


def test_make_planes_default_identity_and_cap():
    from cocktailsdb_spark.constants import N_PLANES, PLANES, make_planes

    assert make_planes(N_PLANES) == PLANES
    assert make_planes(16)[:7] == make_planes(7)  # families compose stably
    assert len({tuple(p) for p in make_planes(16)}) == 16  # all distinct
    with pytest.raises(ValueError, match="16 distinct"):
        make_planes(17)


def test_minhash_banded_finds_near_dup_and_verifies_exactly(docs):
    out = dedup.minhash_banded_pairs(docs, n=3, threshold=0.5).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out}
    # exact duplicates always collide in every band and score 1.0
    assert pairs.get((0, 1)) == 1.0
    # every emitted jaccard is exact (cross-check with the plain operator)
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.0).collect()
    }
    for key, j in pairs.items():
        assert exact[key] == j
    # candidate recall is probabilistic, so emitted ⊆ exact-threshold set
    assert set(pairs) <= {k for k, j in exact.items() if j >= 0.5}


def test_minhash_index_upsert_probe_and_params_guard(spark, sf_dir, tmp_path):
    """The at-rest band index: base build + delta upsert must give the
    probe exactly the pairs the one-shot banded operator finds for the
    delta docs; the manifest version-bumps; and probing an index whose
    manifest records different signature constants is a named error."""
    import json
    import os

    from pyspark.sql import functions as F

    from cocktailsdb_spark.sources.formats import _read_manifest, _write_manifest
    from cocktailsdb_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    is_delta = F.col("doc_id") % 4 == 1
    base, delta = docs.filter(~is_delta), docs.filter(is_delta)
    d = str(tmp_path / "band_ix")
    src = os.path.join(sf_dir, "documents.parquet")
    dedup.minhash_index_write(spark, base, d, src)
    m1 = _read_manifest(d, "_MANIFEST")
    dedup.minhash_index_upsert(spark, d, delta)
    m2 = _read_manifest(d, "_MANIFEST")
    assert m2["version"] == m1["version"] + 1
    assert m2["rows"] == docs.count()

    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.minhash_index_probe(spark, d, delta).collect()
    }
    want = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.minhash_banded_pairs(docs).collect()
        if r.doc_a % 4 == 1 or r.doc_b % 4 == 1
    }
    assert got == want

    bad = dict(m2)
    bad["params"] = {**bad["params"], "ab": [[1, 2, 3]]}
    _write_manifest(d, bad, "_MANIFEST")
    with pytest.raises(ValueError, match="different signature constants"):
        dedup.minhash_index_probe(spark, d, delta)


def test_minhash_band_recall_monotone_and_subset(spark):
    """More bands of fewer rows = laxer collision test: recall must be
    non-decreasing in band count over the same signature, and detected
    counts can never exceed truth (banded pairs are verified-exact)."""
    rows = []
    base = "join hash scan merge sort window batch stream filter group"
    for i in range(40):
        text = base + f" extra{i} tail{i} pad{i} more{i}"
        rows.append((i, text, "en", len(text)))
        # a true near-duplicate partner for even docs
        if i % 2 == 0:
            rows.append((1000 + i, text + " zz", "en", len(text) + 3))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars int"
    )
    from cocktailsdb_spark.operators import dedup

    out = {r.n_bands: r for r in dedup.minhash_band_recall(docs).collect()}
    assert list(out) == [2, 4, 8]
    recalls = [out[b].recall for b in (2, 4, 8)]
    assert recalls[0] <= recalls[1] <= recalls[2]
    for b in (2, 4, 8):
        assert out[b].n_detected <= out[b].n_true_pairs
        assert out[b].rows_per_band == 16 // b


def test_minhash_band_precision_consistency(spark):
    """The precision dial must agree with the recall dial's bookkeeping
    on the same corpus: per banding config, n_verified equals
    band_recall's n_detected (both are the verified-pair count of the
    same candidate set), n_candidates >= n_verified, candidate counts
    are non-decreasing in band count (laxer collision test admits more),
    and band_precision = n_verified / n_candidates."""
    import pytest

    rows = []
    base = "join hash scan merge sort window batch stream filter group"
    for i in range(40):
        text = base + f" extra{i} tail{i} pad{i} more{i}"
        rows.append((i, text, "en", len(text)))
        if i % 2 == 0:
            rows.append((1000 + i, text + " zz", "en", len(text) + 3))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars int"
    )
    from cocktailsdb_spark.operators import dedup

    prec = {r.n_bands: r for r in dedup.minhash_band_precision(docs).collect()}
    rec = {r.n_bands: r for r in dedup.minhash_band_recall(docs).collect()}
    assert list(prec) == [2, 4, 8]
    cands = [prec[b].n_candidates for b in (2, 4, 8)]
    assert cands[0] <= cands[1] <= cands[2]
    for b in (2, 4, 8):
        assert prec[b].n_verified == rec[b].n_detected
        assert prec[b].n_candidates >= prec[b].n_verified
        assert prec[b].band_precision == pytest.approx(
            prec[b].n_verified / prec[b].n_candidates, abs=1e-6
        )


def test_simhash_threshold_curve_monotone(spark):
    """Looser hamming cutoff: detected and recall non-decreasing, hits
    bounded by both detected and truth."""
    rows = []
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    for i in range(30):
        t = base + f" uniq{i} tail{i}"
        rows.append((i, t, "en", len(t)))
        if i % 3 == 0:
            rows.append((500 + i, t + " xx", "en", len(t) + 3))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars int"
    )
    from cocktailsdb_spark.operators import dedup

    out = {r.max_hamming: r for r in dedup.simhash_threshold_curve(docs).collect()}
    assert list(out) == [1, 2, 3]
    det = [out[d].n_detected for d in (1, 2, 3)]
    rec = [out[d].recall for d in (1, 2, 3)]
    assert det[0] <= det[1] <= det[2]
    assert rec[0] <= rec[1] <= rec[2]
    for d in (1, 2, 3):
        assert out[d].n_hits <= out[d].n_detected
        assert out[d].n_hits <= out[d].n_true_pairs


def test_minhash_band_frontier_composes_both_dials(spark, sf_dir):
    """The frontier must agree row-for-row with the two parent dials
    (same configs, same shared signature pass) and keep its internal
    invariants: recall non-decreasing in band count, n_verified ≤
    n_candidates, verify_cost_per_true = candidates / truth."""
    from cocktailsdb_spark.operators import dedup as D
    from cocktailsdb_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    fr = {r.n_bands: r for r in D.minhash_band_frontier(docs).collect()}
    rec = {r.n_bands: r for r in D.minhash_band_recall(docs).collect()}
    pre = {r.n_bands: r for r in D.minhash_band_precision(docs).collect()}
    assert set(fr) == set(rec) == set(pre) == set(D.MBR_BAND_COUNTS)
    for b, r in fr.items():
        assert r.n_verified == rec[b].n_detected == pre[b].n_verified
        assert r.n_candidates == pre[b].n_candidates
        assert r.n_true_pairs == rec[b].n_true_pairs
        assert r.recall == rec[b].recall
        assert r.band_precision == pre[b].band_precision
        assert r.n_verified <= r.n_candidates
        assert abs(
            r.verify_cost_per_true - r.n_candidates / r.n_true_pairs
        ) < 1e-6
    bands = sorted(fr)
    assert all(
        fr[bands[i]].recall <= fr[bands[i + 1]].recall
        for i in range(len(bands) - 1)
    )
