"""Semantic pins for the geospatial grid operators (operators/geo.py),
hand-computed on tiny point sets — independent of the DuckDB oracle."""

from __future__ import annotations

import pytest

from cocktailsdb_spark.operators import geo


def _pts(spark, rows):
    return spark.createDataFrame(rows, "point_id long, x_cd long, y_cd long")


def test_synth_points_deterministic_and_in_range(spark):
    c = spark.createDataFrame([(1,), (2,), (54321,)], "c_custkey long")
    out = {r.point_id: r for r in geo.synth_points(c).collect()}
    assert out[1].x_cd == 9973 and out[1].y_cd == 7919
    assert out[54321].x_cd == (54321 * 9973) % 36000
    for r in out.values():
        assert 0 <= r.x_cd < 36000 and 0 <= r.y_cd < 18000


def test_cell_density_counts_and_centroid_sums(spark):
    p = _pts(
        spark,
        [
            (1, 10, 10),  # cell (0,0)
            (2, 150, 190),  # cell (0,0)
            (3, 250, 10),  # cell (1,0)
        ],
    )
    out = {(r.cell_x, r.cell_y): r for r in geo.cell_density(p, pitch=200).collect()}
    assert out[(0, 0)].n_points == 2
    assert (out[(0, 0)].sum_x_cd, out[(0, 0)].sum_y_cd) == (160, 200)
    assert out[(1, 0)].n_points == 1
    assert out[(0, 0)].rank == 1  # densest first


def test_pairs_within_radius_cross_cell_and_boundary(spark):
    p = _pts(
        spark,
        [
            (1, 195, 100),  # cell (0,0)
            (2, 205, 100),  # cell (1,0): cross-cell, dist 10 — in
            (3, 195, 300),  # dist to 1 = 200 exactly — inclusive boundary
            (4, 5000, 5000),  # isolated
        ],
    )
    out = {(r.id_a, r.id_b): r for r in geo.pairs_within_radius(p, 200, 200).collect()}
    # (2,3) is dx=10,dy=200 → dist2 40100 > 200² — correctly excluded
    assert set(out) == {(1, 2), (1, 3)}  # each pair exactly once
    assert out[(1, 2)].dist2_cd2 == 100
    assert out[(1, 3)].dist2_cd2 == 200 * 200
    assert out[(1, 2)].dist_deg == 0.1


def test_pairs_radius_rejects_undersized_pitch(spark):
    p = _pts(spark, [(1, 0, 0)])
    with pytest.raises(ValueError, match="pitch"):
        geo.pairs_within_radius(p, radius_cd=300, pitch=200)


def test_knn_join_ranks_and_tiebreak(spark):
    p = _pts(
        spark,
        [
            (1, 0, 0),
            (2, 10, 0),  # dist2 100 to 1
            (3, 0, 10),  # dist2 100 to 1 — tie with 2, lower id wins rank
            (4, 30, 0),  # dist2 900 to 1
            (5, 20000, 0),  # out of 1's 3x3 ring at pitch 1000
        ],
    )
    out = geo.knn_join(p, k=3, pitch=1000).collect()
    mine = sorted(
        [(r.rank, r.neighbor_id, r.dist2_cd2) for r in out if r.point_id == 1]
    )
    assert mine == [(1, 2, 100), (2, 3, 100), (3, 4, 900)]
    # bounded kNN: 5 sees nobody in its ring → contributes no rows
    assert not [r for r in out if r.point_id == 5]


def test_knn_recall_curve_monotone_and_exact_at_coarse_pitch(spark):
    """The ring-pitch dial: recall must reach 1.0 once the ring covers
    the true k-th-neighbor radius, and the curve is non-decreasing on a
    grid where candidate sets nest (pitches 400|1000|2000 over a point
    cloud whose k-NN radii are < 400)."""
    import random

    rng = random.Random(11)
    rows = [
        (i, rng.randrange(0, 36000), rng.randrange(0, 18000))
        for i in range(1, 400)
    ]
    p = _pts(spark, rows)
    out = {
        r.pitch_cd: r
        for r in geo.knn_recall_curve(
            p, k=3, pitches=(400, 1000, 2000), query_ids=tuple(range(1, 21))
        ).collect()
    }
    assert [out[c].n_exact for c in (400, 1000, 2000)] == [60, 60, 60]
    rec = [out[c].recall for c in (400, 1000, 2000)]
    assert rec[0] <= rec[1] <= rec[2]
    assert rec[2] == 1.0  # 20-deg ring >> max kNN radius on 400 points


def test_knn_join_probe_panel_matches_full_run(spark):
    """probe_ids filters the probe side only — panel rows must equal the
    full run's rows for those points (same grid, same ranking)."""
    rows = [(i, (i * 997) % 36000, (i * 773) % 18000) for i in range(1, 200)]
    p = _pts(spark, rows)
    full = {
        (r.point_id, r.rank): r.neighbor_id
        for r in geo.knn_join(p, k=2, pitch=1000).collect()
        if r.point_id in (3, 7, 11)
    }
    panel = {
        (r.point_id, r.rank): r.neighbor_id
        for r in geo.knn_join(p, k=2, pitch=1000, probe_ids=(3, 7, 11)).collect()
    }
    assert full == panel
