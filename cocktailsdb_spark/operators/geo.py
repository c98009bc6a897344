"""Geospatial grid operators (north_star §2.9 extension — the spatial
family the reference's analytics surface lacks but any location-bearing
corpus needs): cell density, radius self-join, and a grid-bounded kNN
join, all on a uniform grid index.

The fixtures carry no coordinates, so each customer is assigned a
DETERMINISTIC synthetic position on an integer centi-degree plane:

    x_cd = (c_custkey · 9973) mod 36000        (0 ≤ x_cd < 36000)
    y_cd = (c_custkey · 7919) mod 18000        (0 ≤ y_cd < 18000)

(read x_cd/100 − 180 as lon°, y_cd/100 − 90 as lat° — operators work on
the positive integer plane, where every comparison is exact integer
arithmetic and therefore bit-identical across engines; the plane is flat,
no meridian wrap).

Cross-engine determinism: cell ids are floor(x/cell) on positives,
distances are integer squared centi-degrees (BIGINT), and the one float
output (dist in degrees) is IEEE sqrt + qround — all exactly reproducible
in DuckDB SQL, so every entry has a hash-exact oracle.

Scale notes (the 100 TB shape):
- The radius join is the classic GRID-BUCKETED spatial join: points
  shuffle once on their home cell; each point probes only its 3×3
  neighborhood (cell ≥ radius ⇒ no qualifying pair can escape it), so
  candidates are |cell population|²-local, never the corpus². The probe
  side explodes ×9 BEFORE the shuffle — a constant fan-out, the same
  trade LSH banding makes.
- Pair emission is once per unordered pair (probe id < home id), so no
  post-join dedup/distinct shuffle is needed.
- kNN joins the same grid at a coarser cell and ranks candidates with a
  window PARTITIONED BY the probe point — per-point state, no global
  sort. Neighbors beyond the 3×3 ring are invisible (bounded kNN): with
  cell chosen ≥ the expected k-th-neighbor radius that is the standard
  grid-ANN accuracy/cost dial, documented per entry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..numeric import qround
from ..tables import spread

GEO_LON_MULT = 9973
GEO_LAT_MULT = 7919
GEO_LON_MOD = 36000
GEO_LAT_MOD = 18000

GEO_CELL_CD = 200          # radius-join grid pitch == radius (centi-deg)
GEO_RADIUS_CD = 200        # pair radius: 2.0 degrees
GEO_DENSITY_TOP_K = 20
GEO_KNN_CELL_CD = 1000     # kNN grid pitch: 10 degrees
GEO_KNN_K = 3


def synth_points(customers: DataFrame) -> DataFrame:
    """(point_id, x_cd, y_cd) — deterministic synthetic positions from
    c_custkey (module docstring). Pure projection: no shuffle."""
    return customers.select(
        F.col("c_custkey").alias("point_id"),
        (F.col("c_custkey") * GEO_LON_MULT % GEO_LON_MOD).alias("x_cd"),
        (F.col("c_custkey") * GEO_LAT_MULT % GEO_LAT_MOD).alias("y_cd"),
    )


def _cell(col: Column, pitch: int) -> Column:
    # positive ints only → floor(x/pitch) ≡ integer division, exact
    return F.floor(col / F.lit(float(pitch))).cast("long")


def cell_density(
    points: DataFrame,
    pitch: int = GEO_CELL_CD,
    top_k: int = GEO_DENSITY_TOP_K,
) -> DataFrame:
    """Densest grid cells: per-cell point count plus the exact integer
    centroid numerators (sum of coords — division left to the reader so
    the output stays integer-exact). One map-side-combined groupBy; the
    top-k is orderBy+limit (TakeOrdered heap, no global sort)."""
    cells = points.groupBy(
        _cell(F.col("x_cd"), pitch).alias("cell_x"),
        _cell(F.col("y_cd"), pitch).alias("cell_y"),
    ).agg(
        F.count("*").alias("n_points"),
        F.sum("x_cd").alias("sum_x_cd"),
        F.sum("y_cd").alias("sum_y_cd"),
    )
    topk = cells.orderBy(
        F.desc("n_points"), F.asc("cell_x"), F.asc("cell_y")
    ).limit(top_k)
    pick = Window.orderBy(F.desc("n_points"), F.asc("cell_x"), F.asc("cell_y"))
    return topk.select(
        "cell_x",
        "cell_y",
        F.col("n_points").cast("int").alias("n_points"),
        "sum_x_cd",
        "sum_y_cd",
        F.row_number().over(pick).cast("int").alias("rank"),
    )


def _probe_side(points: DataFrame, pitch: int) -> DataFrame:
    """Each point replicated into its 3×3 neighbor cells (constant ×9
    fan-out, applied before the join shuffle)."""
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    return points.select(
        "point_id",
        "x_cd",
        "y_cd",
        _cell(F.col("x_cd"), pitch).alias("cx"),
        _cell(F.col("y_cd"), pitch).alias("cy"),
        F.explode(offsets).alias("o"),
    ).select(
        "point_id",
        "x_cd",
        "y_cd",
        (F.col("cx") + F.col("o.dx")).alias("cell_x"),
        (F.col("cy") + F.col("o.dy")).alias("cell_y"),
    )


def pairs_within_radius(
    points: DataFrame,
    radius_cd: int = GEO_RADIUS_CD,
    pitch: int = GEO_CELL_CD,
) -> DataFrame:
    """All unordered point pairs within ``radius_cd`` (flat-plane
    euclidean, exact integer dist²): grid-bucketed spatial self-join.

    Requires ``pitch ≥ radius_cd`` — then any pair within the radius
    differs by < 1 cell per axis, so the probe's 3×3 ring covers every
    qualifying partner; emission is once per pair via probe.id < home.id
    (the mirrored candidate fails the inequality — no dedup shuffle)."""
    if pitch < radius_cd:
        raise ValueError("grid pitch must be >= radius (3x3 ring coverage)")
    home = points.select(
        F.col("point_id").alias("id_b"),
        F.col("x_cd").alias("xb"),
        F.col("y_cd").alias("yb"),
        _cell(F.col("x_cd"), pitch).alias("cell_x"),
        _cell(F.col("y_cd"), pitch).alias("cell_y"),
    )
    probe = _probe_side(points, pitch).select(
        F.col("point_id").alias("id_a"),
        F.col("x_cd").alias("xa"),
        F.col("y_cd").alias("ya"),
        "cell_x",
        "cell_y",
    )
    dx, dy = F.col("xa") - F.col("xb"), F.col("ya") - F.col("yb")
    d2 = dx * dx + dy * dy  # stays BIGINT: exact, no float pow
    return (
        probe.join(home, ["cell_x", "cell_y"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist2_cd2", d2.cast("long"))
        .filter(F.col("dist2_cd2") <= radius_cd * radius_cd)
        .select(
            "id_a",
            "id_b",
            "dist2_cd2",
            qround(F.sqrt(F.col("dist2_cd2").cast("double")) / 100.0, 6).alias(
                "dist_deg"
            ),
        )
    )


def knn_join(
    points: DataFrame,
    k: int = GEO_KNN_K,
    pitch: int = GEO_KNN_CELL_CD,
    probe_ids: tuple[int, ...] | None = None,
) -> DataFrame:
    """Grid-bounded k-nearest-neighbor self-join: for each point, the k
    closest other points within its 3×3 coarse-cell ring (bounded kNN —
    the grid-ANN trade; pitch dials recall vs candidate volume). Ranking
    is a per-point window over (dist², neighbor id): deterministic, and
    partitioned by the probe point so state is per-point, never global."""
    home = points.select(
        F.col("point_id").alias("neighbor_id"),
        F.col("x_cd").alias("xb"),
        F.col("y_cd").alias("yb"),
        _cell(F.col("x_cd"), pitch).alias("cell_x"),
        _cell(F.col("y_cd"), pitch).alias("cell_y"),
    )
    if probe_ids is not None:
        # recall-curve probes: a fixed query panel — tiny, so the grid
        # join naturally broadcasts the probe side (no fan-out needed)
        probe_pts = points.filter(F.col("point_id").isin(list(probe_ids)))
    else:
        # spread(): with the home side broadcast, probe explode → join →
        # candidate emission fuse into ONE stage — measured as a single
        # 6.9 s task producing the 3M candidate rows on the
        # single-row-group scan (r14; guide §2.5)
        probe_pts = spread(points)
    probe = _probe_side(probe_pts, pitch).select(
        F.col("point_id").alias("point_id"),
        F.col("x_cd").alias("xa"),
        F.col("y_cd").alias("ya"),
        "cell_x",
        "cell_y",
    )
    dx, dy = F.col("xa") - F.col("xb"), F.col("ya") - F.col("yb")
    d2 = dx * dx + dy * dy  # stays BIGINT: exact, no float pow
    cand = (
        probe.join(home, ["cell_x", "cell_y"])
        .filter(F.col("point_id") != F.col("neighbor_id"))
        .withColumn("dist2_cd2", d2.cast("long"))
    )
    rn = Window.partitionBy("point_id").orderBy("dist2_cd2", "neighbor_id")
    return (
        cand.withColumn("rn", F.row_number().over(rn))
        .filter(F.col("rn") <= k)
        .select(
            "point_id",
            "neighbor_id",
            "dist2_cd2",
            F.col("rn").cast("int").alias("rank"),
        )
    )


GEO_RECALL_PITCHES = (400, 1000, 2000)  # centi-deg: the ring-radius dial
GEO_RECALL_QUERIES = tuple(range(1, 26))  # fixed probe panel (custkeys)


def knn_recall_curve(
    points: DataFrame,
    k: int = GEO_KNN_K,
    pitches: tuple[int, ...] = GEO_RECALL_PITCHES,
    query_ids: tuple[int, ...] = GEO_RECALL_QUERIES,
) -> DataFrame:
    """Recall@k of the grid-bounded kNN vs the exact kNN, per ring pitch
    — the measured cost/quality dial the ANN families ship with
    (ivf_recall_at_k convention), closing VERDICT r8 task 7: geo_knn_join
    at a fixed pitch was a constant, not a knob.

    Ground truth is a brute-force scan restricted to a FIXED query panel
    (|Q| constant): each corpus point is compared against the broadcast
    panel — O(N·|Q|) work with no shuffle on the big side, the shape
    that scales to any corpus. The grid side reuses :func:`knn_join`
    (same plan as the production entry) filtered to the panel. A larger
    pitch widens the 3×3 ring, so more true neighbors fall inside the
    candidate set and recall rises toward 1 while candidate volume (the
    cost) grows with ring area — the standard grid-ANN trade, now pinned
    per pitch by the oracle.
    """
    qpts = points.filter(F.col("point_id").isin(list(query_ids))).select(
        F.col("point_id").alias("qid"),
        F.col("x_cd").alias("qx"),
        F.col("y_cd").alias("qy"),
    )
    dx, dy = F.col("x_cd") - F.col("qx"), F.col("y_cd") - F.col("qy")
    d2 = (dx * dx + dy * dy).cast("long")
    cand = (
        points.crossJoin(F.broadcast(qpts))
        .filter(F.col("point_id") != F.col("qid"))
        .select("qid", F.col("point_id").alias("neighbor_id"), d2.alias("dist2"))
    )
    wt = Window.partitionBy("qid").orderBy("dist2", "neighbor_id")
    # k·|Q| rows — materialize ONCE: each pitch arm joins against the
    # truth panel, and without the checkpoint every arm would re-run the
    # corpus-sized brute-force scan (3× the dominant cost for 75 rows)
    truth = (
        cand.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= k)
        .select("qid", "neighbor_id")
        .localCheckpoint()
    )
    out = None
    for pitch in pitches:
        approx = knn_join(points, k=k, pitch=pitch, probe_ids=query_ids).select(
            F.col("point_id").alias("qid"), F.col("neighbor_id").alias("a_nid")
        )
        hits = truth.join(
            approx,
            (truth.qid == approx.qid) & (truth.neighbor_id == approx.a_nid),
            "left",
        ).agg(
            F.count("*").cast("long").alias("n_exact"),
            F.sum(F.when(F.col("a_nid").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_hit"),
        )
        row = hits.select(
            F.lit(pitch).cast("int").alias("pitch_cd"),
            F.lit(k).cast("int").alias("k"),
            F.lit(len(query_ids)).cast("long").alias("n_queries"),
            "n_exact",
            "n_hit",
            qround(F.col("n_hit").cast("double") / F.col("n_exact"), 6).alias(
                "recall"
            ),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("pitch_cd")
