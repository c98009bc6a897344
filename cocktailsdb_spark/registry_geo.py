"""Registry entries for the geospatial grid operators (operators/geo.py):
cell density, grid-bucketed radius self-join, grid-bounded kNN join.

Same contract as registry_ops.py: every entry pairs the Spark plan with an
exact DuckDB twin. Coordinates are synthetic integer centi-degrees derived
from c_custkey (geo.py module docstring), so every comparison — cell ids,
squared distances, ranks — is exact integer arithmetic in both engines;
the one float column (dist_deg) is IEEE sqrt + qround.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .numeric import sql_qround
from .operators import geo
from .registry import register
from .tables import load

_PTS = f"""pts AS (
          SELECT c_custkey AS point_id,
                 (c_custkey * {geo.GEO_LON_MULT}) % {geo.GEO_LON_MOD} AS x_cd,
                 (c_custkey * {geo.GEO_LAT_MULT}) % {geo.GEO_LAT_MOD} AS y_cd
          FROM customer)"""

_OFFS = "offs(d) AS (VALUES (-1), (0), (1))"


def _q_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo — densest grid cells over synthetic customer positions."""
    return geo.cell_density(geo.synth_points(load(spark, sf_dir, "customer")))


register(
    "geo_cell_density",
    _q_cell_density,
    f"""WITH {_PTS},
        cells AS (SELECT CAST(floor(x_cd / {float(geo.GEO_CELL_CD)}) AS BIGINT) AS cell_x,
                         CAST(floor(y_cd / {float(geo.GEO_CELL_CD)}) AS BIGINT) AS cell_y,
                         CAST(count(*) AS INT) AS n_points,
                         CAST(sum(x_cd) AS BIGINT) AS sum_x_cd,
                         CAST(sum(y_cd) AS BIGINT) AS sum_y_cd
                  FROM pts GROUP BY 1, 2),
        r AS (SELECT *, row_number() OVER (ORDER BY n_points DESC, cell_x, cell_y)
                          AS rn
              FROM cells)
        SELECT cell_x, cell_y, n_points, sum_x_cd, sum_y_cd,
               CAST(rn AS INT) AS rank
        FROM r WHERE rn <= {geo.GEO_DENSITY_TOP_K}""",
)


def _q_pairs_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo — all point pairs within GEO_RADIUS_CD via the 3×3 grid-bucket
    join (operators/geo.py:pairs_within_radius)."""
    return geo.pairs_within_radius(geo.synth_points(load(spark, sf_dir, "customer")))


register(
    "geo_pairs_radius",
    _q_pairs_radius,
    f"""WITH {_PTS},
        {_OFFS},
        home AS (SELECT point_id AS id_b, x_cd AS xb, y_cd AS yb,
                        CAST(floor(x_cd / {float(geo.GEO_CELL_CD)}) AS BIGINT) AS cell_x,
                        CAST(floor(y_cd / {float(geo.GEO_CELL_CD)}) AS BIGINT) AS cell_y
                 FROM pts),
        probe AS (SELECT point_id AS id_a, x_cd AS xa, y_cd AS ya,
                         CAST(floor(x_cd / {float(geo.GEO_CELL_CD)}) AS BIGINT)
                           + ox.d AS cell_x,
                         CAST(floor(y_cd / {float(geo.GEO_CELL_CD)}) AS BIGINT)
                           + oy.d AS cell_y
                  FROM pts CROSS JOIN offs ox CROSS JOIN offs oy),
        cand AS (SELECT id_a, id_b,
                        CAST((xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
                             AS BIGINT) AS dist2_cd2
                 FROM probe JOIN home USING (cell_x, cell_y)
                 WHERE id_a < id_b)
        SELECT id_a, id_b, dist2_cd2,
               {sql_qround("sqrt(CAST(dist2_cd2 AS DOUBLE)) / 100.0", 6)} AS dist_deg
        FROM cand
        WHERE dist2_cd2 <= {geo.GEO_RADIUS_CD * geo.GEO_RADIUS_CD}""",
)


def _q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo — grid-bounded kNN self-join at the coarse pitch
    (operators/geo.py:knn_join)."""
    return geo.knn_join(geo.synth_points(load(spark, sf_dir, "customer")))


register(
    "geo_knn_join",
    _q_knn_join,
    f"""WITH {_PTS},
        {_OFFS},
        home AS (SELECT point_id AS neighbor_id, x_cd AS xb, y_cd AS yb,
                        CAST(floor(x_cd / {float(geo.GEO_KNN_CELL_CD)}) AS BIGINT)
                          AS cell_x,
                        CAST(floor(y_cd / {float(geo.GEO_KNN_CELL_CD)}) AS BIGINT)
                          AS cell_y
                 FROM pts),
        probe AS (SELECT point_id, x_cd AS xa, y_cd AS ya,
                         CAST(floor(x_cd / {float(geo.GEO_KNN_CELL_CD)}) AS BIGINT)
                           + ox.d AS cell_x,
                         CAST(floor(y_cd / {float(geo.GEO_KNN_CELL_CD)}) AS BIGINT)
                           + oy.d AS cell_y
                  FROM pts CROSS JOIN offs ox CROSS JOIN offs oy),
        cand AS (SELECT point_id, neighbor_id,
                        CAST((xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
                             AS BIGINT) AS dist2_cd2
                 FROM probe JOIN home USING (cell_x, cell_y)
                 WHERE point_id <> neighbor_id),
        r AS (SELECT *, row_number() OVER (PARTITION BY point_id
                                           ORDER BY dist2_cd2, neighbor_id) AS rn
              FROM cand)
        SELECT point_id, neighbor_id, dist2_cd2, CAST(rn AS INT) AS rank
        FROM r WHERE rn <= {geo.GEO_KNN_K}""",
)


def _q_knn_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo — recall@k of the grid-bounded kNN vs exact brute force, per
    ring pitch (operators/geo.py:knn_recall_curve): the measured
    cost/quality dial (VERDICT r8 task 7 — pitch was a constant, now a
    pinned knob like the ANN families' recall entries)."""
    return geo.knn_recall_curve(geo.synth_points(load(spark, sf_dir, "customer")))


def _knn_recall_sql() -> str:
    k = geo.GEO_KNN_K
    ids = ", ".join(str(i) for i in geo.GEO_RECALL_QUERIES)
    nq = len(geo.GEO_RECALL_QUERIES)

    def grid(pitch: int) -> str:
        p = float(pitch)
        return f"""(SELECT qid, neighbor_id FROM (
            SELECT pr.qid, h.neighbor_id,
                   row_number() OVER (PARTITION BY pr.qid ORDER BY
                     CAST((pr.xa - h.xb) * (pr.xa - h.xb)
                        + (pr.ya - h.yb) * (pr.ya - h.yb) AS BIGINT),
                     h.neighbor_id) AS rn
            FROM (SELECT qid, qx AS xa, qy AS ya,
                         CAST(floor(qx / {p}) AS BIGINT) + ox.d AS cell_x,
                         CAST(floor(qy / {p}) AS BIGINT) + oy.d AS cell_y
                  FROM q CROSS JOIN offs ox CROSS JOIN offs oy) pr
            JOIN (SELECT point_id AS neighbor_id, x_cd AS xb, y_cd AS yb,
                         CAST(floor(x_cd / {p}) AS BIGINT) AS cell_x,
                         CAST(floor(y_cd / {p}) AS BIGINT) AS cell_y
                  FROM pts) h USING (cell_x, cell_y)
            WHERE pr.qid <> h.neighbor_id) t WHERE rn <= {k})"""

    arms = "\n        UNION ALL ".join(
        f"""SELECT CAST({pitch} AS INT) AS pitch_cd, CAST({k} AS INT) AS k,
               CAST({nq} AS BIGINT) AS n_queries,
               CAST(count(*) AS BIGINT) AS n_exact,
               CAST(sum(CASE WHEN g.qid IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hit,
               {sql_qround(
                   "CAST(sum(CASE WHEN g.qid IS NOT NULL THEN 1 ELSE 0 END)"
                   " AS DOUBLE) / count(*)", 6)} AS recall
        FROM truth t LEFT JOIN {grid(pitch)} g
          ON t.qid = g.qid AND t.neighbor_id = g.neighbor_id"""
        for pitch in geo.GEO_RECALL_PITCHES
    )
    return f"""WITH {_PTS},
        {_OFFS},
        q AS (SELECT point_id AS qid, x_cd AS qx, y_cd AS qy
              FROM pts WHERE point_id IN ({ids})),
        truth AS (SELECT qid, neighbor_id FROM (
            SELECT q.qid, p.point_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.qid ORDER BY
                     CAST((p.x_cd - q.qx) * (p.x_cd - q.qx)
                        + (p.y_cd - q.qy) * (p.y_cd - q.qy) AS BIGINT),
                     p.point_id) AS rn
            FROM q JOIN pts p ON p.point_id <> q.qid) t WHERE rn <= {k})
        SELECT * FROM ({arms}) ORDER BY pitch_cd"""


register("geo_knn_recall_at_k", _q_knn_recall, _knn_recall_sql())
