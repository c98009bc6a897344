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
