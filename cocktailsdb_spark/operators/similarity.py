"""Similarity search over embedding columns (SURVEY.md §2.9 X3).

Embeddings are ``array<float>`` (fixture table ``embeddings``); all math is
done JVM-side with higher-order functions (``zip_with`` + ``aggregate``) in
double precision — no Python in the hot path. Two strategies:

- ``cosine_topk``    brute-force exact top-k: the correctness baseline.
  O(Q×N) dot products; at 100 TB this is only sane for small Q (it is a
  broadcast of Q against a full scan of N — no shuffle on N).
- ``ivf_topk``       LSH/IVF-style bucketed approximate top-k: each vector
  is assigned a bucket from the sign pattern of K fixed hyperplane
  projections; a query only scans its own bucket ⇒ N/2^K of the work and
  a bucket-key equi-join instead of a cross join. This is the scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..constants import PLANES
from ..numeric import qround

SIM_ROUND = 6  # rank on qrounded similarity + vec_id tiebreak → deterministic


def dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two array columns (JVM, codegen)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _as_double(c: Column) -> Column:
    return c.cast("array<double>")


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return df.withColumn("_vec", v).withColumn("_norm", F.sqrt(dot(v, v)))


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k for each query id.

    Output: (query_id, vec_id, sim, rank). ``sim`` is rounded so the rank
    order (and the DuckDB oracle twin) is robust to FP summation order.
    """
    base = with_norm(emb, vec_col)
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("_vec").alias("_qvec"),
        F.col("_norm").alias("_qnorm"),
    )
    c = base.select(id_col, "_vec", "_norm")
    sim = qround(dot(F.col("_qvec"), F.col("_vec")) / (F.col("_qnorm") * F.col("_norm")), SIM_ROUND)
    pairs = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", id_col, sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "sim", "rank")
    )


def _pandas_dot_udf():
    """Arrow-batched dot product with the SAME left-associative fold order
    as the JVM ``dot`` (acc = acc + a[j]*b[j] across dims, vectorized
    across rows) — bit-identical results, so both variants share one
    oracle. np.dot would use pairwise/SIMD summation and could differ at
    the ulp."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def dot_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = np.vstack(a.to_numpy())
        B = np.vstack(b.to_numpy())
        acc = np.zeros(len(A))
        for j in range(A.shape[1]):
            acc = acc + A[:, j] * B[:, j]
        return pd.Series(acc)

    return dot_udf


def cosine_topk_pandas(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k with the dot product in a vectorized
    ``@pandas_udf`` — the Arrow-batched escape hatch for vector math the
    built-ins can't express (here they can; this covers the UDF surface
    and cross-validates it against the JVM plan via the shared oracle)."""
    dot_udf = _pandas_dot_udf()
    base = with_norm(emb, vec_col)
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("_vec").alias("_qvec"),
        F.col("_norm").alias("_qnorm"),
    )
    c = base.select(id_col, "_vec", "_norm")
    sim = qround(
        dot_udf(F.col("_qvec"), F.col("_vec")) / (F.col("_qnorm") * F.col("_norm")),
        SIM_ROUND,
    )
    pairs = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", id_col, sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "sim", "rank")
    )


def ivf_recall(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
) -> DataFrame:
    """Recall@k of the bucketed approximate path against the exact one,
    per query: |exact top-k ∩ approx top-k| / k. The quality dial for the
    IVF trade (bucket equi-join instead of cross join) — at 100 TB both
    sides are tiny (Q×k rows), so the metric join itself is a broadcast.

    Output: (query_id, n_exact, n_hit, recall).

    ``method`` selects the approximate path under test: ``"lsh"`` (the
    hyperplane-bucket :func:`ivf_topk`) or ``"kmeans"`` (the centroid
    :func:`ivf_kmeans_topk`).
    """
    exact = cosine_topk(emb, query_ids, k=k, id_col=id_col, vec_col=vec_col)
    if method == "lsh":
        approx = ivf_topk(emb, query_ids, k=k, id_col=id_col, vec_col=vec_col)
    elif method == "kmeans":
        approx = ivf_kmeans_topk(emb, query_ids, k=k, id_col=id_col, vec_col=vec_col)
    else:
        raise ValueError(f"unknown ANN method {method!r}; 'lsh' or 'kmeans'")
    hit = approx.select(
        F.col("query_id").alias("_aq"), F.col(id_col).alias("_av")
    )
    joined = exact.join(
        F.broadcast(hit),
        (exact["query_id"] == hit["_aq"]) & (exact[id_col] == hit["_av"]),
        "left",
    )
    return joined.groupBy("query_id").agg(
        F.count("*").alias("n_exact"),
        F.sum(F.when(F.col("_av").isNotNull(), 1).otherwise(0)).alias("n_hit"),
        qround(
            F.sum(F.when(F.col("_av").isNotNull(), 1).otherwise(0)).cast("double")
            / F.count("*"),
            SIM_ROUND,
        ).alias("recall"),
    )


def label_centroids(
    emb: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label centroid, one row per (label, dimension): posexplode the
    vectors and take the decimal-exact mean per (label, pos). One shuffle
    on (label, pos) — a key space of #labels × dim, so partial aggregation
    collapses each partition to at most that many rows regardless of N.
    Row-per-dimension output (not an array) keeps the oracle comparison
    format-stable."""
    from ..numeric import DEC

    ex = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(_as_double(F.col(vec_col))).alias("pos", "x"),
    )
    return ex.groupBy("label", "pos").agg(
        qround(
            F.sum(F.col("x").cast(DEC)).cast("double") / F.count("*"), SIM_ROUND
        ).alias("c")
    )


def kmeans_assign(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """One k-means assignment step: each vector goes to its nearest
    centroid (squared L2, label-asc tiebreak on the rounded distance).
    Centroids come from :func:`label_centroids` (re-assembled into arrays
    sorted by dimension); the assignment is a broadcast of the tiny
    centroid set against a full scan of N — no shuffle on N, which is what
    makes Lloyd's iteration tractable at 100 TB (the reduce half is
    label_centroids' bounded-key aggregate)."""
    cents = label_centroids(emb, vec_col=vec_col)
    cvecs = cents.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("cvec")
    ).select(F.col("label").alias("centroid_label"), "cvec")
    base = emb.select(id_col, _as_double(F.col(vec_col)).alias("_v"))
    d2 = qround(
        F.aggregate(
            F.zip_with(F.col("_v"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        SIM_ROUND,
    )
    w = Window.partitionBy(id_col).orderBy("d2", "centroid_label")
    return (
        base.crossJoin(F.broadcast(cvecs))
        .select(id_col, "centroid_label", d2.alias("d2"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def ivf_kmeans_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-Flat approximate top-k with a centroid (coarse-quantizer) index
    — the production-standard ANN layout, complementing the hyperplane-LSH
    path of :func:`ivf_topk`. Cells are the label centroids (deterministic
    coarse quantizer); every vector belongs to its nearest cell, and each
    query scans only its ``n_probe`` nearest cells.

    Scale shape: centroids are tiny and broadcast twice (cell assignment,
    query-probe selection); assignment is one window shuffle on the vector
    id (on a real deployment the cell id is precomputed and stored with
    the vector, making this a pure equi-join read); candidate scoring
    touches ~n_probe/n_cells of the data per query instead of all of it.

    Output: (query_id, vec_id, sim, rank) — same contract as the exact
    and LSH variants, so the three share one result shape.
    """
    cents = label_centroids(emb, vec_col=vec_col)
    cvecs = cents.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("cvec")
    ).select(F.col("label").alias("cell"), "cvec")

    base = with_norm(emb, vec_col).select(id_col, "_vec", "_norm")
    d2 = qround(
        F.aggregate(
            F.zip_with(F.col("_vec"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        SIM_ROUND,
    )
    # nearest cell per vector, carrying _vec/_norm through the window so
    # the candidate side needs no second join against the base table
    wa = Window.partitionBy(id_col).orderBy("d2", "cell")
    assign = (
        base.crossJoin(F.broadcast(cvecs))
        .select(id_col, "_vec", "_norm", "cell", d2.alias("d2"))
        .withColumn("_rn", F.row_number().over(wa))
        .filter(F.col("_rn") == 1)
        .select(id_col, "_vec", "_norm", "cell")
    )
    # each query probes its n_probe nearest cells
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("_vec").alias("_qvec"),
        F.col("_norm").alias("_qnorm"),
    )
    qd2 = qround(
        F.aggregate(
            F.zip_with(F.col("_qvec"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        SIM_ROUND,
    )
    wp = Window.partitionBy("query_id").orderBy("qd2", "cell")
    probes = (
        q.crossJoin(F.broadcast(cvecs))
        .select("query_id", "_qvec", "_qnorm", "cell", qd2.alias("qd2"))
        .withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= n_probe)
        .select("query_id", "_qvec", "_qnorm", "cell")
    )
    sim = qround(
        dot(F.col("_qvec"), F.col("_vec")) / (F.col("_qnorm") * F.col("_norm")),
        SIM_ROUND,
    )
    pairs = (
        assign.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", id_col, sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "sim", "rank")
    )


def plane_bucket(vec: Column) -> Column:
    """Bucket id from the sign pattern of the fixed hyperplane projections
    (random-hyperplane LSH with deterministic integer planes)."""
    bucket = F.lit(0)
    for bit, plane in enumerate(PLANES):
        proj = dot(vec, F.array(*[F.lit(float(p)) for p in plane]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << bit)).otherwise(F.lit(0))
    return bucket


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: equi-join on LSH bucket instead of a cross join,
    with multi-probe — each query probes its own bucket plus every bucket
    at Hamming distance 1 (one flipped hyperplane sign), i.e. K+1 of the
    2^K buckets. Near neighbours that land just across one hyperplane are
    recovered, at (K+1)/2^K of the brute-force work instead of 1/2^K.

    At scale the candidate side shuffles once on the 2^K-ary bucket key
    (or is written bucketed once and never shuffles again); the query side
    — Q×(K+1) probe rows — broadcasts. Recall < 1.0 by design — the exact
    twin is ``cosine_topk``.
    """
    n_planes = len(PLANES)
    base = with_norm(emb, vec_col).withColumn("_bucket", plane_bucket(F.col("_vec")))
    # probe set: the query's bucket and each single-bit flip of it. All
    # K+1 values are distinct, and every candidate has exactly one bucket,
    # so no (query, candidate) pair can join twice — no dedup needed.
    probes = F.array(
        F.col("_bucket"),
        *[F.col("_bucket").bitwiseXOR(F.lit(1 << bit)) for bit in range(n_planes)],
    )
    q = (
        base.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col("_vec").alias("_qvec"),
            F.col("_norm").alias("_qnorm"),
            F.explode(probes).alias("_qbucket"),
        )
    )
    c = base.select(id_col, "_vec", "_norm", "_bucket")
    sim = qround(dot(F.col("_qvec"), F.col("_vec")) / (F.col("_qnorm") * F.col("_norm")), SIM_ROUND)
    pairs = (
        c.join(F.broadcast(q), c["_bucket"] == q["_qbucket"])
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", id_col, sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "sim", "rank")
    )
