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
from ..numeric import dsum, qround

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
    candidate_filter: Column | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k for each query id.

    Output: (query_id, vec_id, sim, rank). ``sim`` is rounded so the rank
    order (and the DuckDB oracle twin) is robust to FP summation order.
    ``candidate_filter`` restricts the CANDIDATE side only (queries stay
    unrestricted) — the filtered-search entry point.
    """
    base = with_norm(emb, vec_col)
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("_vec").alias("_qvec"),
        F.col("_norm").alias("_qnorm"),
    )
    cand = base if candidate_filter is None else base.filter(candidate_filter)
    c = cand.select(id_col, "_vec", "_norm")
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
    n_probe: int = 2,
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
        approx = ivf_kmeans_topk(
            emb, query_ids, k=k, n_probe=n_probe, id_col=id_col, vec_col=vec_col
        )
    elif method == "sq":
        approx = sq_rerank_topk(emb, query_ids, k=k, id_col=id_col, vec_col=vec_col)
    elif method == "pq":
        approx = pq_rerank_topk(emb, query_ids, k=k, id_col=id_col, vec_col=vec_col)
    else:
        raise ValueError(
            f"unknown ANN method {method!r}; 'lsh', 'kmeans', 'sq' or 'pq'"
        )
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


MAX_CENTROIDS = 4096  # centroid sets are bounded; beyond this, store cell ids
# underscore prefix: co-located with parquet data, so Spark's directory
# listing must treat it as metadata (like _SUCCESS), not a data file
INDEX_MANIFEST = "_MANIFEST"


_CENTROID_MEMO: dict = {}


def _collect_centroids(emb: DataFrame, vec_col: str):
    """Centroids as (labels, vectors, label_dtype) — a driver-side,
    label-sorted copy of the tiny bounded centroid set.

    Like the capped key collect in ``http_source.bounded_keys``, the set is
    folded into the plan as a literal rather than joined: nearest-cell
    assignment then needs ZERO exchanges on the N-row side. The cap turns a
    silently-grown label space into a named error instead of a driver OOM.
    The sort happens driver-side (the rows are a full aggregate, so the
    set is deterministic) — no orderBy exchange in the collect job.

    The result is memoized per logical plan (``semanticHash``): the coarse
    quantizer is an index artifact — production IVF builds it once and
    reuses it across queries — and source tables are immutable within a
    session (the cross-session analog is the mtime-gated layout cache in
    plans/layout.py)."""
    try:
        key = (emb.semanticHash(), vec_col)
    except Exception:  # noqa: BLE001 — connect-only/foreign frames: skip memo
        key = None
    if key is not None and key in _CENTROID_MEMO:
        return _CENTROID_MEMO[key]
    cents = label_centroids(emb, vec_col=vec_col)
    cvecs = cents.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("cvec")
    )
    rows = cvecs.limit(MAX_CENTROIDS + 1).collect()
    if len(rows) > MAX_CENTROIDS:
        raise ValueError(
            f"centroid set exceeds {MAX_CENTROIDS} cells; precompute cell ids "
            "at write time and equi-join on the stored cell instead"
        )
    rows.sort(key=lambda r: r["label"])
    labels = [r["label"] for r in rows]
    vecs = [[float(x) for x in r["cvec"]] for r in rows]
    out = (labels, vecs, cvecs.schema["label"].dataType)
    if key is not None:
        if len(_CENTROID_MEMO) >= 64:
            _CENTROID_MEMO.clear()
        _CENTROID_MEMO[key] = out
    return out


def _cells_by_distance(vec: Column, cents, cell_name: str = "cell") -> Column:
    """All cells sorted by (rounded squared L2, cell asc) — a narrow
    per-row expression over two single-node literals (one array<array>
    for the vectors, one array for the labels — NOT per-value literal
    trees, which made analysis/codegen cost scale with C×dim), then
    array_sort on struct<d2, cell> (lexicographic by field order, which
    reproduces the old ``row_number() OVER (ORDER BY d2, cell)`` tiebreak
    without any window or exchange). Centroid values are the
    already-qrounded doubles from :func:`label_centroids`; JSON uses the
    shortest round-trip repr, so the doubles survive exactly and distances
    are bit-identical to the old crossJoin form (same zip_with/aggregate
    fold). ``from_json`` of a string literal is constant-folded by
    Catalyst into a single array literal — one py4j call instead of
    C×dim per-element ``lit`` calls (measured 1.1s → ~1ms plan build at
    C=10, dim=64)."""
    import json

    labels, vecs, label_dtype = cents
    cells_lit = F.from_json(
        F.lit(json.dumps(labels)), f"array<{label_dtype.simpleString()}>"
    )
    cvecs_lit = F.from_json(F.lit(json.dumps(vecs)), "array<array<double>>")
    return F.array_sort(
        F.transform(
            cvecs_lit,
            lambda c, i: F.struct(
                qround(
                    F.aggregate(
                        F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ),
                    SIM_ROUND,
                ).alias("d2"),
                F.element_at(cells_lit, i + F.lit(1)).alias(cell_name),
            ),
        )
    )


def kmeans_assign(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """One k-means assignment step: each vector goes to its nearest
    centroid (squared L2, label-asc tiebreak on the rounded distance).

    Scale shape: centroids come from :func:`label_centroids` (a
    bounded-key aggregate — the reduce half of Lloyd's iteration), are
    collected driver-side under the :data:`MAX_CENTROIDS` cap, and are
    folded into a per-row ``array_sort``-over-distance expression. The
    assignment of N rows is a pure narrow map — no crossJoin, no window,
    zero exchanges on N — which is what makes Lloyd's iteration tractable
    at 100 TB."""
    cents = _collect_centroids(emb, vec_col)
    base = emb.select(id_col, _as_double(F.col(vec_col)).alias("_v"))
    best = F.element_at(_cells_by_distance(F.col("_v"), cents, "centroid_label"), 1)
    return base.select(
        id_col,
        best["centroid_label"].alias("centroid_label"),
        best["d2"].alias("d2"),
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

    Scale shape: centroids are tiny and bounded, so they are collected
    driver-side (capped, :data:`MAX_CENTROIDS`) and folded into the plan
    as a literal; cell assignment and query-probe selection are then
    narrow per-row ``array_sort`` expressions — no crossJoin, no window,
    zero exchanges on the N-row side (a real deployment additionally
    precomputes the cell id at write time, making assignment a stored
    column); candidate scoring touches ~n_probe/n_cells of the data per
    query instead of all of it.

    Output: (query_id, vec_id, sim, rank) — same contract as the exact
    and LSH variants, so the three share one result shape.
    """
    cents = _collect_centroids(emb, vec_col)

    base = with_norm(emb, vec_col).select(id_col, "_vec", "_norm")
    # nearest cell per vector — narrow map, zero exchanges on N
    assign = base.withColumn(
        "cell", F.element_at(_cells_by_distance(F.col("_vec"), cents), 1)["cell"]
    )
    # each query probes its n_probe nearest cells — same narrow expression
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("_vec").alias("_qvec"),
        F.col("_norm").alias("_qnorm"),
    )
    probes = q.select(
        "query_id",
        "_qvec",
        "_qnorm",
        F.explode(
            F.transform(
                F.slice(_cells_by_distance(F.col("_qvec"), cents), 1, n_probe),
                lambda s: s["cell"],
            )
        ).alias("cell"),
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


def _plane_proj(vec: Column, plane: list[int]) -> Column:
    """One hyperplane projection ``vec · plane`` — the left-assoc double
    fold every bucketing rule (and its oracle's explicit ``+`` chain)
    shares, so sign/threshold comparisons are bit-identical across
    engines."""
    return dot(vec, F.array(*[F.lit(float(p)) for p in plane]))


def plane_bucket(vec: Column, planes: list[list[int]] | None = None) -> Column:
    """Bucket id from the sign pattern of the fixed hyperplane projections
    (random-hyperplane LSH with deterministic integer planes). ``planes``
    defaults to the engine-shared 4-plane set; callers scaling the bucket
    count ∝ log(N) (semantic_dedup_scaled) pass
    :func:`cocktailsdb_spark.constants.make_planes`'s wider sets."""
    bucket = F.lit(0)
    for bit, plane in enumerate(PLANES if planes is None else planes):
        proj = _plane_proj(vec, plane)
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


SQ_LEVELS = 127  # symmetric int8 scalar quantization: codes in [-127, 127]


def _sq_quantize(vec: Column) -> tuple[Column, Column]:
    """Symmetric int8 scalar quantization of a double array: per-vector
    scale s = max|x| / 127, code_i = floor(x_i / s + 0.5). Codes and the
    inverse scale are exact small integers / one IEEE expression, so the
    DuckDB twin reproduces them bit-for-bit. The zero vector quantizes to
    all-zero codes (scale floored at 1e-30 to avoid 0/0)."""
    maxabs = F.aggregate(
        F.transform(vec, lambda x: F.abs(x)),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    scale = F.greatest(maxabs / F.lit(float(SQ_LEVELS)), F.lit(1e-30))
    codes = F.transform(vec, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int"))
    return codes, scale


def sq_rerank_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    rerank: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar-quantization ANN with exact re-ranking — the third ANN
    family next to hyperplane-LSH (:func:`ivf_topk`) and centroid
    IVF-Flat (:func:`ivf_kmeans_topk`): coarse-score EVERY candidate on
    int8 codes (approx cosine = s_q·s_c·Σ code_q·code_c / (‖q‖‖c‖)),
    keep the top ``k·rerank`` per query, then re-score only those on the
    full vectors and emit the exact top-k.

    Output: (query_id, vec_id, sim, rank) — ``sim`` is the EXACT cosine,
    same contract as the other ANN variants, so ivf_recall's metric
    applies unchanged (method="sq").

    Scale shape: the coarse pass streams all N candidates but touches
    only the int8 codes — 4× fewer bytes than float32 (the real-engine
    win is SIMD dot products on packed int8; the Spark expression keeps
    the same data-volume shape). The rerank pass is an equi-join of the
    tiny Q×(k·rerank) candidate-id set (broadcast) back to the full
    vectors — pointed lookups, not a second scan. One window per pass,
    both partitioned by query_id (Q partitions, never skewed on N)."""
    m = k * rerank
    base = with_norm(emb, vec_col)
    codes, scale = _sq_quantize(F.col("_vec"))
    cand = base.select(
        id_col, "_vec", "_norm", codes.alias("_codes"), scale.alias("_scale")
    )
    q = cand.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("_vec").alias("_qvec"),
        F.col("_norm").alias("_qnorm"),
        F.col("_codes").alias("_qcodes"),
        F.col("_scale").alias("_qscale"),
    )
    # int dot: codes ≤ 127 ⇒ products ≤ 16129, exact in int32 for any
    # realistic dim; scaled back to the cosine estimate in one
    # left-associated double expression (identical on both engines)
    int_dot = F.aggregate(
        F.zip_with(F.col("_qcodes"), F.col("_codes"), lambda x, y: x * y),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    approx = qround(
        int_dot.cast("double")
        * F.col("_qscale")
        * F.col("_scale")
        / (F.col("_qnorm") * F.col("_norm")),
        SIM_ROUND,
    )
    coarse_pairs = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", id_col, approx.alias("approx_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("approx_sim"), F.asc(id_col))
    shortlist = (
        coarse_pairs.withColumn("_crank", F.row_number().over(w))
        .filter(F.col("_crank") <= m)
        .select("query_id", id_col)
    )
    # exact rerank: join the Q×m shortlist back to the full vectors
    full = base.select(id_col, "_vec", "_norm")
    qf = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("_vec").alias("_qvec"),
        F.col("_norm").alias("_qnorm"),
    )
    sim = qround(
        dot(F.col("_qvec"), F.col("_vec")) / (F.col("_qnorm") * F.col("_norm")),
        SIM_ROUND,
    )
    rer = (
        F.broadcast(shortlist)
        .join(full, id_col)
        .join(F.broadcast(qf), "query_id")
        .select("query_id", id_col, sim.alias("sim"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "sim", "rank")
    )


PQ_M = 8  # subspaces; codes per vector = PQ_M small ints ≈ M bytes vs 4·dim


def _pq_sub_cents(cents, m: int):
    """Slice the collected centroid set into ``m`` per-subspace codebooks
    (same (labels, vectors, dtype) shape _cells_by_distance consumes)."""
    labels, vecs, dtype = cents
    dim = len(vecs[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by {m} subspaces")
    sub = dim // m
    return [
        (labels, [v[j * sub : (j + 1) * sub] for v in vecs], dtype)
        for j in range(m)
    ], sub


def _sub_codebook_map(sub_cents) -> Column:
    """map<label, array<double>> literal of one subspace codebook — like
    _cells_by_distance's literals, one from_json per side so plan-build
    cost stays O(1) in C×dim."""
    import json

    labels, vecs, dtype = sub_cents
    keys = F.from_json(
        F.lit(json.dumps(labels)), f"array<{dtype.simpleString()}>"
    )
    vals = F.from_json(F.lit(json.dumps(vecs)), "array<array<double>>")
    return F.map_from_arrays(keys, vals)


def _raw_d2(a: Column, b: Column) -> Column:
    """Unrounded squared L2 — same left-associated fold on both engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_rerank_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    m: int = PQ_M,
    rerank: int = 8,  # wider than SQ's 4: 10-entry codebooks rank noisier
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance (ADC) + exact
    rerank — the fourth production ANN family next to hyperplane-LSH,
    centroid IVF-Flat and int8 SQ. Vectors are ENCODED once into ``m``
    sub-codes (nearest per-subspace codebook entry); a query is compared
    to a candidate through the codes only: approx d² = Σ_j d²(q_j,
    codebook_j[code_j]). The candidate side of the coarse scan carries
    just the m small ints — ~m bytes instead of 4·dim, the strongest
    compression of the four families.

    The per-subspace distances are folded to integer micro-units
    (floor(d²·1e6 + 0.5) summed as BIGINT), so coarse ranking involves
    no float-order ambiguity at all and both engines agree exactly. The
    shortlist of k·rerank per query is re-scored on full vectors; output
    is the EXACT cosine, same contract as the other families (recall
    dial: ivf_recall(method="pq")).

    Scale shape: encoding is a narrow map over literals (zero exchanges
    on N — stored as a column at write time in a real deployment, like
    the IVF cell id); the coarse scan is the same broadcast-Q pattern as
    brute force but over the compressed codes; rerank joins the tiny
    Q×(k·rerank) id set back to full vectors. Codebooks are the bounded
    centroid set (MAX_CENTROIDS cap applies)."""
    cents = _collect_centroids(emb, vec_col)
    subs, sub = _pq_sub_cents(cents, m)

    base = with_norm(emb, vec_col)
    code_cols = [
        F.element_at(
            _cells_by_distance(F.slice(F.col("_vec"), j * sub + 1, sub), subs[j]),
            1,
        )["cell"]
        for j in range(m)
    ]
    cand = base.select(id_col, F.array(*code_cols).alias("_codes"))
    # the coarse pass needs only the query vector (ADC is a distance, not
    # a cosine — norms enter at the exact rerank)
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("_vec").alias("_qvec"),
    )
    # integer micro-unit ADC score: Σ_j floor(d²(q_j, codebook_j[code_j])·1e6 + .5)
    score = None
    for j in range(m):
        dj = _raw_d2(
            F.slice(F.col("_qvec"), j * sub + 1, sub),
            F.element_at(_sub_codebook_map(subs[j]), F.col("_codes")[j]),
        )
        sj = F.floor(dj * F.lit(1e6) + F.lit(0.5)).cast("long")
        score = sj if score is None else score + sj
    coarse = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", id_col, score.alias("_s"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("_s"), F.asc(id_col))
    shortlist = (
        coarse.withColumn("_crank", F.row_number().over(w))
        .filter(F.col("_crank") <= k * rerank)
        .select("query_id", id_col)
    )
    full = base.select(id_col, "_vec", "_norm")
    qf = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("_vec").alias("_qvec"),
        F.col("_norm").alias("_qnorm"),
    )
    sim = qround(
        dot(F.col("_qvec"), F.col("_vec")) / (F.col("_qnorm") * F.col("_norm")),
        SIM_ROUND,
    )
    rer = (
        F.broadcast(shortlist)
        .join(full, id_col)
        .join(F.broadcast(qf), "query_id")
        .select("query_id", id_col, sim.alias("sim"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "sim", "rank")
    )


MAX_HIST_ENTRIES = 65_536  # cells × labels cap for the manifest histogram


def ivf_index_write(spark, emb: DataFrame, cache_dir: str, src_file: str,
                    vec_col: str = "embedding", cents=None,
                    label_col: str = "label") -> str:
    """Materialize the IVF index AT REST: write the embedding table
    partitioned by its nearest-centroid cell (the stored-cell-id design
    every ANN docstring above references), plus a MANIFEST (the
    sources/formats.py machinery: atomic tmp+rename pointer) carrying the
    index version, row count, and the COARSE QUANTIZER itself — the
    centroids are an index artifact, so a self-contained index lets
    probes and upserts run without re-deriving them from (possibly since
    changed) source data. One narrow assignment map + one partitioned
    write; rewritten only when the source fixture changes (mtime-gated
    like plans/layout.py's caches). ``cents`` forces a precomputed
    quantizer (upsert-equivalence rebuilds).

    When ``label_col`` is present, the manifest additionally records the
    per-cell LABEL HISTOGRAM (``label_hist``: [cell, label, count]
    triples) — the routing structure metadata-filtered search needs on
    this kind: unlike the adaptive composite id, a nearest-centroid cell
    id says nothing about its rows' labels, so
    :func:`stored_index_probe`'s ``allowed_labels`` path uses the
    histogram to drop zero-eligible-mass cells BEFORE the n_probe
    ranking (and post-verifies rows, since fixed cells are mixed-label).
    The histogram is bounded by cells × labels and skipped past
    :data:`MAX_HIST_ENTRIES` — at that cardinality the label space
    should be part of the cell id (the adaptive kind)."""
    from ..plans.layout import _cache_fresh
    from ..sources.formats import _read_manifest, _write_manifest

    if _cache_fresh(cache_dir, src_file) and _read_manifest(cache_dir, INDEX_MANIFEST):
        return cache_dir
    if cents is None:
        cents = _collect_centroids(emb, vec_col)
    assigned = emb.withColumn(
        "cell",
        F.element_at(
            _cells_by_distance(_as_double(F.col(vec_col)), cents), 1
        )["cell"],
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(cache_dir)
    labels, vecs, label_dtype = cents
    manifest = {
        "version": 1,
        "rows": emb.count(),
        "protocol": "staged",
        "centroids": {
            "labels": labels,
            "vecs": vecs,
            "label_dtype": label_dtype.simpleString(),
        },
    }
    if label_col in emb.columns:
        hrows = (
            assigned.groupBy("cell", label_col)
            .count()
            .limit(MAX_HIST_ENTRIES + 1)
            .collect()
        )
        if len(hrows) <= MAX_HIST_ENTRIES:
            manifest["label_hist"] = sorted(
                [r["cell"], r[label_col], r["count"]] for r in hrows
            )
    _write_manifest(cache_dir, manifest, INDEX_MANIFEST)
    _write_centroid_table(spark, cache_dir, cents)
    return cache_dir


def _stored_centroids(cache_dir: str):
    """The quantizer persisted in the index MANIFEST, in the same
    (labels, vectors, dtype) shape _collect_centroids produces. JSON
    round-trips doubles via shortest repr, so values are bit-identical
    to the build-time centroids."""
    from pyspark.sql.types import _parse_datatype_string

    from ..sources.formats import _read_manifest

    m = _read_manifest(cache_dir, INDEX_MANIFEST)
    if not m or "centroids" not in m:
        raise ValueError(f"no index manifest with centroids under {cache_dir}")
    c = m["centroids"]
    return (c["labels"], c["vecs"], _parse_datatype_string(c["label_dtype"]))


UPSERT_TMP_DIR = "_upsert_tmp"  # underscore: hidden from the parquet scan


def _staged_append(spark, cache_dir: str, assigned: DataFrame, n_new: int) -> None:
    """Crash-safe delta append shared by both upsert kinds — the
    EXACTLY-ONCE protocol the r12 advice asked to move out of the
    registry helpers (registry_ops wipe-on-version<2 guard) and into the
    library. The raw ``mode("append")`` it replaces had a crash window:
    delta files landed inside the cell partitions before the manifest
    version bump, so an external caller re-running a failed upsert
    double-appended the delta. Here the append is RE-ENTRANT:

    1. stage the assigned delta under ``_upsert_tmp`` (underscore dir —
       invisible to index scans; ``overwrite`` mode, so a re-run after a
       crash mid-stage just rewrites it);
    2. delete any ``upsert_v{V}_*`` files already inside the live cell
       dirs — leftovers of a PREVIOUS crashed attempt at this same
       target version V (the manifest version only moves at step 4, so
       a re-run recomputes the same V and reclaims its own debris);
    3. rename the staged part files into the live cell dirs under the
       deterministic ``upsert_v{V}_<i>.parquet`` names step 2 keys on;
    4. bump the manifest (version V, rows += delta) — the commit point.

    A crash anywhere before step 4 leaves a readable version-(V−1)
    index; re-running the same upsert converges to exactly one applied
    delta. This is the local-fs rendition of a table format's
    snapshot-commit protocol — at warehouse scale Iceberg/Delta's
    manifest swap plays step 4. Directory renames stay metadata-only
    because the staging dir lives inside ``cache_dir`` (same fs)."""
    import os
    import shutil

    from ..sources.formats import _read_manifest, _write_manifest

    m = _read_manifest(cache_dir, INDEX_MANIFEST)
    v_next = m["version"] + 1
    tmp = os.path.join(cache_dir, UPSERT_TMP_DIR)
    shutil.rmtree(tmp, ignore_errors=True)
    assigned.repartition(F.col("cell")).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(tmp)
    prefix = f"upsert_v{v_next}_"
    for d in os.listdir(cache_dir):
        if not d.startswith("cell="):
            continue
        live_cd = os.path.join(cache_dir, d)
        for f in os.listdir(live_cd):
            if f.startswith(prefix):
                os.remove(os.path.join(live_cd, f))
    for d in sorted(os.listdir(tmp)):
        if not d.startswith("cell="):
            continue
        src_cd = os.path.join(tmp, d)
        dst_cd = os.path.join(cache_dir, d)
        os.makedirs(dst_cd, exist_ok=True)
        for i, f in enumerate(sorted(os.listdir(src_cd))):
            if f.endswith(".parquet"):
                os.rename(
                    os.path.join(src_cd, f),
                    os.path.join(dst_cd, f"{prefix}{i}.parquet"),
                )
    shutil.rmtree(tmp, ignore_errors=True)
    _write_manifest(
        cache_dir,
        {**m, "version": v_next, "rows": m["rows"] + n_new},
        INDEX_MANIFEST,
    )


def ivf_index_upsert(
    spark, cache_dir: str, new_vecs: DataFrame, vec_col: str = "embedding"
) -> str:
    """Incremental index maintenance: assign a NEW vector batch to the
    STORED centroids (never re-derived — cell ids stay stable for data
    already at rest) and append it into the cell partitions via the
    staged exactly-once protocol (:func:`_staged_append`): a crashed
    upsert leaves a readable previous-version index, and RE-RUNNING it
    applies the delta exactly once — no wipe-and-rebuild needed at the
    call site. At 100 TB this is the only affordable maintenance path —
    a rebuild re-shuffles the corpus, an upsert touches only the delta.
    Pair with :func:`ivf_centroid_drift` to decide when accumulated
    upserts have moved the data far enough from the frozen quantizer to
    justify a rebuild."""
    cents = _stored_centroids(cache_dir)
    assigned = new_vecs.withColumn(
        "cell",
        F.element_at(
            _cells_by_distance(_as_double(F.col(vec_col)), cents), 1
        )["cell"],
    )
    _staged_append(spark, cache_dir, assigned, new_vecs.count())
    return cache_dir


def ivf_centroid_drift(
    spark,
    cache_dir: str,
    vec_col: str = "embedding",
    include_new_cells: bool = False,
) -> DataFrame:
    """Per-cell drift dial for the rebuild decision: rounded L2 distance
    between each stored centroid and its cell's CURRENT mean vector
    (post-upserts), plus the cell population. One posexplode aggregate
    (histogram-sized output: cells × dim), centroid side broadcast.

    Cell means use the label_centroids exactness shape (decimal-exact
    sum / count, qround to SIM_ROUND) rather than F.avg, so each mean
    component — and therefore the drift — is reproducible by the DuckDB
    oracle on the registered ``ann_index_drift_monitor`` entry
    (a float avg's summation order is partitioning-dependent).

    ``include_new_cells`` switches the quantizer join to a LEFT join so
    cells the FROZEN quantizer has never seen still surface (drift NULL:
    there is no stored centroid to measure against). The adaptive index
    needs this — its rule assignment can route an upsert batch into a
    label × sign-bucket combination the build corpus left empty, and a
    monitor that silently drops those cells understates exactly the
    staleness it exists to measure (``ann_index_drift_adaptive``)."""
    from ..numeric import DEC

    labels, vecs, _ = _stored_centroids(cache_dir)
    stored = spark.read.parquet(cache_dir)
    comp = (
        stored.select("cell", F.posexplode(_as_double(F.col(vec_col))).alias("pos", "x"))
        .groupBy("cell", "pos")
        .agg(
            qround(
                F.sum(F.col("x").cast(DEC)).cast("double") / F.count("*"),
                SIM_ROUND,
            ).alias("m")
        )
    )
    means = comp.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("mean_vec")
    )
    cent_rows = [(lab, vec) for lab, vec in zip(labels, vecs)]
    cents_df = spark.createDataFrame(cent_rows, ["cell", "cvec"])
    counts = stored.groupBy("cell").agg(F.count("*").alias("n_vecs"))
    d2 = F.aggregate(
        F.zip_with("mean_vec", "cvec", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    how = "left" if include_new_cells else "inner"
    return (
        means.join(F.broadcast(cents_df), "cell", how)
        .join(counts, "cell")
        .select("cell", "n_vecs", qround(F.sqrt(d2), SIM_ROUND).alias("drift"))
    )


ANN_BASE_POP = 2_000  # corpus size at which label cells start splitting
# n_labels × 2^p must stay under MAX_CENTROIDS (fixtures: 10 × 2^8 = 2560)
ANN_MAX_PLANES = 8


def adaptive_plane_count(n: int) -> int:
    """Plane count for the ADAPTIVE composite quantizer: 0 up to
    :data:`ANN_BASE_POP` total vectors, then +1 per corpus doubling,
    capped at :data:`ANN_MAX_PLANES` so the composite cell count
    (n_labels × 2^p) stays under :data:`MAX_CENTROIDS`. This is the
    fixed-cardinality fix the round-11 2M-vector probe demanded: the
    stored index's 10 label cells made probe cost pick up an
    n_probe/n_cells linear term (0.80 → 2.12 s in the 4th decade,
    scaling_r11.json) — cells ∝ N keeps per-cell population, and with
    it probe cost, bounded. The DuckDB twin computes the identical
    count-derived gate (registry_ops._SQL_ANN_NP), the
    semantic_dedup_scaled recipe for keeping an exact oracle under a
    data-adaptive knob."""
    import math

    return min(ANN_MAX_PLANES, max(0, math.ceil(math.log2(max(n, 1) / ANN_BASE_POP))))


def adaptive_cell(vec: Column, label: Column, planes: list[list[int]]) -> Column:
    """Composite cell id ``label·2^p + plane_bucket(vec)`` — the
    RULE-based assignment of the adaptive index. Linear in N (p×dim
    multiplies per row; no distance ranking against the C-cell
    quantizer), deterministic, and shared verbatim by build, upsert and
    rebuild — which is what makes upsert ≡ rebuild and delete+compact ≡
    rebuild provable layout identities (the nearest-centroid assignment
    of :func:`ivf_index_write` only gets that via a frozen-quantizer
    rebuild). With p = 0 the id degenerates to the label itself."""
    return (
        label.cast("int") * F.lit(1 << len(planes)) + plane_bucket(vec, planes)
    ).cast("int")


def ivf_index_write_adaptive(
    spark,
    emb: DataFrame,
    cache_dir: str,
    src_file: str,
    vec_col: str = "embedding",
    label_col: str = "label",
    planes: list[list[int]] | None = None,
    cents=None,
) -> str:
    """At-rest IVF index with a cell count that GROWS with the corpus:
    vectors are partitioned by the composite rule cell
    (:func:`adaptive_cell`, planes picked from ``emb.count()`` unless
    forced), and the manifest carries BOTH halves of the quantizer —
    the rule planes (for assignment of future deltas) and the
    decimal-exact composite-cell centroid means (for probe-side cell
    ranking; :func:`stored_index_probe` consumes them unchanged).
    ``planes``/``cents`` force a frozen quantizer for
    equivalence-invariant rebuilds, mirroring :func:`ivf_index_write`'s
    ``cents``."""
    from ..constants import make_planes
    from ..plans.layout import _cache_fresh
    from ..sources.formats import _read_manifest, _write_manifest

    if _cache_fresh(cache_dir, src_file) and _read_manifest(cache_dir, INDEX_MANIFEST):
        return cache_dir
    n = emb.count()
    if planes is None:
        planes = make_planes(adaptive_plane_count(n))
    assigned = emb.withColumn(
        "cell", adaptive_cell(_as_double(F.col(vec_col)), F.col(label_col), planes)
    )
    # colocate each cell before the partitioned write: without this,
    # files ≈ input_partitions × cells (e.g. 100 × 2560 at the 2M-vector
    # decade); hash-repartitioning on the cell id puts each cell's rows
    # in one task, so the layout lands at ~one file per cell
    assigned.repartition(F.col("cell")).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(cache_dir)
    if cents is None:
        # probe-side quantizer: decimal-exact mean per composite cell,
        # bounded by construction (n_labels × 2^p ≤ MAX_CENTROIDS)
        cents = _collect_centroids(
            assigned.select(F.col("cell").alias("label"), vec_col), vec_col
        )
    labels, vecs, label_dtype = cents
    _write_manifest(
        cache_dir,
        {
            "version": 1,
            "rows": n,
            "tombstones": 0,
            "protocol": "staged",
            "planes": planes,
            "centroids": {
                "labels": labels,
                "vecs": vecs,
                "label_dtype": label_dtype.simpleString(),
            },
        },
        INDEX_MANIFEST,
    )
    _write_centroid_table(spark, cache_dir, cents)
    return cache_dir


def _stored_planes(cache_dir: str) -> list[list[int]]:
    from ..sources.formats import _read_manifest

    m = _read_manifest(cache_dir, INDEX_MANIFEST)
    if not m or "planes" not in m:
        raise ValueError(f"no adaptive index manifest with planes under {cache_dir}")
    return m["planes"]


def ivf_index_upsert_adaptive(
    spark,
    cache_dir: str,
    new_vecs: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> str:
    """Delta append against a RULE-kind index (adaptive or balanced —
    the manifest says which): the frozen rule planes (plus, on the
    balanced kind, the frozen per-label threshold trees) re-assign the
    delta exactly as the build did, so the post-upsert layout is
    byte-identical to a from-scratch rebuild with the same frozen
    quantizer — no nearest-centroid drift to reason about.
    Centroid means in the manifest stay frozen (they are the probe-side
    quantizer; :func:`ivf_centroid_drift` is the staleness dial). The
    append runs through the staged exactly-once protocol
    (:func:`_staged_append`), so re-running a crashed upsert never
    double-applies the delta."""
    m = _read_adaptive_manifest(cache_dir)
    planes = m["planes"]
    if "btree" in m:
        # BALANCED kind: re-assign the delta with the frozen per-label
        # threshold trees — same layout-identity argument as the plain
        # rule, including for labels (or tree nodes) the build corpus
        # never saw, which fall back to the 0.0 threshold both here and
        # at a frozen-tree rebuild
        bt = m["btree"]
        from pyspark.sql.types import _parse_datatype_string

        assigned = _with_balanced_cell(
            spark,
            new_vecs,
            planes,
            list(zip(bt["labels"], bt["trees"])),
            _parse_datatype_string(bt["label_dtype"]),
            vec_col,
            label_col,
        )
    else:
        assigned = new_vecs.withColumn(
            "cell",
            adaptive_cell(_as_double(F.col(vec_col)), F.col(label_col), planes),
        )
    _staged_append(spark, cache_dir, assigned, new_vecs.count())
    return cache_dir


def _read_adaptive_manifest(cache_dir: str) -> dict:
    from ..sources.formats import _read_manifest

    m = _read_manifest(cache_dir, INDEX_MANIFEST)
    if not m or "planes" not in m:
        raise ValueError(f"no adaptive index manifest with planes under {cache_dir}")
    return m


def balanced_threshold_tree(
    spark,
    emb: DataFrame,
    planes: list[list[int]],
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
) -> list[tuple]:
    """Per-label THRESHOLD TREES for the balanced adaptive kind — the
    skew fix the r13 cost readout demanded (adaptive per-cell population
    max/mean grew 1.09 → 9.32 across four decades, scaling_r13.json:
    sign-at-zero buckets leave whole hyperplane sides of a clustered
    label nearly empty). Instead of thresholding every projection at 0,
    bit ``i``'s threshold is the LOWER MEDIAN of plane ``i``'s projection
    over exactly the rows that reached that node — a k-d-tree-style
    conditional split, so every level halves every node's population
    (±1) and per-label cell sizes are balanced BY CONSTRUCTION, at any
    corpus shape. Returns ``[(label, tree), ...]`` with ``tree`` the
    breadth-first flattening (node for bit ``i`` under prefix ``b`` at
    index ``2^i − 1 + b``); nodes no build row reached stay ``None`` and
    assignment falls back to the 0.0 threshold.

    Cost: one narrow (label, projections) frame, ``p`` rank-per-node
    passes (persisted level to level, so work is linear in ``p``), and a
    per-level driver collect bounded by the quantizer cardinality
    (n_labels × 2^i ≤ MAX_CENTROIDS) — control-plane, like every
    centroid collect in this module. The lower median is rank
    ``(n+1)//2`` ordered by (projection, id) — a value from the data, so
    the DuckDB oracle reproduces it exactly (no interpolated
    percentile)."""
    if not planes:
        return []
    v = _as_double(F.col(vec_col))
    cur = emb.select(
        F.col(label_col).alias("_lab"),
        F.col(id_col).alias("_id"),
        *[_plane_proj(v, pl).alias(f"_d{i}") for i, pl in enumerate(planes)],
    ).withColumn("_pfx", F.lit(0))
    trees: dict = {}
    prev = None
    for i in range(len(planes)):
        cur = cur.persist()
        w = Window.partitionBy("_lab", "_pfx")
        med = (
            cur.withColumn(
                "_rn",
                F.row_number().over(w.orderBy(F.asc(f"_d{i}"), F.asc("_id"))),
            )
            .withColumn("_n", F.count("*").over(w))
            .filter(F.col("_rn") == F.floor((F.col("_n") + 1) / 2))
            .select("_lab", "_pfx", F.col(f"_d{i}").alias("_t"))
        )
        rows = med.collect()  # ≤ n_labels · 2^i nodes — control-plane
        for r in rows:
            if r["_t"] is None:
                # NULL projection (vector shorter than the plane dim —
                # zip_with pads with NULLs): leave the node unset so
                # assignment falls back to the sign rule's behavior
                continue
            trees.setdefault(r["_lab"], {})[(1 << i) - 1 + r["_pfx"]] = float(
                r["_t"]
            )
        if prev is not None:
            prev.unpersist()
        prev = cur
        if i < len(planes) - 1:
            tdf = spark.createDataFrame(rows, med.schema)
            cur = (
                cur.join(F.broadcast(tdf), ["_lab", "_pfx"], "left")
                .withColumn(
                    "_pfx",
                    F.col("_pfx")
                    + F.when(
                        F.col(f"_d{i}") > F.coalesce(F.col("_t"), F.lit(0.0)),
                        F.lit(1 << i),
                    ).otherwise(F.lit(0)),
                )
                .drop("_t")
            )
    if prev is not None:
        prev.unpersist()
    size = (1 << len(planes)) - 1
    return [
        (lab, [nodes.get(j) for j in range(size)])
        for lab, nodes in sorted(trees.items(), key=lambda kv: kv[0])
    ]


def balanced_cell(
    vec: Column, label: Column, planes: list[list[int]], tree_col: Column
) -> Column:
    """Composite cell id ``label·2^p + tree_bucket(vec)`` — the balanced
    kind's rule assignment. Identical composite STRUCTURE to
    :func:`adaptive_cell` (``cell >> p == label``, so the filtered-probe
    partition arithmetic and every probe/delete/compact path work
    unchanged); only the per-bit threshold differs: bit ``i`` compares
    plane ``i``'s projection against the stored tree node selected by
    the bits already decided (``tree_col[2^i − 1 + prefix]``), with a
    0.0 fallback for NULL nodes/unseen labels (degenerating exactly to
    the sign rule). Still linear in N and shared verbatim by build,
    upsert and frozen-tree rebuild — the layout-identity property is
    preserved."""
    p = len(planes)
    b = F.lit(0)
    for i, plane in enumerate(planes):
        t = F.coalesce(F.element_at(tree_col, F.lit(1 << i) + b), F.lit(0.0))
        b = b + F.when(_plane_proj(vec, plane) > t, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
    return (label.cast("int") * F.lit(1 << p) + b).cast("int")


def _with_balanced_cell(
    spark,
    df: DataFrame,
    planes: list[list[int]],
    tree_rows: list[tuple],
    label_dtype,
    vec_col: str,
    label_col: str,
) -> DataFrame:
    """Attach the balanced composite cell: broadcast-join the tiny
    per-label tree table (n_labels rows — NOT a folded literal, the
    _write_centroid_table lesson) and evaluate the tree walk as a narrow
    expression. LEFT join: labels the build never saw keep a NULL tree
    and fall back to sign-at-zero thresholds."""
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    if not planes:
        return df.withColumn("cell", F.col(label_col).cast("int"))
    schema = StructType(
        [
            StructField(label_col, label_dtype),
            StructField("_btree", ArrayType(DoubleType())),
        ]
    )
    tdf = spark.createDataFrame(
        [(lab, tree) for lab, tree in tree_rows], schema
    )
    return (
        df.join(F.broadcast(tdf), label_col, "left")
        .withColumn(
            "cell",
            balanced_cell(
                _as_double(F.col(vec_col)), F.col(label_col), planes, F.col("_btree")
            ),
        )
        .drop("_btree")
    )


def ivf_index_write_balanced(
    spark,
    emb: DataFrame,
    cache_dir: str,
    src_file: str,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
    planes: list[list[int]] | None = None,
    tree: list[tuple] | None = None,
    cents=None,
) -> str:
    """The BALANCED adaptive at-rest index — same contract and layout as
    :func:`ivf_index_write_adaptive` (cell-partitioned parquet, manifest
    with rule planes + composite-cell centroid means, probes via
    :func:`stored_index_probe` unchanged) but with per-label threshold
    TREES (:func:`balanced_threshold_tree`) in place of sign-at-zero
    buckets, so per-cell population is balanced by construction. The
    manifest carries the trees (``btree``) next to the planes; upserts
    (:func:`ivf_index_upsert_adaptive` detects the kind), deletes and
    compaction re-use the frozen trees, keeping upsert ≡ rebuild and
    delete+compact ≡ rebuild layout identities. ``planes``/``tree``/
    ``cents`` force a frozen quantizer for equivalence-invariant
    rebuilds."""
    from ..constants import make_planes
    from ..plans.layout import _cache_fresh
    from ..sources.formats import _read_manifest, _write_manifest

    if _cache_fresh(cache_dir, src_file) and _read_manifest(cache_dir, INDEX_MANIFEST):
        return cache_dir
    n = emb.count()
    if planes is None:
        planes = make_planes(adaptive_plane_count(n))
    if tree is None:
        tree = balanced_threshold_tree(
            spark, emb, planes, vec_col=vec_col, label_col=label_col, id_col=id_col
        )
    label_dtype = emb.schema[label_col].dataType
    assigned = _with_balanced_cell(
        spark, emb, planes, tree, label_dtype, vec_col, label_col
    )
    assigned.repartition(F.col("cell")).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(cache_dir)
    if cents is None:
        cents = _collect_centroids(
            assigned.select(F.col("cell").alias("label"), vec_col), vec_col
        )
    labels, vecs, cell_dtype = cents
    _write_manifest(
        cache_dir,
        {
            "version": 1,
            "rows": n,
            "tombstones": 0,
            "protocol": "staged",
            "planes": planes,
            "btree": {
                "labels": [lab for lab, _ in tree],
                "trees": [t for _, t in tree],
                "label_dtype": label_dtype.simpleString(),
            },
            "centroids": {
                "labels": labels,
                "vecs": vecs,
                "label_dtype": cell_dtype.simpleString(),
            },
        },
        INDEX_MANIFEST,
    )
    _write_centroid_table(spark, cache_dir, cents)
    return cache_dir


TOMBSTONE_DIR = "_tombstones"  # underscore: hidden from the parquet scan
CENTROID_DIR = "_centroids"  # quantizer as a parquet side table (see probe)
PROBE_ROUTE_MIN_CELLS = 64  # below this, scanning every cell beats routing
DEFAULT_N_PROBE = 2  # unfiltered probes: nearest-cells ranking is informative
FILTERED_PROBE_MIN = 8  # filtered probes never drop below this many cells


def filtered_auto_n_probe(n_eligible_cells: int) -> int:
    """The n_probe a FILTERED probe defaults to: ``max(8, ⌈2·cells/3⌉)``
    of the filter-eligible cells. The r13 recall dial
    (``ann_filtered_recall_at_k``) pinned why a fixed small n_probe is
    wrong here: when the filter excludes the query's own label, its
    nearest allowed vectors scatter across that label's many sign-bucket
    cells and centroid ranking is only weakly informative cross-cluster —
    recall@3 read 0.0 at n_probe ≤ 4 and only reached 0.73–0.80 at 32 of
    48 eligible cells (sf1). So the default scales with the ELIGIBLE
    cell count: ⌈2n/3⌉ is exactly the 32-of-48 operating point the dial
    measured, and recall is monotone in n_probe (probed cell sets are
    nested), so the auto choice is never below the dial's best rung.
    Integer form ``(2n + 2) // 3`` so the DuckDB oracle computes the
    identical gate."""
    return max(FILTERED_PROBE_MIN, (2 * n_eligible_cells + 2) // 3)


def _write_centroid_table(spark, cache_dir: str, cents) -> None:
    """Persist the quantizer as a (cell, cvec) parquet side table next to
    the manifest copy. The manifest stays authoritative for assignment
    (upserts fold it into a narrow literal expression over N rows); the
    side table exists for the PROBE side, where folding C centroids into
    a Catalyst literal made plan cost scale with C — at 2,489 cells the
    1.3 MB from_json literal cost ~1.0 s of py4j expression build plus
    constant-folding per execution, twice (main plan + DPP subquery),
    while the actual pruned candidate scan took 0.13 s. A broadcast join
    against this 2,489-row table keeps the plan O(1) in C."""
    import os

    labels, vecs, label_dtype = cents
    rows = [(lab, [float(x) for x in vec]) for lab, vec in zip(labels, vecs)]
    # pin the cell dtype to the partition column's (createDataFrame infers
    # Python ints as LONG; a cast on the join key would defeat DPP)
    spark.createDataFrame(rows, ["cell", "cvec"]).select(
        F.col("cell").cast(label_dtype), "cvec"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(cache_dir, CENTROID_DIR)
    )


def _centroid_table(spark, path: str) -> DataFrame:
    """(cell, cvec) quantizer frame: the parquet side table when the
    index has one, else rebuilt from the manifest (back-compat with
    indexes written before the side table existed). Values are identical
    either way — parquet stores the exact doubles, manifest JSON
    round-trips them via shortest repr."""
    import os

    cpath = os.path.join(path, CENTROID_DIR)
    if os.path.isdir(cpath):
        return spark.read.parquet(cpath)
    labels, vecs, label_dtype = _stored_centroids(path)
    rows = [(lab, [float(x) for x in vec]) for lab, vec in zip(labels, vecs)]
    return spark.createDataFrame(rows, ["cell", "cvec"]).select(
        F.col("cell").cast(label_dtype), "cvec"
    )


def ivf_index_delete(
    spark,
    cache_dir: str,
    ids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> str:
    """Tombstoned delete — the takedown path a 100 TB training corpus
    hits first (right-to-be-forgotten): victim ids are captured WITH
    their cell and appended under ``_tombstones/`` (underscore dir:
    invisible to the index's parquet scan, like the ``_MANIFEST``
    pointer). No data file is rewritten; probes anti-join the tombstone
    set (:func:`stored_index_probe` does this automatically whenever the
    manifest records live tombstones); :func:`ivf_index_compact`
    reclaims the space per-cell later. Works on both index kinds — the
    layout contract (cell-partitioned parquet + manifest) is shared.

    Victim-cell mapping is REQUEST-sized whenever the caller passes full
    rows: a takedown request carries the documents, so their cells come
    straight from the manifest's quantizer — the rule planes (adaptive
    kind) or the nearest-centroid literal (fixed kind) — as a narrow map
    over the delta, with ZERO index scan. Only an ids-only frame falls
    back to the broadcast semi-scan of the index (one pass, linear in
    index size — the 100 TB caller should pass rows)."""
    import os

    from ..sources.formats import _read_manifest, _write_manifest

    m = _read_manifest(cache_dir, INDEX_MANIFEST)
    if "btree" in m and vec_col in ids.columns and label_col in ids.columns:
        # balanced kind: frozen per-label threshold trees — same
        # request-sized, zero-scan mapping as the plain rule
        from pyspark.sql.types import _parse_datatype_string

        bt = m["btree"]
        victims = (
            _with_balanced_cell(
                spark,
                ids,
                m["planes"],
                list(zip(bt["labels"], bt["trees"])),
                _parse_datatype_string(bt["label_dtype"]),
                vec_col,
                label_col,
            )
            .select(id_col, "cell")
            .distinct()
        )
    elif "planes" in m and vec_col in ids.columns and label_col in ids.columns:
        # adaptive kind: cell = label·2^p + plane_bucket — no scan
        victims = ids.select(
            F.col(id_col),
            adaptive_cell(
                _as_double(F.col(vec_col)), F.col(label_col), m["planes"]
            ).alias("cell"),
        ).distinct()
    elif "planes" not in m and vec_col in ids.columns:
        # fixed kind: nearest stored centroid, a narrow map over the
        # request-sized delta (the centroid literal is small here — the
        # fixed quantizer is the ≤tens-of-cells one by design)
        cents = _stored_centroids(cache_dir)
        victims = ids.select(
            F.col(id_col),
            F.element_at(
                _cells_by_distance(_as_double(F.col(vec_col)), cents), 1
            )["cell"].alias("cell"),
        ).distinct()
    else:
        stored = spark.read.parquet(cache_dir)
        # .distinct() mirrors the rule-mapped and nearest-centroid paths:
        # if the index ever holds a duplicated vec_id (the half-applied
        # upsert window _staged_append now closes, but pre-existing
        # indexes may carry), the semi-scan must not tombstone — and
        # tally — the same (id, cell) twice
        victims = (
            stored.join(F.broadcast(ids.select(id_col).distinct()), id_col)
            .select(id_col, "cell")
            .distinct()
        )
    tomb_path = os.path.join(cache_dir, TOMBSTONE_DIR)
    if m.get("tombstones", 0):
        # idempotence: an id already tombstoned must not be counted twice
        # (compaction settles `rows` by subtracting the tombstone count)
        prior = spark.read.parquet(tomb_path).select(id_col)
        victims = victims.join(F.broadcast(prior), id_col, "left_anti")
    victims = victims.persist()
    n_del = victims.count()
    victims.write.mode("append").parquet(tomb_path)
    victims.unpersist()
    _write_manifest(
        cache_dir,
        {
            **m,
            "version": m["version"] + 1,
            "tombstones": m.get("tombstones", 0) + n_del,
        },
        INDEX_MANIFEST,
    )
    return cache_dir


def ivf_index_compact(spark, cache_dir: str) -> str:
    """Reclaim tombstones PER-CELL: only the cell partitions that
    actually contain tombstoned rows are rewritten (dynamic partition
    overwrite of the anti-joined survivors; a cell whose rows are all
    tombstoned has its directory dropped outright), then the tombstone
    set is cleared and the manifest row count settles to the live
    count. Cost ∝ affected cells — delete batches cluster in few cells,
    so compaction is delta-sized, never a corpus rewrite (the shape
    bm25_compacted_stored established for the text index). The
    invariant delete+compact ≡ rebuild-on-survivors is oracle-pinned by
    the ``ann_index_delete_compact`` registry entry."""
    import os
    import shutil

    from ..sources.formats import _read_manifest, _write_manifest

    m = _read_manifest(cache_dir, INDEX_MANIFEST)
    n_tomb = m.get("tombstones", 0)
    if not n_tomb:
        return cache_dir
    # CRASH RECOVERY (advice r12) — a previous compact that died inside
    # the per-cell swap window (after os.rename(live, bak), before
    # shutil.move(staged, live)) left that cell's live rows ONLY in the
    # hidden _compact_bak_<cell> dir. The survivor scan below would not
    # see them, and finishing would rmtree the only remaining copy. So
    # before recomputing survivors: restore every orphaned backup whose
    # replacement never landed, and drop only backups whose replacement
    # cell dir verifiably exists (the swap completed; the bak is stale).
    for name in sorted(os.listdir(cache_dir)):
        if not name.startswith("_compact_bak_"):
            continue
        bak = os.path.join(cache_dir, name)
        live = os.path.join(cache_dir, f"cell={name[len('_compact_bak_'):]}")
        if os.path.isdir(live):
            shutil.rmtree(bak)
        else:
            os.rename(bak, live)
    tomb_path = os.path.join(cache_dir, TOMBSTONE_DIR)
    tomb_files = (
        [f for f in os.listdir(tomb_path) if f.endswith(".parquet")]
        if os.path.isdir(tomb_path)
        else []
    )
    if not tomb_files:
        # the other tail window: tombstones already cleared (or the dir
        # was gutted mid-rmtree by a crash — only _SUCCESS left, which
        # would make the parquet read below fail outright) but the
        # manifest bump never landed — the data work is complete, so
        # settle the manifest from the live index (rare recovery path;
        # one count, and only over an index that just compacted)
        shutil.rmtree(tomb_path, ignore_errors=True)
        has_cells = any(d.startswith("cell=") for d in os.listdir(cache_dir))
        live_rows = spark.read.parquet(cache_dir).count() if has_cells else 0
        _write_manifest(
            cache_dir,
            {**m, "version": m["version"] + 1, "rows": live_rows, "tombstones": 0},
            INDEX_MANIFEST,
        )
        return cache_dir
    tombs = spark.read.parquet(tomb_path)
    id_col = [c for c in tombs.columns if c != "cell"][0]
    # victim cells are bounded by the quantizer (≤ MAX_CENTROIDS):
    # a driver-side list, like every centroid collect in this module
    cells = sorted(r["cell"] for r in tombs.select("cell").distinct().collect())
    stored = spark.read.parquet(cache_dir)
    affected = stored.filter(F.col("cell").isin(cells))
    keep = affected.join(F.broadcast(tombs.select(id_col)), id_col, "left_anti")
    # settle the row count from what is ACTUALLY removed, not from the
    # tombstone tally: a rule-mapped delete (ids the caller supplied that
    # never existed in the index) or a crash-window double-tombstone must
    # not skew the manifest.
    n_removed = affected.count() - keep.count()
    # ... and settle the BASE from the live index, not the manifest
    # (advice r13): a previous compact that completed every cell swap but
    # crashed partway through clearing the tombstone dir leaves a partial
    # tombstone set whose ids are already gone from the data — the re-run
    # then computes n_removed ≈ 0, and `m["rows"] - n_removed` would
    # freeze the STALE pre-compact count into the manifest forever. The
    # live count is immune: it reads what is actually on disk right now
    # (a parquet count is footer-metadata-bounded, and compaction is
    # already a data-rewriting maintenance pass, so the extra count job
    # is noise next to the survivor rewrite).
    n_live_before = stored.count()
    # stage survivors OUT of the scanned tree (underscore dir: invisible
    # to the index scan), then swap directories per cell — an in-place
    # overwrite would delete the very files the survivor scan is reading,
    # and the staging swap is also the crash-safe order (a crash before
    # the manifest bump leaves the old cells plus live tombstones: still
    # a correct index, since probes keep anti-joining the tombstones)
    tmp = os.path.join(cache_dir, "_compact_tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    keep.repartition(F.col("cell")).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(tmp)
    for cell in cells:
        part = f"cell={cell}"
        old_p = os.path.join(cache_dir, part)
        # swap via a hidden backup, not delete-then-move: a crash inside
        # the window must never leave a cell's LIVE rows unrecoverable
        # (the backup dir is underscore-prefixed, so a half-swapped index
        # still scans cleanly; at warehouse scale this ordering is the
        # table format's commit protocol — this is the local-fs version)
        bak = os.path.join(cache_dir, f"_compact_bak_{cell}")
        shutil.rmtree(bak, ignore_errors=True)
        if os.path.isdir(old_p):
            os.rename(old_p, bak)
        src_part = os.path.join(tmp, part)
        if os.path.isdir(src_part):  # fully-emptied cells stay dropped
            shutil.move(src_part, old_p)
        shutil.rmtree(bak, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(tomb_path, ignore_errors=True)
    _write_manifest(
        cache_dir,
        {
            **m,
            "version": m["version"] + 1,
            "rows": n_live_before - n_removed,
            "tombstones": 0,
        },
        INDEX_MANIFEST,
    )
    return cache_dir


def ivf_kmeans_topk_stored(
    spark,
    emb: DataFrame,
    cache_dir: str,
    src_file: str,
    query_ids: list[int],
    k: int = 3,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-Flat ANN over the STORED index: candidates come from the
    cell-partitioned parquet layout (:func:`ivf_index_write`), so the
    probe join prunes whole cell directories — Spark plans a dynamic
    partition pruning subquery on the broadcast probe side, and the scan
    never opens the other ``n_cells − n_probe`` partitions. Same output
    contract and same oracle as :func:`ivf_kmeans_topk` (the in-plan
    assignment variant): identical results, index cost paid at write
    time instead of per query — the production trade."""
    path = ivf_index_write(spark, emb, cache_dir, src_file, vec_col)
    return stored_index_probe(
        spark,
        path,
        query_ids,
        k=k,
        n_probe=n_probe,
        id_col=id_col,
        vec_col=vec_col,
        queries=emb,
    )


def stored_index_probe(
    spark,
    path: str,
    query_ids: list[int],
    k: int = 3,
    n_probe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    queries: DataFrame | None = None,
    allowed_labels: list[int] | None = None,
    label_col: str = "label",
) -> DataFrame:
    """Probe a SELF-CONTAINED at-rest IVF index: centroids come from the
    index MANIFEST (not re-derived from source data — essential once
    upserts exist, since a re-derived quantizer would silently re-cell
    the probes while the stored layout keeps the old cells).

    ``n_probe=None`` derives the probe width (advice r13, made the
    library default): :data:`DEFAULT_N_PROBE` unfiltered, and
    :func:`filtered_auto_n_probe` of the ELIGIBLE cell count when
    ``allowed_labels`` is set — the scaling rule the r13 recall dial
    pinned (fixed small n_probe reads recall 0.0 cross-cluster). The
    eligible count comes from the manifest driver-side — no extra job.

    ``allowed_labels`` is the FILTERED-search path: restrict the search
    to vectors whose label is in the list, PRE-filter semantics — cells
    whose label fails the predicate are excluded BEFORE the n_probe
    ranking, so every probed cell is filter-eligible (probing
    nearest-overall cells and post-filtering would waste probes on cells
    that contribute zero candidates — the recall trap filtered-ANN
    literature warns about). On the adaptive/balanced kinds the
    composite cell id ENCODES the label (cell >> n_planes == label,
    :func:`adaptive_cell`), so the row predicate is pure cell
    arithmetic: no label column is read, and on the routed path the
    metadata filter degrades into the same static partition predicate
    the probe already pushes — filtered search at exactly the cost of
    fewer partitions scanned. On the FIXED kind a nearest-centroid cell
    says nothing about labels, so eligibility comes from the manifest's
    per-cell label histogram (:func:`ivf_index_write` records it): cells
    with zero filter-eligible mass are dropped before ranking, and the
    surviving candidate rows are POST-VERIFIED on the label column
    (fixed cells are mixed-label — cell pruning alone cannot guarantee
    the predicate). This is the composition of
    ``cosine_topk_filtered``'s exact pre-filter reference with the
    at-rest layout.

    Tombstone-aware: when the manifest records live tombstones
    (:func:`ivf_index_delete`), the tombstoned ids are anti-joined out —
    a broadcast of the request-sized delete set — so deleted vectors
    stop surfacing immediately, before any compaction runs.

    ``queries`` is where the query VECTORS come from; pass the source
    table (or any frame with ``id_col``/``vec_col``). Without it the
    probe falls back to fetching them from the index itself, which
    cannot partition-prune (the id predicate says nothing about cells) —
    measured at the 2M-vector decade, that lookup's per-file footer
    reads were the whole probe cost (~2.3 s across ~2.5k cell files,
    scaling_r12.json), drowning the DPP-pruned candidate scan the index
    exists to provide. Production IVF receives query vectors from the
    caller; the fallback is a convenience for small indexes."""
    import os

    from ..sources.formats import _read_manifest

    m = _read_manifest(path, INDEX_MANIFEST) or {}
    if m.get("rows", None) == 0:
        # a fully-taken-down index (every row deleted, then compacted)
        # has no data files left — the scan cannot even infer a schema,
        # so answer the degenerate probe directly
        from pyspark.sql.types import (
            DoubleType,
            IntegerType,
            LongType,
            StructField,
            StructType,
        )

        id_type = (
            queries.schema[id_col].dataType if queries is not None else LongType()
        )
        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("query_id", id_type),
                    StructField(id_col, id_type),
                    StructField("sim", DoubleType()),
                    StructField("rank", IntegerType()),
                ]
            ),
        )
    stored = spark.read.parquet(path)
    if m.get("tombstones", 0):
        tombs = spark.read.parquet(os.path.join(path, TOMBSTONE_DIR)).select(id_col)
        stored = stored.join(F.broadcast(tombs), id_col, "left_anti")

    q_src = stored if queries is None else queries
    q = with_norm(q_src.filter(F.col(id_col).isin(query_ids)), vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("_vec").alias("_qvec"),
        F.col("_norm").alias("_qnorm"),
    )
    # Cell ranking as a Q×C broadcast join against the quantizer side
    # table, NOT a folded literal: _cells_by_distance's C-element literal
    # made plan cost scale with C (see _write_centroid_table) — Q×C rows
    # here is request-sized (queries × ≤MAX_CENTROIDS). Same selection:
    # qround'd squared L2, (d2, cell) ascending tiebreak, top n_probe —
    # exactly the oracle SQL's qd/probes CTE shape.
    d2 = qround(
        F.aggregate(
            F.zip_with(F.col("_qvec"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        SIM_ROUND,
    )
    cent_tab = _centroid_table(spark, path)
    post_label_filter = False
    if allowed_labels is not None:
        if "planes" in m:
            # rule kinds: label→cell inverse is shift arithmetic
            planes = m["planes"]
            allowed_ints = {int(x) for x in allowed_labels}
            cent_tab = cent_tab.filter(
                F.shiftright(F.col("cell").cast("int"), len(planes)).isin(
                    sorted(allowed_ints)
                )
            )
            n_eligible = sum(
                1
                for c in m["centroids"]["labels"]
                if int(c) >> len(planes) in allowed_ints
            )
        else:
            # fixed kind: eligibility from the manifest label histogram
            hist = m.get("label_hist")
            if hist is None:
                raise ValueError(
                    "filtered search on a fixed-kind index needs the "
                    "manifest label_hist; rebuild with ivf_index_write "
                    "(label column present) to record it"
                )
            allowed_set = set(allowed_labels)
            eligible = sorted(
                {cell for cell, lab, cnt in hist if lab in allowed_set and cnt > 0}
            )
            cent_tab = cent_tab.filter(F.col("cell").isin(eligible))
            n_eligible = len(eligible)
            post_label_filter = True
        if n_probe is None:
            n_probe = filtered_auto_n_probe(n_eligible)
    if n_probe is None:
        n_probe = DEFAULT_N_PROBE
    wq = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("cell"))
    probes_plan = (
        q.crossJoin(F.broadcast(cent_tab))
        .select("query_id", "_qvec", "_qnorm", "cell", d2.alias("d2"))
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select("query_id", "_qvec", "_qnorm", "cell")
    )
    # The probe SELECTION (query vectors + their n_probe cells) is a
    # bounded, request-sized set — so route it DRIVER-SIDE, the way a
    # production IVF coordinator does, and prune the candidate scan with
    # a STATIC partition predicate. Dynamic partition pruning planned a
    # filter here but never pruned at runtime (measured at the 2M decade:
    # 1.6–1.8 s with DPP on, off, or with subquery duplication — vs
    # 0.13 s statically pruned; scaling_r12.json). The collect is Q ×
    # n_probe rows of (id, 64 doubles) and round-trips exactly.
    #
    # Below PROBE_ROUTE_MIN_CELLS the routing roundtrip costs more than
    # it saves (an unpruned scan of a 10-cell index is ~0.1 s; the extra
    # driver job is ~0.6 s — measured on ann_index_upsert_probe, r12
    # bench), so small indexes keep the single fused lazy plan and scan
    # every cell. Identical results either way: the pruning predicate
    # only removes cells no probe row joins with.
    n_cells = len(m["centroids"]["labels"]) if "centroids" in m else 0
    if n_cells < PROBE_ROUTE_MIN_CELLS:
        probes = F.broadcast(probes_plan)
        cand_src = stored
    else:
        sel = probes_plan.collect()
        cells = sorted({r["cell"] for r in sel})
        probes = F.broadcast(spark.createDataFrame(sel, probes_plan.schema))
        cand_src = stored.filter(F.col("cell").isin(cells))
    if post_label_filter:
        # fixed-kind filtered search: probed cells are mixed-label, so
        # the predicate must also run at row level (post-verify)
        cand_src = cand_src.filter(F.col(label_col).isin(list(allowed_labels)))
    cand = with_norm(cand_src, vec_col).select(id_col, "cell", "_vec", "_norm")
    sim = qround(
        dot(F.col("_qvec"), F.col("_vec")) / (F.col("_qnorm") * F.col("_norm")),
        SIM_ROUND,
    )
    pairs = (
        cand.join(probes, "cell")
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", id_col, sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "sim", "rank")
    )


def embedding_stats(emb: DataFrame) -> DataFrame:
    """Per-vector summary statistics computed entirely with JVM
    higher-order array functions (`aggregate` folds — no explode, no UDF,
    no shuffle: a narrow map over the vector column).

    Cross-engine exactness: each fold accumulates integer-quantized
    elements (floor(x·10^6 + 0.5) and floor(x²·10^9 + 0.5) as BIGINT), so
    the per-vector sums are exact integer arithmetic in both engines —
    float32→float64 widening is value-exact, and only the final
    norm/mean are qround'd doubles. At 100 TB this is the zero-exchange
    shape: stats ride the scan, no aggregation tree needed.

    Output: (vec_id, dim, l2_norm, mean_component, max_component).
    """
    S1, S2 = 1_000_000.0, 1_000_000_000.0
    zero = F.lit(0).cast("long")
    qsum = F.aggregate(
        "embedding",
        zero,
        lambda acc, x: acc
        + F.floor(x.cast("double") * F.lit(S1) + F.lit(0.5)).cast("long"),
    )
    qsq = F.aggregate(
        "embedding",
        zero,
        lambda acc, x: acc
        + F.floor(
            x.cast("double") * x.cast("double") * F.lit(S2) + F.lit(0.5)
        ).cast("long"),
    )
    dim = F.size("embedding")
    return emb.select(
        "vec_id",
        dim.cast("int").alias("dim"),
        qround(F.sqrt(qsq / F.lit(S2)), 6).alias("l2_norm"),
        qround(qsum / F.lit(S1) / dim, 6).alias("mean_component"),
        qround(F.array_max("embedding").cast("double"), 6).alias(
            "max_component"
        ),
    )


ABLATION_DIM = 16


def dim_ablation_overlap(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    trunc_dim: int = ABLATION_DIM,
) -> DataFrame:
    """Embedding dimension-ablation check (the Matryoshka-truncation
    question): how much of the exact top-k survives when similarity is
    computed over only the FIRST ``trunc_dim`` dimensions? Retrieval
    pipelines truncate stored vectors to cut index bytes (MRL embeddings
    are trained so prefixes stay usable — Kusupati et al. 2022, public);
    this operator measures what that costs on THIS corpus: overlap@k per
    query between the full-dim and truncated-dim rankings.

    Both rankings reuse :func:`cosine_topk` (same broadcast-query plan,
    rounded-sim rank determinism); the truncated side just slices the
    array column — a narrow JVM expression, no second embedding table.
    Output: (query_id, n_overlap, overlap_frac). A tiny (k·|Q|)-row join
    computes the intersection.
    """
    full = cosine_topk(emb, query_ids, k)
    trunc = cosine_topk(
        emb.withColumn("embedding", F.slice("embedding", 1, trunc_dim)),
        query_ids,
        k,
    )
    hit = trunc.select("query_id", "vec_id", F.lit(1).alias("_hit"))
    from ..numeric import qround as _qr

    return (
        full.select("query_id", "vec_id")
        .join(hit, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_overlap"))
        .select(
            "query_id",
            "n_overlap",
            _qr(F.col("n_overlap").cast("double") / F.lit(float(k)), 6).alias(
                "overlap_frac"
            ),
        )
    )


def cosine_topk_filtered(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    label: int = 0,
) -> DataFrame:
    """Filtered vector search — top-k under a metadata predicate
    (candidates restricted to ``label``), the capability every vector
    store markets as "filtered ANN". Two strategies exist at scale:
    PRE-filter (apply the predicate before scoring — exact, but the
    index must support it; this operator) and POST-filter (score first,
    filter the top-k — cheap but silently returns < k when the filter is
    selective). This exact pre-filter form is the correctness reference
    for both; the IVF/SQ/PQ entries compose with it by pushing the same
    predicate into their candidate scans.

    One line over :func:`cosine_topk`'s candidate_filter hook — same
    broadcast-query/rounded-sim plan, filter pushed to the candidate
    scan.
    """
    return cosine_topk(
        emb, query_ids, k=k, candidate_filter=F.col("label") == label
    )


PCA_ITERS = 8
PCA_S_MOM = 1_000_000_000.0   # second-moment product quantum (1e-9)
PCA_S_MEAN = 1_000_000.0      # mean-numerator quantum (1e-6)
PCA_S_MV = 1_000_000_000_000.0  # matvec / norm / Rayleigh quantum (1e-12)
PCA_S_V = 100_000_000.0       # eigenvector component grid (1e-8)


def _pca_q(x: float, scale: float) -> float:
    import math

    return math.floor(x * scale + 0.5) / scale


def pca_top_component(emb: DataFrame, iters: int = PCA_ITERS) -> DataFrame:
    """Top principal component of the embedding cloud via power
    iteration — the dimensionality-reduction primitive an embedding
    pipeline runs before whitening / ANN (e.g. dropping the dominant
    direction, Mu & Viswanath 2018's all-but-the-top, public).

    Two-phase shape: the O(n·d²) work — upper-triangle second moments
    Σ xⱼxₖ and per-dim sums — is ONE distributed aggregate over a d²/2
    pair explode (map-side combined, one shuffle of d² grouped rows);
    the d×d covariance (64×64 here) is then control-plane state, like
    kmeans centroids (MAX_CENTROIDS convention) and pagerank's
    convergence scalar: the driver runs ``iters`` fixed matvec steps and
    folds the result back out as literals. n·d² scan-side, d² driver-side
    — nothing corpus-sized leaves the executors at any scale.

    Cross-engine exactness (pagerank/logreg template): every float sum
    that either engine could reorder is an integer sum of quantized
    terms — per-row products at 1e-9, matvec/norm/Rayleigh terms at
    1e-12 — and each iteration re-quantizes v to the 1e-8 grid, so all
    ``iters`` steps, the eigenvalue, and the variance share are
    bit-identical to the DuckDB twin's iterative CTEs. v₀ = 1/8 (exact
    dyadic 1/√64); sqrt and division are IEEE-deterministic.

    Output: one row per dimension (1-based) with the component loading,
    plus the Rayleigh eigenvalue and explained-variance share (λ/tr C).
    """
    d, v, lam_q, tr_q = _pca_power_state(emb, iters)
    lam = _pca_q(lam_q / PCA_S_MV, 1_000_000.0)
    var_share = _pca_q((lam_q / PCA_S_MV) / (tr_q / PCA_S_MOM), 1_000_000.0)
    spark = emb.sparkSession
    return spark.createDataFrame(
        [(j + 1, v[j], lam, var_share) for j in range(d)],
        "dim int, loading double, eigenvalue double, var_share double",
    )


def _pca_power_state(
    emb: DataFrame, iters: int = PCA_ITERS
) -> tuple[int, list[float], int, int]:
    """Distributed covariance moments + driver-side quantized power
    iteration (see :func:`pca_top_component`). Returns control-plane
    state: (d, unit eigenvector on the 1e-8 grid, Rayleigh numerator at
    1e-12, trace numerator at 1e-9)."""
    import math

    d_row = emb.select(F.size("embedding").alias("d")).first()
    d = int(d_row["d"])
    ex = emb.select("embedding", F.posexplode("embedding").alias("j", "xj"))
    pairs = ex.select(
        "j",
        F.col("xj").cast("double").alias("xj"),
        F.posexplode(
            F.slice(F.col("embedding"), F.col("j") + 1, F.lit(d) - F.col("j"))
        ).alias("k0", "xk"),
    ).select(
        "j",
        (F.col("j") + F.col("k0")).alias("k"),
        (
            F.floor(
                F.col("xj") * F.col("xk").cast("double") * F.lit(PCA_S_MOM)
                + F.lit(0.5)
            ).cast("long")
        ).alias("q"),
    )
    mom = {
        (int(r["j"]), int(r["k"])): int(r["sq"])
        for r in pairs.groupBy("j", "k").agg(F.sum("q").alias("sq")).collect()
    }  # bounded: d(d+1)/2 rows — control-plane read, not corpus data
    means = {
        int(r["j"]): int(r["mq"])
        for r in ex.groupBy("j")
        .agg(
            F.sum(
                F.floor(F.col("xj").cast("double") * F.lit(PCA_S_MEAN) + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("mq")
        )
        .collect()
    }
    n = emb.count()

    def cov(j: int, k: int) -> float:
        lo, hi = (j, k) if j <= k else (k, j)
        s = (mom[(lo, hi)] / PCA_S_MOM) / n
        mj = (means[j] / PCA_S_MEAN) / n
        mk = (means[k] / PCA_S_MEAN) / n
        return s - mj * mk

    C = [[cov(j, k) for k in range(d)] for j in range(d)]
    v = [1.0 / 8.0] * d
    for _ in range(iters):
        qs = [
            sum(math.floor(C[k][j] * v[j] * PCA_S_MV + 0.5) for j in range(d))
            for k in range(d)
        ]
        u = [q / PCA_S_MV for q in qs]
        nq = sum(math.floor(x * x * PCA_S_MV + 0.5) for x in u)
        norm = math.sqrt(nq / PCA_S_MV)
        v = [_pca_q(x / norm, PCA_S_V) for x in u]
    qs = [
        sum(math.floor(C[k][j] * v[j] * PCA_S_MV + 0.5) for j in range(d))
        for k in range(d)
    ]
    u = [q / PCA_S_MV for q in qs]
    lam_q = sum(math.floor(v[k] * u[k] * PCA_S_MV + 0.5) for k in range(d))
    tr_q = sum(math.floor(C[j][j] * PCA_S_MOM + 0.5) for j in range(d))
    return d, v, lam_q, tr_q


def pca_project_residual(emb: DataFrame, iters: int = PCA_ITERS) -> DataFrame:
    """All-but-the-top projection (Mu & Viswanath 2018): per-vector score
    along the corpus's dominant principal direction and the residual norm
    after removing it — the isotropy-restoring post-process an embedding
    pipeline runs before similarity search.

    The component comes from :func:`_pca_power_state` (control-plane, see
    pca_top_component); the projection itself is a NARROW per-row map —
    the eigenvector folds back in as a 64-element literal array, and the
    dot product / squared norm run JVM-side via zip_with + aggregate over
    quantized integer terms (no UDF, no shuffle, embarrassingly parallel
    at any corpus size).

    Exactness: score and norm are integer sums of per-term
    floor(x·w·1e12 + 0.5) addends — array-ordered folds, identical in
    the DuckDB twin — and the outputs are qround-pinned.
    """
    d, v, _lam_q, _tr_q = _pca_power_state(emb, iters)
    w_lit = F.array(*[F.lit(float(c)) for c in v])
    s = F.lit(PCA_S_MV)
    zero = F.lit(0).cast("long")
    score_q = F.aggregate(
        F.zip_with(
            "embedding",
            w_lit,
            lambda x, w: F.floor(x.cast("double") * w * s + F.lit(0.5)).cast(
                "long"
            ),
        ),
        zero,
        lambda acc, e: acc + e,
    )
    ssq = F.aggregate(
        F.transform(
            "embedding",
            lambda x: F.floor(
                x.cast("double") * x.cast("double") * s + F.lit(0.5)
            ).cast("long"),
        ),
        zero,
        lambda acc, e: acc + e,
    )
    score = score_q / s
    resid = F.sqrt(F.greatest(ssq / s - score * score, F.lit(0.0)))
    from ..numeric import qround

    return emb.select(
        "vec_id",
        qround(score, 6).alias("score"),
        qround(resid, 6).alias("resid_norm"),
    )


KNN_CLASSIFY_K = 5


def knn_classify(
    emb: DataFrame,
    query_ids: list[int],
    k: int = KNN_CLASSIFY_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """kNN classification — the canonical downstream consumer of the
    similarity-search family: predict each query vector's label by
    majority vote over its k exact-cosine neighbours (self excluded),
    and report the vote against the stored truth.

    Deterministic end to end: neighbours come from :func:`cosine_topk`
    (qrounded sim + id tiebreak); the vote winner breaks count ties on
    the smaller label. Output per query: (query_id, predicted_label,
    n_votes, true_label, correct).

    Scale: the neighbour search is the dominant cost and inherits
    whichever index family serves it (exact here; swap in the IVF/PQ
    entries for the 100 TB path — the vote is index-agnostic). The vote
    itself is a query-keyed aggregate + one row_number window over ≤ k
    rows per query, with the truth side a broadcast of the query set.
    """
    nn = cosine_topk(emb, query_ids, k=k, id_col=id_col, vec_col=vec_col)
    neigh = nn.join(
        emb.select(F.col(id_col), F.col(label_col).alias("n_label")), id_col
    )
    votes = neigh.groupBy("query_id", "n_label").agg(
        F.count("*").alias("n_votes")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("n_label")
    )
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("n_label").cast("int").alias("predicted_label"),
            F.col("n_votes").cast("long").alias("n_votes"),
        )
    )
    truth = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).cast("int").alias("true_label"),
    )
    return (
        pred.join(F.broadcast(truth), "query_id")
        .select(
            "query_id",
            "predicted_label",
            "n_votes",
            "true_label",
            (F.col("predicted_label") == F.col("true_label"))
            .cast("int")
            .alias("correct"),
        )
        .orderBy("query_id")
    )


def mine_hard_negatives(
    emb: DataFrame,
    anchor_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive-training data curation: for each anchor vector, the
    nearest SAME-label neighbour (the positive) and the nearest
    DIFFERENT-label neighbour (the hard negative) by exact cosine, with
    the margin between them — the standard triplet-mining step before
    embedding fine-tuning (hard negatives are the pairs the current
    space already confuses).

    Deterministic: qrounded sims + id tiebreak (the cosine_topk
    contract); each anchor emits exactly one row via two rank-1 picks
    pivoted into columns. Scale: inherits the neighbour search's cost
    shape (exact brute force here, the IVF/PQ families at 100 TB);
    anchors broadcast, one query-keyed window pass over the candidate
    stream.
    """
    base = with_norm(emb, vec_col)
    q = base.filter(F.col(id_col).isin(anchor_ids)).select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("a_label"),
        F.col("_vec").alias("_qvec"),
        F.col("_norm").alias("_qnorm"),
    )
    c = base.select(
        F.col(id_col).alias("cand_id"),
        F.col(label_col).alias("c_label"),
        "_vec",
        "_norm",
    )
    sim = qround(
        dot(F.col("_qvec"), F.col("_vec")) / (F.col("_qnorm") * F.col("_norm")),
        SIM_ROUND,
    )
    pairs = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("anchor_id") != F.col("cand_id"))
        .select(
            "anchor_id",
            "cand_id",
            (F.col("c_label") == F.col("a_label")).alias("same"),
            sim.alias("sim"),
        )
    )
    w = Window.partitionBy("anchor_id", "same").orderBy(
        F.desc("sim"), F.asc("cand_id")
    )
    best = pairs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    picked = best.groupBy("anchor_id").agg(
        F.max(F.when(F.col("same"), F.col("cand_id"))).alias("pos_id"),
        F.max(F.when(F.col("same"), F.col("sim"))).alias("pos_sim"),
        F.max(F.when(~F.col("same"), F.col("cand_id"))).alias("neg_id"),
        F.max(F.when(~F.col("same"), F.col("sim"))).alias("neg_sim"),
    )
    return (
        picked.filter(
            F.col("pos_id").isNotNull() & F.col("neg_id").isNotNull()
        )
        .select(
            "anchor_id",
            "pos_id",
            "pos_sim",
            "neg_id",
            "neg_sim",
            qround(F.col("pos_sim") - F.col("neg_sim"), 6).alias("margin"),
        )
        .orderBy("anchor_id")
    )


MMR_LAMBDA = 0.7
MMR_CANDIDATES = 10
MMR_K = 5


def mmr_diversify(
    emb: DataFrame,
    query_ids: list[int],
    k: int = MMR_K,
    n_candidates: int = MMR_CANDIDATES,
    lam: float = MMR_LAMBDA,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998,
    public): greedily re-order each query's top-N candidates so every
    pick balances relevance against redundancy with what's already
    picked —

        pick_t = argmax  λ·rel(c) − (1−λ)·max_{s∈picked} sim(c, s)

    (step 1 has no picked set: pure relevance). The search-result
    diversification step between retrieval and display.

    Fully distributed and collect-free: the greedy loop unrolls into k
    dataframe steps (the logreg unrolled-iteration template) — each step
    joins the remaining candidates to the picked set, takes a per-query
    row_number argmax (qrounded score + id tiebreak), and unions the
    pick. All frames after candidate generation are bounded by
    |queries|·n_candidates (the candidate matrix is n² per query — 100
    rows at the defaults), so every step is broadcast-sized regardless
    of corpus scale; the corpus-sized work is the one candidate search,
    which inherits the ANN family's cost shape.
    """
    cands = cosine_topk(emb, query_ids, k=n_candidates, id_col=id_col, vec_col=vec_col).select(
        "query_id", F.col(id_col).alias("cand_id"), F.col("sim").alias("rel")
    ).localCheckpoint()
    base = with_norm(emb, vec_col).select(
        F.col(id_col).alias("m_id"), "_vec", "_norm"
    )
    a = base.select(
        F.col("m_id").alias("a_id"),
        F.col("_vec").alias("_av"),
        F.col("_norm").alias("_an"),
    )
    b = base.select(
        F.col("m_id").alias("b_id"),
        F.col("_vec").alias("_bv"),
        F.col("_norm").alias("_bn"),
    )
    ca = cands.select("query_id", F.col("cand_id").alias("a_id"))
    cb = cands.select("query_id", F.col("cand_id").alias("b_id"))
    simmat = (
        ca.join(cb, "query_id")
        .filter(F.col("a_id") != F.col("b_id"))
        .join(F.broadcast(a), "a_id")
        .join(F.broadcast(b), "b_id")
        .select(
            "query_id",
            "a_id",
            "b_id",
            qround(
                dot(F.col("_av"), F.col("_bv"))
                / (F.col("_an") * F.col("_bn")),
                SIM_ROUND,
            ).alias("sim"),
        )
        .localCheckpoint()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("cand_id")
    )
    # step 1: pure relevance
    picked = (
        cands.withColumn("score", qround(F.lit(lam) * F.col("rel"), SIM_ROUND))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", "cand_id", "score", F.lit(1).alias("rank"))
    )
    for t in range(2, k + 1):
        remaining = cands.join(
            picked.select("query_id", "cand_id"),
            ["query_id", "cand_id"],
            "left_anti",
        )
        red = (
            remaining.join(
                picked.select(
                    "query_id", F.col("cand_id").alias("p_id")
                ),
                "query_id",
            )
            .join(
                simmat.select(
                    "query_id",
                    F.col("a_id").alias("cand_id"),
                    F.col("b_id").alias("p_id"),
                    "sim",
                ),
                ["query_id", "cand_id", "p_id"],
            )
            .groupBy("query_id", "cand_id", "rel")
            .agg(F.max("sim").alias("redundancy"))
        )
        scored = red.withColumn(
            "score",
            qround(
                F.lit(lam) * F.col("rel")
                - F.lit(1.0 - lam) * F.col("redundancy"),
                SIM_ROUND,
            ),
        )
        pick_t = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("query_id", "cand_id", "score", F.lit(t).alias("rank"))
        )
        picked = picked.unionByName(pick_t).localCheckpoint()
    return picked.select(
        "query_id", F.col("cand_id").alias("vec_id"), "rank", "score"
    ).orderBy("query_id", "rank")


def ndcg_ivf(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """nDCG@k of the multi-probe IVF/LSH ranking against the exact
    brute-force ideal — the GRADED companion to recall@k (recall counts
    set membership; nDCG also charges the approximate index for ranking
    a good neighbour low). Gains are (sim+1)/2 (cosine mapped to [0,1])
    with the standard 1/log2(rank+1) discount; both rankings are
    deterministic (qrounded sims + id tiebreaks), so the metric carries
    an exact oracle.

    By subset-dominance + rearrangement, DCG ≤ IDCG, so ndcg ∈ [0,1];
    queries whose probe set finds nothing score 0. Per-item gains are
    decimal-summed (order-free); the ratio is qround-pinned.
    """
    exact = cosine_topk(emb, query_ids, k=k, id_col=id_col, vec_col=vec_col)
    approx = ivf_topk(emb, query_ids, k=k, id_col=id_col, vec_col=vec_col)

    def dcg_of(df: DataFrame, out: str) -> DataFrame:
        gain = ((F.col("sim") + F.lit(1.0)) / F.lit(2.0)) / F.log2(
            (F.col("rank") + 1).cast("double")
        )
        return df.groupBy("query_id").agg(dsum(gain).alias(out))

    ideal = dcg_of(exact, "idcg_raw")
    got = dcg_of(approx, "dcg_raw")
    j = ideal.join(got, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("dcg_raw"), F.lit(0.0)).alias("dcg_raw"),
        "idcg_raw",
    )
    return j.select(
        "query_id",
        qround(F.col("dcg_raw"), 6).alias("dcg"),
        qround(F.col("idcg_raw"), 6).alias("idcg"),
        qround(F.col("dcg_raw") / F.col("idcg_raw"), 6).alias("ndcg"),
    ).orderBy("query_id")
