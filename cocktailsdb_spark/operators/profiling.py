"""Data-observability operators: CDC snapshot diff and per-column table
profiling (the deequ/"expectations" primitives a managed pipeline runs
on every load; the reference's analog is its ad-hoc ``PRAGMA``-style
inspection of the freshly built SQLite tables).

Both are pure JVM-side DataFrame programs with exact DuckDB twins in
registry_ext.py.

Scale notes:
- snapshot_diff is ONE full-outer join on the snapshot key — the same
  shuffle shape as MERGE (operators/scd.py); change detection is a
  per-row null-safe column compare (no row hashing, so no cross-engine
  hash dependency and no false equality).
- profile_table is one aggregate pass over the table. The exact
  distinct counts make Spark plan an Expand (one replicated pass per
  distinct column); at 100 TB swap ``exact=False`` to HLL
  (approx_count_distinct) and the Expand disappears — both paths are
  the same operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, compare: list[str]
) -> DataFrame:
    """Row-level CDC between two snapshots of a keyed table: emits one row
    per changed key with change_type ∈ {insert, delete, update}
    (unchanged keys are dropped). Updates are detected with null-safe
    per-column comparison (<=> / IS NOT DISTINCT FROM), never a row
    hash."""
    o = old.select(key, *compare)
    n = new.select(key, *compare)
    j = o.alias("o").join(n.alias("n"), F.col(f"o.{key}") == F.col(f"n.{key}"), "full_outer")
    same: Column | None = None
    for c in compare:
        eq = F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        same = eq if same is None else (same & eq)
    change = (
        F.when(F.col(f"o.{key}").isNull(), F.lit("insert"))
        .when(F.col(f"n.{key}").isNull(), F.lit("delete"))
        .when(~same, F.lit("update"))
    )
    return (
        j.select(
            F.coalesce(F.col(f"o.{key}"), F.col(f"n.{key}")).alias(key),
            change.alias("change_type"),
        )
        .filter(F.col("change_type").isNotNull())
    )


PROFILE_NUM = ("c_custkey", "c_nationkey", "c_acctbal")
PROFILE_STR = ("c_name", "c_mktsegment")


def profile_table(
    df: DataFrame,
    num_cols: tuple[str, ...] = PROFILE_NUM,
    str_cols: tuple[str, ...] = PROFILE_STR,
    exact: bool = True,
) -> DataFrame:
    """Per-column quality profile in ONE aggregate pass: row count, null
    count, distinct count (exact by default; ``exact=False`` switches to
    the mergeable HLL sketch for corpus scale), numeric min/max as
    doubles, string min/max lexicographically. Output: one row per
    profiled column."""
    nd = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs: list[Column] = [F.count("*").alias("_n_rows")]
    for c in num_cols + str_cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}"))
        aggs.append(nd(c).alias(f"_nd_{c}"))
    for c in num_cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"_max_{c}"))
    for c in str_cols:
        aggs.append(F.min(F.col(c)).alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c)).alias(f"_max_{c}"))
    wide = df.agg(*aggs)
    parts = []
    for c in num_cols:
        parts.append(
            f"'{c}', _n_rows, _nulls_{c}, _nd_{c}, _min_{c}, _max_{c}, "
            "CAST(NULL AS STRING), CAST(NULL AS STRING)"
        )
    for c in str_cols:
        parts.append(
            f"'{c}', _n_rows, _nulls_{c}, _nd_{c}, "
            f"CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), _min_{c}, _max_{c}"
        )
    k = len(parts)
    return wide.select(
        F.expr(
            f"stack({k}, {', '.join(parts)}) AS "
            "(column_name, n_rows, n_nulls, n_distinct, "
            "min_num, max_num, min_str, max_str)"
        )
    )


CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def correlation_matrix(
    df: DataFrame, cols: tuple[str, ...] = CORR_COLS
) -> DataFrame:
    """Pairwise Pearson correlation over numeric columns — the profiling
    primitive behind feature-drift and redundancy checks. ONE aggregate
    pass computes every Σx, Σx² and Σxy as DECIMAL(38,10) (exact — no
    float summation-order dependence), then the correlations are single
    same-order IEEE expressions per pair, so the DuckDB twin is
    value-exact. Output: one row per unordered pair (col_a < col_b).

    Scale shape: one map-side-combined aggregate producing
    O(n_cols²) scalars; the pair expansion happens on the 1-row
    aggregate, never on data."""
    from ..numeric import dsum, qround

    # the stats_moments recipe: products in IEEE double (identical on both
    # engines), then DECIMAL(24,8)-exact sums (order-insensitive) — every
    # Σx, Σx², Σxy matches DuckDB bit-for-bit
    aggs = [F.count("*").alias("n")]
    for c in cols:
        aggs.append(dsum(F.col(c)).alias(f"s_{c}"))
        aggs.append(dsum(F.col(c) * F.col(c)).alias(f"ss_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(dsum(F.col(a) * F.col(b)).alias(f"sp_{a}_{b}"))
    agg = df.agg(*aggs)
    # expand pairs with ONE explode over the single aggregate row — a
    # union of per-pair selects would re-run the aggregate per branch
    pair_structs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            n = F.col("n").cast("double")
            sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
            ssa, ssb = F.col(f"ss_{a}").cast("double"), F.col(f"ss_{b}").cast("double")
            sp = F.col(f"sp_{a}_{b}").cast("double")
            corr = (n * sp - sa * sb) / F.sqrt(
                (n * ssa - sa * sa) * (n * ssb - sb * sb)
            )
            pair_structs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    qround(corr, 6).alias("pearson_r"),
                )
            )
    return agg.select(F.explode(F.array(*pair_structs)).alias("p")).select("p.*")


def join_skew_report(
    df: DataFrame, key: str, top_n: int = 10
) -> DataFrame:
    """Shuffle-skew diagnostic for a prospective join/groupBy key: the
    top_n heaviest key values with their row counts, share of the table,
    and ratio to the average key weight — the number that says whether a
    shuffle on this key needs salting (ratio >> 1) or AQE skew-join
    handling. This is the measurement step the engine's own salted paths
    (salted_groupby, sessionize_skew_chunked) presume someone ran.

    ONE data-sized shuffle (the key aggregate); the distinct-key count and
    total ride the same aggregate via a second tiny rollup of it, joined
    back as a broadcast scalar. TakeOrdered top_n, count-desc then key
    for determinism. pct/avg ratios are single same-order IEEE divisions,
    qround'd.
    """
    from ..numeric import qround

    per_key = df.groupBy(F.col(key).alias("key_value")).agg(
        F.count("*").alias("n")
    )
    totals = per_key.agg(
        F.sum("n").alias("total_rows"),
        F.count("*").alias("n_keys"),
    )
    return (
        per_key.crossJoin(F.broadcast(totals))
        .select(
            F.col("key_value").cast("string").alias("key_value"),
            "n",
            qround(F.col("n") / F.col("total_rows"), 6).alias("pct_of_rows"),
            qround(
                F.col("n") / (F.col("total_rows") / F.col("n_keys")), 4
            ).alias("x_avg_key"),
        )
        .orderBy(F.desc("n"), F.asc("key_value"))
        .limit(top_n)
    )


CORR_LANE_SCALE = 10**8  # value quantization (half-up, 8 dp — same as dsum's cast)
CORR_LANE_SPLIT = 2**32  # hi/lo lane divisor


def correlation_matrix_fast(
    df: DataFrame, cols: tuple[str, ...] = CORR_COLS
) -> DataFrame:
    """`correlation_matrix`'s BIGINT-lane twin: the same one-pass exact
    Pearson matrix, but every Σx/Σx²/Σxy accumulates as TWO plain BIGINT
    sums (hi = q >> 32, lo = q & 0xFFFFFFFF of the half-up-quantized
    product q = floor(v·10⁸ + 0.5)) instead of one DECIMAL sum. Decimal
    aggregation leaves the fixed-width codegen fast path once the sum
    exceeds 18 digits; two long sums stay in it — same exactness
    guarantee (integer arithmetic end-to-end, reconstruction is the
    identical IEEE expression on both engines), measured ~4× cheaper at
    sf0.1 (the simhash hugeMethodLimit lesson applied to aggregation).

    Bound (documented, asserted nowhere hotter than the docstring): per
    aggregate, Σlo < N·2³² must stay under 2⁶³ → N < 2³¹ rows per
    (partial+final) aggregate — beyond ~2B rows use `correlation_matrix`
    or add a third lane. All inputs must be non-negative (true for the
    TPC-H measure columns; floor(x+0.5) is half-up only for x ≥ 0).

    Output: identical schema to `correlation_matrix`."""
    from ..numeric import qround

    def lanes(v, name):
        q = F.floor(v * F.lit(float(CORR_LANE_SCALE)) + F.lit(0.5)).cast(
            "long"
        )
        return [
            F.sum(F.shiftright(q, 32)).alias(f"hi_{name}"),
            F.sum(q.bitwiseAND(F.lit(CORR_LANE_SPLIT - 1))).alias(
                f"lo_{name}"
            ),
        ]

    def rebuild(name):
        return (
            F.col(f"hi_{name}").cast("double") * F.lit(float(CORR_LANE_SPLIT))
            + F.col(f"lo_{name}").cast("double")
        ) / F.lit(float(CORR_LANE_SCALE))

    aggs = [F.count("*").alias("n")]
    for c in cols:
        aggs += lanes(F.col(c), f"s_{c}")
        aggs += lanes(F.col(c) * F.col(c), f"ss_{c}")
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs += lanes(F.col(a) * F.col(b), f"sp_{a}_{b}")
    agg = df.agg(*aggs)
    pair_structs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            n = F.col("n").cast("double")
            sa, sb = rebuild(f"s_{a}"), rebuild(f"s_{b}")
            ssa, ssb = rebuild(f"ss_{a}"), rebuild(f"ss_{b}")
            sp = rebuild(f"sp_{a}_{b}")
            corr = (n * sp - sa * sb) / F.sqrt(
                (n * ssa - sa * sa) * (n * ssb - sb * sb)
            )
            pair_structs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    qround(corr, 6).alias("pearson_r"),
                )
            )
    return agg.select(F.explode(F.array(*pair_structs)).alias("p")).select("p.*")


# per-aggregate overflow bound of the BIGINT lanes: Σlo < N·2³² must stay
# under 2⁶³ → N < 2³¹ rows (see correlation_matrix_fast's docstring)
CORR_FAST_MAX_ROWS = 2**31 - 1


def correlation_matrix_auto(
    df: DataFrame, cols: tuple[str, ...] = CORR_COLS
) -> DataFrame:
    """The registered default correlation plan: dispatch to the BIGINT-lane
    :func:`correlation_matrix_fast` (measured 4× cheaper at sf0.1, 46× at
    sf10) whenever its overflow bound provably holds, else fall back to
    the DECIMAL-exact :func:`correlation_matrix`. Both lanes produce
    bit-identical output (cross-pinned in tests + by the shared DuckDB
    oracle), so the dispatch never changes results — only the aggregation
    arithmetic.

    The guard is ONE scan-light pre-pass: count(*) plus per-column min
    (non-negativity is the other fast-lane precondition — floor(x+0.5) is
    half-up only for x ≥ 0). Against parquet this aggregate is eligible
    for footer-statistics pushdown; even unpushed it reads nothing but
    ``cols`` and is trivially cheaper than the 28-sum main aggregate.
    """
    pre = df.agg(
        F.count("*").alias("n"),
        *[F.min(F.col(c)).alias(f"min_{c}") for c in cols],
    ).collect()[0]
    fits = pre["n"] <= CORR_FAST_MAX_ROWS and all(
        pre[f"min_{c}"] is not None and pre[f"min_{c}"] >= 0 for c in cols
    )
    if fits:
        return correlation_matrix_fast(df, cols)
    return correlation_matrix(df, cols)


RUN_COLUMNS = ("event_type", "user_id")


def encoding_runs_report(
    events: DataFrame, cols: tuple[str, ...] = RUN_COLUMNS
) -> DataFrame:
    """Storage-encoding advisor: for each candidate column, how many value
    RUNS it has when the table is laid out in its natural (ts, event_id)
    order — the number an RLE/dictionary encoder actually compresses
    against (parquet RLE_DICTIONARY, ORC RLEv2). Emits runs, distinct
    count, average run length and runs/rows ratio per column; a ratio
    near 1 says "this column won't RLE under this sort order", which is
    exactly the evidence a zorder/range-sort layout decision needs
    (plans/layout.py writes those layouts).

    DISTRIBUTED run counting — the interesting part: a run count under a
    global total order normally wants one global window (single-reducer
    sort, the classic scale-killer). Instead each calendar-day slice
    counts its internal runs under a day-partitioned window, every day
    also reports its first/last values (min/max over a (ts, event_id, v)
    struct — no second sort), and a day-sized boundary pass subtracts one
    run wherever a day's first value null-safe-equals the previous day's
    last. Exactly the split-merge identity segmented-scan compilers use;
    the data-sized shuffle is ONE hash exchange on day, and the boundary
    frame is calendar-sized (~2.5k rows for 7 years), not data-sized.

    The DuckDB twin runs the naive single global window — the engine's
    distributed form must reproduce it bit-for-bit.
    """
    day = F.col("ts").cast("date").alias("day")
    w = Window.partitionBy("day").orderBy("ts", "event_id")
    proj = [day, "ts", "event_id"] + [F.col(c) for c in cols]
    base = events.select(*proj)
    chg = [
        (~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w)))
        | F.isnull(F.lag(F.struct(F.col(c))).over(w))
        for c in cols
    ]
    with_chg = base.select(
        "day",
        "ts",
        "event_id",
        *[F.col(c) for c in cols],
        *[c.cast("long").alias(f"_chg_{i}") for i, c in enumerate(chg)],
    )
    per_day = with_chg.groupBy("day").agg(
        F.count("*").alias("day_rows"),
        *[F.sum(f"_chg_{i}").alias(f"day_runs_{i}") for i in range(len(cols))],
        *[
            F.min(F.struct("ts", "event_id", F.col(c).alias("v")))["v"].alias(
                f"first_{i}"
            )
            for i, c in enumerate(cols)
        ],
        *[
            F.max(F.struct("ts", "event_id", F.col(c).alias("v")))["v"].alias(
                f"last_{i}"
            )
            for i, c in enumerate(cols)
        ],
    )
    wd = Window.orderBy("day")
    stitched = per_day.select(
        "day",
        "day_rows",
        *[
            (
                F.col(f"day_runs_{i}")
                # subtract only when a previous day EXISTS (struct-lag
                # null means first day — eqNullSafe alone would wrongly
                # merge a NULL-valued first run with "no previous day")
                - F.when(
                    F.lag(F.struct(F.col(f"last_{i}"))).over(wd).isNotNull()
                    & F.col(f"first_{i}").eqNullSafe(
                        F.lag(F.col(f"last_{i}")).over(wd)
                    ),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias(f"adj_runs_{i}")
            for i in range(len(cols))
        ],
    )
    totals = stitched.agg(
        F.sum("day_rows").alias("n_rows"),
        *[F.sum(f"adj_runs_{i}").alias(f"runs_{i}") for i in range(len(cols))],
    )
    distincts = events.agg(
        *[
            F.countDistinct(F.col(c)).alias(f"nd_{i}")
            for i, c in enumerate(cols)
        ]
    )
    from ..numeric import qround

    joined = totals.crossJoin(F.broadcast(distincts))
    # pair expansion on the ONE-row aggregate via a single explode —
    # a union of per-column selects would duplicate the whole data-sized
    # subtree per branch (same pattern as correlation_matrix)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col(f"nd_{i}").cast("long").alias("n_distinct"),
            F.col(f"runs_{i}").cast("long").alias("n_runs"),
            qround(
                F.col("n_rows").cast("double") / F.col(f"runs_{i}"), 4
            ).alias("avg_run_len"),
            qround(
                F.col(f"runs_{i}").cast("double") / F.col("n_rows"), 6
            ).alias("runs_ratio"),
        )
        for i, c in enumerate(cols)
    ]
    return joined.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


HLL_REL_ERR = 0.05


def hll_sketch_rollup(events: DataFrame, bound: float = HLL_REL_ERR) -> DataFrame:
    """Re-aggregatable distinct-count sketches — the lakehouse rollup
    pattern: per-month HLL sketches (Apache DataSketches via
    ``hll_sketch_agg``, Spark 3.5+) are UNION-merged to the global grain
    without rescanning the fact table. countDistinct partials cannot be
    merged (distinct is not decomposable); sketch partials can — that is
    the entire point, and at 100 TB the monthly sketch table (KBs) is
    what a dashboard re-aggregates per filter, not the events.

    Output: one row per month plus an ALL row — (scope, n_exact,
    within_bound). The estimate itself is engine-specific (DuckDB has no
    DataSketches twin), so the oracle checks the EXACT column and that
    the deterministic sketch estimate stayed within ``bound`` of it —
    with lgConfigK=12's ~1.6 % standard error a 5 % gate is stable. The
    exact columns exist only to power this verification; production
    keeps the sketches.
    """
    month = F.date_format("ts", "yyyy-MM").alias("month")
    monthly = events.groupBy(month).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("n_exact"),
    )
    per_month = monthly.select(
        F.col("month").alias("scope"),
        "n_exact",
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("n_exact"))
            <= F.lit(bound) * F.col("n_exact")
        ).alias("within_bound"),
    )
    # merge the SKETCHES (not the data) to the global grain; the global
    # exact below rescans events only because the oracle needs it
    g_est = monthly.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    g_exact = events.agg(F.countDistinct("user_id").alias("n_exact"))
    global_row = g_exact.crossJoin(F.broadcast(g_est)).select(
        F.lit("ALL").alias("scope"),
        "n_exact",
        (
            F.abs(F.col("est") - F.col("n_exact"))
            <= F.lit(bound) * F.col("n_exact")
        ).alias("within_bound"),
    )
    return per_month.unionByName(global_row)


def observed_load_metrics(df: DataFrame) -> DataFrame:
    """Load-time QA metrics via ``pyspark.sql.Observation`` — counters
    that PIGGYBACK the load action itself (Spark's observable metrics /
    CollectMetrics API) instead of paying a second scan: at 100 TB the
    difference between "profile while writing" and "profile afterwards"
    is a full reread of the table. deequ's "analyzer on the write path"
    is the same idea; here it is the raw public API.

    The observed expressions use the repo's exactness recipes (decimal
    revenue sum, BIGINT counts, min/max dates formatted) so the one-row
    result is engine-exact; the oracle recomputes the identical metrics
    with a plain aggregate. The pass that carries the metrics runs
    through the no-op sink — all partitions computed, nothing collected.
    """
    from pyspark.sql import Observation

    from ..numeric import dsum

    obs = Observation("load_qa")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("null_qty"),
        F.min(F.to_date("l_shipdate")).alias("min_day"),
        F.max(F.to_date("l_shipdate")).alias("max_day"),
        dsum(F.col("l_extendedprice")).alias("revenue"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    spark = df.sparkSession
    day = lambda v: v.isoformat() if v is not None else None  # empty input
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                int(m["null_qty"] or 0),
                day(m["min_day"]),
                day(m["max_day"]),
                float(m["revenue"]) if m["revenue"] is not None else None,
            )
        ],
        "n_rows long, null_qty long, min_day string, max_day string, revenue double",
    )


def fk_orphans_report(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Referential-integrity audit across the star schema: orphan counts
    for every FK edge (lineitem→orders/part/supplier, orders→customer,
    customer→nation) — the constraint check a lake has to run itself
    because parquet enforces nothing.

    One scan per CHILD table, not per edge: lineitem's three FK columns
    are checked in a single pass with three left joins against the
    DISTINCT parent-key sets and conditional null counts. Parent key sets
    grow with SF (orders at 100 TB is billions of keys), so they carry NO
    forced broadcast hint (plans/hints.py policy): AQE broadcasts them
    while they fit under autoBroadcastJoinThreshold and falls back to a
    shuffled join per edge beyond that — the orphan COUNT contract is
    unchanged. Output: (relationship, n_child_rows, n_orphans).
    """

    def keys(df: DataFrame, col: str) -> DataFrame:
        return df.select(F.col(col).alias(f"_pk_{col}")).distinct()

    li = (
        lineitem.select("l_orderkey", "l_partkey", "l_suppkey")
        .join(
            keys(orders, "o_orderkey"),
            F.col("l_orderkey") == F.col("_pk_o_orderkey"),
            "left",
        )
        .join(
            keys(part, "p_partkey"),
            F.col("l_partkey") == F.col("_pk_p_partkey"),
            "left",
        )
        .join(
            keys(supplier, "s_suppkey"),
            F.col("l_suppkey") == F.col("_pk_s_suppkey"),
            "left",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("_pk_o_orderkey").isNull().cast("long")).alias("o1"),
            F.sum(F.col("_pk_p_partkey").isNull().cast("long")).alias("o2"),
            F.sum(F.col("_pk_s_suppkey").isNull().cast("long")).alias("o3"),
        )
    )
    li_rows = li.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("lineitem.l_orderkey -> orders").alias("relationship"),
                    F.col("n").alias("n_child_rows"),
                    F.col("o1").alias("n_orphans"),
                ),
                F.struct(
                    F.lit("lineitem.l_partkey -> part").alias("relationship"),
                    F.col("n").alias("n_child_rows"),
                    F.col("o2").alias("n_orphans"),
                ),
                F.struct(
                    F.lit("lineitem.l_suppkey -> supplier").alias("relationship"),
                    F.col("n").alias("n_child_rows"),
                    F.col("o3").alias("n_orphans"),
                ),
            )
        ).alias("r")
    ).select("r.*")

    def one(child: DataFrame, col: str, parent: DataFrame, pcol: str, label: str):
        return (
            child.select(F.col(col))
            .join(
                keys(parent, pcol),
                F.col(col) == F.col(f"_pk_{pcol}"),
                "left",
            )
            .agg(
                F.count("*").alias("n_child_rows"),
                F.sum(F.col(f"_pk_{pcol}").isNull().cast("long")).alias(
                    "n_orphans"
                ),
            )
            .select(
                F.lit(label).alias("relationship"), "n_child_rows", "n_orphans"
            )
        )

    return li_rows.unionByName(
        one(orders, "o_custkey", customer, "c_custkey", "orders.o_custkey -> customer")
    ).unionByName(
        one(customer, "c_nationkey", nation, "n_nationkey", "customer.c_nationkey -> nation")
    )


PSI_BUCKETS = 10
PSI_DOMAIN = (0.0, 600000.0)
_PSI_SCALE = int(1e9)


def psi_price_drift(orders: DataFrame) -> DataFrame:
    """Population Stability Index between the 1997 and 1998 order-value
    distributions — the standard model-monitoring drift metric
    (PSI = Σ (p_i − q_i)·ln(p_i/q_i) over fixed bins; < 0.1 stable,
    > 0.25 action). The numeric sibling of corpus_drift_kl's text KL.

    ONE conditional-aggregate pass bins both years simultaneously
    (fixed grid, clamped edges — production fits bins on the reference
    window); per-bin contributions are quantized to 1e-9 ints so the
    TOTAL row sums order-insensitively, and Laplace-style +0.5 bin
    smoothing keeps empty bins finite. Output: one row per bin
    (bin, n_ref, n_new, psi_contrib) plus a '<TOTAL>' row.
    """
    lo, hi = PSI_DOMAIN
    width = (hi - lo) / PSI_BUCKETS
    year = F.year("o_orderdate")
    bucket = F.least(
        F.lit(PSI_BUCKETS - 1),
        F.greatest(
            F.lit(0), F.floor((F.col("o_totalprice") - lo) / width).cast("int")
        ),
    )
    base = orders.filter(year.isin(1997, 1998)).select(
        bucket.alias("bin"), (year == 1998).alias("is_new")
    )
    # densify: a bin empty in BOTH years still carries a nonzero smoothed
    # contribution when the year totals differ — groupBy alone would drop
    # it; the 10-row spine guarantees every grid cell a row
    spine = orders.sparkSession.range(PSI_BUCKETS).select(
        F.col("id").cast("int").alias("bin")
    )
    per_bin = spine.join(
        base.groupBy("bin").agg(
            F.sum(F.when(~F.col("is_new"), 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(F.col("is_new"), 1).otherwise(0)).alias("n_new"),
        ),
        "bin",
        "left",
    ).select(
        "bin",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    totals = per_bin.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_new").alias("t_new")
    )
    p = (F.col("n_new") + F.lit(0.5)) / (
        F.col("t_new") + F.lit(0.5) * PSI_BUCKETS
    )
    q = (F.col("n_ref") + F.lit(0.5)) / (
        F.col("t_ref") + F.lit(0.5) * PSI_BUCKETS
    )
    cq = F.floor(
        (p - q) * F.log(p / q) * F.lit(float(_PSI_SCALE)) + F.lit(0.5)
    ).cast("long")
    scored = per_bin.crossJoin(F.broadcast(totals)).select(
        F.col("bin"),
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_new").cast("long").alias("n_new"),
        cq.alias("cq"),
    )
    rows = scored.select(
        F.col("bin").cast("string").alias("bin"),
        "n_ref",
        "n_new",
        (F.col("cq") / F.lit(float(_PSI_SCALE))).alias("psi_contrib"),
    )
    total = scored.agg(
        (F.sum("cq") / F.lit(float(_PSI_SCALE))).alias("psi_contrib")
    ).select(
        F.lit("<TOTAL>").alias("bin"),
        F.lit(None).cast("long").alias("n_ref"),
        F.lit(None).cast("long").alias("n_new"),
        "psi_contrib",
    )
    return rows.unionByName(total)


def benford_digit_report(orders: DataFrame) -> DataFrame:
    """Benford's-law first-digit screening of order values — the
    classic forensic-accounting test (fabricated figures rarely follow
    the log-uniform leading-digit law; public: Benford 1938, Nigrini's
    audit practice). Output per digit 1–9: observed count, observed
    share, Benford-expected share ln(1+1/d)/ln(10), and the absolute
    deviation — all single same-order IEEE expressions + qround, one
    map-side-combined aggregate on a 9-value key.
    """
    from ..numeric import qround

    d = F.substring(F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1)
    per = (
        # >= 1, not > 0: a price in (0,1) stringifies with leading digit 0,
        # whose Benford expectation ln(1+1/0) is infinite — sub-unit values
        # are out of the law's domain
        orders.filter(F.col("o_totalprice") >= 1)
        .groupBy(d.cast("int").alias("digit"))
        .agg(F.count("*").alias("n"))
    )
    tot = per.agg(F.sum("n").alias("t"))
    obs = F.col("n").cast("double") / F.col("t").cast("double")
    exp = F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit")) / F.log(F.lit(10.0))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.col("n").cast("long").alias("n"),
            qround(obs, 6).alias("observed_share"),
            qround(exp, 6).alias("benford_share"),
            qround(F.abs(obs - exp), 6).alias("abs_dev"),
        )
    )


def table_checksum(lineitem: DataFrame) -> DataFrame:
    """Order-insensitive cross-engine table checksum — the migration /
    replication validator: serialize each row canonically, hash it, SUM
    the hashes (addition commutes, so partitioning and row order are
    irrelevant), and two tables match iff (n_rows, lanes) match. This is
    the one-number generalization of the per-query oracle method the
    whole repo runs on, usable by ANY two engines that share md5.

    Canonical serialization uses only representation-stable casts —
    BIGINTs, raw strings, explicitly formatted dates, DECIMAL(18,2)
    strings for money (both engines print "123.45") — never bare double
    formatting, which engines disagree on. The 48-bit hash is summed as
    two 24-bit BIGINT lanes so a signed-64 sum holds ~5·10^11 rows
    (2^63/2^24); beyond that move the lanes to DECIMAL(38,0). ONE scan, one 1-row
    aggregate, zero shuffles of data."""
    from .text import md5_prefix_value

    row_str = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_partkey").cast("string"),
        F.col("l_suppkey").cast("string"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        F.date_format("l_shipdate", "yyyy-MM-dd"),
        F.col("l_extendedprice").cast("decimal(18,2)").cast("string"),
        F.col("l_quantity").cast("decimal(18,2)").cast("string"),
    )
    lane1 = md5_prefix_value(row_str, 6)
    lane2 = md5_prefix_value(row_str, 6, offset=6)
    return lineitem.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(lane1).cast("long").alias("checksum_lane1"),
        F.sum(lane2).cast("long").alias("checksum_lane2"),
    )


# candidate functional dependencies to audit: (label, table, lhs, rhs) —
# a mix of true FDs (key -> attribute) and expected violations, the shape
# a profiler reports before schema normalization / dedup decisions
FD_CANDIDATES = (
    ("orders: custkey -> orderpriority", "orders", "o_custkey", "o_orderpriority"),
    ("orders: orderkey -> orderdate", "orders", "o_orderkey", "o_orderdate"),
    ("lineitem: partkey -> suppkey", "lineitem", "l_partkey", "l_suppkey"),
    ("lineitem: orderkey -> returnflag", "lineitem", "l_orderkey", "l_returnflag"),
)


def fd_violations(tables: dict) -> DataFrame:
    """Functional-dependency audit (the data-profiling staple behind
    normalization and merge decisions — TANE-style single-column check,
    Huhtala et al. 1999, public): for each candidate LHS→RHS, count LHS
    groups whose RHS is not single-valued and the worst per-group RHS
    variant count. An FD 'holds' when no group violates.

    One map-side-combined (lhs, rhs) distinct-pair aggregate per
    candidate — the pair frame is bounded by the distinct combinations,
    not the table; the verdict rollup runs on the group-sized frame.
    Candidates over the same table share a scan via the union plan.
    """
    out = None
    for label, tname, lhs, rhs in FD_CANDIDATES:
        pairs = (
            tables[tname]
            .select(F.col(lhs).alias("l"), F.col(rhs).alias("r"))
            .dropDuplicates(["l", "r"])
        )
        per_group = pairs.groupBy("l").agg(F.count("*").alias("variants"))
        row = per_group.agg(
            F.lit(label).alias("candidate"),
            F.count("*").cast("long").alias("n_groups"),
            F.sum(F.when(F.col("variants") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating_groups"),
            F.max("variants").cast("long").alias("max_rhs_variants"),
            (F.max("variants") == 1).alias("fd_holds"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("candidate")


ENTROPY_COLUMNS = (
    ("orders.o_orderpriority", "orders", "o_orderpriority"),
    ("lineitem.l_returnflag", "lineitem", "l_returnflag"),
    ("customer.c_mktsegment", "customer", "c_mktsegment"),
    ("events.event_type", "events", "event_type"),
)
ENTROPY_SCALE = 1e9


def column_entropy(tables: dict) -> DataFrame:
    """Shannon entropy per categorical column — the profiling signal
    behind encoding choices (dictionary vs plain), skew warnings, and
    join-key diagnostics: H = −Σ p·ln p in nats, plus H/ln(k) normalized
    to [0,1] (1 = uniform). NULLs count as a category (they dominate
    some real columns and hiding them misstates the distribution).

    One map-side-combined count-by-value aggregate per column; the
    entropy sum runs on the value frame with per-term quantize-then-
    integer-sum (tfidf convention), so results are engine-exact.
    """
    from ..numeric import qround

    out = None
    for label, tname, col in ENTROPY_COLUMNS:
        counts = (
            tables[tname]
            .select(F.col(col).cast("string").alias("v"))
            .groupBy("v")
            .agg(F.count("*").alias("c"))
        )
        tot = counts.agg(
            F.sum("c").alias("n"), F.count("*").alias("k")
        )
        p = F.col("c").cast("double") / F.col("n").cast("double")
        q = F.floor(-p * F.log(p) * F.lit(ENTROPY_SCALE) + F.lit(0.5)).cast("long")
        row = (
            counts.crossJoin(F.broadcast(tot))
            .agg(
                F.lit(label).alias("column_name"),
                F.max("n").cast("long").alias("n_rows"),
                F.max("k").cast("long").alias("n_distinct"),
                F.sum(q).alias("hq"),
            )
            .select(
                "column_name",
                "n_rows",
                "n_distinct",
                qround(F.col("hq").cast("double") / F.lit(ENTROPY_SCALE), 6).alias(
                    "entropy_nats"
                ),
                F.when(
                    F.col("n_distinct") > 1,
                    qround(
                        F.col("hq").cast("double")
                        / F.lit(ENTROPY_SCALE)
                        / F.log(F.col("n_distinct").cast("double")),
                        6,
                    ),
                ).alias("normalized"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("column_name")


MI_QTY_BIN = 10.0  # l_quantity decile-ish bins (1..50 -> 5 bins)
MI_LN_SCALE = 8  # per-cell ln quantum; must not exceed the DECIMAL
# sum scale (8) or the cast tie-breaks (HALF_UP vs HALF_EVEN) diverge


def mutual_info_features(lineitem: DataFrame) -> DataFrame:
    """Mutual information (in nats) between the discretized
    (l_quantity, l_discount) feature pair, with the normalized variant
    MI/√(H_x·H_y) — the model-free feature-redundancy screen
    (correlation_matrix sees only LINEAR association; MI sees any).

    One map-side-combined aggregate collapses the table to the joint
    histogram — bounded by the SCHEMA (≤ 5 quantity bins × 11 discount
    values), never by the corpus — then every probability and log runs
    on that tiny frame. Each per-cell ln is quantized to 1e-9 before the
    order-insensitive decimal sum (the engine-shared libm lane), exactly
    the corpus_drift_kl convention.

        MI = Σ_ij (c_ij/N) · ln(c_ij·N / (c_i·c_j))

    Output (single row): n_rows, n_cells, mi_nats, h_x, h_y, nmi.
    """
    from ..numeric import qround

    DEC38 = "decimal(38,8)"
    xb = F.floor(F.col("l_quantity").cast("double") / F.lit(MI_QTY_BIN))
    yb = F.col("l_discount").cast("double")
    joint = lineitem.groupBy(xb.alias("xb"), yb.alias("yb")).agg(
        F.count("*").alias("c")
    )
    wx = Window.partitionBy("xb")
    wy = Window.partitionBy("yb")
    wall = Window.partitionBy()
    cells = (
        joint.withColumn("cx", F.sum("c").over(wx))
        .withColumn("cy", F.sum("c").over(wy))
        .withColumn("nn", F.sum("c").over(wall))
    )
    c, cx, cy, nn = (
        F.col("c").cast("double"),
        F.col("cx").cast("double"),
        F.col("cy").cast("double"),
        F.col("nn").cast("double"),
    )
    mi_term = qround(c / nn * F.log(c * nn / (cx * cy)), MI_LN_SCALE)
    # marginal-entropy terms: weight each cell by its share of the
    # marginal so H comes from the SAME bounded frame (cells of one
    # marginal value repeat; divide by the repeat count)
    hx_term = qround(-(c / nn) * F.log(cx / nn), MI_LN_SCALE)
    hy_term = qround(-(c / nn) * F.log(cy / nn), MI_LN_SCALE)
    agg = cells.agg(
        F.max("nn").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_cells"),
        F.sum(mi_term.cast(DEC38)).cast("double").alias("mi"),
        F.sum(hx_term.cast(DEC38)).cast("double").alias("hx"),
        F.sum(hy_term.cast(DEC38)).cast("double").alias("hy"),
    )
    return agg.select(
        "n_rows",
        "n_cells",
        qround(F.col("mi"), 6).alias("mi_nats"),
        qround(F.col("hx"), 6).alias("h_x"),
        qround(F.col("hy"), 6).alias("h_y"),
        qround(
            F.col("mi") / F.sqrt(F.col("hx") * F.col("hy")), 6
        ).alias("nmi"),
    )


CRAMERS_PAIRS = (
    ("l_returnflag", "l_linestatus"),
    ("l_returnflag", "l_tax_band"),
    ("l_linestatus", "l_tax_band"),
)


def cramers_v_pairs(lineitem: DataFrame) -> DataFrame:
    """Cramér's V association strength for categorical column pairs —
    chisq_contingency gives one pair's test statistic; this is the
    normalized 0..1 ASSOCIATION MATRIX a profiler reports across pairs
    (V = √(χ²/(n·(min(r,c)−1))), Cramér 1946, public). Tax values are
    banded to a categorical (3 bands) so the pair set exercises a
    derived category too.

    One joint-count aggregate per pair over the same scan (Catalyst
    shares the scan; each aggregate is map-side combined and its cell
    frame is schema-bounded), χ² from the classic observed-vs-expected
    sum on the tiny cell frame with exact integer counts.
    """
    from ..numeric import qround

    DEC38 = "decimal(38,8)"
    band = (
        F.when(F.col("l_tax").cast("double") < 0.03, "low")
        .when(F.col("l_tax").cast("double") < 0.06, "mid")
        .otherwise("high")
    )
    base = lineitem.select(
        F.col("l_returnflag"), F.col("l_linestatus"), band.alias("l_tax_band")
    )
    out = None
    for a, b in CRAMERS_PAIRS:
        joint = base.groupBy(F.col(a).alias("va"), F.col(b).alias("vb")).agg(
            F.count("*").alias("c")
        )
        # ZERO cells matter: chi-square sums (0 - E)^2/E over EMPTY cells
        # too, so the grid is the cross of the marginals, left-joined to
        # the observed cells (a 2x2 with a perfect diagonal must reach
        # V = 1, not 1/sqrt(2))
        ma = joint.groupBy("va").agg(F.sum("c").alias("ca"))
        mb = joint.groupBy("vb").agg(F.sum("c").alias("cb"))
        grid = ma.crossJoin(F.broadcast(mb)).join(joint, ["va", "vb"], "left")
        wall = Window.partitionBy()
        cells = (
            grid.withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
            .withColumn("nn", F.sum("c").over(wall))
            .withColumn("ra", F.size(F.collect_set("va").over(wall)))
            .withColumn("rb", F.size(F.collect_set("vb").over(wall)))
        )
        e = (
            F.col("ca").cast("double")
            * F.col("cb").cast("double")
            / F.col("nn").cast("double")
        )
        term = qround(
            (F.col("c").cast("double") - e) * (F.col("c").cast("double") - e) / e,
            6,
        )
        agg = cells.agg(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.max("nn").cast("long").alias("n_rows"),
            F.sum(term.cast(DEC38)).cast("double").alias("chi2"),
            F.max("ra").alias("ra"),
            F.max("rb").alias("rb"),
        )
        row = agg.select(
            "col_a",
            "col_b",
            "n_rows",
            qround(F.col("chi2"), 4).alias("chi2"),
            # a single-category column has min(r,c) = 1: V is undefined
            # (NULL on both engines, never a divide-by-zero)
            F.when(
                F.least(F.col("ra"), F.col("rb")) > 1,
                qround(
                    F.sqrt(
                        F.col("chi2")
                        / (
                            F.col("n_rows").cast("double")
                            * (
                                F.least(F.col("ra"), F.col("rb")).cast("double")
                                - 1.0
                            )
                        )
                    ),
                    6,
                ),
            ).alias("cramers_v"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def simpson_diversity_sources(docs: DataFrame) -> DataFrame:
    """Simpson diversity of the corpus's source mix (Simpson 1949,
    public): D = 1 − Σ pᵢ² — the probability two random documents come
    from different sources, plus the inverse-Simpson effective source
    count. The corpus-composition twin of column_entropy (Shannon lens)
    and the documents-side sibling of hhi_brand_concentration.

    One map-side-combined count per source; the reduction runs on the
    source frame (schema-bounded).
    """
    from ..numeric import qround

    DEC38 = "decimal(38,8)"
    g = docs.groupBy("source").agg(F.count("*").alias("c"))
    tot = F.broadcast(g.agg(F.sum("c").cast("double").alias("nn")))
    s = g.crossJoin(tot).select(
        (F.col("c").cast("double") / F.col("nn")).alias("p"), F.col("nn")
    )
    agg = s.agg(
        F.count("*").cast("long").alias("n_sources"),
        F.max("nn").cast("long").alias("n_docs"),
        F.sum((F.col("p") * F.col("p")).cast(DEC38)).cast("double").alias("ss"),
    )
    return agg.select(
        "n_sources",
        "n_docs",
        qround(F.lit(1.0) - F.col("ss"), 6).alias("simpson_d"),
        qround(F.lit(1.0) / F.col("ss"), 4).alias("inverse_simpson"),
    )
