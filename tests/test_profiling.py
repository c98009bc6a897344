"""Semantic pins for the observability operators (snapshot_diff CDC,
profile_table), hand-computed and independent of the DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from cocktailsdb_spark.operators import profiling as P


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, x double")


def test_snapshot_diff_classifies_changes(spark):
    old = _snap(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, None, 4.0)])
    new = _snap(spark, [(2, "b", 2.0), (3, "C", 3.0), (4, None, 4.0), (5, "e", 5.0)])
    out = {r.k: r.change_type for r in
           P.snapshot_diff(old, new, "k", ["v", "x"]).collect()}
    # 1 dropped → delete; 2 identical → absent; 3 value change → update;
    # 4 null-safe equal (None == None) → absent; 5 appears → insert
    assert out == {1: "delete", 3: "update", 5: "insert"}


def test_snapshot_diff_null_transitions_are_updates(spark):
    old = _snap(spark, [(1, "a", 1.0), (2, None, 2.0)])
    new = _snap(spark, [(1, None, 1.0), (2, "b", 2.0)])
    out = {r.k: r.change_type for r in
           P.snapshot_diff(old, new, "k", ["v", "x"]).collect()}
    # value↔null in either direction must read as update, not equality
    assert out == {1: "update", 2: "update"}


def test_profile_table_stats(spark):
    df = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", None), (2, None, 30.0)],
        "c_custkey long, c_name string, c_acctbal double",
    ).selectExpr("c_custkey", "c_name", "CAST(1 AS INT) AS c_nationkey",
                 "c_acctbal", "'M' AS c_mktsegment")
    out = {r.column_name: r for r in P.profile_table(df).collect()}
    assert out["c_custkey"].n_rows == 3
    assert out["c_custkey"].n_distinct == 2
    assert (out["c_custkey"].min_num, out["c_custkey"].max_num) == (1.0, 2.0)
    assert out["c_acctbal"].n_nulls == 1
    assert (out["c_acctbal"].min_num, out["c_acctbal"].max_num) == (10.0, 30.0)
    assert out["c_name"].n_nulls == 1 and out["c_name"].n_distinct == 2
    assert (out["c_name"].min_str, out["c_name"].max_str) == ("x", "y")
    assert out["c_name"].min_num is None  # string rows carry no numeric stats


def test_profile_table_hll_variant_matches_exact_on_small_input(spark):
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(50)],
        "c_custkey long, c_name string, c_acctbal double",
    ).selectExpr("c_custkey", "c_name", "CAST(1 AS INT) AS c_nationkey",
                 "c_acctbal", "'M' AS c_mktsegment")
    exact = {r.column_name: r.n_distinct for r in P.profile_table(df).collect()}
    approx = {r.column_name: r.n_distinct
              for r in P.profile_table(df, exact=False).collect()}
    for c, n in exact.items():
        assert abs(approx[c] - n) <= max(3, int(0.10 * n))  # HLL default rsd ~5%, 2σ


def test_correlation_matrix_hand_computed(spark):
    from cocktailsdb_spark.operators.profiling import correlation_matrix

    # y = 2x exactly → r = 1; z anti-correlated with x → r = -1
    df = spark.createDataFrame(
        [(1.0, 2.0, 3.0), (2.0, 4.0, 2.0), (3.0, 6.0, 1.0)],
        "x double, y double, z double",
    )
    out = {
        (r["col_a"], r["col_b"]): r["pearson_r"]
        for r in correlation_matrix(df, cols=("x", "y", "z")).collect()
    }
    assert out[("x", "y")] == 1.0
    assert out[("x", "z")] == -1.0
    assert out[("y", "z")] == -1.0
    assert len(out) == 3


def test_join_skew_report_counts_and_ratios(spark):
    from cocktailsdb_spark.operators.profiling import join_skew_report

    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string")
    got = join_skew_report(df, "k", top_n=2).collect()
    assert [(r.key_value, r.n) for r in got] == [("a", 6), ("b", 3)]
    # total 10 rows over 3 keys -> avg 10/3; a is 1.8x the average
    assert got[0].pct_of_rows == 0.6
    assert got[0].x_avg_key == 1.8
    assert got[1].x_avg_key == 0.9


def test_correlation_fast_equals_decimal_path(spark, sf_dir):
    from cocktailsdb_spark.operators.profiling import (
        correlation_matrix,
        correlation_matrix_fast,
    )
    from cocktailsdb_spark.tables import load

    li = load(spark, sf_dir, "lineitem")
    slow = {(r.col_a, r.col_b): r.pearson_r for r in correlation_matrix(li).collect()}
    fast = {(r.col_a, r.col_b): r.pearson_r for r in correlation_matrix_fast(li).collect()}
    assert slow.keys() == fast.keys()
    for k in slow:
        assert abs(slow[k] - fast[k]) < 1e-6, (k, slow[k], fast[k])


def test_correlation_auto_dispatches_fast_and_guards_negatives(spark, sf_dir):
    """The registered default must take the BIGINT lane on the fixture
    tables (non-negative, far under 2³¹ rows) — and fall back to the
    DECIMAL form the moment any input column can be negative, where the
    half-up quantization of the fast lane would break."""
    from cocktailsdb_spark.operators.profiling import (
        correlation_matrix,
        correlation_matrix_auto,
        correlation_matrix_fast,
    )
    from cocktailsdb_spark.tables import load

    li = load(spark, sf_dir, "lineitem")
    auto_plan = correlation_matrix_auto(li)._jdf.queryExecution().analyzed().toString()
    fast_plan = correlation_matrix_fast(li)._jdf.queryExecution().analyzed().toString()
    assert "shiftright" in auto_plan.lower()  # BIGINT hi/lo lanes chosen
    auto = {
        (r.col_a, r.col_b): r.pearson_r for r in correlation_matrix_auto(li).collect()
    }
    slow = {
        (r.col_a, r.col_b): r.pearson_r for r in correlation_matrix(li).collect()
    }
    assert auto == slow

    neg = spark.createDataFrame(
        [(1.0, -2.0), (2.0, 1.0), (3.0, 4.0), (-1.0, 0.5)], "x double, y double"
    )
    neg_plan = (
        correlation_matrix_auto(neg, cols=("x", "y"))
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "shiftright" not in neg_plan.lower()  # decimal fallback
    got = correlation_matrix_auto(neg, cols=("x", "y")).collect()
    want = correlation_matrix(neg, cols=("x", "y")).collect()
    assert got == want


def test_encoding_runs_day_boundary_stitch(spark):
    import datetime as dt

    # event_type run "A" crosses midnight: naive per-day counting would
    # report 2 runs for it; the boundary stitch must merge them into 1.
    # user_id changes at the boundary, so its runs stay unmerged.
    t = lambda d, h: dt.datetime(2024, 1, d, h, 0, 0)
    rows = [
        (1, t(1, 22), 10, "A", 1.0, None),
        (2, t(1, 23), 10, "A", 1.0, None),
        (3, t(2, 1), 20, "A", 1.0, None),   # same type run continues, user changes
        (4, t(2, 2), 20, "B", 1.0, None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.col_name: r for r in P.encoding_runs_report(ev).collect()}
    assert out["event_type"].n_runs == 2          # A (stitched), B
    assert out["user_id"].n_runs == 2             # 10, 20 — boundary not equal
    assert out["event_type"].n_rows == 4
    assert abs(out["event_type"].avg_run_len - 2.0) < 1e-9


def test_encoding_runs_null_values_form_runs(spark):
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 1), 1, None, 1.0, None),
        (2, dt.datetime(2024, 1, 1, 2), 1, None, 1.0, None),
        (3, dt.datetime(2024, 1, 1, 3), 1, "A", 1.0, None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.col_name: r for r in P.encoding_runs_report(ev).collect()}
    # NULL,NULL is one run (null-safe equality), then A
    assert out["event_type"].n_runs == 2


def test_hll_rollup_estimate_within_bound(spark):
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1 + (i % 3), 1 + (i % 20), 0, 0), i % 40,
         "click", 1.0, None)
        for i in range(500)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.scope: r for r in P.hll_sketch_rollup(ev).collect()}
    assert out["ALL"].n_exact == 40
    assert all(r.within_bound for r in out.values())
    assert len(out) == 4  # 3 months + ALL


def test_fk_orphans_detects_planted_orphans(spark):
    li = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 999), (3, 77, 100)],  # 999: no supplier; 77: no order
        "l_orderkey long, l_partkey long, l_suppkey long",
    )
    orders = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 6)], "o_orderkey long, o_custkey long"
    )
    # order 3 has custkey 6 but only customer 5 exists -> 1 orphan there
    orders = orders.withColumn(
        "o_orderkey", F.when(F.col("o_orderkey") == 3, 4).otherwise(F.col("o_orderkey"))
    )
    customer = spark.createDataFrame([(5, 0)], "c_custkey long, c_nationkey long")
    part = spark.createDataFrame([(10,)], "p_partkey long")
    supplier = spark.createDataFrame([(100,)], "s_suppkey long")
    nation = spark.createDataFrame([(0,)], "n_nationkey long")
    out = {
        r.relationship: r
        for r in P.fk_orphans_report(
            li, orders, customer, part, supplier, nation
        ).collect()
    }
    assert out["lineitem.l_orderkey -> orders"].n_orphans == 1   # orderkey 3
    assert out["lineitem.l_partkey -> part"].n_orphans == 1      # partkey 77
    assert out["lineitem.l_suppkey -> supplier"].n_orphans == 1  # suppkey 999
    assert out["orders.o_custkey -> customer"].n_orphans == 1    # custkey 6
    assert out["customer.c_nationkey -> nation"].n_orphans == 0


def test_observed_metrics_empty_frame(spark):
    df = spark.createDataFrame(
        [], "l_quantity double, l_shipdate timestamp, l_extendedprice double"
    )
    r = P.observed_load_metrics(df).collect()[0]
    assert r.n_rows == 0 and r.min_day is None and r.revenue is None


def test_psi_zero_for_identical_distributions(spark):
    import datetime as dt

    rows = []
    k = 0
    for year in (1997, 1998):
        for v in [50000.0, 150000.0, 250000.0] * 10:
            k += 1
            rows.append((k, dt.date(year, 6, 1), v))
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )
    out = {r.bin: r for r in P.psi_price_drift(df).collect()}
    assert abs(out["<TOTAL>"].psi_contrib) < 1e-8


def test_benford_shares_sum_to_one(spark):
    import datetime as dt

    rows = [(i, dt.date(1997, 1, 1), float(v)) for i, v in enumerate(
        [123.0, 234.0, 345.0, 456.0, 567.0, 678.0, 789.0, 891.0, 912.0, 145.0]
    )]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )
    out = P.benford_digit_report(df).collect()
    assert abs(sum(r.observed_share for r in out) - 1.0) < 1e-4
    assert all(1 <= r.digit <= 9 for r in out)


def test_table_checksum_order_insensitive_and_sensitive_to_change(spark):
    import datetime as dt

    rows = [
        (1, 1, 10, 100, "A", "F", dt.date(1995, 1, 1), 100.0, 5.0),
        (2, 1, 20, 200, "R", "O", dt.date(1995, 2, 2), 200.0, 7.0),
        (3, 1, 30, 300, "N", "F", dt.date(1995, 3, 3), 300.0, 9.0),
    ]
    ddl = ("l_orderkey long, l_linenumber int, l_partkey long, l_suppkey long, "
           "l_returnflag string, l_linestatus string, l_shipdate date, "
           "l_extendedprice double, l_quantity double")
    a = spark.createDataFrame(rows, ddl)
    b = spark.createDataFrame(list(reversed(rows)), ddl).repartition(7)
    ca, cb = P.table_checksum(a).collect()[0], P.table_checksum(b).collect()[0]
    assert ca == cb                             # order/partitioning invariant
    rows2 = [rows[0], rows[1], (3, 1, 30, 300, "N", "F", dt.date(1995, 3, 3), 300.01, 9.0)]
    cc = P.table_checksum(spark.createDataFrame(rows2, ddl)).collect()[0]
    assert cc.n_rows == ca.n_rows
    assert (cc.checksum_lane1, cc.checksum_lane2) != (ca.checksum_lane1, ca.checksum_lane2)


def test_fd_violations_detects_multi_valued_groups(spark):
    from cocktailsdb_spark.operators import profiling

    orders = spark.createDataFrame(
        [
            (1, 10, "HIGH", "1996-01-01"),
            (2, 10, "LOW", "1996-01-02"),   # custkey 10 -> 2 priorities
            (3, 11, "HIGH", "1996-01-03"),
        ],
        "o_orderkey long, o_custkey long, o_orderpriority string, o_orderdate string",
    )
    lineitem = spark.createDataFrame(
        [(1, 5, 3, "N"), (1, 5, 3, "N"), (2, 6, 4, "R")],
        "l_orderkey long, l_partkey long, l_suppkey long, l_returnflag string",
    )
    out = {
        r.candidate: r
        for r in profiling.fd_violations(
            {"orders": orders, "lineitem": lineitem}
        ).collect()
    }
    bad = out["orders: custkey -> orderpriority"]
    assert bad.n_violating_groups == 1 and bad.max_rhs_variants == 2
    assert bad.fd_holds is False
    good = out["lineitem: partkey -> suppkey"]
    assert good.n_violating_groups == 0 and good.fd_holds is True


def test_column_entropy_uniform_is_normalized_one(spark):
    import math

    from cocktailsdb_spark.operators import profiling

    orders = spark.createDataFrame(
        [(i, "A" if i % 2 else "B") for i in range(100)],
        "o_orderkey long, o_orderpriority string",
    )
    # reuse the candidate list's first column only
    old = profiling.ENTROPY_COLUMNS
    profiling.ENTROPY_COLUMNS = (("orders.o_orderpriority", "orders", "o_orderpriority"),)
    try:
        out = profiling.column_entropy({"orders": orders}).collect()[0]
    finally:
        profiling.ENTROPY_COLUMNS = old
    assert out.n_distinct == 2
    expect = math.floor(math.log(2) * 1e9 + 0.5) / 1e9
    expect = math.floor(expect * 1e6 + 0.5) / 1e6
    assert out.entropy_nats == expect
    assert out.normalized == 1.0
