"""Property-based tests (hypothesis) for the determinism-critical helpers.

Each property runs ONE Spark job over a hypothesis-generated batch
(examples are bounded — Spark-per-example would be too slow) and compares
against a plain-Python model of the intended semantics.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cocktailsdb_spark.numeric import qround  # noqa: E402
from cocktailsdb_spark.operators import dedup  # noqa: E402

TOKENS = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=4), min_size=0, max_size=12
)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=30), st.integers(0, 6))
def test_qround_is_floor_half_up(spark, xs, k):
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    got = [r[0] for r in df.select(qround(F.col("x"), k)).collect()]
    scale = float(10**k)
    expected = [math.floor(x * scale + 0.5) / scale for x in xs]
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(TOKENS, st.integers(2, 4))
def test_shingles_match_python_model(spark, toks, n):
    df = spark.createDataFrame([(" ".join(toks),)], "text string") if toks else None
    if df is None:
        return
    got = df.select(dedup.shingles(F.split("text", " "), n).alias("s")).first()["s"]
    model = []
    for i in range(len(toks) - n + 1):
        g = " ".join(toks[i : i + n])
        if g not in model:
            model.append(g)
    assert got == model


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 5), st.integers(0, 100)),
        min_size=1,
        max_size=25,
    )
)
def test_latest_wins_exactly_one_row_per_key_and_max_order(spark, rows):
    # (key, order_a, unique-ified tiebreak) — uniqueness via index
    data = [(k, a, i) for i, (k, a, _) in enumerate(rows)]
    df = spark.createDataFrame(data, "k int, a int, uid int")
    out = dedup.latest_wins(df, ["k"], ["a", "uid"]).collect()
    keys = [r["k"] for r in out]
    assert sorted(keys) == sorted(set(k for k, _, _ in data))
    # winner is the max (a, uid) per key — the deterministic latest
    expect = {}
    for k, a, uid in data:
        if k not in expect or (a, uid) > expect[k]:
            expect[k] = (a, uid)
    assert {r["k"]: (r["a"], r["uid"]) for r in out} == expect
