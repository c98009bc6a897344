"""Semantic pins for item_item_recs (operators/recsys.py) — hand-computed
cosines on tiny basket frames, independent of the DuckDB oracle."""

from __future__ import annotations

import math

from cocktailsdb_spark.operators import recsys


def _baskets(spark, baskets):
    rows = [(ok, pk) for ok, parts in baskets for pk in parts]
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def test_cosine_values_and_symmetry(spark):
    # part 1 in 4 baskets, part 2 in 3, together 3 times:
    # cosine = 3/sqrt(4*3) both directions.
    baskets = [
        (10, [1, 2]),
        (11, [1, 2]),
        (12, [1, 2]),
        (13, [1]),
        (14, [3]),
    ]
    out = recsys.item_item_recs(_baskets(spark, baskets), min_support=3, k=3).collect()
    got = {(r.item, r.rec): r for r in out}
    want = math.floor(3 / math.sqrt(12) * 1e6 + 0.5) / 1e6
    assert got[(1, 2)].cosine == want == got[(2, 1)].cosine
    assert got[(1, 2)].support == 3
    # part 3 never co-occurs -> absent from both sides
    assert not any(r.item == 3 or r.rec == 3 for r in out)


def test_topk_rank_and_tiebreak(spark):
    # item 1 co-occurs with 2 (3x) and 3 (3x); all items appear in the
    # same 3 baskets plus enough filler to differentiate norms.
    baskets = [
        (1, [1, 2, 3]),
        (2, [1, 2, 3]),
        (3, [1, 2, 3]),
        (4, [3]),  # n_3 = 4 -> cosine(1,3) < cosine(1,2)
    ]
    out = recsys.item_item_recs(_baskets(spark, baskets), min_support=3, k=1).collect()
    by_item = {r.item: r for r in out}
    assert by_item[1].rec == 2 and by_item[1].rank == 1
    # equal-cosine tie (2's neighbors 1 and... n_1 == n_3? n_1=3, n_3=4) -> 1 wins on cosine
    assert by_item[2].rec == 1
    assert len([r for r in out if r.item == 1]) == 1  # k=1 enforced


def test_min_support_prunes(spark):
    baskets = [(1, [1, 2]), (2, [1, 2]), (3, [4, 5])]
    out = recsys.item_item_recs(_baskets(spark, baskets), min_support=3, k=3).collect()
    assert out == []
