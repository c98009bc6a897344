"""Connected-components dedup clustering + pandas-UDF similarity parity."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cocktailsdb_spark.operators import dedup, similarity  # noqa: E402
from cocktailsdb_spark.tables import load  # noqa: E402


def test_chain_collapses_to_one_cluster(spark):
    # three docs sharing 4-gram chains: a~b and b~c but a≁c directly —
    # components must still merge all three onto min(doc_id)
    docs = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5 w6"),          # shares w1..w4,w2..w5 with doc 2
            (2, "w1 w2 w3 w4 w5 x9"),          # shares w1..w4 with 1, y-chain with 3
            (3, "w2 w3 w4 w5 x9 x8"),          # shares w2 w3 w4 w5 + x9 tail with 2
            (9, "z1 z2 z3 z4 z5 z6"),          # isolated pair partner
            (10, "z1 z2 z3 z4 z5 z7"),
            (50, "q1 q2 q3 q4 q5 q6"),         # no pair at all → absent from output
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dedup_clusters(docs, n=4, threshold=0.3).collect()
    }
    assert out[1] == out[2] == out[3] == 1
    assert out[9] == out[10] == 9
    assert 50 not in out


def test_pandas_and_jvm_cosine_agree(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    jvm = similarity.cosine_topk(e, [0, 1, 2], k=3).collect()
    arrow = similarity.cosine_topk_pandas(e, [0, 1, 2], k=3).collect()
    assert sorted(map(tuple, jvm), key=lambda t: (t[0], t[3])) == sorted(
        map(tuple, arrow), key=lambda t: (t[0], t[3])
    )
