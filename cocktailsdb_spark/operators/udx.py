"""User-defined extension surface (SURVEY.md §2.8): the two Python API
shapes the engine had not yet exercised — a Python UDTF (table function,
one row in → many rows out, Arrow-batched) and a grouped-agg pandas UDF
(UDAF: Series in → scalar out).

Both are demonstrations of the API with honest scale posture, not the
preferred path: everything either does is also expressible JVM-side
(`chunk_documents`, `percentile_approx`) and the JVM forms are what the
hot path should use. A real pipeline reaches for these shapes when the
per-group / per-row logic genuinely cannot be written as expressions
(custom tokenizers, model scoring, exact order statistics).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .corpus import CHUNK_SIZE, CHUNK_STRIDE


def chunk_span_udtf_cls(size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE):
    """Build the UDTF class computing overlapping chunk SPANS for a text:
    (chunk_id, start_tok, n_tokens) — the work list `chunk_documents`
    materializes, emitted by a table function instead of posexplode.
    Python-side per row, so this is the API-coverage twin of the JVM
    chunker, not its replacement at 100 TB."""

    class ChunkSpans:
        def eval(self, text: str):  # noqa: D102 — UDTF protocol method
            n = max(len(text.split(" ")), 1) if text is not None else 1
            cid = 0
            for start in range(1, n + 1, stride):
                yield cid, start, min(size, n - start + 1)
                cid += 1

    return ChunkSpans


def chunk_spans(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """LATERAL-join the chunk-span UDTF against ``documents``: one span row
    per (doc, chunk). Arrow-batched (useArrow) so rows cross the Python
    boundary in columnar batches."""
    from pyspark.sql.functions import udtf

    spans = udtf(
        chunk_span_udtf_cls(),
        returnType="chunk_id int, start_tok int, n_tokens int",
        useArrow=True,
    )
    spark.udtf.register("cdbspark_chunk_spans", spans)
    view = "cdbspark_udtf_docs"
    docs.select("doc_id", "text").createOrReplaceTempView(view)
    return spark.sql(
        f"""SELECT d.doc_id, s.chunk_id, s.start_tok, s.n_tokens
            FROM {view} d, LATERAL cdbspark_chunk_spans(d.text) s"""
    )


def median_by_key(
    df: DataFrame, key: str, value: str, out_col: str = "median_value"
) -> DataFrame:
    """Exact per-key median via a grouped-agg pandas UDF (the UDAF shape:
    Arrow-batched Series → scalar). Exact order statistics are one of the
    few aggregates with no JVM expression form (`percentile_approx` is the
    sketch alternative); per-group state is the group's values, so at
    100 TB this holds only where groups fit a worker — else use the
    sketch. Result rounded to 4 dp to keep the cross-engine comparison on
    the quantized grid (both engines average the two middle doubles)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _median(v: pd.Series) -> float:
        return float(v.median())

    from ..numeric import qround

    return df.groupBy(key).agg(qround(_median(F.col(value)), 4).alias(out_col))


def ngram_cols_udtf_cls():
    """Polymorphic Python UDTF (Spark 4 dynamic-schema `analyze`): the
    output schema is COMPUTED from the constant `n` argument at plan
    time — `ngram_cols(text, 2)` emits (w1, w2), `ngram_cols(text, 3)`
    emits (w1, w2, w3). This is the half of the UDTF protocol the
    static-returnType chunk-span UDTF doesn't exercise; real uses are
    schema-from-config table functions (feature expanders, pivoters)."""
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class NgramCols:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            if not isinstance(n.value, int) or n.value < 1:
                raise ValueError("ngram_cols: n must be a positive int literal")
            return AnalyzeResult(
                schema=StructType(
                    [
                        StructField(f"w{i + 1}", StringType())
                        for i in range(n.value)
                    ]
                )
            )

        def eval(self, text: str, n: int):
            toks = text.split(" ") if text else []
            for i in range(len(toks) - n + 1):
                yield tuple(toks[i : i + n])

    return NgramCols


def ngram_cols(spark: SparkSession, docs: DataFrame, n: int = 3) -> DataFrame:
    """LATERAL-join the polymorphic n-gram UDTF: one row per n-gram with
    n individual word columns (schema decided by analyze())."""
    from pyspark.sql.functions import udtf

    fn = udtf(ngram_cols_udtf_cls(), useArrow=True)
    spark.udtf.register("cdbspark_ngram_cols", fn)
    view = "cdbspark_udtf_ngram_docs"
    docs.select("doc_id", "text").createOrReplaceTempView(view)
    return spark.sql(
        f"""SELECT d.doc_id, s.*
            FROM {view} d, LATERAL cdbspark_ngram_cols(d.text, {int(n)}) s"""
    )


def arrow_token_stats(docs: DataFrame) -> DataFrame:
    """`mapInArrow` — the zero-copy batch API underneath mapInPandas (no
    pandas conversion; pyarrow RecordBatches in and out). Per-doc token
    and character counts computed with pyarrow.compute kernels —
    vectorized C++ on Arrow buffers, no per-row Python. The JVM twin is
    trivially `size(split(...))`; the entry exists to pin the LAST
    Python-boundary shape §2.8 lists, with honest posture: reach for
    mapInArrow when the batch logic needs Arrow-native libraries
    (tokenizers-rs, polars) without a pandas round-trip."""
    import pyarrow as pa

    def _stats(batches):
        import pyarrow.compute as pc

        for b in batches:
            text = pc.coalesce(b.column(1), pa.scalar(""))
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(0),
                    pc.cast(
                        pc.list_value_length(pc.split_pattern(text, " ")),
                        pa.int32(),
                    ),
                    pc.cast(pc.utf8_length(text), pa.int32()),
                ],
                ["doc_id", "n_tokens", "n_chars"],
            )

    return docs.select("doc_id", "text").mapInArrow(
        _stats, schema="doc_id long, n_tokens int, n_chars int"
    )


def cogroup_asof_pandas(events: DataFrame) -> DataFrame:
    """Cogrouped applyInPandas — the one Python-boundary shape the rest
    of §2.8 doesn't touch: TWO grouped frames aligned per key, each
    (purchases, signups) pair handed to pandas as a unit. The body is
    pandas.merge_asof (backward, inclusive) — the idiomatic pandas as-of
    — and the result must be BIT-IDENTICAL to the JVM union-then-window
    as-of (events.asof_latest / the asof_join_signup oracle): same
    output from a completely different execution strategy is the
    strongest cross-implementation check in the §2.8 family.

    Scale posture: cogroup shuffles BOTH sides once — but on a BOUNDED
    bucket key (user_id mod 256), not per user: applyInPandas dispatches
    the Python function once per group, so keying by raw user_id costs a
    pandas call per user (measured 11.6 s at sf0.1, ~9.5k tiny groups)
    while 256 buckets with `merge_asof(by="user_id")` handling the
    per-user alignment INSIDE the batch costs 2.6 s warm — the generic rule
    for every per-key Python API: the cogroup key sizes the task, the
    `by` key carries the semantics. Tie-break detail: merge_asof takes
    the LAST right row on equal (user, ts), which matches the window
    form's (ts, side, event_id) ordering because signups are pre-sorted
    by (user_id, ts, event_id).
    """
    n_buckets = 256
    # Explicit co-partitioned repartition on the cogroup key: the
    # cogroup's own exchange otherwise gets AQE-coalesced to ONE
    # post-shuffle partition at bench scale (the two sides' shuffles are
    # a few MB), so all 256 pandas merge_asof dispatches serialized on a
    # single core (r14 measured 3.0 s exec, 1-task stages). Hash
    # partitioning on `b` from an identical explicit repartition on both
    # sides satisfies the cogroup's required co-distribution, so no
    # second exchange appears and the Python work fans across the
    # cluster; at real scale the same shuffle happens either way.
    target_p = events.sparkSession.sparkContext.defaultParallelism
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id", "ts", "event_id", F.pmod("user_id", F.lit(n_buckets)).alias("b")
        )
        .repartition(target_p, "b")
    )
    signups = (
        events.filter(F.col("event_type") == "signup")
        .select(
            "user_id", "ts", "event_id", F.pmod("user_id", F.lit(n_buckets)).alias("b")
        )
        .repartition(target_p, "b")
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return pd.DataFrame(
                columns=["purchase_id", "user_id", "purchase_ts",
                         "signup_id", "signup_ts"]
            )
        left = left.sort_values(["ts", "event_id"]).reset_index(drop=True)
        right = right.sort_values(["ts", "event_id"]).reset_index(drop=True)
        m = pd.merge_asof(
            left.rename(columns={"event_id": "purchase_id", "ts": "purchase_ts"}),
            right.rename(columns={"event_id": "signup_id", "ts": "signup_ts"}),
            left_on="purchase_ts",
            right_on="signup_ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        return m[["purchase_id", "user_id", "purchase_ts", "signup_id", "signup_ts"]]

    return (
        purchases.groupBy("b")
        .cogroup(signups.groupBy("b"))
        .applyInPandas(
            merge,
            schema="purchase_id long, user_id long, purchase_ts timestamp, "
            "signup_id long, signup_ts timestamp",
        )
    )
