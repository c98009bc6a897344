"""Streaming windowFunnel state-machine pins: the stream result must
equal the batch operator on the same events."""

from __future__ import annotations


def test_streaming_funnel_matches_batch(spark, sf_dir):
    from cocktailsdb_spark.operators.events import window_funnel_timebound
    from cocktailsdb_spark.streaming.stream_queries import (
        streaming_window_funnel,
    )
    from cocktailsdb_spark.tables import load

    batch = {
        (r.level, r.step): (r.n_users, r.conversion_from_l1)
        for r in window_funnel_timebound(load(spark, sf_dir, "events")).collect()
    }
    stream = {
        (r.level, r.step): (r.n_users, r.conversion_from_l1)
        for r in streaming_window_funnel(spark, sf_dir).collect()
    }
    assert batch == stream
    assert batch[(1, "view")][1] == 1.0
