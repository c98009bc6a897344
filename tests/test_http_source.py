"""S5 semantics: injectable transport, error→empty, retry, distributed
variant parity (reference build_database.py:28-46)."""

from __future__ import annotations

from cocktailsdb_spark.sources import http_source


def test_fake_transport_deterministic():
    a = http_source.fake_transport("Mojito")
    b = http_source.fake_transport("Mojito")
    assert a == b and len(a) == 2
    assert a[0]["dateModified"] != a[1]["dateModified"]


def test_error_yields_empty_and_pipeline_continues(spark):
    def flaky(key):
        if key == "bad":
            raise RuntimeError("boom")
        return http_source.fake_transport(key)

    df = http_source.fetch_df(spark, ["bad", "Mojito"], transport=flaky)
    rows = df.collect()
    # 'bad' contributed nothing; Mojito contributed its 2 records
    assert len(rows) == 2
    assert all(r["strDrink"] == "Mojito" for r in rows)


def test_retry_then_success(spark):
    calls = {"n": 0}

    def eventually(key):
        calls["n"] += 1
        if calls["n"] < 2:
            raise RuntimeError("transient")
        return http_source.fake_transport(key)

    rows = http_source.fetch_rows(["Mojito"], eventually, max_retries=2, backoff_sec=0)
    assert len(rows) == 2 and calls["n"] == 2


def test_projection_drops_extra_columns(spark):
    rows = http_source.fetch_rows(["Mojito"], http_source.fake_transport)
    assert set(rows[0].keys()) == set(http_source.PROJECT_COLS)


def test_distributed_matches_driver_side(spark):
    keys = ["Mojito", "Negroni", "Paradise", "Daiquiri"]
    driver = {
        tuple(sorted(r.asDict().items()))
        for r in http_source.fetch_df(spark, keys, http_source.fake_transport).collect()
    }
    keys_df = spark.createDataFrame([(k,) for k in keys], "key string").repartition(2)
    dist = {
        tuple(sorted(r.asDict().items()))
        for r in http_source.fetch_distributed(keys_df, http_source.fake_transport).collect()
    }
    assert driver == dist


def test_bounded_keys_caps_driver_collect(spark):
    from cocktailsdb_spark.sources.http_source import bounded_keys

    df = spark.createDataFrame([(f"k{i}",) for i in range(10)], "p_name string")
    assert len(bounded_keys(df, "p_name", cap=10)) == 10
    import pytest as _pytest

    with _pytest.raises(ValueError, match="exceeds 5"):
        bounded_keys(df, "p_name", cap=5)
