from __future__ import annotations

import datetime as dt
import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
    asof_join,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def _frames(spark):
    probe = spark.createDataFrame(
        [
            ("p1", 1, _ts(0), 10.0),   # before any build -> unmatched
            ("p2", 1, _ts(100), 11.0),  # after b@50 -> 500.0
            ("p3", 1, _ts(200), 12.0),  # tie with b@200 -> inclusive 600.0
            ("p4", 1, _ts(5000), 13.0),  # b@200 is 4800s old -> tolerance drop
            ("p5", 2, _ts(100), 14.0),  # other key isolated -> unmatched
        ],
        "tid string, k long, ts timestamp, v double",
    )
    build = spark.createDataFrame(
        [
            (1, _ts(50), 500.0),
            (1, _ts(200), 600.0),
        ],
        "k long, ts timestamp, fv double",
    )
    return probe, build


def test_asof_backward_inclusive_and_unmatched(spark):
    probe, build = _frames(spark)
    out = {
        r["tid"]: r
        for r in asof_join(
            probe, build, key="k", value_cols=["fv"]
        ).collect()
    }
    assert len(out) == 5
    assert out["p1"]["fv"] is None and out["p1"]["matched_ts"] is None
    assert out["p2"]["fv"] == 500.0 and out["p2"]["matched_ts"] == _ts(50)
    assert out["p3"]["fv"] == 600.0  # equal-ts build row matches (inclusive)
    assert out["p4"]["fv"] == 600.0  # no tolerance -> stale still matches
    assert out["p5"]["fv"] is None
    # probe columns pass through untouched
    assert out["p2"]["v"] == 11.0


def test_asof_tolerance_nulls_stale_matches(spark):
    probe, build = _frames(spark)
    out = {
        r["tid"]: r
        for r in asof_join(
            probe,
            build,
            key="k",
            value_cols=["fv"],
            tolerance_us=600 * 1_000_000,
        ).collect()
    }
    assert out["p2"]["fv"] == 500.0
    assert out["p3"]["fv"] == 600.0
    assert out["p4"]["fv"] is None and out["p4"]["matched_ts"] is None


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas' reference implementation."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    probe_pd = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 300),
            "ts": pd.to_datetime(
                rng.choice(np.arange(0, 10_000, 7), 300, replace=False), unit="s"
            ),
            "v": rng.random(300),
        }
    )
    build_pd = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 80),
            "ts": pd.to_datetime(
                rng.choice(np.arange(3, 10_000, 11), 80, replace=False), unit="s"
            ),
            "fv": rng.random(80),
        }
    )
    expected = pd.merge_asof(
        probe_pd.sort_values("ts"),
        build_pd.sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values(["k", "ts"])

    got = (
        asof_join(
            spark.createDataFrame(probe_pd),
            spark.createDataFrame(build_pd),
            key="k",
            value_cols=["fv"],
        )
        .toPandas()
        .sort_values(["k", "ts"])
    )
    exp_fv = expected["fv"].to_numpy()
    got_fv = got["fv"].to_numpy(dtype=float)
    assert len(exp_fv) == len(got_fv) == 300
    both_nan = np.isnan(exp_fv) & np.isnan(got_fv)
    assert np.all(both_nan | (exp_fv == got_fv))


def test_asof_single_exchange_plan(spark):
    """One hash exchange on the key, no join node: the union+window
    sweep is the whole physical story."""
    probe, build = _frames(spark)
    plan = (
        asof_join(probe, build, key="k", value_cols=["fv"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_asof_oracle_sf001(spark):
    from .conftest import SF001
    from .oracle import assert_matches, run_oracle

    import __spark_entry__ as e

    assert_matches(
        e.queries()["asof_join"](spark, SF001),
        run_oracle(e.oracle_sql()["asof_join"], SF001),
    )


def test_asof_match_is_one_row_not_a_column_mixture(spark):
    """When the latest build row holds a NULL in one value column, the
    match must carry THAT row's null — not an older row's non-null
    stitched in per-column."""
    import datetime as dt

    from pyspark.sql import functions as F

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.asof_join import asof_join

    t0 = dt.datetime(2024, 1, 1)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    build = spark.createDataFrame(
        [(1, at(0), 10.0, 100.0), (1, at(10), 20.0, None)],
        "k long, ts timestamp, a double, b double",
    )
    probe = spark.createDataFrame(
        [(1, at(5)), (1, at(15))], "k long, ts timestamp"
    )
    got = {
        r["ts"]: (r["a"], r["b"])
        for r in asof_join(probe, build, key="k").collect()
    }
    assert got[at(5)] == (10.0, 100.0)   # first build row
    assert got[at(15)] == (20.0, None)   # latest row's own NULL kept


def test_asof_rejects_colliding_value_columns(spark):
    import datetime as dt

    import pytest

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.asof_join import asof_join

    t0 = dt.datetime(2024, 1, 1)
    probe = spark.createDataFrame(
        [(1, t0, 5.0)], "k long, ts timestamp, price double"
    )
    build = spark.createDataFrame(
        [(1, t0, 6.0)], "k long, ts timestamp, price double"
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(probe, build, key="k")
