from __future__ import annotations

import datetime as dt
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
    agg_features_query,
    trailing_window_features,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import (
    load_transactions,
)

from .conftest import SF001
from .oracle import assert_matches, run_oracle


def _tx(spark, rows):
    return spark.createDataFrame(
        rows, "tid string, datetime timestamp, cc_num long, amount double"
    )


def test_trailing_windows_tiny(spark):
    t0 = dt.datetime(2020, 1, 1, 0, 0, 0)
    rows = [
        ("a", t0, 1, 10.0),
        ("b", t0 + dt.timedelta(minutes=5), 1, 20.0),
        ("c", t0 + dt.timedelta(minutes=20), 1, 30.0),  # 10m frame excludes a,b
        ("d", t0 + dt.timedelta(days=8), 1, 40.0),  # 1w frame excludes all
        ("e", t0, 2, 5.0),  # other key isolated
    ]
    out = {
        r["tid"]: r
        for r in trailing_window_features(_tx(spark, rows)).collect()
    }
    assert out["a"]["num_trans_last_10m"] == 1
    assert out["b"]["num_trans_last_10m"] == 2
    assert out["b"]["avg_amt_last_10m"] == pytest.approx(15.0)
    assert out["c"]["num_trans_last_10m"] == 1
    assert out["c"]["num_trans_last_1w"] == 3
    assert out["c"]["avg_amt_last_1w"] == pytest.approx(20.0)
    assert out["d"]["num_trans_last_1w"] == 1
    assert out["e"]["num_trans_last_10m"] == 1
    assert out["e"]["avg_amt_last_1w"] == pytest.approx(5.0)


def test_frame_is_inclusive_of_boundary(spark):
    t0 = dt.datetime(2020, 1, 1, 0, 0, 0)
    rows = [
        ("a", t0, 1, 10.0),
        ("b", t0 + dt.timedelta(minutes=10), 1, 30.0),  # exactly -10min: included
    ]
    out = {r["tid"]: r for r in trailing_window_features(_tx(spark, rows)).collect()}
    assert out["b"]["num_trans_last_10m"] == 2
    assert out["b"]["avg_amt_last_10m"] == pytest.approx(20.0)


def test_ties_are_peers_in_range_frame(spark):
    t0 = dt.datetime(2020, 1, 1)
    rows = [("a", t0, 1, 10.0), ("b", t0, 1, 30.0)]
    out = trailing_window_features(_tx(spark, rows)).collect()
    # RANGE frame: identical timestamps are peers — both rows see both.
    assert all(r["num_trans_last_10m"] == 2 for r in out)
    assert all(r["avg_amt_last_10m"] == pytest.approx(20.0) for r in out)


def test_e1_against_duckdb_oracle(spark):
    import __spark_entry__ as e

    q = e.queries()["e1_agg_features"]
    oracle = run_oracle(e.oracle_sql()["e1_agg_features"], SF001)
    assert_matches(q(spark, SF001), oracle)


def test_e1_single_exchange_plan(spark):
    """Both RANGE frames share (partition, order) → one shuffle total."""
    plan = agg_features_query(
        load_transactions(spark, SF001)
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
