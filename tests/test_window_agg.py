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


def test_bucketed_rewrite_equals_exact_on_second_grain(spark):
    """The hot-key bucketed rewrite must be BIT-identical to the exact
    per-row window on second-grain data — including tied timestamps on
    a hot key (RANGE peers) and window-boundary events."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        trailing_window_features_bucketed,
        trailing_window_features_exact,
    )

    t0 = dt.datetime(2020, 1, 6, 0, 0, 0)
    rows = []
    # hot key 7: bursts with ties, spanning both frame boundaries
    for i in range(400):
        ts = t0 + dt.timedelta(seconds=(i // 3) * 37)  # 3-way ties
        rows.append((f"h{i}", ts, 7, float(1 + i % 50) + 0.17))
    # sparse keys, some beyond the 10m window from each other
    for k in range(5):
        for i in range(10):
            rows.append(
                (f"s{k}{i}", t0 + dt.timedelta(minutes=11 * i), 100 + k,
                 float(10 * k + i) + 0.99)
            )
    tx = _tx(spark, rows)
    cols = ["tid", "num_trans_last_10m", "avg_amt_last_10m",
            "num_trans_last_1w", "avg_amt_last_1w"]
    exact = sorted(map(tuple, trailing_window_features_exact(tx).select(*cols).collect()))
    bucketed = sorted(map(tuple, trailing_window_features_bucketed(tx).select(*cols).collect()))
    assert bucketed == exact


def test_bucketed_rewrite_tames_hot_key(spark):
    """Skew benchmark: one key holding ALL rows must run within ~2x of
    the same row count spread uniformly (the per-key window input is
    O(time buckets), and every stage distributes on (key, bucket))."""
    import time

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        trailing_window_features_bucketed,
    )

    n = 400_000
    base = spark.range(n).withColumn(
        "datetime", F.timestamp_seconds(F.lit(1_600_000_000) + (F.col("id") % 600_000))
    ).withColumn("amount", (F.col("id") % 997).cast("double"))

    def run(df):
        t0 = time.time()
        out = trailing_window_features_bucketed(
            df.withColumn("tid", F.col("id").cast("string")), key="cc_num"
        )
        out.agg(F.sum("num_trans_last_10m"), F.sum("num_trans_last_1w")).collect()
        return time.time() - t0

    uniform = base.withColumn("cc_num", F.col("id") % 1000)
    hot = base.withColumn("cc_num", F.lit(42).cast("long"))
    t_uniform = run(uniform)
    t_hot = run(hot)
    # generous CI margin over the ~2x design target
    assert t_hot < 3.0 * t_uniform + 2.0, (t_hot, t_uniform)


def test_bucketed_rewrite_plan_has_no_sliding_frame(spark):
    """Regression guard for the sweep: the only window frame in the plan
    must be the O(n) running frame (unboundedpreceding, currentrow) —
    a bounded sliding frame re-aggregates its buffer per row and is
    O(rows x frame-width) at a week-wide 1-s-bucket frame."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        trailing_window_features_bucketed,
    )

    t0 = dt.datetime(2020, 1, 6)
    tx = _tx(spark, [(f"t{i}", t0 + dt.timedelta(seconds=i), 1, 1.0)
                     for i in range(10)])
    plan = (
        trailing_window_features_bucketed(tx)
        ._jdf.queryExecution().executedPlan().toString().lower()
    )
    assert "unboundedpreceding$(), currentrow$()" in plan, plan
    assert "preceding$(" not in plan.replace("unboundedpreceding$(", ""), plan


def test_bucketed_variant_keeps_null_timestamp_rows(spark):
    """NULL-ts rows must survive the bucketed rewrite as their own
    per-key peer group (RANGE-window null semantics), matching the
    exact variant's row count."""
    import datetime as dt

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.window_agg import (
        trailing_window_features_bucketed,
        trailing_window_features_exact,
    )

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t0, 10.0), (1, None, 20.0), (1, None, 40.0)],
        "cc_num long, datetime timestamp, amount double",
    )
    exact = trailing_window_features_exact(df)
    bucketed = trailing_window_features_bucketed(df)
    assert bucketed.count() == exact.count() == 3
    nulls = [
        (r["num_trans_last_10m"], r["avg_amt_last_10m"])
        for r in bucketed.where("datetime IS NULL").collect()
    ]
    # both null rows see the 2-row null peer group: count 2, avg 30
    assert nulls == [(2, 30.0), (2, 30.0)]
