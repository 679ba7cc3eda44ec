"""Delta-scoped incremental window maintenance (operators/incremental.py).

The contract: features computed from (pruned history + delta) are
bit-identical to the full recompute restricted to the delta rows —
for keys with history, keys new in the delta, and keys absent from
the delta (which must emit nothing).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
    trailing_window_features_exact,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.incremental import (
    delta_scoped_features,
)
from .conftest import SF0001


def _events(spark):
    return (
        spark.read.parquet(f"{SF0001}/events.parquet")
        .select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id",
            "value",
        )
    )


def _split(ev, cutoff_us):
    ts_us = F.unix_micros("ts")
    return ev.where(ts_us < cutoff_us), ev.where(ts_us >= cutoff_us)


def _full_restricted(ev, cutoff_us):
    feats = trailing_window_features_exact(
        ev, key="user_id", ts="ts", amount="value"
    )
    return feats.where(F.unix_micros("ts") >= cutoff_us)


def test_matches_full_recompute(spark):
    ev = _events(spark)
    mx = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    cutoff = mx - 86_400_000_000  # trailing day
    history, delta = _split(ev, cutoff)
    got = delta_scoped_features(
        history, delta, key="user_id", ts="ts", amount="value"
    )
    want = _full_restricted(ev, cutoff)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # the delta must not be empty for this to prove anything
    assert got.count() > 0


def test_static_frontier_matches_and_prunes(spark):
    ev = _events(spark)
    mx = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    cutoff = mx - 86_400_000_000
    history, delta = _split(ev, cutoff)
    got = delta_scoped_features(
        history,
        delta,
        key="user_id",
        ts="ts",
        amount="value",
        delta_start_us=cutoff,
    )
    want = _full_restricted(ev, cutoff)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_delta_only_key_and_absent_key(spark):
    # A key that exists only in the delta gets features from the delta
    # alone; a history-only key emits no rows.
    rows_h = [(1, "2024-01-01 00:00:00", 7, 10.0),
              (2, "2024-01-01 00:05:00", 8, 20.0)]
    rows_d = [(3, "2024-01-01 00:08:00", 7, 30.0),
              (4, "2024-01-01 00:09:00", 9, 40.0)]
    mk = lambda rows: spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = delta_scoped_features(
        mk(rows_h), mk(rows_d), key="user_id", ts="ts", amount="value"
    ).collect()
    by_id = {r["event_id"]: r for r in got}
    assert set(by_id) == {3, 4}
    # key 7: history row at 00:00 is inside the 10-min frame of 00:08
    assert by_id[3]["num_trans_last_10m"] == 2
    # key 9: delta-only, sees just itself
    assert by_id[4]["num_trans_last_10m"] == 1
    assert by_id[4]["avg_amt_last_1w"] == 40.0
