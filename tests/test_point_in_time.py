"""Point-in-time training joins (featurestore/point_in_time.py):
leakage-freedom (no feature postdates its label), tolerance NULLing,
and label-row preservation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.featurestore import point_in_time_features
from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

from .conftest import SF0001

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def test_pit_attaches_latest_preceding_only(spark):
    labels = spark.createDataFrame(
        [(1, _ts(100), 1.0), (2, _ts(50), 2.0), (3, _ts(10), 3.0)],
        "label_id long, ts timestamp, y double",
    ).withColumn("user_id", F.lit(7))
    hist = spark.createDataFrame(
        [(7, _ts(20), 10.0), (7, _ts(60), 20.0), (7, _ts(99), 30.0)],
        "user_id long, ts timestamp, score double",
    )
    out = point_in_time_features(
        labels, {"m": hist}, key="user_id"
    ).collect()
    by_label = {r["label_id"]: r for r in out}
    assert by_label[1]["m__score"] == 30.0   # ts=99 <= 100
    assert by_label[2]["m__score"] == 10.0   # ts=20 <= 50 (60 is future)
    assert by_label[3]["m__score"] is None   # nothing yet
    assert len(out) == 3                      # labels never dropped


def test_pit_tolerance_nulls_stale_features(spark):
    labels = spark.createDataFrame(
        [(1, _ts(1000), 7)], "label_id long, ts timestamp, user_id long"
    ).select("label_id", "ts", F.lit(7).alias("user_id"))
    hist = spark.createDataFrame(
        [(7, _ts(0), 5.0)], "user_id long, ts timestamp, score double"
    )
    fresh = point_in_time_features(
        labels, {"m": hist}, key="user_id",
        tolerances_us={"m": 2_000_000_000},
    ).collect()[0]
    assert fresh["m__score"] == 5.0
    stale = point_in_time_features(
        labels, {"m": hist}, key="user_id",
        tolerances_us={"m": 500_000_000},
    ).collect()[0]
    assert stale["m__score"] is None
    assert stale["m__asof_ts"] is None


def test_pit_never_leaks_future_features(spark):
    """Leakage guard on real data: across every label row and feature
    group, the matched feature timestamp is <= the label timestamp."""
    ev = load_table(spark, SF0001, "events")
    labels = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id"
    )
    hist = {
        "click": ev.filter(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("value").alias("v")
        ),
        "view": ev.filter(F.col("event_type") == "view").select(
            "user_id", "ts", F.col("value").alias("v")
        ),
    }
    out = point_in_time_features(labels, hist, key="user_id")
    n_labels = labels.count()
    assert out.count() == n_labels
    leaks = out.where(
        (F.col("click__asof_ts") > F.col("ts"))
        | (F.col("view__asof_ts") > F.col("ts"))
    ).count()
    assert leaks == 0
    # and the join is not vacuous: most labels found some history
    assert out.where(F.col("view__asof_ts").isNotNull()).count() > 0


def test_pit_empty_history_keeps_labels_with_nulls(spark):
    labels = spark.createDataFrame(
        [(1, _ts(0), 7)], "label_id long, ts timestamp, user_id long"
    )
    hist = spark.createDataFrame(
        [], "user_id long, ts timestamp, score double"
    )
    out = point_in_time_features(labels, {"m": hist}, key="user_id").collect()
    assert len(out) == 1
    assert out[0]["m__score"] is None and out[0]["m__asof_ts"] is None
