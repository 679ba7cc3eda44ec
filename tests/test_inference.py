from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import (
    assemble_features_csv,
    enrich_transactions,
    threshold_classify,
    train_prep,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.scoring import (
    score,
    train_fraud_model,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
    agg_features_query,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import (
    load_transactions,
)

from .conftest import SF0001

NOW = dt.datetime(2024, 1, 1, 12, 0, 0)


def _tables(spark):
    tx = spark.createDataFrame(
        [
            (1, 50.0, NOW),     # fresh features
            (2, 80.0, NOW),     # stale features
            (3, 10.0, NOW),     # missing from both tables
        ],
        "cc_num long, amount double, trans_ts timestamp",
    )
    f10 = spark.createDataFrame(
        [
            (1, 4, 25.0, NOW - dt.timedelta(seconds=30)),
            (2, 9, 99.0, NOW - dt.timedelta(seconds=700)),  # > 600s old
        ],
        "cc_num long, num_trans_last_10m long, avg_amt_last_10m double, trans_time timestamp",
    )
    f1w = spark.createDataFrame(
        [(1, 40, 50.0), (2, 90, 10.0)],
        "cc_num long, num_trans_last_1w long, avg_amt_last_1w double",
    )
    return tx, f10, f1w


def test_enrich_fresh_stale_missing(spark):
    tx, f10, f1w = _tables(spark)
    out = {
        r["cc_num"]: r
        for r in enrich_transactions(tx, f10, f1w, now=F.lit(NOW)).collect()
    }
    fresh = out[1]
    assert not fresh["is_stale_10m"]
    assert fresh["num_trans_last_10m"] == 4
    assert fresh["amt_ratio1"] == pytest.approx(25.0 / 50.0)
    assert fresh["amt_ratio2"] == pytest.approx(50.0 / 50.0)
    assert fresh["count_ratio"] == pytest.approx(4 / 40)

    stale = out[2]
    assert stale["is_stale_10m"]
    assert stale["num_trans_last_10m"] == 0
    assert stale["avg_amt_last_10m"] == 0.0
    # reference zeroes ALL ratios on staleness (lambda_function.py:137-146)
    assert stale["amt_ratio1"] == 0.0
    assert stale["amt_ratio2"] == 0.0
    assert stale["count_ratio"] == 0.0
    # 1-week features still served
    assert stale["num_trans_last_1w"] == 90

    missing = out[3]
    assert missing["is_stale_10m"]  # no record -> treated as stale
    assert missing["num_trans_last_10m"] == 0
    assert missing["num_trans_last_1w"] == 0
    assert missing["amt_ratio1"] == 0.0


def test_enrich_plan_is_broadcast(spark):
    tx, f10, f1w = _tables(spark)
    plan = (
        enrich_transactions(tx, f10, f1w, now=F.lit(NOW))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" not in plan


def test_assemble_and_threshold(spark):
    tx, f10, f1w = _tables(spark)
    out = assemble_features_csv(enrich_transactions(tx, f10, f1w, now=F.lit(NOW)))
    row = {r["cc_num"]: r for r in out.collect()}[1]
    parts = row["features_csv"].split(",")
    assert len(parts) == 4 and float(parts[0]) == 50.0

    scored = spark.createDataFrame(
        [(1, 0.9), (2, 0.1)], "cc_num long, probability double"
    )
    preds = {r["cc_num"]: r["prediction"] for r in threshold_classify(scored).collect()}
    assert preds == {1: "FRAUD", 2: "NOT FRAUD"}


def test_latency_metric(spark):
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import (
        latency_metric,
    )

    df = spark.createDataFrame(
        [(1, NOW - dt.timedelta(seconds=42))], "cc_num long, trans_ts timestamp"
    )
    out = latency_metric(df, now=F.lit(NOW)).first()
    assert out["latency_sec"] == 42


def test_train_and_score_end_to_end(spark):
    agg = agg_features_query(load_transactions(spark, SF0001, with_label=True))
    train = train_prep(agg, "fraud_label", "2024-01-02", "2024-01-25")
    model = train_fraud_model(train, max_iter=5)
    scored = threshold_classify(score(train.limit(50), model))
    rows = scored.collect()
    assert len(rows) == 50
    assert all(0.0 <= r["probability"] <= 1.0 for r in rows)
    assert set(r["prediction"] for r in rows) <= {"FRAUD", "NOT FRAUD"}
