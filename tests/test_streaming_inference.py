"""E3 as a real streaming query: the incoming transaction stream is
enriched with stream-static broadcast joins against both feature
tables, staleness-guarded, ratio-featured and threshold-classified —
the full inference pipeline of the reference running as ONE Structured
Streaming query (vs. its per-event Lambda)."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import (
    assemble_features_csv,
    enrich_transactions,
    threshold_classify,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
    read_json_event_stream,
)

NOW = dt.datetime(2023, 11, 14, 22, 13, 20)  # == epoch 1700000000
T0 = 1_700_000_000


@pytest.fixture()
def stream_dir(tmp_path):
    events = [
        {"cc_num": 1, "merchant": "a", "amount": 50.0, "zip_code": 1,
         "trans_ts": float(T0 - 5)},
        {"cc_num": 2, "merchant": "b", "amount": 80.0, "zip_code": 2,
         "trans_ts": float(T0 - 3)},
        {"cc_num": 3, "merchant": "c", "amount": 10.0, "zip_code": 3,
         "trans_ts": float(T0 - 1)},
    ]
    p = tmp_path / "s"
    p.mkdir()
    (p / "00.jsonl").write_text("\n".join(json.dumps(e) for e in events))
    return str(p)


def test_streaming_enrichment_end_to_end(spark, stream_dir, tmp_path):
    f10 = spark.createDataFrame(
        [
            (1, 4, 25.0, NOW - dt.timedelta(seconds=30)),   # fresh
            (2, 9, 99.0, NOW - dt.timedelta(seconds=700)),  # stale
        ],
        "cc_num long, num_trans_last_10m long, avg_amt_last_10m double,"
        " trans_time timestamp",
    )
    f1w = spark.createDataFrame(
        [(1, 40, 50.0), (2, 90, 10.0)],
        "cc_num long, num_trans_last_1w long, avg_amt_last_1w double",
    )
    stream = read_json_event_stream(spark, stream_dir)
    enriched = threshold_classify(
        assemble_features_csv(
            enrich_transactions(stream, f10, f1w, now=F.lit(NOW))
        ).withColumn("probability", F.col("amt_ratio1") / F.lit(2.0)),
        threshold=0.2,
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("infer_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {r["cc_num"]: r for r in spark.table("infer_out").collect()}
    assert len(out) == 3
    # fresh card: real ratios flow through to a FRAUD call (0.25 > 0.2)
    assert not out[1]["is_stale_10m"]
    assert out[1]["amt_ratio1"] == pytest.approx(0.5)
    assert out[1]["prediction"] == "FRAUD"
    # stale card: ratios zeroed -> NOT FRAUD
    assert out[2]["is_stale_10m"]
    assert out[2]["amt_ratio1"] == 0.0
    assert out[2]["prediction"] == "NOT FRAUD"
    # unknown card: zero-filled defaults
    assert out[3]["num_trans_last_1w"] == 0
    assert out[3]["features_csv"].startswith("10.0,")
