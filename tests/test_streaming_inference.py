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


def _run_to_memory(df, name, tmp_path):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    return name


def test_base64_json_stream_decodes_wire_format(spark, tmp_path):
    """U1 base64 leg: the same payloads base64-encoded per line (the
    Kinesis wire format the reference Lambda decodes) must produce the
    identical typed rows as the plain JSON source."""
    import base64

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        read_base64_json_event_stream,
    )

    events = [
        {"cc_num": 5, "merchant": "x", "amount": 12.5, "zip_code": 7,
         "trans_ts": float(T0 - 2)},
        {"cc_num": 6, "merchant": "y", "amount": 99.0, "zip_code": 8,
         "trans_ts": float(T0 - 1)},
    ]
    p = tmp_path / "b64"
    p.mkdir()
    # one malformed line rides along: an at-least-once transport's
    # noise must become a skipped null row, never a query-killing
    # exception (unbase64 THROWS; the source uses try_to_binary)
    (p / "00.b64").write_text(
        "\n".join(
            [base64.b64encode(json.dumps(e).encode()).decode() for e in events]
            + ["!!!not*base64***"]
        )
    )
    stream = read_base64_json_event_stream(spark, str(p))
    name = _run_to_memory(stream, "b64_out", tmp_path)
    got = sorted(
        (r["cc_num"], r["merchant"], r["amount"], r["zip_code"], r["ts"])
        for r in spark.table(name).collect()
    )
    ts = dt.datetime.fromtimestamp(T0, dt.timezone.utc).replace(tzinfo=None)
    assert got == [
        (5, "x", 12.5, 7, ts - dt.timedelta(seconds=2)),
        (6, "y", 99.0, 8, ts - dt.timedelta(seconds=1)),
    ]


def test_stale_records_dropped_at_consume(spark, tmp_path):
    """I1 MaximumRecordAgeInSeconds parity: an event older than 600 s at
    consume time must produce NO output row anywhere downstream."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        drop_stale_records,
        read_json_event_stream,
    )

    events = [
        {"cc_num": 1, "merchant": "a", "amount": 50.0, "zip_code": 1,
         "trans_ts": float(T0 - 5)},       # fresh
        {"cc_num": 9, "merchant": "z", "amount": 66.6, "zip_code": 9,
         "trans_ts": float(T0 - 601)},     # aged out: dropped
    ]
    p = tmp_path / "stale"
    p.mkdir()
    (p / "00.jsonl").write_text("\n".join(json.dumps(e) for e in events))
    stream = drop_stale_records(
        read_json_event_stream(spark, str(p)), max_age_s=600, now=NOW
    )
    name = _run_to_memory(stream, "stale_out", tmp_path)
    rows = spark.table(name).collect()
    assert [r["cc_num"] for r in rows] == [1]
