"""Reference-faithful golden scenario (SURVEY.md §5): one-off
transactions plus a 10-transaction fraud burst 1 s apart on one card,
replayed through the JSON streaming path. The per-event 10-minute
aggregates must climb exactly 1, 2, ..., 10 for the burst card —
that is what lets the reference flag the burst from tx #2
(`4_streaming_predictions.ipynb:217-259`). The burst uses distinct
event times: KDA windows over arrival ROWTIME (always unique), whereas
our operator windows over event time with ANSI RANGE peer semantics —
tied-timestamp behavior is covered by
test_streaming.py::test_tied_timestamps_use_range_peer_semantics."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.featurestore import FeatureGroup
from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources.batch import (
    TRANSACTION_SCHEMA,
    read_transactions_csv,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
    read_json_event_stream,
    sliding_agg_exact,
    start_stream_upsert,
)

BURST_CARD = 4444333322221111
ONEOFF_CARDS = [1111222233334444, 5555666677778888, 9999000011112222]
T0 = 1_700_000_000  # epoch seconds


@pytest.fixture()
def scenario_dir(tmp_path):
    """JSON-lines replay: 3 one-off tx, then a 10-tx burst 1-2s apart."""
    events = []
    for i, cc in enumerate(ONEOFF_CARDS):
        events.append(
            {"cc_num": cc, "merchant": f"merchant-{i}", "amount": 40.0 + i,
             "zip_code": 10000 + i, "trans_ts": float(T0 + 30 * i)}
        )
    for i in range(10):
        events.append(
            {"cc_num": BURST_CARD, "merchant": "fraudster", "amount": 1.0 + i,
             "zip_code": 99999, "trans_ts": float(T0 + 120 + i)}
        )
    p = tmp_path / "stream"
    p.mkdir()
    (p / "00.jsonl").write_text("\n".join(json.dumps(e) for e in events))
    return str(p)


def test_burst_aggregates_climb_per_event(spark, scenario_dir, tmp_path):
    stream = read_json_event_stream(spark, scenario_dir)
    agg = sliding_agg_exact(stream, key="cc_num", ts="ts", amount="amount")
    q = (
        agg.writeStream.format("memory")
        .queryName("golden_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("golden_out").collect()

    burst = sorted(
        (r for r in rows if r["cc_num"] == BURST_CARD), key=lambda r: r["ts"]
    )
    assert [r["num_trans_last_10m"] for r in burst] == list(range(1, 11))
    # per-event trailing average over amounts 1.0, 2.0, ..., i
    for i, r in enumerate(burst, start=1):
        expect = sum(1.0 + j for j in range(i)) / i
        assert r["avg_amt_last_10m"] == pytest.approx(expect)

    for cc in ONEOFF_CARDS:
        one = [r for r in rows if r["cc_num"] == cc]
        assert len(one) == 1 and one[0]["num_trans_last_10m"] == 1


def test_burst_reaches_feature_store(spark, scenario_dir, tmp_path):
    stream = read_json_event_stream(spark, scenario_dir)
    agg = sliding_agg_exact(stream, key="cc_num", ts="ts", amount="amount")
    fg = FeatureGroup(spark, "cc-agg-fg", "cc_num", "trans_time", str(tmp_path))
    q = start_stream_upsert(agg, fg, str(tmp_path / "ck2"), ts="ts", available_now=True)
    q.awaitTermination(120)
    rec = fg.get_record(BURST_CARD)
    assert rec["num_trans_last_10m"] == 10
    assert fg.get_latest().count() == 4


def test_bounded_state_mode_matches_exact_on_second_grain(
    spark, scenario_dir, tmp_path
):
    """The O(window) per-second bucket-ring state (hot-key mode) must
    emit identical aggregates to the raw-point mode for second-grain
    event times (the reference's domain)."""

    def run(bounded, name, ck):
        stream = read_json_event_stream(spark, scenario_dir)
        agg = sliding_agg_exact(
            stream, key="cc_num", ts="ts", amount="amount", bounded_state=bounded
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            (r["cc_num"], r["ts"], r["num_trans_last_10m"], r["avg_amt_last_10m"])
            for r in spark.table(name).collect()
        )

    assert run(False, "gb_exact", "cka") == run(True, "gb_bucketed", "ckb")


def test_csv_source_parity(spark, tmp_path):
    """B1: schema-declared headerless CSV scan round-trips."""
    p = tmp_path / "tx.csv"
    p.write_text(
        "t1,2020-01-01 00:00:00,123,10.5,0\n"
        "t2,2020-01-01 00:05:00,123,20.5,1\n"
    )
    df = read_transactions_csv(spark, str(p))
    assert df.schema == TRANSACTION_SCHEMA
    rows = {r["tid"]: r for r in df.collect()}
    assert rows["t2"]["amount"] == 20.5
    assert rows["t2"]["fraud_label"] == 1
