"""Rounding regression for running_totals: cents must be computed
JVM-side with F.round (half-AWAY-from-zero, matching the DuckDB
oracle) — numpy's half-even .round() gives 12 for 0.125*100=12.5.
The shipped testdata has no exact-half products, so this synthetic
stream is the only thing standing between half-even and the gate."""

from __future__ import annotations

import datetime as dt

from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
    read_event_stream,
    running_totals,
)

SCHEMA = "event_id long, ts timestamp_ntz, user_id long, value double"
T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def test_half_cent_values_round_away_from_zero(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rows = [
        (1, T0, 7, 0.125),   # 12.5 cents -> 13 (numpy half-even: 12)
        (2, T0 + dt.timedelta(seconds=1), 7, 0.375),  # 37.5 -> 38
        (3, T0 + dt.timedelta(seconds=2), 7, -0.125),  # -12.5 -> -13
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
        str(src / "00")
    )
    stream = read_event_stream(spark, str(src / "00"), SCHEMA)
    q = (
        running_totals(stream, key="user_id")
        .writeStream.format("memory")
        .queryName("runtot_halfcent")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        r["event_id"]: (r["running_n"], r["running_cents"])
        for r in spark.table("runtot_halfcent").collect()
    }
    assert got == {1: (1, 13), 2: (2, 51), 3: (3, 38)}


def test_tws_successor_parity_or_clean_skip(spark, tmp_path):
    """transformWithStateInPandas successor path: when the environment
    has protobuf the operator must produce the same rows as the
    applyInPandasWithState implementation; without it, tws_available()
    must be False and the query never constructed (clean skip)."""
    import pytest

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        running_totals_tws,
        tws_available,
    )

    if not tws_available():
        pytest.skip("google.protobuf absent: transformWithState gated off")

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        (i, T0 + dt.timedelta(seconds=i), i % 3, float(i) * 0.7)
        for i in range(30)
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
        str(src / "00")
    )
    stream = read_event_stream(spark, str(src / "00"), SCHEMA)
    q = (
        running_totals_tws(stream, key="user_id")
        .writeStream.format("memory")
        .queryName("runtot_tws")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        r["event_id"]: (r["running_n"], r["running_cents"])
        for r in spark.table("runtot_tws").collect()
    }
    # oracle: cumulative per user in event order
    want, seen = {}, {}
    for i, ts, uid, val in rows:
        n, c = seen.get(uid, (0, 0))
        n, c = n + 1, c + round(val * 100)
        seen[uid] = (n, c)
        want[i] = (n, c)
    assert got == want
