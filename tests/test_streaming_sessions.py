"""session_window sessionization: boundary semantics + batch parity."""

from __future__ import annotations

from datetime import datetime

from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
    session_window_stats,
)


def _ts(s):
    return datetime(2024, 1, 1, 0, 0, s) if s < 60 else datetime(
        2024, 1, 1, s // 3600, (s % 3600) // 60, s % 60
    )


def test_session_window_gap_boundary(spark):
    # gap = 10 s. Events at 0, 9 (merged: gap 9 < 10), then 19
    # (exactly 10 after 9 -> MERGED: session_window extends through
    # ts == session_end, the same strict-> break rule as the batch
    # sessionize operator), then 30 (gap 11 > 10 -> new session).
    rows = [(1, _ts(0), 1.0), (1, _ts(9), 2.0), (1, _ts(19), 4.0),
            (1, _ts(30), 8.0)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = sorted(
        (
            r["session_start"].second,
            r["session_last"].second,
            r["n_events"],
            r["value_cents"],
        )
        for r in session_window_stats(df, gap_s=10).collect()
    )
    assert got == [(0, 19, 3, 700), (30, 30, 1, 800)]


def test_session_window_multikey_and_cents(spark):
    rows = [
        (1, _ts(0), 1.005),   # 1.005*100 = 100.4999... in IEEE -> 100
        (1, _ts(5), 0.004),   # -> 0
        (2, _ts(0), 2.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = {
        (r["user_id"], r["session_start"].second): (
            r["n_events"],
            r["value_cents"],
        )
        for r in session_window_stats(df, gap_s=10).collect()
    }
    assert got == {(1, 0): (2, 100), (2, 0): (1, 200)}
