"""Streaming sessionization via the built-in ``session_window``.

The batch twin is ``operators/sessionize.py`` (lag + running-sum over
one window spec). In a live stream the same grouping is expressed with
``F.session_window(ts, gap)`` + a watermark: Spark keeps per-key session
state, merges events that arrive within ``gap`` of the session's end,
and emits a session exactly once when the watermark passes it (append
mode). State is bounded by the watermark — this is the scale path for
hot keys, because a key's state is one (start, end, partial-agg) triple
per OPEN session, not a buffer of events.

Boundary semantics: ``session_window`` MERGES an event that lands
exactly at the current session's end (``ts == last_ts + gap``) — a new
session starts only at strict ``gap > timeout``, the same rule as the
batch ``sessionize`` operator (verified by a boundary test), so batch
and streaming sessionization agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_window_stats(
    stream: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    value_col: str | None = "value",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Per-(key, session) aggregate over a stream: event count,
    first/last event time and the cent-exact value sum.

    ``session_last`` is recovered from the window end (``end`` is
    defined as ``last_ts + gap``), so the output is comparable with the
    batch formulation's ``max(ts)``.
    """
    aggs = [F.count("*").alias("n_events")]
    if value_col is not None:
        aggs.append(
            F.sum(F.round(F.col(value_col) * 100, 0).cast("long")).alias(
                "value_cents"
            )
        )
    sw = F.session_window(F.col(ts_col), f"{gap_s} seconds")
    out_cols = [
        F.col(key),
        F.col("session_window.start").alias("session_start"),
        (
            F.col("session_window.end") - F.expr(f"INTERVAL {gap_s} SECONDS")
        ).alias("session_last"),
        F.col("n_events"),
    ]
    if value_col is not None:
        out_cols.append(F.col("value_cents"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key), sw)
        .agg(*aggs)
        .select(*out_cols)
    )
