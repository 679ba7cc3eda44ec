"""Gap-based sessionization (training-data pipeline extension).

Event streams (the reference's transaction/event domain) are routinely
grouped into *sessions* — maximal runs of per-key events with no gap
larger than a timeout — before feature extraction or sequence-model
training. Classic formulation: a new session starts where the gap from
the previous event exceeds the timeout; the session id is the running
count of session starts.

Spark-first: ``lag`` + conditional + running ``sum`` over ONE
``(partitionBy key, orderBy ts)`` window spec — Catalyst plans a single
exchange + sort for all three expressions (same collapse the E1 windows
rely on), then an optional per-session aggregate reuses the same
partitioning. No Python, no state store; the streaming twin is
``session_window`` (built-in) — this is the deterministic batch path.

100 TB: one shuffle keyed on the (high-cardinality) key; running
frames are O(n). A hot key serializes its partition — same mitigation
story as window_agg (the session id only depends on gap>timeout
breakpoints, which the bucketed sweep can compute per time-bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_s: int = 1800,
    session_col: str = "session_id",
) -> DataFrame:
    """Append ``session_col``: 1-based per-key session ordinal. A row
    starts a new session iff it is the key's first event or its gap
    from the previous event exceeds ``gap_s`` seconds (strict >).

    NULL event times get ``session_col`` NULL by explicit rule: an
    event with no time cannot sit on the session timeline, and left
    in the window it would not even land deterministically (Spark
    orders NULLS FIRST, other engines NULLS LAST — the session
    numbering of every real event would shift engine-dependently).
    """
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    w = Window.partitionBy(key).orderBy(us)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    is_start = (
        F.when(us - F.lag(us).over(w) > F.lit(gap_s * 1_000_000), 1)
        .otherwise(F.when(F.lag(us).over(w).isNull(), 1).otherwise(0))
        .cast("long")
    )
    timed = df.where(F.col(ts).isNotNull()).select(
        "*", F.sum(is_start).over(run).alias(session_col)
    )
    untimed = df.where(F.col(ts).isNull()).withColumn(
        session_col, F.lit(None).cast("long")
    )
    return timed.unionByName(untimed)


def session_stats(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_s: int = 1800,
    value: str | None = "value",
) -> DataFrame:
    """Per-session summary: event count, start/end time, duration
    seconds (+ cent-exact value sum when ``value`` given). Builds on
    :func:`sessionize`; the groupBy re-partitions on (key, session) —
    map-side combine keeps the shuffle at one row per session."""
    s = sessionize(df, key=key, ts=ts, gap_s=gap_s)
    aggs = [
        F.count("*").alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        (
            F.unix_micros(F.max(ts).cast("timestamp"))
            - F.unix_micros(F.min(ts).cast("timestamp"))
        ).alias("duration_us"),
    ]
    if value is not None:
        aggs.append(
            F.sum(F.round(F.col(value) * 100, 0).cast("long")).alias(
                "value_cents"
            )
        )
    return s.groupBy(key, "session_id").agg(*aggs)
