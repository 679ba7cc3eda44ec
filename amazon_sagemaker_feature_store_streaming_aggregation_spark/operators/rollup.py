"""Multi-grain time rollup (training-data pipeline extension).

The hypertable / continuous-aggregate pattern: per-key event counts and
exact cent sums at several time grains (hour, day, ...) for dashboards,
mixing-ratio accounting, and drift monitoring.

Spark-first design: grains are HIERARCHICAL, so the rollup aggregates
raw events ONCE at the finest grain and re-aggregates each coarser
grain from the finer one. The alternative — ``GROUPING SETS`` /
``rollup()`` — plans an ``Expand`` that replicates every input row per
grain before the shuffle: at G grains that is a G× shuffle of the raw
events, vs. 1× (plus tiny bucket-row shuffles) here. Counts and cent
sums re-aggregate losslessly (longs are associative); averages are
derived at the end, never re-averaged.

100 TB: one full shuffle keyed on (key, finest bucket) with map-side
combine; every coarser level shuffles only bucket rows (bounded by
keys x time-span / grain, independent of event count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Supported grain hierarchy, finest first.
GRAINS = ("hour", "day", "week")


def time_rollup(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    grains: tuple[str, ...] = ("hour", "day"),
) -> DataFrame:
    """Per ``(key, grain, bucket_start)``: event count, exact cent sum,
    and the derived deterministic average. ``grains`` must be a prefix-
    compatible subset of :data:`GRAINS` ordered finest->coarsest."""
    order = [g for g in GRAINS if g in grains]
    if order != list(grains):
        raise ValueError(f"grains must be ordered finest->coarsest from {GRAINS}")

    finest = grains[0]
    level = df.groupBy(
        F.col(key),
        F.date_trunc(finest, F.col(ts).cast("timestamp")).alias("bucket_start"),
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col(value) * 100, 0).cast("long")).alias("value_cents"),
    )

    out = level.withColumn("grain", F.lit(finest))
    for g in grains[1:]:
        level = level.groupBy(
            F.col(key),
            F.date_trunc(g, F.col("bucket_start")).alias("bucket_start"),
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_cents").alias("value_cents"),
        )
        out = out.unionByName(level.withColumn("grain", F.lit(g)))

    return out.select(
        key,
        "grain",
        "bucket_start",
        "n_events",
        "value_cents",
        (
            (F.col("value_cents") / F.lit(100.0)) / F.col("n_events")
        ).alias("avg_value"),
    )
