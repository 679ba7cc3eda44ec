"""Incremental (delta-scoped) recomputation of trailing-window features.

The reference recomputes the full E1 aggregation every batch run
(``notebooks/2_batch_ingestion.ipynb:245-252`` re-reads the whole
transaction table).  At 100 TB that is the wrong default: a daily
ingest touches a sliver of keys, and every trailing frame is bounded
(the long frame is one week), so the features of *new* rows depend
only on (a) the new rows themselves and (b) each affected key's
history inside the longest frame horizon.

``delta_scoped_features`` encodes that contract as a plan, not a
driver loop:

1. **Key pruning** — only keys that appear in the delta can produce
   output rows; the pruned-history read is a broadcast LEFT SEMI join
   on the (small) delta key set, so no shuffle of the big side.
2. **Horizon pruning** — history older than ``delta_start −
   long_frame`` cannot enter any output row's frame; with a known
   frontier the predicate is a literal comparison on the timestamp
   column — it prunes partitions outright on a date-partitioned
   layout, and reaches the parquet scan as a PushedFilter when the
   scan column needs no cast (see SCALE.md).
3. The surviving sliver (delta ∪ pruned history) runs through the
   SAME single-exchange window plan as the full recompute
   (``window_agg.trailing_window_features_exact``), and only delta
   rows are emitted.

Cost is O(delta + affected-keys' week) instead of O(table) — the
difference between "re-aggregate 100 TB nightly" and "re-aggregate
the ~0.1% of data the day touched".  Results are *bit-identical* to
the full recompute restricted to the delta rows (the window input per
affected key is identical), which is exactly what the DuckDB oracle
checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .window_agg import (
    ONE_WEEK_US,
    TEN_MINUTES_US,
    trailing_window_features_exact,
)


def delta_scoped_features(
    history: DataFrame,
    delta: DataFrame,
    key: str = "cc_num",
    ts: str = "datetime",
    amount: str = "amount",
    short_us: int = TEN_MINUTES_US,
    long_us: int = ONE_WEEK_US,
    short_label: str = "10m",
    long_label: str = "1w",
    delta_start_us: int | None = None,
) -> DataFrame:
    """Trailing-window features for ``delta`` rows only, reading only
    the horizon-and-key-pruned part of ``history``.

    ``history`` and ``delta`` must share a schema; ``delta`` rows must
    all be strictly newer than ``history`` rows (the usual
    append-partition contract).  Output = delta rows + the four
    feature columns, bit-identical to running the full window over
    ``history ∪ delta`` and keeping the delta rows.

    ``delta_start_us``: the delta's known lower time bound (epoch µs).
    In production the caller knows it (it IS the ingest partition
    date) — passing it makes the horizon predicate a *literal*, so it
    reaches the parquet scan as a PushedFilter / partition-prune.
    When ``None`` it is derived from ``delta`` as a broadcast scalar
    (still one job, but a runtime predicate the scan can't use).
    """
    ts_us = F.unix_micros(F.col(ts).cast("timestamp"))

    if delta_start_us is not None:
        pruned_history = history.where(
            ts_us >= F.lit(delta_start_us - long_us)
        )
    else:
        # Delta frontier: [min_ts, ...) of the incoming batch, carried
        # as a broadcast scalar (no driver-side action, one job).
        frontier = delta.agg(F.min(ts_us).alias("__delta_start_us"))
        pruned_history = (
            history.crossJoin(F.broadcast(frontier))
            .where(ts_us >= F.col("__delta_start_us") - F.lit(long_us))
            .drop("__delta_start_us")
        )

    keys = delta.select(key).distinct()
    pruned_history = pruned_history.join(
        F.broadcast(keys), on=key, how="left_semi"
    )

    sliver = pruned_history.unionByName(
        delta.withColumn("__is_delta", F.lit(1)), allowMissingColumns=True
    )
    feats = trailing_window_features_exact(
        sliver,
        key=key,
        ts=ts,
        amount=amount,
        short_us=short_us,
        long_us=long_us,
        short_label=short_label,
        long_label=long_label,
    )
    feature_cols = [
        c
        for c in feats.columns
        if c not in set(delta.columns) | {"__is_delta"}
    ]
    # Keep the caller's column order (the semi-join moved the key first).
    return feats.where(F.col("__is_delta") == 1).select(
        *delta.columns, *feature_cols
    )
