"""E1 batch-ingest pipeline: window features -> CSV sink -> store upsert.

Composes the reference's ``batch_aggregation.py`` end-to-end
(``2_batch_ingestion.ipynb:345-358``): the windowed feature query (B3-B9)
feeds BOTH a CSV sink (B10) and the latest-per-key -> project -> round ->
upsert chain (B11-B14). The intermediate result is persisted between the
two sinks (the reference recomputes the full window query twice —
SURVEY.md §4 'Caching/reuse').
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..featurestore import FeatureGroup
from ..operators.latest_per_key import latest_per_key
from ..sinks.batch import write_csv_single


def batch_feature_records(agg: DataFrame) -> DataFrame:
    """B11-B13: latest row per card -> 1-week features, rounded.

    Reference ``2_batch_ingestion.ipynb:303-323``: ``dense_rank`` latest
    (ties kept), project ``(cc_num, num_trans_last_1w, avg_amt_last_1w)``,
    ``round(avg_amt_last_1w, 2)``, skip null keys. All Catalyst column
    expressions — the reference's driver-side Python loop over
    ``rdd.collect()`` becomes a distributed projection.

    Rounding: when the exact cent sums are available
    (``agg_features_query(..., keep_cent_sums=True)``), the 2-dp
    rounded average is computed half-up in *integer* space —
    ``(2*sum_cents + n) div (2*n) / 100.0`` — because rounding a double
    to decimal places is engine-specific exactly at representable
    midpoints. Falls back to ``F.round`` otherwise.
    """
    if "sum_amt_cents_1w" in agg.columns:
        avg_col = (
            F.expr(
                "cast((2 * sum_amt_cents_1w + num_trans_last_1w) "
                "div (2 * num_trans_last_1w) as double) / 100.0"
            )
        ).alias("avg_amt_last_1w")
    else:
        avg_col = F.round(F.col("avg_amt_last_1w"), 2).alias("avg_amt_last_1w")
    return (
        latest_per_key(agg, key="cc_num", ts="datetime", keep_ties=True)
        .filter(F.col("cc_num").isNotNull())
        .select("cc_num", "num_trans_last_1w", avg_col)
    )


def run_batch_ingest(
    transactions: DataFrame,
    csv_out: str,
    feature_group: FeatureGroup,
) -> DataFrame:
    """Full E1 job (B1-B14). Returns the aggregated feature DataFrame."""
    from ..operators.window_agg import agg_features_query

    # keep_cent_sums: batch_feature_records' deterministic integer
    # half-up rounding path requires the exact window cent sums — the
    # F.round fallback is engine-specific at representable 2-dp
    # midpoints, and the composed job must upsert the same values the
    # oracle-gated b13 plan produces.
    agg = agg_features_query(
        transactions, keep_cent_sums=True
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # the cent sums are INTERNAL (they exist so the upsert path can
        # round in integer space) — the golden CSV keeps the reference's
        # exact column set (2_batch_ingestion.ipynb:271-287 emits only
        # the window features + ratios)
        write_csv_single(
            agg.drop("sum_amt_cents_10m", "sum_amt_cents_1w"), csv_out
        )
        feature_group.upsert(batch_feature_records(agg))
    finally:
        agg.unpersist()
    return agg
