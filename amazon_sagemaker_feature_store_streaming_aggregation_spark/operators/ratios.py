"""Ratio feature projections.

Two variants exist in the reference:

* the *batch* projection (``2_batch_ingestion.ipynb:271-276``) — plain
  division; SQL division of the windowed aggregates (denominators are
  never NULL there because every row is inside its own frame);
* the *inference* projection
  (``src/lambda/InvokeFraudEndpointLambda/lambda_function.py:169-190``)
  — guarded: if the 1-week average or count is missing/zero, or the
  10-minute aggregates are staler than the cutoff, all three ratios are
  exactly ``0.0``.

Both are pure column expressions (Catalyst, codegen) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def with_ratio_features(df: DataFrame, amount: str = "amount") -> DataFrame:
    """Batch ratio projection (B8): straight division, double-typed."""
    return (
        df.withColumn(
            "amt_ratio1", F.col("avg_amt_last_10m") / F.col("avg_amt_last_1w")
        )
        .withColumn("amt_ratio2", F.col(amount) / F.col("avg_amt_last_1w"))
        .withColumn(
            "count_ratio",
            F.col("num_trans_last_10m").cast("double")
            / F.col("num_trans_last_1w").cast("double"),
        )
    )


def with_guarded_inference_ratios(
    df: DataFrame,
    amount: str = "amount",
    avg_10m: str = "avg_amt_last_10m",
    count_10m: str = "num_trans_last_10m",
    avg_1w: str = "avg_amt_last_1w",
    count_1w: str = "num_trans_last_1w",
    invalid: Column | None = None,
) -> DataFrame:
    """Guarded inference ratios (I6).

    ``invalid`` is an optional extra predicate (e.g. the staleness
    cutoff I4) that forces all ratios to 0.0. Zero/NULL 1-week
    denominators always do (``lambda_function.py:176-181``).
    """
    bad = (
        F.col(avg_1w).isNull()
        | (F.col(avg_1w) <= F.lit(0.0))
        | F.col(count_1w).isNull()
        | (F.col(count_1w) <= F.lit(0))
    )
    if invalid is not None:
        bad = bad | invalid
    zero = F.lit(0.0)
    return (
        df.withColumn(
            "amt_ratio1", F.when(bad, zero).otherwise(F.col(avg_10m) / F.col(avg_1w))
        )
        .withColumn(
            "amt_ratio2", F.when(bad, zero).otherwise(F.col(amount) / F.col(avg_1w))
        )
        .withColumn(
            "count_ratio",
            F.when(bad, zero).otherwise(
                F.col(count_10m).cast("double") / F.col(count_1w).cast("double")
            ),
        )
    )
