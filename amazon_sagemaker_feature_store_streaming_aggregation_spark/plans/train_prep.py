"""Training-matrix preparation (reference T1-T4).

Reference ``3_train_and_deploy_model.ipynb:105-159`` +
``2_batch_ingestion.ipynb:502-505``: time-range train/test filter,
column drop/reorder (label first), null drop, integral casts, random
split. All built-in Catalyst ops; the time filter pushes down to the
scan when applied before the window query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_prep(
    agg: DataFrame,
    label_col: str,
    start: str,
    end: str,
    ts: str = "datetime",
    feature_cols: tuple[str, ...] = ("amount", "amt_ratio1", "amt_ratio2", "count_ratio"),
) -> DataFrame:
    """T1 time filter + T2 drop/reorder + T4 null-drop & casts."""
    return (
        agg.filter((F.col(ts) > F.lit(start)) & (F.col(ts) < F.lit(end)))
        .select(F.col(label_col).cast("long").alias(label_col), *feature_cols)
        .na.drop()
    )


def train_test_split(
    df: DataFrame, test_fraction: float = 0.3, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """T3 random split (reference ``train_test_split(test_size=0.3)``)."""
    train, test = df.randomSplit([1.0 - test_fraction, test_fraction], seed=seed)
    return train, test
