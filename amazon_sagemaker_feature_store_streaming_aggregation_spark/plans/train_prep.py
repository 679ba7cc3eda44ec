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


def hash_split(
    df: DataFrame,
    key_col: str,
    test_pct: int = 30,
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic hash-based train/test assignment (extension to the
    reference's T3 random split): every row whose ``key_col`` hashes
    into the bottom ``test_pct`` of 100 md5-derived buckets is 'test',
    the rest 'train'.

    Why this beats ``randomSplit`` in a production pipeline: the
    assignment is (a) stable across reruns/engines — no RNG, no
    partitioning sensitivity, reproducible by any system that can md5;
    (b) ENTITY-consistent — hashing a user/customer key puts all of an
    entity's rows on one side, preventing leakage between train and
    test; (c) incremental — tomorrow's new rows land on the same side
    their entity already has. The ``salt`` makes independent splits
    for different experiments.

    Pure scan-side column expressions (md5 is a JVM builtin): zero
    shuffles, zero state, embarrassingly parallel at any scale.
    """
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        % 100
    )
    return df.withColumn(
        "split",
        F.when(bucket < test_pct, F.lit("test")).otherwise(F.lit("train")),
    )
