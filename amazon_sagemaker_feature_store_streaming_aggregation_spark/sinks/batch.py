"""Batch sinks.

Reference B10 (``2_batch_ingestion.ipynb:295-300``): single coalesced
headered CSV (``coalesce(1).write.format('com.databricks.spark.csv')``
— the pre-Spark-2.0 alias for the built-in csv source).

``coalesce(1)`` funnels the whole result through one task — correct for
a small golden file, wrong for bulk output. ``write_csv_single`` keeps
the reference behavior for golden-file parity; ``write_parquet`` is the
scale path (parallel parquet, optional partition columns so downstream
scans prune).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv_single(df: DataFrame, path: str, sep: str = ",") -> None:
    """Single-file headered CSV (reference-parity golden output, B10)."""
    (
        df.coalesce(1)
        .write.option("header", True)
        .option("sep", sep)
        .mode("overwrite")
        .csv(path)
    )


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Parallel parquet sink (the scale path for bulk feature output)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
