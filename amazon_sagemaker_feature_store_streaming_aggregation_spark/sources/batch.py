"""Batch sources.

The reference reads its transaction table as schema-declared CSV
(``notebooks/2_batch_ingestion.ipynb:255-268``: explicit ``StructType``,
``header=False``). This engine's primary format is Parquet (columnar,
predicate pushdown, column pruning — the right scan for 100 TB), with a
schema-declared CSV reader kept for format parity.

The driver's testdata maps onto the reference transaction table as
``events(user_id -> cc_num, ts -> datetime, value -> amount,
event_id -> tid)`` (see FIXTURES.md F1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Reference batch-scan schema, ``2_batch_ingestion.ipynb:255-260``.
TRANSACTION_SCHEMA = T.StructType(
    [
        T.StructField("tid", T.StringType(), True),
        T.StructField("datetime", T.TimestampType(), True),
        T.StructField("cc_num", T.LongType(), True),
        T.StructField("amount", T.DoubleType(), True),
        T.StructField("fraud_label", T.LongType(), True),
    ]
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated Parquet table from ``sf_dir``.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark 4
    refuses natively; it is read via the legacy nanos-as-long path and
    truncated to microseconds (``ts div 1000``) — the same ns→µs
    truncation DuckDB applies, so event-time semantics agree with the
    oracle exactly.
    """
    # Deliberately SESSION-WIDE (not restored): the nanos-as-long conf
    # is consulted at scan planning AND execution, so a restore after
    # .parquet() could break this very read's later actions. Sessions
    # here are engine-owned (get_spark), and bigint is strictly more
    # conservative than a hard failure for any other ns-parquet read.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_transactions(
    spark: SparkSession, sf_dir: str, with_label: bool = False
) -> DataFrame:
    """Load ``events`` mapped to the reference transaction-table shape.

    Reference columns ``(tid, datetime, cc_num, amount[, fraud_label])``
    per ``2_batch_ingestion.ipynb:255-260``; mapping per FIXTURES.md F1.
    ``with_label=True`` derives the fraud label from ``event_type``
    (``'error'`` plays the fraud class in the driver's testdata). Only
    the needed columns are selected so the Parquet scan prunes the rest
    (check ``ReadSchema`` in ``.explain``).
    """
    cols = [
        F.col("event_id").alias("tid"),
        F.col("ts").alias("datetime"),
        F.col("user_id").alias("cc_num"),
        F.col("value").alias("amount"),
    ]
    if with_label:
        cols.append(
            F.when(F.col("event_type") == "error", F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("fraud_label")
        )
    return load_table(spark, sf_dir, "events").select(*cols)


def read_transactions_csv(spark: SparkSession, path: str) -> DataFrame:
    """Schema-declared CSV scan (format parity with the reference B1)."""
    return spark.read.schema(TRANSACTION_SCHEMA).csv(path, header=False)


def read_transactions_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Schema-declared JSON-lines scan — the reference's streaming wire
    format (one JSON record per line, ``put_record`` payload shape) as
    a BATCH source, for replaying captured streams through batch plans.

    Schema is declared, never inferred: inference costs an extra full
    pass over the data and can drift between runs — at 100 TB both are
    unacceptable. The timestamp format carries MICROSECONDS — Spark's
    default JSON format truncates to millis, which would silently
    shift event-time window boundaries vs the parquet source. (On
    write, TIMESTAMP_NTZ columns honor ``timestampNTZFormat``, not
    ``timestampFormat`` — set the same pattern for both.)
    """
    return (
        spark.read.schema(TRANSACTION_SCHEMA)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .json(path)
    )


def read_transactions_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan. ORC is the other push-down columnar format a
    reference user may hold historical exports in; Spark's native
    reader gives the same predicate-pushdown/column-pruning contract
    as Parquet (check ``PushedFilters``/``ReadSchema`` in
    ``.explain``)."""
    return spark.read.schema(TRANSACTION_SCHEMA).orc(path)
