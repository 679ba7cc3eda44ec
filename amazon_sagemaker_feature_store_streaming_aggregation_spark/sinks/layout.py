"""Table layout for scale: how 100 TB of output should land on disk.

Two complementary mechanisms:

* :func:`write_hash_layout` / :func:`read_pruned` — metastore-free
  layout: ``partitionBy(date, bucket)`` where ``bucket`` is
  ``pmod(xxhash64(key), n)``. Point lookups and key-restricted scans
  prune to one directory per (day, bucket) — the same layout
  ``featurestore/feature_group.py`` uses for bucket-local upserts, so
  a reader filtering on the key touches 1/n of the data per day. Works
  on any path (no catalog), which is what object-store pipelines
  usually want.
* :func:`write_bucketed_table` — Spark-native ``bucketBy`` via
  ``saveAsTable``: both sides of a recurring equi-join written with
  the same bucket count on the join key join WITHOUT a shuffle (the
  scan's output partitioning already satisfies the join's
  requirement). This is the "pre-shuffle once, join forever" contract
  for fact-to-fact joins that would otherwise re-shuffle 100 TB every
  run; asserted shuffle-free in ``tests/test_layout.py``.

Reference scope note: the reference's only sink layouts are a single
CSV (B10) and the keyed feature store (B14) — this module is the
extension-layer generalization for warehouse output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BUCKET = "__bucket"


def write_hash_layout(
    df: DataFrame,
    path: str,
    key_col: str,
    num_buckets: int = 32,
    date_col: str | None = None,
) -> None:
    """Write ``df`` partitioned by (optional) day + key-hash bucket.

    The bucket column is derived (``pmod(xxhash64(key), n)``) so any
    reader — including one that knows nothing about this writer — can
    recompute it from a key literal and prune the scan.
    """
    out = df.withColumn(
        _BUCKET, F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_buckets))
    )
    parts = [_BUCKET]
    if date_col is not None:
        out = out.withColumn("__date", F.to_date(F.col(date_col)))
        parts = ["__date", _BUCKET]
    out.write.mode("overwrite").partitionBy(*parts).parquet(path)


def read_pruned(
    spark: SparkSession,
    path: str,
    key_col: str,
    key_value,
    num_buckets: int = 32,
    date=None,
) -> DataFrame:
    """Read a :func:`write_hash_layout` table restricted to one key:
    the bucket predicate is a PARTITION filter (directory pruning — no
    data files outside the key's bucket are opened), the key equality
    a pushed data filter inside it. Pass ``date`` (anything
    ``to_date`` accepts) for a table written with ``date_col`` to also
    prune to the one (day, bucket) directory.

    The key literal is cast to the key COLUMN's actual type before
    hashing — ``xxhash64`` is type-sensitive, so hashing e.g. an int
    literal against a bigint-bucketed column would silently select the
    wrong directory. The bucket expression is a constant; Catalyst
    folds it, so no extra job runs to compute it.
    """
    df = spark.read.parquet(path)
    key_type = df.schema[key_col].dataType
    bucket = F.pmod(
        F.xxhash64(F.lit(key_value).cast(key_type)), F.lit(num_buckets)
    )
    cond = (F.col(_BUCKET) == bucket) & (F.col(key_col) == F.lit(key_value))
    if date is not None:
        cond = cond & (F.col("__date") == F.to_date(F.lit(date)))
    return df.where(cond).drop(_BUCKET, "__date")


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a Spark-native bucketed parquet table. Two
    tables written with the same (column, count) join shuffle-free;
    ``sortBy`` additionally pre-sorts each bucket file so sort-merge
    join skips its per-partition sort. ``path`` makes it an external
    table (data at ``path``, bucketing metadata in the catalog).
    """
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, bucket_col)
    )
    if sort_col is not None:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)
