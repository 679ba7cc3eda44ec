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


#: Morton (Z-order) bit-spread masks: x -> x with its 21 low bits
#: spread to every 2nd position (2-D interleave), the classic 64-bit
#: constants. All intermediates stay below 2^62 (bigint-safe).
_SPREAD_STEPS = (
    (32, 0x1F00000000FFFF),
    (16, 0x1F0000FF0000FF),
    (8, 0x100F00F00F00F00F),
    (4, 0x10C30C30C30C30C3),
    (2, 0x1249249249249249),
)


def _spread_bits(col: F.Column) -> F.Column:
    """Spread the low 21 bits of a non-negative bigint to even bit
    positions (pure codegen integer ops — shift/or/and chain)."""
    x = col.bitwiseAND(F.lit((1 << 21) - 1))
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_value(col_a, col_b) -> F.Column:
    """2-D Morton code of two non-negative integer columns (each
    clamped to 21 bits): bit-interleaved so sorting by the result
    clusters BOTH dimensions at every scale.

    The inputs must already share a bit width: Morton compares bit
    positions across dimensions, so a 16-bit column interleaved with
    an 8-bit column is dominated by the wide column's high bits and
    the narrow column ends up not clustered at all (measured exactly
    that before normalization existed). :func:`write_zorder_layout`
    min/max-normalizes both columns to 16 bits first.
    """
    a = _spread_bits(F.col(col_a) if isinstance(col_a, str) else col_a)
    b = _spread_bits(F.col(col_b) if isinstance(col_b, str) else col_b)
    return a.bitwiseOR(F.shiftleft(b, 1))


def write_zorder_layout(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Z-order curve of (``col_a``, ``col_b``).

    Why: parquet row-group/file pruning works off min/max statistics,
    and a linear sort concentrates ONE column's ranges per file while
    leaving every other column's range global — so filters on the
    second column skip nothing. The Morton interleave makes each file
    cover a small RECTANGLE of the 2-D key space: per-file min/max
    ranges shrink on BOTH columns (≈ by sqrt of the file count per
    dimension), and a selective filter on either column (or both)
    prunes most files. ``tests/test_layout.py`` measures exactly that
    from the written parquet footers.

    Both columns are min/max-normalized to 16-bit ranks in-plan (one
    broadcast of a 4-value aggregate — no driver action) so the
    interleave weights the dimensions equally regardless of their
    natural scales; see :func:`zorder_value` for why that matters.

    ``repartitionByRange`` on the z-value both sorts and splits: range
    partitioning assigns contiguous z-intervals per output file (one
    exchange), which is the clustering the statistics need —
    ``sortWithinPartitions`` alone would interleave z-ranges across
    files.
    """
    bounds = df.agg(
        F.min(col_a).alias("__amin"),
        F.max(col_a).alias("__amax"),
        F.min(col_b).alias("__bmin"),
        F.max(col_b).alias("__bmax"),
    )

    def norm(c: str, lo: str, hi: str) -> F.Column:
        span = F.greatest(F.col(hi) - F.col(lo), F.lit(1))
        return (
            (F.col(c) - F.col(lo)).cast("double")
            * F.lit(65535.0)
            / span.cast("double")
        ).cast("long")

    z = zorder_value(
        norm(col_a, "__amin", "__amax"), norm(col_b, "__bmin", "__bmax")
    ).alias("__z")
    (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z", "__amin", "__amax", "__bmin", "__bmax")
        .write.mode("overwrite")
        .parquet(path)
    )
