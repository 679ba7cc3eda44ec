"""Batch range (interval) join: points joined to covering intervals.

Open-source Spark has no range-join strategy: ``l.ts BETWEEN r.lo AND
r.hi`` with no equi-key plans as BroadcastNestedLoopJoin (O(|L|x|R|)
work, broadcast-sized right side) — fine for a dimension of a few
thousand intervals, fatal at 100 TB. This operator implements the
standard bucketed rewrite (the same idea behind Databricks' range-join
hints, public docs): quantize time into width-``w`` buckets, EXPLODE
each interval to the buckets it covers, map each point to its single
bucket, equi-join on (key, bucket) and re-apply the exact range
predicate. Each (point, interval) pair meets in exactly one bucket —
the point's — so no dedup pass is needed.

The bucket equality is a plain equality conjunct in the join
condition, so Catalyst extracts it as a hash-join key
(ExtractEquiJoinKeys) and the plan is a shuffled equi-join with the
range check as a residual filter — NEVER a nested loop (asserted in
``tests/test_range_join.py``).

Scale: one hash shuffle on (key, bucket) of |L| + sum(interval_len/w)
rows; ``w`` trades explode factor against bucket co-location (pick w
~ median interval length so intervals explode to ~2 buckets). Skewed
buckets (a hot hour) split further under AQE skew-join handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PB = "__rj_pb"
_IB = "__rj_ib"
_IK = "__rj_ik"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo: str,
    hi: str,
    key: str | None = None,
    bucket_s: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join every row of ``points`` to the rows of ``intervals`` whose
    ``[lo, hi]`` (inclusive) contains ``point_ts`` — optionally also
    matching on an equi-``key`` present in both sides. Timestamps are
    compared at microsecond precision. ``how`` may be ``inner`` or
    ``left_outer`` (unmatched points kept, interval columns NULL; the
    range predicate rides inside the join condition, where outer-join
    semantics require it).

    All interval columns except ``key`` are carried to the output;
    other name collisions with point columns must be resolved by the
    caller (as with any Spark join).
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported join type: {how!r}")
    w_us = bucket_s * 1_000_000

    # Integer `div`, not floor(double /): point and interval MUST
    # bucket with the identical function, and a double quotient near
    # an integer boundary can floor differently from exact integer
    # division at large epochs (window_agg.py documents the same
    # doctrine for its bucketing).
    def _bucket_of(col_name: str) -> F.Column:
        return F.expr(
            f"unix_micros(cast(`{col_name}` as timestamp)) div {w_us}"
        )

    p = points.withColumn(_PB, _bucket_of(point_ts))
    # degenerate intervals (lo > hi) can never match, but without the
    # filter sequence(start, stop) runs DESCENDING and explodes
    # |lo-hi|/w garbage bucket rows per bad interval before the
    # residual predicate discards them — a silent cost blowup on dirty
    # interval data; dropping them is also correct for left_outer
    # (points keep NULLs either way)
    iv = intervals.where(F.col(lo) <= F.col(hi)).withColumn(
        _IB,
        F.explode(F.sequence(_bucket_of(lo), _bucket_of(hi))),
    )
    if key is not None:
        iv = iv.withColumnRenamed(key, _IK)

    cond = (
        (p[_PB] == iv[_IB])
        & (F.col(point_ts).cast("timestamp") >= F.col(lo))
        & (F.col(point_ts).cast("timestamp") <= F.col(hi))
    )
    if key is not None:
        cond = (p[key] == iv[_IK]) & cond

    out = p.join(iv, cond, how).drop(_PB, _IB)
    if key is not None:
        out = out.drop(_IK)
    return out
