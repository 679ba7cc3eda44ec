"""Stream-stream interval join (Structured Streaming built-in).

Joining two live streams is the remaining streaming-join shape after
the stream-to-static broadcast lookups in ``plans/inference.py``: both
sides buffer rows in the state store, and the TIME-RANGE predicate on
the two event-time columns is what lets Spark evict state — a row on
one side can only match rows on the other side within the interval, so
once the other side's watermark passes ``ts + upper`` the row is
dropped from state. Without the range condition the state grows
without bound; that is the 100 TB design constraint this operator
encodes. Inner-join matches emit immediately (no watermark-crossing
wait), which is why a bounded replay needs no end-of-stream flush.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    watermark: str = "0 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` and ``right`` on ``key`` where ``right_ts`` is
    within ``[left_ts + lower_s, left_ts + upper_s]`` (bounds in
    seconds, ``lower_s`` typically negative).

    Both sides get the same watermark delay; the range condition stays
    in raw timestamp space so Spark can derive per-side state
    watermarks from it. Column names (other than ``key``) must already
    be disjoint.

    ``how='left_outer'`` (or ``'full_outer'``): unmatched rows ALSO
    emit (other side NULL) — but only once the watermark passes their
    match horizon, because until then a matching row could still
    arrive. A bounded replay therefore only flushes its unmatched tail
    if something later advances the watermark (see the registered
    query's sentinel batches); inner mode has no such wait.

    ``how='left_semi'``: emit each left row ONCE as soon as any match
    arrives (left columns only — the streaming EXISTS). Like inner, no
    watermark wait for the emitted rows; unmatched left state is
    silently dropped at the watermark.
    """
    if how not in ("inner", "left_outer", "full_outer", "left_semi"):
        raise ValueError(f"unsupported join type: {how!r}")
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark).withColumnRenamed(
        key, "__rkey"
    )
    cond = (
        (F.col(key) == F.col("__rkey"))
        & (
            F.col(right_ts)
            >= F.col(left_ts) + F.expr(f"INTERVAL {lower_s} SECONDS")
        )
        & (
            F.col(right_ts)
            <= F.col(left_ts) + F.expr(f"INTERVAL {upper_s} SECONDS")
        )
    )
    joined = lw.join(rw, cond, how)
    if how == "full_outer":
        # a right-side-unmatched row emits with every LEFT column null
        # — including `key`; its real key lives only in __rkey, so
        # coalesce before dropping or the row's key is unrecoverable
        joined = joined.withColumn(key, F.coalesce(F.col(key), F.col("__rkey")))
    return joined.drop("__rkey")
