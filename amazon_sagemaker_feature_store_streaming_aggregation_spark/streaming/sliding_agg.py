"""Continuous per-event trailing-window aggregation (reference S4).

The heart of the reference: the KDA SQL standing query
(``notebooks/1_setup.ipynb:466-478``) emits, FOR EVERY arriving event,
the COUNT/AVG of that card's events in the trailing 10 minutes::

    SELECT STREAM cc_num,
           COUNT(*) OVER LAST_10_MINUTES, AVG(amount) OVER LAST_10_MINUTES
    WINDOW LAST_10_MINUTES AS
           (PARTITION BY cc_num RANGE INTERVAL '10' MINUTE PRECEDING)

Two Spark-native implementations:

``sliding_agg_exact``
    Exact per-event semantics via ``applyInPandasWithState``: per key the
    state is a ring of the last 10 minutes of (event-time, amount-cents)
    pairs; each micro-batch computes trailing counts/averages with
    vectorized numpy prefix sums + searchsorted (no per-row Python loop),
    then evicts state older than ``max_ts - window``. Amounts are
    summed as integer cents, so the emitted averages are bit-identical
    to the batch twin (operators/window_agg.py) — the reference's own
    batch/stream duality (``README.md:19-22``) is an exact invariant
    here, which tests assert. Frames are RANGE frames: all events that
    share the current event's timestamp are peers and are included in
    its window, matching ``RANGE ... CURRENT ROW`` (ties included) in
    the batch twin and ANSI SQL.

    Scale (the DEFAULT ``state_mode="auto"``): state per key is the
    raw-point ring while it stays small, and permanently collapses to a
    per-second (count, cents) bucket ring the first time it exceeds
    ``spill_points`` after eviction — capping state at
    O(max(spill_points, window_seconds)) per key regardless of event
    rate. The spill trades sub-second timestamp resolution for bounded
    state on adversarially hot keys; on second-grain inputs (the
    reference's own domain) bucketed results equal raw results exactly,
    which tests assert.

``sliding_agg_windowed``
    Fully built-in approximation: ``groupBy(window(ts, '10 min',
    '1 min'), key)`` sliding window + watermark — 1-minute output grain
    instead of per-event, but zero custom state management; useful when
    downstream only needs the store's latest value per key.

Ordering note: the reference aggregates over *arrival* order (KDA
ROWTIME). This operator defaults to ordering by *event time* within
each micro-batch and assumes per-key event-time-ordered arrival across
batches (true for replay; enforce upstream with a watermark + sort in
production). Late rows (ts older than the key's max seen) are
aggregated against the current buffer — same policy as KDA, which
cannot retro-correct either. Pass ``order='arrival'`` to replay the
reference's exact ROWTIME behavior on out-of-order input (delivered
order, monotonized time axis — see :func:`sliding_agg_exact`).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TEN_MINUTES_S = 600

#: auto-mode spill threshold: a key sustaining more raw points than this
#: *within one window* (i.e. > spill_points/window_s events per second,
#: 8/s at the 10-min default) collapses to the O(window_s) bucket ring.
DEFAULT_SPILL_FACTOR = 8


def _raw_chunk(ts_buf, cents_buf, new_ts, new_cents, window_us):
    """Exact RANGE-frame counts/sums for one sorted chunk against the
    raw-point buffer. Returns (count, avg, kept_ts, kept_cents) with the
    buffer already evicted to the trailing window."""
    all_ts = np.concatenate([ts_buf, new_ts])
    all_cents = np.concatenate([cents_buf, new_cents])
    # the buffer is sorted and the chunk is sorted, but chunk rows may
    # PRECEDE the buffer tail — late data, or the 2nd+ Arrow chunk of a
    # large group's micro-batch — and searchsorted on an unsorted array
    # returns garbage bounds (count=0 → division by zero, and eviction
    # keyed on the last element instead of the max). Merge-sort the
    # union first; mergesort on two sorted runs is O(n).
    if len(ts_buf) and len(new_ts) and new_ts[0] < ts_buf[-1]:
        order = np.argsort(all_ts, kind="mergesort")
        all_ts = all_ts[order]
        all_cents = all_cents[order]
    csum = np.concatenate([[0], np.cumsum(all_cents)])
    # RANGE frame [t - window, t]: side='right' on the upper bound pulls
    # in ALL rows tied at t — including same-timestamp events later in
    # this chunk and in the buffer — matching RANGE ... CURRENT ROW peer
    # semantics (ANSI / DuckDB / the batch twin), not per-row ROWS.
    lo = np.searchsorted(all_ts, new_ts - window_us, side="left")
    hi = np.searchsorted(all_ts, new_ts, side="right")
    count = hi - lo
    ssum = csum[hi] - csum[lo]
    avg = (ssum / 100.0) / count
    keep = all_ts >= all_ts[-1] - window_us
    return count, avg, all_ts[keep], all_cents[keep]


def _bucket_chunk(b_sec, b_cnt, b_cents, ev_sec, ev_cents, window_s):
    """Second-grain RANGE-frame counts/sums for one sorted chunk against
    the (sec, count, cents) bucket ring. Returns (count, avg, new ring)
    with the ring folded + evicted."""
    # state contribution: buckets with sec in [ev_sec - window_s, ev_sec];
    # every state bucket is <= the chunk max, and ties at ev_sec are
    # peers, so the upper bound is the end of the ring for rows at the
    # max second and searchsorted-right elsewhere.
    cnt_csum = np.concatenate([[0], np.cumsum(b_cnt)])
    cents_csum = np.concatenate([[0], np.cumsum(b_cents)])
    lo = np.searchsorted(b_sec, ev_sec - window_s, side="left")
    hi = np.searchsorted(b_sec, ev_sec, side="right")
    st_cnt = cnt_csum[hi] - cnt_csum[lo]
    st_cents = cents_csum[hi] - cents_csum[lo]
    # chunk contribution: RANGE peers within the chunk itself
    e_csum = np.concatenate([[0], np.cumsum(ev_cents)])
    blo = np.searchsorted(ev_sec, ev_sec - window_s, side="left")
    bhi = np.searchsorted(ev_sec, ev_sec, side="right")
    count = st_cnt + (bhi - blo)
    total = st_cents + (e_csum[bhi] - e_csum[blo])
    avg = (total / 100.0) / count

    # fold chunk into the ring, evict stale buckets
    sec_u, inv = np.unique(ev_sec, return_inverse=True)
    add_cnt = np.bincount(inv).astype(np.int64)
    add_cents = np.bincount(inv, weights=ev_cents).astype(np.int64)
    all_sec = np.concatenate([b_sec, sec_u])
    all_cnt = np.concatenate([b_cnt, add_cnt])
    all_cents = np.concatenate([b_cents, add_cents])
    sec_m, inv_m = np.unique(all_sec, return_inverse=True)
    m_cnt = np.bincount(inv_m, weights=all_cnt).astype(np.int64)
    m_cents = np.bincount(inv_m, weights=all_cents).astype(np.int64)
    keep = sec_m >= sec_m[-1] - window_s
    return count, avg, sec_m[keep], m_cnt[keep], m_cents[keep]


def _to_buckets(ts_buf, cents_buf):
    """Collapse a raw-point ring (µs) into the per-second bucket ring."""
    sec = ts_buf // 1_000_000
    sec_u, inv = np.unique(sec, return_inverse=True)
    cnt = np.bincount(inv).astype(np.int64)
    cents = np.bincount(inv, weights=cents_buf).astype(np.int64)
    return sec_u, cnt, cents


def _make_state_fn(window_s: int, mode: str, spill_points: int, order: str):
    """Unified stateful fn. State is three long arrays ``(a, b, c)``:
    raw mode stores ``(ts_us, [], cents)`` (empty ``b`` tags the mode),
    bucket mode stores ``(sec, count, cents)``. ``mode`` is one of
    'raw' (never spill), 'bucket' (bucketed from the start), 'auto'
    (raw until a key's evicted ring exceeds ``spill_points``, then
    permanently bucketed — the bounded-state default).

    ``order='event'`` sorts each chunk by event time and windows on it.
    ``order='arrival'`` replays KDA ROWTIME semantics: rows keep their
    DELIVERED order and each one's window axis is the running MAX of
    event time at its arrival (the stand-in for KDA's monotonic
    processing-time ROWTIME) — a late row is therefore aggregated at
    "now", against the whole current buffer, exactly the observable
    KDA behavior the reference exhibits on out-of-order input. The
    monotonized axis is non-decreasing by construction, so both chunk
    kernels' sortedness preconditions hold without a sort or merge.

    Determinism caveat (inherent to the SEMANTICS, not this
    implementation): arrival order within a micro-batch follows
    shuffle-delivery order, which Spark does not guarantee across
    reruns when a key has >1 row per batch from multiple input
    splits — two runs that deliver differently are two different
    arrival histories, and KDA ROWTIME itself would score them
    differently too. That is exactly why ``order='event'`` is the
    DEFAULT and the oracle-checked mode; use 'arrival' only to
    reproduce the reference's observable behavior on a controlled
    (single-split or per-key-ordered) replay.
    """
    window_us = window_s * 1_000_000

    def fn(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            a, b, c = state.get
            a = np.asarray(a, dtype=np.int64)
            b = np.asarray(b, dtype=np.int64)
            c = np.asarray(c, dtype=np.int64)
            bucketed = len(b) > 0
        else:
            a = np.empty(0, dtype=np.int64)
            b = np.empty(0, dtype=np.int64)
            c = np.empty(0, dtype=np.int64)
            bucketed = mode == "bucket"

        for pdf in pdf_iter:
            if pdf.empty:
                continue
            if order == "event":
                pdf = pdf.sort_values("__ts_us", kind="mergesort")
            ev_us = pdf["__ts_us"].to_numpy(np.int64)
            ev_cents = pdf["__amt_cents"].to_numpy(np.int64)
            if order == "arrival":
                # ROWTIME: running max over arrival, continued from the
                # key's state max (the ring's last element — both rings
                # are kept sorted, so [-1] IS the max).
                axis = np.maximum.accumulate(ev_us)
                if len(a):
                    prev = a[-1] if not bucketed else a[-1] * 1_000_000
                    axis = np.maximum(axis, prev)
            else:
                axis = ev_us

            if bucketed:
                count, avg, a, b, c = _bucket_chunk(
                    a, b, c, axis // 1_000_000, ev_cents, window_s
                )
            else:
                count, avg, a, c = _raw_chunk(a, c, axis, ev_cents, window_us)
                if mode == "auto" and len(a) > spill_points:
                    a, b, c = _to_buckets(a, c)
                    bucketed = True

            yield pd.DataFrame(
                {
                    "cc_num": np.full(len(ev_us), key[0], dtype=np.int64),
                    "__ts_us": ev_us,
                    "num_trans_last_10m": count,
                    "avg_amt_last_10m": avg,
                }
            )

        state.update((a.tolist(), b.tolist(), c.tolist()))

    return fn


def sliding_agg_exact(
    events: DataFrame,
    key: str = "cc_num",
    ts: str = "ts",
    amount: str = "amount",
    window_s: int = TEN_MINUTES_S,
    state_mode: str = "auto",
    spill_points: int | None = None,
    bounded_state: bool | None = None,
    order: str = "event",
) -> DataFrame:
    """Exact per-event trailing 10-min COUNT/AVG per key (S4 option a).

    Works on both streaming and batch DataFrames (the stateful operator
    requires streaming; tests replay files). Output: one row per input
    event with ``(cc_num, ts, num_trans_last_10m, avg_amt_last_10m)``.

    ``state_mode`` (the scale knob; default ``"auto"``):

    - ``"auto"`` — raw-point state (bit-exact at any timestamp grain)
      until a key's ring exceeds ``spill_points`` after eviction, then
      permanently collapses to the per-second bucket ring. Bounds state
      at O(max(spill_points, window_s)) per key, so adversarially hot
      keys cannot grow state with event rate.
    - ``"raw"`` — raw points always (state grows with in-window rate).
    - ``"bucket"`` — per-second buckets from the start: O(window_s)
      state, aggregates over second-truncated event times (identical to
      raw mode for second-grain inputs, the reference's domain).

    ``bounded_state`` is the deprecated boolean alias (True→"bucket",
    False→"raw") kept for callers of the round-1 API.

    ``order`` (fidelity knob): ``"event"`` (default) windows on event
    time — the deliberate upgrade over the reference documented in the
    module header. ``"arrival"`` replays the reference's KDA ROWTIME
    observable behavior for out-of-order input: rows aggregate in
    delivered order on a monotonized (running-max) time axis, so a
    late row is windowed against the key's whole current buffer
    instead of only its event-time past. On in-order input the two
    modes are identical (the running max IS the event time); they
    diverge exactly on late rows, which the mode test asserts.
    """
    if bounded_state is not None:
        state_mode = "bucket" if bounded_state else "raw"
    if state_mode not in ("auto", "raw", "bucket"):
        raise ValueError(f"state_mode must be auto|raw|bucket, got {state_mode!r}")
    if order not in ("event", "arrival"):
        raise ValueError(f"order must be event|arrival, got {order!r}")
    if spill_points is None:
        spill_points = DEFAULT_SPILL_FACTOR * window_s
    prepared = events.select(
        F.col(key).alias("cc_num"),
        F.unix_micros(F.col(ts).cast("timestamp")).alias("__ts_us"),
        F.round(F.col(amount) * 100, 0).cast("long").alias("__amt_cents"),
    ).where(
        # per-record failure isolation (the reference Lambda skips a
        # bad record and acks the rest): a malformed stream line
        # yields a null key/timestamp, which would otherwise raise
        # inside the Python state worker and kill the whole query
        F.col("cc_num").isNotNull()
        & F.col("__ts_us").isNotNull()
        & F.col("__amt_cents").isNotNull()
    )
    out = prepared.groupBy("cc_num").applyInPandasWithState(
        _make_state_fn(window_s, state_mode, spill_points, order),
        outputStructType=(
            "cc_num long, __ts_us long, num_trans_last_10m long, "
            "avg_amt_last_10m double"
        ),
        stateStructType="a array<long>, b array<long>, c array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return out.select(
        "cc_num",
        F.timestamp_micros(F.col("__ts_us")).alias("ts"),
        "num_trans_last_10m",
        "avg_amt_last_10m",
    )


def sliding_agg_windowed(
    events: DataFrame,
    key: str = "cc_num",
    ts: str = "ts",
    amount: str = "amount",
    window: str = "10 minutes",
    slide: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Built-in sliding-window approximation (S4 option b).

    ``groupBy(window(...), key)`` with a watermark: per (1-min grain
    window, key) COUNT/AVG. Latest-window-per-key in the store converges
    to the same values the exact operator maintains, at minute grain.
    """
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), window, slide), F.col(key))
        .agg(
            F.count("*").alias("num_trans_last_10m"),
            F.avg(amount).alias("avg_amt_last_10m"),
        )
        .select(
            F.col(key),
            F.col("window.end").alias("ts"),
            "num_trans_last_10m",
            "avg_amt_last_10m",
        )
    )
