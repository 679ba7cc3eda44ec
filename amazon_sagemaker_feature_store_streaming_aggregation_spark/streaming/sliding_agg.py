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
    here, which tests assert.

    Scale: state per key is bounded by the event rate within the window
    (ring of raw points). For adversarially hot keys, a per-second
    (count, sum) bucket ring caps state at O(window_seconds) regardless
    of rate — ``bucket_seconds`` enables that mode with second-grain
    timestamps (the reference's own data is second-grain).

``sliding_agg_windowed``
    Fully built-in approximation: ``groupBy(window(ts, '10 min',
    '1 min'), key)`` sliding window + watermark — 1-minute output grain
    instead of per-event, but zero custom state management; useful when
    downstream only needs the store's latest value per key.

Ordering note: the reference aggregates over *arrival* order (KDA
ROWTIME). This operator orders by *event time* within each micro-batch
and assumes per-key event-time-ordered arrival across batches (true for
replay; enforce upstream with a watermark + sort in production). Late
rows (ts older than the key's max seen) are aggregated against the
current buffer — same policy as KDA, which cannot retro-correct either.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TEN_MINUTES_S = 600


def _make_exact_fn(window_us: int):
    def fn(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ts_buf, cents_buf = state.get
            ts_buf = np.asarray(ts_buf, dtype=np.int64)
            cents_buf = np.asarray(cents_buf, dtype=np.int64)
        else:
            ts_buf = np.empty(0, dtype=np.int64)
            cents_buf = np.empty(0, dtype=np.int64)

        for pdf in pdf_iter:
            if pdf.empty:
                continue
            pdf = pdf.sort_values("__ts_us", kind="mergesort")
            new_ts = pdf["__ts_us"].to_numpy(np.int64)
            new_cents = pdf["__amt_cents"].to_numpy(np.int64)

            all_ts = np.concatenate([ts_buf, new_ts])
            all_cents = np.concatenate([cents_buf, new_cents])
            csum = np.concatenate([[0], np.cumsum(all_cents)])

            n_old = len(ts_buf)
            idx = np.arange(n_old, len(all_ts))
            # trailing frame [t - window, t] inclusive == batch RANGE frame
            lo = np.searchsorted(all_ts, new_ts - window_us, side="left")
            count = idx + 1 - lo
            ssum = csum[idx + 1] - csum[lo]
            avg = (ssum / 100.0) / count

            yield pd.DataFrame(
                {
                    "cc_num": np.full(len(new_ts), key[0], dtype=np.int64),
                    "__ts_us": new_ts,
                    "num_trans_last_10m": count,
                    "avg_amt_last_10m": avg,
                }
            )
            ts_buf, cents_buf = all_ts, all_cents

        if len(ts_buf):
            keep = ts_buf >= ts_buf[-1] - window_us
            state.update((ts_buf[keep].tolist(), cents_buf[keep].tolist()))

    return fn


def _make_bucketed_fn(window_s: int):
    """Per-second (count, cents) bucket-ring state: O(window_s) per key
    regardless of event rate — the hot-key mitigation. Aggregates over
    second-truncated event times, so it equals the exact operator
    whenever inputs are second-grain (the reference's domain)."""

    def fn(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            b_sec, b_cnt, b_cents = (
                np.asarray(a, dtype=np.int64) for a in state.get
            )
        else:
            b_sec = np.empty(0, dtype=np.int64)
            b_cnt = np.empty(0, dtype=np.int64)
            b_cents = np.empty(0, dtype=np.int64)

        for pdf in pdf_iter:
            if pdf.empty:
                continue
            pdf = pdf.sort_values("__ts_us", kind="mergesort")
            ev_us = pdf["__ts_us"].to_numpy(np.int64)
            ev_sec = ev_us // 1_000_000
            ev_cents = pdf["__amt_cents"].to_numpy(np.int64)

            # state contribution: buckets with sec >= ev_sec - window_s
            cnt_csum = np.concatenate([[0], np.cumsum(b_cnt)])
            cents_csum = np.concatenate([[0], np.cumsum(b_cents)])
            lo = np.searchsorted(b_sec, ev_sec - window_s, side="left")
            st_cnt = cnt_csum[-1] - cnt_csum[lo]
            st_cents = cents_csum[-1] - cents_csum[lo]
            # batch contribution: prior events within the window
            e_cents_csum = np.concatenate([[0], np.cumsum(ev_cents)])
            idx = np.arange(len(ev_sec))
            blo = np.searchsorted(ev_sec, ev_sec - window_s, side="left")
            bt_cnt = idx + 1 - blo
            bt_cents = e_cents_csum[idx + 1] - e_cents_csum[blo]

            count = st_cnt + bt_cnt
            total = st_cents + bt_cents
            avg = (total / 100.0) / count
            yield pd.DataFrame(
                {
                    "cc_num": np.full(len(ev_sec), key[0], dtype=np.int64),
                    "__ts_us": ev_us,
                    "num_trans_last_10m": count,
                    "avg_amt_last_10m": avg,
                }
            )

            # fold batch into buckets, evict stale ones
            sec_u, inv = np.unique(ev_sec, return_inverse=True)
            add_cnt = np.bincount(inv).astype(np.int64)
            add_cents = np.bincount(inv, weights=ev_cents).astype(np.int64)
            all_sec = np.concatenate([b_sec, sec_u])
            all_cnt = np.concatenate([b_cnt, add_cnt])
            all_cents = np.concatenate([b_cents, add_cents])
            sec_m, inv_m = np.unique(all_sec, return_inverse=True)
            b_sec = sec_m
            b_cnt = np.bincount(inv_m, weights=all_cnt).astype(np.int64)
            b_cents = np.bincount(inv_m, weights=all_cents).astype(np.int64)
            keep = b_sec >= b_sec[-1] - window_s
            b_sec, b_cnt, b_cents = b_sec[keep], b_cnt[keep], b_cents[keep]

        state.update((b_sec.tolist(), b_cnt.tolist(), b_cents.tolist()))

    return fn


def sliding_agg_exact(
    events: DataFrame,
    key: str = "cc_num",
    ts: str = "ts",
    amount: str = "amount",
    window_s: int = TEN_MINUTES_S,
    bounded_state: bool = False,
) -> DataFrame:
    """Exact per-event trailing 10-min COUNT/AVG per key (S4 option a).

    Works on both streaming and batch DataFrames (the stateful operator
    requires streaming; tests replay files). Output: one row per input
    event with ``(cc_num, ts, num_trans_last_10m, avg_amt_last_10m)``.

    ``bounded_state=True`` switches to the per-second bucket ring
    (state O(window_s) per key independent of event rate — the
    adversarially-hot-key mode); aggregates are then computed over
    second-truncated event times, identical to the default mode for
    second-grain inputs.
    """
    prepared = events.select(
        F.col(key).alias("cc_num"),
        F.unix_micros(F.col(ts).cast("timestamp")).alias("__ts_us"),
        F.round(F.col(amount) * 100, 0).cast("long").alias("__amt_cents"),
    )
    if bounded_state:
        return prepared.groupBy("cc_num").applyInPandasWithState(
            _make_bucketed_fn(window_s),
            outputStructType=(
                "cc_num long, __ts_us long, num_trans_last_10m long, "
                "avg_amt_last_10m double"
            ),
            stateStructType=(
                "sec array<long>, cnt array<long>, cents array<long>"
            ),
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        ).select(
            "cc_num",
            F.timestamp_micros(F.col("__ts_us")).alias("ts"),
            "num_trans_last_10m",
            "avg_amt_last_10m",
        )
    out = prepared.groupBy("cc_num").applyInPandasWithState(
        _make_exact_fn(window_s * 1_000_000),
        outputStructType=(
            "cc_num long, __ts_us long, num_trans_last_10m long, "
            "avg_amt_last_10m double"
        ),
        stateStructType="ts_us array<long>, cents array<long>",
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
