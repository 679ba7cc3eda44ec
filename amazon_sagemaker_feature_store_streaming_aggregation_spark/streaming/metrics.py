"""Streaming observability: per-query progress roll-up.

The reference monitors its stream through CloudWatch (shard iterator
age, Lambda duration); the Structured Streaming equivalent is the
query's progress feed — one JSON document per micro-batch with input
rows, per-stage durations, and state-store counters.
``progress_summary`` rolls that feed up into the handful of numbers
an operator actually alerts on:

* ``num_batches`` / ``input_rows`` — did the replay consume
  everything it should have?
* ``rows_per_sec`` — end-to-end throughput (input rows over summed
  batch wall-clock), the number to compare against the reference's
  per-shard ceiling.
* ``max_batch_ms`` — the straggler batch; a growing value under a
  steady input rate is the canonical "state store is drowning"
  symptom.
* ``state_rows`` — final stateful-operator row count; unbounded
  growth here means a missing watermark/range bound (the exact
  failure SCALE.md's state-bound column documents per query).

Works on any query (running or terminated) via ``recentProgress`` —
no listener registration, no extra thread; for long-running
production queries the same dicts stream through
``StreamingQueryListener.onQueryProgress`` and this roll-up applies
unchanged per window of progress events.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQuery


def progress_summary(query: StreamingQuery) -> dict:
    """Aggregate a query's ``recentProgress`` into operator-level
    totals. Returns zeros for a query that never processed a batch.

    Retention caveat: ``recentProgress`` keeps only the last
    ``spark.sql.streaming.numRecentProgressUpdates`` batches (default
    100). ``num_batches`` stays exact regardless (batch ids are
    cumulative, so it derives from the LAST id); the row/duration
    sums cover the retained window only — ``window_batches`` says how
    many that is, and a caller asserting totals over a longer replay
    must raise the retention conf or accumulate via a listener.
    """
    progs = [p for p in query.recentProgress if p is not None]
    last_id = max(
        (int(p.get("batchId") or 0) for p in progs), default=-1
    )
    input_rows = sum(int(p.get("numInputRows") or 0) for p in progs)
    batch_ms = [
        int(p.get("batchDuration") or 0)
        for p in progs
        if p.get("batchDuration") is not None
    ]
    state_rows = 0
    for p in reversed(progs):
        ops = p.get("stateOperators") or []
        if ops:
            state_rows = sum(int(o.get("numRowsTotal") or 0) for o in ops)
            break
    total_ms = sum(batch_ms)
    return {
        "num_batches": last_id + 1,
        "window_batches": len(progs),
        "input_rows": input_rows,
        "total_batch_ms": total_ms,
        "max_batch_ms": max(batch_ms, default=0),
        "rows_per_sec": (
            input_rows / (total_ms / 1000.0) if total_ms > 0 else 0.0
        ),
        "state_rows": state_rows,
    }
