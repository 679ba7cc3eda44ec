"""Stream enrichment against a dimension that CHANGES while the
stream runs (the slowly-changing-dimension-in-streaming pattern).

The plain stream-static join (``_q_stream_enrich``) resolves the
static side's file listing when the query PLANS — a dimension row
updated after the stream starts is invisible to every later
micro-batch, which is the classic silent-staleness bug in
long-running enrichment jobs (the listing is cached with the plan).

The standard fix, shipped here: do the join inside ``foreachBatch``
and re-read the dimension path per batch. Each micro-batch resolves
a FRESH snapshot of the dimension — pick-up latency is one trigger
interval — while the stream side still never shuffles (the re-read
dimension broadcasts exactly like the static join's build side).
Cost at scale: one file-listing + broadcast per trigger, which is
what every lookup-cache TTL in a streaming enricher amortizes to;
for very large dimensions swap the re-read for the feature store's
``get_latest`` (same bucket layout, pruned reads).

Reference parity note: the reference's enrichment Lambda re-reads
the feature store on EVERY event (`InvokeFraudEndpointLambda/
lambda_function.py:102-107`), i.e. zero staleness at per-event cost;
per-micro-batch refresh is the distributed sweet spot between that
and plan-frozen staleness.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def start_refreshed_dim_enrich(
    stream: DataFrame,
    dim_path: str,
    key: str,
    out_path: str,
    checkpoint: str,
    on_batch_done: Callable[[int], None] | None = None,
    trigger_interval: str | None = None,
) -> StreamingQuery:
    """Start a foreachBatch enrichment that re-reads ``dim_path``
    every micro-batch (left join on ``key``), writing each batch to
    ``out_path/batch=<id>/``.

    Idempotence: foreachBatch is AT-LEAST-ONCE — a crash between the
    sink write and the checkpoint commit replays the batch — so each
    batch OVERWRITES its own ``batch=<id>`` directory instead of
    appending to a shared one; a replay clobbers its previous partial
    output and downstream readers of ``out_path`` (partition
    discovery picks up the ``batch`` column) never see duplicates.
    This is the standard foreachBatch exactly-once recipe for
    file sinks. ``on_batch_done`` is a test/ops hook invoked after
    each batch's write — it shares the at-least-once contract (it may
    re-fire on replay), so keep it idempotent too.

    ``trigger_interval``: ``None`` drains the input present at start
    and stops (availableNow — replay/test mode); a live enricher —
    the long-running deployment this module exists for — passes e.g.
    ``"10 seconds"`` for a continuous processing-time trigger that
    keeps consuming new files and re-reading the dimension."""

    def _do_batch(bdf: DataFrame, batch_id: int) -> None:
        dim = bdf.sparkSession.read.parquet(dim_path)
        (
            bdf.join(F.broadcast(dim), on=key, how="left")
            .write.mode("overwrite")
            .parquet(f"{out_path}/batch={batch_id}")
        )
        if on_batch_done is not None:
            on_batch_done(batch_id)

    writer = stream.writeStream.foreachBatch(_do_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_interval is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()
