"""Streaming / incremental SUBSTRING dedup — the standing-runner twin
of ``operators/substring.py`` (Lee et al. 2021, arXiv:2107.06499),
closing the one dedup family that was batch-only (the r11 verdict's
"Missing #2"): an arriving batch is span-deduped against the ENTIRE
corpus seen so far in O(batch + touched buckets), never a full
recompute.

Design — the persisted window-hash index pattern every other standing
runner here uses, with one twist the span semantics force:

* the index stores every k-token window OCCURRENCE ``(id, pos, sh)``
  partitioned by ``ibucket = pmod(xxhash64(sh), n_buckets)`` — all
  occurrences of one hash land in ONE bucket, so per-hash corpus
  counts come from the pruned probe read alone. O(tokens) rows total,
  the same asymptotics as the paper's suffix array (substring dedup
  fundamentally needs per-position state).
* a window occurrence is REPEATED once its hash's cumulative
  corpus-wide count reaches ``min_count``. The batch's own fresh
  occurrences know this at arrival; occurrences indexed EARLIER cross
  the threshold retroactively — so the runner emits marks for past
  documents exactly when the crossing batch arrives (the LSH runner's
  cross-pair rule applied to positions):

  - fresh occurrences of a hash with total (index + fresh) count
    >= min_count are marked now;
  - indexed occurrences of a hash whose count was BELOW min_count
    before this batch and reaches it now are marked now (each
    indexed occurrence crosses at most once, so no mark duplicates);
  - hashes already at/over min_count marked their indexed
    occurrences in an earlier batch — only the fresh rows mark.

  Union of per-batch marks over any replay == the one-shot
  ``repeated_spans``'s marked-window set, by induction (every
  occurrence of a finally-hot hash is marked exactly once, at
  max(its arrival batch, its hash's crossing batch)).
* :func:`read_repeated_spans` reconstructs the merged span extents
  from the accumulated marks with the SAME gaps-and-islands fold the
  batch operator uses (``merge_marked_windows`` — shared code, so the
  two paths cannot diverge), which is why marks persist per batch
  instead of merged spans: a span that GROWS across batches (adjacent
  windows marked in different triggers) must merge into one extent,
  and merged rows written per batch could never union to that.

Redelivery: a redelivered ``(id, pos, sh)`` row is already indexed —
the per-row anti-join routes it around counting, marking AND the
append (a full redelivery contributes nothing; a same-id re-ingest
with MODIFIED text appends only the rows the index lacks, the LSH
partial-match rule). Same-id duplicate corpus ROWS are therefore
counted once — the streaming store is keyed by id, and a duplicate id
is by contract a redelivery (the batch operator's
count-every-duplicate-row rule applies to unkeyed corpora only).

Delivery contract identical to ``run_index_dedup_stream``:
at-least-once, batch-id idempotent via the REQUIRED durable
checkpoint, index-append-after-output-commit with retry-time repair,
``_SUCCESS``-gated visibility. Erasure: probes go through
``_read_index_pruned``, so ``streaming/forget.py`` tombstones apply;
``forget_index_keys(key_col="doc_id")`` erases a document's windows.

100 TB: per batch, ONE window-hash scan of the batch (scan-side md5
shingling, the batch operator's expression), one pruned index read
(touched buckets), two map-combined counts, and O(batch + crossing
occurrences) writes. The index never rescans; ``n_buckets`` sizes the
bucket/batch trade exactly as the exact-hash runner documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (
    _append_index,
    _assert_modulus_unchanged,
    _collect_buckets,
    _committed_batches,
    _fs_exists,
    _fs_has_parquet,
    _index_bucket,
    _read_index_pruned,
    _resolve_live_modulus,
    _run_independent,
    _touch_success,
)


def run_index_substring_stream(
    stream: DataFrame,
    out_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    min_count: int = 2,
    available_now: bool = True,
    broadcast_batch: bool = True,
    n_buckets: int = 16,
):
    """Standing substring-dedup discovery over a document stream.

    Per micro-batch, under ``out_dir/batch=<id>/``:

    * ``marks/`` — the window occurrences ``(id, pos, sh)`` that
      became repeated THIS batch: the batch's own fresh windows whose
      hash is at/over ``min_count`` corpus-wide, plus previously
      indexed occurrences their arrival pushed over the threshold
      (marks for PAST doc ids — the retroactive half of the span
      semantics; see the module docstring).
    * ``wins/`` — the batch's fresh (not-yet-indexed) window rows,
      appended to the bucketed index after the output commits.

    ``read_repeated_spans(out_dir)`` folds all committed marks into
    merged span extents == the one-shot ``repeated_spans`` over every
    document ingested so far.
    """
    if not checkpoint_dir:
        raise ValueError(
            "run_index_substring_stream requires a durable "
            "checkpoint_dir: batch-id-based retry idempotency is only "
            "safe when batch ids survive restarts"
        )

    from ..operators.substring import _span_rows

    _resolved: dict = {}

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        nb = _resolve_live_modulus(spark, index_dir, n_buckets, _resolved)
        batch_out = out_dir.rstrip("/") + f"/batch={batch_id}"
        marks_out = batch_out + "/marks"
        wins_out = batch_out + "/wins"
        if _fs_exists(spark, batch_out + "/_SUCCESS"):
            # retried committed batch: repair a possibly lost index
            # append — re-append exactly the committed fresh rows the
            # index lacks, pruned to their own buckets
            committed = spark.read.parquet(wins_out)
            idx = _read_index_pruned(
                spark, index_dir, _collect_buckets(committed, nb, "sh")
            )
            missing = committed if idx is None else committed.join(
                idx, on=[id_col, "pos", "sh"], how="left_anti"
            )
            _assert_modulus_unchanged(spark, index_dir, _resolved)
            _append_index(
                missing.withColumn("ibucket", _index_bucket(nb, "sh")),
                index_dir,
            )
            return
        # ONE shingling pass per batch, localCheckpoint-ed LAZILY (the
        # standing-runner rule minus the dedicated materialization
        # job — the bucket collect below materializes it): the probe
        # join, the counts, both writes and the append all start from
        # a flat LogicalRDD instead of re-analyzing the md5 window tree
        batch_wins = _span_rows(
            batch_df, id_col, text_col, k
        ).localCheckpoint(eager=False)
        idx = _read_index_pruned(
            spark, index_dir,
            _collect_buckets(batch_wins, nb, "sh"),
            nonempty_memo=_resolved,
        )
        if idx is None:
            idx_touch = None
            fresh = batch_wins
        else:
            # the bucket prune is coarse (hash % n_buckets); narrow the
            # probed index rows to exactly the batch's hashes, ONCE —
            # the counts, the crossing marks and the redelivery
            # anti-join all read these same materialized rows
            idx_touch = idx.join(
                batch_wins.select("sh").distinct(), "sh", "left_semi"
            ).localCheckpoint(eager=False)
            # per-row redelivery routing: an occurrence already indexed
            # neither recounts nor re-appends nor re-marks (full
            # redeliveries drop wholesale; modified same-id re-ingests
            # contribute only their genuinely new windows)
            fresh = batch_wins.join(
                idx_touch, on=[id_col, "pos", "sh"], how="left_anti"
            ).localCheckpoint(eager=False)
        cnt_fresh = fresh.groupBy("sh").agg(F.count("*").alias("__cf"))
        if idx_touch is None:
            tot = cnt_fresh.withColumn("__cb", F.lit(0).cast("long"))
        else:
            cnt_before = idx_touch.groupBy("sh").agg(
                F.count("*").alias("__cb")
            )
            tot = cnt_fresh.join(cnt_before, "sh", "left").select(
                "sh", "__cf",
                F.coalesce(F.col("__cb"), F.lit(0)).cast("long").alias("__cb"),
            )
        # all four checkpoints this trigger are LAZY: the first
        # actions are the two overlapped artifact writes, whose jobs
        # materialize the chain once (concurrent first consumers are
        # safe — per-partition block locks); every checkpoint still
        # truncates its plan immediately
        hot = (
            tot.where(F.col("__cb") + F.col("__cf") >= F.lit(int(min_count)))
            .localCheckpoint(eager=False)
        )
        marked_fresh = fresh.join(hot.select("sh"), "sh", "left_semi")
        if idx_touch is not None:
            # indexed occurrences whose hash crosses min_count THIS
            # batch (was below, now at/over): their one-time
            # retroactive marks
            crossing = hot.where(
                (F.col("__cb") > 0) & (F.col("__cb") < F.lit(int(min_count)))
            ).select("sh")
            marked_index = idx_touch.join(crossing, "sh", "left_semi")
            marks = marked_fresh.select(id_col, "pos", "sh").unionByName(
                marked_index.select(id_col, "pos", "sh")
            )
        else:
            marks = marked_fresh.select(id_col, "pos", "sh")
        # order-free sub-artifacts (visibility gated on the _SUCCESS
        # written after both) — overlap them
        _run_independent(
            lambda: marks.write.mode("overwrite").parquet(marks_out),
            lambda: fresh.write.mode("overwrite").parquet(wins_out),
        )
        _touch_success(spark, batch_out)
        # index append after output commit (at-least-once; the retry
        # branch repairs a crash between the two writes)
        _assert_modulus_unchanged(spark, index_dir, _resolved)
        _append_index(
            fresh.withColumn("ibucket", _index_bucket(nb, "sh")),
            index_dir,
            small_batch=broadcast_batch,
        )

    writer = (
        stream.writeStream.foreachBatch(_process)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_repeated_spans(
    spark, out_dir: str, k: int = 10, id_col: str = "doc_id"
) -> DataFrame:
    """Reconstruct the merged repeated-span extents ``(id, span_start,
    span_end, n_windows)`` from the committed per-batch marks — the
    read API of the standing substring dedup, and (like
    ``read_cluster_labels``) its one deliberately O(marked-windows)
    operation. Equals the one-shot ``repeated_spans(corpus, k,
    min_count)`` over everything ingested so far (the union-of-marks
    induction in the module docstring); ``k`` must be the runner's.

    Mark rows are union-distinct before the fold: at-least-once
    delivery can leave a retried batch's marks written twice under
    one batch dir's lifetime, and distinct-by-(id, pos) makes the
    reconstruction idempotent under that."""
    base = out_dir.rstrip("/")
    from ..operators.substring import merge_marked_windows

    marks = None
    for b in _committed_batches(spark, base):
        p = f"{base}/batch={b}/marks"
        if not _fs_has_parquet(spark, p):
            continue
        df = spark.read.parquet(p).select(id_col, "pos")
        marks = df if marks is None else marks.unionByName(df)
    if marks is None:
        return (
            spark.range(0)
            .select(
                F.col("id").alias(id_col),
                F.col("id").alias("span_start"),
                F.col("id").alias("span_end"),
                F.col("id").alias("n_windows"),
            )
        )
    return merge_marked_windows(marks.distinct(), id_col, k)
