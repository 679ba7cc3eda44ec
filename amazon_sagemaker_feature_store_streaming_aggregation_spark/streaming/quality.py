"""Streaming quality scoring — the standing-ingest member of the
CCNet-shaped quality family (``operators/lm.py`` is the batch scorer,
``plans/pipeline.py::quality_filter`` the batch filter chain).

A training-data ingest pipeline scores documents AS THEY ARRIVE
against a model trained once on trusted text; CCNet's recipe filters
at fixed precomputed cutoffs, so the per-batch work is pure scoring —
stateless, no cross-batch coupling. That statelessness is the
equivalence proof: each document's score depends only on its own
tokens and the FIXED model tables, so the union of per-batch score
outputs equals the one-shot batch ``lm_transition_scores(corpus,
model=...)`` run row for row (the registered oracle states exactly
that for a model fitted on the corpus itself).

Contract notes: a document's rows must not SPLIT across micro-batches
(per-batch grouping would emit partial stats per fragment — the same
id-delivered-once assumption every index stream here makes); NULL ids
ride through with NULL stats (the engine-wide null-unsafe rule);
at-least-once delivery + the ``_SUCCESS``-gated batch-id skip give
idempotent retries.

100 TB: the model tables are the reference's distinct-bigram counts —
they join the batch's exploded bigram stream exactly as the batch
operator's plan does (AQE broadcasts them when they fit); per-batch
work is O(batch tokens), state is zero.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from .dedup import _fs_exists, _touch_success

#: model table subdirectories under a model_dir
_MODEL_PARTS = ("big_counts", "prev_counts", "vocab")


def write_lm_model(
    reference: DataFrame,
    model_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Fit the bigram model on ``reference`` and persist its three
    count tables under ``model_dir/{big_counts,prev_counts,vocab}``
    (plain parquet — the offline-training artifact a standing scorer
    reads). Overwrites any prior model at the path."""
    from ..operators.lm import lm_fit

    for df, part in zip(lm_fit(reference, id_col, text_col), _MODEL_PARTS):
        df.write.mode("overwrite").parquet(os.path.join(model_dir, part))


def read_lm_model(spark, model_dir: str) -> tuple:
    """The ``model=`` tuple for ``lm_transition_scores``, read back
    from :func:`write_lm_model`'s layout."""
    return tuple(
        spark.read.parquet(os.path.join(model_dir, part))
        for part in _MODEL_PARTS
    )


def run_lm_score_stream(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    model_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
):
    """Standing LM quality scoring: per micro-batch, score the batch's
    documents against the persisted model and write
    ``out_dir/batch=<id>/scores/`` — ``(id, n_bigrams, lm_prob_sum,
    lm_score)``, the batch operator's exact output shape. Filtering is
    a downstream ``lm_score >= cutoff`` on the scores (CCNet's fixed
    precomputed thresholds), deliberately NOT fused here: the scores
    are the reusable artifact, the cutoff is policy.

    Retried committed batches are skipped wholesale (``_SUCCESS``
    gate) — scoring is stateless, so there is nothing to repair.
    """
    if not checkpoint_dir:
        raise ValueError(
            "run_lm_score_stream requires a durable checkpoint_dir: "
            "batch-id-based retry idempotency is only safe when batch "
            "ids survive restarts"
        )

    from ..operators.lm import lm_transition_scores

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_out = out_dir.rstrip("/") + f"/batch={batch_id}"
        if _fs_exists(spark, batch_out + "/_SUCCESS"):
            return
        scores = lm_transition_scores(
            batch_df,
            id_col=id_col,
            text_col=text_col,
            model=read_lm_model(spark, model_dir),
        )
        scores.write.mode("overwrite").parquet(batch_out + "/scores")
        _touch_success(spark, batch_out)

    writer = (
        stream.writeStream.foreachBatch(_process)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_clf_score_stream(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    model=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
):
    """Standing SUPERVISED quality scoring — the classifier twin of
    :func:`run_lm_score_stream`: per micro-batch, score against the
    linear quality model (``operators/quality_clf.py`` — the model is
    the offline artifact; its weights ride the plan as literals, so
    unlike the LM path there is no model table to read or probe) and
    write ``out_dir/batch=<id>/scores/`` — ``(id, quality_margin,
    quality_keep)``, the batch operator's exact output shape. The
    keep decision is emitted but thresholding at other cutoffs stays
    downstream policy, exactly like the LM scores.

    Scoring is stateless against the fixed model, so union-of-batches
    == one-shot ``classify_quality`` over everything ingested (the
    registered oracle states that) and retried committed batches skip
    wholesale (``_SUCCESS`` gate — nothing to repair). The margin's
    large interpreted tree lands in exactly ONE optimized plan per
    batch (the scores write); no filter touches it pre-write (the
    curate runner's optimizer-blowup lesson).
    """
    if not checkpoint_dir:
        raise ValueError(
            "run_clf_score_stream requires a durable checkpoint_dir: "
            "batch-id-based retry idempotency is only safe when batch "
            "ids survive restarts"
        )

    from ..operators.quality_clf import classify_quality, train_quality_classifier

    if model is None:
        model = train_quality_classifier()

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_out = out_dir.rstrip("/") + f"/batch={batch_id}"
        if _fs_exists(spark, batch_out + "/_SUCCESS"):
            return
        scores = classify_quality(
            batch_df, model=model, id_col=id_col, text_col=text_col
        ).select(id_col, "quality_margin", "quality_keep")
        scores.write.mode("overwrite").parquet(batch_out + "/scores")
        _touch_success(spark, batch_out)

    writer = (
        stream.writeStream.foreachBatch(_process)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_benchmark_shingles(
    benchmark: DataFrame,
    shingle_dir: str,
    text_col: str = "text",
    k: int | None = None,
) -> None:
    """Persist the DISTINCT shingle hashes of a benchmark/eval corpus
    under ``shingle_dir`` — the offline artifact a standing
    decontamination guard probes. Eval suites are small and change
    rarely (a release event, not a stream), so the shingle set is
    built once like the LM model tables above; 8-byte hashes only,
    never the benchmark text. Overwrites any prior set at the path."""
    from ..functions.hashing import shingle_hashes
    from ..operators.dedup import DEFAULT_SHINGLE_K

    from pyspark.sql import functions as F

    (
        benchmark.select(
            F.explode(
                shingle_hashes(text_col, k or DEFAULT_SHINGLE_K)
            ).alias("sh")
        )
        .distinct()
        .write.mode("overwrite")
        .parquet(shingle_dir)
    )


def run_contamination_stream(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    shingle_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int | None = None,
    available_now: bool = True,
):
    """Standing benchmark-decontamination guard: per micro-batch, flag
    arriving documents that share character k-gram shingles with the
    persisted benchmark set (:func:`write_benchmark_shingles`) and
    write ``out_dir/batch=<id>/overlap/`` — ``(id, n_overlap)`` rows,
    the exact output shape of the batch
    ``operators/dedup.py::contamination_overlap``. The GPT-3/Gopher
    overlap check every pretraining pipeline runs, moved to ingest
    time: a contaminated document is quarantined BEFORE it reaches a
    training shard, not in a later corpus-wide sweep.

    Statelessness is the equivalence proof (the
    :func:`run_lm_score_stream` argument): a document's overlap count
    depends only on its own shingles and the FIXED benchmark set, so
    the union of per-batch outputs equals the one-shot batch run over
    everything ingested (the registered oracle states exactly that).
    Documents must not split across micro-batches (the engine-wide
    id-delivered-once assumption); NULL-text docs shingle to nothing
    and emit nothing, exactly as in the batch operator.

    Retried committed batches skip wholesale (``_SUCCESS`` gate) —
    nothing to repair, there is no index to append.

    100 TB: the benchmark side is tiny by nature (eval suites) — it is
    read ONCE per runner, cached, and broadcast into each batch's
    scan-side shingle explode, so the corpus stream never shuffles
    before the contamination filter and per-batch work is O(batch
    shingles). Only the matched rows reach the per-doc aggregate.
    """
    if not checkpoint_dir:
        raise ValueError(
            "run_contamination_stream requires a durable checkpoint_dir: "
            "batch-id-based retry idempotency is only safe when batch "
            "ids survive restarts"
        )

    from pyspark.sql import functions as F

    from ..functions.hashing import shingle_hashes
    from ..operators.dedup import DEFAULT_SHINGLE_K

    kk = k or DEFAULT_SHINGLE_K
    _resolved: dict = {}

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_out = out_dir.rstrip("/") + f"/batch={batch_id}"
        if _fs_exists(spark, batch_out + "/_SUCCESS"):
            return
        if "bench" not in _resolved:
            _resolved["bench"] = spark.read.parquet(shingle_dir).persist()
        bench = _resolved["bench"]
        from ..operators.dedup import _parallelize_scan

        overlap = (
            _parallelize_scan(batch_df).select(
                F.col(id_col),
                F.explode(shingle_hashes(text_col, kk)).alias("sh"),
            )
            .join(F.broadcast(bench), on="sh", how="inner")
            .groupBy(id_col)
            .agg(F.count_distinct(F.col("sh")).alias("n_overlap"))
        )
        overlap.write.mode("overwrite").parquet(batch_out + "/overlap")
        _touch_success(spark, batch_out)

    writer = (
        stream.writeStream.foreachBatch(_process)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
