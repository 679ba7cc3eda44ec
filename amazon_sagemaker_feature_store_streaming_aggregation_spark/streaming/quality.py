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
