"""STANDING curation — the production composition of the streaming
quality and dedup machinery into one continuously-running job: as
crawl data arrives, each micro-batch is

1. LM-quality scored against a PERSISTED reference model
   (``streaming/quality.py``'s stateless-scoring contract — the model
   is the offline-trained artifact, CCNet's deployment shape),
2. cut at a FIXED precomputed threshold (``lm_score >= cutoff``;
   unscorable docs drop with the tail — no evidence is not good
   evidence in a keep-the-best filter, the ``quality_filter`` rule),
3. exact-deduped against the PERSISTENT bucketed hash index of every
   previously KEPT document (the ``run_index_dedup_stream``
   machinery: O(batch) probe I/O pruned to the batch's buckets,
   first-arrival wins, within-batch min-id), and
4. assigned its deterministic training SHARD (the ``global_shuffle``
   md5 convention — position-free: within-shard order is a corpus
   property a standing stream deliberately does not claim).

Survivors land under ``out_dir/batch=<id>/`` as ``(id, text_hash,
lm_score, shard)`` — the append-only feed a training-data loader
consumes shard-by-shard. The quality gate runs BEFORE the index, so
rejected documents never consume index space and a rejected early
copy does not shadow a later acceptable one.

Union-of-batches == one-shot: scoring is stateless against the fixed
model, the cutoff is a value comparison, the shard is a pure id hash,
and dedup keeps the first arrival — under the gated id-ordered replay
that is exactly the batch composition ``score → cutoff → min-id dedup
→ shard`` the registered oracle spells.

Delivery contract identical to ``run_index_dedup_stream``:
at-least-once, batch-id idempotent via the REQUIRED durable
checkpoint, index-append-after-output-commit with retry-time repair,
pending erasure tombstones filtered at every probe and append
(``streaming/forget.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h64
from .dedup import (
    _append_index,
    _assert_modulus_unchanged,
    _collect_buckets,
    _fs_exists,
    _index_bucket,
    _read_index_pruned,
    _resolve_live_modulus,
)


def run_curate_stream(
    stream: DataFrame,
    out_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    model_dir: str,
    cutoff: float,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
    n_buckets: int = 16,
    small_batch: bool = True,
    shard_seed: str = "shuffle-v1",
):
    """Standing curation runner (see the module docstring). ``cutoff``
    is the precomputed score threshold (e.g. the corpus P20 from a
    calibration run — ``plans/pipeline.py::quality_filter``'s exact
    percentile convention, computed offline exactly like the model);
    ``model_dir`` is ``streaming/quality.py::write_lm_model``'s
    layout."""
    if not checkpoint_dir:
        raise ValueError(
            "run_curate_stream requires a durable checkpoint_dir: "
            "batch-id-based retry idempotency is only safe when batch "
            "ids survive restarts"
        )

    from ..operators.lm import lm_transition_scores
    from ..operators.training_data import _shuffle_hash
    from .quality import read_lm_model

    _resolved: dict = {}
    _model: list = []

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        nb = _resolve_live_modulus(spark, index_dir, n_buckets, _resolved)
        batch_out = out_dir.rstrip("/") + f"/batch={batch_id}"
        if _fs_exists(spark, batch_out + "/_SUCCESS"):
            # retried committed batch: repair a possibly lost index
            # append from the committed survivors (the exact-dedup
            # runner's branch verbatim; _append_index filters pending
            # erasure tombstones)
            committed = spark.read.parquet(batch_out).select("text_hash")
            idx = _read_index_pruned(
                spark, index_dir,
                _collect_buckets(committed, nb, "text_hash"),
            )
            missing = committed if idx is None else committed.join(
                idx.select("text_hash"), on="text_hash", how="left_anti"
            )
            _assert_modulus_unchanged(spark, index_dir, _resolved)
            _append_index(
                missing.withColumn(
                    "ibucket", _index_bucket(nb, "text_hash")
                ),
                index_dir,
            )
            return
        if not _model:
            # vocab-scale tables probed every trigger: read once per
            # runner and persist (the centroid-cache rule — a lazy
            # handle would re-scan the model parquet per batch)
            _model.append(
                tuple(df.persist() for df in read_lm_model(spark, model_dir))
            )
        scores = lm_transition_scores(
            batch_df, id_col=id_col, text_col=text_col, model=_model[0]
        )
        kept = (
            batch_df.join(
                scores.where(
                    (F.col("n_bigrams") > 0)
                    & (F.col("lm_score") >= F.lit(float(cutoff)))
                ).select(id_col, "lm_score"),
                id_col,
            )
            .withColumn("text_hash", h64(text_col))
        )
        # within-batch dedup: min id per hash carries its own score
        # (scores are per id, so the struct-min tie is value-free).
        # Eagerly localCheckpoint-ed (the standing-runner rule): the
        # bucket collect, the anti-join, the output write and the
        # index append all start from a flat LogicalRDD instead of
        # re-analyzing the score+hash lineage per action
        batch_best = (
            kept.groupBy("text_hash")
            .agg(F.min(F.struct(F.col(id_col), F.col("lm_score"))).alias("__m"))
            .select(
                "text_hash",
                F.col(f"__m.{id_col}").alias(id_col),
                F.col("__m.lm_score").alias("lm_score"),
            )
            .localCheckpoint()
        )
        idx = _read_index_pruned(
            spark, index_dir,
            _collect_buckets(batch_best, nb, "text_hash"),
            nonempty_memo=_resolved,
        )
        fresh = batch_best if idx is None else batch_best.join(
            idx.select("text_hash"), on="text_hash", how="left_anti"
        )
        fresh = fresh.select(id_col, "text_hash", "lm_score").withColumn(
            "shard",
            F.pmod(_shuffle_hash(id_col, shard_seed), F.lit(n_shards))
            .cast("int"),
        ).localCheckpoint()
        fresh.write.mode("overwrite").parquet(batch_out)
        _assert_modulus_unchanged(spark, index_dir, _resolved)
        _append_index(
            fresh.select("text_hash").withColumn(
                "ibucket", _index_bucket(nb, "text_hash")
            ),
            index_dir,
            small_batch=small_batch,
        )

    writer = (
        stream.writeStream.foreachBatch(_process)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
