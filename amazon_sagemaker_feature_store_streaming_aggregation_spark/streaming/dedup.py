"""Streaming deduplication (training-data pipeline extension).

At-least-once transports (Kinesis/Kafka — the reference's bus, SURVEY
U3) redeliver records on retry/restart, and large-scale ingest
pipelines dedup at the edge before anything downstream sees the
duplicate. Spark-native formulation: watermark-bounded
``dropDuplicates`` — per-key state in the state store, evicted once the
watermark passes, so state is O(keys within the watermark horizon),
not O(all keys ever).

Two variants:

* :func:`dedup_stream_exact` — duplicate = same id column(s) (e.g. the
  md5 ``tid`` of G4, or an idempotency key). Uses
  ``dropDuplicatesWithinWatermark`` when available (Spark >= 3.5):
  duplicates are dropped if they arrive within the watermark delay of
  the first occurrence, the semantics an at-least-once redelivery
  needs (a redelivered record carries the SAME event time, but may
  arrive after the event-time watermark of the original has passed).
* :func:`dedup_stream_content` — duplicate = same content hash
  (``h64(text)``, the streaming twin of ``operators/dedup.py::
  dedup_exact``): dedups payload-identical documents during ingest.

100 TB: state is hash-partitioned on the dedup key across executors
(the same shuffle a batch groupBy pays), and the watermark bounds both
state size and the dedup horizon; an unbounded exact dedup of an
infinite stream is impossible by construction, which is why the batch
``dedup_exact`` exists for full-corpus passes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h64


def dedup_stream_exact(
    stream: DataFrame,
    id_cols: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop re-deliveries of the same ``id_cols`` within the watermark
    horizon. Output rows are the FIRST arrival of each key.

    Rows with a NULL in ANY id column PASS THROUGH undeduped:
    ``dropDuplicates`` treats NULL keys as equal, so routing them into
    the dedup would collapse every unidentifiable record within the
    horizon into one — distinct real events silently lost. A record
    without an identity cannot be recognized as a redelivery of
    anything; a pipeline that wants them gone filters them explicitly
    (same rule as :func:`dedup_stream_content` for NULL payloads).

    NULL event times are fine either way: the watermark machinery
    only uses ``ts_col`` for state expiry, and a NULL-ts first arrival
    is kept while its redeliveries are still dropped by key (probed).
    """
    id_ok = F.lit(True)
    for c in id_cols:
        id_ok = id_ok & F.col(c).isNotNull()
    keyed = stream.where(id_ok)
    keyless = stream.where(~id_ok)
    wm = keyed.withWatermark(ts_col, watermark)
    if hasattr(wm, "dropDuplicatesWithinWatermark"):
        deduped = wm.dropDuplicatesWithinWatermark(list(id_cols))
    else:
        deduped = wm.dropDuplicates([*id_cols, ts_col])
    return deduped.unionByName(keyless)


def dedup_stream_content(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Content dedup: duplicate = identical ``text_col`` payload. The
    state key is the 8-byte ``h64(text)`` (cross-engine md5-derived
    hash, functions/hashing.py) — the state store and the dedup shuffle
    carry the hash, never the payload.

    NULL-payload rows PASS THROUGH undeduped: ``h64(NULL)`` is NULL and
    ``dropDuplicates`` treats NULL keys as equal, so routing them into
    the dedup would silently collapse every malformed/null-payload
    record within the horizon into one — records that duplicate
    nothing, lost with no signal. They are not duplicates of each
    other by any content definition; a pipeline that wants them gone
    filters them explicitly.
    """
    hashed = stream.withColumn("__th", h64(text_col))
    with_text = dedup_stream_exact(
        hashed.where(F.col("__th").isNotNull()),
        ["__th"],
        ts_col=ts_col,
        watermark=watermark,
    )
    null_text = hashed.where(F.col("__th").isNull())
    return with_text.unionByName(null_text).drop("__th")


def _hadoop_fs(spark, path_str: str):
    """(FileSystem, Path) for ``path_str`` via the session's Hadoop
    conf — works for any scheme (file://, hdfs://, s3a://), unlike
    ``os.path``, which silently answers False for non-local URIs."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path


def _fs_exists(spark, path_str: str) -> bool:
    fs, path = _hadoop_fs(spark, path_str)
    return bool(fs.exists(path))


def _fs_has_parquet(spark, dir_str: str) -> bool:
    fs, path = _hadoop_fs(spark, dir_str)
    if not fs.exists(path):
        return False
    for status in fs.listStatus(path):
        if status.getPath().getName().endswith(".parquet"):
            return True
    return False


def run_index_dedup_stream(
    stream: DataFrame,
    out_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
):
    """UNBOUNDED-horizon streaming dedup: every micro-batch is deduped
    against the PERSISTENT on-disk hash index (the batch
    ``operators/dedup.py::dedup_append`` inside ``foreachBatch``), so a
    document seen months ago is still dropped today — the case the
    watermark-bounded variants above cannot express, because state-
    store state must stay bounded while an index on storage need not.

    ``checkpoint_dir`` is REQUIRED, not optional: the retry-idempotency
    skip below keys on the micro-batch id, and batch ids are durable
    only through the streaming checkpoint. Without one, Spark restarts
    numbering at 0 on every invocation and a second run's batch 0
    would be silently skipped as "already committed" — data loss, not
    a tuning knob.

    Per micro-batch: survivors (new within the batch AND vs the index)
    land in ``out_dir/batch=<id>/`` and their hashes append to the
    index. Delivery contract (documented, honest): batch output is
    idempotent under foreachBatch retries (a batch dir that already
    committed is skipped — rerunning after a crash cannot shrink it by
    seeing its own hashes in the index); the index append commits
    AFTER the output, so a crash between the two re-admits those
    hashes' duplicates later — at-least-once, the same contract as the
    reference's Kinesis consumer (SURVEY U3). Exactly-once needs a
    transactional table format for the (output, index) pair.

    All existence checks go through the Hadoop FileSystem API, so the
    contract holds on object storage (s3a://, hdfs://) exactly as on
    local paths — ``os.path`` would answer False for every non-local
    URI and silently disable cross-batch dedup.

    100 TB: each micro-batch pays O(batch) work — the index rides the
    anti-join as bare 8-byte hashes and never rescans the corpus; for
    the standing deployment, persist the index bucketed
    (``build_text_hash_index_bucketed``) or front it with the Bloom
    bitmap (``dedup_append_bloom``) and swap the call below.
    """
    if not checkpoint_dir:
        raise ValueError(
            "run_index_dedup_stream requires a durable checkpoint_dir: "
            "batch-id-based retry idempotency is only safe when batch "
            "ids survive restarts"
        )

    from ..operators.dedup import dedup_append

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_out = out_dir.rstrip("/") + f"/batch={batch_id}"
        if _fs_exists(spark, batch_out + "/_SUCCESS"):
            # Retried batch whose output already committed. The INDEX
            # append may still be missing (crash between output commit
            # and index append) — returning outright would make that
            # hole PERMANENT, re-admitting this batch's documents'
            # duplicates forever. Repair: re-append exactly the
            # committed survivors' hashes that the index lacks
            # (O(batch) anti-join; a no-op when the append did land).
            committed = spark.read.parquet(batch_out).select("text_hash")
            if _fs_has_parquet(spark, index_dir):
                missing = committed.join(
                    spark.read.parquet(index_dir).select("text_hash"),
                    on="text_hash",
                    how="left_anti",
                )
            else:
                missing = committed
            missing.write.mode("append").parquet(index_dir)
            return
        if _fs_has_parquet(spark, index_dir):
            index = spark.read.parquet(index_dir).select("text_hash")
        else:
            index = spark.createDataFrame([], "text_hash long")
        fresh = dedup_append(
            index, batch_df, text_col=text_col, id_col=id_col
        )
        # survivors carry (id, hash); persist both, then append hashes
        fresh.persist()
        try:
            fresh.write.mode("overwrite").parquet(batch_out)
            fresh.select("text_hash").write.mode("append").parquet(index_dir)
        finally:
            fresh.unpersist()

    writer = (
        stream.writeStream.foreachBatch(_process)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_index_lsh_stream(
    stream: DataFrame,
    out_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
    available_now: bool = True,
    broadcast_batch: bool = True,
):
    """Unbounded-horizon streaming NEAR-dup discovery: the LSH twin of
    :func:`run_index_dedup_stream`. Every micro-batch runs
    ``operators/dedup.py::lsh_append_candidates`` against the
    PERSISTENT on-disk band index, so a near-duplicate of a document
    ingested months ago is still surfaced today with O(batch) SHUFFLE
    work — the index never shuffles (with ``broadcast_batch=True`` the
    batch's band rows broadcast to the index scan). Per-batch I/O is
    still O(index): each micro-batch re-reads the band index as the
    join's probe target, which at multi-TB index sizes dominates the
    batch cost — partition/sort the index by ``bhash`` range and rely
    on scan pruning, or lengthen the trigger interval, when the index
    outgrows the batch by orders of magnitude.

    ``broadcast_batch`` follows :func:`lsh_append_candidates`: keep
    the default for the standing small-batch regime; pass ``False``
    for an ``availableNow`` backfill whose first micro-batch is
    corpus-sized (broadcasting its band rows would OOM the driver) —
    both sides then shuffle once on ``(band, bhash)``.

    Per micro-batch, TWO artifacts land under ``out_dir/batch=<id>/``:

    * ``pairs/`` — the candidate ``(doc_a, doc_b)`` pairs this batch
      introduces (batch-vs-corpus + within-batch). CANDIDATES, not
      verdicts: exact Jaccard verification needs both documents'
      texts, which the band index deliberately does not carry — a
      downstream batch stage joins the doc store and runs
      ``jaccard_verify_pairs`` on this (small) pair stream.
    * ``bands/`` — the batch's own band rows, appended to
      ``index_dir`` after the output commits.

    Delivery contract: identical to :func:`run_index_dedup_stream`
    (at-least-once; batch-id idempotent output via the REQUIRED
    durable checkpoint; index-append-after-output with retry-time
    repair — a committed batch whose band append was lost re-appends
    exactly the missing ``(doc_id, band)`` rows). All existence
    checks via the Hadoop FS API (object-storage-safe).
    """
    if not checkpoint_dir:
        raise ValueError(
            "run_index_lsh_stream requires a durable checkpoint_dir: "
            "batch-id-based retry idempotency is only safe when batch "
            "ids survive restarts"
        )

    from ..operators.dedup import (
        band_rows,
        lsh_append_candidates,
        minhash_signatures,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_out = out_dir.rstrip("/") + f"/batch={batch_id}"
        bands_out = batch_out + "/bands"
        pairs_out = batch_out + "/pairs"
        if _fs_exists(spark, batch_out + "/_SUCCESS"):
            # Retried batch whose output committed: repair a possibly
            # lost index append by re-appending exactly the committed
            # band rows the index lacks (keyed (doc_id, band) — a
            # no-op when the append landed).
            committed = spark.read.parquet(bands_out)
            if _fs_has_parquet(spark, index_dir):
                missing = committed.join(
                    spark.read.parquet(index_dir),
                    on=[id_col, "band", "bhash"],
                    how="left_anti",
                )
            else:
                missing = committed
            missing.write.mode("append").parquet(index_dir)
            return
        batch_bands = band_rows(
            minhash_signatures(batch_df, text_col, id_col, num_hashes),
            id_col,
            bands,
            rows_per_band,
        )
        if _fs_has_parquet(spark, index_dir):
            index = spark.read.parquet(index_dir)
        else:
            # empty-index bootstrap: derive the schema from the batch's
            # own band rows so string/binary doc ids work unchanged (a
            # hardcoded `long` DDL would mistype the first micro-batch)
            index = batch_bands.limit(0)
        pairs = lsh_append_candidates(
            index,
            batch_df,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            bands=bands,
            rows_per_band=rows_per_band,
            broadcast_batch=broadcast_batch,
        )
        pairs.write.mode("overwrite").parquet(pairs_out)
        batch_bands.write.mode("overwrite").parquet(bands_out)
        # the batch dir's OWN _SUCCESS commits last: both sub-outputs
        # are durably in place before a retry could skip this batch
        _touch_success(spark, batch_out)
        # index append after output commit (at-least-once; the retry
        # branch repairs a crash landing between these two writes) —
        # read back the committed bands rather than recomputing, so
        # the index holds exactly what the batch dir holds
        spark.read.parquet(bands_out).write.mode("append").parquet(index_dir)

    writer = (
        stream.writeStream.foreachBatch(_process)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _touch_success(spark, dir_str: str) -> None:
    """Create ``dir_str/_SUCCESS`` via the Hadoop FS API (the batch
    dir's commit marker when its outputs are written as sub-dirs)."""
    fs, path = _hadoop_fs(spark, dir_str.rstrip("/") + "/_SUCCESS")
    out = fs.create(path, True)
    out.close()


def run_index_hamming_stream(
    stream: DataFrame,
    out_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    hash_col: str = "fp",
    max_hamming: int = 3,
    bands: int = 4,
    n_bits: int = 64,
    available_now: bool = True,
    broadcast_batch: bool = True,
):
    """Unbounded-horizon streaming FINGERPRINT near-dup discovery: the
    hamming-distance twin of :func:`run_index_lsh_stream` for
    fixed-width bit signatures — perceptual image hashes from
    ``operators/multimodal.py::perceptual_hashes`` (continuous image
    ingestion dedup), SimHash values, any
    ``operators/dedup.py::hamming_near_dup_pairs`` input. The stream
    carries ``(id_col, hash_col)`` rows (hash the payloads upstream —
    ``mapInPandas`` works on streams); each micro-batch probes the
    PERSISTENT on-disk fingerprint index, so a near-duplicate of an
    image ingested months ago is still surfaced today.

    Per micro-batch, under ``out_dir/batch=<id>/``:

    * ``pairs/`` — verified ``(doc_a, doc_b, hamming)`` pairs the
      batch introduces (batch-vs-index + within-batch), popcount
      ``<= max_hamming``. Unlike the LSH stream's Jaccard candidates
      these are final VERDICTS: the fingerprint itself rides the
      index, so verification happens in-stream.
    * ``fps/`` — the batch's ``(id, fingerprint)`` rows, appended to
      ``index_dir`` after the output commits.

    Every pair is discovered exactly once — when its later member's
    batch arrives — so the union of per-batch pair outputs equals the
    one-shot batch :func:`~..operators.dedup.hamming_near_dup_pairs`
    run over the whole corpus (the registered oracle states exactly
    that). NULL fingerprints pass through to neither output (they can
    collide with nothing).

    Plan: band values derive scan-side from the 16-byte fingerprints
    on BOTH sides at probe time (the index stores raw fingerprints,
    never band rows — bands are a pure function of the fingerprint,
    so persisting them would triple index bytes for no replay
    benefit); with ``broadcast_batch=True`` the batch's band rows
    broadcast to the index scan and the index never shuffles. Per-
    batch I/O is O(index) — same honest caveat as the LSH stream.
    Delivery contract identical to :func:`run_index_dedup_stream`:
    at-least-once, batch-id idempotent output via the REQUIRED
    durable checkpoint, index-append-after-output with retry-time
    repair, Hadoop-FS existence checks throughout.
    """
    if not checkpoint_dir:
        raise ValueError(
            "run_index_hamming_stream requires a durable checkpoint_dir: "
            "batch-id-based retry idempotency is only safe when batch "
            "ids survive restarts"
        )

    from ..operators.dedup import (
        _hamming_band_width,
        hamming_band_rows,
        hamming_near_dup_pairs,
    )

    width = _hamming_band_width(bands, n_bits)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_out = out_dir.rstrip("/") + f"/batch={batch_id}"
        fps_out = batch_out + "/fps"
        pairs_out = batch_out + "/pairs"
        batch_fp = batch_df.select(id_col, hash_col).where(
            F.col(hash_col).isNotNull()
        )
        if _fs_exists(spark, batch_out + "/_SUCCESS"):
            # retried batch whose output committed: repair a possibly
            # lost index append (keyed (id, fingerprint) — a no-op
            # when the append landed)
            committed = spark.read.parquet(fps_out)
            if _fs_has_parquet(spark, index_dir):
                missing = committed.join(
                    spark.read.parquet(index_dir),
                    on=[id_col, hash_col],
                    how="left_anti",
                )
            else:
                missing = committed
            missing.write.mode("append").parquet(index_dir)
            return
        if _fs_has_parquet(spark, index_dir):
            index = spark.read.parquet(index_dir)
        else:
            index = batch_fp.limit(0)
        batch_bands = hamming_band_rows(batch_fp, id_col, hash_col, bands, width)
        probe = F.broadcast(batch_bands) if broadcast_batch else batch_bands
        index_bands = hamming_band_rows(index, id_col, hash_col, bands, width)
        cross = (
            index_bands.alias("a")
            .join(
                probe.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bv") == F.col("b.bv"))
                & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
            )
            .select(
                F.least(
                    F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
                ).alias("doc_a"),
                F.greatest(
                    F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
                ).alias("doc_b"),
                F.expr(
                    f"cast(bit_count(a.{hash_col} ^ b.{hash_col}) as int)"
                ).alias("hamming"),
            )
            .where(F.col("hamming") <= max_hamming)
            .distinct()
        )
        within = hamming_near_dup_pairs(
            batch_fp,
            id_col=id_col,
            hash_col=hash_col,
            max_hamming=max_hamming,
            bands=bands,
            n_bits=n_bits,
        )
        pairs = cross.unionByName(within).distinct()
        pairs.write.mode("overwrite").parquet(pairs_out)
        batch_fp.write.mode("overwrite").parquet(fps_out)
        _touch_success(spark, batch_out)
        # index append after output commit (at-least-once; the retry
        # branch repairs a crash between these writes)
        spark.read.parquet(fps_out).write.mode("append").parquet(index_dir)

    writer = (
        stream.writeStream.foreachBatch(_process)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _committed_batches(spark, out_dir: str) -> list:
    """Batch ids under ``out_dir/batch=<id>/`` whose ``_SUCCESS``
    marker exists, ascending."""
    fs, path = _hadoop_fs(spark, out_dir)
    if not fs.exists(path):
        return []
    ids = []
    for status in fs.listStatus(path):
        name = status.getPath().getName()
        if name.startswith("batch="):
            try:
                bid = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if _fs_exists(spark, f"{out_dir.rstrip('/')}/{name}/_SUCCESS"):
                ids.append(bid)
    return sorted(ids)


def run_cluster_maintain_stream(
    stream: DataFrame,
    out_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    hash_col: str = "fp",
    max_hamming: int = 3,
    bands: int = 4,
    n_bits: int = 64,
    available_now: bool = True,
    broadcast_batch: bool = True,
):
    """Standing near-dup CLUSTER maintenance — the full streaming dedup
    lifecycle in one runner: per micro-batch, discover the edges the
    batch introduces (batch-vs-persistent-fingerprint-index, verified
    popcount, plus within-batch SPARSE edges via
    ``operators/dedup.py::hamming_near_dup_edges``), then fold them
    into the persisted label table with
    ``operators/dedup.py::clusters_append`` — only clusters the batch
    touches are re-labelled; the rest of the corpus never enters the
    iterative loop.

    Per micro-batch, under ``out_dir/batch=<id>/``:

    * ``labels/`` — the FULL corpus labels after this batch
      (``doc_id, cluster_id, cluster_size, is_canonical``). The latest
      committed batch's ``labels/`` is the current state — exactly
      what a from-scratch ``near_dup_clusters`` over all documents
      seen so far and all their near-dup edges would emit (the gated
      oracle states that for the final batch).
    * ``fps/`` — the batch's non-NULL ``(id, fingerprint)`` rows,
      appended to ``index_dir`` after the output commits.

    Exactness by induction over batches: the discovery stage emits
    every verified edge with an endpoint in the batch (pigeonhole-
    complete banding on both probe directions), and
    ``clusters_append`` is exact given labels that were exact after
    the previous batch. NULL-fingerprint docs join the label table as
    singletons (they can near-duplicate nothing); NULL-id rows ride
    through as NULL-cluster rows, the ``near_dup_clusters`` rule.

    Delivery contract identical to :func:`run_index_hamming_stream`:
    at-least-once, batch-id idempotent via the REQUIRED durable
    checkpoint (a retried committed batch only repairs the index
    append), index-append-after-output-commit. Prior labels are read
    from the LATEST COMMITTED batch dir, so a crash between label
    write and _SUCCESS re-runs the batch against the previous
    consistent state.
    """
    if not checkpoint_dir:
        raise ValueError(
            "run_cluster_maintain_stream requires a durable "
            "checkpoint_dir: batch-id-based retry idempotency is only "
            "safe when batch ids survive restarts"
        )

    from ..operators.dedup import (
        _hamming_band_width,
        clusters_append,
        hamming_band_rows,
        hamming_near_dup_edges,
    )

    width = _hamming_band_width(bands, n_bits)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        base = out_dir.rstrip("/")
        batch_out = base + f"/batch={batch_id}"
        labels_out = batch_out + "/labels"
        fps_out = batch_out + "/fps"
        edge_fp = batch_df.select(id_col, hash_col).where(
            F.col(hash_col).isNotNull() & F.col(id_col).isNotNull()
        )
        if _fs_exists(spark, batch_out + "/_SUCCESS"):
            committed = spark.read.parquet(fps_out)
            if _fs_has_parquet(spark, index_dir):
                missing = committed.join(
                    spark.read.parquet(index_dir),
                    on=[id_col, hash_col],
                    how="left_anti",
                )
            else:
                missing = committed
            missing.write.mode("append").parquet(index_dir)
            return
        prior_ids = [b for b in _committed_batches(spark, base) if b < batch_id]
        if prior_ids:
            prior = spark.read.parquet(
                base + f"/batch={prior_ids[-1]}/labels"
            ).select(id_col, "cluster_id")
        else:
            prior = (
                batch_df.select(id_col)
                .limit(0)
                .withColumn("cluster_id", F.col(id_col))
            )
        if _fs_has_parquet(spark, index_dir):
            index = spark.read.parquet(index_dir)
        else:
            index = edge_fp.limit(0)
        batch_bands = hamming_band_rows(edge_fp, id_col, hash_col, bands, width)
        probe = F.broadcast(batch_bands) if broadcast_batch else batch_bands
        index_bands = hamming_band_rows(index, id_col, hash_col, bands, width)
        cross = (
            index_bands.alias("a")
            .join(
                probe.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bv") == F.col("b.bv"))
                & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
            )
            .select(
                F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias(
                    "doc_a"
                ),
                F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias(
                    "doc_b"
                ),
                F.expr(
                    f"cast(bit_count(a.{hash_col} ^ b.{hash_col}) as int)"
                ).alias("hamming"),
            )
            .where(F.col("hamming") <= max_hamming)
            .distinct()
        )
        within = hamming_near_dup_edges(
            edge_fp,
            id_col=id_col,
            hash_col=hash_col,
            max_hamming=max_hamming,
            bands=bands,
            n_bits=n_bits,
        )
        edges = cross.select("doc_a", "doc_b").unionByName(
            within.select("doc_a", "doc_b")
        )
        labels = clusters_append(
            prior, batch_df.select(id_col), edges, id_col=id_col
        )
        labels.write.mode("overwrite").parquet(labels_out)
        edge_fp.write.mode("overwrite").parquet(fps_out)
        _touch_success(spark, batch_out)
        spark.read.parquet(fps_out).write.mode("append").parquet(index_dir)

    writer = (
        stream.writeStream.foreachBatch(_process)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
