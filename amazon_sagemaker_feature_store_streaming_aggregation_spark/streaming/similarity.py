"""Streaming EMBEDDING index maintenance — the semantic member of the
standing near-dup index family (``streaming/dedup.py`` holds the
exact/MinHash-LSH/SimHash-hamming members).

``run_index_embedding_stream`` keeps a persistent CELL-KEYED vector
index on disk and, per micro-batch, surfaces every semantic near-dup
pair the batch introduces: batch vectors are assigned to Voronoi
cells around a FIXED centroid table (trained offline in production —
``operators/similarity.py::train_ivf_centroids``; seeded deterministic
in the gated replay), probed against ONLY the index cells the batch
touches, and exactly cosine-verified — the streaming twin of
``operators/similarity.py::semantic_dedup_pairs`` exactly as the
hamming stream twins ``hamming_near_dup_pairs``.

The index layout is the scale improvement over the older streams'
honest O(index) probe caveat: rows persist PARTITIONED BY CELL
(``index_dir/cell=<c>/``), and the per-batch probe filters on the
batch's own cell list (collected driver-side — bounded by
min(batch size, n_cells) ints), so partition pruning reads only the
touched cells: per-batch I/O is O(batch + touched cells), not
O(corpus). Quantized coordinates and squared norms ride the index so
probes never re-read or re-quantize raw vectors.

Reference anchor: the same store-probe-append lifecycle as the
reference's streaming feature ingestion (`src/lambda/
StreamingIngestAggFeatures/lambda_function.py:25-32` — each event
reads and updates only its keys' records); cells play the role of
keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (
    _assert_modulus_unchanged,
    _fs_exists,
    _fs_has_parquet_recursive,
    _keyed_fan,
    _run_independent,
    _touch_success,
)
from .forget import apply_index_tombstones


def run_index_embedding_stream(
    stream: DataFrame,
    out_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    centroids_dir: str,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
    broadcast_batch: bool = True,
    materialize_input: bool = False,
    extra_cols: tuple = (),
):
    """Standing semantic near-dup discovery over an embedding stream.

    ``extra_cols`` names stream METADATA columns (e.g. ``label``,
    ``lang``, ``source``) persisted alongside each index row — the
    filtered-search contract: :func:`probe_embedding_index` can then
    push a metadata predicate INTO the pruned ``cell=`` scan
    (``PushedFilters``) instead of ranking and discarding. They ride
    the batch artifact, the retry repair, compaction and re-cell
    unchanged (all row-preserving for non-layout columns).

    ``materialize_input=True`` localCheckpoints each micro-batch BEFORE
    the cell assignment — required when the vector column is DERIVED by
    an interpreted higher-order expression (embed_text_hashed: Catalyst
    inlines the fold into every downstream reference, so the assignment
    cosine would re-run it per (row, centroid) pair). A stream reading
    stored vectors keeps the default (one extra materialization buys
    nothing there).

    Per micro-batch, under ``out_dir/batch=<id>/``:

    * ``pairs/`` — exact-cosine-verified ``(id_a, id_b, cosine)``
      pairs the batch introduces (batch-vs-index within shared cells +
      within-batch via the batch operator), cosine >= ``threshold``,
      ``id_a < id_b``. Final verdicts, not candidates — the quantized
      vectors ride the index, so verification happens in-stream.
    * ``vecs/`` — the batch's ``(id, cell, qv, n2)`` rows, appended to
      the cell-partitioned ``index_dir`` after the output commits.

    Every pair is discovered exactly once — when its later member's
    batch arrives — and assignment uses the same fixed centroids the
    batch operator would, so the union of per-batch pair outputs
    equals the one-shot ``semantic_dedup_pairs(corpus,
    centroids=...)`` run (the registered oracle states exactly that).
    Discovery-once holds under at-least-once SOURCE redelivery too: a
    batch id already present in the index is recognized (anti-join,
    pruned to the batch's cells) and routed AROUND discovery and the
    index append — its pairs were emitted when it first arrived, and
    re-probing it would duplicate them and double the index. Zero-norm
    vectors and NULL ids/vectors index nothing and pair with nothing
    (cosine undefined / the engine-wide null-unsafe rule). With
    redelivered ids excluded, cross (new-vs-index) and within
    (new-vs-new) are disjoint by construction — no dedup pass needed
    (the hamming stream needs one because bands collide per-pair many
    times).

    Delivery contract identical to ``run_index_hamming_stream``:
    at-least-once, batch-id idempotent via the REQUIRED durable
    checkpoint (a retried committed batch only repairs the index
    append, pruned to the batch's own cells), index-append-after-
    output-commit, ``_SUCCESS``-gated visibility.

    Per-trigger cost discipline (the standing-runner rule, shared with
    ``streaming/dedup.py``): the centroid table is read ONCE per
    runner and cached (it is vocab-scale and probed every trigger);
    the batch's assigned rows are eagerly ``localCheckpoint``-ed so
    the cells collect, the probe, the within-batch pairs, the batch
    artifact AND the index append all start from a flat ``LogicalRDD``
    instead of re-analyzing the assignment lineage per action (the
    measured fixed cost at micro-batch scale is Catalyst re-analysis
    and job count, not I/O); within-batch pairs come from a self-join
    of those SAME rows (cell-keyed, the exact ``_score_pairs`` cosine
    expression — integer dot products and IEEE multiplies are
    symmetric, so the values are bit-identical to the batch
    operator's); and the append writes from the checkpointed rows the
    batch artifact was written from, so the index holds exactly what
    the batch dir holds without re-reading it. Checkpoint blocks are
    batch-sized and freed by the ContextCleaner when the batch's
    frames go unreachable; an executor loss mid-batch fails the
    trigger and the retry branch heals, the same at-least-once
    contract as before.
    """
    if not checkpoint_dir:
        raise ValueError(
            "run_index_embedding_stream requires a durable checkpoint_dir: "
            "batch-id-based retry idempotency is only safe when batch "
            "ids survive restarts"
        )

    from ..operators.similarity import _dot, _ivf_assign, quantize

    _resolved: dict = {}

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if materialize_input:
            batch_df = batch_df.localCheckpoint(eager=False)
        batch_out = out_dir.rstrip("/") + f"/batch={batch_id}"
        vecs_out = batch_out + "/vecs"
        pairs_out = batch_out + "/pairs"
        # per-batch: one driver-side listStatus of the index _meta — a
        # recell_embedding_index between triggers is ADOPTED (fresh
        # centroids + cleared layout memos); pre-recell indexes have
        # no _meta (stable None signature, zero extra cost)
        from .dedup import _meta_signature

        if (
            "cents" not in _resolved
            or _meta_signature(spark, index_dir)
            != _resolved.get("cents_meta_sig")
        ):
            if "cents" in _resolved:
                _resolved["cents"].unpersist()
                _resolved.clear()
            # another (dead) runner may still hold a persist() over
            # these paths — refresh so THIS read sees the disk truth,
            # not a plan-matched stale cache entry
            spark.catalog.refreshByPath(index_dir)
            spark.catalog.refreshByPath(centroids_dir)
            heal_centroid_layout(spark, index_dir, centroids_dir)
            _resolved["cents"] = spark.read.parquet(centroids_dir).persist()
            _resolved["cents_meta_sig"] = _meta_signature(spark, index_dir)
        cents = _resolved["cents"]
        if _fs_exists(spark, batch_out + "/_SUCCESS"):
            # retried committed batch: repair a possibly lost index
            # append. The batch artifact's stored cell column was
            # assigned under whatever centroids were live at commit
            # time — if recell_embedding_index ran inside the crash
            # window (after the output commit, before this retry), the
            # freshly adopted signature above would pass the
            # _assert_modulus_unchanged guard while the artifact's
            # cells still describe the OLD layout, landing rows in
            # wrong cell= dirs where pruned probes never look (silent
            # duplicate readmission). So the cells are RE-ASSIGNED here
            # against the currently resolved centroids — the exact
            # _ivf_assign argmax (cos desc, cell tie-break) over the
            # stored quantized coords, bit-identical to the original
            # assignment when no recell intervened.
            from pyspark.sql import Window

            w = Window.partitionBy(id_col).orderBy(
                F.col("__cos").desc(), F.col("cell")
            )
            committed = (
                spark.read.parquet(vecs_out)
                .select(id_col, "qv", "n2", *extra_cols)
                .join(F.broadcast(cents.where(F.col("cn2") > 0)))
                .withColumn(
                    "__cos",
                    F.expr(_dot("qv", "cq")).cast("double")
                    / (
                        F.sqrt(F.col("n2").cast("double"))
                        * F.sqrt(F.col("cn2").cast("double"))
                    ),
                )
                .withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1)
                .select(id_col, "cell", "qv", "n2", *extra_cols)
                .localCheckpoint(eager=False)
            )
            cells = [r[0] for r in committed.select("cell").distinct().collect()]
            if cells and _fs_has_parquet_recursive(spark, index_dir):
                idx = apply_index_tombstones(
                    spark,
                    index_dir,
                    spark.read.parquet(index_dir).where(
                        F.col("cell").isin(cells)
                    ),
                )
                missing = committed.join(
                    idx.select(id_col, "cell"), on=[id_col, "cell"],
                    how="left_anti",
                )
            else:
                missing = committed
            _assert_modulus_unchanged(
                spark, index_dir, _resolved, key="cents"
            )
            # pending tombstones filter the repair too: re-appending a
            # suppressed row would undo its (possibly already physical)
            # erasure — the _append_index rule
            (
                apply_index_tombstones(spark, index_dir, missing)
                .repartition(F.col("cell"))
                .write.mode("append")
                .partitionBy("cell")
                .parquet(index_dir)
            )
            return
        feats = (
            batch_df.select(
                F.col(id_col), quantize(vec_col, "qv"),
                *[F.col(c) for c in extra_cols],
            )
            .where(F.col(id_col).isNotNull())
            .withColumn("n2", F.expr(_dot("qv", "qv")))
            .where(F.col("n2") > 0)
        )
        assign = _ivf_assign(batch_df, cents, 1, id_col, vec_col, id_col)
        # lazy checkpoint: ONE action runs the assignment — the cells
        # collect below (or, on a cold index, the first batch write)
        # materializes it; every later action (anti-join, probe, two
        # writes, append) starts from the materialized rows with a
        # flat plan and no dedicated checkpoint job is spent
        all_rows = assign.join(feats, id_col).select(
            id_col, "cell", "qv", "n2", *extra_cols
        ).localCheckpoint(eager=False)
        # index-nonempty memo: after this runner's first append the
        # answer can never go back to False — skip the recursive FS
        # walk (and, on a cold empty index, the cells collect too)
        if not _resolved.get("nonempty"):
            _resolved["nonempty"] = _fs_has_parquet_recursive(
                spark, index_dir
            )
        if _resolved["nonempty"]:
            cells = [
                r[0] for r in all_rows.select("cell").distinct().collect()
            ]
        else:
            cells = []
        if cells:
            # pending erasure tombstones anti-join the probe (the
            # _read_index_pruned rule): a forgotten vector stops
            # pairing at the next trigger, pre-purge
            idx = apply_index_tombstones(
                spark,
                index_dir,
                spark.read.parquet(index_dir).where(
                    F.col("cell").isin(cells)
                ),
            )
            # redelivered ids (already indexed) are routed around
            # discovery AND the append — their pairs already emitted
            batch_rows = all_rows.join(
                idx.select(id_col), id_col, "left_anti"
            ).localCheckpoint(eager=False)
        else:
            # cold index: nothing can be redelivered — skip the
            # anti-join checkpoint (all_rows is already materialized)
            idx = all_rows.limit(0)
            batch_rows = all_rows
        probe = F.broadcast(batch_rows) if broadcast_batch else batch_rows

        def _cos(na: str, nb: str) -> "F.Column":
            # the _score_pairs op order; integer dot and IEEE multiply
            # are symmetric, so operand order cannot perturb the value
            return (
                F.expr(_dot(f"{na}.qv", f"{nb}.qv")).cast("double")
                / (
                    F.sqrt(F.col(f"{na}.n2").cast("double"))
                    * F.sqrt(F.col(f"{nb}.n2").cast("double"))
                )
            )

        cross = None
        if cells:
            cross = (
                idx.alias("a")
                .join(
                    probe.alias("b"),
                    (F.col("a.cell") == F.col("b.cell"))
                    & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
                )
                .select(
                    F.least(
                        F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
                    ).alias("id_a"),
                    F.greatest(
                        F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
                    ).alias("id_b"),
                    _cos("a", "b").alias("cosine"),
                )
                .where(F.col("cosine") >= F.lit(threshold))
            )
        # within-batch pairs straight off the checkpointed rows: the
        # same candidate set semantic_dedup_pairs(batch subset,
        # centroids=cents) generates (one cell per id, within-cell
        # pairs, id_a < id_b) and the same _score_pairs cosine — but
        # with NO second assignment pass and NO re-join of the raw
        # embedding table
        within = (
            batch_rows.alias("a")
            .join(
                batch_rows.alias("b"),
                (F.col("a.cell") == F.col("b.cell"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                _cos("a", "b").alias("cosine"),
            )
            .where(F.col("cosine") >= F.lit(threshold))
        )
        pairs = within if cross is None else cross.unionByName(within)
        # order-free sub-artifacts (visibility gated on the _SUCCESS
        # written after both) — overlap the pair discovery with the
        # trivial vecs write
        _run_independent(
            lambda: pairs.write.mode("overwrite").parquet(pairs_out),
            lambda: batch_rows.write.mode("overwrite").parquet(vecs_out),
        )
        _touch_success(spark, batch_out)
        # index append from the SAME checkpointed rows the batch
        # artifact was written from (no read-back), with one pre-write
        # shuffle keyed on the partition column: without it every task
        # writes a file into every cell dir (tasks x cells small files)
        _assert_modulus_unchanged(spark, index_dir, _resolved, key="cents")
        # small-batch regime (broadcast_batch, the same flag gating the
        # probe broadcast): keyed fan — still exactly one file per
        # touched cell, but the ~n_cells per-file writer costs pay in
        # parallel instead of one serial task (see _keyed_fan); corpus-
        # sized backfills keep the cell-keyed repartition. Pending
        # tombstones filter the append (the _append_index rule: a
        # suppressed key never re-enters the index while its erasure is
        # in flight).
        appendable = apply_index_tombstones(spark, index_dir, batch_rows)
        pre = (
            _keyed_fan(appendable, "cell") if broadcast_batch
            else appendable.repartition(F.col("cell"))
        )
        (
            pre.write.mode("append")
            .partitionBy("cell")
            .parquet(index_dir)
        )
        # the memo deliberately stays un-forced here: a fully
        # redelivered batch appends zero rows, and trusting "we
        # appended" would point the next trigger's pruned read at a
        # parquet-less dir. While the index is empty the walk is
        # O(empty dir); the first True answer memoizes forever.

    writer = (
        stream.writeStream.foreachBatch(_process)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_embedding_index(
    spark,
    index_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> dict:
    """Per-cell small-file compaction of the vector index: every
    micro-batch appends ~one file per touched cell, so a standing
    stream accumulates O(batches) files per hot cell — metadata
    pressure that eventually dominates probe time. This rewrites each
    ``cell=<c>/`` leaf to ~``target_bytes`` files via
    ``sinks/compaction.py::compact_parquet_dir`` (atomic two-step
    swap, rows untouched) — per LEAF, so the job parallelizes across
    cells and never rewrites the whole index, and partition pruning
    semantics are unchanged (the ``cell`` value lives in the dir name,
    not the files). Same caveat as the underlying helper: run
    quiesced or from the runner that owns the index, between batches.
    Returns ``{cell: resulting file count}`` for the leaves visited.

    Works on any URI scheme Spark can write: the underlying
    ``compact_parquet_dir`` measures and swaps through the Hadoop
    FileSystem API (the ``compact_cluster_store`` pattern) — which
    matters here most, because the standing-stream small-file problem
    this solves is worst exactly on object storage. There the swap is
    the connector's copy+delete (see ``compact_parquet_dir``'s
    consistency note); table formats (Delta OPTIMIZE, Iceberg
    rewrite_data_files) remain the managed alternative.
    """
    from ..sinks.compaction import compact_parquet_dir, heal_swap_leftovers
    from .dedup import _list_partition_ids
    from .forget import purge_forgotten

    base = index_dir.rstrip("/")
    # heal interrupted prior swaps first — a vanished leaf is named
    # only by its hidden leftover, not the cell listing
    heal_swap_leftovers(spark, base)
    # physically complete any amortized erasure before sizing leaves
    # (the compact_banded_index rule)
    purge_forgotten(spark, base, "cell")
    out: dict = {}
    for cell in _list_partition_ids(
        spark, base, "cell", require_success=False
    ):
        out[cell] = compact_parquet_dir(
            spark,
            f"{base}/cell={cell}",
            target_bytes=target_bytes,
            min_files=min_files,
        )
    return out


def _read_centroid_version(spark, store_dir: str) -> str | None:
    """The ``centroid_version`` pinned in ``<store>/_meta`` (one tiny
    parquet row), or None for a pre-recell layout (no meta)."""
    from .dedup import _fs_has_parquet

    meta = store_dir.rstrip("/") + "/_meta"
    if not _fs_has_parquet(spark, meta):
        return None
    return str(spark.read.parquet(meta).collect()[0]["centroid_version"])


def _write_centroid_meta(spark, dir_str: str, version: str, n_cells: int):
    from ..session import local_rows

    local_rows(
        spark, [(version, int(n_cells))],
        "centroid_version string, n_cells int",
    ).coalesce(1).write.mode("overwrite").parquet(
        dir_str.rstrip("/") + "/_meta"
    )


def heal_centroid_layout(spark, index_dir: str, centroids_dir: str):
    """Resolve the one crash window :func:`recell_embedding_index`'s
    two-directory commit leaves: index root swapped to the new cell
    layout (its ``_meta`` names centroid version V2 and ``_centroids/``
    holds the V2 table) but ``centroids_dir`` still holds V1. Reading
    V1 centroids against a V2 layout would prune probes to the WRONG
    cells — silent duplicate readmission — so the runner calls this
    before (re)reading centroids: on version mismatch the centroids
    dir is restored from the index's own co-committed copy (an atomic
    staged swap; idempotent). Returns ``"restored"`` or None."""
    from ..sinks.compaction import _swap_names, heal_compaction_swap
    from .dedup import _fs_has_parquet, _hadoop_fs

    base = index_dir.rstrip("/")
    cbase = centroids_dir.rstrip("/")
    heal_compaction_swap(spark, cbase)
    iv = _read_centroid_version(spark, base)
    if iv is None:  # pre-recell layout: centroids_dir is authoritative
        return None
    if _read_centroid_version(spark, cbase) == iv:
        return None
    copy = base + "/_centroids"
    if not _fs_has_parquet(spark, copy):
        raise ValueError(
            f"index at {index_dir} pins centroid_version={iv} but holds "
            "no _centroids copy and the centroids dir disagrees — the "
            "layout cannot be trusted; re-run recell_embedding_index"
        )
    n_cells = int(spark.read.parquet(base + "/_meta").collect()[0]["n_cells"])
    _, staging, retired = _swap_names(cbase)
    fs, p = _hadoop_fs(spark, cbase)
    _, sp = _hadoop_fs(spark, staging)
    _, rp = _hadoop_fs(spark, retired)
    try:
        spark.read.parquet(copy).coalesce(1).write.parquet(staging)
        _write_centroid_meta(spark, staging, iv, n_cells)
        if fs.exists(p) and not fs.rename(p, rp):
            raise IOError(f"centroid heal failed: rename {cbase} away")
    except BaseException:
        fs.delete(sp, True)
        raise
    if not fs.rename(sp, p):
        fs.rename(rp, p)
        fs.delete(sp, True)
        raise IOError(f"centroid heal failed: rename staging into {cbase}")
    fs.delete(rp, True)
    # drop any cached relation over the swapped path: runners persist()
    # this table, and Spark's CacheManager plan-matches any NEW
    # read.parquet(same path) to the stale cached rows — without the
    # refresh, post-swap readers keep seeing the OLD table (the bug the
    # recell mid-replay test caught: a resumed runner assigned batch
    # vectors with pre-retrain centroids against the re-celled index)
    spark.catalog.refreshByPath(cbase)
    return "restored"


def recell_embedding_index(
    spark,
    index_dir: str,
    centroids_dir: str,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    seed: int = 7,
    max_iter: int = 10,
    sample_fraction: float | None = None,
) -> dict:
    """Retrain the standing vector index's centroids on its OWN
    vectors (sampled seeded k-means||) and atomically re-cell the
    layout — the centroid-lifecycle operation the r10 verdict named:
    a drifting corpus skews cell occupancy around stale centroids and
    erodes probe recall with no loud signal; periodic retraining is
    how IVF deployments stay healthy (the ``rebucket_banded_index``
    growth story applied to the semantic index).

    O(index) rewrite by nature, run as maintenance (the CLI's
    ``retrain-centroids``). Commit protocol: the new layout stages in
    a hidden sibling carrying BOTH the re-assigned ``cell=`` rows and
    its own centroid table (``_centroids/`` + ``_meta`` naming a
    content-derived ``centroid_version``), swaps in with the
    compaction two-rename, and only then does ``centroids_dir`` swap
    to the same version — every crash window either heals via
    ``heal_compaction_swap`` (index swap) or
    :func:`heal_centroid_layout` (the between-swaps window: the
    runner restores centroids from the index's co-committed copy).
    Live runners notice the flipped ``_meta`` per batch (the
    ``_resolve_live_modulus`` discipline) and adopt the new layout;
    a flip mid-batch fails the trigger loudly before the append.

    ``sample_fraction`` trains k-means on a deterministic md5-style
    sample (xxhash64 of the id — engine-internal, never crosses to an
    oracle) — the 100 TB path: centroid quality degrades gracefully
    with sampling, the re-assignment pass is always exact and full.
    Returns ``{"n_cells", "centroid_version", "n_rows"}``.
    """
    import hashlib

    from pyspark.sql import Window

    from ..operators.similarity import (
        QUANT,
        _dot,
        auto_cells,
        train_ivf_centroids,
    )
    from ..sinks.compaction import _swap_names, heal_compaction_swap
    from .dedup import _hadoop_fs

    base = index_dir.rstrip("/")
    cbase = centroids_dir.rstrip("/")
    heal_compaction_swap(spark, base)
    heal_centroid_layout(spark, base, cbase)
    if not _fs_has_parquet_recursive(spark, base):
        raise ValueError(
            f"embedding index at {index_dir} holds no vectors — nothing "
            "to retrain from (run the stream first)"
        )
    from .forget import apply_index_tombstones

    # pending erasure tombstones are APPLIED during the full rewrite
    # (the staging layout carries no _tombstones — the re-cell doubles
    # as their physical purge; without this the retrain would learn
    # from AND resurrect forgotten vectors)
    # every non-layout column survives the rewrite (the filtered-
    # search extra_cols ride the index rows; dropping them here would
    # silently break probe predicates after a re-cell)
    rows = apply_index_tombstones(
        spark, base, spark.read.parquet(base)
    ).drop("cell")
    extra = [c for c in rows.columns if c not in (id_col, "qv", "n2")]
    n_rows = rows.count()
    if n_cells is None:
        n_cells = auto_cells(n_rows)
    train_src = rows
    if sample_fraction is not None:
        if not 0.0 < sample_fraction <= 1.0:
            raise ValueError(
                f"sample_fraction must be in (0, 1], got {sample_fraction}"
            )
        train_src = rows.where(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(1_000_000))
            < int(sample_fraction * 1_000_000)
        )
    emb = train_src.select(
        F.expr(
            f"transform(qv, x -> cast(x as double) / {QUANT}.0)"
        ).alias("__emb")
    )
    cents = train_ivf_centroids(
        emb, n_cells, vec_col="__emb", seed=seed, max_iter=max_iter
    ).where(F.col("cn2") > 0)
    # content-derived version tag: n_cells rows collect driver-side
    # (bounded by the cell count, the same order as every centroid
    # broadcast in this module)
    crows = sorted(
        (int(r["cell"]), tuple(int(x) for x in r["cq"]))
        for r in cents.collect()
    )
    version = hashlib.md5(repr(crows).encode()).hexdigest()[:16]
    cents = cents.localCheckpoint()  # k-means lineage is NOT replayable

    # exact full re-assignment on the index's own quantized coords
    w = Window.partitionBy(id_col).orderBy(F.col("__cos").desc(), F.col("cell"))
    reassigned = (
        rows.join(F.broadcast(cents))
        .withColumn(
            "__cos",
            F.expr(_dot("qv", "cq")).cast("double")
            / (
                F.sqrt(F.col("n2").cast("double"))
                * F.sqrt(F.col("cn2").cast("double"))
            ),
        )
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(id_col, "cell", "qv", "n2", *extra)
    )

    _, staging, retired = _swap_names(base)
    fs, p = _hadoop_fs(spark, base)
    _, sp = _hadoop_fs(spark, staging)
    _, rp = _hadoop_fs(spark, retired)
    try:
        # meta + centroid copy first (the rebucket rule: a staging
        # whose root _SUCCESS exists — created by the rows write —
        # always carries its layout facts)
        _write_centroid_meta(spark, staging, version, n_cells)
        cents.select("cell", "cq", "cn2").coalesce(1).write.parquet(
            staging + "/_centroids"
        )
        (
            reassigned.repartition(F.col("cell"))
            .write.mode("append")  # staging already holds _meta/
            .partitionBy("cell")
            .parquet(staging)
        )
        if not fs.rename(p, rp):
            raise IOError(f"recell swap failed: rename {base} away")
    except BaseException:
        fs.delete(sp, True)
        raise
    if not fs.rename(sp, p):
        fs.rename(rp, p)
        fs.delete(sp, True)
        raise IOError(f"recell swap failed: rename staging into {base}")
    fs.delete(rp, True)
    spark.catalog.refreshByPath(base)  # invalidate cached plans/listings
    # second commit: the external centroids dir (crash before/inside
    # this swap is healed by heal_centroid_layout from _centroids).
    # "restored" is the usual outcome; None is ALSO success when the
    # rerun produced byte-identical centroids (no drift + same seed →
    # same content-derived version, so the heal sees matching versions
    # and does nothing). Anything else is a real commit failure — and
    # a real exception, not a bare assert (stripped under python -O).
    healed = heal_centroid_layout(spark, base, cbase)
    if healed != "restored" and _read_centroid_version(spark, cbase) != version:
        raise IOError(
            f"recell commit incomplete: centroids dir {cbase} does not "
            f"carry version {version} after heal (got "
            f"{_read_centroid_version(spark, cbase)})"
        )
    return {"n_cells": int(n_cells), "centroid_version": version,
            "n_rows": int(n_rows)}


def probe_embedding_index(
    spark,
    index_dir: str,
    centroids_dir: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    predicate=None,
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k similarity search SERVED from the standing cell index —
    the batch probe API of :func:`run_index_embedding_stream`'s store
    (the other half of the filtered-ANN surface next to the batch
    operators' ``predicate=``).

    Per call: queries assign to their ``nprobe`` nearest cells against
    the persisted centroid table (broadcast, vocab-scale), the index
    is read PRUNED to exactly those cells (``PartitionFilters`` on
    ``cell=`` — a driver-side list bounded by nprobe × queries), and
    ``predicate`` — a SQL string or Column over the index's
    ``extra_cols`` metadata — lands IN that same scan
    (``PushedFilters``), so non-qualifying vectors are skipped at the
    parquet reader, never ranked and discarded. Pending erasure
    tombstones anti-join the read (a forgotten vector stops being
    served immediately). Exact cosine re-rank on the index's stored
    quantized coordinates; output ``(query_id, vec_id, cosine,
    rank)`` — the ``cosine_topk`` contract. With ``nprobe >=`` the
    cell count the probe is EXACT filtered top-k over every indexed
    vector (the registered oracle states that); smaller ``nprobe`` is
    the usual IVF recall/latency trade.

    The query side is broadcast (interactive probes are small by
    construction); corpus-sized query batches should run the batch
    operators (:func:`~..operators.similarity.ivf_topk_batched`)
    against the index read instead.
    """
    from ..operators.similarity import (
        _apply_predicate,
        _dot,
        _ivf_assign,
        quantize,
    )

    base = index_dir.rstrip("/")
    heal_centroid_layout(spark, base, centroids_dir)
    cents = spark.read.parquet(centroids_dir.rstrip("/"))
    q_assign = _ivf_assign(queries, cents, nprobe, id_col, vec_col, "query_id")
    qfeats = (
        queries.select(F.col(id_col).alias("query_id"), quantize(vec_col, "q_q"))
        .withColumn("q_n2", F.expr(_dot("q_q", "q_q")))
        .where(F.col("q_n2") > 0)
    )
    # lazy checkpoint: the cells collect below materializes it
    q_side = F.broadcast(
        q_assign.join(qfeats, "query_id").select(
            "query_id", "cell", "q_q", "q_n2"
        ).localCheckpoint(eager=False)
    )
    cells = [r[0] for r in q_side.select("cell").distinct().collect()]
    if not cells or not _fs_has_parquet_recursive(spark, base):
        return spark.range(0).select(
            F.col("id").alias("query_id"),
            F.col("id").alias(id_col),
            F.col("id").cast("double").alias("cosine"),
            F.col("id").cast("int").alias("rank"),
        )
    idx = _apply_predicate(
        apply_index_tombstones(
            spark,
            base,
            spark.read.parquet(base).where(F.col("cell").isin(cells)),
        ),
        predicate,
    )
    scored = idx.join(q_side, on="cell").withColumn(
        "cosine",
        F.expr(_dot("qv", "q_q")).cast("double")
        / (
            F.sqrt(F.col("n2").cast("double"))
            * F.sqrt(F.col("q_n2").cast("double"))
        ),
    )
    if exclude_self:
        scored = scored.where(F.col(id_col) != F.col("query_id"))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        # a vector probed through several of a query's nprobe cells
        # appears once per (query, id) thanks to the one-cell-per-
        # vector index layout, so no candidate dedup pass is needed
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )
