"""IVF-PQ STANDING vector index — the compressed-index upgrade of
``streaming/similarity.py::run_index_embedding_stream`` (the r11
verdict's "Missing #5"): the probe index stores PQ CODES (m small
integers per vector) instead of full quantized coordinates, cutting
standing-index bytes/vector ~an order of magnitude at 100 TB probe
volumes, with the classic billion-scale layout (IVF cells bound WHO a
vector is compared against, PQ ADC distances bound the shortlist, an
exact re-rank restores recall — Jégou et al. 2011, the
``operators/similarity.py::ivf_pq_topk_batched`` machinery run as a
standing stream).

Two persistent stores, each the partition layout its probe needs:

* ``index_dir`` — ``(vec_id, codes array<int>)`` PARTITIONED BY CELL:
  the per-batch candidate read prunes to the batch's touched cells
  and carries only m+1 integers per row. ``_meta`` pins the
  content-derived ``pq_version`` (centroids + codebooks), so a
  maintenance retrain is ADOPTED by live runners per batch (the
  ``recell_embedding_index`` discipline).
* ``vecs_dir`` — ``(vec_id, qv, n2)`` PARTITIONED BY ``ibucket =
  pmod(xxhash64(vec_id), n_buckets)``: the EXACT store, read only (a)
  bucket-pruned by the batch's own ids for redelivery routing and (b)
  bucket-pruned by the ADC shortlist's ids for the exact re-rank —
  O(batch + shortlist) full-width rows per trigger, never the corpus.
  This is the real-deployment split: the compressed index answers
  candidate generation; raw vectors are a keyed side-store touched
  only for survivors.

Discovery contract (uniform, order-free to state): a pair ``(a, b)``
is surfaced by the LATER arrival's batch — the arriving vector ranks
all its cellmates seen so far (indexed + smaller-id batchmates) by
integer ADC distance, keeps the top ``shortlist``, and exact
quantized cosine ``>= threshold`` verifies the survivors. Under the
gated id-ordered replay "seen so far" == "smaller id", so the union
of per-batch pairs equals the one-shot SQL the oracle spells (rank
smaller-id cellmates per vector by ADC, top ``shortlist``, exact
verify). Recall is shortlist-bounded by design — near-dups at high
cosine sit at the TOP of the ADC ranking (distance → 0), so the
planted-dup recall floor is 1.0 (pinned in tests) while distant
borderline pairs may fall off the shortlist: exactly the PQ trade.

Delivery: identical to the flat embedding runner — at-least-once,
batch-id idempotent via the REQUIRED durable checkpoint, both index
appends after the output commit, retry repairs RE-DERIVED under the
currently resolved centroids/codebooks (a retrain inside the crash
window must not land stale cells/codes — the r11 advice fix carried
over). Erasure: the vecs store rides ``_read_index_pruned`` (tombstone
anti-joins apply) and the cell index read applies them explicitly;
``forget_index_keys(key_col="vec_id")`` against BOTH dirs erases a
vector (``part_col="cell"`` for the index).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import (
    _assert_modulus_unchanged,
    _ensure_index_buckets,
    _fs_exists,
    _fs_has_parquet,
    _fs_has_parquet_recursive,
    _hadoop_fs,
    _index_bucket,
    _keyed_fan,
    _meta_signature,
    _read_index_pruned,
    _resolve_live_modulus,
    _run_independent,
    _touch_success,
)
from .forget import apply_index_tombstones


def _assign_cells(rows: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """argmax-cosine cell per (id, qv, n2) row — the `_ivf_assign`
    math spelled over pre-quantized coordinates (one spelling for the
    fresh path, the retry repair and recode, so a repair can never
    disagree with the original assignment under unchanged centroids)."""
    w = Window.partitionBy(id_col).orderBy(F.col("__cos").desc(), F.col("cell"))
    from ..operators.similarity import _dot

    return (
        rows.join(F.broadcast(cents.where(F.col("cn2") > 0)))
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
        .drop("cq", "cn2", "__cos", "__rn")
    )


def _encode_codes(
    rows: DataFrame, cbs: DataFrame, id_col: str, m: int, w: int
) -> DataFrame:
    """(id, codes array<int>) — nearest codebook subvector per
    subspace by exact integer squared-L2, ties to the lowest code (the
    ``pq_encode`` contract over pre-quantized coordinates)."""
    from ..operators.similarity import _l2sq, _pq_slice_rows

    sub = _pq_slice_rows(rows.select(id_col, "qv"), id_col, m, w, "sv")
    scored = sub.join(F.broadcast(cbs), on="subspace").withColumn(
        "__d", F.expr(_l2sq("sv", "cb"))
    )
    return (
        scored.groupBy(id_col, "subspace")
        .agg(F.min(F.struct(F.col("__d"), F.col("code"))).alias("__m"))
        .groupBy(id_col)
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(subspace,"
                " __m.code as code))), s -> s.code)"
            ).alias("codes")
        )
    )


def _batch_lut(rows: DataFrame, cbs: DataFrame, id_col: str, m: int, w: int):
    """Per-batch-vector ADC lookup table (query_id, subspace, code,
    __d) — exact integer squared-L2 from each batch subvector to every
    codebook centroid (the ``_pq_lut`` shape over pre-quantized rows)."""
    from ..operators.similarity import _l2sq, _pq_slice_rows

    qsub = _pq_slice_rows(
        rows.select(F.col(id_col).alias("query_id"), "qv"),
        "query_id", m, w, "sv",
    )
    return qsub.join(F.broadcast(cbs), on="subspace").select(
        "query_id", "subspace", "code",
        F.expr(_l2sq("sv", "cb")).alias("__d"),
    )


def _read_pq_version(spark, index_dir: str) -> str | None:
    meta = index_dir.rstrip("/") + "/_meta"
    if not _fs_has_parquet(spark, meta):
        return None
    return str(spark.read.parquet(meta).collect()[0]["pq_version"])


def _write_pq_meta(spark, dir_str: str, version: str, n_cells: int, m: int,
                   n_codes: int) -> None:
    from ..session import local_rows

    local_rows(
        spark, [(version, int(n_cells), int(m), int(n_codes))],
        "pq_version string, n_cells int, m int, n_codes int",
    ).coalesce(1).write.mode("overwrite").parquet(
        dir_str.rstrip("/") + "/_meta"
    )


def _restore_from_copy(spark, index_dir: str, ext_dir: str, copy_name: str,
                       version: str, n_cells: int, m: int, n_codes: int):
    """Swap ``ext_dir`` to the index's co-committed ``copy_name`` table
    (the heal_centroid_layout two-rename, shared by centroids and
    codebooks)."""
    from ..sinks.compaction import _swap_names

    base = index_dir.rstrip("/")
    ebase = ext_dir.rstrip("/")
    copy = base + "/" + copy_name
    if not _fs_has_parquet(spark, copy):
        raise ValueError(
            f"index at {index_dir} pins pq_version={version} but holds no "
            f"{copy_name} copy and {ext_dir} disagrees — the layout cannot "
            "be trusted; re-run recode_pq_index"
        )
    _, staging, retired = _swap_names(ebase)
    fs, p = _hadoop_fs(spark, ebase)
    _, sp = _hadoop_fs(spark, staging)
    _, rp = _hadoop_fs(spark, retired)
    try:
        spark.read.parquet(copy).coalesce(1).write.parquet(staging)
        _write_pq_meta(spark, staging, version, n_cells, m, n_codes)
        if fs.exists(p) and not fs.rename(p, rp):
            raise IOError(f"pq heal failed: rename {ebase} away")
    except BaseException:
        fs.delete(sp, True)
        raise
    if not fs.rename(sp, p):
        fs.rename(rp, p)
        fs.delete(sp, True)
        raise IOError(f"pq heal failed: rename staging into {ebase}")
    fs.delete(rp, True)
    spark.catalog.refreshByPath(ebase)


def heal_pq_layout(
    spark, index_dir: str, centroids_dir: str, codebooks_dir: str
) -> str | None:
    """Resolve :func:`recode_pq_index`'s crash windows: the index root
    swapped to the new layout (its ``_meta`` pins ``pq_version`` V2 and
    ``_centroids/`` / ``_codebooks/`` hold the V2 tables) while the
    external dirs still hold V1 — reading V1 centroids or codebooks
    against a V2 layout would prune probes to wrong cells / decode
    against wrong codebooks (silent duplicate readmission). On version
    mismatch both external dirs restore from the index's co-committed
    copies. Returns ``"restored"`` or None (already consistent /
    pre-recode layout)."""
    from ..sinks.compaction import heal_compaction_swap

    base = index_dir.rstrip("/")
    heal_compaction_swap(spark, centroids_dir.rstrip("/"))
    heal_compaction_swap(spark, codebooks_dir.rstrip("/"))
    iv = _read_pq_version(spark, base)
    if iv is None:
        return None
    meta = spark.read.parquet(base + "/_meta").collect()[0]
    healed = None
    for ext, copy in (
        (centroids_dir, "_centroids"), (codebooks_dir, "_codebooks")
    ):
        if _read_pq_version(spark, ext) != iv:
            _restore_from_copy(
                spark, base, ext, copy, iv,
                int(meta["n_cells"]), int(meta["m"]), int(meta["n_codes"]),
            )
            healed = "restored"
    return healed


def run_index_embedding_pq_stream(
    stream: DataFrame,
    out_dir: str,
    index_dir: str,
    vecs_dir: str,
    checkpoint_dir: str,
    centroids_dir: str,
    codebooks_dir: str,
    threshold: float = 0.95,
    shortlist: int = 8,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
    broadcast_batch: bool = True,
    n_buckets: int = 16,
    materialize_input: bool = False,
    extra_cols: tuple = (),
):
    """Standing IVF-PQ semantic near-dup discovery (see the module
    docstring for the two-store layout and the discovery contract).

    ``extra_cols`` names stream METADATA columns persisted on BOTH
    stores' rows (the filtered-search contract of
    ``run_index_embedding_stream``): :func:`probe_pq_index` pushes a
    metadata predicate into the pruned ``cell=`` CODE scan
    (``PushedFilters``) so non-qualifying vectors never enter the ADC
    ranking — never rank-then-discard. They ride the batch artifact,
    the retry repair and :func:`recode_pq_index`'s full rewrite
    (which re-derives code rows from the exact store, so the exact
    store must carry them too — hence both stores).

    Per micro-batch, under ``out_dir/batch=<id>/``:

    * ``pairs/`` — exact-cosine-verified ``(id_a, id_b, cosine)``
      pairs whose ADC rank survived the ``shortlist`` cut;
    * ``vecs/`` — the batch's ``(id, cell, qv, n2, codes)`` rows; the
      codes append to the cell index and the ``(id, qv, n2)``
      projection to the bucketed exact store after the commit.
    """
    if not checkpoint_dir:
        raise ValueError(
            "run_index_embedding_pq_stream requires a durable "
            "checkpoint_dir: batch-id-based retry idempotency is only "
            "safe when batch ids survive restarts"
        )

    from ..operators.similarity import _dot, quantize

    dims_holder: dict = {}
    _resolved: dict = {}

    def _cos(na: str, nb: str) -> "F.Column":
        return (
            F.expr(_dot(f"{na}.qv", f"{nb}.qv")).cast("double")
            / (
                F.sqrt(F.col(f"{na}.n2").cast("double"))
                * F.sqrt(F.col(f"{nb}.n2").cast("double"))
            )
        )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if materialize_input:
            batch_df = batch_df.localCheckpoint(eager=False)
        batch_out = out_dir.rstrip("/") + f"/batch={batch_id}"
        vecs_out = batch_out + "/vecs"
        pairs_out = batch_out + "/pairs"
        # the exact store's bucket modulus (pinned in vecs_dir/_meta,
        # adopts an online re-bucket) + the cell index's pq meta
        # (adopts a recode_pq_index retrain)
        nb = _resolve_live_modulus(
            spark, vecs_dir, n_buckets, _resolved, key="vb"
        )
        if (
            "cents" not in _resolved
            or _meta_signature(spark, index_dir)
            != _resolved.get("cents_meta_sig")
        ):
            if "cents" in _resolved:
                _resolved["cents"].unpersist()
                _resolved["cbs"].unpersist()
                for k in ("cents", "cbs", "cents_meta_sig", "inonempty"):
                    _resolved.pop(k, None)
            spark.catalog.refreshByPath(index_dir)
            spark.catalog.refreshByPath(centroids_dir)
            spark.catalog.refreshByPath(codebooks_dir)
            heal_pq_layout(spark, index_dir, centroids_dir, codebooks_dir)
            # the adopted _meta pins the layout's m/n_codes: a
            # recode-pq with a DIFFERENT m would otherwise be adopted
            # silently while this runner keeps slicing the old
            # subspace count — zip_with over mismatched widths yields
            # NULL distances and half-blind shortlists with no error
            # (the r12 review's finding; the pinned-modulus rule)
            if _fs_has_parquet(spark, index_dir.rstrip("/") + "/_meta"):
                mrow = spark.read.parquet(
                    index_dir.rstrip("/") + "/_meta"
                ).collect()[0]
                if int(mrow["m"]) != int(m):
                    raise ValueError(
                        f"PQ index at {index_dir} was recoded with "
                        f"m={int(mrow['m'])}, this runner was started "
                        f"with m={m} — the subspace count is part of "
                        "the on-disk code layout; restart the runner "
                        "with the index's m"
                    )
            _resolved["cents"] = (
                spark.read.parquet(centroids_dir)
                .select("cell", "cq", "cn2")
                .persist()
            )
            _resolved["cbs"] = (
                spark.read.parquet(codebooks_dir)
                .select("subspace", "code", "cb")
                .persist()
            )
            # the codebook table itself pins m for EVERY layout (the
            # recode-written _meta only exists after a first recode):
            # a runner started with the wrong subspace count would
            # slice mismatched widths into NULL distances silently
            nsub = _resolved["cbs"].select("subspace").distinct().count()
            if nsub != int(m):
                raise ValueError(
                    f"codebooks at {codebooks_dir} carry {nsub} "
                    f"subspaces, this runner was started with m={m} — "
                    "the subspace count is part of the on-disk code "
                    "layout; restart with the codebooks' m"
                )
            _resolved["cents_meta_sig"] = _meta_signature(spark, index_dir)
        cents, cbs = _resolved["cents"], _resolved["cbs"]
        if "w" not in dims_holder:
            d = len(cents.select("cq").first()["cq"])
            if d % m:
                raise ValueError(f"m={m} must divide dims={d}")
            dims_holder["w"] = d // m
        w = dims_holder["w"]

        def _derive(rows: DataFrame) -> DataFrame:
            """(id, cell, qv, n2, codes) under the CURRENT centroids +
            codebooks — fresh path and retry repair share it."""
            assigned = _assign_cells(rows, cents, id_col)
            codes = _encode_codes(rows, cbs, id_col, m, w)
            return assigned.join(codes, id_col).select(
                id_col, "cell", "qv", "n2", "codes", *extra_cols
            )

        if _fs_exists(spark, batch_out + "/_SUCCESS"):
            # retried committed batch: repair possibly lost appends to
            # EITHER store, re-deriving cells/codes under the CURRENT
            # layout (a recode inside the crash window re-celled and
            # re-coded everything — the artifact's stored values may
            # describe the old layout)
            committed = _derive(
                spark.read.parquet(vecs_out).select(
                    id_col, "qv", "n2", *extra_cols
                )
            ).localCheckpoint(eager=False)
            cells = [
                r[0] for r in committed.select("cell").distinct().collect()
            ]
            if cells and _fs_has_parquet_recursive(spark, index_dir):
                idx = spark.read.parquet(index_dir).where(
                    F.col("cell").isin(cells)
                )
                missing_idx = committed.join(
                    idx.select(id_col), id_col, "left_anti"
                )
            else:
                missing_idx = committed
            _assert_modulus_unchanged(spark, index_dir, _resolved, key="cents")
            # pending tombstones filter the repair (the _append_index
            # rule: a suppressed key never re-enters the index)
            (
                apply_index_tombstones(spark, index_dir, missing_idx)
                .select(id_col, "cell", "codes", *extra_cols)
                .repartition(F.col("cell"))
                .write.mode("append")
                .partitionBy("cell")
                .parquet(index_dir)
            )
            vstore = _read_index_pruned(
                spark, vecs_dir,
                _collect_id_buckets(committed, nb, id_col),
            )
            missing_v = committed if vstore is None else committed.join(
                vstore.select(id_col), id_col, "left_anti"
            )
            _assert_modulus_unchanged(spark, vecs_dir, _resolved, key="vb")
            (
                apply_index_tombstones(spark, vecs_dir, missing_v)
                .select(id_col, "qv", "n2", *extra_cols)
                .withColumn("ibucket", _index_bucket(nb, id_col))
                .repartition(F.col("ibucket"))
                .write.mode("append")
                .partitionBy("ibucket")
                .parquet(vecs_dir)
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
        # lazy checkpoint: the bc collect below is the materializing
        # action — no dedicated checkpoint job for the derive pass
        all_rows = _derive(feats).localCheckpoint(eager=False)
        # ONE driver collect serves both prune lists: the exact store's
        # id buckets AND the cell list for the pruned code-index read —
        # at most n_buckets x n_cells (id-bucket, cell) pairs, both
        # driver-side constants. The cell list is all_rows' (a superset
        # of batch_rows' on a redelivered batch): the candidate join
        # filters on exact cell equality, so a redelivered id's cell in
        # the prune list adds scan I/O on that retry only, never rows.
        bc = (
            all_rows.select(
                _index_bucket(nb, id_col).alias("__b"), "cell"
            )
            .distinct()
            .collect()
        )
        # redelivery routing: ids already in the exact store (bucket-
        # pruned point lookup) arrived before — their pairs emitted
        # then; skip discovery and both appends
        vstore_self = _read_index_pruned(
            spark, vecs_dir,
            sorted({r["__b"] for r in bc}),
            nonempty_memo=_resolved,
        )
        if vstore_self is None:
            batch_rows = all_rows
        else:
            batch_rows = all_rows.join(
                vstore_self.select(id_col), id_col, "left_anti"
            ).localCheckpoint(eager=False)
        # single consumer (the ADC join) — inline, no checkpoint: the
        # LUT is m x n_codes rows per query, so materializing it eagerly
        # is a full extra pass over the batch's largest intermediate
        lut = _batch_lut(batch_rows, cbs, id_col, m, w)
        # candidate codes: indexed cellmates (cell-pruned, tombstone-
        # filtered) + smaller-id batchmates — ONE ADC ranking over both
        if not _resolved.get("inonempty"):
            _resolved["inonempty"] = _fs_has_parquet_recursive(
                spark, index_dir
            )
        cells = (
            sorted({r["cell"] for r in bc})
            if _resolved["inonempty"] else []
        )
        probe = F.broadcast(batch_rows) if broadcast_batch else batch_rows
        cand = None
        if cells:
            idx = apply_index_tombstones(
                spark,
                index_dir,
                spark.read.parquet(index_dir).where(F.col("cell").isin(cells)),
            )
            cand = (
                idx.alias("a")
                .join(
                    probe.select(id_col, "cell").alias("b"),
                    (F.col("a.cell") == F.col("b.cell"))
                    & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
                )
                .select(
                    F.col(f"b.{id_col}").alias("query_id"),
                    F.col(f"a.{id_col}").alias("c_id"),
                    F.col("a.codes").alias("codes"),
                )
            )
        within = (
            batch_rows.select(id_col, "cell", "codes").alias("a")
            .join(
                probe.select(id_col, "cell").alias("b"),
                (F.col("a.cell") == F.col("b.cell"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"b.{id_col}").alias("query_id"),
                F.col(f"a.{id_col}").alias("c_id"),
                F.col("a.codes").alias("codes"),
            )
        )
        cand = within if cand is None else cand.unionByName(within)
        # ADC distance: explode the candidate's codes against the
        # query's LUT — m thin rows per (query, cand), summed
        adc = (
            cand.select(
                "query_id", "c_id",
                F.posexplode("codes").alias("subspace", "code"),
            )
            .join(lut, on=["query_id", "subspace", "code"])
            .groupBy("query_id", "c_id")
            .agg(F.sum("__d").alias("adc_dist"))
        )
        rk = Window.partitionBy("query_id").orderBy(
            F.col("adc_dist").asc(), F.col("c_id").asc()
        )
        # lazy checkpoint: the shortlist-id bucket collect below is
        # the materializing action (one action runs ADC + ranking)
        short = (
            adc.withColumn("__rk", F.row_number().over(rk))
            .where(F.col("__rk") <= int(shortlist))
            .select("query_id", "c_id")
            .localCheckpoint(eager=False)
        )
        # exact re-rank: survivors' raw coordinates — batchmates from
        # the checkpointed rows, indexed ids from the bucket-pruned
        # exact store; O(shortlist) full-width rows, never the corpus
        # no distinct: consumed by the bucket-list collect and a
        # left-semi join, both duplicate-insensitive
        ext_ids = short.join(
            batch_rows.select(id_col), short.c_id == F.col(id_col), "left_anti"
        ).select(F.col("c_id").alias(id_col))
        vstore_cand = _read_index_pruned(
            spark, vecs_dir, _collect_id_buckets(ext_ids, nb, id_col)
        )
        cand_vecs = batch_rows.select(id_col, "qv", "n2")
        if vstore_cand is not None:
            cand_vecs = cand_vecs.unionByName(
                vstore_cand.join(ext_ids, id_col, "left_semi")
                .select(id_col, "qv", "n2")
            )
        pairs = (
            short
            .join(
                cand_vecs.alias("a"),
                short.c_id == F.col(f"a.{id_col}"),
            )
            .join(
                batch_rows.select(id_col, "qv", "n2").alias("b"),
                short.query_id == F.col(f"b.{id_col}"),
            )
            .select(
                F.least(F.col("c_id"), F.col("query_id")).alias("id_a"),
                F.greatest(F.col("c_id"), F.col("query_id")).alias("id_b"),
                _cos("a", "b").alias("cosine"),
            )
            .where(F.col("cosine") >= F.lit(threshold))
        )
        # order-free sub-artifacts (visibility gated on the _SUCCESS
        # written after both) — overlap the pair discovery with the
        # trivial vecs write
        _run_independent(
            lambda: pairs.write.mode("overwrite").parquet(pairs_out),
            lambda: batch_rows.write.mode("overwrite").parquet(vecs_out),
        )
        _touch_success(spark, batch_out)
        _assert_modulus_unchanged(spark, index_dir, _resolved, key="cents")
        _assert_modulus_unchanged(spark, vecs_dir, _resolved, key="vb")
        # pending tombstones filter both appends (the _append_index rule)
        irows = apply_index_tombstones(
            spark, index_dir,
            batch_rows.select(id_col, "cell", "codes", *extra_cols),
        )
        # small-batch regime: keyed fan (one file per cell, parallel
        # writers) — the coalesce(1) spelling serialized ~n_cells file
        # opens into one 1.5-3 s task (see _keyed_fan)
        pre_i = (
            _keyed_fan(irows, "cell") if broadcast_batch
            else irows.repartition(F.col("cell"))
        )
        vrows = apply_index_tombstones(
            spark, vecs_dir,
            batch_rows.select(id_col, "qv", "n2", *extra_cols),
        ).withColumn("ibucket", _index_bucket(nb, id_col))
        pre_v = (
            _keyed_fan(vrows, "ibucket") if broadcast_batch
            else vrows.repartition(F.col("ibucket"))
        )
        # the two appends are order-free: the retry repair derives each
        # store's missing-set independently from the committed batch
        # artifact (vecs_out), so either crash half heals on its own
        _run_independent(
            lambda: pre_i.write.mode("append")
            .partitionBy("cell")
            .parquet(index_dir),
            lambda: pre_v.write.mode("append")
            .partitionBy("ibucket")
            .parquet(vecs_dir),
        )

    writer = (
        stream.writeStream.foreachBatch(_process)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _collect_id_buckets(rows: DataFrame, nb: int, id_col: str) -> list:
    return [
        r[0]
        for r in rows.select(_index_bucket(nb, id_col).alias("b"))
        .distinct()
        .collect()
    ]


def pq_index_stats(spark, index_dir: str, vecs_dir: str) -> dict:
    """Bytes-per-vector of the compressed cell index vs the exact
    store — the compression the PQ layout buys, measured from the
    actual parquet footprint (the SCALE.md artifact)."""
    from ..sinks.compaction import fs_dir_stats

    out = {}
    for name, d in (("index", index_dir), ("vecs", vecs_dir)):
        n_rows = (
            spark.read.parquet(d).count()
            if _fs_has_parquet_recursive(spark, d) else 0
        )
        _, size = fs_dir_stats(spark, d)
        # exclude the meta sidecars' bytes? they are O(1); keep honest
        # totals — at corpus scale they vanish
        out[f"{name}_rows"] = int(n_rows)
        out[f"{name}_bytes"] = int(size)
        out[f"{name}_bytes_per_vector"] = (
            round(size / n_rows, 2) if n_rows else None
        )
    return out


def recode_pq_index(
    spark,
    index_dir: str,
    vecs_dir: str,
    centroids_dir: str,
    codebooks_dir: str,
    n_cells: int | None = None,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    seed: int = 7,
    max_iter: int = 10,
    sample_fraction: float | None = None,
) -> dict:
    """Retrain the PQ index's centroids on the exact store's own
    vectors (sampled seeded k-means||, the ``recell_embedding_index``
    recipe), rebuild the SEEDED codebooks over the current corpus, and
    atomically re-cell + re-code the whole index — the
    centroid-lifecycle operation for the compressed layout. (A
    production deployment swaps the seeded codebooks for per-subspace
    k-means trained offline; only this function changes.)

    Commit protocol (the recell two-phase): the new index stages with
    ``_meta`` (content-derived ``pq_version``), ``_centroids/`` and
    ``_codebooks/`` co-committed, swaps in with the two-rename; the
    external centroid/codebook dirs then swap to the same version —
    every crash window heals via :func:`heal_pq_layout` from the
    index's own copies. Live runners adopt the flipped ``_meta`` per
    batch; a flip mid-batch fails that trigger loudly.

    O(index) rewrite by nature — maintenance-scheduled, quiesced or
    writer-owned. Returns ``{"n_cells", "pq_version", "n_rows"}``."""
    import hashlib

    from ..operators.similarity import (
        QUANT,
        auto_cells,
        pq_codebooks,
        train_ivf_centroids,
    )
    from ..sinks.compaction import _swap_names, heal_compaction_swap
    from .dedup import _hadoop_fs as _hfs

    base = index_dir.rstrip("/")
    heal_compaction_swap(spark, base)
    heal_pq_layout(spark, base, centroids_dir, codebooks_dir)
    if not _fs_has_parquet_recursive(spark, vecs_dir):
        raise ValueError(
            f"exact store at {vecs_dir} holds no vectors — nothing to "
            "retrain from (run the stream first)"
        )
    # every non-layout column survives the rewrite (filtered-search
    # extra_cols ride both stores; dropping them here would break
    # probe predicates after a recode)
    rows = spark.read.parquet(vecs_dir).drop("ibucket")
    rows = apply_index_tombstones(spark, vecs_dir, rows)
    extra = [c for c in rows.columns if c not in (id_col, "qv", "n2")]
    n_rows = rows.count()
    if n_rows == 0:
        # files on disk but every row tombstoned (bulk takedown with
        # purge deferred): same no-vectors state as an empty store —
        # raise the clean message instead of a NoneType subscript in
        # the dims probe below
        raise ValueError(
            f"exact store at {vecs_dir} holds no (unforgotten) vectors "
            "— nothing to retrain from (purge or re-run the stream "
            "first)"
        )
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
    ).where(F.col("cn2") > 0).localCheckpoint()
    dims = len(rows.select("qv").first()["qv"])
    cbs = pq_codebooks(
        rows.select(
            id_col,
            F.expr(
                f"transform(qv, x -> cast(x as double) / {QUANT}.0)"
            ).alias("embedding"),
        ),
        m=m, n_codes=n_codes, id_col=id_col, dims=dims,
        corpus_count=n_rows,
    ).localCheckpoint()
    crows = sorted(
        (int(r["cell"]), tuple(int(x) for x in r["cq"])) for r in cents.collect()
    )
    brows = sorted(
        (int(r["subspace"]), int(r["code"]), tuple(int(x) for x in r["cb"]))
        for r in cbs.collect()
    )
    version = hashlib.md5(repr((crows, brows)).encode()).hexdigest()[:16]

    reassigned = _assign_cells(rows, cents, id_col)
    recoded = _encode_codes(rows, cbs, id_col, m, dims // m)
    new_rows = reassigned.join(recoded, id_col).select(
        id_col, "cell", "codes", *extra
    )

    _, staging, retired = _swap_names(base)
    fs, p = _hfs(spark, base)
    _, sp = _hfs(spark, staging)
    _, rp = _hfs(spark, retired)
    try:
        _write_pq_meta(spark, staging, version, n_cells, m, n_codes)
        cents.select("cell", "cq", "cn2").coalesce(1).write.parquet(
            staging + "/_centroids"
        )
        cbs.select("subspace", "code", "cb").coalesce(1).write.parquet(
            staging + "/_codebooks"
        )
        (
            new_rows.repartition(F.col("cell"))
            .write.mode("append")
            .partitionBy("cell")
            .parquet(staging)
        )
        if not fs.rename(p, rp):
            raise IOError(f"recode swap failed: rename {base} away")
    except BaseException:
        fs.delete(sp, True)
        raise
    if not fs.rename(sp, p):
        fs.rename(rp, p)
        fs.delete(sp, True)
        raise IOError(f"recode swap failed: rename staging into {base}")
    fs.delete(rp, True)
    spark.catalog.refreshByPath(base)
    healed = heal_pq_layout(spark, base, centroids_dir, codebooks_dir)
    if healed != "restored" and (
        _read_pq_version(spark, centroids_dir) != version
        or _read_pq_version(spark, codebooks_dir) != version
    ):
        raise IOError(
            f"recode commit incomplete: external dirs do not carry "
            f"pq_version {version} after heal"
        )
    return {"n_cells": int(n_cells), "pq_version": version,
            "n_rows": int(n_rows)}


def probe_pq_index(
    spark,
    index_dir: str,
    vecs_dir: str,
    centroids_dir: str,
    codebooks_dir: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    shortlist: int = 64,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    predicate=None,
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k similarity search SERVED from the standing IVF-PQ index —
    the compressed-layout twin of ``streaming/similarity.py::
    probe_embedding_index``, completing the filtered-search surface on
    the billion-scale layout.

    Per call: queries assign to their ``nprobe`` nearest cells against
    the persisted centroids, the CODE index is read pruned to exactly
    those cells (``PartitionFilters``) with ``predicate`` — over the
    runner's ``extra_cols`` metadata — pushed into the same scan
    (``PushedFilters``): non-qualifying vectors never enter the ADC
    ranking, never rank-then-discard. Integer-exact ADC distances
    shortlist ``shortlist`` candidates per query; ONLY those ids'
    full-width vectors are read from the bucketed exact store
    (bucket-pruned point reads) for the exact cosine re-rank — the
    O(batch + shortlist) cost shape of the standing runner itself.
    Pending erasure tombstones anti-join both reads. Output
    ``(query_id, vec_id, cosine, rank)``, the ``cosine_topk``
    contract. With ``nprobe >=`` the cell count AND ``shortlist >=``
    the corpus size the probe is EXACT filtered top-k over every
    indexed vector (the registered oracle states that); production
    probes trade both knobs for latency, the usual IVF-PQ shape.
    """
    base = index_dir.rstrip("/")
    heal_pq_layout(spark, base, centroids_dir, codebooks_dir)
    cents = spark.read.parquet(centroids_dir.rstrip("/")).select(
        "cell", "cq", "cn2"
    )
    cbs = spark.read.parquet(codebooks_dir.rstrip("/")).select(
        "subspace", "code", "cb"
    )
    nsub = cbs.select("subspace").distinct().count()
    if nsub != int(m):
        raise ValueError(
            f"codebooks at {codebooks_dir} carry {nsub} subspaces, the "
            f"probe was called with m={m} — pass the index's m"
        )
    from ..operators.similarity import _apply_predicate, _dot, quantize

    dims = len(cents.select("cq").first()["cq"])
    if dims % m:
        raise ValueError(f"m={m} must divide dims={dims}")
    w_sub = dims // m
    # ONE row per query (id, qv, n2), materialized once: the cell
    # assignment, the ADC LUT and the exact re-rank all read this
    # frame. The LUT in particular MUST build from here — building it
    # from the exploded (query x probed cell) assignment duplicates
    # every (query_id, subspace, code) row nprobe times, multiplying
    # the ADC join + sum by the probed-cell count (uniform per query,
    # so the ranking survives, but the work is nprobe x for nothing —
    # and the exact-probe contract runs nprobe = the full cell count).
    qfeats = (
        queries.select(F.col(id_col).alias("query_id"), quantize(vec_col, "qv"))
        .withColumn("n2", F.expr(_dot("qv", "qv")))
        .where(F.col("n2") > 0)
        .localCheckpoint(eager=False)
    )
    q_assign = (
        _assign_cells_nprobe(qfeats, cents, "query_id", nprobe)
        .select("query_id", "cell")
    )
    # thin (query_id, cell) pairs only — the qv arrays stay one-per-
    # query in qfeats instead of riding every probed-cell row
    # both lazy checkpoints (qfeats above, q_assign here) materialize
    # in the cells collect below — one action instead of three
    q_side = F.broadcast(q_assign.localCheckpoint(eager=False))
    cells = [r[0] for r in q_side.select("cell").distinct().collect()]
    empty = spark.range(0).select(
        F.col("id").alias("query_id"),
        F.col("id").alias(id_col),
        F.col("id").cast("double").alias("cosine"),
        F.col("id").cast("int").alias("rank"),
    )
    if not cells or not _fs_has_parquet_recursive(spark, base):
        return empty
    idx = _pruned_code_scan(spark, base, cells, predicate)
    # single consumer (the ADC join) — inline, no checkpoint (see the
    # runner's lut note)
    lut = _batch_lut(
        qfeats.select(F.col("query_id").alias(id_col), "qv"),
        cbs, id_col, m, w_sub,
    )
    cand = idx.alias("a").join(
        q_side.select("query_id", "cell").alias("b"), on="cell"
    )
    if exclude_self:
        cand = cand.where(F.col(f"a.{id_col}") != F.col("query_id"))
    adc = (
        cand.select(
            "query_id",
            F.col(f"a.{id_col}").alias("c_id"),
            F.posexplode("codes").alias("subspace", "code"),
        )
        .join(lut, on=["query_id", "subspace", "code"])
        .groupBy("query_id", "c_id")
        .agg(F.sum("__d").alias("adc_dist"))
    )
    rk = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("c_id").asc()
    )
    # lazy: the shortlist-id bucket collect below materializes it
    short = (
        adc.withColumn("__rk", F.row_number().over(rk))
        .where(F.col("__rk") <= int(shortlist))
        .select("query_id", "c_id")
        .localCheckpoint(eager=False)
    )
    nb = _ensure_index_buckets(spark, vecs_dir, None)
    # no distinct: the bucket-list collect and the left-semi join
    # below are both duplicate-insensitive
    sids = short.select(F.col("c_id").alias(id_col))
    vstore = _read_index_pruned(
        spark, vecs_dir, _collect_id_buckets(sids, nb, id_col)
    )
    if vstore is None:
        return empty
    cand_vecs = vstore.join(sids, id_col, "left_semi").select(
        id_col, F.col("qv").alias("c_q"), F.col("n2").alias("c_n2")
    )
    scored = (
        short.join(cand_vecs, short.c_id == cand_vecs[id_col])
        .join(
            # qfeats is one-row-per-query by construction — no
            # distinct needed (the old exploded q_side required one)
            F.broadcast(
                qfeats.select(
                    "query_id",
                    F.col("qv").alias("q_q"),
                    F.col("n2").alias("q_n2"),
                )
            ),
            on="query_id",
        )
        .withColumn(
            "cosine",
            F.expr(_dot("c_q", "q_q")).cast("double")
            / (
                F.sqrt(F.col("c_n2").cast("double"))
                * F.sqrt(F.col("q_n2").cast("double"))
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("c_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", F.col("c_id").alias(id_col), "cosine", "rank"
        )
    )


def _pruned_code_scan(spark, base: str, cells, predicate) -> DataFrame:
    """The probe's CODE-index read: partition-pruned to the queries'
    cells, tombstone-filtered, with the metadata ``predicate`` pushed
    into the SAME scan (``PushedFilters``) — named so the plan pin in
    ``tests/test_streaming_pq.py`` can assert the pushdown on exactly
    the frame the ADC ranking consumes (``probe_pq_index`` checkpoints
    the shortlist, which hides this scan from the final plan)."""
    from ..operators.similarity import _apply_predicate

    return _apply_predicate(
        apply_index_tombstones(
            spark,
            base,
            spark.read.parquet(base).where(F.col("cell").isin(cells)),
        ),
        predicate,
    )


def _assign_cells_nprobe(
    rows: DataFrame, cents: DataFrame, id_col: str, nprobe: int
) -> DataFrame:
    """Top-``nprobe`` cells per (id, qv, n2) row — the probe-side
    generalization of :func:`_assign_cells` (which is the
    ``nprobe=1`` case, kept separate so the write-path argmax
    spelling stays byte-identical to its history)."""
    from ..operators.similarity import _dot

    w = Window.partitionBy(id_col).orderBy(F.col("__cos").desc(), F.col("cell"))
    return (
        rows.join(F.broadcast(cents.where(F.col("cn2") > 0)))
        .withColumn(
            "__cos",
            F.expr(_dot("qv", "cq")).cast("double")
            / (
                F.sqrt(F.col("n2").cast("double"))
                * F.sqrt(F.col("cn2").cast("double"))
            ),
        )
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= int(nprobe))
        .drop("cq", "cn2", "__cos", "__rn")
    )
