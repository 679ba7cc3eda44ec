"""Standing BM25 postings index: streaming build + served top-k.

The lexical-retrieval twin of the standing vector indexes
(``streaming/similarity.py`` / ``similarity_pq.py``): documents
stream in once, a persistent inverted index accretes on storage, and
``probe_bm25_index`` serves keyword top-k from it at any time —
scoring EXACTLY what the batch ``operators/retrieval.py::bm25_topk``
would score over the union of everything indexed (the repo-wide
union-equals-one-shot standing-index contract), because BM25's
corpus statistics are all derivable from the index itself:

* df(term) — counted live from the term's own bucket at probe time
  (every posting of a term lives in ONE ``ibucket =
  pmod(xxhash64(term), nb)`` partition, so the pruned probe read
  sees all of them, minus tombstoned rows);
* dl — denormalized onto each posting row at build time;
* N, T — per-batch 1-row ledger entries under ``stats/``, summed at
  probe (O(batches) tiny read); erasure appends compensating
  negative entries so a post-forget probe equals the batch operator
  over the SURVIVING corpus exactly.

Three stores under ``index_dir/``:

* ``postings/ibucket=<h(term)>/`` — ``(doc_id, term, tf, dl)``, the
  probe's data plane;
* ``docs/ibucket=<h(doc_id)>/`` — ``(doc_id, dl)``, the control
  plane: at-least-once redelivery routes already-indexed ids AROUND
  the build (first-writer-wins, the standing-index convention), and
  erasure resolves a doc's token mass here;
* ``stats/`` — the (n_rows, n_tokens) ledger (read with
  recursiveFileLookup; ``batch-<id>/`` entries are path-keyed so a
  retried batch OVERWRITES rather than double-counts, ``forget-<n>/``
  entries hold erasure compensation).

Delivery contract (same as ``run_index_dedup_stream``): the batch
artifact under ``out_dir/batch=<id>/`` (postings/ + docs/ + stats/ +
root ``_SUCCESS``) commits first; index appends follow; a retry
whose artifact already committed repairs exactly the appends that
are missing (anti-joins pruned to the batch's own buckets — a no-op
when everything landed). Pending erasure tombstones filter every
probe and every append.

100 TB posture: per trigger the corpus is touched only by the
batch's own pruned bucket reads — O(batch tokens + touched buckets)
— never an index scan; a probe costs O(touched term buckets +
candidates). Both stores are ``ibucket=`` layouts, so the generic
per-bucket compaction and online rebucket (``maintain_cli
compact-index`` / ``rebucket-index --keys term`` or ``doc_id``)
apply unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.retrieval import BM25_CONTRIB_SQL, _doc_terms
from .dedup import (
    _append_index,
    _assert_modulus_unchanged,
    _collect_buckets,
    _ensure_index_buckets,
    _fs_exists,
    _index_bucket,
    _read_index_pruned,
    _resolve_live_modulus,
    _run_independent,
    _touch_success,
)


def _stats_ledger(spark, stats_dir: str) -> DataFrame | None:
    """Sum the (n_rows, n_tokens) ledger — recursiveFileLookup skips
    partition-name inference so batch-*/, forget-*/ and compacted-*/
    entries coexist. None when no entry has been written yet. A
    crash-interrupted :func:`compact_bm25_stats` swap heals before
    the read (the `_ensure_index_buckets` rule applied here)."""
    from ..sinks.compaction import heal_compaction_swap

    heal_compaction_swap(spark, stats_dir.rstrip("/"))
    if not _fs_exists(spark, stats_dir):
        return None
    rows = (
        spark.read.option("recursiveFileLookup", "true")
        .schema("n_rows long, n_tokens long")
        .parquet(stats_dir.rstrip("/"))
    )
    return rows.agg(
        F.sum("n_rows").alias("n_docs"), F.sum("n_tokens").alias("t_tokens")
    )


def _stats_horizon(spark, stats_dir: str) -> int:
    """Highest batch id folded into a ``compacted-*`` ledger entry
    (-1 when never compacted): a retried batch at or below it must
    NOT re-write its ``batch-<id>`` entry — the compaction already
    counted it, and recreating the file would double-count."""
    from .dedup import _hadoop_fs

    fs, p = _hadoop_fs(spark, stats_dir)
    if not fs.exists(p):
        return -1
    names = [
        s.getPath().getName()
        for s in fs.listStatus(p)
        if s.getPath().getName().startswith("compacted-")
    ]
    if not names:
        return -1
    dirs = [stats_dir.rstrip("/") + "/" + n for n in names]
    h = (
        spark.read.schema("n_rows long, n_tokens long, horizon long")
        .parquet(*dirs)
        .agg(F.max("horizon"))
        .first()[0]
    )
    return -1 if h is None else int(h)


def compact_bm25_stats(spark, index_dir: str) -> dict:
    """Fold the stats ledger's per-batch and forget entries into ONE
    ``compacted-<n>`` entry (the ledger otherwise accretes a
    directory per trigger forever — the file-count argument behind
    every per-bucket compactor, applied to the smallest store).

    Runs quiesced, like every maintenance op. Atomicity: the folded
    ledger builds as a hidden staging sibling and swaps in with the
    house two-rename protocol — every crash window heals via
    ``heal_compaction_swap`` (which :func:`_stats_ledger` runs before
    any probe read), so the ledger total is never transiently double-
    or under-counted. Retry safety: the folded entry carries the
    highest folded batch id as ``horizon``; the runner's retry path
    skips the ledger re-write for batches at or below it, so a
    crashed batch retried AFTER a compaction that already counted its
    entry cannot double-count."""
    from ..sinks.compaction import _swap_names, heal_compaction_swap
    from .dedup import _hadoop_fs

    base = index_dir.rstrip("/")
    stats_dir = base + "/stats"
    heal_compaction_swap(spark, stats_dir)
    fs, p = _hadoop_fs(spark, stats_dir)
    if not fs.exists(p):
        return {"folded": 0, "horizon": -1}
    all_names = [
        s.getPath().getName()
        for s in fs.listStatus(p)
        if not s.getPath().getName().startswith(("_", "."))
    ]
    # forget-pending-* entries are an in-flight forget's STAGED
    # compensation (retrieval.py::forget_bm25_index): its retry may
    # legitimately overwrite them, so folding one here would leave a
    # counted copy the retry then re-adds — they ride the swap
    # unfolded instead and seal (or overwrite) on the forget's own
    # schedule.
    pending = [n for n in all_names if n.startswith("forget-pending-")]
    names = [n for n in all_names if not n.startswith("forget-pending-")]
    if len(names) <= 1:
        return {"folded": 0, "horizon": _stats_horizon(spark, stats_dir)}
    batch_ids = [
        int(n[len("batch-"):]) for n in names if n.startswith("batch-")
    ]
    prior = _stats_horizon(spark, stats_dir)
    horizon = max(batch_ids + [prior])
    gen = 1 + max(
        [int(n[len("compacted-"):]) for n in names
         if n.startswith("compacted-")] or [0]
    )
    total = (
        spark.read.option("recursiveFileLookup", "true")
        .schema("n_rows long, n_tokens long")
        .parquet(*[stats_dir + "/" + n for n in names])
        .agg(F.sum("n_rows"), F.sum("n_tokens"))
        .first()
    )
    _, staging, retired = _swap_names(stats_dir)
    _, sp = _hadoop_fs(spark, staging)
    _, rp = _hadoop_fs(spark, retired)
    try:
        spark.createDataFrame(
            [(int(total[0] or 0), int(total[1] or 0), horizon)],
            "n_rows long, n_tokens long, horizon long",
        ).coalesce(1).write.parquet(staging + f"/compacted-{gen}")
        for n in pending:  # carried across the swap, never folded
            spark.read.schema("n_rows long, n_tokens long").parquet(
                stats_dir + "/" + n
            ).coalesce(1).write.parquet(staging + "/" + n)
        _touch_success(spark, staging)
        if not fs.rename(p, rp):
            raise IOError(f"stats compaction swap failed: rename {stats_dir}")
    except BaseException:
        fs.delete(sp, True)
        raise
    if not fs.rename(sp, p):
        fs.rename(rp, p)
        fs.delete(sp, True)
        raise IOError(
            f"stats compaction swap failed: rename staging into {stats_dir}"
        )
    fs.delete(rp, True)
    spark.catalog.refreshByPath(stats_dir)
    return {"folded": len(names), "horizon": horizon}


def run_index_bm25_stream(
    stream: DataFrame,
    out_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
    n_buckets: int = 16,
    small_batch: bool = True,
    extra_cols: tuple = (),
):
    """Accrete the standing BM25 index from a document stream (see the
    module docstring for the layout and the union-equals-one-shot
    probe contract).

    NULL-id rows are dropped wholesale (keyed stores never index a
    NULL key — the oracle twin states ``WHERE doc_id IS NOT NULL``);
    rows that share an id WITHIN a batch merge into one document
    (token counts sum — exactly the batch operator's groupBy), while
    an id seen in an EARLIER batch is routed around the build
    entirely (first-writer-wins; at-least-once redelivery safety).
    Docs with no tokens still ledger into N and hold a docs-store row
    (dl=0), matching the batch operator's count(*).

    ``extra_cols`` names stream METADATA columns (lang, source, ...)
    denormalized onto each posting row — the filtered-search contract
    (:func:`probe_bm25_index`'s ``predicate`` evaluates against
    them). Rows that merged into one document pin each extra to its
    per-id MIN (deterministic under within-batch duplicate ids).
    They ride the batch artifact and the retry repair generically
    (both replay the artifact's full schema) and survive compaction
    and rebucket (full-row rewrites).
    """
    if not checkpoint_dir:
        raise ValueError(
            "run_index_bm25_stream requires a durable checkpoint_dir: "
            "batch-id-based retry idempotency is only safe when batch "
            "ids survive restarts"
        )
    postings_dir = index_dir.rstrip("/") + "/postings"
    docs_dir = index_dir.rstrip("/") + "/docs"
    stats_dir = index_dir.rstrip("/") + "/stats"
    _resolved: dict = {}

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        nbp = _resolve_live_modulus(
            spark, postings_dir, n_buckets, _resolved, key="pb"
        )
        nbd = _resolve_live_modulus(
            spark, docs_dir, n_buckets, _resolved, key="db"
        )
        batch_out = out_dir.rstrip("/") + f"/batch={batch_id}"
        stats_out = stats_dir + f"/batch-{batch_id}"
        if _fs_exists(spark, batch_out + "/_SUCCESS"):
            # retried batch whose artifact committed: repair exactly
            # the index appends that are missing. Crash windows, in
            # append order: postings landed / stats missing (the stats
            # overwrite below is path-keyed, always safe to redo);
            # stats landed / docs missing (the docs anti-join). The
            # postings anti-join on (id, term) covers the
            # postings-landed-docs-missing window without duplicating.
            committed = spark.read.parquet(batch_out + "/docs")
            prior = _read_index_pruned(
                spark, docs_dir,
                _collect_buckets(committed, nbd, id_col), _resolved,
            )
            missing = committed if prior is None else committed.join(
                prior.select(id_col), id_col, "left_anti"
            )
            # lazy: the postings bucket collect below materializes it
            missing = missing.localCheckpoint(eager=False)
            cp = spark.read.parquet(batch_out + "/postings").join(
                missing.select(id_col), id_col, "left_semi"
            )
            have = _read_index_pruned(
                spark, postings_dir, _collect_buckets(cp, nbp, "term")
            )
            to_add = cp if have is None else cp.join(
                have.select(id_col, "term"), [id_col, "term"], "left_anti"
            )
            _assert_modulus_unchanged(spark, postings_dir, _resolved, key="pb")
            _append_index(
                to_add.withColumn("ibucket", _index_bucket(nbp, "term")),
                postings_dir, small_batch=small_batch,
            )
            # skip the ledger re-write when a stats compaction already
            # folded (and counted) this batch's entry — recreating the
            # batch-<id> file would double-count N/T
            if batch_id > _stats_horizon(spark, stats_dir):
                spark.read.parquet(batch_out + "/stats").write.mode(
                    "overwrite"
                ).parquet(stats_out)
            _assert_modulus_unchanged(spark, docs_dir, _resolved, key="db")
            _append_index(
                missing.withColumn("ibucket", _index_bucket(nbd, id_col)),
                docs_dir, small_batch=small_batch,
            )
            return
        rows = batch_df.where(F.col(id_col).isNotNull())
        prior = _read_index_pruned(
            spark, docs_dir,
            # no id-level distinct: _collect_buckets dedups the bucket
            # ints itself — the extra exchange bought nothing
            _collect_buckets(rows.select(id_col), nbd, id_col),
            _resolved,
        )
        new_rows = rows if prior is None else rows.join(
            prior.select(id_col), id_col, "left_anti"
        )
        # eager materialization: every frame below re-reads this one
        # (Catalyst re-analysis of the raw stream source otherwise
        # dominates per-trigger fixed cost)
        new_rows = new_rows.localCheckpoint()
        terms = _doc_terms(new_rows, id_col, text_col)
        tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
        dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
        postings = tf.join(dl, id_col).select(id_col, "term", "tf", "dl")
        if extra_cols:
            meta = new_rows.groupBy(id_col).agg(
                *[F.min(c).alias(c) for c in extra_cols]
            )
            postings = postings.join(meta, id_col)
        docs_rows = (
            new_rows.select(id_col).distinct()
            .join(dl, id_col, "left")
            .select(id_col, F.coalesce("dl", F.lit(0)).alias("dl"))
        )
        stats = new_rows.agg(F.count("*").alias("n_rows")).crossJoin(
            terms.agg(F.count("*").alias("n_tokens"))
        )
        # artifact first (the commit point), appends after — then a
        # crash between the two is repaired by the retry path above.
        # The three sub-artifacts are order-free (visibility gated on
        # the _SUCCESS written after all of them) and overlap; the
        # APPENDS below stay sequential — their postings→stats→docs
        # order is load-bearing for the retry repair's crash windows
        _run_independent(
            lambda: postings.write.mode("overwrite")
            .parquet(batch_out + "/postings"),
            lambda: docs_rows.write.mode("overwrite")
            .parquet(batch_out + "/docs"),
            lambda: stats.write.mode("overwrite")
            .parquet(batch_out + "/stats"),
        )
        _touch_success(spark, batch_out)
        committed_p = spark.read.parquet(batch_out + "/postings")
        _assert_modulus_unchanged(spark, postings_dir, _resolved, key="pb")
        _append_index(
            committed_p.withColumn("ibucket", _index_bucket(nbp, "term")),
            postings_dir, small_batch=small_batch,
        )
        spark.read.parquet(batch_out + "/stats").write.mode(
            "overwrite"
        ).parquet(stats_out)
        committed_d = spark.read.parquet(batch_out + "/docs")
        _assert_modulus_unchanged(spark, docs_dir, _resolved, key="db")
        _append_index(
            committed_d.withColumn("ibucket", _index_bucket(nbd, id_col)),
            docs_dir, small_batch=small_batch,
        )

    writer = (
        stream.writeStream.foreachBatch(_process)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def probe_bm25_index(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    exclude_self: bool = False,
    predicate=None,
) -> DataFrame:
    """Top-k keyword search SERVED from the standing index — the
    ``bm25_topk`` contract ``(query_id, <id_col>, bm25_q, rank)``
    over the union of every indexed document.

    Per call: the queries' distinct terms hash to their postings
    buckets, ONLY those ``ibucket=`` leaves are read (partition-
    pruned, tombstone-filtered), df per term is counted from that
    read (complete by layout), dl rides the posting rows, and N/T
    come from the stats ledger — so the score is the batch
    operator's, bit-exactly, including after erasure (compensating
    ledger entries + tombstoned postings = the surviving corpus).

    ``predicate`` — over the runner's ``extra_cols`` metadata —
    restricts CANDIDACY only, before the scoring join (filter-then-
    rank); corpus statistics stay global, matching the batch
    operator's ``predicate=`` contract. df is deliberately counted
    from the UNFILTERED bucket rows (global stats), so the one
    pruned read serves both sides."""
    postings_dir = index_dir.rstrip("/") + "/postings"
    stats_dir = index_dir.rstrip("/") + "/stats"
    empty = spark.range(0).select(
        F.col("id").alias("query_id"),
        F.col("id").alias(id_col),
        F.col("id").alias("bm25_q"),
        F.col("id").cast("int").alias("rank"),
    )
    stats = _stats_ledger(spark, stats_dir)
    if stats is None:
        return empty
    nb = _ensure_index_buckets(spark, postings_dir, None)
    qterms = (
        _doc_terms(queries, query_id_col, text_col)
        .select(F.col(query_id_col).alias("query_id"), "term")
        .distinct()
        .localCheckpoint(eager=False)
    )
    idx = _read_index_pruned(
        spark, postings_dir, _collect_buckets(qterms, nb, "term")
    )
    if idx is None:
        return empty
    # two differently-keyed consumers (df count, candidate join) —
    # materialize the bucket-pruned read once (bounded by touched
    # buckets, never the index). Lazy: the caller's single action
    # materializes it; both consumer subtrees inside that action read
    # the cached partitions
    idx = idx.localCheckpoint(eager=False)
    # df counted over the touched buckets, restricted to query terms
    # (a bucket holds every posting of each of its terms, so this IS
    # the global df) — postings rows are unique per (doc, term)
    df_tbl = (
        idx.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    cside = idx
    if predicate is not None:
        from ..operators.similarity import _apply_predicate

        cside = _apply_predicate(idx, predicate)
    cand = (
        cside.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(stats))
    )
    if exclude_self:
        cand = cand.where(F.col(id_col) != F.col("query_id"))
    scored = (
        cand.withColumn("__c", F.expr(BM25_CONTRIB_SQL))
        .groupBy("query_id", id_col)
        .agg(F.sum("__c").alias("bm25_q"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25_q").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select("query_id", id_col, "bm25_q", "rank")
    )


def bm25_index_stats(spark, index_dir: str) -> dict:
    """Size/shape introspection of the standing BM25 index — the
    observability twin of ``similarity_pq.py::pq_index_stats``:
    per-store row counts and parquet bytes, distinct terms, ledger
    N/T totals and entry count (the compaction trigger signal), and
    bytes-per-posting (the SCALE.md artifact)."""
    from ..sinks.compaction import fs_dir_stats
    from .dedup import _fs_has_parquet_recursive, _hadoop_fs

    base = index_dir.rstrip("/")
    out = {}
    for name in ("postings", "docs"):
        d = f"{base}/{name}"
        n = (
            spark.read.parquet(d).count()
            if _fs_has_parquet_recursive(spark, d) else 0
        )
        _, size = fs_dir_stats(spark, d)
        out[f"{name}_rows"] = int(n)
        out[f"{name}_bytes"] = int(size)
    out["bytes_per_posting"] = (
        round(out["postings_bytes"] / out["postings_rows"], 2)
        if out["postings_rows"] else None
    )
    out["n_terms"] = (
        spark.read.parquet(f"{base}/postings").select("term")
        .distinct().count()
        if out["postings_rows"] else 0
    )
    ledger = _stats_ledger(spark, f"{base}/stats")
    if ledger is None:
        out["ledger_n_docs"] = out["ledger_t_tokens"] = 0
        out["ledger_entries"] = 0
    else:
        row = ledger.first()
        out["ledger_n_docs"] = int(row["n_docs"] or 0)
        out["ledger_t_tokens"] = int(row["t_tokens"] or 0)
        fs, p = _hadoop_fs(spark, f"{base}/stats")
        out["ledger_entries"] = sum(
            1 for s in fs.listStatus(p)
            if not s.getPath().getName().startswith(("_", "."))
        ) if fs.exists(p) else 0
    return out


def _seal_pending_forget(spark, stats_dir: str, pending: str) -> None:
    """Rename a ``forget-pending-<keyhash>`` ledger entry to its final
    accreting ``forget-<n>`` name (atomic FS rename; n = 1 + the
    highest sealed suffix, so a compaction that folded earlier sealed
    entries can never cause a name reuse collision). No-op when the
    pending entry does not exist (already sealed, or folded by a
    stats compaction that ran after the forget completed)."""
    from .dedup import _hadoop_fs

    fs, pp = _hadoop_fs(spark, pending)
    if not fs.exists(pp):
        return
    _, sd = _hadoop_fs(spark, stats_dir)
    n = 0
    for s in fs.listStatus(sd):
        name = s.getPath().getName()
        if name.startswith("forget-") and not name.startswith(
            "forget-pending-"
        ):
            try:
                n = max(n, int(name[len("forget-"):]))
            except ValueError:
                continue
    _, fp = _hadoop_fs(spark, stats_dir.rstrip("/") + f"/forget-{n + 1}")
    if not fs.rename(pp, fp):
        raise IOError(
            f"forget ledger seal failed: rename {pending} into "
            f"{stats_dir}/forget-{n + 1}"
        )


def forget_bm25_index(
    spark, index_dir: str, keys, id_col: str = "doc_id"
) -> dict:
    """Erase documents from the standing BM25 index (the RTBF path,
    streaming/forget.py semantics): tombstone-and-purge BOTH stores,
    and ledger a compensating NEGATIVE stats entry for the token mass
    the forgotten docs contributed — after which a probe scores
    exactly the batch operator over the surviving corpus (df shrinks
    via the tombstoned postings, N/T via the ledger).

    Retry idempotency (the r13 advice's crash window): the
    compensation stages at a KEYSET-DETERMINISTIC path
    (``forget-pending-<h(keys)>``, written with overwrite) BEFORE the
    docs store is touched, so a forget that crashes anywhere before
    the docs purge and is re-run recomputes the same hit from the
    still-visible rows and REPLACES the staged entry instead of
    accreting a second one; once the purge completes, the entry SEALS
    (atomic rename) to an accreting ``forget-<n>`` name — a re-forget
    of the same keys after readmission therefore stages at the
    now-free pending path and compensates AGAIN, as it must. A retry
    that finds zero visible rows (crash after the purge) just seals
    the staged entry and completes the postings-side erasure. Same
    quiesce discipline as every forget: no concurrent runner appends,
    no pending batch retries, and an interrupted forget is re-run
    before ingest resumes.

    Key typing follows the docs store's own schema (``_typed_keys``
    with the store frame as template) — string-keyed indexes forget
    exactly like long-keyed ones."""
    import hashlib

    from .dedup import _index_nonempty
    from .forget import _typed_keys, forget_index_keys

    keys = list(keys)
    postings_dir = index_dir.rstrip("/") + "/postings"
    docs_dir = index_dir.rstrip("/") + "/docs"
    stats_dir = index_dir.rstrip("/") + "/stats"
    keyhash = hashlib.md5(
        "\x1f".join(sorted({str(k) for k in keys})).encode()
    ).hexdigest()[:16]
    pending = stats_dir + f"/forget-pending-{keyhash}"
    n_rows = n_tokens = 0
    r2 = {"tombstoned": 0, "purged_leaves": 0}
    if keys and _index_nonempty(spark, docs_dir):
        nbd = _ensure_index_buckets(spark, docs_dir, None)
        template = spark.read.parquet(docs_dir)
        # id type resolved from the store schema — a hardcoded long
        # would TypeError on a string-keyed index before tombstoning
        kdf = _typed_keys(spark, template, keys, id_col)
        store = _read_index_pruned(
            spark, docs_dir, _collect_buckets(kdf, nbd, id_col)
        )
        if store is not None:
            hit = store.join(F.broadcast(kdf), id_col, "left_semi").agg(
                F.count("*").alias("n"),
                F.coalesce(F.sum("dl"), F.lit(0)).alias("t"),
            ).first()
            n_rows, n_tokens = int(hit["n"]), int(hit["t"])
        if n_rows:
            # NOTE: compensation counts one row per docs-store entry;
            # rows that merged into one doc at build time were
            # ledgered individually, so a forget of a merged doc
            # slightly over-counts N relative to the batch operator.
            # Exact only when ids are unique per batch (the
            # keyed-store contract).
            spark.createDataFrame(
                [(-n_rows, -n_tokens)], "n_rows long, n_tokens long"
            ).coalesce(1).write.mode("overwrite").parquet(pending)
        r2 = forget_index_keys(spark, docs_dir, keys, key_col=id_col)
        _seal_pending_forget(spark, stats_dir, pending)
    else:
        # docs store empty (a prior forget of this keyset may have
        # completed its purge — possibly emptying the store — and
        # crashed before sealing): seal the leftover staged entry so
        # a future re-forget cannot overwrite it
        _seal_pending_forget(spark, stats_dir, pending)
    r1 = forget_index_keys(spark, postings_dir, keys, key_col=id_col)
    return {
        "ledgered_rows": n_rows,
        "ledgered_tokens": n_tokens,
        "postings": r1,
        "docs": r2,
    }
