"""Standing BM25 postings index (streaming/retrieval.py).

Contracts pinned: the served probe equals the batch ``bm25_topk``
over the union corpus (union == one-shot — BM25's global stats all
derive from the index); cross-batch redelivery is routed around the
build (first-writer-wins, ledger not double-counted); NULL-id rows
are never indexed while empty-text docs still count in N; erasure
(forget_bm25_index) leaves the probe scoring exactly the batch
operator over the SURVIVING corpus (tombstoned postings shrink df,
compensating ledger entries shrink N/T); per-bucket compaction of
both stores changes nothing the probe can see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
    bm25_topk,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
    forget_bm25_index,
    probe_bm25_index,
    run_index_bm25_stream,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming.dedup import (
    compact_banded_index,
)

from .test_streaming_dedup import _one_file

SCHEMA = "doc_id long, text string"

ROWS0 = [
    (0, "apple banana apple"),
    (1, "banana cherry"),
    (2, None),          # tokenless: in N, dl=0, matches nothing
    (None, "ghost doc"),  # NULL id: never indexed
]
ROWS1 = [
    (3, "cherry cherry cherry apple"),
    (4, "durian fig"),
]


def _replay(spark, tmp_path, name, batches):
    d = tmp_path / f"{name}_src"
    for i, rows in enumerate(batches):
        _one_file(spark, d, f"{i:02d}.parquet", rows, SCHEMA)
    work = str(tmp_path / f"{name}_work")
    stream = (
        spark.readStream.format("parquet")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
    )
    q = run_index_bm25_stream(
        stream, work + "/out", work + "/index",
        checkpoint_dir=work + "/ckpt", n_buckets=4,
    )
    assert q.awaitTermination(180)
    return d, work


def _pairs(df):
    return {(r["query_id"], r["doc_id"], r["bm25_q"], r["rank"])
            for r in df.collect()}


def _batch_ref(spark, rows, queries, k=4):
    corpus = spark.createDataFrame(
        [r for r in rows if r[0] is not None], SCHEMA
    )
    return _pairs(bm25_topk(corpus, queries, k=k))


def test_probe_equals_batch_and_redelivery(spark, tmp_path):
    d, work = _replay(spark, tmp_path, "a", [ROWS0, ROWS1])
    queries = spark.createDataFrame(
        [(100, "apple cherry"), (101, "fig")], "query_id long, text string"
    )
    got = _pairs(probe_bm25_index(spark, work + "/index", queries, k=4))
    want = _batch_ref(spark, ROWS0 + ROWS1, queries)
    assert got == want
    # NULL id never indexed; tokenless doc holds a dl=0 docs row
    docs = spark.read.parquet(work + "/index/docs")
    assert docs.where(F.col("doc_id").isNull()).count() == 0
    assert docs.where("doc_id = 2").select("dl").first()["dl"] == 0

    # cross-batch redelivery: batch 0's rows arrive again under a NEW
    # batch id -> routed around the build, probe and ledger unchanged
    _one_file(spark, d, "02.parquet", ROWS0, SCHEMA)
    stream = (
        spark.readStream.format("parquet")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
    )
    q = run_index_bm25_stream(
        stream, work + "/out", work + "/index",
        checkpoint_dir=work + "/ckpt", n_buckets=4,
    )
    assert q.awaitTermination(180)
    assert _pairs(probe_bm25_index(spark, work + "/index", queries, k=4)) \
        == want
    post = spark.read.parquet(work + "/index/postings")
    assert post.groupBy("doc_id", "term").count() \
        .where("count > 1").count() == 0


def test_forget_equals_surviving_corpus(spark, tmp_path):
    _, work = _replay(spark, tmp_path, "b", [ROWS0, ROWS1])
    queries = spark.createDataFrame(
        [(100, "apple cherry")], "query_id long, text string"
    )
    res = forget_bm25_index(spark, work + "/index", [0, 3])
    assert res["ledgered_rows"] == 2
    assert res["ledgered_tokens"] == 3 + 4
    got = _pairs(probe_bm25_index(spark, work + "/index", queries, k=4))
    survivors = [r for r in ROWS0 + ROWS1 if r[0] not in (0, 3)]
    assert got == _batch_ref(spark, survivors, queries)
    # physically gone from both stores, not just suppressed
    assert spark.read.parquet(work + "/index/postings") \
        .where("doc_id in (0, 3)").count() == 0
    assert spark.read.parquet(work + "/index/docs") \
        .where("doc_id in (0, 3)").count() == 0


def test_rebucket_mid_replay(spark, tmp_path):
    """Online bucket growth on BOTH stores between micro-batches: the
    resumed runner adopts the flipped modulus (n_buckets=None), the
    probe still equals the batch operator, and a resume passing the
    stale modulus fails loudly."""
    import pytest as _pytest

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        rebucket_banded_index,
    )

    d = tmp_path / "r_src"
    work = str(tmp_path / "r_work")
    _one_file(spark, d, "00.parquet", ROWS0, SCHEMA)

    def _run(nb):
        stream = (
            spark.readStream.format("parquet")
            .schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .load(str(d))
        )
        q = run_index_bm25_stream(
            stream, work + "/out", work + "/index",
            checkpoint_dir=work + "/ckpt", n_buckets=nb,
        )
        assert q.awaitTermination(180)

    _run(4)
    assert rebucket_banded_index(
        spark, work + "/index/postings", ("term",)
    ) == 8
    assert rebucket_banded_index(
        spark, work + "/index/docs", ("doc_id",)
    ) == 8
    _one_file(spark, d, "01.parquet", ROWS1, SCHEMA)
    _run(None)
    queries = spark.createDataFrame(
        [(100, "apple cherry fig")], "query_id long, text string"
    )
    got = _pairs(probe_bm25_index(spark, work + "/index", queries, k=5))
    assert got == _batch_ref(spark, ROWS0 + ROWS1, queries, k=5)
    # stale-modulus resume fails loudly
    _one_file(spark, d, "02.parquet", [(9, "kiwi")], SCHEMA)
    stream = (
        spark.readStream.format("parquet")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
    )
    q = run_index_bm25_stream(
        stream, work + "/out", work + "/index",
        checkpoint_dir=work + "/ckpt", n_buckets=4,
    )
    with _pytest.raises(Exception, match="n_buckets"):
        q.awaitTermination(180)
        q.processAllAvailable()


def test_crash_window_postings_landed_docs_missing(spark, tmp_path):
    """The narrowest repair window: the batch artifact committed and
    the POSTINGS append landed, but the crash hit before the docs
    append. The retry (fresh checkpoint, same source) must re-append
    ONLY the docs rows — the (id, term) anti-join keeps the already-
    landed postings from duplicating — and the probe then equals the
    batch operator."""
    import shutil

    d, work = _replay(spark, tmp_path, "w", [ROWS0])
    # simulate the crash: wipe the docs store (keep its _meta)
    docs_dir = work + "/index/docs"
    for p in __import__("glob").glob(docs_dir + "/ibucket=*"):
        shutil.rmtree(p)
    spark.catalog.refreshByPath(docs_dir)
    stream = (
        spark.readStream.format("parquet")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
    )
    q = run_index_bm25_stream(
        stream, work + "/out", work + "/index",
        checkpoint_dir=work + "/ckpt_retry", n_buckets=4,
    )
    assert q.awaitTermination(180)
    post = spark.read.parquet(work + "/index/postings")
    assert post.groupBy("doc_id", "term").count() \
        .where("count > 1").count() == 0
    assert spark.read.parquet(docs_dir).count() == 3  # ids 0, 1, 2
    queries = spark.createDataFrame(
        [(100, "apple cherry")], "query_id long, text string"
    )
    assert _pairs(probe_bm25_index(spark, work + "/index", queries, k=4)) \
        == _batch_ref(spark, ROWS0, queries)


def test_filtered_probe_with_extras(spark, tmp_path):
    """extra_cols metadata rides the posting rows; the probe's
    predicate restricts candidacy with GLOBAL stats (the batch
    predicate= contract on the standing layout), and extras survive
    per-bucket compaction and an online rebucket."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        rebucket_banded_index,
    )

    schema = "doc_id long, text string, lang string"
    b0 = [(0, "apple banana", "en"), (1, "apple cherry", "fr")]
    b1 = [(2, "apple apple", "en"), (3, "banana cherry", "de")]
    d = tmp_path / "f_src"
    _one_file(spark, d, "00.parquet", b0, schema)
    _one_file(spark, d, "01.parquet", b1, schema)
    work = str(tmp_path / "f_work")

    def _run(nb):
        stream = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(str(d))
        )
        q = run_index_bm25_stream(
            stream, work + "/out", work + "/index",
            checkpoint_dir=work + "/ckpt", n_buckets=nb,
            extra_cols=("lang",),
        )
        assert q.awaitTermination(180)

    _run(4)
    assert "lang" in spark.read.parquet(work + "/index/postings").columns
    q = spark.createDataFrame([(9, "apple")], "query_id long, text string")
    corpus = spark.createDataFrame(b0 + b1, schema)
    want = {
        (r.query_id, r.doc_id, r.bm25_q, r.rank)
        for r in bm25_topk(corpus, q, k=3, predicate="lang = 'en'").collect()
    }

    def probe():
        return {
            (r.query_id, r.doc_id, r.bm25_q, r.rank)
            for r in probe_bm25_index(
                spark, work + "/index", q, k=3, predicate="lang = 'en'"
            ).collect()
        }

    assert probe() == want
    for store in ("postings", "docs"):
        compact_banded_index(spark, f"{work}/index/{store}")
        spark.catalog.refreshByPath(f"{work}/index/{store}")
    assert probe() == want
    assert rebucket_banded_index(
        spark, work + "/index/postings", ("term",)
    ) == 8
    assert probe() == want


def test_probe_read_is_partition_pruned(spark, tmp_path):
    """The probe's postings read prunes to the query terms' buckets
    (PartitionFilters on ibucket — O(touched buckets), never the
    index): pinned on the exact frame the scoring consumes
    (probe_bm25_index checkpoints it, so the scan never appears in
    the final result's plan)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.retrieval import (
        _doc_terms,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming.dedup import (
        _collect_buckets,
        _ensure_index_buckets,
        _read_index_pruned,
    )

    _, work = _replay(spark, tmp_path, "p", [ROWS0, ROWS1])
    queries = spark.createDataFrame(
        [(100, "apple")], "query_id long, text string"
    )
    nb = _ensure_index_buckets(spark, work + "/index/postings", None)
    qterms = _doc_terms(queries, "query_id", "text").distinct()
    buckets = _collect_buckets(qterms, nb, "term")
    assert 0 < len(buckets) < nb  # a real prune, not the whole index
    plan = (
        _read_index_pruned(spark, work + "/index/postings", buckets)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan
    assert "ibucket" in plan.split("PartitionFilters: [", 1)[1][:120], plan


def test_stats_ledger_compaction_and_retry(spark, tmp_path):
    """compact_bm25_stats folds the per-trigger (N, T) ledger into one
    horizon-carrying entry behind an atomic swap: the probe is
    unchanged, the entry count drops to 1, and a RETRY of an already-
    committed batch after the compaction (fresh checkpoint over the
    same source — batch ids replay from 0, hitting the runner's
    _SUCCESS repair path) does NOT recreate the folded batch entries,
    so N/T never double-count. A post-compaction forget still
    compensates correctly on top of the folded entry."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        compact_bm25_stats,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming.retrieval import (
        _stats_horizon,
    )

    d, work = _replay(spark, tmp_path, "s", [ROWS0, ROWS1])
    queries = spark.createDataFrame(
        [(100, "apple cherry fig")], "query_id long, text string"
    )
    before = _pairs(probe_bm25_index(spark, work + "/index", queries, k=5))
    res = compact_bm25_stats(spark, work + "/index")
    assert res["folded"] == 2 and res["horizon"] == 1
    assert _stats_horizon(spark, work + "/index/stats") == 1
    assert _pairs(probe_bm25_index(spark, work + "/index", queries, k=5)) \
        == before

    # retry after compaction: fresh checkpoint, same source -> batch
    # ids 0/1 replay into the _SUCCESS repair path; the horizon check
    # must skip their ledger re-writes
    stream = (
        spark.readStream.format("parquet")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
    )
    q = run_index_bm25_stream(
        stream, work + "/out", work + "/index",
        checkpoint_dir=work + "/ckpt2", n_buckets=4,
    )
    assert q.awaitTermination(180)
    import glob

    entries = [
        p for p in glob.glob(work + "/index/stats/*")
        if not p.rsplit("/", 1)[1].startswith(("_", "."))
    ]
    assert len(entries) == 1, entries
    assert _pairs(probe_bm25_index(spark, work + "/index", queries, k=5)) \
        == before

    # idempotent no-op on a single-entry ledger
    assert compact_bm25_stats(spark, work + "/index")["folded"] == 0

    # forget after compaction: negative entry rides next to the folded
    # one, probe equals the surviving corpus
    forget_bm25_index(spark, work + "/index", [1])
    survivors = [r for r in ROWS0 + ROWS1 if r[0] != 1]
    assert _pairs(probe_bm25_index(spark, work + "/index", queries, k=5)) \
        == _batch_ref(spark, survivors, queries, k=5)


def test_bm25_index_stats(spark, tmp_path):
    """bm25_index_stats reports the standing layout's true shape:
    ledger N/T equal the indexed corpus (rows with non-NULL ids,
    tokens), entry count tracks triggers then drops to 1 after the
    ledger fold."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        bm25_index_stats,
        compact_bm25_stats,
    )

    _, work = _replay(spark, tmp_path, "st", [ROWS0, ROWS1])
    s = bm25_index_stats(spark, work + "/index")
    assert s["ledger_n_docs"] == 5          # 3 + 2 non-NULL-id rows
    assert s["ledger_t_tokens"] == 5 + 6    # batch token counts
    assert s["docs_rows"] == 5
    assert s["ledger_entries"] == 2
    assert s["postings_rows"] > 0 and s["bytes_per_posting"] > 0
    # apple banana cherry durian fig; the NULL-id row's terms never index
    assert s["n_terms"] == 5
    compact_bm25_stats(spark, work + "/index")
    s2 = bm25_index_stats(spark, work + "/index")
    assert s2["ledger_entries"] == 1
    assert s2["ledger_n_docs"] == 5 and s2["ledger_t_tokens"] == 11


def test_compact_bm25_stats_cli(spark, tmp_path, capsys):
    """maintain_cli compact-bm25-stats drives the fold end-to-end and
    prints the JSON manifest (the orchestrator contract)."""
    import json

    from amazon_sagemaker_feature_store_streaming_aggregation_spark import (
        maintain_cli,
    )

    _, work = _replay(spark, tmp_path, "cli", [ROWS0, ROWS1])
    assert maintain_cli.main(
        ["compact-bm25-stats", "--path", work + "/index"]
    ) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["cmd"] == "compact-bm25-stats"
    assert m["folded"] == 2 and m["horizon"] == 1


def _pending_path(work: str, keys) -> str:
    import hashlib

    kh = hashlib.md5(
        "\x1f".join(sorted({str(k) for k in keys})).encode()
    ).hexdigest()[:16]
    return work + f"/index/stats/forget-pending-{kh}"


def test_forget_retry_idempotent_compensation(spark, tmp_path):
    """The r13 advice's crash window: a forget that wrote its
    compensating ledger entry and crashed BEFORE tombstoning leaves
    the docs rows visible, so a naive retry recomputes the same
    nonzero hit and accretes a second negative entry — permanently
    understating N/T. The staged-pending protocol instead REPLACES
    the keyset-keyed entry on retry and seals it exactly once; a
    genuine re-forget after readmission still accretes."""
    import glob

    d, work = _replay(spark, tmp_path, "ri", [ROWS0, ROWS1])
    queries = spark.createDataFrame(
        [(100, "apple cherry fig")], "query_id long, text string"
    )
    # simulate the crashed first attempt: the staged compensation for
    # keys [0, 3] landed (the exact rows a real run stages), nothing
    # was tombstoned or purged
    spark.createDataFrame(
        [(-2, -(3 + 4))], "n_rows long, n_tokens long"
    ).coalesce(1).write.mode("overwrite").parquet(_pending_path(work, [0, 3]))
    # the retry: rows still visible -> recomputes the same hit,
    # REPLACES the staged entry (same path), purges, seals
    res = forget_bm25_index(spark, work + "/index", [0, 3])
    assert res["ledgered_rows"] == 2 and res["ledgered_tokens"] == 7
    sealed = [
        p for p in glob.glob(work + "/index/stats/forget-*")
        if "forget-pending-" not in p
    ]
    assert len(sealed) == 1, sealed
    assert glob.glob(work + "/index/stats/forget-pending-*") == []
    survivors = [r for r in ROWS0 + ROWS1 if r[0] not in (0, 3)]
    assert _pairs(probe_bm25_index(spark, work + "/index", queries, k=5)) \
        == _batch_ref(spark, survivors, queries, k=5)

    # readmission + re-forget: doc 0 streams in again (1/2/4 route
    # around the build), and a SECOND forget of the same keyset must
    # compensate again — the sealed entry freed the pending path
    _one_file(spark, d, "02.parquet", [ROWS0[0]], SCHEMA)
    stream = (
        spark.readStream.format("parquet")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
    )
    q = run_index_bm25_stream(
        stream, work + "/out", work + "/index",
        checkpoint_dir=work + "/ckpt", n_buckets=4,
    )
    assert q.awaitTermination(180)
    res2 = forget_bm25_index(spark, work + "/index", [0, 3])
    assert res2["ledgered_rows"] == 1 and res2["ledgered_tokens"] == 3
    sealed = [
        p for p in glob.glob(work + "/index/stats/forget-*")
        if "forget-pending-" not in p
    ]
    assert len(sealed) == 2, sealed
    assert _pairs(probe_bm25_index(spark, work + "/index", queries, k=5)) \
        == _batch_ref(spark, survivors, queries, k=5)


def test_forget_seals_leftover_after_completed_purge(spark, tmp_path):
    """Crash AFTER the purge but BEFORE the seal: the retry finds
    zero visible rows, must NOT write a new compensation, and must
    seal the leftover staged entry (else a future re-forget would
    overwrite it and lose the compensation)."""
    import glob

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming.forget import (
        forget_index_keys,
    )

    _, work = _replay(spark, tmp_path, "rs", [ROWS0, ROWS1])
    # simulate: staged entry written AND purge completed, no seal
    spark.createDataFrame(
        [(-1, -2)], "n_rows long, n_tokens long"
    ).coalesce(1).write.mode("overwrite").parquet(_pending_path(work, [1]))
    forget_index_keys(spark, work + "/index/docs", [1], key_col="doc_id")
    forget_index_keys(spark, work + "/index/postings", [1], key_col="doc_id")
    res = forget_bm25_index(spark, work + "/index", [1])
    assert res["ledgered_rows"] == 0  # nothing visible to re-compensate
    assert glob.glob(work + "/index/stats/forget-pending-*") == []
    sealed = [
        p for p in glob.glob(work + "/index/stats/forget-*")
        if "forget-pending-" not in p
    ]
    assert len(sealed) == 1, sealed
    queries = spark.createDataFrame(
        [(100, "apple cherry fig")], "query_id long, text string"
    )
    survivors = [r for r in ROWS0 + ROWS1 if r[0] != 1]
    assert _pairs(probe_bm25_index(spark, work + "/index", queries, k=5)) \
        == _batch_ref(spark, survivors, queries, k=5)


def test_forget_string_keyed_index(spark, tmp_path):
    """The docs store's own schema types the forget keys (the r13
    advice's hardcoded-long finding): a string-keyed BM25 index
    forgets exactly like a long-keyed one."""
    schema = "doc_id string, text string"
    rows = [("a", "apple banana"), ("b", "cherry apple"), ("c", "fig")]
    d = tmp_path / "sk_src"
    _one_file(spark, d, "00.parquet", rows, schema)
    work = str(tmp_path / "sk_work")
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
    )
    q = run_index_bm25_stream(
        stream, work + "/out", work + "/index",
        checkpoint_dir=work + "/ckpt", n_buckets=4,
    )
    assert q.awaitTermination(180)
    res = forget_bm25_index(spark, work + "/index", ["a"])
    assert res["ledgered_rows"] == 1 and res["ledgered_tokens"] == 2
    queries = spark.createDataFrame(
        [(100, "apple fig")], "query_id long, text string"
    )
    got = _pairs(probe_bm25_index(spark, work + "/index", queries, k=4))
    corpus = spark.createDataFrame(rows[1:], schema)
    assert got == _pairs(bm25_topk(corpus, queries, k=4))
    assert spark.read.parquet(work + "/index/docs") \
        .where("doc_id = 'a'").count() == 0


def test_stats_compaction_carries_pending_unfolded(spark, tmp_path):
    """compact_bm25_stats must NOT fold a forget-pending-* entry: an
    in-flight forget's retry may legitimately overwrite it, and a
    folded copy plus the rewrite would double-count. Pending entries
    ride the swap verbatim; totals are unchanged."""
    import glob

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        compact_bm25_stats,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming.retrieval import (
        _stats_ledger,
    )

    _, work = _replay(spark, tmp_path, "cp", [ROWS0, ROWS1])
    spark.createDataFrame(
        [(-1, -2)], "n_rows long, n_tokens long"
    ).coalesce(1).write.mode("overwrite").parquet(_pending_path(work, [1]))
    before = _stats_ledger(spark, work + "/index/stats").first()
    res = compact_bm25_stats(spark, work + "/index")
    assert res["folded"] == 2  # the two batch entries, NOT the pending
    assert len(glob.glob(work + "/index/stats/forget-pending-*")) == 1
    after = _stats_ledger(spark, work + "/index/stats").first()
    assert (before["n_docs"], before["t_tokens"]) \
        == (after["n_docs"], after["t_tokens"])


def test_compaction_invisible_to_probe(spark, tmp_path):
    _, work = _replay(spark, tmp_path, "c", [ROWS0, ROWS1])
    queries = spark.createDataFrame(
        [(100, "apple cherry banana")], "query_id long, text string"
    )
    before = _pairs(probe_bm25_index(spark, work + "/index", queries, k=5))
    for store in ("postings", "docs"):
        compact_banded_index(spark, f"{work}/index/{store}")
    spark.catalog.refreshByPath(work + "/index/postings")
    spark.catalog.refreshByPath(work + "/index/docs")
    assert _pairs(probe_bm25_index(spark, work + "/index", queries, k=5)) \
        == before
