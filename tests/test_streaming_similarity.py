"""Streaming embedding-index maintenance
(streaming/similarity.py::run_index_embedding_stream).

Contracts pinned: full-run equivalence with the one-shot batch
semantic_dedup_pairs (union of per-batch pair outputs over a chunked
replay == batch run over the whole corpus, same fixed centroids);
cell-PRUNED index probes (the physical plan carries a
PartitionFilters entry on the cell column — the scale improvement
over the O(index) probes of the LSH/hamming streams); recovery
idempotency (a second availableNow run after completion neither
duplicates pairs nor double-appends the index).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
    ivf_centroids,
    semantic_dedup_pairs,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
    run_index_embedding_stream,
)

from .test_streaming_dedup import _write_chunks


def _mk_rows(rng, start_id, n, dim=16, base=None, eps=1.0):
    rows = []
    for i in range(n):
        if base is None:
            v = rng.normal(0, 1, dim)
        else:
            v = np.array(base) + rng.normal(0, eps, dim)
        rows.append((start_id + i, [float(x) for x in v]))
    return rows


@pytest.fixture()
def corpus(spark):
    rng = np.random.default_rng(13)
    a = [float(x) for x in rng.normal(0, 1, 16)]
    b = [float(x) for x in rng.normal(0, 1, 16)]
    rows = (
        _mk_rows(rng, 0, 3, base=a, eps=1e-3)  # tight group split across
        + _mk_rows(rng, 100, 30)  # batches below (ids 0-2)
        + _mk_rows(rng, 50, 2, base=b, eps=1e-3)  # pair within one batch
        + [(999, [0.0] * 16), (998, None)]  # zero-norm + NULL vector
    )
    return rows


def _start(spark, path, work, cents_dir):
    stream = (
        spark.readStream.format("parquet")
        .schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .load(path)
    )
    return run_index_embedding_stream(
        stream,
        os.path.join(work, "out"),
        os.path.join(work, "index"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        centroids_dir=cents_dir,
        threshold=0.99,
    )


def test_stream_pairs_equal_batch_run_and_replay_idempotent(
    spark, tmp_path, corpus
):
    emb = spark.createDataFrame(
        corpus, "vec_id long, embedding array<double>"
    )
    work = str(tmp_path / "work")
    cents_dir = os.path.join(work, "centroids")
    cents = ivf_centroids(emb, 4, corpus_count=len(corpus))
    cents.write.parquet(cents_dir)

    # split so group A (0,1,2) spans batches: 0,1 in batch 0; 2 later
    by_id = {r[0]: r for r in corpus}
    chunk0 = [by_id[i] for i in sorted(by_id) if i in (0, 1, 50, 51)] + [
        by_id[999], by_id[998]
    ]
    chunk1 = [by_id[2]] + [by_id[i] for i in sorted(by_id) if 100 <= i < 115]
    chunk2 = [by_id[i] for i in sorted(by_id) if 115 <= i < 130]
    path = _write_chunks(
        spark, tmp_path, [chunk0, chunk1, chunk2],
        "vec_id long, embedding array<double>",
    )
    q = _start(spark, path, work, cents_dir)
    assert q.awaitTermination(180)

    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in spark.read.parquet(
            os.path.join(work, "out", "batch=*", "pairs")
        ).collect()
    }
    want = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in semantic_dedup_pairs(
            emb, threshold=0.99, centroids=cents
        ).collect()
    }
    assert got == want
    assert (0, 2) in got and (1, 2) in got  # cross-batch discovery
    assert (0, 1) in got and (50, 51) in got  # within-batch discovery
    assert all(999 not in p and 998 not in p for p in got)

    # index holds exactly the non-degenerate ids, partitioned by cell
    idx = spark.read.parquet(os.path.join(work, "index"))
    assert sorted(r["vec_id"] for r in idx.collect()) == sorted(
        i for i in by_id if i not in (998, 999)
    )
    pruned = idx.where(F.col("cell") == 0)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters", 1)[1][:120]

    # a fresh availableNow run over the same source + checkpoint is a
    # no-op: no new pairs, no duplicate index rows
    q2 = _start(spark, path, work, cents_dir)
    assert q2.awaitTermination(120)
    assert (
        spark.read.parquet(os.path.join(work, "index")).count()
        == idx.count()
    )
    got2 = spark.read.parquet(
        os.path.join(work, "out", "batch=*", "pairs")
    ).count()
    assert got2 == len(got)


def test_redelivered_ids_do_not_duplicate_pairs_or_index(spark, tmp_path):
    """At-least-once SOURCE redelivery: a doc redelivered in a LATER
    batch (new batch id, so checkpoint idempotency cannot help) is
    recognized via the index and routed around discovery — its pairs
    are not re-emitted, it is not re-appended, and a pair between a
    redelivered doc and a genuinely new doc is emitted exactly once."""
    import numpy as np

    rng = np.random.default_rng(31)
    base = [float(x) for x in rng.normal(0, 1, 16)]

    def near(eps_seed):
        r2 = np.random.default_rng(eps_seed)
        return [float(x) for x in np.array(base) + r2.normal(0, 1e-3, 16)]

    chunk0 = [(1, near(1)), (2, near(2))]
    # batch 1 REDELIVERS doc 1 alongside the new doc 3 (same cell)
    chunk1 = [(1, near(1)), (3, near(3))]
    path = _write_chunks(
        spark, tmp_path, [chunk0, chunk1],
        "vec_id long, embedding array<double>",
    )
    emb = spark.createDataFrame(
        chunk0 + [(3, near(3))], "vec_id long, embedding array<double>"
    )
    work = str(tmp_path / "work")
    cents_dir = os.path.join(work, "centroids")
    cents = ivf_centroids(emb, 2, corpus_count=3)
    cents.write.parquet(cents_dir)
    q = _start(spark, path, work, cents_dir)
    assert q.awaitTermination(120)

    pairs = spark.read.parquet(
        os.path.join(work, "out", "batch=*", "pairs")
    ).collect()
    got = sorted((r["id_a"], r["id_b"]) for r in pairs)
    assert got == [(1, 2), (1, 3), (2, 3)]  # each exactly once
    idx = spark.read.parquet(os.path.join(work, "index"))
    assert sorted(r["vec_id"] for r in idx.collect()) == [1, 2, 3]


def test_compact_embedding_index_preserves_probes(spark, tmp_path):
    """Per-cell compaction is a physical-layout operation: fewer files
    per cell leaf, identical rows, partition pruning intact."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sinks.compaction import (
        dir_stats,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        compact_embedding_index,
    )

    rng = np.random.default_rng(41)
    chunks = [
        _mk_rows(rng, i * 10, 6) for i in range(3)
    ]  # 3 batches -> up to 3 files per touched cell
    path = _write_chunks(
        spark, tmp_path, chunks, "vec_id long, embedding array<double>"
    )
    emb = spark.createDataFrame(
        [r for c in chunks for r in c], "vec_id long, embedding array<double>"
    )
    work = str(tmp_path / "work")
    cents_dir = os.path.join(work, "centroids")
    ivf_centroids(emb, 2, corpus_count=18).write.parquet(cents_dir)
    q = _start(spark, path, work, cents_dir)
    assert q.awaitTermination(120)

    index_dir = os.path.join(work, "index")
    before = spark.read.parquet(index_dir)
    rows_before = sorted(
        (r["vec_id"], r["cell"]) for r in before.collect()
    )
    files_before = dir_stats(index_dir)[0]
    done = compact_embedding_index(spark, index_dir, min_files=2)
    assert done  # visited at least one cell leaf
    files_after = dir_stats(index_dir)[0]
    assert files_after < files_before
    after = spark.read.parquet(index_dir)
    assert sorted((r["vec_id"], r["cell"]) for r in after.collect()) == rows_before
    pruned = after.where(F.col("cell") == list(done)[0])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_lm_score_stream_matches_batch_against_fixed_model(spark, tmp_path):
    """The persisted-model contract: scores from the stream (chunked
    replay, stateless per batch) equal the one-shot batch run against
    the SAME fitted model, and the model round-trips through parquet
    (write_lm_model / read_lm_model / model=)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        lm_transition_scores,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        read_lm_model,
        run_lm_score_stream,
        write_lm_model,
    )

    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(10)],
        "doc_id long, text string",
    )
    chunks = [
        [(1, "the cat sat"), (2, "zq xv"), (3, None)],
        [(4, "sat on the mat"), (5, "one")],
    ]
    path = _write_chunks(
        spark, tmp_path, chunks, "doc_id long, text string"
    )
    model_dir = str(tmp_path / "model")
    write_lm_model(ref, model_dir)
    out_dir = str(tmp_path / "out")
    stream = (
        spark.readStream.format("parquet")
        .schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .load(path)
    )
    q = run_lm_score_stream(
        stream, out_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        model_dir=model_dir,
    )
    assert q.awaitTermination(120)

    got = {
        r["doc_id"]: (r["n_bigrams"], r["lm_prob_sum"], r["lm_score"])
        for r in spark.read.parquet(out_dir + "/batch=*/scores").collect()
    }
    corpus = spark.createDataFrame(
        [r for c in chunks for r in c], "doc_id long, text string"
    )
    want = {
        r["doc_id"]: (r["n_bigrams"], r["lm_prob_sum"], r["lm_score"])
        for r in lm_transition_scores(
            corpus, model=read_lm_model(spark, model_dir)
        ).collect()
    }
    assert got == want
    # model= equals the reference= training path bit for bit
    direct = {
        r["doc_id"]: (r["n_bigrams"], r["lm_prob_sum"], r["lm_score"])
        for r in lm_transition_scores(corpus, reference=ref).collect()
    }
    assert got == direct
    assert got[3] == (0, 0, None) and got[5] == (0, 0, None)
    assert got[1][0] == 2 and got[2][0] == 1


def test_contamination_stream_matches_batch_against_fixed_benchmark(
    spark, tmp_path
):
    """The persisted-benchmark contract: per-batch overlap rows from
    the stream (chunked replay, stateless per batch) equal the
    one-shot batch contamination_overlap against the SAME benchmark;
    clean docs emit nothing; NULL-text docs shingle to nothing; a
    second availableNow run (retry) duplicates nothing."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        contamination_overlap,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        run_contamination_stream,
        write_benchmark_shingles,
    )

    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    chunks = [
        [
            (1, "we saw the quick brown fox jumps over the fence"),
            (2, "completely unrelated text with zero shared grams"),
            (3, None),
        ],
        [(4, "over the lazy dog tonight it went"), (5, "also clean")],
    ]
    path = _write_chunks(spark, tmp_path, chunks, "doc_id long, text string")
    shingle_dir = str(tmp_path / "bench_shingles")
    write_benchmark_shingles(bench, shingle_dir)
    out_dir = str(tmp_path / "out")

    def _run():
        stream = (
            spark.readStream.format("parquet")
            .schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .load(path)
        )
        q = run_contamination_stream(
            stream,
            out_dir,
            checkpoint_dir=str(tmp_path / "ckpt"),
            shingle_dir=shingle_dir,
        )
        assert q.awaitTermination(120)

    _run()
    got = {
        r["doc_id"]: r["n_overlap"]
        for r in spark.read.parquet(out_dir + "/batch=*/overlap").collect()
    }
    corpus = spark.createDataFrame(
        [r for c in chunks for r in c], "doc_id long, text string"
    )
    want = {
        r["doc_id"]: r["n_overlap"]
        for r in contamination_overlap(corpus, bench).collect()
    }
    assert got == want
    assert 1 in got and 4 in got  # both batches flagged something
    assert 2 not in got and 3 not in got and 5 not in got
    # retry idempotency: committed batches skip wholesale
    _run()
    again = {
        r["doc_id"]: r["n_overlap"]
        for r in spark.read.parquet(out_dir + "/batch=*/overlap").collect()
    }
    assert again == got


def test_recell_embedding_index_mid_replay(spark, tmp_path):
    """Centroid lifecycle (VERDICT r10 task #3): after batch 0 the
    index is retrained on its own vectors and atomically re-celled;
    the resumed stream adopts the new layout (fresh centroids via the
    _meta signature), probes stay cell-pruned, the cross-batch planted
    pair is still discovered (recall floor 1.0 on the planted set
    before AND after the re-cell), and the between-swaps crash window
    heals from the index's co-committed centroid copy."""
    import numpy as np

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        heal_centroid_layout,
        recell_embedding_index,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming.dedup import (
        _meta_signature,
    )
    from .test_streaming_dedup import _one_file

    rng = np.random.default_rng(29)
    a = [float(x) for x in rng.normal(0, 1, 16)]
    b = [float(x) for x in rng.normal(0, 1, 16)]
    mk = lambda i, base: (
        i, [float(x) for x in (np.array(base) + rng.normal(0, 1e-3, 16))]
    )
    chunk0 = [mk(0, a), mk(1, a), mk(50, b), mk(51, b)] + [
        mk(100 + i, None) if False else
        (100 + i, [float(x) for x in rng.normal(0, 1, 16)])
        for i in range(12)
    ]
    work = str(tmp_path / "work")
    cents_dir = os.path.join(work, "centroids")
    index_dir = os.path.join(work, "index")
    schema = "vec_id long, embedding array<double>"
    emb0 = spark.createDataFrame(chunk0, schema)
    ivf_centroids(emb0, 4, corpus_count=len(chunk0)).write.parquet(cents_dir)
    d = tmp_path / "stream"
    _one_file(spark, d, "00.parquet", chunk0, schema)
    q = _start(spark, str(d), work, cents_dir)
    assert q.awaitTermination(180)
    pairs0 = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(
            os.path.join(work, "out", "batch=*", "pairs")
        ).collect()
    }
    assert {(0, 1), (50, 51)} <= pairs0  # recall 1.0 pre-retrain

    # retrain + re-cell on the index's own 16 vectors
    res = recell_embedding_index(
        spark, index_dir, cents_dir, n_cells=2, id_col="vec_id"
    )
    assert res["n_cells"] == 2 and res["n_rows"] == 16
    sig = _meta_signature(spark, index_dir)
    assert sig is not None
    # layout re-celled under the new centroid table: every row's cell
    # is its exact argmax-cosine assignment against the new centroids
    idx = spark.read.parquet(index_dir)
    cells = {r["vec_id"]: r["cell"] for r in idx.collect()}
    assert sorted(cells) == sorted(
        [0, 1, 50, 51] + [100 + i for i in range(12)]
    )
    assert set(cells.values()) <= {0, 1}
    assert cells[0] == cells[1] and cells[50] == cells[51]
    plan = (
        idx.where(F.col("cell") == 0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan

    # drift batch: near-dups of batch-0 members arrive after re-cell
    chunk1 = [mk(2, a), mk(52, b)]
    _one_file(spark, d, "01.parquet", chunk1, schema)
    q2 = _start(spark, str(d), work, cents_dir)
    assert q2.awaitTermination(180)
    pairs1 = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(
            os.path.join(work, "out", "batch=*", "pairs")
        ).collect()
    }
    # recall floor 1.0 on the planted set across the re-cell boundary
    assert {(0, 2), (1, 2), (50, 52), (51, 52)} <= pairs1

    # between-swaps crash window: stale centroids next to a V2 index
    # heal from the index's co-committed copy
    import shutil

    new_cents = spark.read.parquet(cents_dir).collect()
    shutil.rmtree(cents_dir)
    ivf_centroids(emb0, 4, corpus_count=len(chunk0)).write.parquet(cents_dir)
    assert heal_centroid_layout(spark, index_dir, cents_dir) == "restored"
    healed = spark.read.parquet(cents_dir).collect()
    assert sorted(map(tuple, healed)) == sorted(map(tuple, new_cents))
    assert heal_centroid_layout(spark, index_dir, cents_dir) is None


def test_recell_mid_batch_flip_fails_loudly(spark, tmp_path):
    """A re-cell landing DURING a batch (between centroid resolution
    and the index append) raises via the shared mid-batch guard."""
    import numpy as np

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        recell_embedding_index,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming.dedup import (
        _assert_modulus_unchanged,
        _meta_signature,
    )
    from .test_streaming_dedup import _one_file

    rng = np.random.default_rng(31)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 16)]) for i in range(8)]
    work = str(tmp_path / "work")
    cents_dir = os.path.join(work, "centroids")
    index_dir = os.path.join(work, "index")
    schema = "vec_id long, embedding array<double>"
    emb = spark.createDataFrame(rows, schema)
    ivf_centroids(emb, 2, corpus_count=len(rows)).write.parquet(cents_dir)
    d = tmp_path / "stream"
    _one_file(spark, d, "00.parquet", rows, schema)
    q = _start(spark, str(d), work, cents_dir)
    assert q.awaitTermination(180)

    resolved = {"cents_meta_sig": _meta_signature(spark, index_dir)}
    _assert_modulus_unchanged(spark, index_dir, resolved, key="cents")
    recell_embedding_index(spark, index_dir, cents_dir, n_cells=2)
    with pytest.raises(RuntimeError, match="mid-batch"):
        _assert_modulus_unchanged(spark, index_dir, resolved, key="cents")


def test_retry_repair_reassigns_cells_after_recell(spark, tmp_path):
    """The crash-window race the r11 advice named: batch output commits,
    the index append is lost, and recell_embedding_index runs BEFORE the
    retry. The retry adopts the fresh centroids at batch entry (so the
    mid-batch guard passes), but the batch artifact's stored cell column
    still describes the OLD layout — replaying it verbatim would land
    rows in wrong cell= dirs where pruned probes never look. The repair
    branch must therefore RE-ASSIGN the artifact's vectors against the
    currently resolved centroids before appending."""
    import numpy as np

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.similarity import (
        _dot,
        quantize,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        recell_embedding_index,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming.dedup import (
        _touch_success,
    )
    from .test_streaming_dedup import _one_file

    rng = np.random.default_rng(53)
    a = [float(x) for x in rng.normal(0, 1, 16)]
    b = [float(x) for x in rng.normal(0, 1, 16)]
    mk = lambda i, base: (
        i, [float(x) for x in (np.array(base) + rng.normal(0, 1e-3, 16))]
    )
    chunk0 = [mk(0, a), mk(1, a), mk(50, b), mk(51, b)]
    chunk1 = [mk(10, a), mk(60, b)]
    chunk2 = [mk(20, a)]
    schema = "vec_id long, embedding array<double>"
    work = str(tmp_path / "work")
    cents_dir = os.path.join(work, "centroids")
    index_dir = os.path.join(work, "index")
    emb0 = spark.createDataFrame(chunk0, schema)
    ivf_centroids(emb0, 2, corpus_count=len(chunk0)).write.parquet(cents_dir)
    d = tmp_path / "stream"
    _one_file(spark, d, "00.parquet", chunk0, schema)
    q = _start(spark, str(d), work, cents_dir)
    assert q.awaitTermination(180)

    # the recell lands INSIDE the crash window: after batch 1's output
    # commit (simulated below), before its index append
    recell_embedding_index(spark, index_dir, cents_dir, n_cells=2)
    # a byte-identical rerun (no drift, same seed -> same content
    # version) is ALSO success, not an assertion crash (advice r11)
    res2 = recell_embedding_index(spark, index_dir, cents_dir, n_cells=2)
    assert res2["n_cells"] == 2

    # hand-commit batch 1's output artifact with a STALE cell column
    # (cell=777 stands in for any pre-recell assignment): output
    # committed, index append lost — exactly the retry-repair state
    batch_out = os.path.join(work, "out", "batch=1")
    feats = (
        spark.createDataFrame(chunk1, schema)
        .select(F.col("vec_id"), quantize("embedding", "qv"))
        .withColumn("n2", F.expr(_dot("qv", "qv")))
        .withColumn("cell", F.lit(777))
    )
    feats.write.parquet(os.path.join(batch_out, "vecs"))
    spark.createDataFrame(
        [], "id_a long, id_b long, cosine double"
    ).write.parquet(os.path.join(batch_out, "pairs"))
    _touch_success(spark, batch_out)

    # deliver chunk1 as batch 1 -> the runner takes the repair branch
    _one_file(spark, d, "01.parquet", chunk1, schema)
    q2 = _start(spark, str(d), work, cents_dir)
    assert q2.awaitTermination(180)

    idx = {r["vec_id"]: r["cell"] for r in
           spark.read.parquet(index_dir).collect()}
    assert 10 in idx and 60 in idx  # the lost append was repaired
    assert 777 not in set(idx.values())  # never under the stale cell
    # re-assignment matches the live layout: the repaired rows share
    # their group's post-recell cell
    assert idx[10] == idx[0] and idx[60] == idx[50]

    # and they are probe-VISIBLE: a later near-dup of a repaired row
    # finds it through the cell-pruned index read
    _one_file(spark, d, "02.parquet", chunk2, schema)
    q3 = _start(spark, str(d), work, cents_dir)
    assert q3.awaitTermination(180)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(
            os.path.join(work, "out", "batch=*", "pairs")
        ).collect()
    }
    assert {(0, 20), (1, 20), (10, 20)} <= pairs


def test_probe_embedding_index_filtered(spark, tmp_path, corpus):
    """The standing index as a FILTERED vector-search server
    (probe_embedding_index + extra_cols): metadata rides the index
    rows, the probe's predicate lands in the pruned cell scan
    (PushedFilters + PartitionFilters — never rank-then-discard),
    nprobe = all cells makes the probe exact vs the hand-filtered
    brute-force baseline, extras SURVIVE a centroid retrain/re-cell,
    and a forgotten vector stops being served immediately."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        cosine_topk,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        forget_index_keys,
        probe_embedding_index,
        recell_embedding_index,
    )

    labeled = [
        (i, v, None if i == 998 else int(i % 2)) for i, v in corpus
    ]
    schema = "vec_id long, embedding array<double>, label int"
    emb = spark.createDataFrame(labeled, schema)
    work = str(tmp_path / "work")
    cents_dir = os.path.join(work, "centroids")
    n_cells = 4
    ivf_centroids(emb, n_cells).write.parquet(cents_dir)
    path = _write_chunks(
        spark, tmp_path, [labeled[: len(labeled) // 2],
                          labeled[len(labeled) // 2:]], schema,
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(path)
    )
    q = run_index_embedding_stream(
        stream,
        os.path.join(work, "out"),
        os.path.join(work, "index"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        centroids_dir=cents_dir,
        threshold=0.99,
        extra_cols=("label",),
    )
    assert q.awaitTermination(180)
    index_dir = os.path.join(work, "index")
    assert "label" in spark.read.parquet(index_dir).columns

    queries = emb.filter(F.col("vec_id") < 3)

    def probe(**kw):
        return probe_embedding_index(
            spark, index_dir, cents_dir, queries,
            k=4, nprobe=n_cells, predicate="label = 1", **kw
        )

    def pairs(df):
        return {(r["query_id"], r["vec_id"], r["rank"]) for r in df.collect()}

    want = pairs(cosine_topk(emb.where("label = 1"), queries, k=4))
    got_df = probe()
    assert pairs(got_df) == want

    # the predicate and the cell prune both land in the INDEX scan
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters", 1)[1][:120]
    pushed = [s.split("]")[0] for s in plan.split("PushedFilters: [")[1:]]
    assert any("label" in s for s in pushed), plan

    # extras survive the full re-cell rewrite; the probe still serves
    recell_embedding_index(
        spark, index_dir, cents_dir, n_cells=n_cells, max_iter=2
    )
    assert "label" in spark.read.parquet(index_dir).columns
    assert pairs(probe()) == want

    # erasure: a forgotten vector stops being served at the next probe
    victim = sorted(v for _, v, _ in want)[0]
    forget_index_keys(
        spark, index_dir, [victim], key_col="vec_id", part_col="cell"
    )
    after = pairs(probe())
    assert victim not in {v for _, v, _ in after}
