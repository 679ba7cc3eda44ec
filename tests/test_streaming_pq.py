"""IVF-PQ standing vector index (streaming/similarity_pq.py).

Contracts pinned: planted-dup recall floor 1.0 across batches (true
near-dups sit at the top of the ADC ranking, so the shortlist cut
cannot lose them); replay + redelivery idempotency on BOTH stores;
compression actually realized (index bytes/vector a fraction of the
exact store's — the SCALE.md measurement); recode (retrain + re-cell +
re-code) adopted by a resumed runner with recall intact, its
between-swaps crash window healing from the index's co-committed
copies; erasure reaching both stores.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
    ivf_centroids,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.similarity import (
    pq_codebooks,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
    forget_index_keys,
    heal_pq_layout,
    pq_index_stats,
    recode_pq_index,
    run_index_embedding_pq_stream,
)

from .test_streaming_dedup import _one_file

SCHEMA = "vec_id long, embedding array<double>"


def _mk(rng, i, base, eps=1e-3):
    return (i, [float(x) for x in (np.array(base) + rng.normal(0, eps, 16))])


@pytest.fixture()
def setup(spark, tmp_path):
    rng = np.random.default_rng(23)
    a = [float(x) for x in rng.normal(0, 1, 16)]
    b = [float(x) for x in rng.normal(0, 1, 16)]
    chunk0 = (
        [_mk(rng, 0, a), _mk(rng, 1, a), _mk(rng, 50, b), _mk(rng, 51, b)]
        + [(100 + i, [float(x) for x in rng.normal(0, 1, 16)])
           for i in range(12)]
        + [(999, [0.0] * 16), (998, None)]
    )
    chunk1 = [_mk(rng, 2, a), _mk(rng, 52, b)]  # cross-batch near-dups
    work = str(tmp_path / "work")
    dirs = {
        "out": os.path.join(work, "out"),
        "index": os.path.join(work, "index"),
        "vecs": os.path.join(work, "vecs"),
        "ckpt": os.path.join(work, "ckpt"),
        "cents": os.path.join(work, "centroids"),
        "cbs": os.path.join(work, "codebooks"),
    }
    emb = spark.createDataFrame(chunk0 + chunk1, SCHEMA)
    ivf_centroids(emb, 4, corpus_count=20).write.parquet(dirs["cents"])
    pq_codebooks(emb, m=4, n_codes=8, corpus_count=20).write.parquet(
        dirs["cbs"]
    )
    d = tmp_path / "stream"
    _one_file(spark, d, "00.parquet", chunk0, SCHEMA)
    return d, dirs, chunk0, chunk1, rng, (a, b)


def _start(spark, d, dirs, shortlist=8):
    stream = (
        spark.readStream.format("parquet")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
    )
    return run_index_embedding_pq_stream(
        stream, dirs["out"], dirs["index"], dirs["vecs"],
        checkpoint_dir=dirs["ckpt"], centroids_dir=dirs["cents"],
        codebooks_dir=dirs["cbs"], threshold=0.99, shortlist=shortlist,
        m=4, n_buckets=4,
    )


def _pairs(spark, dirs):
    return {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(
            os.path.join(dirs["out"], "batch=*", "pairs")
        ).collect()
    }


def test_recall_replay_redelivery_and_compression(spark, tmp_path, setup):
    d, dirs, chunk0, chunk1, rng, (a, b) = setup
    _one_file(spark, d, "01.parquet", chunk1, SCHEMA)
    q = _start(spark, str(d), dirs)
    assert q.awaitTermination(180)

    got = _pairs(spark, dirs)
    # planted recall floor 1.0: within-batch AND cross-batch dups —
    # near-identical vectors have ADC distance ~0, top of every
    # shortlist, so the cut cannot lose them
    assert {(0, 1), (50, 51), (0, 2), (1, 2), (50, 52), (51, 52)} <= got
    assert all(999 not in p and 998 not in p for p in got)
    # both stores hold exactly the non-degenerate ids
    live = sorted(
        i for i, v in (chunk0 + chunk1)
        if v is not None and any(x != 0.0 for x in v)
    )
    idx = spark.read.parquet(dirs["index"])
    assert sorted(r["vec_id"] for r in idx.collect()) == live
    vecs = spark.read.parquet(dirs["vecs"])
    assert sorted(r["vec_id"] for r in vecs.collect()) == live

    # compression realized: the cell index (m=4 ints/vector) is a
    # fraction of the exact store (64 bigints/vector) — the SCALE.md
    # bytes-per-vector measurement
    stats = pq_index_stats(spark, dirs["index"], dirs["vecs"])
    assert stats["index_rows"] == stats["vecs_rows"] == len(live)
    assert (
        stats["index_bytes_per_vector"]
        < stats["vecs_bytes_per_vector"] / 3
    )

    # replay idempotency: a fresh availableNow run is a no-op
    n_idx, n_vecs, n_pairs = idx.count(), vecs.count(), len(got)
    q2 = _start(spark, str(d), dirs)
    assert q2.awaitTermination(120)
    assert spark.read.parquet(dirs["index"]).count() == n_idx
    assert spark.read.parquet(dirs["vecs"]).count() == n_vecs
    assert len(_pairs(spark, dirs)) == n_pairs

    # at-least-once SOURCE redelivery (new batch id): routed around
    # discovery and both appends
    _one_file(spark, d, "02.parquet", chunk1, SCHEMA)
    q3 = _start(spark, str(d), dirs)
    assert q3.awaitTermination(120)
    assert spark.read.parquet(dirs["index"]).count() == n_idx
    assert spark.read.parquet(dirs["vecs"]).count() == n_vecs
    assert _pairs(spark, dirs) == got


def test_recode_mid_replay_adoption_and_heal(spark, tmp_path, setup):
    d, dirs, chunk0, chunk1, rng, (a, b) = setup
    q = _start(spark, str(d), dirs)
    assert q.awaitTermination(180)

    res = recode_pq_index(
        spark, dirs["index"], dirs["vecs"], dirs["cents"], dirs["cbs"],
        n_cells=2, m=4, n_codes=8,
    )
    assert res["n_rows"] == 16 and res["n_cells"] == 2
    # byte-identical rerun is success, not a crash (the recell rule)
    assert recode_pq_index(
        spark, dirs["index"], dirs["vecs"], dirs["cents"], dirs["cbs"],
        n_cells=2, m=4, n_codes=8,
    )["pq_version"] == res["pq_version"]
    idx = spark.read.parquet(dirs["index"])
    cells = {r["vec_id"]: r["cell"] for r in idx.collect()}
    assert set(cells.values()) <= {0, 1}
    assert cells[0] == cells[1] and cells[50] == cells[51]

    # resumed runner ADOPTS the new layout: cross-batch planted pairs
    # still discovered (recall floor 1.0 across the recode)
    _one_file(spark, d, "01.parquet", chunk1, SCHEMA)
    q2 = _start(spark, str(d), dirs)
    assert q2.awaitTermination(180)
    assert {(0, 2), (1, 2), (50, 52), (51, 52)} <= _pairs(spark, dirs)

    # between-swaps crash window: stale external dirs heal from the
    # index's co-committed copies
    import shutil

    new_cents = spark.read.parquet(dirs["cents"]).collect()
    new_cbs = spark.read.parquet(dirs["cbs"]).collect()
    shutil.rmtree(dirs["cents"])
    shutil.rmtree(dirs["cbs"])
    emb = spark.createDataFrame(chunk0, SCHEMA)
    ivf_centroids(emb, 4, corpus_count=18).write.parquet(dirs["cents"])
    pq_codebooks(emb, m=4, n_codes=8, corpus_count=18).write.parquet(
        dirs["cbs"]
    )
    assert heal_pq_layout(
        spark, dirs["index"], dirs["cents"], dirs["cbs"]
    ) == "restored"
    assert sorted(
        map(tuple, spark.read.parquet(dirs["cents"]).collect())
    ) == sorted(map(tuple, new_cents))
    assert sorted(
        map(tuple, spark.read.parquet(dirs["cbs"]).collect())
    ) == sorted(map(tuple, new_cbs))
    assert heal_pq_layout(
        spark, dirs["index"], dirs["cents"], dirs["cbs"]
    ) is None


def test_forget_reaches_both_pq_stores(spark, tmp_path, setup):
    d, dirs, chunk0, chunk1, rng, (a, b) = setup
    q = _start(spark, str(d), dirs)
    assert q.awaitTermination(180)
    forget_index_keys(
        spark, dirs["index"], [0], key_col="vec_id", part_col="cell"
    )
    forget_index_keys(spark, dirs["vecs"], [0], key_col="vec_id")
    from .test_forget import _val_in_any_parquet

    assert not _val_in_any_parquet(dirs["index"], "vec_id", 0)
    assert not _val_in_any_parquet(dirs["vecs"], "vec_id", 0)
    # a later near-dup pairs only with the surviving twin
    _one_file(spark, d, "01.parquet", chunk1, SCHEMA)
    q2 = _start(spark, str(d), dirs)
    assert q2.awaitTermination(180)
    batch1 = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(
            os.path.join(dirs["out"], "batch=1", "pairs")
        ).collect()
    }
    assert (1, 2) in batch1
    assert all(0 not in p for p in batch1)


def test_runner_rejects_adopted_m_mismatch(spark, tmp_path, setup):
    """A recode-pq with a DIFFERENT subspace count must fail the
    resumed runner loudly (the pinned-layout rule): silently slicing
    the old m against new codes would zip mismatched widths into NULL
    distances and half-blind shortlists."""
    d, dirs, chunk0, chunk1, rng, (a, b) = setup
    q = _start(spark, str(d), dirs)
    assert q.awaitTermination(180)
    recode_pq_index(
        spark, dirs["index"], dirs["vecs"], dirs["cents"], dirs["cbs"],
        n_cells=2, m=8, n_codes=8,
    )
    _one_file(spark, d, "01.parquet", chunk1, SCHEMA)
    q2 = _start(spark, str(d), dirs)  # still m=4
    with pytest.raises(Exception, match="m=8"):
        q2.awaitTermination(180)
        q2.processAllAvailable()


def test_probe_lut_one_row_per_query(spark, tmp_path, monkeypatch):
    """probe_pq_index builds its ADC lookup table from ONE row per
    query — never from the exploded (query x probed cell) assignment
    (the r13 advice finding: a LUT keyed off that side duplicates
    every (query_id, subspace, code) row once per probed cell, so the
    ADC join and sum do nprobe x the work and every adc_dist is
    scaled by the probed-cell count — and the gated exact-probe
    contract runs nprobe = the full cell count). Pinned by spying on
    the LUT builder's input cardinality at nprobe = n_cells, plus the
    exact-baseline equality that proves the rewrite changed nothing."""
    import amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming.similarity_pq as spq
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        cosine_topk,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        probe_pq_index,
    )

    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.normal(0, 1, 16)]) for i in range(24)
    ]
    emb = spark.createDataFrame(rows, SCHEMA)
    work = str(tmp_path / "lutwork")
    dirs = {
        "out": os.path.join(work, "out"),
        "index": os.path.join(work, "index"),
        "vecs": os.path.join(work, "vecs"),
        "ckpt": os.path.join(work, "ckpt"),
        "cents": os.path.join(work, "centroids"),
        "cbs": os.path.join(work, "codebooks"),
    }
    n_cells = 4
    ivf_centroids(emb, n_cells, corpus_count=24).write.parquet(dirs["cents"])
    pq_codebooks(emb, m=4, n_codes=8, corpus_count=24).write.parquet(
        dirs["cbs"]
    )
    d = tmp_path / "lutstream"
    _one_file(spark, d, "00.parquet", rows, SCHEMA)
    stream = (
        spark.readStream.format("parquet")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
    )
    q = run_index_embedding_pq_stream(
        stream, dirs["out"], dirs["index"], dirs["vecs"],
        checkpoint_dir=dirs["ckpt"], centroids_dir=dirs["cents"],
        codebooks_dir=dirs["cbs"], threshold=0.99, m=4, n_buckets=4,
    )
    assert q.awaitTermination(180)

    queries = emb.filter(F.col("vec_id") < 3)
    seen: list = []
    orig = spq._batch_lut

    def spy(lrows, cbs, id_col, m, w):
        seen.append(lrows.count())
        return orig(lrows, cbs, id_col, m, w)

    monkeypatch.setattr(spq, "_batch_lut", spy)
    got = probe_pq_index(
        spark, dirs["index"], dirs["vecs"], dirs["cents"], dirs["cbs"],
        queries, k=4, nprobe=n_cells, shortlist=100, m=4,
    )
    assert seen == [3]  # one LUT row-source row per query, not x nprobe
    want = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in cosine_topk(emb, queries, k=4).collect()
    }
    assert {(r["query_id"], r["vec_id"], r["rank"])
            for r in got.collect()} == want


def test_probe_pq_index_filtered(spark, tmp_path):
    """The IVF-PQ two-store layout as a FILTERED vector-search server
    (probe_pq_index + extra_cols on BOTH stores): metadata rides the
    code index AND the exact store, the probe's predicate lands in
    the pruned cell scan of the CODE index (PushedFilters +
    PartitionFilters — non-qualifying vectors never enter the ADC
    ranking), full-probe/full-shortlist equals the hand-filtered
    exact baseline, extras SURVIVE a recode (which re-derives code
    rows from the exact store), and a forgotten vector stops being
    served."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        cosine_topk,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        probe_pq_index,
    )

    rng = np.random.default_rng(31)
    labeled = [
        (i, [float(x) for x in rng.normal(0, 1, 16)], int(i % 2))
        for i in range(40)
    ] + [(999, [0.0] * 16, 1), (998, None, 0)]
    schema = "vec_id long, embedding array<double>, label int"
    emb = spark.createDataFrame(labeled, schema)
    work = str(tmp_path / "work")
    dirs = {
        "out": os.path.join(work, "out"),
        "index": os.path.join(work, "index"),
        "vecs": os.path.join(work, "vecs"),
        "ckpt": os.path.join(work, "ckpt"),
        "cents": os.path.join(work, "centroids"),
        "cbs": os.path.join(work, "codebooks"),
    }
    n_cells = 4
    ivf_centroids(emb, n_cells, corpus_count=42).write.parquet(dirs["cents"])
    pq_codebooks(emb, m=4, n_codes=8, corpus_count=42).write.parquet(
        dirs["cbs"]
    )
    d = tmp_path / "stream"
    _one_file(spark, d, "00.parquet", labeled[:20], schema)
    _one_file(spark, d, "01.parquet", labeled[20:], schema)
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
    )
    q = run_index_embedding_pq_stream(
        stream, dirs["out"], dirs["index"], dirs["vecs"],
        checkpoint_dir=dirs["ckpt"], centroids_dir=dirs["cents"],
        codebooks_dir=dirs["cbs"], threshold=0.99, shortlist=8,
        m=4, n_buckets=4, extra_cols=("label",),
    )
    assert q.awaitTermination(180)
    assert "label" in spark.read.parquet(dirs["index"]).columns
    assert "label" in spark.read.parquet(dirs["vecs"]).columns

    queries = emb.filter(F.col("vec_id") < 3)

    def probe(**kw):
        return probe_pq_index(
            spark, dirs["index"], dirs["vecs"], dirs["cents"], dirs["cbs"],
            queries, k=4, nprobe=n_cells, shortlist=100, m=4,
            predicate="label = 1", **kw
        )

    def pairs(df):
        return {(r["query_id"], r["vec_id"], r["rank"]) for r in df.collect()}

    want = pairs(cosine_topk(emb.where("label = 1"), queries, k=4))
    got_df = probe()
    assert pairs(got_df) == want

    # predicate + cell prune both land in the CODE-index scan — pin
    # the exact frame the ADC ranking consumes (probe_pq_index
    # checkpoints the shortlist, so this scan never appears in the
    # final result's plan)
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming.similarity_pq import (
        _pruned_code_scan,
    )

    cells = [
        r[0]
        for r in spark.read.parquet(dirs["cents"]).select("cell").collect()
    ]
    plan = (
        _pruned_code_scan(spark, dirs["index"], cells, "label = 1")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters: [", 1)[1][:120], plan
    pushed = [s.split("]")[0] for s in plan.split("PushedFilters: [")[1:]]
    assert any("label" in s for s in pushed), plan

    # extras survive the full recode rewrite (code rows re-derived
    # from the exact store, which carries them)
    recode_pq_index(
        spark, dirs["index"], dirs["vecs"], dirs["cents"], dirs["cbs"],
        n_cells=n_cells, m=4, n_codes=8, max_iter=2,
    )
    assert "label" in spark.read.parquet(dirs["index"]).columns
    assert pairs(probe()) == want

    # erasure: forget from BOTH stores, the probe stops serving it
    victim = sorted(v for _, v, _ in want)[0]
    forget_index_keys(
        spark, dirs["index"], [victim], key_col="vec_id", part_col="cell"
    )
    forget_index_keys(spark, dirs["vecs"], [victim], key_col="vec_id")
    after = pairs(probe())
    assert victim not in {v for _, v, _ in after}
