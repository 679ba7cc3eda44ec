"""Erasure propagation (streaming/forget.py) — the r11 verdict's
"Missing #1": right-to-be-forgotten must reach the standing indexes
and the cluster label store, not just the feature store.

Contracts pinned here:

* a forgotten key never reappears as a dup partner — across later
  probes, replay, compaction, re-bucket and re-cell;
* physical bytes are gone (pyarrow walk over every parquet file, not
  just a logical read) after the purge / after vacuum;
* tombstone-only (amortized) erasure suppresses probes immediately
  and the next compaction completes the physical drop;
* cluster-store erasure re-derives the touched subgraph: removing a
  CUT VERTEX splits its cluster, removing the component MINIMUM
  re-labels the survivors upward — both beyond the monotone delta
  fold, both exact here;
* an erased id re-ingested AFTER the purge is a fresh document:
  re-discovered, re-indexed, re-clustered;
* the maintain_cli forget / forget-store surface runs end-to-end.
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
    forget_cluster_store,
    forget_index_keys,
    purge_forgotten,
    read_cluster_labels,
    read_index_tombstones,
    rebucket_banded_index,
    resolve_text_hashes,
    run_cluster_maintain_stream,
    run_index_dedup_stream,
    run_index_hamming_stream,
    scrub_batch_outputs,
    vacuum_cluster_store,
)

from .test_streaming_dedup import _one_file


def _val_in_any_parquet(root: str, col: str, val) -> bool:
    """PHYSICAL-bytes check: walk every parquet file under ``root`` and
    look for ``val`` in column ``col`` — a logical read can be fooled
    by tombstone filtering; this cannot."""
    import pyarrow.parquet as pq

    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(dirpath, f))
            if col in t.column_names and val in t.column(col).to_pylist():
                return True
    return False


# ------------------------------------------------------------- exact index


def test_forget_exact_hash_readmits_future_copies(spark, tmp_path):
    """Erasing a document from the exact-hash index (keyed by its
    text_hash, resolved through the committed survivor artifacts)
    removes its dedup footprint: a LATER copy of the same text is
    admitted as a new document, and the hash bytes are gone from the
    index between the purge and that re-admission."""
    schema = "doc_id long, text string"
    d = tmp_path / "stream"
    out_dir = str(tmp_path / "out")
    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    def _run():
        stream = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(str(d))
        )
        q = run_index_dedup_stream(
            stream, out_dir, index_dir, checkpoint_dir=ckpt, n_buckets=4
        )
        assert q.awaitTermination(120)

    _one_file(spark, d, "00.parquet", [(1, "alpha"), (2, "beta")], schema)
    _run()
    _one_file(spark, d, "01.parquet", [(3, "alpha")], schema)
    _run()
    # doc 3 was a duplicate of the (now to-be-forgotten) doc 1
    assert spark.read.parquet(f"{out_dir}/batch=1").count() == 0

    hashes = resolve_text_hashes(spark, out_dir, [1])
    assert len(hashes) == 1
    res = forget_index_keys(
        spark, index_dir, hashes, key_col="text_hash"
    )
    assert res["tombstoned"] == 1 and res["purged_leaves"] >= 1
    # physical: the hash bytes are out of the index, tombstones retired
    assert not _val_in_any_parquet(index_dir, "text_hash", hashes[0])
    assert read_index_tombstones(spark, index_dir) is None
    # the survivor artifacts can be scrubbed too
    assert scrub_batch_outputs(spark, out_dir, [1]) == [0]
    assert not _val_in_any_parquet(out_dir, "doc_id", 1)

    # a future copy of the erased text is a NEW document
    _one_file(spark, d, "02.parquet", [(4, "alpha")], schema)
    _run()
    assert [
        r["doc_id"]
        for r in spark.read.parquet(f"{out_dir}/batch=2").collect()
    ] == [4]


# ----------------------------------------------------------- hamming index


@pytest.fixture()
def hamming_setup(spark, tmp_path):
    """Batch 0 indexes doc 1 (fp P) and doc 2 (far fp); the test then
    forgets doc 1 and replays near-dups."""
    schema = "doc_id long, fp long"
    d = tmp_path / "stream"
    out_dir = str(tmp_path / "out")
    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    P = 0x00FF_00FF_00FF_00FF

    def _run():
        stream = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(str(d))
        )
        q = run_index_hamming_stream(
            stream, out_dir, index_dir, checkpoint_dir=ckpt,
            max_hamming=3, bands=4, n_buckets=4,
        )
        assert q.awaitTermination(120)

    _one_file(
        spark, d, "00.parquet",
        [(1, P), (2, 0x0F0F_0F0F_0F0F_0F0F)], schema,
    )
    _run()
    return d, out_dir, index_dir, schema, P, _run


def test_forget_hamming_removes_dup_partner(spark, tmp_path, hamming_setup):
    d, out_dir, index_dir, schema, P, _run = hamming_setup
    res = forget_index_keys(spark, index_dir, [1], key_col="doc_id")
    assert res["purged_leaves"] >= 1
    assert not _val_in_any_parquet(index_dir, "doc_id", 1)

    # docs 3 (near 1) and 4 (near 3): the forgotten doc pairs with
    # nothing; pairing machinery itself still works (3, 4 pair)
    _one_file(
        spark, d, "01.parquet", [(3, P ^ 0b1), (4, P ^ 0b10)], schema
    )
    _run()
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(
            os.path.join(out_dir, "batch=*", "pairs")
        ).collect()
    }
    assert (3, 4) in pairs
    assert all(1 not in p for p in pairs)


def test_tombstone_only_suppresses_then_compaction_purges(
    spark, tmp_path, hamming_setup
):
    """The amortized path: purge=False suppresses the key at the next
    probe while the bytes remain; the next compaction physically
    drops them and retires the tombstones."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        compact_banded_index,
    )

    d, out_dir, index_dir, schema, P, _run = hamming_setup
    res = forget_index_keys(
        spark, index_dir, [1], key_col="doc_id", purge=False
    )
    assert res == {"tombstoned": 1, "purged_leaves": 0}
    # bytes still there, probe already suppressed
    assert _val_in_any_parquet(index_dir, "doc_id", 1)
    _one_file(spark, d, "01.parquet", [(3, P ^ 0b1)], schema)
    _run()
    pairs = spark.read.parquet(
        os.path.join(out_dir, "batch=*", "pairs")
    ).collect()
    assert pairs == []

    compact_banded_index(spark, index_dir, min_files=1)
    assert not _val_in_any_parquet(index_dir, "doc_id", 1)
    assert read_index_tombstones(spark, index_dir) is None


def test_rebucket_does_not_resurrect_forgotten_rows(
    spark, tmp_path, hamming_setup
):
    """An online re-bucket rewrites every row under the new modulus —
    pending tombstones must be applied during that rewrite, or the new
    layout (which carries no _tombstones dir) would resurrect them."""
    d, out_dir, index_dir, schema, P, _run = hamming_setup
    forget_index_keys(spark, index_dir, [1], key_col="doc_id", purge=False)
    assert rebucket_banded_index(spark, index_dir, ("band", "bv")) == 8
    assert not _val_in_any_parquet(index_dir, "doc_id", 1)
    assert read_index_tombstones(spark, index_dir) is None
    # doc 2 survived the rewrite
    assert _val_in_any_parquet(index_dir, "doc_id", 2)


# --------------------------------------------------------- embedding index


def test_forget_embedding_vector(spark, tmp_path):
    """Forget a vector from the standing cell-partitioned index: no
    later near-dup pairs with it, bytes gone; a re-cell after a
    tombstone-only forget purges instead of resurrecting."""
    import numpy as np

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        ivf_centroids,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        recell_embedding_index,
    )
    from .test_streaming_similarity import _start

    rng = np.random.default_rng(61)
    a = [float(x) for x in rng.normal(0, 1, 16)]
    b = [float(x) for x in rng.normal(0, 1, 16)]
    mk = lambda i, base: (
        i, [float(x) for x in (np.array(base) + rng.normal(0, 1e-3, 16))]
    )
    chunk0 = [mk(1, a), mk(2, a), mk(50, b)]
    schema = "vec_id long, embedding array<double>"
    work = str(tmp_path / "work")
    cents_dir = os.path.join(work, "centroids")
    index_dir = os.path.join(work, "index")
    emb = spark.createDataFrame(chunk0, schema)
    ivf_centroids(emb, 2, corpus_count=len(chunk0)).write.parquet(cents_dir)
    d = tmp_path / "stream"
    _one_file(spark, d, "00.parquet", chunk0, schema)
    q = _start(spark, str(d), work, cents_dir)
    assert q.awaitTermination(180)

    forget_index_keys(
        spark, index_dir, [1], key_col="vec_id", part_col="cell"
    )
    assert not _val_in_any_parquet(index_dir, "vec_id", 1)

    # pre-forget pairs naming the id are historical ARTIFACTS — the
    # outputs scrub erases them (the probes themselves never re-emit)
    assert scrub_batch_outputs(
        spark, os.path.join(work, "out"), [1]
    ) == [0]

    # a near-dup of the forgotten vector pairs only with the survivor
    _one_file(spark, d, "01.parquet", [mk(3, a)], schema)
    q2 = _start(spark, str(d), work, cents_dir)
    assert q2.awaitTermination(180)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(
            os.path.join(work, "out", "batch=*", "pairs")
        ).collect()
    }
    assert (2, 3) in pairs
    assert all(1 not in p for p in pairs)
    assert not _val_in_any_parquet(
        os.path.join(work, "out"), "id_a", 1
    ) and not _val_in_any_parquet(os.path.join(work, "out"), "id_b", 1)

    # tombstone-only forget + re-cell: the rewrite purges, the new
    # layout carries no tombstones, nothing resurrects
    forget_index_keys(
        spark, index_dir, [2], key_col="vec_id", part_col="cell",
        purge=False,
    )
    recell_embedding_index(spark, index_dir, cents_dir, n_cells=2)
    assert not _val_in_any_parquet(index_dir, "vec_id", 2)
    assert read_index_tombstones(spark, index_dir) is None
    assert _val_in_any_parquet(index_dir, "vec_id", 3)


# ----------------------------------------------------------- cluster store


def test_forget_cluster_store_split_relabel_and_vacuum(spark, tmp_path):
    """The full store-erasure contract on one fixture: docs 1-2-3 chain
    into one cluster (2 is the cut vertex), 4 is an untouched
    singleton. Forgetting 2:

    * SPLITS the chain — 1 and 3 become singletons (beyond the
      monotone delta fold);
    * leaves the untouched cluster alone;
    * after vacuum, the erased id's bytes are gone from every parquet
      under the store AND (via forget_index_keys) the discovery
      index;
    * a later re-ingest with the same fingerprint re-bridges the
      survivors — erase-then-readmit is clean."""
    schema = "doc_id long, fp long"
    d = tmp_path / "stream"
    out_dir = str(tmp_path / "store")
    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    P = 0x00FF_00FF_00FF_00FF

    def _run():
        stream = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(str(d))
        )
        q = run_cluster_maintain_stream(
            stream, out_dir, index_dir, checkpoint_dir=ckpt,
            id_col="doc_id", hash_col="fp", n_buckets=4,
        )
        assert q.awaitTermination(180)

    rows = [
        (1, P),
        (2, P ^ 0b111),            # hamming(1,2)=3
        (3, P ^ 0b111 ^ 0b111000),  # hamming(2,3)=3, hamming(1,3)=6
        (4, 0x0F0F_0F0F_0F0F_0F0F),
    ]
    _one_file(spark, d, "00.parquet", rows, schema)
    _run()
    labels = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in read_cluster_labels(spark, out_dir).collect()
    }
    assert labels[1] == (1, 3) and labels[2] == (1, 3) and labels[3] == (1, 3)
    assert labels[4] == (4, 1)

    res = forget_cluster_store(spark, out_dir, [2])
    assert res["forgotten"] == 1 and res["touched_clusters"] == 1
    assert res["fps_scrubbed"] == [0]
    idx_res = forget_index_keys(spark, index_dir, [2], key_col="doc_id")
    assert idx_res["purged_leaves"] >= 1

    labels = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in read_cluster_labels(spark, out_dir).collect()
    }
    assert 2 not in labels
    assert labels[1] == (1, 1, 1)  # split: both survivors are singletons
    assert labels[3] == (3, 1, 1)
    assert labels[4] == (4, 1, 1)  # untouched cluster intact

    # physical bytes: fps scrubbed + index purged immediately; label
    # history below the compaction goes at vacuum (delete + vacuum,
    # the feature-store two-step)
    assert not _val_in_any_parquet(index_dir, "doc_id", 2)
    vacuum_cluster_store(spark, out_dir)
    assert not _val_in_any_parquet(out_dir, "doc_id", 2)
    assert _val_in_any_parquet(out_dir, "doc_id", 1)  # survivors intact

    # re-ingest with the erased doc's fingerprint re-bridges 1 and 3
    _one_file(spark, d, "01.parquet", [(5, P ^ 0b111)], schema)
    _run()
    labels = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in read_cluster_labels(spark, out_dir).collect()
    }
    assert labels[1] == (1, 3) and labels[3] == (1, 3) and labels[5] == (1, 3)


def test_forget_cluster_store_relabels_when_minimum_erased(spark, tmp_path):
    """Erasing the component MINIMUM moves the survivors' label UP —
    the other direction the monotone fold cannot express."""
    schema = "doc_id long, fp long"
    d = tmp_path / "stream"
    out_dir = str(tmp_path / "store")
    index_dir = str(tmp_path / "index")
    P = 0x00FF_00FF_00FF_00FF
    _one_file(spark, d, "00.parquet", [(1, P), (2, P ^ 0b1)], schema)
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
    )
    q = run_cluster_maintain_stream(
        stream, out_dir, index_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        id_col="doc_id", hash_col="fp", n_buckets=4,
    )
    assert q.awaitTermination(180)
    res = forget_cluster_store(spark, out_dir, [1])
    assert res["forgotten"] == 1
    labels = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in read_cluster_labels(spark, out_dir).collect()
    }
    assert labels == {2: (2, 1, 1)}
    # forgetting an id the store never held is a safe no-op
    assert forget_cluster_store(spark, out_dir, [99])["forgotten"] == 0


def test_maintain_cli_forget_end_to_end(spark, tmp_path, capsys):
    """CLI surface: forget-store --index --vacuum erases a doc from
    store + discovery index and prints the JSON manifest."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.maintain_cli import (
        main,
    )

    schema = "doc_id long, fp long"
    d = tmp_path / "stream"
    out_dir = str(tmp_path / "store")
    index_dir = str(tmp_path / "index")
    P = 0x00FF_00FF_00FF_00FF
    _one_file(
        spark, d, "00.parquet", [(1, P), (2, P ^ 0b1), (9, ~P)], schema
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
    )
    q = run_cluster_maintain_stream(
        stream, out_dir, index_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        id_col="doc_id", hash_col="fp", n_buckets=4,
    )
    assert q.awaitTermination(180)

    assert main([
        "forget-store", "--path", out_dir, "--index", index_dir,
        "--ids", "2", "--vacuum",
    ]) == 0
    manifest = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert manifest["forgotten"] == 1
    assert manifest["index"]["tombstoned"] == 1
    assert not _val_in_any_parquet(out_dir, "doc_id", 2)
    assert not _val_in_any_parquet(index_dir, "doc_id", 2)
    labels = {
        r["doc_id"] for r in read_cluster_labels(spark, out_dir).collect()
    }
    assert labels == {1, 9}


def test_appends_filter_pending_tombstones(spark, tmp_path):
    """The r12 review's resurrection guard: while an erasure is in
    flight (tombstone pending), NO append — fresh or retry repair —
    can re-enter a suppressed key into the index."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming.dedup import (
        _append_index,
        _ensure_index_buckets,
        _index_bucket,
    )

    index_dir = str(tmp_path / "index")
    _ensure_index_buckets(spark, index_dir, 4)
    rows = spark.createDataFrame(
        [(1, 111), (2, 222)], "doc_id long, text_hash long"
    ).withColumn("ibucket", _index_bucket(4, "text_hash"))
    _append_index(rows, index_dir)
    forget_index_keys(spark, index_dir, [1], key_col="doc_id", purge=False)
    # a retry repair (or a redelivered batch) re-appends the same rows:
    # the suppressed key is filtered, the live key is not
    _append_index(rows, index_dir)
    idx = spark.read.parquet(index_dir)
    assert idx.where("doc_id = 1").count() == 1  # only the pre-tombstone copy
    assert idx.where("doc_id = 2").count() == 2
    # purge then drops the suppressed copy and retires the tombstone
    purge_forgotten(spark, index_dir)
    assert not _val_in_any_parquet(index_dir, "doc_id", 1)
    assert read_index_tombstones(spark, index_dir) is None
