"""maintain_cli: the operator-facing surface over the standing-store
maintenance primitives. One JSON manifest line per subcommand; the
underlying atomic-swap semantics are pinned in test_streaming_dedup —
here we drive the CLI end-to-end over real runner-built artifacts."""

from __future__ import annotations

import datetime as dt
import json
import os

from amazon_sagemaker_feature_store_streaming_aggregation_spark import maintain_cli

T0 = dt.datetime(2024, 1, 1)


def _one_file(spark, d, name, rows, schema):
    import glob
    import shutil
    import time

    d.mkdir(exist_ok=True)
    f = str(d / name)
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f + ".dir")
    shutil.copy(glob.glob(f + ".dir/*.parquet")[0], f)
    shutil.rmtree(f + ".dir")
    os.utime(f, (time.time(), time.time()))


def _build_lsh_index(spark, tmp_path):
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        run_index_lsh_stream,
    )

    t_a = "the quick brown fox jumps over the lazy dog again and again"
    t_b = "completely different prose describing spark execution engines"
    schema = "doc_id long, text string"
    d = tmp_path / "stream"
    _one_file(spark, d, "00.parquet", [(1, t_a), (2, t_b)], schema)
    q = run_index_lsh_stream(
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(str(d)),
        str(tmp_path / "out"),
        str(tmp_path / "index"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=4,
    )
    assert q.awaitTermination(180)
    return str(tmp_path / "index")


def test_maintain_cli_index_ops(spark, tmp_path, capsys):
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming.dedup import (
        _ensure_index_buckets,
    )

    index_dir = _build_lsh_index(spark, tmp_path)
    rows_before = sorted(
        map(tuple, spark.read.parquet(index_dir).drop("ibucket").collect())
    )

    assert maintain_cli.main(["compact-index", "--path", index_dir]) == 0
    m1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m1["cmd"] == "compact-index" and "files_per_bucket" in m1

    assert maintain_cli.main(
        ["rebucket-index", "--path", index_dir,
         "--keys", "band,bhash", "--factor", "4"]
    ) == 0
    m2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m2["n_buckets"] == 16
    assert _ensure_index_buckets(spark, index_dir, None) == 16
    rows_after = sorted(
        map(tuple, spark.read.parquet(index_dir).drop("ibucket").collect())
    )
    assert rows_before == rows_after


def test_maintain_cli_store_ops(spark, tmp_path, capsys):
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.dedup import simhash
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        read_cluster_labels,
        run_cluster_maintain_stream,
    )

    t_a = "the quick brown fox jumps over the lazy dog again and again"
    schema = "doc_id long, text string"
    d = tmp_path / "stream"
    _one_file(
        spark, d, "00.parquet", [(1, t_a), (2, t_a), (3, "unrelated")], schema
    )
    out_dir = str(tmp_path / "store")
    fps = simhash(
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(str(d))
    ).withColumnRenamed("simhash", "fp")
    q = run_cluster_maintain_stream(
        fps, out_dir, str(tmp_path / "cindex"),
        checkpoint_dir=str(tmp_path / "cckpt"),
        n_buckets=4, n_bits=60,
    )
    assert q.awaitTermination(180)
    before = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in read_cluster_labels(spark, out_dir).collect()
    )

    assert maintain_cli.main(["compact-store", "--path", out_dir]) == 0
    m1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m1["compacted_through"] is not None

    assert maintain_cli.main(
        ["rebucket-store", "--path", out_dir, "--factor", "2"]
    ) == 0
    m2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m2["n_buckets"] == 8

    assert maintain_cli.main(["vacuum-store", "--path", out_dir]) == 0
    m3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert isinstance(m3["removed"], list)

    after = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in read_cluster_labels(spark, out_dir).collect()
    )
    assert before == after and len(after) == 3


def test_maintain_cli_retrain_centroids(spark, tmp_path, capsys):
    """retrain-centroids end-to-end over a runner-built embedding
    index: one JSON manifest line, new centroid_version pinned in the
    index _meta, centroids dir swapped to the same version, layout
    re-celled to the requested cell count."""
    import numpy as np

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import ivf_centroids
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        run_index_embedding_stream,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming.similarity import (
        _read_centroid_version,
    )

    rng = np.random.default_rng(17)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 8)]) for i in range(10)]
    schema = "vec_id long, embedding array<double>"
    d = tmp_path / "stream"
    _one_file(spark, d, "00.parquet", rows, schema)
    cents_dir = str(tmp_path / "centroids")
    index_dir = str(tmp_path / "index")
    emb = spark.createDataFrame(rows, schema)
    ivf_centroids(emb, 2, corpus_count=len(rows)).write.parquet(cents_dir)
    q = run_index_embedding_stream(
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(str(d)),
        str(tmp_path / "out"), index_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        centroids_dir=cents_dir, threshold=0.99,
    )
    assert q.awaitTermination(180)

    rc = maintain_cli.main(
        ["retrain-centroids", "--path", index_dir,
         "--centroids", cents_dir, "--cells", "3", "--seed", "7"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["cmd"] == "retrain-centroids"
    assert out["n_cells"] == 3 and out["n_rows"] == 10
    v = out["centroid_version"]
    assert _read_centroid_version(spark, index_dir) == v
    assert _read_centroid_version(spark, cents_dir) == v
    idx = spark.read.parquet(index_dir)
    assert idx.count() == 10
    assert set(r["cell"] for r in idx.select("cell").distinct().collect()) <= {0, 1, 2}
