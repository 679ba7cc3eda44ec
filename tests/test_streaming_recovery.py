"""Checkpoint recovery for the stream->store upsert (U3): a restarted
query resumes from committed offsets (only new files process), the
store converges to latest-per-key across the whole stream, and a
restart with no new data leaves the store untouched (no version
churn) — the at-least-once + idempotent-merge contract."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil
import time

from amazon_sagemaker_feature_store_streaming_aggregation_spark.featurestore import FeatureGroup
from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import start_stream_upsert

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)
SCHEMA = "cc_num long, ts timestamp, amount double"


def _add_chunk(spark, d, idx, rows):
    f = str(d / f"{idx:02d}.parquet")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f + ".dir")
    shutil.copy(glob.glob(f + ".dir/*.parquet")[0], f)
    shutil.rmtree(f + ".dir")
    os.utime(f, (time.time() + idx, time.time() + idx))


def _run_once(spark, src, fg, ckpt):
    stream = (
        spark.readStream.format("parquet").schema(SCHEMA).load(str(src))
    )
    q = start_stream_upsert(stream, fg, str(ckpt), ts="ts",
                            available_now=True)
    assert q.awaitTermination(120)


def _store(fg):
    return {
        r["cc_num"]: r["amount"] for r in fg.get_latest().collect()
    }


def test_restart_resumes_from_offsets_and_is_idempotent(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    fg = FeatureGroup(
        spark, "recov-fg", "cc_num", "trans_time", str(tmp_path / "store"),
        n_buckets=2,
    )
    sec = lambda s: T0 + dt.timedelta(seconds=s)

    _add_chunk(spark, src, 0, [(1, sec(0), 10.0), (2, sec(1), 20.0)])
    _run_once(spark, src, fg, ckpt)
    assert _store(fg) == {1: 10.0, 2: 20.0}

    # restart after new data arrives: only the new file processes,
    # and the merge keeps key 2 from the first run
    _add_chunk(spark, src, 1, [(1, sec(100), 11.0), (3, sec(101), 30.0)])
    _run_once(spark, src, fg, ckpt)
    assert _store(fg) == {1: 11.0, 2: 20.0, 3: 30.0}

    # restart with NO new data: no micro-batch runs, no version churn
    versions_before = [fg._bucket_version(b) for b in range(fg.n_buckets)]
    _run_once(spark, src, fg, ckpt)
    versions_after = [fg._bucket_version(b) for b in range(fg.n_buckets)]
    assert versions_after == versions_before
    assert _store(fg) == {1: 11.0, 2: 20.0, 3: 30.0}
