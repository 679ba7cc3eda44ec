"""Watermark-based streaming aggregation (append mode): windows are
HELD in state until the watermark passes their end — nothing emits in
the batch that receives the data — and the finalized output equals
the batch GROUP BY twin over everything that was admitted.

Pinned Spark behavior note: a late row whose window never had state
may still be ADMITTED as a fresh state entry (the watermark contract
guarantees state eviction, not input dropping) — so a bounded replay
loses nothing and the batch-equality holds even with cross-batch
disorder. Hard late-event DROPPING (reference I1) is a separate,
explicit age filter in streaming/sources.py, tested in
test_streaming_inference.py.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil
import time

from pyspark.sql import functions as F

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _write_chunks(spark, tmp_path, chunks, schema):
    d = tmp_path / "stream"
    d.mkdir()
    now = time.time()
    for i, rows in enumerate(chunks):
        f = str(d / f"{i:02d}.parquet")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f + ".dir")
        shutil.copy(glob.glob(f + ".dir/*.parquet")[0], f)
        shutil.rmtree(f + ".dir")
        os.utime(f, (now + i * 60, now + i * 60))
    return str(d)


def test_tumbling_append_emits_on_watermark_and_matches_batch(
    spark, tmp_path
):
    schema = "user_id long, ts timestamp, value double"
    mk = lambda u, s, v: (u, T0 + dt.timedelta(seconds=s), v)
    chunk0 = [mk(1, 0, 1.0), mk(1, 60, 3.0), mk(2, 10, 5.0)]
    late = [mk(1, -3600, 99.0)]   # arrives after watermark passed it
    flush = [mk(-1, 10**7, 0.0)]  # far-future sentinel
    path = _write_chunks(spark, tmp_path, [chunk0, late, flush], schema)

    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(path)
    )
    agg = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "1 hour"), "user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .select("user_id", F.col("window.end").alias("we"), "n", "s")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("tumble_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    # append mode: the batch that RECEIVED chunk0 emitted nothing —
    # its windows were still open (watermark had not passed 13:00)
    sink_out = {
        p["batchId"]: p["sink"]["numOutputRows"] for p in q.recentProgress
    }
    assert sink_out.get(0) == 0, sink_out
    # ...and in total only the watermark-finalized windows ever emitted
    assert sum(sink_out.values()) == 3, sink_out

    # final output equals the batch GROUP BY over all admitted events
    rows = {
        (r["user_id"], r["we"]): (r["n"], r["s"])
        for r in spark.table("tumble_test").collect()
        if r["user_id"] >= 0
    }
    hour_end = T0 + dt.timedelta(hours=1)
    assert rows == {
        (1, hour_end): (2, 4.0),
        (2, hour_end): (1, 5.0),
        (1, T0): (1, 99.0),  # late row admitted as fresh state, finalized
    }
