"""Stream-stream interval join: inner matches within the time range
emit; rows outside the range never pair; watermark + range condition
bound state.

Reference parity: the reference has no stream-stream join (its joins
are stream-to-static point lookups, `InvokeFraudEndpointLambda`);
this is an extension operator per SURVEY §7.1.
"""

from __future__ import annotations

import datetime as dt

import pytest

from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import interval_join

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _mk_stream(spark, tmp_path, name, rows, schema):
    d = tmp_path / name
    d.mkdir()
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "00.parquet"))
    return (
        spark.readStream.format("parquet")
        .schema(schema)
        .load(str(d / "00.parquet"))
    )


def _run(spark, df, name, ckpt):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    return spark.table(name)


def test_interval_join_matches_within_range_only(spark, tmp_path):
    lschema = "user_id long, a_id long, a_ts timestamp"
    rschema = "user_id long, b_id long, b_ts timestamp"
    sec = lambda s: T0 + dt.timedelta(seconds=s)
    left_rows = [(1, 10, sec(0)), (1, 11, sec(300)), (2, 20, sec(0))]
    right_rows = [
        (1, 100, sec(30)),    # within +-60s of a_id=10
        (1, 101, sec(250)),   # within +-60s of a_id=11, not 10
        (1, 102, sec(500)),   # matches nothing
        (3, 300, sec(0)),     # key with no left side
    ]
    left = _mk_stream(spark, tmp_path, "l", left_rows, lschema)
    right = _mk_stream(spark, tmp_path, "r", right_rows, rschema)
    out = _run(
        spark,
        interval_join(left, right, key="user_id", left_ts="a_ts",
                      right_ts="b_ts", lower_s=-60, upper_s=60),
        "ij_out",
        tmp_path / "ckpt",
    )
    pairs = sorted((r["a_id"], r["b_id"]) for r in out.collect())
    assert pairs == [(10, 100), (11, 101)]
    assert "__rkey" not in out.columns


def test_left_outer_interval_join_flushes_unmatched_after_watermark(
    spark, tmp_path
):
    """Unmatched left rows emit with NULL right columns — but only
    once the watermark passes their match horizon, which the far-
    future second batch provides on BOTH sides (min-watermark
    policy)."""
    lschema = "user_id long, a_id long, a_ts timestamp"
    rschema = "user_id long, b_id long, b_ts timestamp"
    sec = lambda s: T0 + dt.timedelta(seconds=s)
    far = sec(10**7)

    def _chunked(name, chunks, schema):
        import glob
        import os
        import shutil
        import time

        d = tmp_path / name
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
        return (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(str(d))
        )

    left = _chunked(
        "lo",
        [[(1, 10, sec(0)), (2, 20, sec(0))], [(-1, -1, far)]],
        lschema,
    )
    right = _chunked(
        "ro",
        [[(1, 100, sec(30))], [(-1, -100, far)]],  # user 2 never matches
        rschema,
    )
    out = _run(
        spark,
        interval_join(left, right, key="user_id", left_ts="a_ts",
                      right_ts="b_ts", lower_s=-60, upper_s=60,
                      how="left_outer"),
        "ijo_out",
        tmp_path / "ckpt_o",
    )
    rows = {
        r["a_id"]: r["b_id"] for r in out.collect() if r["user_id"] >= 0
    }
    assert rows == {10: 100, 20: None}


def test_full_outer_interval_join_emits_both_unmatched_sides(
    spark, tmp_path
):
    lschema = "user_id long, a_id long, a_ts timestamp"
    rschema = "user_id long, b_id long, b_ts timestamp"
    sec = lambda s: T0 + dt.timedelta(seconds=s)
    far = sec(10**7)

    def _chunked(name, chunks, schema):
        import glob
        import os
        import shutil
        import time

        d = tmp_path / name
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
        return (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(str(d))
        )

    left = _chunked(
        "lf",
        [[(1, 10, sec(0)), (2, 20, sec(0))], [(-1, -1, far)]],
        lschema,
    )
    right = _chunked(
        "rf",
        [[(1, 100, sec(30)), (3, 300, sec(0))], [(-1, -100, far)]],
        rschema,
    )
    out = _run(
        spark,
        interval_join(left, right, key="user_id", left_ts="a_ts",
                      right_ts="b_ts", lower_s=-60, upper_s=60,
                      how="full_outer"),
        "ijf_out",
        tmp_path / "ckpt_f",
    )
    rows = sorted(
        (
            (r["a_id"], r["b_id"])
            for r in out.collect()
            if (r["a_id"] or 0) >= 0 and (r["b_id"] or 0) >= 0
        ),
        key=lambda t: (t[0] if t[0] is not None else -1,
                       t[1] if t[1] is not None else -1),
    )
    # right-unmatched (None, 300), matched pair, left-unmatched (20, None)
    assert rows == [(None, 300), (10, 100), (20, None)]


def test_interval_join_matches_batch_self_join(spark, tmp_path):
    """Stream result equals the batch interval join over the same rows."""
    lschema = "user_id long, a_id long, a_ts timestamp"
    rschema = "user_id long, b_id long, b_ts timestamp"
    sec = lambda s: T0 + dt.timedelta(seconds=s)
    left_rows = [(u, u * 10 + i, sec(i * 45)) for u in (1, 2) for i in range(4)]
    right_rows = [(u, u * 100 + i, sec(i * 45 + 20)) for u in (1, 2) for i in range(4)]

    left_s = _mk_stream(spark, tmp_path, "l2", left_rows, lschema)
    right_s = _mk_stream(spark, tmp_path, "r2", right_rows, rschema)
    out = _run(
        spark,
        interval_join(left_s, right_s, key="user_id", left_ts="a_ts",
                      right_ts="b_ts", lower_s=-60, upper_s=60),
        "ij_out2",
        tmp_path / "ckpt2",
    )
    got = sorted((r["a_id"], r["b_id"]) for r in out.collect())

    lb = spark.createDataFrame(left_rows, lschema)
    rb = spark.createDataFrame(right_rows, rschema).withColumnRenamed(
        "user_id", "u2"
    )
    import pyspark.sql.functions as F

    batch = lb.join(
        rb,
        (F.col("user_id") == F.col("u2"))
        & (F.col("b_ts") >= F.col("a_ts") - F.expr("INTERVAL 60 SECONDS"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 60 SECONDS")),
    )
    want = sorted((r["a_id"], r["b_id"]) for r in batch.collect())
    assert got == want and len(want) > 0
