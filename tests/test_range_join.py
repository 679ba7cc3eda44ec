"""Batch range join (operators/range_join.py): bucketed-explode
rewrite — correctness on crafted intervals, equivalence to the naive
theta join, and the no-nested-loop plan guarantee."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import range_join

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def _frames(spark):
    points = spark.createDataFrame(
        [(i, 7, _ts(i * 1000)) for i in range(10)],
        "pid long, k long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (100, 7, _ts(500), _ts(2500)),     # covers pids 1,2
            (101, 7, _ts(2000), _ts(2000)),    # degenerate: pid 2 exactly
            (102, 7, _ts(8999), _ts(9001)),    # pid 9 on the boundary
            (103, 8, _ts(0), _ts(10_000)),     # wrong key: matches nothing
        ],
        "iid long, k long, lo timestamp, hi timestamp",
    )
    return points, ivs


def test_range_join_inner_matches_naive(spark):
    points, ivs = _frames(spark)
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            points, ivs, point_ts="ts", lo="lo", hi="hi", key="k",
            bucket_s=900,
        ).collect()
    )
    naive = sorted(
        (r["pid"], r["iid"])
        for r in points.alias("p")
        .join(
            ivs.withColumnRenamed("k", "k2").alias("i"),
            (F.col("k") == F.col("k2"))
            & (F.col("ts") >= F.col("lo"))
            & (F.col("ts") <= F.col("hi")),
        )
        .collect()
    )
    assert got == naive == [(1, 100), (2, 100), (2, 101), (9, 102)]


def test_range_join_left_outer_keeps_unmatched_points(spark):
    points, ivs = _frames(spark)
    out = range_join(
        points, ivs, point_ts="ts", lo="lo", hi="hi", key="k",
        bucket_s=900, how="left_outer",
    )
    rows = sorted((r["pid"], r["iid"]) for r in out.collect())
    matched = [(1, 100), (2, 100), (2, 101), (9, 102)]
    unmatched = [(p, None) for p in (0, 3, 4, 5, 6, 7, 8)]
    assert rows == sorted(matched + unmatched)


def test_range_join_plans_as_equi_join_not_nested_loop(spark):
    points, ivs = _frames(spark)
    from .conftest import plan_str

    plan = plan_str(
        range_join(points, ivs, point_ts="ts", lo="lo", hi="hi", key="k")
    )
    assert "NestedLoop" not in plan, plan
    assert "Join" in plan and "Explode" not in plan.split("Join")[0], plan


def test_range_join_empty_interval_side(spark):
    points, ivs = _frames(spark)
    empty = ivs.where("iid < 0")
    assert range_join(
        points, empty, point_ts="ts", lo="lo", hi="hi", key="k"
    ).count() == 0
    outer = range_join(
        points, empty, point_ts="ts", lo="lo", hi="hi", key="k",
        how="left_outer",
    )
    rows = outer.collect()
    assert len(rows) == points.count()
    assert all(r["iid"] is None for r in rows)


def test_degenerate_intervals_cannot_match_or_explode(spark):
    """lo > hi can never contain a point; the guard also prevents the
    DESCENDING sequence() explode such rows would otherwise pay."""
    import datetime as dt

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.range_join import range_join

    t0 = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame([(1, t0)], "pid long, ts timestamp")
    iv = spark.createDataFrame(
        [
            # valid covering interval
            (10, t0 - dt.timedelta(hours=1), t0 + dt.timedelta(hours=1)),
            # degenerate: lo far AFTER hi (would explode ~9000 hourly
            # buckets descending without the guard)
            (11, t0 + dt.timedelta(days=365), t0 - dt.timedelta(days=10)),
        ],
        "iid long, lo timestamp, hi timestamp",
    )
    inner = range_join(pts, iv, point_ts="ts", lo="lo", hi="hi").collect()
    assert [r["iid"] for r in inner] == [10]
    outer = range_join(
        pts, iv, point_ts="ts", lo="lo", hi="hi", how="left_outer"
    ).collect()
    assert len(outer) == 1 and outer[0]["iid"] == 10
