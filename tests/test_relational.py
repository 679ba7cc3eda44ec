"""Relational-coverage plans (plans/relational.py): semi/anti joins,
set operators, distinct aggregation, scalar regex/date functions,
JSON/array functions, exact + approximate percentiles.

The sf0.01 DuckDB oracle compare is the main gate; these tests pin the
semantics on small inline frames where the expected answer is obvious,
plus the approx-vs-exact percentile error-bound contract that no SQL
oracle can express.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import (
    approx_value_percentiles,
    churned_buyers,
    customers_with_urgent_orders,
    dormant_customers,
    repeat_buyers,
    user_value_arrays,
    value_percentiles,
)

D = lambda y, m=1, d=1: dt.datetime(y, m, d)

_ORDERS = "o_orderkey long, o_custkey long, o_orderpriority string, o_orderdate timestamp, o_totalprice double"
_CUST = "c_custkey long, c_name string, c_mktsegment string, c_acctbal double, c_nationkey int"


def _orders(spark):
    rows = [
        (1, 1, "1-URGENT", D(1996, 3), 10.0),
        (2, 1, "3-MEDIUM", D(1997, 5), 11.0),
        (3, 2, "3-MEDIUM", D(1996, 7), 12.0),   # cust 2: 1996 only
        (4, 3, "1-URGENT", D(1997, 2), 13.0),   # cust 3: 1997 only
    ]
    return spark.createDataFrame(rows, _ORDERS)


def _cust(spark):
    rows = [
        (1, "Customer#000000001", "BUILDING", 5.0, 0),
        (2, "Customer#000000002", "BUILDING", 6.0, 1),
        (3, "Customer#000000003", "AUTOMOBILE", 7.0, 2),
        (4, "Customer#000000004", "BUILDING", 8.0, 3),  # no orders
    ]
    return spark.createDataFrame(rows, _CUST)


def test_semi_join_keeps_matching_customers_once(spark):
    out = customers_with_urgent_orders(_cust(spark), _orders(spark))
    assert sorted(r["c_custkey"] for r in out.collect()) == [1]
    assert out.columns == ["c_custkey", "c_name", "c_acctbal"]


def test_anti_join_finds_dormant_customers(spark):
    # since=1997: cust 2 only ordered in 1996, cust 4 never ordered
    out = dormant_customers(_cust(spark), _orders(spark), since="1997-01-01")
    assert sorted(r["c_custkey"] for r in out.collect()) == [2, 4]


def test_intersect_and_except_are_distinct_sets(spark):
    o = _orders(spark)
    assert sorted(r["custkey"] for r in repeat_buyers(o).collect()) == [1]
    assert sorted(r["custkey"] for r in churned_buyers(o).collect()) == [2]


def test_value_arrays_fold_to_scalars(spark):
    ev = spark.createDataFrame(
        [(1, 2.00), (1, 1.00), (1, 3.00), (2, 5.00)],
        "user_id long, value double",
    )
    rows = {r["user_id"]: r for r in user_value_arrays(ev).collect()}
    assert (rows[1]["n_values"], rows[1]["v_min"], rows[1]["v_max"],
            rows[1]["v_sum"]) == (3, 100, 300, 600)
    assert rows[2]["v_sum"] == 500


def test_exact_percentiles_pick_disc_ranks(spark):
    # 10 values 1..10 dollars => cents 100..1000; p50 -> rank 5 (500),
    # p90 -> rank 9 (900), p99 -> rank ceil(9.9)=10 (1000)
    ev = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 11)],
        "event_type string, value double",
    )
    r = value_percentiles(ev).collect()[0]
    assert (r["p50_cents"], r["p90_cents"], r["p99_cents"]) == (500, 900, 1000)


def test_approx_percentiles_track_exact_within_sketch_error(spark):
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    exact = {r["event_type"]: r for r in value_percentiles(ev).collect()}
    approx = {r["event_type"]: r for r in approx_value_percentiles(ev).collect()}
    assert exact.keys() == approx.keys()
    n = ev.count()
    for et, ex in exact.items():
        for c in ("p50_cents", "p90_cents", "p99_cents"):
            # GK accuracy 10000 => rank error <= n/10000; translate to a
            # generous value tolerance via the observed value spread
            assert abs(approx[et][c] - ex[c]) <= max(50, ex[c] * 0.05), (
                et, c, approx[et][c], ex[c], n)


def test_approx_count_distinct_tracks_exact_within_rsd(spark):
    """HLL++ sketch twin of the exact distinct aggregate: single-pass,
    mergeable — the 100x path when exact cardinality is negotiable.
    rsd=0.01 keeps observed error well within 5% on real data."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", 0.01).alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(2, 0.05 * r["exact"]), (
            r["event_type"], r["approx"], r["exact"])


def test_salted_join_equals_plain_and_scatters_keys(spark, tmp_path):
    """Salted join == plain join row-for-row, and under a forced
    shuffled join the physical keys include the salt (the hot key is
    scattered across salt partitions)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import salted_join
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    from .conftest import SF0001, plan_str

    ev = load_table(spark, SF0001, "events").select(
        "event_id", "user_id", "value"
    )
    cust = load_table(spark, SF0001, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    got = salted_join(ev, cust, on="user_id", salt_source="event_id")
    want = ev.join(cust, on="user_id")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_str(
            salted_join(ev, cust, on="user_id", salt_source="event_id")
        )
        assert "__salt" in plan.split("Join")[0] or "__salt" in plan, plan
        assert "BroadcastHashJoin" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_variant_histogram_equals_json_path_twin(spark):
    """VARIANT extraction must agree with the get_json_object twin,
    including null payloads (null variant -> null k -> null bucket)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.relational import (
        variant_props_histogram,
    )

    rows = [('{"k": 7}',), ('{"k": 17}',), ('{"k": 20}',), (None,)]
    ev = spark.createDataFrame(rows, ["props"])
    nullsafe = lambda r: tuple((v is None, v) for v in r)  # noqa: E731
    got = sorted(map(tuple, variant_props_histogram(ev).collect()), key=nullsafe)
    twin = sorted(
        map(
            tuple,
            ev.selectExpr("cast(get_json_object(props, '$.k') as bigint) as k")
            .groupBy(F.pmod(F.col("k"), F.lit(10)).alias("k_mod"))
            .agg(
                F.count("*").alias("n_events"),
                F.sum("k").alias("sum_k"),
                F.min("k").alias("min_k"),
                F.max("k").alias("max_k"),
            )
            .collect(),
        ),
        key=nullsafe,
    )
    assert got == twin
    assert (7 % 10, 2, 24, 7, 17) in got  # 7 and 17 share bucket 7
