"""OLAP star-schema plans: correctness vs DuckDB + plan-shape checks."""

from __future__ import annotations

import duckdb
import pytest

from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import (
    pricing_summary,
    revenue_by_nation,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

from .conftest import SF001


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF001}/{t}.parquet')"
        )
    yield con
    con.close()


def test_pricing_summary_matches_duckdb(spark, duck):
    got = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in pricing_summary(load_table(spark, SF001, "lineitem")).collect()
    }
    c = "CAST(round({c} * 100) AS BIGINT)"
    ep, d, t = (c.format(c=x) for x in ("l_extendedprice", "l_discount", "l_tax"))
    exp = duck.execute(f"""
        SELECT l_returnflag, l_linestatus,
               sum(CAST(round(l_quantity) AS BIGINT)),
               CAST(sum({ep}) AS DOUBLE) / 100.0,
               CAST(sum({ep} * (100 - {d})) AS DOUBLE) / 10000.0,
               CAST(sum({ep} * (100 - {d}) * (100 + {t})) AS DOUBLE) / 1000000.0,
               count(*)
        FROM lineitem WHERE l_shipdate < TIMESTAMP '2001-09-01'
        GROUP BY 1, 2
    """).fetchall()
    assert len(exp) == len(got)
    for rf, ls, qty, base, disc, charge, cnt in exp:
        r = got[(rf, ls)]
        assert r["sum_qty"] == qty
        assert r["sum_base_price"] == base      # bit-exact, no tolerance
        assert r["sum_disc_price"] == disc
        assert r["sum_charge"] == charge
        assert r["count_order"] == cnt


def test_revenue_by_nation_matches_duckdb(spark, duck):
    df = revenue_by_nation(
        load_table(spark, SF001, "lineitem"),
        load_table(spark, SF001, "orders"),
        load_table(spark, SF001, "customer"),
        load_table(spark, SF001, "nation"),
    )
    got = {r["n_name"]: r for r in df.collect()}
    c = "CAST(round({c} * 100) AS BIGINT)"
    ep, d = c.format(c="l_extendedprice"), c.format(c="l_discount")
    exp = duck.execute(f"""
        SELECT n_name, CAST(sum({ep} * (100 - {d})) AS DOUBLE) / 10000.0,
               count(DISTINCT o_orderkey), count(*)
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """).fetchall()
    assert len(exp) == len(got) > 0
    for name, rev, orders, items in exp:
        r = got[name]
        assert r["revenue"] == rev
        assert r["n_orders"] == orders
        assert r["n_items"] == items


def test_pricing_summary_plan_shape(spark):
    plan = (
        pricing_summary(load_table(spark, SF001, "lineitem"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # map-side partial aggregation before the exchange
    assert "partial_sum" in plan or "HashAggregate" in plan
    # shipdate predicate reaches the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_revenue_plan_broadcasts_dimensions(spark):
    plan = (
        revenue_by_nation(
            load_table(spark, SF001, "lineitem"),
            load_table(spark, SF001, "orders"),
            load_table(spark, SF001, "customer"),
            load_table(spark, SF001, "nation"),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the two dimension joins are broadcasts by construction
    assert plan.count("BroadcastHashJoin") >= 2
    # the orders date filter is pushed into the scan
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan


def test_topk_orders_deterministic_and_limited(spark):
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import (
        topk_orders_per_customer,
    )

    df = topk_orders_per_customer(
        load_table(spark, SF001, "orders"),
        load_table(spark, SF001, "customer"),
        k=3,
    )
    rows = df.collect()
    per_cust = {}
    for r in rows:
        per_cust.setdefault(r["c_custkey"], []).append(r)
    for grp in per_cust.values():
        assert len(grp) <= 3
        grp.sort(key=lambda r: r["order_rank"])
        prices = [r["o_totalprice"] for r in grp]
        assert prices == sorted(prices, reverse=True)
    # WindowGroupLimit: the rank filter is pushed below the sort
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_revenue_cube_subtotals_consistent(spark):
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import revenue_cube

    rows = revenue_cube(
        load_table(spark, SF001, "orders"),
        load_table(spark, SF001, "customer"),
        load_table(spark, SF001, "nation"),
    ).collect()
    grand = [r for r in rows if r["g_nation"] == 1 and r["g_priority"] == 1]
    assert len(grand) == 1
    cells = [r for r in rows if r["g_nation"] == 0 and r["g_priority"] == 0]
    assert abs(sum(c["revenue"] for c in cells) - grand[0]["revenue"]) < 1e-6
    assert sum(c["n_orders"] for c in cells) == grand[0]["n_orders"] == 15000


def test_q17_correlated_sql_equals_decorrelated_dataframe(spark):
    """The SQL surface with the CORRELATED scalar subquery must give
    the same answer as the hand-decorrelated DataFrame plan — i.e.
    Catalyst's decorrelation and our spelled-out rewrite agree."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import small_quantity_revenue

    li = load_table(spark, SF001, "lineitem")
    pt = load_table(spark, SF001, "part")
    li.createOrReplaceTempView("v_lineitem")
    pt.createOrReplaceTempView("v_part")
    try:
        sql_row = spark.sql("""
            SELECT CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                                 AS DECIMAL(38,0))) AS BIGINT)
                     AS small_qty_revenue_cents,
                   count(*) AS n_items
            FROM v_lineitem l
            JOIN v_part ON l.l_partkey = p_partkey AND p_brand = 'Brand#13'
            WHERE l.l_quantity < (
              SELECT CAST(sum(CAST(round(l2.l_quantity) AS BIGINT)) AS DOUBLE)
                       / count(*) * 0.2
              FROM v_lineitem l2
              WHERE l2.l_partkey = l.l_partkey
            )
        """).collect()[0]
        df_row = small_quantity_revenue(li, pt).collect()[0]
        assert tuple(sql_row) == tuple(df_row)
        assert df_row["n_items"] > 0
    finally:
        spark.catalog.dropTempView("v_lineitem")
        spark.catalog.dropTempView("v_part")


def test_time_decay_features_dyadic_weights(spark):
    import datetime as _dt

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.analytics import time_decay_features

    anchor = _dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (1, anchor, 10.0),                                  # u=0, w=1
        (1, anchor - _dt.timedelta(days=14), 8.0),          # u=2, w=1/4
        (2, anchor - _dt.timedelta(days=7), 4.0),           # u=1, w=1/2
        (2, anchor - _dt.timedelta(days=500), 1000.0),      # beyond horizon
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = {r.user_id: r for r in time_decay_features(df).collect()}
    assert out[1].n_events == 2
    assert out[1].decayed_value == 10.0 + 8.0 / 4
    assert out[1].decayed_count == 1 + 0.25
    # the 500-day-old event is excluded, not rounded in
    assert out[2].n_events == 1
    assert out[2].decayed_value == 4.0 / 2
    assert out[2].decayed_count == 0.5


def test_rolling_corr_counts_gap_days_as_zero(spark):
    """A calendar day with no event in EITHER series must enter the
    trailing frame as (0, 0): n_days counts calendar days, not
    observed days."""
    import datetime as _dt

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.analytics import rolling_correlation

    def ev(day, typ, v):
        return (_dt.datetime(2024, 1, day, 12, 0, 0), typ, v)

    # events on Jan 1 and Jan 10 only — Jan 2-9 are empty calendar days
    rows = [ev(1, "purchase", 1.0), ev(1, "view", 2.0),
            ev(10, "purchase", 3.0), ev(10, "view", 4.0)]
    df = spark.createDataFrame(rows, ["ts", "event_type", "value"])
    out = {r.day.day: r for r in rolling_correlation(df).collect()}
    # the dense grid materializes all 10 days
    assert sorted(out) == list(range(1, 11))
    # Jan 7's trailing week is Jan 1-7: 7 calendar days in frame
    assert out[7].n_days == 7
    # Jan 10's frame (Jan 4-10) holds one real day + six zero days
    assert out[10].n_days == 7
