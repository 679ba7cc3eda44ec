"""General OLAP analytics plans over the warehouse tables (extension).

The reference pipeline only ever aggregates its own transaction stream;
an analytics engine also needs classic star-schema OLAP: wide fact
scans with partial aggregation, and fact-to-dimension joins where the
dimensions are broadcast. These two plans exercise exactly that on the
TPC-H-shaped tables (``lineitem``/``orders``/``customer``/``nation``),
with the repo's integer-cent discipline so every money aggregate is an
exact integer sum (order-independent -> bit-equal in DuckDB) and only
the FINAL projection divides back to dollars.

Scale design:

* ``pricing_summary`` — single fact scan, 4-column pruning, map-side
  partial aggregation into 4 groups: the shuffle moves O(partitions x
  groups) pre-aggregated rows, not the fact table. Integer sums are
  widened to ``decimal(38,0)`` before summing: the charge term is
  ~1e11 per row in 1e-6-dollar units, which overflows int64 around
  1e8 rows per group — real at 100 TB.
* ``revenue_by_nation`` — fact-to-fact join (lineitem x orders) on the
  natural key stays a shuffle join (both sides are huge at scale; AQE
  may legitimately flip it to broadcast at toy scale), while the
  ``customer`` and ``nation`` dimensions are EXPLICIT broadcasts. The
  date filter lands in the orders scan (PushedFilters), so the join
  only shuffles the surviving year.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Exact integer money: 2-decimal doubles -> cents (the round(x*100)
# pattern is bit-stable across Spark and DuckDB for 2-decimal data).
_CENTS = "CAST(round({c} * 100) AS BIGINT)"


def pricing_summary(
    lineitem: DataFrame, ship_cutoff: str = "2001-09-01"
) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: per (returnflag, linestatus)
    totals and means over all line items shipped before the cutoff.

    disc_price/charge are computed entirely in integer units (1e-4 and
    1e-6 dollars respectively) and summed as decimal(38,0); each output
    double is ONE final cast+division chain, identical in the oracle.
    """
    ep = _CENTS.format(c="l_extendedprice")
    d = _CENTS.format(c="l_discount")
    t = _CENTS.format(c="l_tax")
    dec = "CAST({x} AS DECIMAL(38,0))"
    sums = {
        "qty": "CAST(round(l_quantity) AS BIGINT)",
        "base": ep,
        "disc": f"{ep} * (100 - {d})",
        "charge": f"{ep} * (100 - {d}) * (100 + {t})",
        "dpct": d,
    }
    agg = [
        F.expr(f"sum({dec.format(x=x)})").alias(f"__{k}")
        for k, x in sums.items()
    ] + [F.count("*").alias("count_order")]
    cnt = "CAST(count_order AS DOUBLE)"
    return (
        lineitem.where(F.col("l_shipdate") < F.lit(ship_cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(*agg)
        .select(
            "l_returnflag",
            "l_linestatus",
            F.expr("CAST(__qty AS BIGINT)").alias("sum_qty"),
            F.expr("CAST(__base AS DOUBLE) / 100.0").alias("sum_base_price"),
            F.expr("CAST(__disc AS DOUBLE) / 10000.0").alias("sum_disc_price"),
            F.expr("CAST(__charge AS DOUBLE) / 1000000.0").alias("sum_charge"),
            F.expr(f"CAST(__qty AS DOUBLE) / {cnt}").alias("avg_qty"),
            F.expr(f"CAST(__base AS DOUBLE) / {cnt} / 100.0").alias("avg_price"),
            F.expr(f"CAST(__dpct AS DOUBLE) / {cnt} / 100.0").alias("avg_disc"),
            "count_order",
        )
    )


def revenue_by_nation(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """Revenue per customer nation for orders placed in a date range:
    ``lineitem |x| orders |x| broadcast(customer) |x| broadcast(nation)``.

    Revenue is the exact integer sum of ``cents * (100 - discount_pct)``
    (1e-4-dollar units, decimal-widened), divided back once.
    """
    ep = _CENTS.format(c="l_extendedprice")
    d = _CENTS.format(c="l_discount")
    rev = f"CAST({ep} * (100 - {d}) AS DECIMAL(38,0))"
    o = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    return (
        lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.expr(f"CAST(sum({rev}) AS DOUBLE) / 10000.0").alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count("*").alias("n_items"),
        )
    )


def topk_orders_per_customer(
    orders: DataFrame, customer: DataFrame, k: int = 3
) -> DataFrame:
    """Top-k orders by value per customer: ``row_number`` over a
    DETERMINISTIC total order (price desc, orderkey asc tiebreak — the
    tiebreak is what makes the result reproducible across engines).

    Scale: one shuffle on the grouping key; Spark's WindowGroupLimit
    rewrite pushes the ``rk <= k`` filter below the sort, so each
    partition keeps a k-row heap per key instead of fully sorting every
    customer's order history before filtering. ``o_totalprice`` is
    emitted verbatim (no arithmetic), hence bit-stable.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .join(F.broadcast(customer.select("c_custkey", "c_name")),
              F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name",
            F.col("rk").alias("order_rank"),
            "o_orderkey", "o_totalprice",
        )
    )


def status_priority_grouping_sets(orders: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS — the sparse subtotal lattice
    ``(status, priority), (status), ()`` that CUBE would over-produce
    (CUBE adds the ``(priority)``-only cell this report doesn't want).
    Plans as ONE Expand (3 projections) into one aggregate, same as
    CUBE/rollup; ``grouping()`` flags disambiguate subtotal rows from
    genuine NULL dimension values.
    """
    cents = _CENTS.format(c="o_totalprice")
    return (
        orders.select(
            "o_orderstatus", "o_orderpriority", F.expr(cents).alias("__cents")
        )
        .groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count("*").alias("n_orders"),
            F.expr(
                "CAST(sum(CAST(__cents AS DECIMAL(38,0))) AS DOUBLE) / 100.0"
            ).alias("revenue"),
        )
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "g_status",
            "g_priority",
            "n_orders",
            "revenue",
        )
    )


def small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#13"
) -> DataFrame:
    """TPC-H Q17 shape: revenue from line items whose quantity is
    below 20% of the per-part average — the classic correlated scalar
    subquery, expressed here as its decorrelated form (per-part
    aggregate + equi-join), which is exactly what Catalyst rewrites
    the subquery into. The per-part threshold table is tiny relative
    to lineitem, so it broadcasts; lineitem is scanned twice (once for
    thresholds, once for probing) — at 100 TB prefer persisting the
    filtered projection or relying on parquet column pruning (2 and 3
    columns respectively).

    Output: one row with the total in EXACT 1e-2-dollar integer cents
    (sum over ~1/7 of matching items; integer-cent discipline keeps it
    bit-equal to the oracle's decorrelated spelling and to the
    correlated original, which DuckDB also decorrelates).
    """
    cents = _CENTS.format(c="l_extendedprice")
    keys = F.broadcast(
        part.where(F.col("p_brand") == brand).select("p_partkey")
    )
    qty = (
        lineitem.join(keys, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey")
        .agg(
            # integer 1e-1 units of 0.2*avg(qty): floor-compare below
            # keeps the threshold exact across engines
            F.expr(
                "CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)"
                " / count(*) * 0.2"
            ).alias("__qty_thresh")
        )
    )
    probe = lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
    return (
        probe.join(F.broadcast(qty), "l_partkey")
        .where(F.col("l_quantity") < F.col("__qty_thresh"))
        .agg(
            F.expr(
                f"CAST(sum(CAST({cents} AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("small_qty_revenue_cents"),
            F.count("*").alias("n_items"),
        )
    )


def revenue_cube(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Multi-dimensional CUBE over (nation, order priority): every
    subtotal combination in one pass. Spark plans this as one Expand
    (4x row multiplication for 2 dims) feeding a single hash
    aggregate — revenue stays an exact integer-cent sum per cell.
    ``grouping()`` flags disambiguate genuine NULL dimension values
    from subtotal rows, and match DuckDB's GROUPING() bit-for-bit.
    """
    cents = _CENTS.format(c="o_totalprice")
    base = (
        orders.select("o_custkey", "o_orderpriority", "o_totalprice")
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        base.cube("n_name", "o_orderpriority")
        .agg(
            # grouping() is only legal inside the Cube aggregate itself
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.expr(f"CAST(sum(CAST({cents} AS DECIMAL(38,0))) AS DOUBLE)"
                   " / 100.0").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .select(
            "n_name",
            "o_orderpriority",
            "g_nation",
            "g_priority",
            "revenue",
            "n_orders",
        )
    )


def market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    target_nation: str = "NATION_9",
) -> DataFrame:
    """TPC-H Q8 shape: per order-year, the revenue share supplied by
    one nation — a conditional aggregate over a star join.

    Plan: the two fact tables join shuffled on ``l_orderkey`` (both
    huge at scale); supplier and nation broadcast; the share is
    ``sum(rev) FILTER (supplier nation = target) / sum(rev)`` computed
    in ONE aggregation pass (two conditional sums, no second scan and
    no self-join — the naive Q8 formulation as two joined subqueries
    costs the star join twice). Revenue stays exact integer
    1e-4-dollar units until the final double division, so the share is
    a fixed IEEE op sequence over identical integers in both engines.
    """
    ep = _CENTS.format(c="l_extendedprice")
    d = _CENTS.format(c="l_discount")
    rev = f"CAST({ep} * (100 - {d}) AS DECIMAL(38,0))"
    is_tgt = F.col("n_name") == target_nation
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount")
        .join(
            orders.select("o_orderkey", F.year("o_orderdate").alias("o_year")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("o_year")
        .agg(
            F.expr(f"sum({rev})").alias("__total"),
            F.sum(F.when(is_tgt, F.expr(rev)).otherwise(F.lit(0))).alias(
                "__tgt"
            ),
        )
        .select(
            "o_year",
            F.expr("CAST(__total AS DOUBLE) / 10000.0").alias("revenue"),
            F.expr(
                "CAST(__tgt AS DOUBLE) / CAST(__total AS DOUBLE)"
            ).alias("mkt_share"),
        )
    )


def late_shipment_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    late_days: int = 30,
) -> DataFrame:
    """TPC-H Q4-shaped EXISTS query: orders placed in a quarter that
    have AT LEAST ONE line item shipped more than ``late_days`` after
    the order date, counted per priority.

    The EXISTS is a ``left_semi`` join — the natural Spark plan: one
    shuffle on the order key, no row duplication (so no DISTINCT
    repair step), with the non-equi lateness predicate evaluated
    inside the semi join. The date filter sits in the orders scan
    (PushedFilters); lineitem is pruned to two columns.
    """
    o = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_orderpriority", "o_orderdate")
    late = lineitem.select("l_orderkey", "l_shipdate")
    has_late = o.join(
        late,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"interval {late_days} days")
        ),
        "left_semi",
    )
    return has_late.groupBy("o_orderpriority").agg(
        F.count("*").alias("late_orders")
    )


def gap_filled_daily_counts(events: DataFrame) -> DataFrame:
    """Time-series gap fill / resample: daily event counts per
    event_type over the full observed span, with MISSING DAYS PRESENT
    as zero rows — the shape every downstream rate/anomaly computation
    wants (a missing bucket is not the same as an empty bucket).

    Plan: one aggregation of the fact table to (day, type) counts;
    the dense calendar x type grid comes from ``sequence()`` over the
    global min/max (a 1-row aggregate crossed with the tiny distinct
    type set) and LEFT-joins the counts. Post-aggregation both sides
    are ~days x types rows — grid construction costs nothing at any
    fact-table scale, and the fact table is touched exactly once.
    """
    day = F.date_trunc("day", F.col("ts"))
    counts = (
        events.select(day.alias("day"), "event_type")
        .groupBy("day", "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    bounds = events.agg(
        F.min(day).alias("lo"), F.max(day).alias("hi")
    )
    calendar = bounds.select(
        F.explode(
            F.expr("sequence(lo, hi, interval 1 day)")
        ).alias("day")
    )
    types = events.select("event_type").distinct()
    grid = calendar.crossJoin(F.broadcast(types))
    return grid.join(counts, ["day", "event_type"], "left").select(
        "day",
        "event_type",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
    )
