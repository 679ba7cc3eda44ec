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
  ``nation`` dimension is an EXPLICIT broadcast. The date filter lands
  in the orders scan (PushedFilters), so the join only shuffles the
  surviving year.

Broadcast doctrine (every join in this module follows it):

* EXPLICIT ``F.broadcast`` only on sides whose size is O(1) in the
  corpus — ``nation``/``region`` (25/5 rows), 1-row scalar aggregates,
  distinct type dictionaries, HAVING-decimated key sets. These are
  broadcastable at ANY scale, so pinning them documents intent and
  removes a planner degree of freedom.
* SF-SCALED dimensions (``customer``, ``supplier``, ``part``) get NO
  hint: they grow linearly with the corpus (~1 TB of customers under a
  100 TB lineitem), so a forced broadcast that is convenient at sf0.1
  is an executor-OOM at target scale. The cost-based planner + AQE
  broadcast them while they fit ``autoBroadcastJoinThreshold`` and
  fall back to a shuffled join when they stop fitting — which is
  exactly the desired behavior at both ends, with no code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Exact integer money: single shared definition (functions/money.py) —
# the determinism invariant must not be restatable per file.
from ..functions.money import CENTS as _CENTS, revenue_cents


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
    ``lineitem |x| orders |x| customer |x| broadcast(nation)`` (customer
    is SF-scaled — planner/AQE decides its join strategy, per the
    module's broadcast doctrine).

    Revenue is the exact integer sum of ``cents * (100 - discount_pct)``
    (1e-4-dollar units, decimal-widened), divided back once.
    """
    rev = revenue_cents()
    o = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    return (
        lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            customer.select("c_custkey", "c_nationkey"),
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
        .join(customer.select("c_custkey", "c_name"),
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
    to lineitem (planner/AQE picks its join side per the module
    doctrine — the threshold table is SF-scaled); lineitem is scanned
    twice (once for
    thresholds, once for probing) — at 100 TB prefer persisting the
    filtered projection or relying on parquet column pruning (2 and 3
    columns respectively).

    Output: one row with the total in EXACT 1e-2-dollar integer cents
    (sum over ~1/7 of matching items; integer-cent discipline keeps it
    bit-equal to the oracle's decorrelated spelling and to the
    correlated original, which DuckDB also decorrelates).
    """
    cents = _CENTS.format(c="l_extendedprice")
    # brand-filtered part keys are ~1/|brands| of an SF-scaled table —
    # no forced broadcast (module doctrine); planner/AQE decides
    keys = part.where(F.col("p_brand") == brand).select("p_partkey")
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
        probe.join(qty, "l_partkey")
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
        .join(customer.select("c_custkey", "c_nationkey"),
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
    huge at scale); nation broadcasts, supplier is SF-scaled so the
    planner decides (module doctrine); the share is
    ``sum(rev) FILTER (supplier nation = target) / sum(rev)`` computed
    in ONE aggregation pass (two conditional sums, no second scan and
    no self-join — the naive Q8 formulation as two joined subqueries
    costs the star join twice). Revenue stays exact integer
    1e-4-dollar units until the final double division, so the share is
    a fixed IEEE op sequence over identical integers in both engines.
    """
    rev = revenue_cents()
    is_tgt = F.col("n_name") == target_nation
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount")
        .join(
            orders.select("o_orderkey", F.year("o_orderdate").alias("o_year")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            supplier.select("s_suppkey", "s_nationkey"),
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
    # bounds and the type dictionary derive from the ALREADY-AGGREGATED
    # counts table (days x types rows), not from raw events — separate
    # aggregations over `events` would scan the fact table three times
    # per run (the dominant cost at the 100 TB design point).
    bounds = counts.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    calendar = bounds.select(
        F.explode(
            F.expr("sequence(lo, hi, interval 1 day)")
        ).alias("day")
    )
    types = counts.select("event_type").distinct()
    grid = calendar.crossJoin(F.broadcast(types))
    return grid.join(counts, ["day", "event_type"], "left").select(
        "day",
        "event_type",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
    )


def order_count_distribution(
    customer: DataFrame, orders: DataFrame, exclude_priority: str = "1-URGENT"
) -> DataFrame:
    """TPC-H Q13 shape: the distribution of orders-per-customer,
    including zero-order customers — the classic left-outer-join +
    double aggregation.

    Plan: orders are aggregated to (custkey, count) FIRST (map-side
    partial combine shrinks the shuffle to one row per customer), then
    customer LEFT-joins that small aggregate and the second aggregate
    groups by the count. The naive customer-LEFT-JOIN-orders-then-group
    spelling shuffles every order row keyed by custkey; this one
    shuffles pre-counted rows — at 100 TB that is the difference
    between moving the fact table and moving the customer dimension.
    """
    per_cust = (
        orders.where(F.col("o_orderpriority") != exclude_priority)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("__n"))
    )
    return (
        customer.select("c_custkey")
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("__n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


def big_ticket_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    qty_threshold: int = 300,
) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line-item quantity exceeds a
    threshold (the IN-subquery-with-HAVING), joined back to order and
    customer detail.

    Plan: lineitem aggregates to per-order quantity with map-side
    combine; the HAVING filter drops ~99.7% of orders BEFORE any join,
    so the surviving key set is decimated enough to broadcast into the
    orders join at any scale. Quantity is summed as exact integers
    (``round(qty)`` — the generator emits integral quantities).
    """
    qty = "CAST(round(l_quantity) AS BIGINT)"
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.expr(f"sum({qty})").alias("sum_qty"))
        .where(F.col("sum_qty") > qty_threshold)
    )
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            customer.select("c_custkey", "c_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
    )


def top_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in a
    quarter — revenue view + scalar MAX subquery, with ties kept.

    Plan: one fact aggregation to (suppkey, revenue-cents); the global
    max is a 1-row aggregate cross-joined back (broadcast, no second
    fact scan), and the equality compare happens on EXACT integer
    1e-4-dollar units so "equals the max" is well-defined across
    engines — the reason the revenue view keeps integers until the
    final projection.
    """
    rev = revenue_cents()
    per_supp = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.expr(f"sum({rev})").alias("__rev"))
    )
    mx = per_supp.agg(F.max("__rev").alias("__mx"))
    return (
        per_supp.join(F.broadcast(mx), F.col("__rev") == F.col("__mx"))
        .join(
            supplier.select("s_suppkey", "s_name"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.expr("CAST(__rev AS DOUBLE) / 10000.0").alias("total_revenue"),
        )
    )


def returned_item_top_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by revenue lost to returned
    items in a quarter.

    Plan: returnflag filter lands in the lineitem scan and the date
    filter in the orders scan (both PushedFilters); facts join shuffled
    on the order key; nation broadcasts, customer per planner choice
    (SF-scaled, module doctrine). The global top-k is a
    ``TakeOrdered`` (per-partition k-row heaps merged on the driver —
    no global sort shuffle) over a DETERMINISTIC order: exact
    integer-cent revenue desc, custkey asc tiebreak.
    """
    rev = revenue_cents()
    o = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        lineitem.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.expr(f"sum({rev})").alias("__rev"))
    )
    return (
        per_cust.join(
            customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .orderBy(F.col("__rev").desc(), F.col("c_custkey"))
        .limit(k)
        .select(
            "c_custkey",
            "c_name",
            F.expr("CAST(__rev AS DOUBLE) / 10000.0").alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


def volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    year_from: int = 1996,
    year_to: int = 1997,
) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations per
    (supplier-nation, customer-nation, ship-year).

    Plan: supplier and customer each join their broadcast NATION row
    FIRST and filter to the two target nations — the fact join then
    only sees the two nations' keys (a semi-join-like reduction Spark
    applies via the broadcast hash join's build side). The
    lineitem × orders join shuffles on the order key; everything else
    broadcasts. The asymmetric-pair predicate (a→b or b→a) is applied
    post-join on two tiny dictionary columns.
    """
    rev = revenue_cents()
    n = nation.select("n_nationkey", "n_name").where(
        F.col("n_name").isin(nation_a, nation_b)
    )
    supp = supplier.join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = customer.join(
        F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    # the year bound is spelled as a shipdate RANGE, not
    # year(l_shipdate) BETWEEN: a plain column comparison reaches the
    # parquet scan's PushedFilters and prunes row groups by shipdate
    # min/max stats, while year() is an expression Spark cannot push —
    # the projection below may still use year() freely
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(f"{year_from}-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{year_to + 1}-01-01").cast("timestamp"))
    ).select(
        "l_orderkey", "l_suppkey",
        F.year("l_shipdate").alias("l_year"),
        "l_extendedprice", "l_discount",
    )
    return (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.expr(f"CAST(sum({rev}) AS DOUBLE) / 10000.0").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def promo_revenue_share(
    lineitem: DataFrame,
    part: DataFrame,
    date_from: str = "1996-09-01",
    date_to: str = "1996-10-01",
) -> DataFrame:
    """TPC-H Q14 shape: the percentage of a month's revenue that came
    from promotional parts — conditional aggregation over a
    fact × part-dimension join (planner-chosen side — part is
    SF-scaled, module doctrine), ONE pass (the textbook
    CASE-inside-SUM rewrite of the two-subquery formulation).

    Both sums stay exact 1e-4-dollar integers; the percentage is a
    single double division at the end, bit-equal across engines.
    """
    rev = revenue_cents()
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
        .join(
            part.select("p_partkey", "p_type"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", F.expr(rev)).otherwise(
                    F.lit(0).cast("decimal(38,0)")
                )
            ).alias("__promo"),
            F.expr(f"sum({rev})").alias("__total"),
            F.count("*").alias("n_items"),
        )
        .select(
            F.expr(
                "100.0 * CAST(__promo AS DOUBLE) / CAST(__total AS DOUBLE)"
            ).alias("promo_pct"),
            F.expr("CAST(__promo AS DOUBLE) / 10000.0").alias("promo_revenue"),
            F.expr("CAST(__total AS DOUBLE) / 10000.0").alias("total_revenue"),
            "n_items",
        )
    )


def brand_bracket_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: revenue from an OR of three
    (brand, quantity-range, size-range) conjunction brackets.

    Plan: the part-side bracket predicates (brand, size) filter the
    part-side build down to the union of candidate parts BEFORE
    the join — Catalyst extracts ``p_brand IN (...)`` and the size
    bounds as a standalone dimension filter from the OR (common-factor
    extraction), so the join build side is small even though the full
    predicate references both tables. The residual OR runs post-join
    on already-matched rows.
    """
    rev = revenue_cents()
    brackets = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 15)
        )
    )
    return (
        lineitem.select(
            "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
        )
        .join(
            part.select("p_partkey", "p_brand", "p_size"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .where(brackets)
        .agg(
            F.expr(f"CAST(sum({rev}) AS DOUBLE) / 10000.0").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def rich_inactive_customers(
    customer: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    inactive_since: str = "1999-01-01",
) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive account
    balance and NO recent orders, counted per nation — the scalar AVG
    subquery plus NOT EXISTS anti join.

    Plan: the global average is a 1-row aggregate broadcast into the
    filter (one extra pass over the 2-column customer projection, not
    the fact table); the NOT EXISTS is a ``left_anti`` join against
    the date-pruned orders scan. Balance aggregates use integer cents
    so the per-nation sums are order-independent.
    """
    cents = _CENTS.format(c="c_acctbal")
    avg_bal = (
        customer.where(F.col("c_acctbal") > 0)
        .agg(
            F.expr(
                f"CAST(sum(CAST({cents} AS DECIMAL(38,0))) AS DOUBLE)"
                " / count(*) / 100.0"
            ).alias("__avg")
        )
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit(inactive_since).cast("timestamp")
    ).select("o_custkey")
    return (
        customer.select("c_custkey", "c_acctbal", "c_nationkey")
        .crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.expr(
                f"CAST(sum(CAST({cents} AS DECIMAL(38,0))) AS DOUBLE) / 100.0"
            ).alias("totacctbal"),
        )
    )


def ohlc_bars(events: DataFrame) -> DataFrame:
    """OHLC downsampling: per (event_type, day) open/high/low/close/
    volume bars — the standard financial/metrics resample.

    Plan: ONE hash aggregate over the fact scan. Open/close use
    ``min_by``/``max_by`` with a (ts, event_id) struct key — struct
    comparison is lexicographic, and event_id is unique, so first/last
    are total-order deterministic without a window sort (the
    row_number formulation costs a per-key sort; min_by is a constant-
    state streaming aggregate — the difference between O(n log n) and
    O(n) per key at 100 TB). High/low are plain min/max (selection,
    not accumulation — no float-order concern); the daily total uses
    integer cents.
    """
    day = F.date_trunc("day", F.col("ts"))
    cents = _CENTS.format(c="value")
    return (
        events.select(
            day.alias("day"), "event_type", "ts", "event_id", "value"
        )
        .groupBy("event_type", "day")
        .agg(
            F.expr("min_by(value, struct(ts, event_id))").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.expr("max_by(value, struct(ts, event_id))").alias("close"),
            F.count("*").alias("volume"),
            F.expr(
                f"CAST(sum(CAST({cents} AS DECIMAL(38,0))) AS DOUBLE) / 100.0"
            ).alias("total_value"),
        )
    )


def interpolated_hourly_series(events: DataFrame) -> DataFrame:
    """Linear interpolation over a gap-filled hourly series: per
    (event_type, hour) total value, with MISSING HOURS linearly
    interpolated between the nearest observed neighbours (edges clamp
    to the nearest observation) — the resample-then-interpolate step
    every forecasting/anomaly pipeline runs before modelling.

    Plan: one fact aggregation to (hour, type) integer-cent totals; the
    dense grid comes from ``sequence()`` over the global bounds crossed
    with the tiny type dictionary; the neighbour search is two
    IGNORE-NULLS window passes (prev/next observation as (hour, value)
    structs) PER TYPE — state is one struct per partition, and the
    window partitions by series key so it parallelizes across types.
    The interpolation weight is an exact integer hour-difference ratio;
    value arithmetic is a fixed IEEE sequence over integer-cent-derived
    doubles, so results are bit-equal across engines.
    """
    from pyspark.sql import Window

    hour = F.date_trunc("hour", F.col("ts"))
    cents = _CENTS.format(c="value")
    totals = (
        events.select(hour.alias("hour"), "event_type", "value")
        .groupBy("hour", "event_type")
        .agg(
            F.expr(
                f"CAST(sum(CAST({cents} AS DECIMAL(38,0))) AS DOUBLE) / 100.0"
            ).alias("__v")
        )
    )
    # bounds/types from the aggregated totals, not raw events (one
    # fact scan, not three — same rationale as gap_filled_daily_counts)
    bounds = totals.agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
    grid = (
        bounds.select(
            F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hour")
        )
        .crossJoin(F.broadcast(totals.select("event_type").distinct()))
        .join(totals, ["hour", "event_type"], "left")
    )
    obs = F.when(
        F.col("__v").isNotNull(), F.struct(F.col("hour").alias("h"), F.col("__v").alias("v"))
    )
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    prev = F.last(obs, ignorenulls=True).over(w_prev)
    nxt = F.first(obs, ignorenulls=True).over(w_next)
    # exact integer hour offsets -> double ratio; identical op order in
    # the oracle makes the interpolated double bit-equal
    num = "CAST((unix_timestamp(hour) - unix_timestamp(__p.h)) / 3600 AS DOUBLE)"
    den = "CAST((unix_timestamp(__n.h) - unix_timestamp(__p.h)) / 3600 AS DOUBLE)"
    interp = (
        f"__p.v + (__n.v - __p.v) * ({num} / {den})"
    )
    return (
        grid.withColumn("__p", prev)
        .withColumn("__n", nxt)
        .select(
            "hour",
            "event_type",
            F.col("__v").isNotNull().alias("observed"),
            F.expr(
                f"""CASE WHEN __v IS NOT NULL THEN __v
                         WHEN __p IS NOT NULL AND __n IS NOT NULL THEN {interp}
                         WHEN __p IS NOT NULL THEN __p.v
                         ELSE __n.v END"""
            ).alias("value"),
        )
    )


def funnel_conversion(
    events: DataFrame, steps: tuple[str, ...] = ("view", "click", "purchase")
) -> DataFrame:
    """Ordered funnel analysis: how many users completed each prefix of
    ``steps`` IN ORDER (each step strictly after the previous one's
    first occurrence) — the classic product-analytics conversion query.

    Plan: ONE shuffle on user_id — the per-user first-occurrence times
    of every step are conditional ``min`` aggregates in a single pass
    (no per-step self-joins: the naive k-way join formulation costs
    k-1 shuffled joins of the full fact table). The ordered-chain
    flags and the final counts are a second 1-row aggregate. Output is
    one row per funnel step with the surviving user count.
    """
    mins = [
        F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"__t{i}")
        for i, s in enumerate(steps)
    ]
    per_user = events.groupBy("user_id").agg(*mins)
    # reached step i  <=>  reached i-1 and t_i strictly after t_{i-1}
    flags = []
    for i in range(len(steps)):
        cond = F.col("__t0").isNotNull()
        for j in range(1, i + 1):
            cond = cond & F.col(f"__t{j}").isNotNull() & (
                F.col(f"__t{j}") > F.col(f"__t{j-1}")
            )
        # coalesce: sum over an EMPTY per_user table is NULL, and the
        # funnel must report 0 completions, not NULL counts
        flags.append(
            F.coalesce(F.sum(cond.cast("long")), F.lit(0)).alias(f"__n{i}")
        )
    counts = per_user.agg(*flags)
    # one row per step: (step_index, step, n_users)
    pairs = ", ".join(
        f"{i + 1}, '{s}', __n{i}" for i, s in enumerate(steps)
    )
    return counts.select(
        F.expr(
            f"stack({len(steps)}, {pairs})"
        ).alias("step_index", "step", "n_users")
    )


def cohort_retention(events: DataFrame) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    day (the cohort), counted per day-offset of later activity — the
    standard retention triangle.

    Plan: (1) distinct (user, activity-day) pairs — one shuffle, map-
    side combined; (2) per-user cohort day = min over that table —
    re-aggregates the SAME key so Spark reuses the partitioning
    without a second exchange; (3) join activity days back to cohort
    days on user (co-partitioned from the same shuffle) and count per
    (cohort, offset). Offsets are exact integer day differences.
    """
    day = F.date_trunc("day", F.col("ts"))
    user_days = (
        events.select("user_id", day.alias("day")).distinct()
    )
    cohorts = user_days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        user_days.join(cohorts, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_users"))
    )


def zscore_anomalies(events: DataFrame, threshold: float = 3.0) -> DataFrame:
    """Per-series z-score anomaly detection: events whose value sits
    more than ``threshold`` standard deviations from their event_type's
    mean — the baseline outlier screen every metrics pipeline runs.

    Plan: one aggregation pass computes per-type (n, Σcents, Σcents²)
    with EXACT integer arithmetic (cents² sums in decimal(38,0) —
    sum-of-squares hits ~1e8 per row in cent units, int64-overflowing
    around 1e10 rows); the tiny stats table broadcasts back onto the
    fact scan, so the fact is read twice but shuffled never. Mean,
    variance and z are a FIXED IEEE op sequence over those exact
    integers, and ``sqrt`` is correctly rounded by IEEE-754 — so the z
    scores (not just the flags) are bit-equal across engines.

    Variance uses the one-pass E[x²]−E[x]² form — the cancellation it
    risks numerically is irrelevant here because both engines cancel
    identically (determinism, not precision, is the contract; the
    clamp guards the tiny-negative case).
    """
    cents = _CENTS.format(c="value")
    dec = f"CAST({cents} AS DECIMAL(38,0))"
    stats = (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("__n"),
            F.expr(f"sum({dec})").alias("__s"),
            F.expr(f"sum({dec} * {dec})").alias("__ss"),
        )
        .select(
            "event_type",
            F.expr("CAST(__s AS DOUBLE) / CAST(__n AS DOUBLE)").alias("__mean"),
            F.expr(
                "sqrt(greatest(CAST(__ss AS DOUBLE) / CAST(__n AS DOUBLE)"
                " - (CAST(__s AS DOUBLE) / CAST(__n AS DOUBLE))"
                " * (CAST(__s AS DOUBLE) / CAST(__n AS DOUBLE)), 0.0))"
            ).alias("__std"),
        )
    )
    z = f"(CAST({cents} AS DOUBLE) - __mean) / __std"
    return (
        events.join(F.broadcast(stats), "event_type")
        .where(F.col("__std") > 0)
        .where(F.expr(f"abs({z})") > threshold)
        .select(
            "event_id", "event_type", "ts", "value", F.expr(z).alias("zscore")
        )
    )


def rolling_correlation(
    events: DataFrame,
    type_a: str = "purchase",
    type_b: str = "view",
    window_days: int = 7,
) -> DataFrame:
    """Rolling Pearson correlation between two series' daily totals
    over a trailing ``window_days`` frame — the co-movement signal
    behind pair monitoring and leading-indicator checks.

    Determinism design: every windowed accumulation (n, Σa, Σb, Σab,
    Σa², Σb²) stays in EXACT decimal integers — float sums inside a
    window frame are order-dependent (DuckDB evaluates frames with
    segment trees, Spark by frame iteration, so their float rounding
    differs), integer sums are not. The correlation is then ONE fixed
    IEEE op chain over those integers, bit-equal across engines.

    Plan: one conditional aggregation collapses the fact table to a
    row per day (both series in one pass — no self-join); the rolling
    frame is a single-partition window over the POST-AGGREGATION daily
    table, whose row count is the calendar (a century is ~36.5 k
    rows), not the fact table — the one place a partition-less window
    is the right plan. Missing days for a series count as 0.
    """
    from pyspark.sql import Window

    day = F.date_trunc("day", F.col("ts"))
    cents = _CENTS.format(c="value")
    dec = "CAST({x} AS DECIMAL(38,0))"
    daily = (
        events.where(F.col("event_type").isin(type_a, type_b))
        .select(day.alias("day"), "event_type", "value")
        .groupBy("day")
        .agg(
            F.coalesce(
                F.expr(
                    f"sum(CASE WHEN event_type = '{type_a}'"
                    f" THEN {dec.format(x=cents)} END)"
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("__a"),
            F.coalesce(
                F.expr(
                    f"sum(CASE WHEN event_type = '{type_b}'"
                    f" THEN {dec.format(x=cents)} END)"
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("__b"),
        )
    )
    # densify to the FULL calendar between the observed bounds — a day
    # with no event in either series must enter the frame as (0, 0),
    # else the ROWS frame slides over observed days only and "7 days"
    # silently spans arbitrary calendar gaps
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    grid = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    zero = F.lit(0).cast("decimal(38,0)")
    dense = grid.join(daily, on="day", how="left").select(
        "day",
        F.coalesce("__a", zero).alias("__a"),
        F.coalesce("__b", zero).alias("__b"),
    )
    w = Window.orderBy("day").rowsBetween(-(window_days - 1), 0)
    rolled = dense.select(
        "day",
        F.count("*").over(w).alias("__n"),
        F.sum("__a").over(w).alias("__sa"),
        F.sum("__b").over(w).alias("__sb"),
        F.sum(F.expr("__a * __b")).over(w).alias("__sab"),
        F.sum(F.expr("__a * __a")).over(w).alias("__saa"),
        F.sum(F.expr("__b * __b")).over(w).alias("__sbb"),
    )
    num = (
        "CAST(__n AS DOUBLE) * CAST(__sab AS DOUBLE)"
        " - CAST(__sa AS DOUBLE) * CAST(__sb AS DOUBLE)"
    )
    va = (
        "CAST(__n AS DOUBLE) * CAST(__saa AS DOUBLE)"
        " - CAST(__sa AS DOUBLE) * CAST(__sa AS DOUBLE)"
    )
    vb = (
        "CAST(__n AS DOUBLE) * CAST(__sbb AS DOUBLE)"
        " - CAST(__sb AS DOUBLE) * CAST(__sb AS DOUBLE)"
    )
    return rolled.select(
        "day",
        F.col("__n").cast("long").alias("n_days"),
        F.expr(
            f"CASE WHEN ({va}) > 0 AND ({vb}) > 0"
            f" THEN ({num}) / sqrt(({va}) * ({vb}))"
            f" ELSE NULL END"
        ).alias("corr"),
    )


def quantile_bins(events: DataFrame, n_bins: int = 10) -> DataFrame:
    """Equal-frequency (quantile) binning per series: every event is
    assigned its ``ntile`` bin over a DETERMINISTIC total order
    (value, event_id), then bins are summarized to boundaries — the
    discretization step feature pipelines run before bucketized
    models, with the bin edges becoming the serving-time lookup table.

    Plan: one shuffle on the series key; ``ntile`` is a streaming
    window function (no per-row state beyond the running count) and
    the boundary summary re-aggregates on (series, bin) — map-side
    combined. Per-series sorts parallelize across series.

    NULL measures are EXCLUDED by explicit rule: a valueless event
    has no quantile, and left in the sort it would not even land
    deterministically (Spark orders NULLS FIRST, other engines NULLS
    LAST — every bin boundary would shift engine-dependently).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        events.select("event_type", "event_id", "value")
        .where(F.col("value").isNotNull())
        .withColumn("bin", F.ntile(n_bins).over(w))
        .groupBy("event_type", "bin")
        .agg(
            F.count("*").alias("n_events"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


def local_supplier_revenue(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation within one region, counting
    only orders a LOCAL supplier shipped (customer and supplier in the
    same nation) — the full six-table star join with the equality
    constraint that distinguishes Q5 from a plain rollup.

    Plan: region ⋈ nation collapses to the ~5 target nation keys
    FIRST (two tiny broadcasts), so both the customer and supplier
    dimension joins carry only region-local rows into the fact join;
    lineitem ⋈ orders shuffles on the order key; the local-supplier
    constraint is an equality filter on two small dictionary columns
    post-join. Date filter sits in the orders scan (PushedFilters).
    """
    rev = revenue_cents()
    nk = (
        nation.join(
            F.broadcast(
                region.where(F.col("r_name") == region_name).select(
                    "r_regionkey"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust = customer.join(
        F.broadcast(nk), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("c_nationkey").alias("__c_nat"))
    supp = supplier.join(
        F.broadcast(nk), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("s_nationkey").alias("__s_nat"))
    o = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    return (
        lineitem.select(
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("__c_nat") == F.col("__s_nat"))
        .join(
            F.broadcast(nk), F.col("__s_nat") == F.col("n_nationkey")
        )
        .groupBy("n_name")
        .agg(
            F.expr(f"CAST(sum({rev}) AS DOUBLE) / 10000.0").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def time_decay_features(
    events: DataFrame,
    half_life_days: int = 7,
    max_units: int = 20,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key exponentially time-decayed value sum and event count —
    the classic recency-weighted extension of the reference's windowed
    COUNT/AVG features (`2_batch_ingestion.ipynb:271-287` computes the
    un-decayed versions): a 2-week-old event counts half as much as a
    1-week-old one at ``half_life_days=7``.

    Exact-arithmetic design (the repo's bit-stable-doubles
    discipline): the decay factor is ``0.5^age_units`` with INTEGER
    ``age_units = floor(age_days / half_life_days)``, so every weight
    is a power of two. Each event contributes
    ``cents * 2^(max_units - age_units)`` — computed IN decimal, so
    even an absurd single value cannot wrap 64-bit the way a raw
    ``shiftleft`` on BIGINT would — and the per-key sums run in
    ``decimal(38,0)`` (order-independent, map-side combinable,
    overflow-safe at any row count). ONE final cast to
    double and ONE division by the constant ``2^max_units * 100``
    (both correctly rounded, both engines) produce the decayed value —
    no floating-point summation anywhere, so results are engine-bit-
    equal. Events aged ``0..max_units`` half-life units are included
    (weights ``2^0 .. 2^-max_units``); anything older is excluded by
    predicate rather than rounded in.

    The decay anchor is the corpus max event DATE (a 1-row broadcast
    aggregate, deterministic; production would pass "now"). Plan: one
    scan + one broadcast + one map-side-combined aggregation on the
    key — the same single-exchange shape as every other feature
    aggregate here.
    """
    anchor = events.agg(F.max(F.to_date(ts_col)).alias("__anchor"))
    units = F.floor(
        F.datediff(F.col("__anchor"), F.to_date(ts_col)) / F.lit(half_life_days)
    ).cast("int")
    cents = F.round(F.col(value_col) * 100).cast("long")
    shift = (F.lit(max_units) - F.col("__u")).cast("int")
    # the 2^shift factor itself fits BIGINT trivially (shift <=
    # max_units), but cents * factor must run in DECIMAL: a raw
    # shiftleft(cents, shift) wraps silently past 2^63 while the
    # DuckDB oracle's multiply errors — decimal keeps both exact
    scaled_value = F.expr(
        "CAST(__cents AS DECIMAL(38,0))"
        " * CAST(shiftleft(CAST(1 AS BIGINT), __shift) AS DECIMAL(38,0))"
    )
    scaled_one = F.expr("CAST(shiftleft(CAST(1 AS BIGINT), __shift) AS DECIMAL(38,0))")
    denom_value = float((1 << max_units) * 100)
    denom_count = float(1 << max_units)
    return (
        events.crossJoin(F.broadcast(anchor))
        .withColumn("__u", units)
        .where((F.col("__u") >= 0) & (F.col("__u") <= max_units))
        .withColumn("__cents", cents)
        .withColumn("__shift", shift)
        .groupBy(key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(scaled_value).alias("__sv"),
            F.sum(scaled_one).alias("__sc"),
        )
        .select(
            key_col,
            "n_events",
            (F.col("__sv").cast("double") / F.lit(denom_value)).alias("decayed_value"),
            (F.col("__sc").cast("double") / F.lit(denom_count)).alias("decayed_count"),
        )
    )


def forecast_revenue_change(
    lineitem: DataFrame,
    year: int = 1994,
    discount_center: float = 0.06,
    max_quantity: int = 24,
) -> DataFrame:
    """TPC-H Q6 shape: the would-be revenue increase from eliminating
    a band of small discounts on low-quantity items in one year — the
    canonical pure-scan aggregate: no join, no grouping, one
    codegen'd scan + a 1-row aggregate. The ship-date year is spelled
    as a RANGE (``>= jan1 AND < jan1+1y``), not ``year(col) ==`` —
    the range is a plain column comparison that reaches the parquet
    scan's PushedFilters and prunes row groups by shipdate min/max
    stats; ``year()`` is an expression Spark cannot push. The
    quantity cap pushes down too. The discount band stays a post-scan
    residual BY DESIGN: it is evaluated on EXACT integer basis points
    (``round(l_discount * 10000)``) because the spec's ``between 0.05
    and 0.07`` on binary doubles makes boundary rows
    engine-dependent — exactness is worth one residual predicate.

    Revenue sums `price_cents * discount_bp` in decimal(38,0); the
    single final division is the only double op.
    """
    dbp = "CAST(round(l_discount * 10000) AS BIGINT)"
    ep = _CENTS.format(c="l_extendedprice")
    lo = int(round((discount_center - 0.01) * 10000))
    hi = int(round((discount_center + 0.01) * 10000))
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
            & F.expr(f"{dbp} BETWEEN {lo} AND {hi}")
            & (F.col("l_quantity") < max_quantity)
        )
        .agg(
            F.expr(
                f"CAST(sum(CAST({ep} * {dbp} AS DECIMAL(38,0))) AS DOUBLE)"
                " / 1000000.0"
            ).alias("revenue_increase"),
            F.count("*").alias("n_items"),
        )
    )


def sole_late_supplier(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    late_after_days: int = 90,
    k: int = 25,
) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting) on the
    columns this schema carries: count, per supplier, the finalized
    multi-supplier orders where that supplier was the ONLY one to
    ship late (here late = shipped more than ``late_after_days`` after
    the order date — the testdata has no commit/receipt dates, so the
    lateness predicate is derived; the plan shape is the point).

    The spec's correlated ``EXISTS (another supplier)`` / ``NOT
    EXISTS (another late supplier)`` pair is decorrelated into ONE
    per-order aggregate — ``count(distinct supplier)`` and
    ``count(distinct late supplier)`` — joined back to the late
    lines: "sole late supplier in a multi-supplier order" is exactly
    ``n_supp >= 2 AND n_late_supp == 1`` on a line that is itself
    late. One aggregation + one join on the order key replaces two
    correlated self-joins of the fact table (what a naive translation
    would shuffle three times). Nation names ride broadcast inside the
    supplier lookup; the supplier join side is planner-chosen
    (SF-scaled, module doctrine).
    """
    li = lineitem.join(
        orders.select("o_orderkey", "o_orderstatus", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).where(F.col("o_orderstatus") == "F")
    lines = li.select(
        "l_orderkey",
        "l_suppkey",
        (
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
            > late_after_days
        ).alias("is_late"),
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    culprits = (
        lines.where(F.col("is_late"))
        .join(per_order, on="l_orderkey")
        .where((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    named = culprits.join(
        supplier.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey", "s_name", "n_name"),
        F.col("l_suppkey") == F.col("s_suppkey"),
    )
    return (
        named.groupBy("s_name", "n_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(k)
    )


def shipping_priority(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-30",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: the k highest-revenue orders not yet shipped
    at the cutoff, for one market segment (this schema carries
    ``o_orderpriority`` in place of the spec's shippriority).

    Plan: the segment-filtered customer key set joins per planner
    choice (SF-scaled, module doctrine — broadcast while it fits);
    orders (placed before the cutoff) join lineitem (shipped after
    it) with ONE shuffle on the order key, and the per-order revenue
    aggregate REUSES that join partitioning — grouping on the join
    key adds no second exchange. Top-k is TakeOrdered over the total
    (revenue desc, orderkey) order, tie-broken deterministically.
    Revenue is the exact integer 1e-4-dollar sum divided once.
    """
    rev = revenue_cents()
    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    o = (
        orders.where(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = lineitem.where(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.expr(f"CAST(sum({rev}) AS DOUBLE) / 10000.0").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(k)
    )
