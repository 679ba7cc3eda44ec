"""Relational-coverage plans: the §2.7 "absent" categories not pulled
in by the reference itself — semi/anti joins, set operators, distinct
aggregation, regex/date-format scalar functions, JSON extraction,
array aggregation, and exact distributed percentiles.

The reference (aws-samples/amazon-sagemaker-feature-store-streaming-
aggregation) only ever uses point-lookup equi-joins and windowed
COUNT/AVG; SURVEY §2.7 lists the rest of the relational algebra as
absent. A user switching an analytics workload onto this engine needs
them, so each is implemented here as a first-class, oracle-checked
plan over the warehouse tables.

Scale design notes (100 TB):

* Semi/anti joins keep only the join key on the build side before the
  shuffle — a LeftSemi/LeftAnti over a key-projected right side
  shuffles 8-byte keys, not order rows, and AQE can flip to broadcast
  when the filtered side is small.
* INTERSECT/EXCEPT are planned by Spark as aggregate + semi/anti join
  on already-deduplicated inputs; we pre-project to the key column so
  the dedup aggregate is over the narrowest possible rows.
* Multi-DISTINCT aggregation expands (one Expand node, one shuffle);
  the grouping cardinality here is nations (25), so the expanded
  shuffle stays tiny relative to the fact scan.
* Percentiles are EXACT but distributed: one shuffle on the grouping
  key, per-group sort, row_number pick at ceil(p*n) — no driver-side
  collect, no approximation. Output stays integer cents => bit-equal
  across engines (no interpolation arithmetic to diverge on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.money import CENTS as _CENTS  # single shared definition


# ------------------------------------------------------ semi / anti join


def customers_with_urgent_orders(
    customer: DataFrame, orders: DataFrame, segment: str = "BUILDING"
) -> DataFrame:
    """LEFT SEMI: customers in ``segment`` holding at least one
    1-URGENT order. The right side is projected to the 8-byte key
    BEFORE the join, so at scale the shuffle carries keys only.
    """
    urgent = orders.where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    return (
        customer.where(F.col("c_mktsegment") == segment)
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
    )


def dormant_customers(
    customer: DataFrame, orders: DataFrame, since: str = "2000-01-01"
) -> DataFrame:
    """LEFT ANTI: customers with no order since ``since``. The date
    filter lands in the orders scan (PushedFilters), and the anti-join
    build side is again the bare key column.
    """
    recent = orders.where(
        F.col("o_orderdate") >= F.lit(since).cast("timestamp")
    ).select("o_custkey")
    return (
        customer.join(
            recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .select("c_custkey", "c_name", "c_nationkey")
    )


# ---------------------------------------------------------- set operators


def _buyers(orders: DataFrame, year: int) -> DataFrame:
    return orders.where(
        (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
    ).select("o_custkey")


def repeat_buyers(orders: DataFrame, y1: int = 1996, y2: int = 1997) -> DataFrame:
    """INTERSECT: customers that bought in BOTH years. Spark plans
    this as dedup-aggregate + left-semi on the key-only projections.
    """
    return (
        _buyers(orders, y1)
        .intersect(_buyers(orders, y2))
        .select(F.col("o_custkey").alias("custkey"))
    )


def churned_buyers(orders: DataFrame, y1: int = 1996, y2: int = 1997) -> DataFrame:
    """EXCEPT (distinct): customers that bought in ``y1`` but not in
    ``y2`` — ``subtract`` plans as dedup-aggregate + left-anti join.
    """
    return (
        _buyers(orders, y1)
        .subtract(_buyers(orders, y2))
        .select(F.col("o_custkey").alias("custkey"))
    )


# ---------------------------------------------------- distinct aggregation


def nation_order_profile(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Multi-DISTINCT hash aggregate per nation: distinct buyers,
    distinct active months, raw order count, exact revenue. One Expand
    + one shuffle on (nation, distinct-column); cheap because the
    group-key cardinality is the nation count.
    """
    cents = _CENTS.format(c="o_totalprice")
    return (
        orders.select(
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            F.expr(cents).alias("__cents"),
        )
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
            F.countDistinct("o_custkey").alias("n_buyers"),
            F.countDistinct("month").alias("n_months"),
            F.count("*").alias("n_orders"),
            F.expr(
                "CAST(sum(CAST(__cents AS DECIMAL(38,0))) AS DOUBLE) / 100.0"
            ).alias("revenue"),
        )
    )


# ------------------------------------ regex / date-format scalar functions


def monthly_orders_by_id_parity(
    orders: DataFrame, customer: DataFrame
) -> DataFrame:
    """Scalar-function coverage: ``regexp_extract`` pulls the numeric
    id out of ``Customer#NNNNNNNNN``, ``date_format`` buckets order
    dates to months; both stay inside whole-stage codegen. Groups by
    (month, id parity) so the regex result feeds an aggregate and any
    extraction drift would flip row counts, not just values.
    """
    # try_cast, not cast: a name that does not match the pattern
    # extracts '' and must land in a NULL parity group — a plain cast
    # ABORTS the whole job under Spark's ANSI default (the DuckDB twin
    # uses TRY_CAST for the same reason)
    cid = F.expr(
        r"try_cast(regexp_extract(c_name, 'Customer#(\\d+)', 1) as bigint)"
    )
    cents = _CENTS.format(c="o_totalprice")
    return (
        orders.select("o_custkey", "o_totalprice", "o_orderdate")
        .join(
            customer.select("c_custkey", "c_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            (cid % 2).alias("id_parity"),
            F.expr(cents).alias("__cents"),
        )
        .groupBy("month", "id_parity")
        .agg(
            F.count("*").alias("n_orders"),
            F.expr(
                "CAST(sum(CAST(__cents AS DECIMAL(38,0))) AS DOUBLE) / 100.0"
            ).alias("revenue"),
        )
    )


# ----------------------------------------------------- JSON / array funcs


def props_profile(events: DataFrame) -> DataFrame:
    """JSON-function coverage: ``get_json_object`` parses the ``props``
    wire column per row (scan-side, no shuffle), then a hash aggregate
    profiles the extracted field per event type.
    """
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("k").alias("n_distinct_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def user_value_arrays(events: DataFrame) -> DataFrame:
    """Array-function coverage: per-user sorted value array
    (``sort_array(collect_list(...))`` — canonical regardless of
    partition arrival order), folded back to scalars with the
    higher-order ``aggregate`` lambda. Integer cents throughout, so
    every output is bit-stable.
    """
    cents = _CENTS.format(c="value")
    return (
        events.select("user_id", F.expr(cents).alias("__cents"))
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("__cents")).alias("__vals"))
        .select(
            "user_id",
            F.size("__vals").alias("n_values"),
            F.element_at("__vals", 1).alias("v_min"),
            F.element_at("__vals", -1).alias("v_max"),
            F.expr(
                "aggregate(__vals, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            ).alias("v_sum"),
        )
    )


# ------------------------------------------- analytic window functions


def order_deltas(orders: DataFrame) -> DataFrame:
    """Analytic-function family over each customer's order sequence:
    ``lag`` (previous order's price), delta vs previous, ``ntile``
    spend-quartile within the customer, and a running order index.
    One exchange + one sort serve every function (same window key and
    compatible orderings), pinned in ``tests/test_plans.py``.

    All outputs are integer cents / small ints — bit-stable. The ORDER
    BY carries ``o_orderkey`` as a tiebreak so ties at equal dates are
    deterministic across engines. NULL placement is pinned EXPLICITLY
    (dates NULLS FIRST, prices DESC NULLS LAST, keys NULLS FIRST):
    engine defaults disagree (Spark ASC=NULLS FIRST, DuckDB NULLS
    LAST), and an unpinned NULL-dated order would hold a different
    sequence position on each engine, shifting every neighbour's lag.
    """
    cents = F.expr(_CENTS.format(c="o_totalprice"))
    seq = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_first(),
        F.col("o_orderkey").asc_nulls_first(),
    )
    by_price = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc_nulls_last(),
        F.col("o_orderkey").asc_nulls_first(),
    )
    prev = F.lag(cents).over(seq)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(seq).alias("order_idx"),
        cents.alias("price_cents"),
        prev.alias("prev_cents"),
        (cents - prev).alias("delta_cents"),
        F.ntile(4).over(by_price).alias("spend_quartile"),
    )


# ------------------------------------------------------------- pivot


def revenue_pivot_by_priority(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """PIVOT: nation rows x order-priority columns, each cell the
    exact integer-cent revenue. ``groupBy().pivot(values=...)`` with
    the value list supplied explicitly, so Spark skips the extra
    distinct-values JOB a value-less pivot runs first. The fact table
    is consumed in ONE map-side partial-aggregation pass; the two
    exchanges that follow carry only pre-aggregated
    (nation, priority) cells — O(groups x pivot values) rows, not
    fact rows.
    """
    cents = _CENTS.format(c="o_totalprice")
    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    return (
        orders.select("o_custkey", "o_orderpriority",
                      F.expr(cents).alias("__cents"))
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .pivot("o_orderpriority", pris)
        .agg(F.expr(
            "CAST(sum(CAST(__cents AS DECIMAL(38,0))) AS BIGINT)"
        ))
        .select(
            "n_name",
            *[
                F.col(p).alias(f"rev_p{p[0]}_cents")
                for p in pris
            ],
        )
    )


# ----------------------------------------- windowed distinct count


def trailing_distinct_types(
    events: DataFrame, window_s: int = 3600
) -> DataFrame:
    """COUNT(DISTINCT) OVER a trailing RANGE window — a feature Spark
    SQL does not support natively (DISTINCT aggregates are rejected in
    window frames). Emulated exactly as
    ``size(collect_set(x) OVER w)``: the set dedups inside the frame,
    ``size`` reduces it to the count. Same single exchange + sort as
    any other window query; per-row state is the distinct-value set of
    the frame (bounded by the value domain — event types here), which
    is the honest cost of exact windowed cardinality at any scale.
    Oracle: DuckDB's native ``count(DISTINCT ...) OVER``.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-window_s * 1_000_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.size(F.collect_set("event_type").over(w)).alias(
            "n_distinct_types_1h"
        ),
        F.count("*").over(w).alias("n_events_1h"),
    )


# --------------------------------------------------------- unpivot/melt


def unpivot_lineitem_measures(lineitem: DataFrame) -> DataFrame:
    """UNPIVOT (melt): the three lineitem money/quantity measures as
    (id, measure, value) rows — the inverse of PIVOT, used to feed
    generic per-measure pipelines. ``DataFrame.unpivot`` is a
    scan-side Expand (3x row multiplication), no shuffle at all.
    Values are emitted verbatim (no arithmetic) => bit-stable.
    """
    return lineitem.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount",
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "value",
    )


# --------------------------------------------------- exact percentiles


def value_percentiles(
    events: DataFrame, ps: tuple[float, ...] = (0.5, 0.9, 0.99)
) -> DataFrame:
    """Exact distributed percentiles (PERCENTILE_DISC semantics: the
    smallest element with rank >= ceil(p * n)) of event value per
    event type. One shuffle on the group key; per-group sort +
    ``row_number``; the picks are integer cents so there is no
    interpolation arithmetic to diverge between engines.

    At 100 TB the per-group sort is the cost; groups here are event
    types (handful, each large), which Spark sorts within partitions
    after hash-partitioning by group — the same shape a dedicated
    quantile sketch would replace if approximate answers were allowed
    (see ``approx_value_percentiles``).
    """
    cents = _CENTS.format(c="value")
    w = Window.partitionBy("event_type").orderBy("__cents")
    # NULL measures are OUT of the ranking (standard PERCENTILE_DISC
    # skips NULLs) — left in, Spark's NULLS FIRST would shift every
    # rank while DuckDB's NULLS LAST parks them at p100
    ranked = (
        events.select("event_type", F.expr(cents).alias("__cents"))
        .where(F.col("__cents").isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count("*").over(Window.partitionBy("event_type")))
    )
    pick = None
    for p in ps:
        cond = F.col("__rn") == F.ceil(F.lit(p) * F.col("__n")).cast("int")
        pick = cond if pick is None else (pick | cond)
    return (
        ranked.where(pick)
        .groupBy("event_type")
        .agg(
            *[
                F.max(
                    F.when(
                        F.col("__rn")
                        == F.ceil(F.lit(p) * F.col("__n")).cast("int"),
                        F.col("__cents"),
                    )
                ).alias(f"p{int(p * 100)}_cents")
                for p in ps
            ]
        )
    )


def approx_value_percentiles(
    events: DataFrame, ps: tuple[float, ...] = (0.5, 0.9, 0.99)
) -> DataFrame:
    """Sketch twin of :func:`value_percentiles`: single-pass
    ``percentile_approx`` (Greenwald-Khanna) — the plan that replaces
    the per-group sort at 100 TB when exactness is negotiable. Checked
    in tests against the exact picks within sketch error, not via the
    DuckDB oracle (sketch internals differ across engines).
    """
    cents = _CENTS.format(c="value")
    d = events.select("event_type", F.expr(cents).alias("__cents"))
    return d.groupBy("event_type").agg(
        *[
            F.percentile_approx("__cents", p, 10000).alias(
                f"p{int(p * 100)}_cents"
            )
            for p in ps
        ]
    )


def doc_word_profile(documents: DataFrame, min_count: int = 3) -> DataFrame:
    """Map-function family over a real map column (§2.7 "map functions").

    Builds a per-document word→count map with ``map_from_entries`` (the
    entry list is ``array_sort``-ed first so map iteration order — and
    hence the serialized output — is deterministic), then exercises the
    map operators: ``map_filter`` keeps words with count ≥
    ``min_count``, ``map_entries`` + ``transform`` serialize the
    surviving entries to ``word:count`` strings, ``size`` reports the
    map cardinality.

    Output: ``(doc_id, n_distinct_words, frequent)`` where ``frequent``
    is the sorted surviving entries joined to one ``w:c,w:c`` string —
    maps (and raw arrays) don't compare canonically across engines, so
    the fully serialized form is what the oracle checks.

    Scale: one shuffle (the per-(doc, word) count's groupBy); the map
    construction is a second per-doc aggregation on the same key, which
    Catalyst plans without a second exchange (already hash-partitioned
    by doc_id). Per-document maps are bounded by document vocabulary,
    not corpus size.
    """
    toks = documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).where(F.col("w") != "")
    wc = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    m = wc.groupBy("doc_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("w", "c")))
        ).alias("m")
    )
    frequent = F.transform(
        F.map_entries(
            F.map_filter("m", lambda k, v: v >= F.lit(min_count))
        ),
        lambda e: F.concat_ws(":", e["key"], e["value"].cast("string")),
    )
    return m.select(
        "doc_id",
        F.size("m").alias("n_distinct_words"),
        F.concat_ws(",", F.array_sort(frequent)).alias("frequent"),
    )


def scd2_intervals(events: DataFrame) -> DataFrame:
    """Build SCD-type-2 validity intervals from a change log: each
    (user, event) sets a new current value whose validity runs from
    its timestamp until the user's next change (NULL for the open
    current row) — the standard dimension-history construction.

    Plan: one window pass per user ordered by (ts, event_id) — the
    unique event_id tiebreak makes ``lead`` deterministic under
    simultaneous changes. One exchange on the entity key; state is a
    single row of lookahead. At warehouse scale the change log is
    range-partitioned by entity so the sort is per-partition local.

    A change row with a NULL timestamp is routed OUT of the version
    timeline (emitted with NULL valid_to and NULL is_current): it has
    no place in the ordering — left in, Spark (NULLS FIRST) would
    make it the user's OLDEST version while engines with NULLS-LAST
    conventions make it the CURRENT one, silently closing or opening
    a different real version on each engine. Unknown effective date
    means unknown interval, stated as NULLs, not a guessed position.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dated = events.where(F.col("ts").isNotNull())
    undated = events.where(F.col("ts").isNull())
    versions = dated.select(
        "user_id",
        F.col("value").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        (F.lead("ts").over(w).isNull()).alias("is_current"),
    )
    return versions.unionByName(
        undated.select(
            "user_id",
            F.col("value").alias("attr_value"),
            F.col("ts").alias("valid_from"),
            F.lit(None).cast(events.schema["ts"].dataType).alias("valid_to"),
            F.lit(None).cast("boolean").alias("is_current"),
        )
    )


def variant_props_histogram(events: DataFrame) -> DataFrame:
    """Semi-structured VARIANT coverage (Spark 4): parse the ``props``
    JSON wire column ONCE into a ``variant`` value, then extract typed
    fields with ``variant_get`` — the open-schema ingestion pattern
    where the payload shape is not known at write time.

    Why VARIANT instead of ``get_json_object`` per field: the parse
    happens once per row into a binary-encoded value; every subsequent
    extraction is a path walk over that encoding, not a re-parse of the
    JSON text — with k extracted fields that is 1 parse + k walks
    versus k full parses. At 100 TB of event payloads the parse IS the
    scan cost. All scan-side; one map-side-combined aggregate on the
    derived bucket.
    """
    return (
        events.select(F.parse_json(F.col("props")).alias("__v"))
        .select(
            F.expr("variant_get(__v, '$.k', 'bigint')").alias("k")
        )
        .groupBy(F.pmod(F.col("k"), F.lit(10)).alias("k_mod"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )
