"""Physical-plan regression tests: the plans we ship are the plans we
designed — shuffle counts, broadcast choices, scan pruning. A change
that silently doubles an exchange or widens a scan fails here."""

from __future__ import annotations

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
    agg_features_query,
    latest_per_key,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import (
    batch_feature_records,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import (
    load_transactions,
)

from .conftest import SF001, plan_str as _plan


def test_scan_prunes_unused_columns(spark):
    plan = _plan(load_transactions(spark, SF001))
    # events has 6 columns; the transaction projection needs 4
    assert "event_type" not in plan.split("ReadSchema")[-1]
    assert "props" not in plan.split("ReadSchema")[-1]


def test_e1_single_exchange(spark):
    plan = _plan(agg_features_query(load_transactions(spark, SF001)))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_e1_windows_collapsed(spark):
    """All aggregates of both frames evaluate in ONE Window node over
    one sort (chained withColumn used to split them into 4 Window + 4
    Sort by interleaving Projects)."""
    plan = _plan(agg_features_query(load_transactions(spark, SF001)))
    assert plan.count("+- Window") == 1, plan
    assert plan.count("+- Sort") == 1, plan


def test_b13_reuses_window_partitioning(spark):
    """dense_rank after the window aggregates partitions on the same key
    -> Catalyst must NOT add a second hash exchange."""
    agg = agg_features_query(load_transactions(spark, SF001), keep_cent_sums=True)
    plan = _plan(batch_feature_records(agg))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_latest_per_key_single_exchange(spark):
    df = load_transactions(spark, SF001)
    plan = _plan(latest_per_key(df))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_whole_stage_codegen_in_hot_path(spark):
    df = agg_features_query(load_transactions(spark, SF001))
    df.collect()  # AQE finalizes THIS QueryExecution only on its own action
    plan = _plan(df)
    # codegen'd operators carry the "*(n)" stage prefix in toString()
    assert "*(" in plan, plan
    # no Python evaluation in the batch path
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_semi_anti_join_build_side_is_key_only(spark):
    """Semi/anti joins must broadcast a key-only projection of the
    filtered orders side, with the filter pushed into the scan — at
    scale the build side carries 8-byte keys, not order rows."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import (
        customers_with_urgent_orders,
        dormant_customers,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    cust = load_table(spark, SF001, "customer")
    orders = load_table(spark, SF001, "orders")

    semi = _plan(customers_with_urgent_orders(cust, orders))
    assert "LeftSemi" in semi, semi
    assert "EqualTo(o_orderpriority,1-URGENT)" in semi  # pushed filter
    # build-side scan reads exactly the key + filter column
    build_schema = semi.split("ReadSchema")[-1]
    assert "o_totalprice" not in build_schema

    anti = _plan(dormant_customers(cust, orders))
    assert "LeftAnti" in anti, anti
    assert "GreaterThanOrEqual(o_orderdate" in anti  # pushed filter


def test_distinct_agg_single_expand(spark):
    """Multi-DISTINCT agg: ONE Expand node, broadcast dims, and no
    more than the two inherent exchanges (expanded partial + final)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import nation_order_profile
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    plan = _plan(
        nation_order_profile(
            load_table(spark, SF001, "orders"),
            load_table(spark, SF001, "customer"),
            load_table(spark, SF001, "nation"),
        )
    )
    assert plan.count("Expand") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert plan.count("BroadcastHashJoin") == 2, plan


def test_percentiles_single_exchange_reused_by_final_agg(spark):
    """Exact percentiles: one hash exchange on the group key feeds the
    sort, both Window nodes, AND the final aggregate (Catalyst must not
    re-shuffle for the groupBy over the same key)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import value_percentiles
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    plan = _plan(value_percentiles(load_table(spark, SF001, "events")))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("+- Sort") == 1, plan


def test_window_funcs_share_one_exchange(spark):
    """lag/row_number/ntile over two orderings of the same partition
    key: one hash exchange, two sorts — never an exchange per
    function."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import order_deltas
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    plan = _plan(order_deltas(load_table(spark, SF001, "orders")))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("+- Window") == 2, plan


def test_pivot_preaggregates_before_shuffle(spark):
    """Explicit-values pivot: the fact scan feeds a map-side partial
    aggregate; every exchange moves only (group, pivot-value) cells.
    A value-less pivot would also run a distinct-values job first."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import revenue_pivot_by_priority
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    plan = _plan(
        revenue_pivot_by_priority(
            load_table(spark, SF001, "orders"),
            load_table(spark, SF001, "customer"),
            load_table(spark, SF001, "nation"),
        )
    )
    assert "pivotfirst" in plan, plan
    # partial agg sits below the first exchange
    first_exchange = plan.index("Exchange hashpartitioning")
    assert "partial_sum" in plan[first_exchange:], plan
    assert plan.count("BroadcastHashJoin") == 2, plan


def test_b2_sql_surface_equals_dataframe_plan(spark):
    """B2: the SQL-string entry (temp view + spark.sql of the
    reference-shaped WINDOW query) must produce bit-identical rows AND
    the same single-exchange single-sort physical plan as the DataFrame
    twin."""
    import __spark_entry__ as e

    from .conftest import SF0001

    sql_df = e._q_b2_sql_agg_features(spark, SF0001)
    plan = _plan(sql_df)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("+- Window") == 1, plan

    df_rows = sorted(
        map(tuple, e._q_e1_agg_features(spark, SF0001).collect())
    )
    sql_rows = sorted(
        map(tuple, sql_df.select(*e._q_e1_agg_features(spark, SF0001).columns).collect())
    )
    assert sql_rows == df_rows


def test_window_distinct_single_exchange(spark):
    """collect_set-emulated COUNT(DISTINCT) OVER: same one-exchange
    window envelope as any analytic function."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import trailing_distinct_types
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    plan = _plan(trailing_distinct_types(load_table(spark, SF001, "events")))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_unpivot_is_scan_side_expand(spark):
    """unpivot = one Expand, zero exchanges (no shuffle at all)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import unpivot_lineitem_measures
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    plan = _plan(unpivot_lineitem_measures(load_table(spark, SF001, "lineitem")))
    assert plan.count("Expand") == 1, plan
    assert "Exchange" not in plan, plan


def test_incremental_plan_prunes_history(spark):
    """delta_scoped_features with a literal frontier must (a) push the
    horizon predicate into the history scan and (b) broadcast the
    delta-key semi join — the history side never shuffles before the
    window exchange."""
    from pyspark.sql import functions as F

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.incremental import (
        delta_scoped_features,
    )

    ev = (
        spark.read.parquet(f"{SF001}/events.parquet")
        .select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id",
            "value",
        )
    )
    cutoff_us = 1_706_000_000_000_000  # fixed literal frontier
    ts_us = F.unix_micros("ts")
    history = ev.where(ts_us < cutoff_us)
    delta = ev.where(ts_us >= cutoff_us)
    df = delta_scoped_features(
        history, delta, key="user_id", ts="ts", amount="value",
        delta_start_us=cutoff_us,
    )
    df.collect()  # finalize AQE so join strategy choices are real
    plan = _plan(df).split("+- == Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    # the literal horizon bound filters the history branch directly
    # (with a raw scan column it would also be a PushedFilter; here the
    # ntz->timestamp cast keeps it a post-scan Filter, still pruned
    # before any shuffle)
    assert str(cutoff_us - 604800000000) in plan, plan
    # two hash exchanges and no more: the window's over the sliver,
    # plus the delta-key distinct (keys only — 8 bytes/row) that feeds
    # the broadcast build side. The history fact rows themselves never
    # shuffle outside the window exchange.
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_clean_corpus_filters_below_single_exchange(spark):
    """The composed cleaning pipeline: quality+lang filters must sit
    ON THE SCAN (they commute with text-keyed dedup), one exchange
    total (the dedup window), and WindowGroupLimit must pre-trim
    duplicate groups map-side before the shuffle."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import clean_corpus
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    df = clean_corpus(load_table(spark, SF001, "documents"))
    df.collect()
    plan = _plan(df).split("+- == Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1, plan
    lines = plan.splitlines()
    ex = next(i for i, l in enumerate(lines) if "Exchange hashpartitioning" in l)
    scan_filter = next(
        i for i, l in enumerate(lines) if "Filter" in l and "quality" not in l
        and "size(filter(split(trim(" in l
    )
    assert scan_filter > ex, plan  # deeper line = earlier in dataflow
    assert "WindowGroupLimit" in plan, plan
    assert "DataFilters" in plan.splitlines()[-1] or "FileScan" in plan, plan


def test_rag_index_single_exchange_and_correct_stages(spark):
    """The composed RAG-index pipeline (chunk → chunk-hash dedup →
    stub embed → SRP bucket): the dedup window's exchange must be the
    ONLY data motion — chunking, embedding, and bucketing all stay
    scan-side — and the result must have one row per surviving chunk
    per table with a bucket inside [0, 2^planes)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import rag_index
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    df = rag_index(
        load_table(spark, SF001, "documents"),
        dims=8, n_planes=4, n_tables=2,
    )
    rows = df.collect()
    plan = _plan(df).split("+- == Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "WindowGroupLimit" in plan, plan  # dedup pre-trim map-side
    assert rows and all(0 <= r["bucket"] < 16 for r in rows)
    assert {r["table"] for r in rows} == {0, 1}
    # dedup really keyed the hash: unique (chunk_hash, table)
    keys = [(r["chunk_hash"], r["table"]) for r in rows]
    assert len(keys) == len(set(keys))


def test_enrich_join_strategy_toggle(spark):
    """i_enrich: broadcast by default; the shuffle_hash variant must
    plan ShuffledHashJoin with NO BroadcastExchange for the feature
    dims — the strategy a deployment flips to when the dimension
    outgrows broadcast."""
    import __spark_entry__ as e

    from .conftest import SF0001

    b = _plan(e._q_inference_enrich(spark, SF0001))
    assert "BroadcastHashJoin" in b, b

    s_df = e._q_inference_enrich(spark, SF0001, join_strategy="shuffle_hash")
    s_df.collect()  # finalize AQE — hints must survive re-planning
    s = _plan(s_df).split("+- == Initial Plan ==")[0]
    assert "ShuffledHashJoin" in s, s
    assert "BroadcastHashJoin" not in s, s


def test_q13_preaggregates_orders_before_customer_join(spark):
    """order_count_distribution must aggregate orders to one row per
    customer BEFORE the customer join — the Exchange under the join
    carries the aggregate, so exactly one HashAggregate pair sits
    below the SortMergeJoin/BroadcastHashJoin, not above it."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import order_count_distribution
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    plan = _plan(
        order_count_distribution(
            load_table(spark, SF001, "customer"), load_table(spark, SF001, "orders")
        )
    )
    join_pos = max(plan.find("SortMergeJoin"), plan.find("BroadcastHashJoin"))
    assert join_pos >= 0, plan
    # an aggregate of orders appears BELOW (after, in tree print) the join
    assert "HashAggregate" in plan[join_pos:], plan


def test_q10_topk_is_take_ordered(spark):
    """returned_item_top_customers' global top-k must plan as
    TakeOrderedAndProject (per-partition heaps), not a global Sort."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import returned_item_top_customers
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    plan = _plan(
        returned_item_top_customers(
            load_table(spark, SF001, "customer"),
            load_table(spark, SF001, "orders"),
            load_table(spark, SF001, "lineitem"),
            load_table(spark, SF001, "nation"),
        )
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_vocab_ranks_only_after_heap_limit(spark):
    """build_vocabulary must TakeOrdered-limit BEFORE the id-assigning
    window — the single-partition window input is k rows, not the
    term table."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.tfidf import build_vocabulary
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    plan = _plan(build_vocabulary(load_table(spark, SF001, "documents")))
    w = plan.find("Window")
    t = plan.find("TakeOrderedAndProject")
    assert w >= 0 and t >= 0, plan
    # tree prints top-down: Window consumes TakeOrdered's output
    assert w < t, plan


def test_tfidf_topk_uses_window_group_limit(spark):
    """tfidf_top_terms' per-doc rank<=k must trigger the
    WindowGroupLimit rewrite (k-row heap per doc, no full sort of each
    doc's term list)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.tfidf import tfidf_top_terms
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    plan = _plan(tfidf_top_terms(load_table(spark, SF001, "documents"), k=3))
    assert "WindowGroupLimit" in plan, plan


def test_hash_split_adds_no_exchange(spark):
    """hash_split is scan-side only — zero shuffles."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.train_prep import hash_split
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    plan = _plan(hash_split(load_table(spark, SF001, "events"), "user_id"))
    assert "Exchange" not in plan, plan


def test_ohlc_is_single_aggregate_no_window(spark):
    """ohlc_bars must be ONE hash-aggregate pair (partial+final) with
    no Window/Sort — min_by/max_by, not row_number."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import ohlc_bars
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    plan = _plan(ohlc_bars(load_table(spark, SF001, "events")))
    assert "Window" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_zscore_stats_broadcast_back(spark):
    """zscore_anomalies: the per-series stats join must be a broadcast
    hash join, and the only Exchange is the stats aggregation — the
    fact scan itself never shuffles."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import zscore_anomalies
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    plan = _plan(zscore_anomalies(load_table(spark, SF001, "events")))
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_quantile_bins_single_exchange(spark):
    """quantile_bins: one shuffle on the series key, reused by the
    ntile window and the boundary aggregation."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import quantile_bins
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    plan = _plan(quantile_bins(load_table(spark, SF001, "events")))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_shipping_priority_agg_reuses_join_exchange(spark):
    """Q3 shape: in the all-shuffle regime (broadcast disabled — the
    100 TB stand-in, where the SF-scaled customer side correctly joins
    shuffled under the module's broadcast doctrine) the per-order
    revenue aggregate must REUSE the order-key join partitioning: the
    only exchanges are the two joins' four sides (customer⋈orders on
    custkey, then ⋈lineitem on orderkey), none added by the groupBy —
    and top-k must plan as TakeOrdered, not a global sort."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.analytics import shipping_priority
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    from .conftest import SF001

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q = shipping_priority(
            load_table(spark, SF001, "lineitem"),
            load_table(spark, SF001, "orders"),
            load_table(spark, SF001, "customer"),
        )
        plan = _plan(q)
        # 4 exchanges = the two shuffle joins' sides; the groupBy adds none
        assert plan.count("Exchange hashpartitioning") == 4, plan
        assert "TakeOrdered" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_forecast_revenue_pushes_date_range_to_scan(spark):
    """Q6 shape: the ship-date RANGE must land in PushedFilters
    (row-group pruning); the basis-point discount band is the
    designed residual."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.analytics import (
        forecast_revenue_change,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    from .conftest import SF001

    plan = _plan(forecast_revenue_change(load_table(spark, SF001, "lineitem")))
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "l_shipdate" in pushed and "l_quantity" in pushed, plan


def test_dedup_append_bucketed_never_shuffles_the_index(spark, tmp_path):
    """The standing-pipeline dedup contract: with the corpus index
    persisted bucketed on text_hash, the per-batch anti-join must add
    ZERO exchange above the index scan — only the O(batch) aggregation
    shuffles. (At 100 TB the index is multi-TB; re-shuffling it every
    ingest batch is the exact cost bucketing removes.)"""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        build_text_hash_index,
        build_text_hash_index_bucketed,
        dedup_append,
        dedup_append_bucketed,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    docs = load_table(spark, SF001, "documents").select("doc_id", "text")
    corpus = docs.where("doc_id % 3 != 0")
    batch = docs.where("doc_id % 2 = 0")  # overlaps corpus on %6 != 0
    try:
        build_text_hash_index_bucketed(
            corpus, "t_dedup_idx", num_buckets=8,
            path=str(tmp_path / "idx"),
        )
        out = dedup_append_bucketed(spark, batch, "t_dedup_idx")
        plan = _plan(out)
        assert "SortMergeJoin" in plan and "LeftAnti" in plan, plan
        # one exchange total: the batch groupBy (which, at the bucket
        # count, also satisfies the join's requirement)
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "BroadcastExchange" not in plan, plan

        want = dedup_append(build_text_hash_index(corpus), batch)
        assert sorted(map(tuple, out.collect())) == sorted(
            map(tuple, want.collect())
        )
        assert out.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_dedup_idx")


def test_volume_shipping_pushes_shipdate_range_to_scan(spark):
    """Q7 shape: the ship-year bound must land in the lineitem scan's
    PushedFilters as a shipdate RANGE (year() is unpushable)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.analytics import volume_shipping
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    from .conftest import SF001

    plan = _plan(
        volume_shipping(
            load_table(spark, SF001, "lineitem"),
            load_table(spark, SF001, "orders"),
            load_table(spark, SF001, "customer"),
            load_table(spark, SF001, "supplier"),
            load_table(spark, SF001, "nation"),
        )
    )
    pushed = [
        seg.split("]")[0]
        for seg in plan.split("PushedFilters: [")[1:]
    ]
    assert any(
        "l_shipdate" in p and "GreaterThanOrEqual" in p for p in pushed
    ), plan
