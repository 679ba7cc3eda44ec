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

from .conftest import SF001


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


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
