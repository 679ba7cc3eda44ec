from .analytics import (  # noqa: F401
    big_ticket_orders,
    brand_bracket_revenue,
    cohort_retention,
    funnel_conversion,
    gap_filled_daily_counts,
    interpolated_hourly_series,
    late_shipment_priority,
    market_share,
    ohlc_bars,
    order_count_distribution,
    pricing_summary,
    promo_revenue_share,
    quantile_bins,
    returned_item_top_customers,
    rolling_correlation,
    revenue_by_nation,
    revenue_cube,
    rich_inactive_customers,
    small_quantity_revenue,
    status_priority_grouping_sets,
    top_supplier,
    topk_orders_per_customer,
    volume_shipping,
    zscore_anomalies,
)
from .batch_ingest import batch_feature_records, run_batch_ingest  # noqa: F401
from .inference import (  # noqa: F401
    assemble_features_csv,
    enrich_transactions,
    latency_metric,
    threshold_classify,
)
from .relational import (  # noqa: F401
    approx_value_percentiles,
    churned_buyers,
    customers_with_urgent_orders,
    doc_word_profile,
    dormant_customers,
    monthly_orders_by_id_parity,
    nation_order_profile,
    order_deltas,
    props_profile,
    revenue_pivot_by_priority,
    repeat_buyers,
    scd2_intervals,
    trailing_distinct_types,
    unpivot_lineitem_measures,
    user_value_arrays,
    value_percentiles,
)
from .pipeline import clean_corpus  # noqa: F401
from .quality import check_quality, ingest_quality_gate  # noqa: F401
from .train_prep import train_prep, train_test_split  # noqa: F401
