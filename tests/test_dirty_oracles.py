"""Spark-vs-DuckDB oracle agreement on DIRTY data.

The driver gate runs every oracle on the CLEAN sf0.01 tables, so a
contract divergence that only activates on dirty inputs (NULL text,
NULL ids, zero-norm vectors, non-matching names) would stay green
until real data hits it. This suite re-runs a slice of the registered
(query, oracle) pairs on tables salted with exactly those inputs —
the round-5 oracle-hardening pass (NULL-propagating ``||`` hashes,
NULL-text exclusion in the minhash family, zero-norm exclusion in the
SRP/cosine oracles, SQL-unique semantics, TRY_CAST) is pinned here.

Scale-dependent oracles (sim_ann_*: auto_planes baked for sf0.01) are
safe to include because both the dirty corpus and sf0.01 sit below
the plane-count min-clamp, so both sides resolve the same constant.
The sim_ivf_* and t_inbatch_negatives oracles are scale-invariant as
of round 7 (n_cells / the seeded-centroid step / n_batches derive
from count(*) subqueries, mirroring the query sides' footer-count
policies), so every registered oracle is valid at any sf_dir and all
are salted here like everything else.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from .conftest import SF0001
from .oracle import assert_matches, run_oracle

ZERO_VEC = [0.0] * 64
TINY_VEC = [4e-7] * 64  # every component quantizes to 0 at 1e-6


def _salt_documents(dirty_dir: str) -> None:
    t = pq.read_table(os.path.join(SF0001, "documents.parquet"))
    base = t.slice(0, 40)
    dup_text = t.column("text")[0].as_py()
    extra = pa.table(
        {
            "doc_id": pa.array([9001, 9002, None, 9004, 9005], pa.int64()),
            "text": pa.array(
                [None, "", dup_text, "x", dup_text], pa.string()
            ),
            "lang": pa.array(["en"] * 5, pa.string()),
            "source": pa.array(
                ["dirty", "dirty", "dirty", None, "dirty"], pa.string()
            ),
            "n_chars": pa.array([None, 0, len(dup_text), 1, None], pa.int64()),
        }
    ).cast(base.schema)
    pq.write_table(
        pa.concat_tables([base, extra]),
        os.path.join(dirty_dir, "documents.parquet"),
    )


def _salt_embeddings(dirty_dir: str) -> None:
    t = pq.read_table(os.path.join(SF0001, "embeddings.parquet"))
    base = t.slice(0, 60)
    extra = pa.table(
        {
            "vec_id": pa.array([9001, 9002, 9003], pa.int64()),
            "embedding": pa.array(
                [ZERO_VEC, TINY_VEC, None], pa.list_(pa.float32())
            ),
            "label": pa.array([1, None, 2], pa.int32()),
        }
    ).cast(base.schema)
    pq.write_table(
        pa.concat_tables([base, extra]),
        os.path.join(dirty_dir, "embeddings.parquet"),
    )


def _salt_events(dirty_dir: str) -> None:
    t = pq.read_table(os.path.join(SF0001, "events.parquet"))
    base = t.slice(0, 200)
    rows = base.slice(0, 5).to_pylist()
    # one dirty row per column a pipeline keys/aggregates/windows on
    rows[0]["user_id"] = None          # NULL partition/split key
    rows[0]["event_id"] = 9001
    rows[1]["ts"] = None               # NULL event time (window order)
    rows[1]["event_id"] = 9002
    rows[2]["value"] = None            # NULL measure
    rows[2]["event_id"] = 9003
    rows[3]["event_type"] = None       # NULL group label
    rows[3]["event_id"] = 9004
    rows[4]["props"] = None            # NULL semi-structured payload
    rows[4]["event_id"] = 9005
    # an ISOLATED NULL-measure event: its trailing window frames hold
    # nothing but itself, so the all-NULL-frame case (avg must be
    # NULL, not a cancelled-out 0.0 — the bucketed-sweep bug class)
    # is actually exercised; a NULL-value twin of an existing row
    # always shares its frame with the non-NULL original
    import datetime as dt

    iso = base.slice(5, 1).to_pylist()[0]
    iso["event_id"] = 9006
    iso["value"] = None
    iso["ts"] = max(
        r["ts"] for r in base.to_pylist() if r["ts"] is not None
    ) + dt.timedelta(hours=3)
    rows.append(iso)
    extra = pa.Table.from_pylist(rows, schema=base.schema)
    pq.write_table(
        pa.concat_tables([base, extra]),
        os.path.join(dirty_dir, "events.parquet"),
    )


def _salt_orders_customer(dirty_dir: str) -> None:
    o = pq.read_table(os.path.join(SF0001, "orders.parquet"))
    c = pq.read_table(os.path.join(SF0001, "customer.parquet"))
    o_base, c_base = o.slice(0, 150), c
    o_rows = o_base.slice(0, 6).to_pylist()
    # two NULL order keys (never "duplicates" of each other under
    # SQL-unique), one duplicated real key
    o_rows[0]["o_orderkey"] = None
    o_rows[1]["o_orderkey"] = None
    o_rows[2]["o_orderkey"] = o_base.column("o_orderkey")[5].as_py()
    # NULL FK / time bucket / measure / group label — the join-family
    # null conventions (semi/anti/outer joins, date filters, top-k)
    o_rows[3]["o_orderkey"] = 900001
    o_rows[3]["o_custkey"] = None
    o_rows[4]["o_orderkey"] = 900002
    o_rows[4]["o_orderdate"] = None
    o_rows[4]["o_totalprice"] = None
    o_rows[5]["o_orderkey"] = 900003
    o_rows[5]["o_orderpriority"] = None
    o_rows[5]["o_orderstatus"] = None
    c_rows = c_base.slice(0, 3).to_pylist()
    # regex-hostile name + a fresh key the dirty orders reference
    new_ck = max(x.as_py() for x in c_base.column("c_custkey")) + 1
    c_rows[0]["c_custkey"] = new_ck
    c_rows[0]["c_name"] = "ACME Corp"
    for r in o_rows[:3]:
        r["o_custkey"] = new_ck
    # NULL nation FK (customer->nation joins) and NULL attributes
    c_rows[1]["c_custkey"] = new_ck + 1
    c_rows[1]["c_nationkey"] = None
    c_rows[2]["c_custkey"] = new_ck + 2
    c_rows[2]["c_acctbal"] = None
    c_rows[2]["c_mktsegment"] = None
    pq.write_table(
        pa.concat_tables(
            [o_base, pa.Table.from_pylist(o_rows, schema=o_base.schema)]
        ),
        os.path.join(dirty_dir, "orders.parquet"),
    )
    pq.write_table(
        pa.concat_tables(
            [c_base, pa.Table.from_pylist(c_rows, schema=c_base.schema)]
        ),
        os.path.join(dirty_dir, "customer.parquet"),
    )


def _salt_lineitem_supplier_nation(dirty_dir: str) -> None:
    li = pq.read_table(os.path.join(SF0001, "lineitem.parquet"))
    li_base = li.slice(0, 400)
    rows = li_base.slice(0, 6).to_pylist()
    # one NULL per column class a query joins/filters/aggregates on;
    # fresh line numbers so the salted rows aren't dup (orderkey, line)
    rows[0]["l_orderkey"] = None            # NULL join key to orders
    rows[1]["l_suppkey"] = None             # NULL join key to supplier
    rows[2]["l_shipdate"] = None            # NULL time filter column
    rows[3]["l_quantity"] = None            # NULL measures
    rows[3]["l_extendedprice"] = None
    rows[4]["l_returnflag"] = None          # NULL group labels
    rows[4]["l_linestatus"] = None
    rows[5]["l_discount"] = None            # NULL rate columns
    rows[5]["l_tax"] = None
    for i, r in enumerate(rows):
        r["l_linenumber"] = 90 + i
    pq.write_table(
        pa.concat_tables(
            [li_base, pa.Table.from_pylist(rows, schema=li_base.schema)]
        ),
        os.path.join(dirty_dir, "lineitem.parquet"),
    )
    s = pq.read_table(os.path.join(SF0001, "supplier.parquet"))
    s_rows = s.slice(0, 2).to_pylist()
    new_sk = max(x.as_py() for x in s.column("s_suppkey")) + 1
    s_rows[0]["s_suppkey"] = new_sk
    s_rows[0]["s_nationkey"] = None         # NULL nation FK
    s_rows[1]["s_suppkey"] = new_sk + 1
    s_rows[1]["s_acctbal"] = None
    pq.write_table(
        pa.concat_tables([s, pa.Table.from_pylist(s_rows, schema=s.schema)]),
        os.path.join(dirty_dir, "supplier.parquet"),
    )
    p = pq.read_table(os.path.join(SF0001, "part.parquet"))
    p_rows = p.slice(0, 3).to_pylist()
    new_pk = max(x.as_py() for x in p.column("p_partkey")) + 1
    p_rows[0]["p_partkey"] = new_pk
    p_rows[0]["p_brand"] = None            # NULL group label
    p_rows[1]["p_partkey"] = new_pk + 1
    p_rows[1]["p_type"] = None             # NULL filter/LIKE column
    p_rows[2]["p_partkey"] = new_pk + 2
    p_rows[2]["p_retailprice"] = None      # NULL bracket measure
    p_rows[2]["p_size"] = None
    pq.write_table(
        pa.concat_tables([p, pa.Table.from_pylist(p_rows, schema=p.schema)]),
        os.path.join(dirty_dir, "part.parquet"),
    )
    # nation/region ride through unsalted (tiny dims)
    for t in ("nation", "region"):
        src = os.path.join(SF0001, f"{t}.parquet")
        if os.path.exists(src):
            pq.write_table(pq.read_table(src), os.path.join(dirty_dir, f"{t}.parquet"))


@pytest.fixture(scope="module")
def dirty_dir(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("dirty_sf"))
    _salt_documents(d)
    _salt_embeddings(d)
    _salt_events(d)
    _salt_orders_customer(d)
    _salt_lineitem_supplier_nation(d)
    return d


# Queries whose inputs the salting touches. Each runs the REGISTERED
# Spark query against the REGISTERED oracle on the dirty tables.
DIRTY_QUERIES = [
    # hash/dedup family: NULL text + NULL doc_id + planted dups
    "dedup_exact",
    "dedup_exact_128",
    "dedup_url_canonical",
    "dedup_minhash_sigs",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_simhash",
    "dedup_source_overlap",
    "dedup_inc_lsh_append",
    "dedup_hamming_pairs",
    "mm_image_near_dup",
    "mm_audio_near_dup",
    "mm_video_near_dup",
    "dedup_hamming_clusters",
    "t_leakage_split",
    "dedup_hamming_edges",
    "dedup_lsh_edges",
    "dedup_clusters_append",
    "t_inbatch_negatives",
    # text family over NULL/empty text
    "text_stats",
    "text_gopher_rules",
    "text_lang_id",
    "text_fingerprint",
    "text_repetition",
    "text_token_spectrum",
    "text_lm_score",
    "text_lm3_score",
    "text_lm5_score",
    "text_clean_boilerplate",
    "pipeline_quality_filter",
    "pipeline_quality_filter3",
    # sampling / chunking / packing with NULL ids, weights, text
    "t_weighted_sample",
    "t_temperature_mix",
    "t_token_budget_mix",
    "t_epoch_mix",
    "t_chunk_documents",
    "t_global_shuffle",
    "t_pack_windows",
    "t_pack_windows_bpe",
    "t_pack_windows_real_bpe",
    "text_bpe_encode",
    "t_hash_split",
    # similarity family: zero-norm / tiny / NULL embeddings
    "sim_cosine_topk",
    "sim_ann_srp_topk",
    "sim_ann_batched_topk",
    "sim_ivf_topk",
    "sim_ivf_batched_topk",
    "sim_pq_topk",
    "sim_pq_rerank_topk",
    "sim_ivf_pq_batched_topk",
    "sim_ivf_pq_rerank_topk",
    "t_hard_negatives",
    "sim_embedding_near_dup",
    "dedup_semantic_pairs",
    "dedup_semantic_clusters",
    "sim_label_centroids",
    # in-engine hashed embeddings: NULL text, empty text, NULL doc_id,
    # planted dup text (identical vectors -> cosine 1 pairs)
    "text_hash_embed",
    "dedup_semantic_text",
    "sim_text_topk",
    "sim_text_topk_filtered",
    "text_quality_classifier",
    "pipeline_quality_filter_linear",
    "sim_text_near_dup",
    # pipelines composing the above
    "pipeline_clean_corpus",
    "pipeline_curate_shards",
    "pipeline_rag_index",
    # relational dirty cases: NULL unique keys, regex-hostile name
    "q_validate_orders",
    "rel_regex_month",
    # event pipelines over NULL keys / timestamps / measures / labels
    "e1_agg_features",
    "e1_skew_window",
    "b2_sql_agg_features",
    "sessionize",
    "time_rollup",
    "funnel_conversion",
    "stratified_sample",
    "ts_ohlc_daily",
    "ts_zscore_anomalies",
    "ts_decay_features",
    "udx_median_by_user",
    "rel_json_props",
    "rel_variant_props",
    "t_quantile_bins",
    "inc_delta_features",
    "asof_join",
    "range_join",
    # olap/rel join family: NULL custkey/suppkey/nationkey/orderkey
    # through semi/anti/outer joins, NULL dates through filters, NULL
    # measures through aggregates, NULL labels through group-bys
    "rel_semi_join",
    "rel_anti_join",
    "rel_salted_join",
    "rel_intersect",
    "rel_except",
    "rel_scd2_intervals",
    "olap_pricing_summary",
    "olap_revenue_by_nation",
    "olap_market_share",
    "olap_topk_orders",
    "olap_shipping_priority",
    "olap_rich_inactive",
    "olap_local_supplier_revenue",
    "olap_returned_top_customers",
    "olap_top_supplier",
    "olap_volume_shipping",
    "olap_sole_late_supplier",
    "olap_late_shipment_priority",
    "olap_promo_share",
    "olap_big_ticket_orders",
    "olap_brand_brackets",
    "olap_order_count_dist",
    "b13_feature_records",
    "cohort_retention",
    "dedup_contamination",
    "dedup_substring_spans",
    "dedup_substring_removed",
    "dedup_edit_distance",
    "dedup_inc_append",
    "dedup_inc_append_bloom",
    "i_enrich",
    "i_enrich_shuffle",
    "mm_frame_sample",
    "olap_forecast_revenue",
    "olap_grouping_sets",
    "olap_revenue_cube",
    "olap_small_qty_revenue",
    "pipeline_curate_mix",
    "text_ccnet_buckets",
    "pipeline_source_cap",
    "pit_training_set",
    "q_profile_table",
    "rel_array_agg",
    "rel_distinct_agg",
    "rel_map_funcs",
    "rel_percentiles",
    "rel_pivot",
    "rel_unpivot",
    "rel_window_distinct",
    "rel_window_funcs",
    "s4_sliding_windowed",
    "sketch_cms_heavy_hitters",
    "sketch_kmv_distinct",
    "t_train_prep",
    "text_bpe_vocab",
    "text_lang_id_ngram",
    "text_pii_scan",
    "text_pmi_collocations",
    "text_tfidf_top_terms",
    "text_bm25_topk",
    "text_bm25_topk_filtered",
    "sim_hybrid_rrf_topk",
    "text_vocab_coverage",
    "text_vocab_topk",
    "ts_gap_fill_daily",
    "ts_interpolate_hourly",
    "ts_rolling_corr",
    "udx_luhn",
    "udx_word_positions",
]

# Streaming replay fixtures on the salted events table: NULL keys /
# timestamps / measures through the REAL writeStream execution paths
# (state fns, watermark drops, stream-stream range state, broadcast
# enrich). Split out so the batch list stays cheap to run alone.
DIRTY_STREAM_QUERIES = [
    "s_stream_dedup",
    "s_stream_enrich",
    "s_stream_running_totals",
    "s_stream_sessions",
    "s_stream_tumbling_agg",
    "s_stream_late_drop",
    "s_stream_interval_join",
    "s_stream_interval_join_semi",
    "s_stream_interval_join_outer",
    "s_stream_interval_join_full",
    "s_stream_hamming_index",
    "s_stream_cluster_maintain",
    "s_stream_lsh_index",
    "s_stream_semantic_index",
    "sim_index_topk_filtered",
    "sim_pq_index_topk_filtered",
    "s_stream_bm25_index",
    "s_stream_bm25_filtered",
    "s_stream_hybrid_rrf",
    "s_stream_semantic_text",
    "s_stream_semantic_pq",
    "s_stream_semantic_text_pq",
    "s_stream_lm_score",
    "s_stream_clf_score",
    "s_stream_curate",
    "s_stream_curate_near",
    "s_stream_curate_clf_near",
    "s_stream_contamination",
    "s_stream_substring",
    "s4_sliding_agg",
]

# text_gopher_rules rides the batch list below (regex-hostile +
# NULL-text salts are exactly what its line/token rules must survive)


@pytest.mark.parametrize("name", DIRTY_QUERIES)
def test_oracle_agrees_on_dirty_data(spark, dirty_dir, name):
    import __spark_entry__ as e

    sdf = e.queries()[name](spark, dirty_dir)
    oracle = run_oracle(e.oracle_sql()[name], dirty_dir)
    assert_matches(sdf, oracle)


@pytest.mark.parametrize("name", DIRTY_STREAM_QUERIES)
def test_stream_oracle_agrees_on_dirty_data(spark, dirty_dir, name):
    import __spark_entry__ as e

    sdf = e.queries()[name](spark, dirty_dir)
    oracle = run_oracle(e.oracle_sql()[name], dirty_dir)
    assert_matches(sdf, oracle)
