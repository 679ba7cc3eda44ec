"""Semantic unit tests for the round-3 operators: OLAP query shapes,
OHLC/interpolation time-series resamples, deterministic hash split,
and TF-IDF/vocabulary corpus statistics.

(The DuckDB oracle equivalence of every registered query is covered
separately by tests/test_entry_oracles.py; these tests pin the
semantics on hand-built micro-fixtures where the expected answer is
computable by eye.)
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.tfidf import (
    build_vocabulary,
    tfidf_top_terms,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import (
    interpolated_hourly_series,
    ohlc_bars,
    order_count_distribution,
    top_supplier,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.train_prep import hash_split


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_hash_split_entity_consistent_and_stable(spark):
    rows = [(u, i) for u in range(200) for i in range(3)]
    df = spark.createDataFrame(rows, "user_id long, seq long")
    a = hash_split(df, "user_id").select("user_id", "split").distinct()
    # every entity lands on exactly one side
    assert a.groupBy("user_id").count().where("count > 1").count() == 0
    # rerun produces the identical assignment (no RNG)
    b = hash_split(df, "user_id").select("user_id", "split").distinct()
    assert a.exceptAll(b).count() == 0
    # different salt produces a different (but valid) assignment
    c = hash_split(df, "user_id", salt="other").select("user_id", "split").distinct()
    assert a.exceptAll(c).count() > 0
    # proportions are in the right ballpark for 200 entities at 30%
    n_test = a.where("split = 'test'").count()
    assert 30 <= n_test <= 90


def test_ohlc_open_close_follow_time_order(spark):
    rows = [
        (1, _ts("2024-01-01T00:05:00"), 1, "a", 10.0, None),
        (2, _ts("2024-01-01T10:00:00"), 1, "a", 99.0, None),
        (3, _ts("2024-01-01T23:00:00"), 1, "a", 7.0, None),
        (4, _ts("2024-01-02T01:00:00"), 1, "a", 5.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    out = {r["day"].day: r for r in ohlc_bars(df).collect()}
    d1 = out[1]
    assert (d1["open"], d1["high"], d1["low"], d1["close"], d1["volume"]) == (
        10.0, 99.0, 7.0, 7.0, 3,
    )
    assert out[2]["open"] == out[2]["close"] == 5.0


def test_interpolation_fills_gap_linearly(spark):
    # hours 0 and 3 observed (values 10 and 40) -> hours 1, 2 are 20, 30
    rows = [
        (1, _ts("2024-01-01T00:10:00"), 1, "a", 10.0, None),
        (2, _ts("2024-01-01T03:20:00"), 1, "a", 40.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    out = {r["hour"].hour: (r["value"], r["observed"])
           for r in interpolated_hourly_series(df).collect()}
    assert out[0] == (10.0, True)
    assert out[1] == (20.0, False)
    assert out[2] == (30.0, False)
    assert out[3] == (40.0, True)


def test_order_count_distribution_includes_zero_customers(spark):
    cust = spark.createDataFrame([(1,), (2,), (3,)], "c_custkey long")
    orders = spark.createDataFrame(
        [(10, 1, "5-LOW"), (11, 1, "5-LOW"), (12, 2, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    out = {r["c_count"]: r["custdist"]
           for r in order_count_distribution(cust, orders).collect()}
    # customer 1 has 2 counted orders; 2's only order is excluded; 3 has none
    assert out == {2: 1, 0: 2}


def test_top_supplier_keeps_ties(spark):
    li = spark.createDataFrame(
        [(1, 100.0, 0.0, _ts("1996-02-01")), (2, 100.0, 0.0, _ts("1996-02-01")),
         (3, 50.0, 0.0, _ts("1996-02-01"))],
        "l_suppkey long, l_extendedprice double, l_discount double,"
        " l_shipdate timestamp",
    )
    supp = spark.createDataFrame(
        [(1, "s1"), (2, "s2"), (3, "s3")], "s_suppkey long, s_name string"
    )
    out = top_supplier(li, supp).collect()
    assert sorted(r["s_suppkey"] for r in out) == [1, 2]
    assert all(r["total_revenue"] == 100.0 for r in out)


def test_tfidf_prefers_rare_terms(spark):
    docs = spark.createDataFrame(
        [(1, "common rare rare"), (2, "common common stuff"),
         (3, "common other")],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # 'common' appears in every doc (df=3); the doc-specific terms win
    assert top == {1: "rare", 2: "stuff", 3: "other"}
    assert all(r["rank"] == 1 for r in out)


def test_vocabulary_ids_are_dense_frequency_ranked(spark):
    docs = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a b x")], "doc_id long, text string"
    )
    out = build_vocabulary(docs, vocab_size=10, min_count=2).collect()
    by_id = sorted((r["term_id"], r["term"], r["n_occurrences"]) for r in out)
    # b:4, a:3 survive min_count=2; c and x (1 occurrence) are dropped
    assert by_id == [(1, "b", 4), (2, "a", 3)]


def test_funnel_requires_strict_order(spark):
    rows = [
        # u1 completes the whole funnel in order
        (1, _ts("2024-01-01T00:00:00"), 1, "view", 1.0, None),
        (2, _ts("2024-01-01T00:01:00"), 1, "click", 1.0, None),
        (3, _ts("2024-01-01T00:02:00"), 1, "purchase", 1.0, None),
        # u2 clicked BEFORE viewing -> stops at step 1
        (4, _ts("2024-01-01T00:00:30"), 2, "click", 1.0, None),
        (5, _ts("2024-01-01T00:01:30"), 2, "view", 1.0, None),
        # u3 never viewed -> no step at all
        (6, _ts("2024-01-01T00:03:00"), 3, "purchase", 1.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import funnel_conversion

    out = {r["step"]: r["n_users"] for r in funnel_conversion(df).collect()}
    assert out == {"view": 2, "click": 1, "purchase": 1}


def test_cohort_retention_offsets(spark):
    rows = [
        (1, _ts("2024-01-01T10:00:00"), 1, "view", 1.0, None),
        (2, _ts("2024-01-03T10:00:00"), 1, "view", 1.0, None),
        (3, _ts("2024-01-02T09:00:00"), 2, "view", 1.0, None),
        (4, _ts("2024-01-02T23:00:00"), 2, "view", 1.0, None),  # same day
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import cohort_retention

    out = {(r["cohort_day"].day, r["day_offset"]): r["n_users"]
           for r in cohort_retention(df).collect()}
    assert out == {(1, 0): 1, (1, 2): 1, (2, 0): 1}


def test_scd2_intervals_chain(spark):
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 1, "a", 10.0, None),
        (2, _ts("2024-01-01T01:00:00"), 1, "a", 20.0, None),
        (3, _ts("2024-01-01T00:30:00"), 2, "a", 5.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import scd2_intervals

    out = sorted(
        ((r["user_id"], r["attr_value"], r["valid_to"] is None, r["is_current"])
         for r in scd2_intervals(df).collect())
    )
    assert out == [
        (1, 10.0, False, False),
        (1, 20.0, True, True),
        (2, 5.0, True, True),
    ]


def test_rolling_correlation_perfect_and_inverse(spark):
    # a = [1,2,3,4], b = 2a  -> corr 1; c = -a trend (5,4,3,2) -> corr -1
    rows = []
    eid = 0
    for i, (a, b) in enumerate([(1, 2), (2, 4), (3, 6), (4, 8)]):
        day = _ts("2024-01-01T00:00:00") + dt.timedelta(days=i)
        eid += 1
        rows.append((eid, day, 1, "purchase", float(a), None))
        eid += 1
        rows.append((eid, day, 1, "view", float(b), None))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import rolling_correlation

    out = {r["day"].day: r["corr"] for r in rolling_correlation(df).collect()}
    # day 1: single point -> zero variance -> null
    assert out[1] is None
    assert abs(out[4] - 1.0) < 1e-12


def test_quantile_bins_split_evenly(spark):
    rows = [
        (i, _ts("2024-01-01T00:00:00"), 1, "a", float(i), None)
        for i in range(1, 11)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import quantile_bins

    out = {r["bin"]: r for r in quantile_bins(df, n_bins=2).collect()}
    assert (out[1]["lo"], out[1]["hi"], out[1]["n_events"]) == (1.0, 5.0, 5)
    assert (out[2]["lo"], out[2]["hi"], out[2]["n_events"]) == (6.0, 10.0, 5)


def test_audio_spectral_features_recover_tone():
    """A pure 440 Hz tone's dominant frequency (argmax of the rfft
    magnitude, DC excluded) must come back as the nearest rfft bin,
    and the spectral centroid must sit close to the tone."""
    import numpy as np

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.multimodal import (
        _audio_features,
    )

    rate = 8000
    t = np.arange(rate) / rate  # 1 second
    x = np.sin(2 * np.pi * 440.0 * t)
    v = _audio_features(x, rate, dim=16)
    dom, centroid = v[8], v[9]
    assert abs(dom - 440.0) <= rate / len(x)  # within one bin
    assert abs(centroid - 440.0) < 30.0  # leakage spreads it slightly
    # silence stays all-zero in the spectral slots
    z = _audio_features(np.zeros(rate), rate, dim=16)
    assert z[8] == 0.0 and z[9] == 0.0


def test_edit_distance_blocks_and_caps(spark):
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.dedup import (
        dedup_edit_distance,
    )

    prefix = "the quick brown fox jumps over the lazy dog "
    docs = [
        (1, prefix + "tail one"),
        (2, prefix + "tail two"),       # near-dup of 1 (same block)
        (3, "completely different text that shares no prefix at all"),
    ]
    # a hot block: 5 copies of identical boilerplate -> dropped by block_max
    docs += [(10 + i, "BOILERPLATE " * 10) for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = dedup_edit_distance(df, block_max=4).collect()
    pairs = sorted((r["id_a"], r["id_b"]) for r in out)
    assert pairs == [(1, 2)]
    r = out[0]
    assert r["edit_distance"] == 3  # one->two
    assert 0.9 < r["similarity"] < 1.0
