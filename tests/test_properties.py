"""Property-based tests (hypothesis): the core trailing-window operator
against a brute-force pure-Python model on random inputs — catches
boundary/tie/partition bugs the fixed fixtures can't."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
    latest_per_key,
    trailing_window_features_exact,
)

_T0 = dt.datetime(2024, 1, 1)

_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),            # key
        st.integers(min_value=0, max_value=3000),         # offset seconds
        st.integers(min_value=1, max_value=99999),        # amount cents
    ),
    min_size=1,
    max_size=25,
)


def _model(rows, window_s):
    """Brute-force trailing [t - w, t] count/sum-cents per row."""
    out = []
    for k, t, c in rows:
        in_frame = [
            (k2, t2, c2)
            for (k2, t2, c2) in rows
            if k2 == k and t - window_s <= t2 <= t
        ]
        n = len(in_frame)
        s = sum(c2 for (_, _, c2) in in_frame)
        out.append((k, t, c, n, s))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_events)
def test_trailing_window_matches_bruteforce(spark, events):
    rows = [
        (i, k, _T0 + dt.timedelta(seconds=t), c / 100.0)
        for i, (k, t, c) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "rid long, cc_num long, datetime timestamp, amount double"
    )
    got = {
        r["rid"]: (r["num_trans_last_10m"], r["avg_amt_last_10m"])
        for r in trailing_window_features_exact(df).collect()
    }
    for i, (k, t, n, s) in enumerate(
        (k, t, n, s) for (k, t, _, n, s) in _model(events, 600)
    ):
        want_avg = (s / 100.0) / n
        assert got[i][0] == n, (i, events)
        assert got[i][1] == want_avg, (i, events)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_events)
def test_latest_per_key_dense_rank_ties(spark, events):
    rows = [
        (i, k, _T0 + dt.timedelta(seconds=t), c / 100.0)
        for i, (k, t, c) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "rid long, cc_num long, datetime timestamp, amount double"
    )
    got = sorted(
        (r["cc_num"], r["rid"]) for r in latest_per_key(df, keep_ties=True).collect()
    )
    # model: ALL rows tied on each key's max timestamp survive
    want = []
    by_key: dict[int, list] = {}
    for i, (k, t, _) in enumerate(events):
        by_key.setdefault(k, []).append((t, i))
    for k, lst in by_key.items():
        mx = max(t for t, _ in lst)
        want += [(k, i) for (t, i) in lst if t == mx]
    assert got == sorted(want)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_events, _events)
def test_asof_join_matches_bruteforce(spark, probes, builds):
    """Random probe/build streams: asof_join returns, per probe row,
    the unique latest build value at-or-before the probe time (NULL
    when none) — the brute-force definition. Build rows are deduped to
    one per (key, ts) first (the operator's documented contract)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import asof_join

    builds_u = {(k, t): c for (k, t, c) in builds}  # last write wins
    probe_rows = [
        (i, k, _T0 + dt.timedelta(seconds=t))
        for i, (k, t, _) in enumerate(probes)
    ]
    build_rows = [
        (k, _T0 + dt.timedelta(seconds=t), float(c))
        for (k, t), c in builds_u.items()
    ]
    p = spark.createDataFrame(probe_rows, "rid long, k long, ts timestamp")
    b = spark.createDataFrame(build_rows, "k long, ts timestamp, v double")
    got = {
        r["rid"]: r["v"]
        for r in asof_join(p, b, key="k", probe_ts="ts", build_ts="ts").collect()
    }
    for i, (k, t, _) in enumerate(probes):
        eligible = [
            (t2, c) for (k2, t2), c in builds_u.items() if k2 == k and t2 <= t
        ]
        want = float(max(eligible)[1]) if eligible else None
        assert got[i] == want, (i, probes, builds)


def test_sketches_partitioning_stable(spark):
    """KMV estimates and CMS grids are pure functions of the DATA —
    identical under any physical partitioning (the property that makes
    them oracle-checkable and cluster-reproducible)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.sketches import (
        cms_heavy_hitters,
        kmv_distinct,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_type", "user_id"
    )
    a = sorted(
        map(
            tuple,
            kmv_distinct(
                ev.repartition(3), "event_type", "user_id", k=16
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            kmv_distinct(
                ev.repartition(13), "event_type", "user_id", k=16
            ).collect(),
        )
    )
    assert a == b

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    c = sorted(
        map(tuple, cms_heavy_hitters(docs.repartition(3), top_n=8).collect())
    )
    d = sorted(
        map(tuple, cms_heavy_hitters(docs.repartition(11), top_n=8).collect())
    )
    assert c == d


def test_incremental_any_cutoff_matches_full(spark):
    """delta_scoped_features equals the delta-restricted full recompute
    at EVERY cutoff, not just the registered trailing-day split."""
    from pyspark.sql import functions as F

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        trailing_window_features_exact,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.incremental import (
        delta_scoped_features,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "value",
    )
    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).collect()[0]
    ts_us = F.unix_micros("ts")
    for frac in (0.25, 0.5, 0.9):
        cutoff = int(lo + (hi - lo) * frac)
        got = delta_scoped_features(
            ev.where(ts_us < cutoff),
            ev.where(ts_us >= cutoff),
            key="user_id",
            ts="ts",
            amount="value",
        )
        want = trailing_window_features_exact(
            ev, key="user_id", ts="ts", amount="value"
        ).where(ts_us >= cutoff)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), f"cutoff fraction {frac}"


_corpus_texts = st.lists(
    st.text(
        alphabet=st.sampled_from("abcde "), min_size=0, max_size=12
    ),
    min_size=0,
    max_size=20,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_corpus_texts, batch=_corpus_texts, m_exp=st.integers(6, 14))
def test_bloom_dedup_equals_plain_on_random_corpora(
    spark, corpus, batch, m_exp
):
    """dedup_append_bloom must equal dedup_append for ANY corpus/batch
    (duplicate-heavy, empty-string texts, tiny saturated bitmaps) —
    the Bloom stage is a pure prefilter by construction."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.dedup import (
        build_dedup_bloom,
        build_text_hash_index,
        dedup_append,
        dedup_append_bloom,
    )

    corpus_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)] or [(0, "x")],
        "doc_id long, text string",
    )
    batch_df = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(batch)] or [(100, "y")],
        "doc_id long, text string",
    )
    index = build_text_hash_index(corpus_df)
    m = 1 << m_exp
    bloom = build_dedup_bloom(index, num_bits=m)
    want = sorted(map(tuple, dedup_append(index, batch_df).collect()))
    got = sorted(
        map(
            tuple,
            dedup_append_bloom(
                index, batch_df, bloom, num_bits=m
            ).collect(),
        )
    )
    assert got == want


_fps = st.lists(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    min_size=2,
    max_size=14,
    unique=True,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_fps, st.integers(min_value=0, max_value=3))
def test_hamming_pairs_match_bruteforce(spark, fps, radius):
    """Banded hamming near-dup vs the all-pairs popcount model: with
    max_hamming < bands the stage is pigeonhole-complete, so the
    result must EQUAL brute force on any fingerprint set."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.dedup import (
        hamming_near_dup_pairs,
    )

    rows = [(i, v) for i, v in enumerate(fps)]
    df = spark.createDataFrame(rows, "doc_id long, phash long")
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in hamming_near_dup_pairs(
            df, max_hamming=radius, bands=4
        ).collect()
    }
    exp = {}
    for i, a in rows:
        for j, b in rows:
            if i < j:
                d = bin((a ^ b) & ((1 << 64) - 1)).count("1")
                if d <= radius:
                    exp[(i, j)] = d
    assert got == exp


_corpus = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=24),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_corpus, st.integers(min_value=1, max_value=5))
def test_bpe_learning_matches_reference_on_random_corpora(spark, texts, k):
    """learn_bpe_merges against the pure-Python Sennrich reference on
    random tiny corpora — exercises tie-breaks, merge exhaustion and
    single-char words the fixed fixture can't."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.tfidf import (
        learn_bpe_merges,
    )

    from .test_corpus_stats import _ref_bpe

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.step, r.lhs, r.rhs, r.weight)
        for r in learn_bpe_merges(docs, k=k).orderBy("step").collect()
    ]
    assert got == _ref_bpe(texts, k)
