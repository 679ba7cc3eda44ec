"""KMV and Count-Min sketch invariants (operators/sketches.py).

Cross-engine value parity is covered by test_entry_oracles
(sketch_kmv_distinct / sketch_cms_heavy_hitters); these tests pin the
*estimator* properties: exactness below the sketch size, accuracy
above it, and the CMS one-sided error guarantee.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.sketches import (
    cms_heavy_hitters,
    kmv_distinct,
)
from .conftest import SF001


def test_kmv_exact_below_k(spark):
    # 150 distinct users at sf0.01 << k=256 -> the estimate IS the
    # exact distinct count for every group.
    ev = spark.read.parquet(f"{SF001}/events.parquet").select(
        "event_type", "user_id"
    )
    got = {
        r["event_type"]: (r["n_kept"], r["est_distinct"])
        for r in kmv_distinct(
            ev, group="event_type", value="user_id", k=256
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for et, n in exact.items():
        assert got[et] == (n, float(n))


def test_kmv_estimate_accuracy_above_k(spark):
    # One group, 10k distinct event_ids, k=64: KMV's relative standard
    # error is ~1/sqrt(k-2) ~ 13%; assert a generous 4-sigma band.
    ev = spark.read.parquet(f"{SF001}/events.parquet").select(
        F.lit("all").alias("g"), "event_id"
    )
    row = kmv_distinct(ev, group="g", value="event_id", k=64).collect()[0]
    n_exact = ev.select("event_id").distinct().count()
    assert row["n_kept"] == 64
    assert abs(row["est_distinct"] - n_exact) / n_exact < 0.52


def test_cms_overestimates_never_under(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    rows = cms_heavy_hitters(docs, top_n=10).collect()
    assert len(rows) == 10
    total_tokens = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).collect()[0]["n"]
    for r in rows:
        # one-sided error: estimate >= exact, bounded by the stream size
        assert r["cms_est"] >= r["exact_cnt"], r
        assert r["cms_est"] <= total_tokens, r


def test_cms_estimate_unseen_item_is_zero(spark):
    """A point query for an item the corpus never contained must
    return est=0 (some grid cell is empty -> min over cells is 0),
    not an overestimate from only its colliding cells — and the item
    must not vanish from the output."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
    )

    toks = spark.createDataFrame(
        [("apple",), ("apple",), ("banana",)], ["w"]
    )
    sketch = cms_sketch(toks, item="w", depth=4, width=1024)
    cand = spark.createDataFrame(
        [("apple",), ("never-in-corpus-xyzzy",)], ["w"]
    )
    got = {
        r["w"]: r["cms_est"]
        for r in cms_estimate(cand, sketch, item="w").collect()
    }
    assert got["apple"] >= 2  # CMS is always >= exact
    assert got["never-in-corpus-xyzzy"] == 0


def test_kmv_null_values_do_not_corrupt_ranks(spark):
    """Null values must be ignored (COUNT DISTINCT semantics): a null
    hash would sort first and shift every real hash's KMV rank."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.sketches import kmv_distinct

    base = [("g", f"v{i}") for i in range(10)]
    clean = spark.createDataFrame(base, ["g", "v"])
    dirty = spark.createDataFrame(
        base + [("g", None), ("g", None)], ["g", "v"]
    )
    a = kmv_distinct(clean, "g", "v", k=4).collect()[0]
    b = kmv_distinct(dirty, "g", "v", k=4).collect()[0]
    assert (a["n_kept"], a["est_distinct"]) == (b["n_kept"], b["est_distinct"])
