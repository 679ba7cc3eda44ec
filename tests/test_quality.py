"""In-flight quality observation (plans/quality.py): counters ride the
materializing job (no second scan) and gate publication."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import (
    check_quality,
    ingest_quality_gate,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import (
    load_transactions,
)
from .conftest import SF0001


def test_clean_batch_passes_and_counts(spark, tmp_path):
    tx = load_transactions(spark, SF0001)
    observed, obs = ingest_quality_gate(tx)
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    m = check_quality(obs)
    assert m["rows"] == tx.count()
    assert m["null_keys"] == 0
    assert m["null_ts"] == 0


def test_dirty_batch_fails_gate(spark):
    tx = load_transactions(spark, SF0001).limit(50)
    dirty = tx.unionByName(
        tx.limit(3).withColumn("cc_num", F.lit(None).cast("long"))
    )
    observed, obs = ingest_quality_gate(dirty)
    observed.count()  # any single action materializes the counters
    with pytest.raises(ValueError, match="null_keys=3"):
        check_quality(obs)


def test_validate_table_counts_every_rule_family(spark):
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.quality import validate_table

    rows = [
        (1, "A", 10.0, 100),
        (2, "A", -5.0, 100),   # range violation
        (2, "B", 20.0, 100),   # duplicate key
        (None, "Z", 30.0, 999),  # null key + bad status + orphan ref
    ]
    df = spark.createDataFrame(rows, ["k", "status", "amt", "ref"])
    ref = spark.createDataFrame([(100,)], ["id"])
    out = {
        r.rule: r.n_violations
        for r in validate_table(
            df,
            not_null=["k"],
            ranges={"amt": (0.0, 100.0)},
            accepted={"status": ["A", "B"]},
            unique=[["k"]],
            foreign_keys=[("ref", ref, "id")],
        ).collect()
    }
    assert out == {
        "not_null:k": 1,
        "range:amt": 1,
        "accepted:status": 1,
        # SQL-unique semantics: the NULL-k row is its own key (never a
        # violation); among the 3 non-null rows, 2 distinct k values ->
        # exactly 1 genuine duplicate
        "unique:k": 1,
        "foreign_key:ref": 1,
    }


def test_validate_table_single_scan_for_row_local_rules(spark):
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.quality import validate_table
    from .conftest import plan_str

    df = spark.createDataFrame([(1, "A", 1.0)], ["k", "status", "amt"])
    out = validate_table(
        df,
        not_null=["k"],
        ranges={"amt": (0.0, 100.0)},
        accepted={"status": ["A"]},
    )
    # all three row-local rules in ONE aggregate over one scan
    assert plan_str(out).count("HashAggregate") <= 2  # partial+final


def test_validate_table_rejects_duplicate_rules(spark):
    import pytest as _pytest

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.quality import validate_table

    df = spark.createDataFrame([(1,)], ["k"])
    with _pytest.raises(ValueError, match="duplicate rules"):
        validate_table(df, not_null=["k", "k"])


def test_profile_table_approx_within_hll_tolerance(spark):
    """approx=True must (a) agree with the exact profile on every
    counter except n_distinct, (b) keep n_distinct within the HLL++
    default-rsd envelope (5 % rsd -> assert a generous 15 % relative
    error bound), and (c) remove the distinct-aggregate Expand from
    the plan (the whole point at 100 TB / per-micro-batch use)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.quality import profile_table
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table
    from .conftest import SF0001, plan_str

    ev = load_table(spark, SF0001, "events")
    exact = {r["column"]: r.asDict() for r in profile_table(ev).collect()}
    approx = {
        r["column"]: r.asDict()
        for r in profile_table(ev, approx=True).collect()
    }
    assert exact.keys() == approx.keys()
    for col, e in exact.items():
        a = approx[col]
        for field in ("n_rows", "n_nulls", "min_value", "max_value"):
            assert a[field] == e[field], (col, field)
        if e["n_distinct"]:
            rel = abs(a["n_distinct"] - e["n_distinct"]) / e["n_distinct"]
            assert rel <= 0.15, (col, a["n_distinct"], e["n_distinct"])

    # plan shape: exact multiplies the scan through an Expand per
    # distinct aggregate; approx must have NO Expand from distincts
    # (the only Expand left is the 1-row stack unpivot, which never
    # touches scan rows -> assert the aggregate side is Expand-free
    # by counting: approx plan has strictly fewer Expands)
    p_exact = plan_str(profile_table(ev))
    p_approx = plan_str(profile_table(ev, approx=True))
    assert p_approx.count("Expand") < p_exact.count("Expand"), (
        p_approx.count("Expand"),
        p_exact.count("Expand"),
    )


def test_lm_quality_buckets_terciles(spark):
    """Distinct scores in one source split 4/3/2 (PERCENTILE_DISC
    cut VALUES are inclusive on the upper side: tail = ranks below
    ceil(n/3), middle = up to but excluding the rank-ceil(2n/3)
    value, head = at/above it) and the bucket ordering follows the
    score ordering."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.lm import (
        lm_quality_buckets,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the dog",
        "the quick brown fox sleeps",
        "colorless green ideas sleep furiously tonight",
        "green ideas the quick dog",
        "fox dog the over jumps",
        "entirely novel wording here absolutely",
        "lazy dog lazy dog lazy dog",
        "quick quick quick brown brown",
    ]
    docs = spark.createDataFrame(
        [(i, t, "web") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    rows = lm_quality_buckets(docs).collect()
    assert len(rows) == 9
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r["lm_score"])
    assert {k: len(v) for k, v in by_bucket.items()} == {
        "head": 4, "middle": 3, "tail": 2,
    }
    assert min(by_bucket["head"]) >= max(by_bucket["middle"])
    assert min(by_bucket["middle"]) >= max(by_bucket["tail"])


def test_lm_quality_buckets_fixed_cutoffs(spark):
    """cutoffs= (the CCNet deployment shape) skips ranking and labels
    by the given per-source thresholds; NULL source/id excluded."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.lm import (
        lm_quality_buckets,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b", "web"),
            (2, "c d e f g h", "web"),
            (None, "a b a b", "web"),
            (3, "a b a b", None),
        ],
        "doc_id long, text string, source string",
    )
    cuts = spark.createDataFrame(
        [("web", 0.0, 1.1)], "source string, cut1 double, cut2 double"
    )
    got = {
        r["doc_id"]: r["bucket"]
        for r in lm_quality_buckets(docs, cutoffs=cuts).collect()
    }
    # cut2 > 1 is unreachable (scores are mean probabilities <= 1), so
    # everything scorable with source lands in 'middle'
    assert got == {1: "middle", 2: "middle"}
