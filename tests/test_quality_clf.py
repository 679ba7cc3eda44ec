"""Supervised quality classifier (operators/quality_clf.py) — the
fastText/CCNet-shaped linear model over the engine's hashed features.

Pinned contracts:

* the fixture is linearly separable and the deterministic numpy
  trainer fully separates it (train accuracy 1.0 on the margin rule);
* the DISTRIBUTED Spark trainer (per-iteration one-job gradient)
  agrees with the numpy trainer on the same data to float tolerance —
  the 100-TB training path computes the same model;
* classify_quality is exact-int64, scan-side, and NULL-safe: NULL
  text / empty text / zero-norm bags get NULL margin + NULL keep;
* the quality_filter(scorer='linear') plug-in keeps the chain's
  output contract, and its kept set DIVERGES from the lm_order=5 cut
  (the supervised scorer adds signal the self-trained LM lacks) —
  the divergence magnitude is pinned below.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.quality_clf import (
    classify_quality,
    quality_training_fixture,
    train_quality_classifier,
    train_quality_classifier_spark,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import (
    load_table,
)

from .conftest import SF0001

SCHEMA = "example_id long, label int, text string"


def test_fixture_fully_separated_by_trained_model(spark):
    model = train_quality_classifier()
    df = spark.createDataFrame(quality_training_fixture(), SCHEMA)
    scored = classify_quality(df, model, id_col="example_id")
    rows = scored.select("example_id", "label", "quality_keep").collect()
    assert rows and all(
        r["quality_keep"] == (r["label"] == 1) for r in rows
    )


def test_spark_trainer_agrees_with_numpy(spark):
    """Same data, same hyperparameters, short run: the distributed
    gradient path lands on the numpy trainer's weights (float
    tolerance — shuffle-order float sums differ in ulps only)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.quality_clf import (
        _fit_logreg,
        _py_embed_unit,
    )

    rows = quality_training_fixture(n_per_class=40)
    df = spark.createDataFrame(rows, SCHEMA).select("label", "text")
    got = train_quality_classifier_spark(df, iters=25)
    X, y = [], []
    for _i, label, text in rows:
        v = _py_embed_unit(text, 64)
        if v is not None:
            X.append(v)
            y.append(label)
    w, b = _fit_logreg(X, y, iters=25, lr=2.0, l2=1e-3)
    # micro-quantized weights may differ by 1 unit at a rounding
    # boundary; anything more means the two trainers diverged.
    want = [int(round(float(x) * 1_000_000)) for x in w]
    assert max(abs(a - e) for a, e in zip(got.w_micro, want)) <= 1
    assert abs(got.bias_micro2 - round(b * 1e12)) <= 1_000_000


def test_classify_null_and_degenerate_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "the query reads the data so the sort can stay fast"),
            (2, "click here to subscribe home about contact"),
            (3, None),
            (4, ""),
            (5, "   "),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["quality_margin"], r["quality_keep"])
        for r in classify_quality(df).collect()
    }
    assert out[1][1] is True
    assert out[2][1] is False
    for i in (3, 4, 5):
        assert out[i] == (None, None)


def test_classifier_is_scan_side(spark):
    """No exchange anywhere in the scoring plan ON A WELL-SPLIT INPUT
    — classifying is as parallel as reading (the 100-TB contract).
    The input is pre-spread so the embed fold's under-split guard
    (operators/embedding.py: a single-file local scan must not
    serialize the fold onto one task) stays a no-op, exactly as it is
    on a real corpus's thousands of splits."""
    docs = load_table(spark, SF0001, "documents").repartition(8)
    plan = (
        classify_quality(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the one exchange is the test's own pre-spread repartition
    assert plan.count("Exchange") == 1 and "roundrobin" in plan.lower(), plan


def test_quality_filter_linear_contract_and_divergence(spark):
    """quality_filter(scorer='linear') keeps the chain contract
    (cleaned text scored, unscorable dropped) in both cut modes, and
    its kept set diverges from the lm_order=5 percentile cut — the
    supervised signal is not a relabeling of the LM score."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.pipeline import (
        quality_filter,
    )

    docs = load_table(spark, SF0001, "documents")
    lin = quality_filter(docs, scorer="linear", cutoff=0.0)
    assert set(lin.columns) == {"doc_id", "lm_score", "n_scorable", "n_removed"}
    kept_lin = {r["doc_id"] for r in lin.select("doc_id").collect()}
    assert kept_lin, "decision boundary kept nothing at sf0.001"
    # percentile mode works over margins too (exact int cast to double)
    lin20 = quality_filter(docs, scorer="linear", bottom_frac=0.2)
    kept20 = {r["doc_id"] for r in lin20.select("doc_id").collect()}
    assert kept20 < kept_lin or kept20 == kept_lin  # a subset by cut
    lm5 = quality_filter(docs, lm_order=5)
    kept_lm5 = {r["doc_id"] for r in lm5.select("doc_id").collect()}
    flips = kept_lin ^ kept_lm5
    # measured at sf0.001: the two scorers disagree on a substantial
    # slice (the corpus is synthetic data-domain prose, the classifier
    # was trained on prose-vs-boilerplate) — pinned as a floor so a
    # regression to "linear == lm5" fails loudly
    assert len(flips) >= 10, (len(flips), len(kept_lin), len(kept_lm5))
