"""Filtered (metadata-constrained) ANN — the r12 verdict's Missing #2.

Every top-k operator takes ``predicate=``, applied to the CORPUS side
at operator entry (operators/similarity.py::_apply_predicate):

* plan pin: on a direct parquet read the predicate lands in the scan's
  ``PushedFilters`` — never rank-then-discard;
* semantics: identical to pre-filtering the corpus frame by hand (the
  exact top-k WITHIN the subset), queries never filtered;
* recall: the ANN variants' recall floor holds ON the filtered subset
  (a predicate must not silently break bucket candidate generation).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
    ann_topk_batched,
    cosine_topk,
    ivf_topk,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import (
    load_table,
)

from .conftest import SF0001

PRED = "label = 1"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF0001, "embeddings")


@pytest.fixture(scope="module")
def queries(spark, emb):
    return emb.filter(F.col("vec_id") < 20).select("vec_id", "embedding")


def _pairs(df):
    return {(r["query_id"], r["vec_id"], r["rank"]) for r in df.collect()}


def test_predicate_lands_in_pushed_filters(spark, emb, queries):
    """The predicate reaches the parquet scan of the corpus side: the
    physical plan's PushedFilters names the metadata column (the
    filtered-ANN contract — the scan skips non-qualifying row groups,
    nothing is scored and then discarded)."""
    plan = (
        cosine_topk(emb, queries, k=5, predicate=PRED)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters" in plan
    pushed = [
        seg.split("]")[0] for seg in plan.split("PushedFilters: [")[1:]
    ]
    assert any("label" in seg for seg in pushed), plan


def test_filtered_equals_prefiltered_corpus(spark, emb, queries):
    """predicate= is exactly 'filter the corpus frame first': same
    rows, same ranks — and every returned neighbor satisfies the
    predicate."""
    got = cosine_topk(emb, queries, k=5, predicate=PRED)
    want = cosine_topk(emb.where(PRED), queries, k=5)
    assert _pairs(got) == _pairs(want)
    ok_ids = {
        r["vec_id"] for r in emb.where(PRED).select("vec_id").collect()
    }
    assert {r["vec_id"] for r in got.collect()} <= ok_ids
    # the unfiltered top-k differs (the subset actually constrains)
    assert _pairs(got) != _pairs(cosine_topk(emb, queries, k=5))


def test_ivf_filtered_equals_prefiltered(spark, emb, queries):
    """IVF twin: cell geometry derives from the UNFILTERED corpus (a
    selective predicate must not move the centroids — ivf_centroids
    seeds from the corpus frame), so predicate= equals hand-filtering
    exactly when the hand-filtered call pins the same centroid
    table."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        ivf_centroids,
    )

    n = emb.count()
    cents = ivf_centroids(emb, 8, corpus_count=n)
    got = ivf_topk(emb, queries, k=5, nprobe=2, centroids=cents,
                   predicate=PRED)
    want = ivf_topk(emb.where(PRED), queries, k=5, nprobe=2,
                    centroids=cents)
    assert _pairs(got) == _pairs(want)


def test_ann_recall_floor_on_filtered_subset(spark, emb, queries):
    """SRP ANN with a predicate recalls against the FILTERED exact
    baseline — candidate generation keeps working on the subset."""
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(emb, queries, k=5, predicate=PRED).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in ann_topk_batched(
            emb, queries, k=5, n_planes=4, predicate=PRED
        ).collect()
    }
    assert {v for _, v in approx} <= {
        r["vec_id"] for r in emb.where(PRED).select("vec_id").collect()
    }
    recall = len(exact & approx) / len(exact)
    # 4 planes over the ~half-sized subset: partial by design, must be
    # far above random (5 / ~250)
    assert recall > 0.2, recall


def test_pq_filtered_membership_and_rerank_recall(spark, emb, queries):
    """PQ twins: codebooks/cells train on the UNFILTERED corpus (so
    unlike the flat operators, hand-filtering the frame would ALSO
    move quantization geometry — predicate= is the semantically
    stable form); every returned candidate satisfies the predicate,
    and the exact re-rank over the ADC shortlist recalls against the
    filtered exact baseline."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        ivf_pq_topk_batched,
        pq_topk,
    )

    ok_ids = {
        r["vec_id"] for r in emb.where(PRED).select("vec_id").collect()
    }
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(emb, queries, k=5, predicate=PRED).collect()
    }

    got = pq_topk(emb, queries, k=5, rerank=50, predicate=PRED)
    rows = {(r["query_id"], r["vec_id"]) for r in got.collect()}
    assert {v for _, v in rows} <= ok_ids
    recall = len(rows & exact) / len(exact)
    assert recall >= 0.6, recall

    n = emb.count()
    got2 = ivf_pq_topk_batched(
        emb, queries, k=5, nprobe=8, corpus_count=n, rerank=50,
        predicate=PRED,
    )
    rows2 = {(r["query_id"], r["vec_id"]) for r in got2.collect()}
    assert {v for _, v in rows2} <= ok_ids
    # recall here is IVF-probe-bounded (nprobe of ~sqrt(N) cells), the
    # usual trade; the floor pins "far above random", not exactness
    assert len(rows2 & exact) / len(exact) >= 0.4
