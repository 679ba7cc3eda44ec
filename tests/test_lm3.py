"""Interpolated trigram LM (operators/lm.py::lm3_transition_scores).

Pins the properties the bigram scorer cannot express — word-ORDER
sensitivity through the trigram leg — plus the engine contracts shared
with lm_transition_scores (evidence rules, model= persistence, the
quality_filter lm_order=3 plug-in and its measured divergence from the
bigram cut on the fixture corpus).
"""

from __future__ import annotations

import pytest

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
    lm3_fit,
    lm3_transition_scores,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.pipeline import quality_filter

from .conftest import SF0001


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


REF_ROWS = [
    (i, "the cat sat on the mat and the dog sat on the rug")
    for i in range(8)
]


def test_word_order_separates_scores(spark):
    """A doc reusing the reference's trigrams outscores the same BAG of
    words in scrambled order — the signal bigrams alone blur (both
    docs share most bigrams' vocabulary; only trigram context sees the
    phrase structure)."""
    ref = _docs(spark, REF_ROWS)
    probe = _docs(
        spark,
        [
            (100, "the cat sat on the mat"),
            (101, "mat the on cat the sat"),  # same bag, broken order
        ],
    )
    out = {
        r.doc_id: r.lm3_score
        for r in lm3_transition_scores(probe, reference=ref).collect()
    }
    assert out[100] > out[101]


def test_evidence_rules(spark):
    out = {
        r.doc_id: r
        for r in lm3_transition_scores(
            _docs(spark, [(0, None), (1, "just two"), (2, "one two three")])
        ).collect()
    }
    for i in (0, 1):  # < 3 tokens: no evidence, not bad evidence
        assert out[i].n_trigrams == 0 and out[i].lm3_score is None
    assert out[2].n_trigrams == 1 and out[2].lm3_score is not None


def test_model_persistence_path(spark, tmp_path):
    """lm3_fit tables round-trip through parquet and score a foreign
    corpus without refitting (the standing-deployment shape)."""
    ref = _docs(spark, REF_ROWS)
    names = ("tri", "ctx", "big", "prev", "uni", "tot")
    for name, df in zip(names, lm3_fit(ref)):
        df.write.parquet(str(tmp_path / name))
    model = tuple(spark.read.parquet(str(tmp_path / n)) for n in names)
    probe = _docs(spark, [(0, "the cat sat on the mat")])
    direct = lm3_transition_scores(probe, reference=ref).collect()[0]
    via_model = lm3_transition_scores(probe, model=model).collect()[0]
    assert direct.lm3_prob_sum == via_model.lm3_prob_sum


def test_quality_filter_lm_order3_diverges_from_bigram(spark):
    """The VERDICT r10 ask, measured: on the fixture corpus the
    trigram cut keeps the SAME number of docs (same bottom_frac) but a
    materially different set — 134/401 flips at sf0.001 when built;
    pinned here as a nonzero floor so a regression to
    order-insensitive scoring fails loudly."""
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    k2 = {r.doc_id for r in quality_filter(docs, bottom_frac=0.2).collect()}
    k3 = {
        r.doc_id
        for r in quality_filter(docs, bottom_frac=0.2, lm_order=3).collect()
    }
    assert len(k2) == len(k3)
    assert len(k2 ^ k3) > 50  # measured 134 at build time


def test_quality_filter_rejects_bad_order(spark):
    with pytest.raises(ValueError, match="lm_order"):
        quality_filter(_docs(spark, [(0, "a b c")]), lm_order=4)
