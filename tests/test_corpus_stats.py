"""Micro-fixture semantics for the corpus-statistics additions:
PMI collocations and vocabulary OOV coverage
(operators/tfidf.py::pmi_collocations / ::vocab_coverage)."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.tfidf import (
    pmi_collocations,
    vocab_coverage,
)


def test_pmi_ranks_exclusive_pair_above_common_pair(spark):
    # "new york" always co-occur and appear nowhere else; "the cat"
    # co-occurs but both words are frequent elsewhere -> lower PMI.
    rows = (
        [("new york",)] * 5
        + [("the cat",)] * 5
        + [("the dog",)] * 5
        + [("a cat runs",)] * 5
    )
    docs = spark.createDataFrame(rows, ["text"]).withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    out = pmi_collocations(docs, k=10, min_count=5).collect()
    pairs = [(r.w1, r.w2) for r in out]
    assert ("new", "york") in pairs
    ny = next(r for r in out if (r.w1, r.w2) == ("new", "york"))
    the_cat = next(r for r in out if (r.w1, r.w2) == ("the", "cat"))
    assert ny.pmi_ratio > the_cat.pmi_ratio
    # exact counts on the fixture: W=45 tokens, n_ab=5, n_a=n_b=5
    assert (ny.n_ab, ny.n_a, ny.n_b) == (5, 5, 5)
    assert ny.pmi_ratio == 5 * 45 / (5 * 5)


def test_pmi_min_count_drops_hapax_pairs(spark):
    docs = spark.createDataFrame(
        [("rare pair",)] + [("common word",)] * 5, ["text"]
    ).withColumn("doc_id", F.monotonically_increasing_id())
    pairs = {(r.w1, r.w2) for r in pmi_collocations(docs, k=10, min_count=5).collect()}
    assert ("rare", "pair") not in pairs
    assert ("common", "word") in pairs


def test_vocab_coverage_oov_rate(spark):
    # vocab (min_count=2) = {aa, bb}; src1 is fully covered, src2 has
    # 2 OOV tokens out of 4.
    docs = spark.createDataFrame(
        [
            ("aa bb aa", "src1"),
            ("aa bb", "src1"),
            ("aa xx yy bb", "src2"),
        ],
        ["text", "source"],
    ).withColumn("doc_id", F.monotonically_increasing_id())
    out = {r.source: r for r in vocab_coverage(docs, vocab_size=10, min_count=2).collect()}
    assert out["src1"].n_oov == 0 and out["src1"].oov_rate == 0.0
    assert out["src2"].n_tokens == 4 and out["src2"].n_oov == 2
    assert out["src2"].oov_rate == 0.5
