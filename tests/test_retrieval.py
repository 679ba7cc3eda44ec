"""BM25 retrieval + RRF hybrid fusion (operators/retrieval.py).

Contracts pinned: the quantized-BM25 contribution formula against a
hand-computed tiny corpus (micro-unit exact); deterministic tie order
(score desc, doc_id asc); NULL/empty-text routing (dropped from
scoring, still counted in N); self-exclusion; RRF's missing-leg-is-0
semantics and the both-legs sum; the broadcast inverted-index prune
(only docs sharing a query term are scored).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
    bm25_topk,
    rrf_fuse,
)

DOCS = "doc_id long, text string"


def _score(tf, df, dl, n_docs, t_tokens):
    """The operator's per-(term,doc) contribution, re-spelled in
    plain Python (same IEEE ops, same order)."""
    idf = float(2 * n_docs - 2 * df + 1) / float(2 * df + 1)
    tfp = (44.0 * t_tokens * tf) / (
        20.0 * t_tokens * tf + 6.0 * t_tokens + 18.0 * dl * n_docs
    )
    import decimal

    return int(
        decimal.Decimal((1000000.0 * idf) * tfp).quantize(
            0, rounding=decimal.ROUND_HALF_UP
        )
    )


def test_bm25_hand_computed(spark):
    # corpus: d0 = "apple banana apple", d1 = "banana cherry",
    # d2 = "cherry cherry cherry cherry"; query "apple cherry"
    docs = spark.createDataFrame(
        [
            (0, "apple banana apple"),
            (1, "banana cherry"),
            (2, "cherry cherry cherry cherry"),
        ],
        DOCS,
    )
    q = spark.createDataFrame([(100, "apple cherry")],
                              "query_id long, text string")
    out = {
        (r.query_id, r.doc_id): (r.bm25_q, r.rank)
        for r in bm25_topk(docs, q, k=3).collect()
    }
    n, t = 3, 9  # 3 docs, 9 tokens
    want = {
        (100, 0): _score(tf=2, df=1, dl=3, n_docs=n, t_tokens=t),  # apple
        (100, 1): _score(tf=1, df=2, dl=2, n_docs=n, t_tokens=t),  # cherry
        (100, 2): _score(tf=4, df=2, dl=4, n_docs=n, t_tokens=t),  # cherry
    }
    assert {k: v[0] for k, v in out.items()} == want
    # rarest term (apple, df=1) dominates -> d0 first; then the two
    # cherry docs by score
    ranked = sorted(out.items(), key=lambda kv: kv[1][1])
    assert [k[1] for k, _ in ranked][0] == 0


def test_bm25_tie_and_null_routing(spark):
    # d1/d2 are identical -> identical scores -> doc_id asc breaks the
    # tie; the NULL-text and empty-text docs never match but DO count
    # in n_docs (idf denominator), same as the DuckDB twin
    docs = spark.createDataFrame(
        [(1, "zig zag"), (2, "zig zag"), (3, None), (4, "   ")], DOCS
    )
    q = spark.createDataFrame([(9, "zig")], "query_id long, text string")
    rows = bm25_topk(docs, q, k=5).collect()
    assert [(r.doc_id, r.rank) for r in rows] == [(1, 1), (2, 2)]
    assert rows[0].bm25_q == rows[1].bm25_q
    # a query with no tokens emits nothing
    qn = spark.createDataFrame([(8, None)], "query_id long, text string")
    assert bm25_topk(docs, qn, k=5).count() == 0


def test_bm25_exclude_self_and_prune(spark):
    docs = spark.createDataFrame(
        [(0, "solo common"), (1, "common pair"), (2, "unrelated words")],
        DOCS,
    )
    q = docs.where("doc_id = 0").select(
        F.col("doc_id").alias("query_id"), "text"
    )
    with_self = {r.doc_id for r in bm25_topk(docs, q, k=5).collect()}
    no_self = {
        r.doc_id
        for r in bm25_topk(docs, q, k=5, exclude_self=True).collect()
    }
    assert 0 in with_self and 0 not in no_self
    # inverted-index prune: doc 2 shares no query term -> never scored
    assert 2 not in with_self


def test_bm25_predicate_candidacy_not_stats(spark):
    """predicate= restricts CANDIDACY (any-row-allowed) while the
    corpus statistics stay GLOBAL: allowed docs keep exactly the
    scores they had in the unfiltered run (same N/T/df/dl), and
    non-qualifying docs disappear — never rank-then-discard into
    different scores, and never the filtered-corpus restatement."""
    docs = spark.createDataFrame(
        [
            (0, "apple banana", "en"),
            (1, "apple cherry", "fr"),
            (2, "apple apple", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    q = spark.createDataFrame([(9, "apple")], "query_id long, text string")
    full = {r.doc_id: r.bm25_q for r in bm25_topk(docs, q, k=3).collect()}
    filt = {
        r.doc_id: r.bm25_q
        for r in bm25_topk(docs, q, k=3, predicate="lang = 'en'").collect()
    }
    assert set(filt) == {0, 2}
    assert all(filt[d] == full[d] for d in filt)  # global stats kept


def test_rrf_fuse_semantics(spark):
    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, doc_id long, rank int"
    )
    dense = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2)], "query_id long, vec_id long, rank int"
    )
    out = {r.doc_id: (r.rrf, r.rank) for r in rrf_fuse(lex, dense, k=3).collect()}
    # both legs: doc 11 (lex rank 2 + dense rank 1); single legs 10/12
    assert out[11][0] == pytest.approx(1.0 / 62 + 1.0 / 61, abs=0)
    assert out[10][0] == 1.0 / 61
    assert out[12][0] == 1.0 / 62
    assert [d for d, (_, rk) in sorted(out.items(), key=lambda kv: kv[1][1])] \
        == [11, 10, 12]
