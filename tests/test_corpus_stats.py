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


def _ref_bpe(texts, k):
    """Textbook Sennrich BPE on word counts (pure-Python reference)."""
    from collections import Counter

    words = Counter(w for t in texts for w in t.lower().split())
    vocab = {tuple(w): n for w, n in words.items()}
    merges = []
    for step in range(1, k + 1):
        pc = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += n
        if not pc:
            break
        (lhs, rhs), wgt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, lhs, rhs, wgt))
        nxt = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + n
        vocab = nxt
    return merges


def test_bpe_merges_match_reference(spark):
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.tfidf import learn_bpe_merges

    texts = [
        "low low low lower lowest",
        "new newer newest new",
        "low new",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.step, r.lhs, r.rhs, r.weight)
        for r in learn_bpe_merges(docs, k=6).orderBy("step").collect()
    ]
    assert got == _ref_bpe(texts, 6)


def test_bpe_stops_when_merges_exhausted(spark):
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.tfidf import learn_bpe_merges

    # 'ab' admits exactly one merge; k=5 must return 1 row, not fail
    docs = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    got = [
        (r.step, r.lhs, r.rhs, r.weight)
        for r in learn_bpe_merges(docs, k=5).collect()
    ]
    assert got == [(1, "a", "b", 2)]


def test_bpe_learn_leaves_nothing_cached(spark):
    """The deferred-unpersist drive keeps ≤2 stages cached mid-loop and
    must release BOTH live handles (s and its predecessor) on exit —
    normal completion and the merges-exhausted break path alike."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.tfidf import learn_bpe_merges

    jsc = spark.sparkContext._jsc.sc()
    for text, k in [("low low lower newest new", 4), ("ab ab", 5)]:
        docs = spark.createDataFrame(
            [(1, text)], "doc_id long, text string"
        )
        # other tests may share this session's cache: assert no NEW
        # RDDs survive the call, not that the cache is globally empty
        before = jsc.getPersistentRDDs().size()
        learn_bpe_merges(docs, k=k).collect()
        assert jsc.getPersistentRDDs().size() == before


def test_bpe_token_counts_apply_merges_in_order(spark):
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.tfidf import (
        bpe_token_counts,
        learn_bpe_merges,
    )

    texts = ["low low lower", "newest new"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = [
        (r.lhs, r.rhs)
        for r in learn_bpe_merges(docs, k=4).orderBy("step").collect()
    ]

    def tok_len(w):
        syms = list(w)
        for lhs, rhs in merges:
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    got = {r.doc_id: r.n_bpe_tokens for r in bpe_token_counts(docs, merges).collect()}
    exp = {i: sum(tok_len(w) for w in t.split()) for i, t in enumerate(texts)}
    assert got == exp
    # NULL text counts 0, not a dropped row
    null_docs = spark.createDataFrame([(9, None)], "doc_id long, text string")
    out = bpe_token_counts(null_docs, merges).collect()
    assert [(r.doc_id, r.n_bpe_tokens) for r in out] == [(9, 0)]
