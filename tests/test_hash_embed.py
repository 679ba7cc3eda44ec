"""embed_text_hashed (operators/embedding.py) unit + recall tests.

Covers the feature-hashing contract (Weinberger et al. 2009): L2
normalization, degenerate-input handling, the identical-text =>
identical-vector property the semantic dedup path relies on, and the
end-to-end recall of documents -> derived embeddings -> SemDeDup pairs
against an exact all-pairs cosine baseline over the SAME derived
vectors (so the test isolates the CELL-PARTITION loss, not hashing
noise).
"""

from __future__ import annotations

import itertools
import math

import pytest

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
    embed_text_hashed,
    semantic_dedup_pairs,
)

from .conftest import plan_str


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_embedding_is_unit_norm_and_quantized(spark):
    out = embed_text_hashed(
        _docs(spark, [(0, "alpha beta gamma alpha"), (1, "delta")])
    ).collect()
    by_id = {r.doc_id: r for r in out}
    for r in out:
        norm = math.sqrt(sum(x * x for x in r.embedding))
        assert norm == pytest.approx(1.0, abs=1e-6)
        # q_micro is the micro-unit form of the same normalized vector
        for f, q in zip(r.embedding, r.q_micro):
            assert q == pytest.approx(f * 1e6, abs=1.0)
    # signed tf: 'alpha' occurs twice -> norm2 counts it quadratically
    assert by_id[0].norm2 > by_id[1].norm2
    assert by_id[1].norm2 == 1  # single token -> one +/-1 coordinate


def test_degenerate_inputs(spark):
    out = {
        r.doc_id: r
        for r in embed_text_hashed(
            _docs(spark, [(0, None), (1, ""), (2, "   "), (3, "x")])
        ).collect()
    }
    assert out[0].hvec is None and out[0].embedding is None
    for i in (1, 2):  # tokenless -> zero raw vector, undefined cosine
        assert out[i].norm2 == 0
        assert out[i].embedding is None and out[i].q_micro is None
    assert out[3].norm2 == 1


def test_identical_text_identical_vector(spark):
    t = "the quick brown fox jumps over the lazy dog"
    out = embed_text_hashed(_docs(spark, [(0, t), (1, t), (2, "other words entirely")]))
    rows = {r.doc_id: list(r.q_micro) for r in out.collect()}
    assert rows[0] == rows[1]
    assert rows[0] != rows[2]


def test_case_folding(spark):
    out = embed_text_hashed(_docs(spark, [(0, "Hello World"), (1, "hello world")]))
    rows = {r.doc_id: list(r.q_micro) for r in out.collect()}
    assert rows[0] == rows[1]


def test_scan_side_plan_no_shuffle(spark):
    plan = plan_str(embed_text_hashed(_docs(spark, [(0, "a b c")])))
    assert "Exchange" not in plan  # pure scan-side projection


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def test_semantic_text_recall_vs_exact(spark):
    """documents -> embed_text_hashed -> semantic_dedup_pairs recovers
    near-duplicate texts: precision 1.0 by construction (every emitted
    pair is exactly scored), recall vs the exact all-pairs baseline
    over the same derived vectors bounded below. The fixture plants 10
    paraphrase pairs (one token substituted) among 60 distinct-topic
    docs; cell partitioning is the only recall loss."""
    words = [f"w{i}" for i in range(40)]
    rows = []
    did = 0
    planted = []
    for p in range(10):
        base = " ".join(words[(p * 3 + j) % 40] for j in range(12))
        near = base.rsplit(" ", 1)[0] + " zz" + str(p)
        rows.append((did, base))
        rows.append((did + 1, near))
        planted.append((did, did + 1))
        did += 2
    for f in range(40):  # filler docs, distinct token mixes
        rows.append((did, " ".join(words[(f * 7 + j * 5) % 40] for j in range(8))))
        did += 1
    docs = _docs(spark, rows)
    emb = embed_text_hashed(docs).select("doc_id", "q_micro").collect()
    vecs = {r.doc_id: list(r.q_micro) for r in emb}
    th = 0.85
    exact = {
        (a, b)
        for a, b in itertools.combinations(sorted(vecs), 2)
        if _cos(vecs[a], vecs[b]) >= th
    }
    assert set(planted) <= exact  # the plant is actually near-dup
    got = {
        (r.id_a, r.id_b)
        for r in semantic_dedup_pairs(
            embed_text_hashed(docs).select("doc_id", "embedding"),
            threshold=th,
            n_cells=8,
            id_col="doc_id",
            corpus_count=len(rows),
        ).collect()
    }
    assert got <= exact  # precision 1.0: every pair exactly verified
    recall = len(got & exact) / len(exact)
    assert recall >= 0.6, f"recall {recall} over {len(exact)} exact pairs"


def test_srp_text_near_dup_recall_vs_exact(spark):
    """The linear-path twin of test_semantic_text_recall_vs_exact:
    documents -> embed_text_hashed -> SRP-bucketed near-dup pairs.
    Precision 1.0 by construction (exact verify); recall vs the exact
    all-pairs baseline bounded below — SRP at 2 tables trades recall
    for the O(N·planes) plan, so the floor is looser than the cell
    path's."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        embedding_near_dup_pairs,
    )

    words = [f"w{i}" for i in range(40)]
    rows, planted, did = [], [], 0
    for p in range(10):
        base = " ".join(words[(p * 3 + j) % 40] for j in range(12))
        near = base.rsplit(" ", 1)[0] + " zz" + str(p)
        rows += [(did, base), (did + 1, near)]
        planted.append((did, did + 1))
        did += 2
    for f in range(40):
        rows.append((did, " ".join(words[(f * 7 + j * 5) % 40] for j in range(8))))
        did += 1
    docs = _docs(spark, rows)
    emb = (
        embed_text_hashed(docs)
        .selectExpr("doc_id as vec_id", "embedding")
        .localCheckpoint()
    )
    vecs = {r.doc_id: list(r.q_micro)
            for r in embed_text_hashed(docs).select("doc_id", "q_micro").collect()
            if r.q_micro is not None}
    th = 0.85
    exact = {
        (a, b)
        for a, b in itertools.combinations(sorted(vecs), 2)
        if _cos(vecs[a], vecs[b]) >= th
    }
    got = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(
            emb, threshold=th, n_planes=4, n_tables=2,
            corpus_count=len(rows),
        ).collect()
    }
    assert got <= exact  # precision 1.0
    recall = len(got & exact) / len(exact)
    assert recall >= 0.5, f"recall {recall} over {len(exact)} exact pairs"


def test_char_ngram_variant_survives_token_internal_edits(spark):
    """grams=(3,5): the char-n-gram feature stream keeps edited
    near-dups close where word-level hashing goes blind. Word-level is
    a bag of whole tokens — a one-char typo is a full token
    substitution, and token fusion ('new york' -> 'newyork') replaces
    two features with an unseen third — while overlapping char-grams
    share most of their mass across both transformations. Floors from
    measurement at dims=256 (fused: word .748 / char .903; every-token
    typos: word -.10 / char .511)."""
    import math

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        embed_text_hashed,
        embedding_near_dup_pairs,
    )

    words = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu apple banana cherry damson"
    ).split()
    base = " ".join(words)
    fused_toks, i = [], 0
    while i < len(words):
        if i % 6 == 0 and i + 1 < len(words):
            fused_toks.append(words[i] + words[i + 1])
            i += 2
        else:
            fused_toks.append(words[i])
            i += 1
    fused = " ".join(fused_toks)  # whitespace/hyphenation noise
    typod = " ".join(w[0] + w[2:] for w in words)  # OCR-style typos
    docs = spark.createDataFrame(
        [(1, base), (2, fused), (3, typod)], "doc_id long, text string"
    )

    def cosines(grams):
        rows = embed_text_hashed(docs, dims=256, grams=grams).select(
            "doc_id", "q_micro"
        ).collect()
        q = {r.doc_id: r.q_micro for r in rows}

        def cos(a, b):
            d = sum(x * y for x, y in zip(q[a], q[b]))
            na = math.sqrt(sum(x * x for x in q[a]))
            nb = math.sqrt(sum(y * y for y in q[b]))
            return d / na / nb

        return cos(1, 2), cos(1, 3)

    w_fused, w_typod = cosines(None)
    c_fused, c_typod = cosines((3, 5))
    assert c_fused > 0.85 and w_fused < 0.80
    assert c_typod > 0.40 and w_typod < 0.20

    # end-to-end: SRP near-dup over the char-gram vectors recovers
    # both edited pairs at a threshold the word-level vectors miss
    def pairs(grams, threshold):
        emb = (
            embed_text_hashed(docs, dims=256, grams=grams)
            .selectExpr("doc_id AS vec_id", "embedding")
            .localCheckpoint()  # the embed fan-out barrier
        )
        return {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dup_pairs(
                emb, threshold=threshold, n_planes=2, n_tables=8,
                dims=256, corpus_count=3,
            ).collect()
        }

    assert {(1, 2), (1, 3)} <= pairs((3, 5), 0.4)
    assert (1, 3) not in pairs(None, 0.4)


def test_char_ngram_degenerate_inputs(spark):
    """NULL text -> NULL vectors; text shorter than the smallest gram
    -> zero norm -> NULL normalized forms (the word-level rules)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        embed_text_hashed,
    )

    rows = embed_text_hashed(
        spark.createDataFrame(
            [(1, None), (2, ""), (3, "ab"), (4, "abcd")],
            "doc_id long, text string",
        ),
        dims=64,
        grams=(3, 5),
    ).select("doc_id", "norm2", "embedding").collect()
    out = {r.doc_id: (r.norm2, r.embedding is not None) for r in rows}
    assert out[1] == (None, False)
    assert out[2] == (0, False)
    assert out[3] == (0, False)  # 2 chars < smallest gram
    assert out[4][0] > 0 and out[4][1]
