"""Product quantization (operators/similarity.py::pq_*)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
    pq_codebooks,
    pq_encode,
    pq_topk,
)


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) if v is not None else (i, None)
         for i, v in vecs],
        "vec_id long, embedding array<float>",
    )


def test_pq_shapes_and_determinism(spark):
    rng = np.random.default_rng(3)
    vecs = [(i, rng.normal(0, 0.1, 64)) for i in range(64)]
    vecs.append((200, None))  # NULL embedding: excluded everywhere
    df = _emb_df(spark, vecs)
    cbs = pq_codebooks(df, m=4, n_codes=16, corpus_count=65)
    rows = cbs.collect()
    assert len(rows) == 4 * 16  # m * n_codes, all present
    assert all(len(r.cb) == 16 for r in rows)  # dims/m subvector width
    codes = pq_encode(df, cbs, m=4)
    got = codes.collect()
    assert len(got) == 64 * 4  # m rows per non-null vector
    assert all(0 <= r.code < 16 for r in got)
    assert not any(r.vec_id == 200 for r in got)
    # deterministic across runs
    again = {(r.vec_id, r.subspace): r.code for r in pq_encode(df, cbs, m=4).collect()}
    assert {(r.vec_id, r.subspace): r.code for r in got} == again


def test_pq_topk_ranks_seed_twin_first(spark):
    """A query vector byte-identical to a codebook seed has ADC
    distance 0 to that seed's codes — the twin must rank first with
    adc_dist exactly 0 (all-integer arithmetic, no float fuzz)."""
    rng = np.random.default_rng(11)
    base = [rng.normal(0, 0.1, 64) for _ in range(16)]
    vecs = [(i, base[i]) for i in range(16)]  # seeds: step=1 -> ids 0..15
    vecs.append((50, base[3].copy()))  # exact twin of seed 3
    df = _emb_df(spark, vecs)
    out = pq_topk(df, df.filter(F.col("vec_id") == 50), k=3,
                  m=4, n_codes=16, corpus_count=17)
    top = sorted(out.collect(), key=lambda r: r.rank)
    assert top[0].vec_id == 3 and top[0].adc_dist == 0
    assert [r.rank for r in top] == [1, 2, 3]


def test_pq_dims_must_divide(spark):
    df = _emb_df(spark, [(0, np.zeros(64))])
    with pytest.raises(ValueError, match="divide"):
        pq_codebooks(df, m=5, n_codes=4, corpus_count=1)


def test_ann_family_recall_on_clustered_data(spark):
    """Recall@5 vs exact cosine on a corpus with REAL neighbor
    structure (20 tight clusters x 25 members). Pins the quality
    contract of every approximate ranker: SRP and IVF recover most
    true neighbors; pure-ADC PQ is tie-limited by construction (whole
    clusters share codes, ties break by id — the documented reason
    production PQ re-ranks), and the exact re-rank restores recall."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        ann_srp_topk,
        cosine_topk,
        ivf_pq_topk_batched,
        ivf_topk,
    )

    rng = np.random.default_rng(9)
    rows, vid = [], 0
    for _ in range(20):
        center = rng.normal(0, 0.12, 64)
        for _ in range(25):
            rows.append(
                (vid, [float(x) for x in center + rng.normal(0, 0.03, 64)])
            )
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") % 50 == 0)  # 10 queries

    def recall(df, truth):
        got = {}
        for r in df.collect():
            got.setdefault(r.query_id, set()).add(r.vec_id)
        hits = sum(len(got.get(k, set()) & v) for k, v in truth.items())
        return hits / sum(len(v) for v in truth.values())

    truth = {}
    for r in cosine_topk(emb, queries, k=5).collect():
        truth.setdefault(r.query_id, set()).add(r.vec_id)

    assert recall(
        ann_srp_topk(emb, queries, k=5, corpus_count=500), truth
    ) >= 0.8  # measured 0.88
    assert recall(
        ivf_topk(emb, queries, k=5, n_cells=32, nprobe=2, corpus_count=500),
        truth,
    ) >= 0.95  # measured 1.0
    adc = recall(
        pq_topk(emb, queries, k=5, m=4, n_codes=16, corpus_count=500), truth
    )
    reranked = recall(
        pq_topk(emb, queries, k=5, m=4, n_codes=16, corpus_count=500,
                rerank=50),
        truth,
    )
    assert reranked >= 0.95  # measured 1.0
    assert reranked > adc  # the re-rank is what buys the recall back
    ivf_adc = recall(
        ivf_pq_topk_batched(emb, queries, k=5, m=4, n_codes=16, n_cells=32,
                            nprobe=2, corpus_count=500),
        truth,
    )
    assert ivf_adc >= 0.1  # coded-tie floor; candidates still cluster-scoped
    ivf_reranked = recall(
        ivf_pq_topk_batched(emb, queries, k=5, m=4, n_codes=16, n_cells=32,
                            nprobe=2, corpus_count=500, rerank=50),
        truth,
    )
    # the production composition: ADC shortlist inside probed cells,
    # exact cosine re-rank — recall comes back to the IVF-flat level
    assert ivf_reranked >= 0.95  # measured 1.0
    assert ivf_reranked > ivf_adc
