"""Tests for the training-data pipeline extensions: dedup semantics,
ANN recall, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
    ann_srp_topk,
    cosine_topk,
    dedup_exact,
    embedding_near_dup_pairs,
    extract_features,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    resize_plan,
    sample_frames,
    simhash,
    synth_media,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

from .conftest import SF0001


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF0001, "documents")


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF0001, "embeddings")


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ------------------------------------------------------------------- dedup

def test_dedup_exact_collapses_duplicates(spark):
    df = _docs_df(spark, ["same text here", "same text here", "different"])
    out = {r["doc_id"]: r["dup_count"] for r in dedup_exact(df).collect()}
    assert out == {0: 2, 2: 1}


def test_minhash_identical_docs_same_signature(spark):
    df = _docs_df(spark, ["the quick brown fox jumps", "the quick brown fox jumps"])
    sigs = minhash_signatures(df).collect()
    assert sigs[0]["minhash"] == sigs[1]["minhash"]


def test_lsh_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = _docs_df(spark, [base, base + " x", "completely unrelated words entirely"])
    sigs = minhash_signatures(df)
    pairs = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(sigs).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_jaccard_bounds_and_symmetric_inputs(spark):
    df = _docs_df(spark, ["abcdefghijklm", "abcdefghijklm"])
    rows = ngram_jaccard_pairs(df, threshold=0.0).collect()
    assert len(rows) == 1
    assert rows[0]["jaccard"] == 1.0


def test_simhash_close_for_near_duplicates(spark):
    base = "spark window join filter aggregate shuffle partition broadcast"
    df = _docs_df(spark, [base, base + " extra", "zzz yyy xxx www vvv uuu"])
    hs = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    d01 = bin(hs[0] ^ hs[1]).count("1")
    d02 = bin(hs[0] ^ hs[2]).count("1")
    assert d01 < d02  # near-dup closer in hamming space
    assert all(0 <= h < (1 << 60) for h in hs.values())


def test_lsh_append_equals_full_minus_index_pairs(spark, docs):
    """The incremental identity: index pairs ∪ append-candidates must
    equal a full one-shot LSH run over the whole corpus — i.e. the
    batch run discovers exactly the pairs the full run would add."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        build_lsh_band_index,
        lsh_append_candidates,
        minhash_signatures,
    )

    split = 250
    index_docs = docs.filter(F.col("doc_id") < split)
    batch = docs.filter(F.col("doc_id") >= split)
    full = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(minhash_signatures(docs)).collect()
    }
    old = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(minhash_signatures(index_docs)).collect()
    }
    appended = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_append_candidates(
            build_lsh_band_index(index_docs), batch
        ).collect()
    }
    assert appended == full - old
    assert appended  # fixture actually exercises the cross+within paths


def test_lsh_append_index_never_shuffles(spark, docs):
    """O(batch) plan pin: with the batch side broadcast, the index
    side of the cross join must carry NO Exchange — the multi-TB
    index is probed in place, never re-partitioned."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        build_lsh_band_index,
        lsh_append_candidates,
    )
    from .conftest import plan_str

    index = build_lsh_band_index(docs.filter(F.col("doc_id") < 250))
    batch = docs.filter(F.col("doc_id") >= 250)
    out = lsh_append_candidates(index, batch)
    plan = plan_str(out)
    assert "BroadcastExchange" in plan  # the batch probe ships
    # index side: the cross-join subtree above the index scan has no
    # hash repartition; the ONLY hashpartitioning exchanges belong to
    # the within-batch self-join (merge-hinted, batch-sized) and the
    # final distinct
    idx_joins = plan.count("BroadcastHashJoin")
    assert idx_joins >= 1, plan


# ------------------------------------------------------------- similarity

def test_srp_recall_vs_bruteforce(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in ann_srp_topk(emb, queries, k=5, n_planes=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    # 4 planes -> 16 buckets over 500 vecs: recall is partial by design
    # but must be well above random (5/500 = 1%).
    assert recall > 0.2, recall


def test_multi_probe_improves_recall(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }

    def recall(**kw):
        approx = {
            (r["query_id"], r["vec_id"])
            for r in ann_srp_topk(emb, queries, k=5, n_planes=6, **kw).collect()
        }
        return len(exact & approx) / len(exact)

    r0, r1 = recall(multi_probe=0), recall(multi_probe=1)
    assert r1 >= r0  # probing Hamming-1 buckets can only add candidates
    assert r1 > 0.3, (r0, r1)


def test_ann_batched_equals_broadcast_path(spark, emb):
    """ann_topk_batched is ann_srp_topk with a different PHYSICAL plan
    (no broadcast of either side) — same parameters must produce the
    identical result set, row for row."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        ann_topk_batched,
    )

    queries = emb.filter(F.col("vec_id") % 5 == 0)  # corpus-sized batch
    kw = dict(k=5, n_planes=6, n_tables=2, multi_probe=1, bucket_cap=64)
    a = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in ann_srp_topk(emb, queries, **kw).collect()
    }
    b = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in ann_topk_batched(emb, queries, **kw).collect()
    }
    assert a == b and len(a) > 0


def test_ann_batched_plan_no_broadcast_no_cartesian(spark, emb):
    """The batched contract pinned at the plan level: with auto-
    broadcast disabled (the regime a corpus-sized query batch forces at
    scale), the whole plan runs as shuffle joins — no
    BroadcastExchange, no CartesianProduct, no BroadcastNestedLoop —
    and still executes."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        ann_topk_batched,
    )

    from .conftest import plan_str

    queries = emb.filter(F.col("vec_id") % 5 == 0)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = ann_topk_batched(
            emb, queries, k=5, n_planes=6, n_tables=2, bucket_cap=64
        )
        plan = plan_str(out)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
        assert "BroadcastExchange" not in plan
        assert out.count() > 0
        # the interactive path (ann_srp_topk) keeps its broadcast HINT
        # even in this regime — that asymmetry IS the difference
        hinted = ann_srp_topk(
            emb, queries, k=5, n_planes=6, n_tables=2, bucket_cap=64
        )
        assert "BroadcastExchange" in plan_str(hinted)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_ivf_batched_equals_broadcast_path(spark, emb):
    """ivf_topk_batched is ivf_topk with a different PHYSICAL plan (no
    broadcast of the query-probe side) — same parameters must produce
    the identical result set, row for row."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        ivf_topk,
        ivf_topk_batched,
    )

    queries = emb.filter(F.col("vec_id") % 5 == 0)  # corpus-sized batch
    kw = dict(k=5, n_cells=8, nprobe=2)
    a = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in ivf_topk(emb, queries, **kw).collect()
    }
    b = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in ivf_topk_batched(emb, queries, **kw).collect()
    }
    assert a == b and len(a) > 0


def test_ivf_batched_plan_no_broadcast_of_either_side(spark, emb):
    """The batched IVF contract at the plan level: with auto-broadcast
    disabled, the ONLY BroadcastExchanges in the plan are the two
    explicit O(sqrt N) centroid-table broadcasts inside assignment —
    the cell join and the exact re-rank run as shuffle joins, no
    cartesian/nested-loop anywhere — and the plan still executes. The
    interactive path (ivf_topk) additionally broadcasts the query
    probe assignment; that asymmetry IS the difference."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        ivf_topk,
        ivf_topk_batched,
    )

    from .conftest import plan_str

    queries = emb.filter(F.col("vec_id") % 5 == 0)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = ivf_topk_batched(emb, queries, k=5, n_cells=8, nprobe=2)
        plan = plan_str(out)
        assert "CartesianProduct" not in plan
        # the only broadcasts (and the only nested-loop joins) are the
        # two deliberate centroid cross-joins inside _ivf_assign — the
        # N x cells assignment with the O(sqrt N) side shipped; the
        # cell join and the exact re-rank are shuffle joins
        n_bx = plan.count("BroadcastExchange")
        assert n_bx == plan.count("BroadcastNestedLoop"), plan
        assert out.count() > 0
        hinted = plan_str(ivf_topk(emb, queries, k=5, n_cells=8, nprobe=2))
        assert hinted.count("BroadcastExchange") > n_bx
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_auto_planes_policy_and_linear_candidate_growth(spark):
    """The corpus-scaled plane policy must keep LSH candidate-pair count
    ~linear when the corpus doubles (a fixed plane count grows ~N^2)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.similarity import (
        auto_planes,
        srp_signatures,
    )

    # policy shape: occupancy-targeting, clamped
    assert auto_planes(500) == 4  # min clamp
    assert auto_planes(256 * 2**10) == 10
    assert auto_planes(10**9) == 22
    assert auto_planes(10**12) == 24  # max clamp

    def make(n):
        # deterministic pseudo-random 8-dim vectors, md5-free and cheap
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(0, 7), d -> cast("
                "  pmod(xxhash64(id, d), 2001) - 1000 as float))"
            ).alias("embedding"),
        )

    def n_cand(n, target):
        sigs = srp_signatures(
            make(n), auto_planes(n, target), dims=8, n_tables=1
        ).select("vec_id", "table", "bucket")
        a = sigs.select(F.col("vec_id").alias("id_a"), "table", "bucket")
        b = sigs.select(F.col("vec_id").alias("id_b"), "table", "bucket")
        return (
            a.join(b, on=["table", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .count()
        )

    c1, c2 = n_cand(2000, 16), n_cand(4000, 16)
    # doubling N adds one plane (7 -> 8): candidates stay ~linear.
    # Allow generous slack for uneven occupancy; quadratic would be ~4x.
    assert c2 < 3.0 * c1, (c1, c2)


def test_bucket_cap_bounds_skewed_buckets(spark, emb):
    """An adversarial pile-up (many copies of one vector) lands in one
    bucket; bucket_cap must bound the pair count it can generate."""
    dup = (
        emb.filter(F.col("vec_id") == 0)
        .crossJoin(spark.range(200).select(F.col("id").alias("__i")))
        .withColumn("vec_id", (F.lit(10000) + F.col("__i")).cast("long"))
        .drop("__i")
    )
    piled = emb.unionByName(dup)
    capped = embedding_near_dup_pairs(
        piled, threshold=0.999, n_planes=4, bucket_cap=16
    ).count()
    uncapped = embedding_near_dup_pairs(
        piled, threshold=0.999, n_planes=4
    ).count()
    assert uncapped >= 200 * 201 / 2  # the pile-up alone is ~20k pairs
    assert capped <= 16 * 15 / 2 * 2 + 50  # per-bucket cap bounds the blow-up


def test_cosine_topk_self_excluded_and_ranked(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3)
    rows = cosine_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in rows:
        assert r["vec_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cosine"]))
    for q, rs in by_q.items():
        rs.sort()
        assert [r[0] for r in rs] == [1, 2, 3, 4, 5]
        cosines = [r[1] for r in rs]
        assert cosines == sorted(cosines, reverse=True)


def test_embedding_near_dup_finds_planted_duplicate(spark, emb):
    # plant an exact duplicate of vec 0 with a new id
    dup = emb.filter(F.col("vec_id") == 0).withColumn(
        "vec_id", F.lit(100000).cast("long")
    )
    planted = emb.unionByName(dup)
    pairs = embedding_near_dup_pairs(planted, threshold=0.999).collect()
    assert any(r["id_a"] == 0 and r["id_b"] == 100000 for r in pairs)


# -------------------------------------------------- quality filter chain


def test_quality_filter_drops_bottom_and_respects_cutoff(spark):
    """The composed chain: boilerplate is stripped BEFORE scoring (so
    it can't inflate its own transition counts), the bottom fraction
    of scorable docs drops at the exact PERCENTILE_DISC cut (value
    comparison — ties keep), unscorable docs drop, and an explicit
    cutoff= skips calibration entirely."""
    import pytest as _pytest

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.pipeline import (
        quality_filter,
    )

    nav = "Home | About | Contact"
    good = "the cat sat on the mat and the dog sat on the rug"
    docs = spark.createDataFrame(
        # unique suffix per doc: the GOOD lines must not themselves
        # trip the line-frequency boilerplate bar
        [(i, f"{nav}\n{good} v{i}") for i in range(8)]
        + [(100, f"{nav}\nzq xv qq zz yy ww uu tt")]  # OOV transitions
        + [(200, "one"), (201, None)],  # unscorable after cleaning
        "doc_id long, text string",
    )
    kept = {
        r["doc_id"]: r
        for r in quality_filter(
            docs, bottom_frac=0.2, min_doc_frac=0.5, corpus_count=11
        ).collect()
    }
    # 9 scorable docs; ceil(0.2*9)=2nd-lowest score is the cut: the
    # OOV doc is the unique minimum and drops; the 8 identical good
    # docs tie at/above the cut and all stay
    assert set(kept) == set(range(8))
    assert all(r["n_removed"] == 1 for r in kept.values())  # nav gone
    assert 200 not in kept and 201 not in kept

    # explicit cutoff keeps everything scorable at/above it
    all_kept = quality_filter(
        docs, cutoff=0.0, min_doc_frac=0.5, corpus_count=11
    ).collect()
    assert {r["doc_id"] for r in all_kept} == set(range(8)) | {100}

    with _pytest.raises(ValueError, match="bottom_frac"):
        quality_filter(docs, bottom_frac=1.5)


# ---------------------------------------------------- boilerplate lines


def test_remove_boilerplate_lines_planted(spark):
    """Planted nav-bar line in most docs is stripped; unique lines and
    empty lines survive in original order; an all-boilerplate doc
    cleans to '' (distinguishable from NULL input); per-doc counts are
    exact."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        remove_boilerplate_lines,
    )

    nav = "Home | About | Contact"
    docs = spark.createDataFrame(
        [
            (1, f"{nav}\nunique one\n\nunique two"),
            (2, f"alpha\n  {nav}  \nbeta"),  # trimmed form matches
            (3, f"{nav}\ngamma"),
            (4, nav),  # all boilerplate -> ''
            (5, "only unique text"),
            (6, None),
            (7, ""),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(
            docs, min_doc_frac=0.3, corpus_count=7
        ).collect()
    }
    assert rows[1]["text_clean"] == "unique one\n\nunique two"
    assert rows[1]["n_lines"] == 4 and rows[1]["n_removed"] == 1
    assert rows[2]["text_clean"] == "alpha\nbeta"  # order preserved
    assert rows[3]["text_clean"] == "gamma"
    assert rows[4]["text_clean"] == "" and rows[4]["n_removed"] == 1
    assert rows[5]["text_clean"] == "only unique text"
    assert rows[5]["n_removed"] == 0
    assert rows[6]["text_clean"] is None and rows[6]["n_lines"] == 0
    assert rows[7]["text_clean"] == "" and rows[7]["n_lines"] == 1

    # below-threshold sharing survives: nav is in 4 of 7 docs (57%),
    # under a 70% bar
    few = remove_boilerplate_lines(
        docs, min_doc_frac=0.7, corpus_count=7
    ).collect()
    assert all(
        nav in (r["text_clean"] or "") for r in few if r["doc_id"] in (1, 3)
    )


# --------------------------------------------------- temperature mixing


def test_temperature_mixture_flattens_and_excludes_null_source(spark):
    """tau<1 flattens toward rare sources: the rare source's keep RATE
    exceeds the common source's; tau=1 keeps natural proportions
    (both rates ~= target_fraction); rows with NULL provenance are
    excluded by documented rule; rates clamp at keep-everything."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        temperature_mixture,
    )

    rows = (
        [(i, "common") for i in range(4000)]
        + [(10_000 + i, "rare") for i in range(40)]
        + [(20_000, None)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")

    def rates(tau):
        kept = temperature_mixture(
            df, tau=tau, strata_col="source", id_col="doc_id",
            target_fraction=0.5,
        )
        counts = {r["source"]: r["n"] for r in
                  kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
        assert None not in counts  # NULL provenance excluded
        return counts.get("common", 0) / 4000, counts.get("rare", 0) / 40

    c_flat, r_flat = rates(0.3)
    assert r_flat > c_flat  # flattened toward the rare source
    assert r_flat == 1.0  # rare rate clamps at keep-everything
    c_nat, r_nat = rates(1.0)
    # natural proportions: both rates ~ target_fraction (hash noise on
    # the 40-row source is binomial; allow a wide band)
    assert abs(c_nat - 0.5) < 0.05 and abs(r_nat - 0.5) < 0.25


# ------------------------------------------------------- LM quality score


def test_lm_score_reference_trained_ordering(spark):
    """CCNet-shaped contract: against a reference model, a document
    made of reference-frequent transitions outscores one made of
    transitions the reference never saw (which bottoms out at the
    add-one smoothing floor, not zero)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        lm_transition_scores,
    )

    ref = _docs_df(
        spark, ["the cat sat on the mat"] * 20 + ["the dog sat on the rug"] * 5
    )
    eval_docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),  # every bigram common in ref
            (2, "mat the on sat cat the"),  # same tokens, unseen order
            (3, "zq xv qq zz"),  # fully OOV
            (4, "one"),  # single token: no transitions
            (5, None),  # NULL text
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in lm_transition_scores(eval_docs, reference=ref).collect()
    }
    assert len(rows) == 5
    # reference-like text beats BOTH degenerate floors; note the
    # add-one artifact (documented in operators/lm.py): an unseen
    # CONTEXT backs off to 1/V, which can exceed a frequent context's
    # unseen-word floor 1/(c+V) — so OOV gibberish is not asserted
    # below wrong-order-common-words, only below real text
    assert rows[1]["lm_score"] > rows[2]["lm_score"] > 0
    assert rows[1]["lm_score"] > rows[3]["lm_score"] > 0
    assert rows[4]["n_bigrams"] == 0 and rows[4]["lm_score"] is None
    assert rows[5]["n_bigrams"] == 0 and rows[5]["lm_score"] is None
    assert rows[1]["n_bigrams"] == 5


def test_lm_score_empty_reference_survives_ansi(spark):
    """A token-less reference (every text NULL/empty) makes V=0 and
    every context count NULL; the greatest(v,1) floor keeps the ANSI
    divide alive and scores degenerate to the uniform ceiling instead
    of killing the job."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        lm_transition_scores,
    )

    ref = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    docs = _docs_df(spark, ["a b c"])
    rows = lm_transition_scores(docs, reference=ref).collect()
    assert len(rows) == 1 and rows[0]["n_bigrams"] == 2
    assert rows[0]["lm_score"] == 1.0  # uniform ceiling, finite


def test_lm_score_self_trained_exact_value(spark):
    """Hand-computed check of the quantized math on a 2-doc corpus:
    counts, smoothing, and the mean are exactly the spec values."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        lm_transition_scores,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.lm import LM_QUANT

    docs = _docs_df(spark, ["a b a b", "a b"])
    # bigrams: doc0 = [a b, b a, a b], doc1 = [a b]; V = 2
    # c(a b)=3, c(b a)=1; c(a ·)=3, c(b ·)=1
    # p(a b) = (3+1)/(3+2) = 0.8 ; p(b a) = (1+1)/(1+2) = 2/3
    rows = {r["doc_id"]: r for r in lm_transition_scores(docs).collect()}
    q_ab = round(0.8 * LM_QUANT)
    q_ba = round((2.0 / 3.0) * LM_QUANT)
    assert rows[0]["lm_prob_sum"] == 2 * q_ab + q_ba
    assert rows[1]["lm_prob_sum"] == q_ab
    assert rows[0]["n_bigrams"] == 3 and rows[1]["n_bigrams"] == 1
    assert rows[1]["lm_score"] == (q_ab / 1.0) / LM_QUANT


# ---------------------------------------------------------- semantic dedup


def test_semantic_dedup_planted_groups(spark):
    """SemDeDup end-to-end on planted geometry: two tight semantic
    groups (near-identical directions) + isolated singletons. Pairs
    must cover exactly the within-group pairs; clusters keep min-id
    canonical; singletons label themselves; the zero-norm vector pairs
    with nothing and stays a singleton."""
    import numpy as np

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        semantic_dedup,
        semantic_dedup_pairs,
    )

    rng = np.random.default_rng(5)
    dim = 16

    def jitter(base, eps):
        v = np.array(base) + rng.normal(0, eps, dim)
        return [float(x) for x in v]

    a = [float(x) for x in rng.normal(0, 1, dim)]
    b = [float(x) for x in rng.normal(0, 1, dim)]
    rows = (
        [(i, jitter(a, 1e-3)) for i in range(3)]  # group A: ids 0-2
        + [(10 + i, jitter(b, 1e-3)) for i in range(4)]  # group B: 10-13
        + [
            (100 + i, [float(x) for x in rng.normal(0, 1, dim)])
            for i in range(20)
        ]
        + [(999, [0.0] * dim)]  # zero-norm: cosine undefined
    )
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    pairs = semantic_dedup_pairs(
        emb, threshold=0.99, n_cells=4, corpus_count=len(rows)
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    want = {(i, j) for i in range(3) for j in range(3) if i < j} | {
        (10 + i, 10 + j) for i in range(4) for j in range(4) if i < j
    }
    assert got == want
    assert all(r["cosine"] >= 0.99 for r in pairs)

    labels = {
        r["vec_id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in semantic_dedup(
            emb, threshold=0.99, n_cells=4, corpus_count=len(rows)
        ).collect()
    }
    assert len(labels) == len(rows)
    assert labels[0] == (0, 3, 1) and labels[2] == (0, 3, 0)
    assert labels[10] == (10, 4, 1) and labels[13] == (10, 4, 0)
    assert labels[100] == (100, 1, 1)
    assert labels[999] == (999, 1, 1)  # zero-norm singleton


def test_semantic_dedup_paper_keep_rule(spark):
    """keep='centroid_far' (the arXiv:2303.09540 rule): within a
    semantic cluster the kept member is the one with the LOWEST cosine
    to its centroid; labels and sizes are identical to the min-id
    variant, only is_canonical moves; singletons (incl. zero-norm)
    stay their own canonical."""
    import numpy as np

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        ivf_centroids,
        semantic_dedup,
    )

    rng = np.random.default_rng(21)
    dim = 16
    base = rng.normal(0, 1, dim)
    base /= np.linalg.norm(base)
    ortho = rng.normal(0, 1, dim)
    ortho -= ortho @ base * base
    ortho /= np.linalg.norm(ortho)

    def mix(eps):
        v = base + eps * ortho
        return [float(x) for x in v / np.linalg.norm(v)]

    # id 0 sits AT the centroid direction, ids 1-2 progressively off:
    # all pairwise cosines ~1, but id 2 is farthest from the centroid
    rows = (
        [(0, mix(0.0)), (1, mix(0.005)), (2, mix(0.01))]
        + [(50 + i, [float(x) for x in rng.normal(0, 1, dim)]) for i in range(10)]
        + [(999, [0.0] * dim)]
    )
    emb2 = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # centroid table: make vector 0 itself a centroid so cosines to it
    # strictly order 0 > 1 > 2
    cents = ivf_centroids(emb2, 4, corpus_count=len(rows))
    min_id = {
        r["vec_id"]: r
        for r in semantic_dedup(
            emb2, threshold=0.999, centroids=cents, keep="min_id"
        ).collect()
    }
    far = {
        r["vec_id"]: r
        for r in semantic_dedup(
            emb2, threshold=0.999, centroids=cents, keep="centroid_far"
        ).collect()
    }
    assert set(min_id) == set(far)
    for k in min_id:
        assert min_id[k]["cluster_id"] == far[k]["cluster_id"]
        assert min_id[k]["cluster_size"] == far[k]["cluster_size"]
    assert min_id[0]["cluster_size"] == 3
    assert min_id[0]["is_canonical"] == 1  # min id keeps 0
    assert far[2]["is_canonical"] == 1  # paper rule keeps farthest
    assert far[0]["is_canonical"] == 0 and far[1]["is_canonical"] == 0
    assert far[999]["is_canonical"] == 1  # zero-norm singleton


def test_semantic_dedup_pairs_stay_within_cells(spark, emb):
    """The scale contract: every emitted pair shares a cell — the
    operator never compares across cells (that is what bounds the
    candidate count at ~N^1.5 with sqrt-N cells)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        ivf_centroids,
        semantic_dedup_pairs,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.similarity import (
        _ivf_assign,
    )

    n = emb.count()
    cents = ivf_centroids(emb, 8, corpus_count=n)
    cell_of = {
        r["__c"]: r["cell"]
        for r in _ivf_assign(emb, cents, 1, "vec_id", "embedding", "__c").collect()
    }
    pairs = semantic_dedup_pairs(
        emb, threshold=0.0, n_cells=8, corpus_count=n
    ).collect()
    assert pairs, "threshold 0 over shared cells must emit pairs"
    for r in pairs:
        assert cell_of[r["id_a"]] == cell_of[r["id_b"]]


def test_semantic_dedup_cell_cap_bounds_hot_cell(spark):
    """cell_cap deterministically bounds a pile-up cell: 200 identical
    vectors land in one cell; uncapped pairs are quadratic, capped
    pairs are bounded by cap*(cap-1)/2."""
    import numpy as np

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        semantic_dedup_pairs,
    )

    rng = np.random.default_rng(9)
    base = [float(x) for x in rng.normal(0, 1, 16)]
    rows = [(i, base) for i in range(200)] + [
        (1000 + i, [float(x) for x in rng.normal(0, 1, 16)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    uncapped = semantic_dedup_pairs(
        emb, threshold=0.999, n_cells=4, corpus_count=len(rows)
    ).count()
    capped = semantic_dedup_pairs(
        emb, threshold=0.999, n_cells=4, corpus_count=len(rows), cell_cap=16
    ).count()
    assert uncapped >= 200 * 199 / 2
    assert capped <= 16 * 15 / 2 * 4  # per-cell cap over <=4 cells


# ------------------------------------------------------------- multimodal

def test_multimodal_fake_decode_deterministic(spark, docs):
    media = synth_media(spark, docs.limit(20))
    a = extract_features(media, decoder="fake").collect()
    b = extract_features(media, decoder="fake").collect()
    fa = {r["media_id"]: r["features"] for r in a}
    fb = {r["media_id"]: r["features"] for r in b}
    assert fa == fb
    assert all(len(v) == 16 for v in fa.values())


def test_multimodal_stub_raises(spark, docs):
    media = synth_media(spark, docs.limit(2))
    with pytest.raises(Exception) as exc:
        extract_features(media, decoder="stub").collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_frame_sampling_jvm_side(spark, docs):
    vids = synth_media(spark, docs.limit(10), kind="video")
    frames = sample_frames(vids, every_n=7).collect()
    metas = {r["media_id"]: r["meta"]["n_frames"] for r in vids.collect()}
    for mid, n in metas.items():
        expect = list(range(0, n, 7)) or [0]
        got = sorted(r["frame_idx"] for r in frames if r["media_id"] == mid)
        assert got == expect, (mid, n)


def test_resize_plan_preserves_aspect_flag(spark, docs):
    media = synth_media(spark, docs.limit(50))
    out = resize_plan(media, max_width=32).collect()
    for r in out:
        assert r["target"]["width"] <= 32


def test_real_decoder_wav_ppm_bmp_end_to_end(spark):
    """decoder='real': actual WAV (stdlib wave), PPM (P6) and BMP
    (24-bit) payloads decode through the full Arrow mapInPandas path to
    exact, independently-computed feature stats."""
    import io
    import struct
    import wave

    import numpy as np

    # WAV: 1 kHz of int16 ramp at 8 kHz mono
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        samples = np.arange(-500, 500, dtype="<i2")
        wf.writeframes(samples.tobytes())
    wav_bytes = buf.getvalue()

    # PPM: 4x2 image, pixel value = x * 40 on all channels
    px = np.zeros((2, 4, 3), dtype=np.uint8)
    for x in range(4):
        px[:, x, :] = x * 40
    ppm_bytes = b"P6\n# comment\n4 2\n255\n" + px.tobytes()

    # BMP: same 4x2 image, bottom-up BGR rows padded to 4 bytes
    stride = (4 * 3 + 3) & ~3
    bmp_rows = b""
    for y in range(1, -1, -1):  # bottom-up
        row = px[y][:, ::-1].tobytes()  # RGB -> BGR
        bmp_rows += row + b"\x00" * (stride - len(row))
    bmp_bytes = (
        b"BM" + struct.pack("<IHHI", 54 + len(bmp_rows), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 24, 0, len(bmp_rows),
                      2835, 2835, 0, 0)
        + bmp_rows
    )

    rows = [
        (1, "audio", bytearray(wav_bytes), (None, None, 8000, None, "wav")),
        (2, "image", bytearray(ppm_bytes), (4, 2, None, None, "ppm")),
        (3, "image", bytearray(bmp_bytes), (4, 2, None, None, "bmp")),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, content binary,"
        " meta struct<width:int,height:int,sample_rate:int,"
        "n_frames:int,format:string>",
    )
    out = {
        r["media_id"]: r["features"]
        for r in extract_features(media, decoder="real").collect()
    }
    # audio: n, rate, duration, mean, rms...
    x = samples.astype(np.float64) / 32768.0
    assert out[1][0] == 1000.0 and out[1][1] == 8000.0
    assert out[1][2] == pytest.approx(0.125)
    assert out[1][4] == pytest.approx(float(np.sqrt(np.mean(x * x))))
    # image stats identical for the PPM and BMP encodings of the SAME pixels
    assert out[2] == out[3]
    assert out[2][0] == 4.0 and out[2][1] == 2.0
    assert out[2][2] == pytest.approx(60.0)  # mean of 0,40,80,120
    # unknown format still raises at the declared plug-in point
    raw = spark.createDataFrame(
        [(9, "video", bytearray(b"xx"), (None, None, None, 3, "mp4"))],
        media.schema,
    )
    with pytest.raises(Exception, match="mp4"):
        extract_features(raw, decoder="real").collect()


def _png_encode(px, color_type, filters):
    """Minimal PNG writer for test fixtures: 8-bit, non-interlaced,
    one explicit filter type per row (exercises the decoder's
    defiltering, not just the zlib path)."""
    import struct
    import zlib

    import numpy as np

    h, w = px.shape[0], px.shape[1]
    ch = {0: 1, 2: 3, 6: 4}[color_type]
    flat = px.reshape(h, w * ch).astype(np.int32)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = b""
    for y in range(h):
        f = filters[y % len(filters)]
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * ch, np.int32)
        line = bytearray([f])
        for x in range(w * ch):
            left = int(cur[x - ch]) if x >= ch else 0
            up = int(prev[x])
            upleft = int(prev[x - ch]) if x >= ch else 0
            pred = {
                0: 0,
                1: left,
                2: up,
                3: (left + up) >> 1,
                4: paeth(left, up, upleft),
            }[f]
            line.append((int(cur[x]) - pred) & 0xFF)
        raw += bytes(line)

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_decode_exact_pixels_all_filters():
    """Exact pixel recovery through zlib inflate + defilter for every
    PNG filter type (0-4) and color types 0/2/6."""
    import numpy as np

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.multimodal import (
        _decode_png,
    )

    rng = np.random.default_rng(42)
    rgb = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    # one row per filter type 0..4
    got = _decode_png(_png_encode(rgb, 2, [0, 1, 2, 3, 4]))
    assert np.array_equal(got, rgb)
    # RGBA: alpha dropped, RGB recovered exactly
    rgba = np.dstack([rgb, np.full((5, 7), 77, np.uint8)])
    got = _decode_png(_png_encode(rgba, 6, [4, 3, 2, 1, 0]))
    assert np.array_equal(got, rgb)
    # grayscale broadcasts to 3 identical channels
    gray = rng.integers(0, 256, size=(4, 6, 1), dtype=np.uint8)
    got = _decode_png(_png_encode(gray, 0, [1, 2, 3, 4]))
    assert np.array_equal(got, np.repeat(gray, 3, axis=2))


def test_real_decoder_png_matches_ppm_features(spark):
    """The SAME pixels as PNG and PPM must produce identical feature
    vectors through the full Arrow mapInPandas 'real' decode path."""
    import numpy as np

    px = np.zeros((2, 4, 3), dtype=np.uint8)
    for x in range(4):
        px[:, x, :] = x * 40
    ppm_bytes = b"P6\n4 2\n255\n" + px.tobytes()
    png_bytes = _png_encode(px, 2, [0, 4])
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(ppm_bytes), (4, 2, None, None, "ppm")),
            (2, "image", bytearray(png_bytes), (4, 2, None, None, "png")),
        ],
        "media_id long, kind string, content binary,"
        " meta struct<width:int,height:int,sample_rate:int,"
        "n_frames:int,format:string>",
    )
    out = {
        r["media_id"]: r["features"]
        for r in extract_features(media, decoder="real").collect()
    }
    assert out[1] == out[2]
    assert out[2][2] == pytest.approx(60.0)


def test_ivf_recall_and_probe_monotonicity(spark, emb):
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        ivf_topk,
    )

    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }

    def recall(nprobe):
        approx = {
            (r["query_id"], r["vec_id"])
            for r in ivf_topk(
                emb, queries, k=5, n_cells=16, nprobe=nprobe
            ).collect()
        }
        return len(exact & approx) / len(exact)

    r1, r4 = recall(1), recall(4)
    assert r4 >= r1  # more probed cells can only add candidates
    assert r4 > 0.3, (r1, r4)
    # probing ALL cells = exact brute force (cells partition the corpus)
    rall = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(emb, queries, k=5, n_cells=16, nprobe=16).collect()
    }
    assert rall == exact


def test_trained_ivf_centroids_recall_at_least_seeded(spark, emb):
    """KMeans-trained centroids (offline job) feed ivf_topk via
    centroids= and must match or beat the seeded deterministic layout's
    recall vs the exact baseline (VERDICT r2 #3 / SURVEY §7 M4)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        ivf_topk,
        train_ivf_centroids,
    )

    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }

    def recall(**kw):
        approx = {
            (r["query_id"], r["vec_id"])
            for r in ivf_topk(emb, queries, k=5, nprobe=2, **kw).collect()
        }
        return len(exact & approx) / len(exact)

    trained = train_ivf_centroids(emb, n_cells=16, seed=7)
    assert [f.name for f in trained.schema] == ["cell", "cq", "cn2"]
    r_seeded = recall(n_cells=16)
    r_trained = recall(centroids=trained)
    assert r_trained >= r_seeded, (r_seeded, r_trained)
    assert r_trained > 0.3


def test_auto_cells_policy(spark):
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.similarity import (
        auto_cells,
    )

    # cells ~ sqrt(N): expected occupancy (candidates per probe) grows
    # ~sqrt(N) instead of linearly as it would with a fixed cell count
    assert auto_cells(1_000) == 32
    assert auto_cells(1_000_000) == 1024
    assert auto_cells(100) >= 4
    for n, n2 in ((10_000, 40_000), (1_000_000, 4_000_000)):
        c, c2 = auto_cells(n), auto_cells(n2)
        assert 1 < c2 / c <= 4  # 4x corpus -> ~2x cells


def test_label_centroids_match_numpy(spark):
    """Centroid values must match a float64 numpy mean within
    fixed-point quantization (5e-7 per component)."""
    import numpy as np

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.similarity import (
        label_centroids,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    from .conftest import SF0001

    emb = load_table(spark, SF0001, "embeddings")
    got = {
        (r["label"], r["pos"]): (r["n_vecs"], r["centroid"])
        for r in label_centroids(emb).collect()
    }
    rows = emb.select("label", "embedding").collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(
            np.asarray(r["embedding"], dtype=np.float64)
        )
    for label, vecs in by_label.items():
        mean = np.mean(np.stack(vecs), axis=0)
        for pos in range(len(mean)):
            n, c = got[(label, pos)]
            assert n == len(vecs)
            assert abs(c - mean[pos]) <= 5e-7 + 1e-12, (label, pos)


def _ppm_bytes(px):
    h, w = px.shape[0], px.shape[1]
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def test_image_near_dup_perceptual_hash(spark):
    """Planted near-dup image pair (few pixels nudged) is found by the
    dHash + hamming-LSH path; an unrelated image is not; the hashes are
    deterministic and the reported hamming matches a direct popcount."""
    import numpy as np

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.multimodal import (
        image_near_dup_pairs,
        perceptual_hashes,
    )

    rng = np.random.default_rng(42)
    base = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    near = base.copy()
    near[0:2, 0:2] = 255  # tiny corner blotch — same structure
    other = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)

    rows = [
        (1, "image", bytearray(_ppm_bytes(base)), (32, 32, None, None, "ppm")),
        (2, "image", bytearray(_ppm_bytes(near)), (32, 32, None, None, "ppm")),
        (3, "image", bytearray(_ppm_bytes(other)), (32, 32, None, None, "ppm")),
        (4, "image", None, (None, None, None, None, "ppm")),  # NULL payload
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, content binary,"
        " meta struct<width:int,height:int,sample_rate:int,"
        "n_frames:int,format:string>",
    )

    hashes = {r.media_id: (r.dhash, r.ahash) for r in perceptual_hashes(media).collect()}
    assert hashes[4] == (None, None)
    assert hashes[1] == {r.media_id: (r.dhash, r.ahash) for r in perceptual_hashes(media).collect()}[1]  # deterministic
    d1, d2, d3 = hashes[1][0], hashes[2][0], hashes[3][0]
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(d1, d2) <= 3, (d1, d2, ham(d1, d2))  # planted near-dup
    assert ham(d1, d3) > 3  # unrelated image far away

    pairs = {(r.doc_a, r.doc_b): r.hamming for r in image_near_dup_pairs(media).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == ham(d1, d2)
    assert all({a, b} == {1, 2} for a, b in pairs)


def test_hamming_near_dup_completeness_and_bounds(spark):
    """Pigeonhole completeness: every pair within max_hamming < bands
    is found regardless of WHICH bits differ; pairs beyond the radius
    are rejected by the exact popcount even when a band collides."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.dedup import (
        hamming_near_dup_pairs,
    )

    def s64(v):  # wrap into the signed LongType domain
        return v - (1 << 64) if v >= 1 << 63 else v

    base = 0x0123_4567_89AB_CDEF
    rows = [
        (1, base),
        (2, s64(base ^ (1 << 63) ^ (1 << 0) ^ (1 << 31))),  # d=3, spread
        (3, base ^ 0xF),       # d=4: band 0 differs, others collide
        (4, None),             # NULL fingerprint: excluded outright
    ]
    df = spark.createDataFrame(rows, "doc_id long, phash long")
    got = {(r.doc_a, r.doc_b): r.hamming
           for r in hamming_near_dup_pairs(df, max_hamming=3, bands=4).collect()}
    assert got == {(1, 2): 3}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="divide"):
        hamming_near_dup_pairs(df, bands=5).collect()


def test_hard_negatives_excludes_near_duplicates(spark, emb):
    """Every returned negative is strictly below the dup threshold; a
    planted exact duplicate (cosine 1.0) never appears even though it
    is the single most similar vector; ranks stay dense from 1."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import hard_negatives

    base = emb.limit(40)
    # plant an exact duplicate of vector 0 with a fresh id
    dup = base.where(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    corpus = base.unionByName(dup)
    out = hard_negatives(
        corpus, k=3, dup_threshold=0.95, n_planes=4, n_tables=2,
        multi_probe=1, corpus_count=41,
    ).collect()
    rows = [(r.query_id, r.vec_id, r.cosine, r.rank) for r in out]
    assert rows, "must produce negatives"
    assert all(c < 0.95 for _, _, c, _ in rows)
    near0 = [(q, v) for q, v, _, _ in rows if q == 0]
    assert (0, 100000) not in near0  # the planted dup is excluded
    by_q = {}
    for q, _, _, rk in rows:
        by_q.setdefault(q, []).append(rk)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())


def test_ivf_excludes_zero_norm_vectors(spark, emb):
    """Zero-norm / NULL embeddings must be excluded from IVF
    assignment on every role (corpus, query, centroid) instead of
    killing the query with an ANSI divide-by-zero — the dirty-data
    suite caught the unguarded path."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        ivf_topk,
        ivf_topk_batched,
    )

    base = emb.limit(30)
    salt = spark.createDataFrame(
        [(9001, [0.0] * 64, 0), (9002, None, 0)],
        "vec_id long, embedding array<float>, label int",
    )
    corpus = base.unionByName(salt)
    # vec_id 0 is a seeded centroid (step=1 at n=32): the degenerate
    # rows must not crash even when they land in centroid range
    out = ivf_topk(corpus, corpus.where("vec_id < 5"), k=3, n_cells=8).collect()
    assert out and all(r.vec_id not in (9001, 9002) for r in out)
    outb = ivf_topk_batched(corpus, corpus, k=3, n_cells=8).collect()
    assert outb
    assert all(r.vec_id not in (9001, 9002) for r in outb)
    assert all(r.query_id not in (9001, 9002) for r in outb)


def test_audio_fingerprint_energy_deltas_and_near_dup(spark):
    """audio_fingerprint: bit n_bits-1-k set iff window k+1 carries more
    energy than window k (MSB-first, real WAV round-trip); NULL payload
    and too-short clips emit NULL; audio_near_dup_pairs finds the
    planted 1-bit variant and rejects the unrelated clip."""
    import io
    import wave

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        audio_fingerprint,
        audio_near_dup_pairs,
    )

    def _wav(bits, w=16):
        amp, samples = 2000, []
        for k in range(len(bits) + 1):
            samples.extend([amp] * w)
            if k < len(bits):
                amp += 16 if bits[k] else -16
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(
                b"".join(int(s).to_bytes(2, "little", signed=True) for s in samples)
            )
        return buf.getvalue()

    base = [(1 if (0x9A5F << 48) >> (63 - k) & 1 else 0) for k in range(64)]
    near = list(base)
    near[10] ^= 1  # 1-bit flip -> hamming 1
    far = [1 - b for b in base[:32]] + base[32:]  # 32 flips
    rows = [
        (1, "audio", _wav(base), {"format": "wav"}),
        (2, "audio", _wav(near), {"format": "wav"}),
        (3, "audio", _wav(far), {"format": "wav"}),
        (4, "audio", None, {"format": "wav"}),          # NULL payload
        (5, "audio", _wav(base[:2]), {"format": "wav"}),  # too short? 3 windows
        (6, "image", _wav(base), {"format": "wav"}),    # wrong kind
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, content binary, meta map<string,string>"
    )
    fps = {r.media_id: r.afp for r in audio_fingerprint(media).collect()}
    want = sum(1 << (63 - k) for k, b in enumerate(base) if b)
    if want >= 1 << 63:  # LongType domain: bit 63 wraps negative
        want -= 1 << 64
    assert fps[1] == want
    assert fps[2] == want ^ (1 << (63 - 10))
    assert fps[4] is None and fps[5] is None and fps[6] is None
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in audio_near_dup_pairs(media).collect()
    }
    assert pairs == {(1, 2): 1}
