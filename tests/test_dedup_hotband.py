"""Hot-bucket linearity of the banded near-dup candidate joins.

Round-6 VERDICT finding: a band bucket of k identical fingerprints /
signatures must cost O(k) through the candidate self-join, not k².
The fix collapses identical fingerprints (hamming) / signatures (LSH)
/ texts (lsh_near_dup_edges) to one representative before banding and
re-attaches members afterwards; these tests pin

* the PAIRS contract is unchanged (brute-force equality on a planted
  corpus including the hot group),
* the rep-level candidate stage sees O(distinct), not O(members)
  (1,000 identical docs -> ZERO rep-level candidate pairs),
* the edges variants are component-exact vs the full pair table and
  O(k)-sized on the hot group,
* ``band_max`` caps residual distinct-fingerprint band skew.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.dedup import (
    _hamming_rep_pairs,
    clusters_append,
    connected_components,
    hamming_near_dup_edges,
    hamming_near_dup_pairs,
    jaccard_verify_pairs,
    lsh_candidate_pairs,
    lsh_near_dup_edges,
    minhash_signatures,
    near_dup_clusters,
)

HOT = 1000  # planted identical-fingerprint pile-up


def _hot_corpus(spark):
    rows = [(i, 0x0123_4567_89AB) for i in range(HOT)]  # identical fps
    rows += [
        (2000, 0x0123_4567_89AA),  # hamming 1 from the pile
        (2001, 0x7FFF_FFFF_FFFF_0123),  # far away
        (2002, None),  # NULL fp: excluded
        (None, 0x0123_4567_89AB),  # NULL id: excluded
    ]
    return spark.createDataFrame(rows, "doc_id long, phash long")


def test_hot_band_candidates_are_linear(spark):
    """1,000 identical fingerprints put ONE representative through the
    banded self-join: the rep-level candidate stage emits only the
    genuine cross-fingerprint pairs (here 1), never the ~500k
    intra-pile combinations."""
    df = _hot_corpus(spark)
    mem, rep_pairs = _hamming_rep_pairs(
        df, "doc_id", "phash", 3, 4, 64, None
    )
    reps = mem.where(F.col("doc_id") == F.col("__rep"))
    assert reps.count() == 3  # 3 distinct fingerprints with non-null ids
    got = [(r.doc_a, r.doc_b, r.hamming) for r in rep_pairs.collect()]
    assert got == [(0, 2000, 1)]  # O(distinct), not O(k^2)


def test_hot_band_edges_are_linear_and_component_exact(spark):
    df = _hot_corpus(spark)
    edges = hamming_near_dup_edges(df, max_hamming=3, bands=4)
    rows = edges.collect()
    # 999 star edges + 1 rep pair — never ~500k
    assert len(rows) == HOT
    stars = [r for r in rows if r.hamming == 0]
    assert len(stars) == HOT - 1
    assert all(r.doc_a == 0 for r in stars)  # rep = min id of the pile
    # every doc lands in one cluster with doc 0 + 2000; 2001 singleton
    docs = df.select("doc_id").where(F.col("doc_id").isNotNull())
    clusters = near_dup_clusters(docs, edges.select("doc_a", "doc_b"))
    agg = {
        r.cluster_id: r.n
        for r in clusters.groupBy("cluster_id").agg(F.count("*").alias("n")).collect()
    }
    assert agg == {0: HOT + 1, 2001: 1, 2002: 1}


def test_pairs_contract_matches_brute_force(spark):
    """Exact output equality with a brute-force banding+verify oracle
    on a mixed corpus (identical groups, near pairs, far pairs)."""
    rows = [(i, 0b1010_1010) for i in range(40)]
    rows += [
        (100, 0b1010_1011),
        (101, 0b1010_1010 ^ (1 << 40) ^ (1 << 20)),
        (102, 0x7FFF_0000_1234_5678),
        (103, 0x7FFF_0000_1234_5678),
        (104, None),
        (None, 0b1010_1010),
    ]
    df = spark.createDataFrame(rows, "doc_id long, phash long")
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in hamming_near_dup_pairs(df, max_hamming=3, bands=4).collect()
    }
    vals = [(i, v) for i, v in rows if i is not None and v is not None]

    def band(v, b):
        return (v >> (b * 16)) & 0xFFFF

    exp = set()
    for (ia, va), (ib, vb) in itertools.combinations(vals, 2):
        a, b = (ia, ib) if ia < ib else (ib, ia)
        if any(band(va, k) == band(vb, k) for k in range(4)):
            h = bin(va ^ vb).count("1")
            if h <= 3:
                exp.add((a, b, h))
    assert got == exp


def test_band_max_caps_residual_skew(spark):
    """Distinct fingerprints sharing ONE band slice (boilerplate): the
    collapse can't merge them, but band_max bounds the bucket. With
    the cap the candidate count is at most C(band_max, 2) per bucket;
    without it the bucket goes quadratic in distinct members."""
    # 64 DISTINCT fps agreeing on band 0 only (low 16 bits identical,
    # high bits spread with >3 bit flips so nothing verifies)
    rows = [
        (i, 0x1234 | (((i + 1) * 0x0F0F) << 16)) for i in range(64)
    ]
    df = spark.createDataFrame(rows, "doc_id long, phash long")
    # radius 64 = every candidate verifies, so pair counts expose the
    # candidate volume directly
    _, uncapped_pairs = _hamming_rep_pairs(df, "doc_id", "phash", 64, 4, 64, None)
    _, capped_pairs = _hamming_rep_pairs(df, "doc_id", "phash", 64, 4, 64, 8)
    n_uncapped = uncapped_pairs.count()
    n_capped = capped_pairs.count()
    assert n_uncapped >= 64 * 63 / 4  # the bucket really is hot
    assert n_capped <= 8 * 7 / 2 * 4  # <= C(cap,2) per band bucket


def test_lsh_candidates_collapse_identical_signatures(spark):
    """30 identical texts share one MinHash signature: the rep-level
    band join sees one row per band, and the full candidate output
    still contains every intra-group pair (output contract unchanged)."""
    texts = [(i, "spark structured streaming watermark " * 4) for i in range(30)]
    texts += [
        (200, "spark structured streaming watermark " * 4 + "extra tail"),
        (201, "entirely different document about parquet row groups"),
        (202, None),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    sigs = minhash_signatures(docs)
    cands = lsh_candidate_pairs(sigs)
    got = {(r.doc_a, r.doc_b) for r in cands.collect()}
    # all C(30,2) intra pairs present
    intra = {(a, b) for a, b in itertools.combinations(range(30), 2)}
    assert intra <= got
    # 201 pairs with nobody (different shingles -> different bands
    # with overwhelming probability on this fixture)
    assert not any(201 in p for p in got)


def test_lsh_edges_component_exact_vs_full_chain(spark):
    texts = [(i, "the quick brown fox jumps over the lazy dog " * 3) for i in range(25)]
    texts += [
        (300, "the quick brown fox jumps over the lazy dog " * 3 + " tail"),
        (301, "unrelated corpus text about feature stores and kinesis"),
        (302, "unrelated corpus text about feature stores and kinesis"),
        (303, None),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    sigs = minhash_signatures(docs)
    full = jaccard_verify_pairs(
        docs, lsh_candidate_pairs(sigs), threshold=0.5
    )
    edges = lsh_near_dup_edges(docs, threshold=0.5)
    ids = docs.select("doc_id").where(F.col("doc_id").isNotNull())
    c_full = {
        (r.doc_id, r.cluster_id, r.cluster_size, r.is_canonical)
        for r in near_dup_clusters(ids, full.select("doc_a", "doc_b")).collect()
    }
    c_edges = {
        (r.doc_id, r.cluster_id, r.cluster_size, r.is_canonical)
        for r in near_dup_clusters(ids, edges.select("doc_a", "doc_b")).collect()
    }
    assert c_full == c_edges
    # the edge list is linear in the identical-text pile: 24 star edges
    # (+ rep-level verified pairs), vs C(25,2)+ for the full table
    assert edges.count() < full.count()


def _cluster_set(df):
    return {
        (r.doc_id, r.cluster_id, r.cluster_size, r.is_canonical)
        for r in df.collect()
    }


def test_clusters_append_equals_from_scratch(spark):
    """Incremental cluster maintenance is EXACT: for any split of the
    edge stream into 'already ingested' and 'new batch', appending the
    batch to the prior labels reproduces the from-scratch clustering —
    including cross-batch merges of previously separate clusters,
    late old↔old edges, and batch-only singletons."""
    import random

    rng = random.Random(17)
    n = 120
    all_edges = set()
    # chains + random merges, ids interleaved so splits cross clusters
    for i in range(0, n - 3, 3):
        all_edges.add((i, i + 3))
    for _ in range(25):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            all_edges.add((min(a, b), max(a, b)))
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges_df = spark.createDataFrame(
        sorted(all_edges), "doc_a long, doc_b long"
    )
    expected = _cluster_set(near_dup_clusters(docs, edges_df))

    for mid in (40, 80, 113):
        old_docs = docs.where(F.col("doc_id") <= mid)
        new_docs = docs.where(F.col("doc_id") > mid)
        old_e = edges_df.where(
            (F.col("doc_a") <= mid) & (F.col("doc_b") <= mid)
        )
        new_e = edges_df.where(
            (F.col("doc_a") > mid) | (F.col("doc_b") > mid)
        )
        labels = near_dup_clusters(old_docs, old_e).select(
            "doc_id", "cluster_id"
        )
        got = _cluster_set(clusters_append(labels, new_docs, new_e))
        assert got == expected, f"split at {mid} diverged"


def test_clusters_append_handles_late_old_edges_and_nulls(spark):
    """A late edge between two OLD clusters merges them; NULL-id docs
    ride through as NULL-cluster rows exactly as near_dup_clusters
    emits them."""
    docs = spark.createDataFrame(
        [(1,), (2,), (3,), (4,), (None,)], "doc_id long"
    )
    old_e = spark.createDataFrame(
        [(1, 2), (3, 4)], "doc_a long, doc_b long"
    )
    labels = near_dup_clusters(docs, old_e).select("doc_id", "cluster_id")
    late = spark.createDataFrame([(2, 3)], "doc_a long, doc_b long")
    got = _cluster_set(
        clusters_append(labels, docs.limit(0), late)
    )
    all_e = old_e.unionByName(late)
    assert got == _cluster_set(near_dup_clusters(docs, all_e))


def test_clusters_append_leaves_untouched_clusters_out_of_cc(spark):
    """Cost contract: only clusters touched by a new edge enter the
    iterative CC loop — the star edge list it feeds is bounded by the
    touched mass, not the corpus."""
    # big untouched cluster 0..99, small touched cluster 100-101
    docs = spark.createDataFrame([(i,) for i in range(104)], "doc_id long")
    old_e = spark.createDataFrame(
        [(i, i + 1) for i in range(99)] + [(100, 101)],
        "doc_a long, doc_b long",
    )
    labels = near_dup_clusters(docs, old_e).select("doc_id", "cluster_id")
    new_e = spark.createDataFrame([(101, 102)], "doc_a long, doc_b long")
    # reproduce the operator's internal touched set
    eps = (
        new_e.select(F.col("doc_a").alias("doc_id"))
        .union(new_e.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    touched_cids = (
        labels.join(eps, "doc_id", "left_semi").select("cluster_id").distinct()
    )
    touched = labels.join(touched_cids, "cluster_id", "left_semi")
    touched_ids = {r.doc_id for r in touched.collect()}
    # just the 100-101 pair and singleton 102 — never the 100-doc cluster
    assert touched_ids == {100, 101, 102}
    got = _cluster_set(
        clusters_append(labels, docs.where(F.col("doc_id") > 101), new_e)
    )
    assert got == _cluster_set(
        near_dup_clusters(docs, old_e.unionByName(new_e))
    )
