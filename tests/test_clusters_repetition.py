"""Tests for near-dup cluster canonicalization (connected components)
and Gopher-style repetition signals."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.functions import with_repetition
from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
    connected_components,
    near_dup_clusters,
)


def _py_components(n_nodes, edges):
    """Union-find reference implementation (test oracle)."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id label per component
    comp_min = {}
    for x in range(n_nodes):
        r = find(x)
        comp_min.setdefault(r, x)  # x ascending -> first seen is min
    return {x: comp_min[find(x)] for x in range(n_nodes)}


def test_components_transitive_chain(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], ["doc_a", "doc_b"]
    )
    got = {
        r["node"]: r["label"] for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_components_long_path_converges(spark):
    # Path graph 0-1-2-...-40: diameter 40 >> max_iter 25; pointer
    # jumping must still converge (doubling per round).
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], ["doc_a", "doc_b"]
    )
    got = {
        r["node"]: r["label"] for r in connected_components(edges).collect()
    }
    assert got == {i: 0 for i in range(41)}


def test_components_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    n = 200
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    expect = _py_components(n, edges)
    touched = {x for e in edges for x in e}
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    # both paths — the single-task union-find fast path (default for a
    # graph this size) and the distributed pointer-jumping loop
    # (forced) — must produce the identical min-label map
    for small in (500_000, 0):
        got = {
            r["node"]: r["label"]
            for r in connected_components(
                df, small_graph_max_edges=small
            ).collect()
        }
        assert got == {x: expect[x] for x in touched}, f"small={small}"


def test_components_distributed_path_long_chain(spark):
    # keep the distributed loop covered on the convergence-critical
    # shape (path graph, diameter >> rounds) now that small graphs
    # default to the union-find fast path
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], ["doc_a", "doc_b"]
    )
    got = {
        r["node"]: r["label"]
        for r in connected_components(
            edges, small_graph_max_edges=0
        ).collect()
    }
    assert got == {i: 0 for i in range(41)}


def test_near_dup_clusters_keep_list(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    pairs = spark.createDataFrame([(0, 3), (3, 5)], ["doc_a", "doc_b"])
    rows = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in near_dup_clusters(docs, pairs).collect()
    }
    assert rows == {
        0: (0, 3, 1),
        3: (0, 3, 0),
        5: (0, 3, 0),
        1: (1, 1, 1),
        2: (2, 1, 1),
        4: (4, 1, 1),
    }
    # exactly one canonical row per cluster
    assert sum(v[2] for v in rows.values()) == 4


def _brute_repetition(text, n):
    toks = [t for t in text.strip().split() if t]
    grams = [
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    ] if len(toks) >= n else []
    total = len(grams)
    counts = {}
    for g in grams:
        counts[g] = counts.get(g, 0) + 1
    top = max(counts.values()) if counts else 0
    dup = sum(c for c in counts.values() if c > 1)
    return total, top, dup


def test_repetition_matches_bruteforce(spark):
    texts = [
        "a b a b a b a b",          # heavy bigram repetition
        "x y z w",                  # all distinct
        "solo",                     # too short for bigrams
        "",                         # empty
        "t t t t t t",              # single repeated token
        "the cat sat on the cat sat again",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in with_repetition(df).orderBy("doc_id").collect()
    }
    for i, t in enumerate(texts):
        for n in (2, 3):
            total, top, dup = _brute_repetition(t, n)
            r = out[i]
            assert r[f"n_{n}grams"] == total, (i, n)
            assert r[f"top_{n}gram_count"] == top, (i, n)
            assert r[f"dup_{n}gram_tokens"] == dup, (i, n)
            if total:
                assert abs(r[f"top_{n}gram_frac"] - top / total) < 1e-15
                assert abs(r[f"dup_{n}gram_frac"] - dup / total) < 1e-15
            else:
                assert r[f"top_{n}gram_frac"] == 0.0
                assert r[f"dup_{n}gram_frac"] == 0.0


def test_repetition_aggregate_evaluated_once(spark):
    # The run-length aggregate must appear exactly once per n in the
    # optimized plan (multi-use non-cheap aliases are not collapsed).
    df = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
    plan = (
        with_repetition(df)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("aggregate(") == 2, plan


def test_canonical_falls_back_to_present_member(spark):
    """A cluster whose component label is absent from docs (pairs
    computed pre-filter) must still mark exactly one PRESENT member
    canonical — a keep-canonical job would otherwise delete the whole
    surviving cluster."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.dedup import near_dup_clusters

    docs = spark.createDataFrame([(7,), (9,), (20,)], ["doc_id"])
    # pairs reference doc 5, which was filtered out of docs
    pairs = spark.createDataFrame(
        [(5, 7), (5, 9)], ["doc_a", "doc_b"]
    )
    out = {r["doc_id"]: r for r in near_dup_clusters(docs, pairs).collect()}
    cluster = {out[7]["cluster_id"], out[9]["cluster_id"]}
    assert cluster == {5}  # label survives as the cluster id
    canon = [d for d in (7, 9) if out[d]["is_canonical"] == 1]
    assert canon == [7]  # min PRESENT member, not the absent label
    assert out[20]["is_canonical"] == 1  # singleton unaffected
