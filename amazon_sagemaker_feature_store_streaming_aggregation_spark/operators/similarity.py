"""Embedding similarity search (training-data pipeline extension).

Approximate-nearest-neighbor over an ``array<float>`` embedding column:

* ``cosine_topk`` — exact brute-force top-k per query (the baseline and
  the verification stage). Embeddings are quantized to integer
  micro-units (``round(x * 1e6) :: long``) so dot products and squared
  norms are EXACT int64 arithmetic (64 dims × 1e6 × 1e6 ≈ 1e14 ≪ 2^63)
  and the cosine is a fixed IEEE sequence — bit-reproducible in DuckDB.
  All JVM higher-order array exprs (zip_with + aggregate), no UDFs.
* ``srp_signatures`` / ``ann_srp_topk`` — the scale path: sign-random-
  projection (SRP) LSH. Hyperplane weights are derived deterministically
  from md5 (``h64(p:d) mod 2001 - 1000``), each vector gets a b-bit
  bucket; top-k runs only within the query's bucket. One shuffle keyed
  on the bucket instead of an O(N·Q) cross product.

Scale: brute-force is O(N·Q·d) FLOPs but embarrassingly parallel with
the small query side broadcast; SRP trades recall for an O(N) bucketed
plan. At 100 TB the bucketed variant plus a re-rank of bucket members
is the intended deployment; tests measure SRP recall against the exact
baseline.

Bucket-cardinality policy (the 100×-scale knob): a FIXED plane count
means bucket occupancy grows linearly with N and within-bucket
candidate pairs grow ~N²/2^planes — quasi-all-pairs at 100×. Three
levers keep the candidate stage ~linear in N:

* :func:`auto_planes` — planes ≈ log2(N / target_bucket_size), so
  expected occupancy stays ~target_bucket_size and candidate pairs stay
  ~N·target/2 as the corpus grows (tests assert ~linear growth on a
  doubled corpus). Both ANN entry points take ``n_planes=None`` to
  apply the policy from the corpus count.
* ``bucket_cap`` — hard per-(table, bucket) candidate cap (deterministic
  ``row_number`` by id), bounding worst-case skewed buckets (e.g. a
  near-duplicate pile-up collapsing into one bucket).
* ``multi_probe`` — probing the query bucket plus all buckets at
  Hamming distance ≤1 buys back the recall that more planes cost,
  multiplying only the (tiny, broadcast) query side by planes+1 — the
  standard multi-probe LSH trade (Lv et al., VLDB'07).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..session import local_rows
from .dedup import _parallelize_scan

QUANT = 1_000_000

#: auto_planes default: expected bucket occupancy the policy aims for.
TARGET_BUCKET_SIZE = 256


def auto_planes(
    n_rows: int,
    target_bucket_size: int = TARGET_BUCKET_SIZE,
    min_planes: int = 4,
    max_planes: int = 24,
) -> int:
    """Corpus-scaled SRP plane count: ``ceil(log2(N / target))`` clamped
    to [min_planes, max_planes].

    Keeps expected bucket occupancy ~``target_bucket_size`` so the
    within-bucket candidate join stays ~linear in N (N·target/2 pairs)
    instead of ~N²/2^planes. ``max_planes`` bounds signature cost (each
    plane is a dims-wide dot product at scan time): at N=10^9 and
    target 256, planes=22 < 24."""
    ratio = max(1.0, n_rows / max(1, target_bucket_size))
    return max(min_planes, min(max_planes, math.ceil(math.log2(ratio))))


def _resolve_planes(
    embeddings: DataFrame, n_planes: int | None, corpus_count: int | None
) -> int:
    """Resolve the SRP plane count. Called exactly once per operator
    entry point, so an ANN call runs AT MOST one ``count()`` action —
    and zero when the caller passes ``n_planes`` or ``corpus_count``
    (what library users on a large corpus should do; the registered
    queries always pass ``corpus_count``)."""
    if n_planes is not None:
        return n_planes
    n = corpus_count if corpus_count is not None else embeddings.count()
    return auto_planes(n)


def quantize(col: str = "embedding", out: str = "qvec"):
    """Integer micro-unit quantization expr: array<float> -> array<long>.

    The float is widened to double BEFORE the multiply — float*int
    arithmetic stays in float32 and rounds differently across engines;
    float->double widening is exact, so both engines see the identical
    double product."""
    return F.expr(
        f"transform({col}, x -> cast(round(cast(x as double) * {QUANT}.0) as bigint))"
    ).alias(out)


def _dot(a: str, b: str) -> str:
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"


def _apply_predicate(df: DataFrame, predicate) -> DataFrame:
    """Metadata-constrained (FILTERED) search support, shared by every
    top-k operator: apply ``predicate`` (SQL string or Column) to the
    CORPUS side at operator entry — BEFORE quantization, bucketing,
    cell assignment or scoring — so when the corpus is a source read
    the filter reaches the scan (``PushedFilters`` for plain columns;
    plan-pinned by tests/test_filtered_ann.py), candidate generation
    only ever sees qualifying vectors, and nothing is ranked and then
    discarded. Semantics: exact/ANN top-k WITHIN the predicate's
    subset (the most common real vector-search call — e.g. top-k among
    ``lang = 'en' AND source = 'web'`` documents); the query side is
    never filtered."""
    if predicate is None:
        return df
    return df.where(F.expr(predicate) if isinstance(predicate, str) else predicate)


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    predicate=None,
) -> DataFrame:
    """Exact brute-force cosine top-k: for each query vector, the k most
    similar corpus vectors (excluding itself), ties broken by vec_id.

    Output: ``(query_id, vec_id, cosine, rank)``. The query side is
    broadcast (small by construction); the corpus scan stays narrow.
    ``predicate`` restricts the corpus side (see
    :func:`_apply_predicate` — filtered search; extra metadata columns
    on ``embeddings`` are allowed and dropped after the filter).
    """
    embeddings = _apply_predicate(embeddings, predicate)
    # under-split local scans must not serialize the quantize+dot
    # work onto one task (the broadcast join preserves the corpus
    # partitioning, so THIS is the parallelism the scorer gets);
    # guarded no-op on well-split inputs (_parallelize_scan)
    embeddings = _parallelize_scan(embeddings)
    # zero-norm vectors (all components rounding to 0 at the 1e-6
    # quantization) are EXCLUDED from both sides: cosine is undefined
    # for them (dot/0 -> NULL), and NULL-cosine rows would still
    # occupy top-k rank slots — train_ivf_centroids drops them for the
    # same reason
    corpus = (
        embeddings.select(
            F.col(id_col).alias("c_id"), quantize(vec_col, "c_q")
        )
        .withColumn("c_n2", F.expr(_dot("c_q", "c_q")))
        .where(F.col("c_n2") > 0)
    )
    qs = (
        queries.select(
            F.col(id_col).alias("query_id"), quantize(vec_col, "q_q")
        )
        .withColumn("q_n2", F.expr(_dot("q_q", "q_q")))
        .where(F.col("q_n2") > 0)
    )

    joined = corpus.join(F.broadcast(qs), F.col("c_id") != F.col("query_id"))
    scored = joined.withColumn(
        "cosine",
        F.expr(_dot("c_q", "q_q")).cast("double")
        / (F.sqrt(F.col("c_n2").cast("double")) * F.sqrt(F.col("q_n2").cast("double"))),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("c_id").alias(id_col), "cosine", "rank")
    )


def srp_signatures(
    embeddings: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    n_tables: int = 1,
) -> DataFrame:
    """Sign-random-projection bucket(s) per vector.

    Plane ``p`` of table ``t`` has weight ``h64('{t*planes+p}:{d}') mod
    2001 - 1000`` for dim ``d`` (deterministic integer in [-1000, 1000]
    — md5-derived, so an oracle reproduces it verbatim). Bit ``p`` =
    [dot(v, w_p) >= 0]. Output: one row per (vector, table) with
    ``(table, bucket)`` — with ``n_tables=1`` this is a plain
    per-vector bucket. Multiple tables are the standard LSH recall
    lever: a neighbor is a candidate if it collides in ANY table
    (recall 1-(1-p)^T for per-table collision rate p).
    """
    # plane dots run at the scan — an under-split local input would
    # serialize them onto one task (guarded no-op on real splits)
    embeddings = _parallelize_scan(embeddings)
    q = quantize(vec_col, "qvec")

    def bucket_expr(t: int) -> str:
        bit_terms = []
        for p in range(n_planes):
            seed = t * n_planes + p
            weights = (
                "array("
                + ", ".join(
                    f"(cast(conv(substring(md5('{seed}:{d}'), 1, 15), 16, 10)"
                    f" as bigint) % 2001) - 1000"
                    for d in range(dims)
                )
                + ")"
            )
            bit_terms.append(
                f"(case when aggregate(zip_with(qvec, {weights}, (x, w) -> x * w),"
                f" 0L, (acc, v) -> acc + v) >= 0 then shiftleft(1L, {p}) else 0L end)"
            )
        return " + ".join(bit_terms)

    tables = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"), F.expr(bucket_expr(t)).alias("bucket")
            )
            for t in range(n_tables)
        ]
    )
    # zero vectors are dropped BEFORE bucketing: every plane dot is
    # 0 >= 0, so all of them would share the all-ones bucket in every
    # table — N zero vectors generate ~N^2/2 candidate pairs there
    # before any threshold can discard them (and their cosine is
    # undefined anyway; the exact stages exclude them too)
    return (
        embeddings.select(F.col(id_col), F.col(vec_col), q)
        .where(F.expr("exists(qvec, x -> x != 0)"))
        .withColumn("__tb", F.explode(tables))
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.col("__tb.table").alias("table"),
            F.col("__tb.bucket").alias("bucket"),
        )
    )


def _cap_buckets(sigs: DataFrame, id_name: str, bucket_cap: int | None) -> DataFrame:
    """Deterministic per-(table, bucket) candidate cap: keep the
    ``bucket_cap`` lowest ids. Bounds worst-case skewed buckets (a
    near-dup pile-up collapsing into one bucket) so no single bucket can
    turn the candidate join quadratic."""
    if bucket_cap is None:
        return sigs
    w = Window.partitionBy("table", "bucket").orderBy(F.col(id_name))
    return (
        sigs.withColumn("__bn", F.row_number().over(w))
        .filter(F.col("__bn") <= bucket_cap)
        .drop("__bn")
    )


def _multi_probe(sigs: DataFrame, n_planes: int, multi_probe: int) -> DataFrame:
    """Expand each (table, bucket) row to the buckets within Hamming
    distance ``multi_probe`` (0 or 1 supported): the standard
    multi-probe LSH recall lever — only the small query side pays the
    (planes+1)× row blow-up."""
    if multi_probe <= 0:
        return sigs
    if multi_probe > 1:
        raise ValueError("multi_probe > 1 not supported (cost grows as planes^p)")
    probes = F.array(
        F.col("bucket"),
        *[F.expr(f"bucket ^ shiftleft(1L, {p})") for p in range(n_planes)],
    )
    return sigs.withColumn("bucket", F.explode(probes))


def _exact_topk_on_candidates(
    cand: DataFrame,
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    broadcast_queries: bool = True,
    max_cosine: float | None = None,
    prequantized: bool = False,
) -> DataFrame:
    """Shared ANN tail: exact cosine + per-query top-k over deduped
    candidate ``(c_id, query_id)`` ids. Vectors and squared norms are
    computed ONCE per vector and joined to the id pairs — no embedding
    arrays ride through the candidate dedup.

    ``broadcast_queries=False`` is the batched-query regime
    (:func:`ann_topk_batched`): the query side is NOT hinted, so the
    planner shuffles both sides on ``query_id`` — correct when the
    query batch is itself corpus-sized. ``max_cosine`` (exclusive)
    drops candidates at or above the threshold BEFORE ranking — the
    hard-negative regime, where near-duplicates are positives in
    disguise and must not occupy top-k slots. ``prequantized=True``
    takes frames already in ``(id_col, <vec_col>=qv, n2)`` form with
    zero-norm rows dropped (a caller that materialized the quantize
    pass once — :func:`hard_negatives`), skipping the re-derivation.

    The candidate frame is round-robin spread to the session's
    default parallelism before the score joins: each candidate row
    costs one exact 64-dim integer dot ahead, and AQE's BYTE-based
    partition coalescing is blind to that — 16-byte id pairs coalesce
    to a handful of ~minPartitionSize partitions and the compute-dense
    re-rank serializes onto a few cores (measured: the
    t_hard_negatives re-rank ran 10 tasks × 3.7 s on 32 cores while
    the planner broadcast both vector sides). A user-specified
    repartition count is never coalesced by AQE, and the extra
    exchange ships ONLY the two ids — at every scale it is dominated
    by the dot work it spreads (16 B/pair shuffled vs ~µs/pair
    scored)."""
    cand = cand.repartition(
        cand.sparkSession.sparkContext.defaultParallelism
    )
    if prequantized:
        feats = embeddings.select(
            F.col(id_col), F.col(vec_col).alias("qv"), "n2"
        )
        qfeats = queries.select(
            F.col(id_col), F.col(vec_col).alias("qv"), "n2"
        )
    else:
        # zero-norm vectors excluded (cosine undefined; see cosine_topk)
        feats = (
            _parallelize_scan(embeddings)
            .select(F.col(id_col), quantize(vec_col, "qv"))
            .withColumn("n2", F.expr(_dot("qv", "qv")))
            .where(F.col("n2") > 0)
        )
        qfeats = (
            queries.select(F.col(id_col), quantize(vec_col, "qv"))
            .withColumn("n2", F.expr(_dot("qv", "qv")))
            .where(F.col("n2") > 0)
        )
    q_side = qfeats.select(
        F.col(id_col).alias("query_id"),
        F.col("qv").alias("q_q"),
        F.col("n2").alias("q_n2"),
    )
    if broadcast_queries:
        q_side = F.broadcast(q_side)
    scored = (
        cand.join(
            feats.select(
                F.col(id_col).alias("c_id"),
                F.col("qv").alias("c_q"),
                F.col("n2").alias("c_n2"),
            ),
            on="c_id",
        )
        .join(
            q_side,
            on="query_id",
        )
        .withColumn(
            "cosine",
            F.expr(_dot("c_q", "q_q")).cast("double")
            / (
                F.sqrt(F.col("c_n2").cast("double"))
                * F.sqrt(F.col("q_n2").cast("double"))
            ),
        )
    )
    if max_cosine is not None:
        scored = scored.where(F.col("cosine") < F.lit(max_cosine))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("c_id").alias(id_col), "cosine", "rank")
    )


def ann_srp_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int | None = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    n_tables: int = 4,
    multi_probe: int = 0,
    bucket_cap: int | None = None,
    corpus_count: int | None = None,
    predicate=None,
) -> DataFrame:
    """Bucketed ANN: exact cosine top-k among SRP bucket collisions
    (candidate = same bucket in ANY of ``n_tables`` tables).

    Same output shape as :func:`cosine_topk`; recall < 1 by design
    (tests measure it against the exact baseline). The join is keyed on
    ``(table, bucket)`` — at scale this is a shuffle/bucket-pruned
    plan, not a cross product; more tables buy recall for shuffle rows.

    ``n_planes=None`` applies the :func:`auto_planes` corpus-scaled
    policy (pass ``corpus_count`` if known — e.g. from parquet footer
    metadata — to skip the count job). ``multi_probe=1`` probes all
    buckets at Hamming distance ≤1 from the query bucket;
    ``bucket_cap`` bounds per-bucket candidates (see :func:`_cap_buckets`).

    Cost shape: candidate (c_id, query_id) ids are deduped FIRST — no
    embedding arrays ride through the join or the ``distinct()`` — then
    each survivor joins the per-vector (qvec, squared-norm) computed
    ONCE per vector.
    """
    # plane policy resolves against the UNFILTERED corpus (the hash
    # family is a corpus property; a selective predicate must not
    # change bucket geometry), then the filter applies to every
    # corpus-side reference — signatures AND the exact re-rank
    n_planes = _resolve_planes(embeddings, n_planes, corpus_count)
    embeddings = _apply_predicate(embeddings, predicate)
    corpus = _cap_buckets(
        srp_signatures(embeddings, n_planes, id_col, vec_col, dims, n_tables)
        .select(F.col(id_col).alias("c_id"), "table", "bucket"),
        "c_id",
        bucket_cap,
    )
    qs = _multi_probe(
        srp_signatures(queries, n_planes, id_col, vec_col, dims, n_tables)
        .select(F.col(id_col).alias("query_id"), "table", "bucket"),
        n_planes,
        multi_probe,
    )
    cand = (
        corpus.join(F.broadcast(qs), on=["table", "bucket"], how="inner")
        .filter(F.col("c_id") != F.col("query_id"))
        .select("c_id", "query_id")
        .distinct()
    )
    return _exact_topk_on_candidates(cand, embeddings, queries, k, id_col, vec_col)


def ann_topk_batched(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    n_tables: int = 4,
    multi_probe: int = 0,
    bucket_cap: int | None = None,
    corpus_count: int | None = None,
    exclude_self: bool = True,
    predicate=None,
) -> DataFrame:
    """Batched-query ANN: SRP-bucket BOTH sides and join on
    ``(table, bucket)`` with NO broadcast of either side.

    :func:`ann_srp_topk` broadcasts the query side — right for a
    handful of interactive queries, an executor OOM when the "query"
    side is itself corpus-sized (the production RAG shape: millions of
    chunk embeddings from ``chunk_documents`` probing a document
    index). Here both signature sets shuffle ONCE on the join key, the
    candidate id pairs shuffle on ``c_id``/``query_id`` for the exact
    re-rank, and nothing is ever collected or broadcast — every stage
    is ~linear in corpus + queries. Same output shape, bucket policy
    (``auto_planes``/``bucket_cap``/``multi_probe``), and determinism
    contract as :func:`ann_srp_topk`, so the two are drop-in
    interchangeable and an identical oracle checks both.

    ``exclude_self=True`` drops candidate pairs whose ids are equal —
    correct when queries are a subset of the corpus (the self-match is
    noise). Pass ``False`` when query ids live in a DIFFERENT id space
    (chunk ids vs doc ids): an accidental id collision across spaces
    must not drop a real neighbor.
    """
    n_planes = _resolve_planes(embeddings, n_planes, corpus_count)
    embeddings = _parallelize_scan(_apply_predicate(embeddings, predicate))  # see ann_srp_topk
    corpus = _cap_buckets(
        srp_signatures(embeddings, n_planes, id_col, vec_col, dims, n_tables)
        .select(F.col(id_col).alias("c_id"), "table", "bucket"),
        "c_id",
        bucket_cap,
    )
    qs = _multi_probe(
        srp_signatures(queries, n_planes, id_col, vec_col, dims, n_tables)
        .select(F.col(id_col).alias("query_id"), "table", "bucket"),
        n_planes,
        multi_probe,
    )
    cand = corpus.join(qs, on=["table", "bucket"], how="inner")
    if exclude_self:
        cand = cand.filter(F.col("c_id") != F.col("query_id"))
    cand = cand.select("c_id", "query_id").distinct()
    return _exact_topk_on_candidates(
        cand, embeddings, queries, k, id_col, vec_col, broadcast_queries=False
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int | None = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    n_tables: int = 4,
    bucket_cap: int | None = None,
    corpus_count: int | None = None,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via SRP buckets: pairs
    colliding in any table with cosine >= threshold. Output ``(id_a,
    id_b, cosine)``, ``id_a < id_b``. Near-identical vectors collide in
    every table (all plane signs agree), so recall at high thresholds
    is ~1.

    ``n_planes=None`` applies the :func:`auto_planes` corpus-scaled
    policy (both self-join sides are the full corpus, so this is where
    fixed bucket counts hurt most — candidate pairs ~N²/2^planes);
    ``bucket_cap`` bounds skewed buckets deterministically.

    Cost shape: candidate ids are deduped FIRST (ids only — no arrays
    through the distinct), then each pair joins the per-vector
    (qvec, squared-norm) computed ONCE per vector — one dot product per
    pair instead of three (measured 42 s -> ~14 s at sf0.1)."""
    n_planes = _resolve_planes(embeddings, n_planes, corpus_count)
    if (
        min_parallelism is not None
        and embeddings.rdd.getNumPartitions() < min_parallelism
    ):
        # the SRP plane dot products and quantized norms run AT THE
        # SCAN; an under-split embeddings table (one parquet row
        # group) serializes them onto one task. Spread the raw rows
        # once — at 100 TB the file splits provide the parallelism
        # and this stays None. Row-wise → identical results.
        embeddings = embeddings.repartition(min_parallelism)
    sigs = _cap_buckets(
        srp_signatures(embeddings, n_planes, id_col, vec_col, dims, n_tables)
        .select(F.col(id_col), "table", "bucket"),
        id_col,
        bucket_cap,
    )
    a = sigs.select(F.col(id_col).alias("id_a"), "table", "bucket")
    b = sigs.select(F.col(id_col).alias("id_b"), "table", "bucket")
    cand = (
        a.join(b, on=["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _score_pairs(cand, embeddings, threshold, id_col, vec_col)


def _score_pairs(
    cand: DataFrame,
    embeddings: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """``(id_a, id_b)`` candidates -> ``(id_a, id_b, cosine)`` rows
    with cosine >= threshold — the shared exact-verify tail of every
    embedding pair generator: per-vector quantized coords + squared
    norm computed ONCE, one dot product per pair. Zero-norm vectors
    are excluded (cosine undefined; ANSI mode would error on the 0
    divisor) — every candidate source already excludes them, this is
    the belt to that suspender.

    The candidate id pairs are round-robin spread to the session's
    default parallelism before the score joins — the same rule as
    :func:`_exact_topk_on_candidates`: AQE coalesces the candidate
    stage by BYTES (16 B/pair), blind to the exact 64-dim dot each
    row costs ahead, and the compute-dense verify serializes onto a
    few cores. The id-only exchange is dominated by the dot work it
    spreads at every scale."""
    cand = cand.repartition(
        cand.sparkSession.sparkContext.defaultParallelism
    )
    feats = (
        _parallelize_scan(embeddings)
        .select(F.col(id_col), quantize(vec_col, "qv"))
        .withColumn("n2", F.expr(_dot("qv", "qv")))
        .where(F.col("n2") > 0)
    )
    scored = (
        cand.join(
            feats.select(
                F.col(id_col).alias("id_a"),
                F.col("qv").alias("qa"),
                F.col("n2").alias("na"),
            ),
            on="id_a",
        )
        .join(
            feats.select(
                F.col(id_col).alias("id_b"),
                F.col("qv").alias("qb"),
                F.col("n2").alias("nb"),
            ),
            on="id_b",
        )
        .withColumn(
            "cosine",
            F.expr(_dot("qa", "qb")).cast("double")
            / (
                F.sqrt(F.col("na").cast("double"))
                * F.sqrt(F.col("nb").cast("double"))
            ),
        )
    )
    return scored.filter(F.col("cosine") >= F.lit(threshold)).select(
        "id_a", "id_b", "cosine"
    )


# ------------------------------------------------------- semantic dedup


def semantic_dedup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_count: int | None = None,
    centroids: DataFrame | None = None,
    cell_cap: int | None = None,
) -> DataFrame:
    """SemDeDup candidate generation (Abbas et al., "SemDeDup:
    Data-efficient learning at web-scale through semantic
    deduplication", arXiv:2303.09540): embeddings partition into
    ``n_cells`` Voronoi cells around centroids; ONLY within-cell pairs
    are exactly scored, and pairs with cosine >= threshold come back
    as ``(id_a, id_b, cosine)`` with ``id_a < id_b``. SemDeDup's
    insight vs the SRP path (:func:`embedding_near_dup_pairs`): the
    comparisons a cluster-then-compare pass makes are also the ones a
    SEMANTIC threshold (0.7-0.95, paraphrases not byte-twins) needs —
    random hyperplanes at that radius need many tables for recall,
    k-means cells get it structurally.

    ``centroids=`` takes an externally trained ``(cell, cq, cn2)``
    table (:func:`train_ivf_centroids` — the paper's k-means step);
    the default is the seeded deterministic layout
    (:func:`ivf_centroids`), which keeps the operator oracle-checkable
    end to end. Zero-norm / NULL vectors pair with nothing (cosine
    undefined — the :func:`_ivf_assign` guard).

    Scale shape: assignment is a broadcast-centroid scan (linear in
    N); the self-join is keyed on ``cell`` — with cells ~ sqrt(N)
    (:func:`auto_cells`) expected within-cell pairs are ~N^1.5 total,
    never all-pairs. ``cell_cap`` deterministically bounds adversarial
    cells (lowest ids kept — the oracle mirrors it) the way
    ``bucket_cap`` bounds SRP buckets. Each id is assigned to exactly
    one cell, so candidate pairs are unique by construction — no
    distinct needed.
    """
    if centroids is not None:
        cents = centroids
    else:
        if n_cells is None:
            n = corpus_count if corpus_count is not None else embeddings.count()
            n_cells = auto_cells(n)
            corpus_count = n
        cents = ivf_centroids(embeddings, n_cells, id_col, vec_col, corpus_count)
    assign = _ivf_assign(embeddings, cents, 1, id_col, vec_col, "__sd_id")
    if cell_cap is not None:
        w = Window.partitionBy("cell").orderBy("__sd_id")
        assign = (
            assign.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= cell_cap)
            .drop("__rn")
        )
    cand = (
        assign.select(F.col("__sd_id").alias("id_a"), "cell")
        .join(assign.select(F.col("__sd_id").alias("id_b"), "cell"), on="cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    return _score_pairs(cand, embeddings, threshold, id_col, vec_col)


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_count: int | None = None,
    centroids: DataFrame | None = None,
    cell_cap: int | None = None,
    max_iter: int = 25,
    keep: str = "min_id",
) -> DataFrame:
    """SemDeDup keep/drop labels: connected components over
    :func:`semantic_dedup_pairs` edges, one canonical row per semantic
    cluster — ``(id, cluster_id, cluster_size, is_canonical)``, the
    same contract every dedup-cluster operator in this engine emits
    (``operators/dedup.py::near_dup_clusters`` does the labelling).

    ``keep`` picks the canonical (kept) member per cluster:

    * ``"min_id"`` (default) — deterministic, engine-exact, consistent
      with every other dedup canonical in the repo; the gated oracle
      checks this variant.
    * ``"centroid_far"`` — the paper's rule: keep the member with the
      LOWEST cosine to its assigned centroid (farthest from the
      cluster center retains the most diversity; arXiv:2303.09540
      §3), ties by min id. Same labels/sizes, only ``is_canonical``
      moves; one extra window over the label table.

    Unpaired docs (including zero-norm vectors, which have no defined
    centroid cosine) are singleton clusters of themselves either way.
    """
    if keep not in ("min_id", "centroid_far"):
        raise ValueError(f"keep must be min_id or centroid_far, got {keep!r}")
    from .dedup import near_dup_clusters

    if centroids is None and keep == "centroid_far":
        # both the pair stage and the keep rule need the SAME centroid
        # table; derive it once here
        if n_cells is None:
            n = corpus_count if corpus_count is not None else embeddings.count()
            n_cells = auto_cells(n)
            corpus_count = n
        centroids = ivf_centroids(
            embeddings, n_cells, id_col, vec_col, corpus_count
        )
    pairs = semantic_dedup_pairs(
        embeddings,
        threshold=threshold,
        n_cells=n_cells,
        id_col=id_col,
        vec_col=vec_col,
        corpus_count=corpus_count,
        centroids=centroids,
        cell_cap=cell_cap,
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    labels = near_dup_clusters(
        embeddings.select(id_col), pairs, id_col=id_col, max_iter=max_iter
    )
    if keep == "min_id":
        return labels
    # paper keep rule: canonical = argmin cosine-to-own-centroid
    # (NULL cosine — zero-norm singletons — sorts last, min id breaks
    # ties), replacing only the is_canonical bit
    cents = centroids.where(F.col("cn2") > 0)
    v = (
        embeddings.select(F.col(id_col), quantize(vec_col, "vq"))
        .withColumn("vn2", F.expr(_dot("vq", "vq")))
        .where(F.col("vn2") > 0)
    )
    scored = v.join(F.broadcast(cents)).withColumn(
        "__cos",
        F.expr(_dot("vq", "cq")).cast("double")
        / (
            F.sqrt(F.col("vn2").cast("double"))
            * F.sqrt(F.col("cn2").cast("double"))
        ),
    )
    w_assign = Window.partitionBy(id_col).orderBy(
        F.col("__cos").desc(), F.col("cell")
    )
    own_cos = (
        scored.withColumn("__rn", F.row_number().over(w_assign))
        .filter(F.col("__rn") == 1)
        .select(id_col, "__cos")
    )
    w_keep = Window.partitionBy("cluster_id").orderBy(
        F.asc_nulls_last("__cos"), F.col(id_col)
    )
    return (
        labels.join(own_cos, id_col, "left")
        .withColumn("__kr", F.row_number().over(w_keep))
        .select(
            F.col(id_col),
            "cluster_id",
            "cluster_size",
            F.when(F.col("__kr") == 1, 1).otherwise(0).cast("int").alias(
                "is_canonical"
            ),
        )
    )


# ---------------------------------------------------------------- IVF ANN

#: auto_cells default: IVF convention cells ~ sqrt(N) (assignment cost
#: N*cells and probe cost Q*nprobe*N/cells balance at sqrt(N)).
MAX_CELLS = 1 << 16


def auto_cells(n_rows: int, min_cells: int = 4, max_cells: int = MAX_CELLS) -> int:
    """IVF cell-count policy: ``2^round(log2(sqrt(N)))`` clamped — the
    same shape as :func:`auto_planes`: expected cell occupancy (and so
    per-probe candidate count) grows ~sqrt(N) instead of linearly the
    way a FIXED cell count would."""
    return max(min_cells, min(max_cells, 2 ** round(math.log2(max(4.0, n_rows) ** 0.5))))


def ivf_centroids(
    embeddings: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_count: int | None = None,
) -> DataFrame:
    """Deterministic seeded centroids: corpus vectors with ids
    ``{0, step, 2*step, ...}`` where ``step = N div n_cells``; cell id
    = ``vec_id div step``. K-means iterations would make the layout
    engine-dependent (and the oracle unverifiable); seeded IVF-flat is
    the deterministic degenerate case — a production deployment trains
    centroids offline (k-means||) and feeds them in as a table, which
    changes ONLY this function."""
    n = corpus_count if corpus_count is not None else embeddings.count()
    step = max(1, n // n_cells)
    return (
        embeddings.filter(
            (F.col(id_col) % step == 0) & (F.col(id_col) < step * n_cells)
        )
        .select((F.col(id_col) / step).cast("int").alias("cell"), quantize(vec_col, "cq"))
        .withColumn("cn2", F.expr(_dot("cq", "cq")))
    )


def train_ivf_centroids(
    embeddings: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    seed: int = 7,
    max_iter: int = 10,
) -> DataFrame:
    """REAL trained centroids via public ``pyspark.ml.clustering.KMeans``
    (seeded k-means||), returned in the same ``(cell, cq, cn2)`` shape
    :func:`ivf_centroids` produces — :func:`ivf_topk` consumes either
    through its ``centroids=`` parameter.

    Vectors are L2-normalized before training so Euclidean k-means
    approximates spherical (cosine) clustering; the centroid's own norm
    is irrelevant downstream because assignment is by cosine. Training
    is an offline job (production runs it periodically and feeds the
    centroid table in); the seeded variant stays the oracle-checked
    path because k-means iteration order is engine-dependent.

    Scale: k-means|| is O(iters * N * cells * d) distributed work with
    only the (cells x d) centers on the driver; for 100 TB one trains
    on a sample (``.sample(fraction)``) — centroid quality degrades
    gracefully with sampling, candidate generation does not change.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # norm computed ONCE per row (a norm inside the transform lambda
    # re-reduces the whole vector per element — interpreted HOFs hoist
    # nothing, so that spelling is O(d^2) per row); zero vectors are
    # dropped rather than fed to KMeans as 0/0 NaNs
    unit = (
        embeddings.withColumn(
            "__n2",
            F.expr(
                f"aggregate({vec_col}, 0.0d, "
                f"(acc, v) -> acc + cast(v as double) * cast(v as double))"
            ),
        )
        .where(F.col("__n2") > 0)
        .select(
            array_to_vector(
                F.expr(
                    f"transform({vec_col},"
                    f" x -> cast(x as double) / sqrt(__n2))"
                )
            ).alias("features")
        )
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(unit)
    spark = embeddings.sparkSession
    centers = local_rows(
        spark,
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, center array<double>",
    )
    return centers.select(
        "cell",
        F.expr(
            f"transform(center, x -> cast(round(x * {QUANT}.0) as bigint))"
        ).alias("cq"),
    ).withColumn("cn2", F.expr(_dot("cq", "cq")))


def _ivf_assign(
    vecs: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    id_col: str,
    vec_col: str,
    out_id: str,
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroids by exact
    cosine (centroids broadcast; ties broken by cell id). Zero-norm /
    NULL vectors and degenerate (zero-norm) centroids are EXCLUDED —
    cosine is undefined for them, and ANSI mode turns the 0-divisor
    into a query-killing error rather than an IEEE Inf (the same rule
    as cosine_topk / _exact_topk_on_candidates; the dirty-data suite
    caught the unguarded path)."""
    v = (
        vecs.select(F.col(id_col).alias(out_id), quantize(vec_col, "vq"))
        .withColumn("vn2", F.expr(_dot("vq", "vq")))
        .where(F.col("vn2") > 0)
    )
    centroids = centroids.where(F.col("cn2") > 0)
    scored = v.join(F.broadcast(centroids)).withColumn(
        "__cos",
        F.expr(_dot("vq", "cq")).cast("double")
        / (F.sqrt(F.col("vn2").cast("double")) * F.sqrt(F.col("cn2").cast("double"))),
    )
    w = Window.partitionBy(out_id).orderBy(F.col("__cos").desc(), F.col("cell"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= nprobe)
        .select(out_id, "cell")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int | None = None,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_count: int | None = None,
    centroids: DataFrame | None = None,
    predicate=None,
) -> DataFrame:
    """IVF(-flat) ANN top-k: corpus vectors are partitioned into
    ``n_cells`` Voronoi cells around seeded centroids; each query scans
    only its ``nprobe`` nearest cells. The second of the brief's two
    scale paths next to SRP-LSH (:func:`ann_srp_topk`).

    ``centroids=`` accepts an externally-built ``(cell, cq, cn2)``
    table (e.g. :func:`train_ivf_centroids`); by default the seeded
    deterministic layout is derived here. When neither ``n_cells`` nor
    ``corpus_count`` is supplied AND centroids must be derived, ONE
    ``embeddings.count()`` action runs — library callers on a large
    corpus should pass ``corpus_count`` (or ``centroids``) to keep the
    plan action-free until the final job.

    Plan shape: assignment is N x cells dot products with the (tiny)
    centroid table broadcast — linear in N, scan-side; the candidate
    join is keyed on ``cell`` (one shuffle of 8-byte ids, query side
    broadcast); exact re-rank only touches candidate vectors. Expected
    candidates per query ~ nprobe * N / cells; with
    :func:`auto_cells` (cells ~ sqrt(N)) that stays ~nprobe * sqrt(N)
    as the corpus grows. Same output shape and determinism contract as
    :func:`cosine_topk`.
    """
    if centroids is not None:
        cents = centroids
    else:
        if n_cells is None:
            n = corpus_count if corpus_count is not None else embeddings.count()
            n_cells = auto_cells(n)
            corpus_count = n
        cents = ivf_centroids(embeddings, n_cells, id_col, vec_col, corpus_count)
    # cell geometry derives from the UNFILTERED corpus (ann_srp_topk's
    # plane rule); the filter applies before assignment so only
    # qualifying vectors are assigned, joined or re-ranked
    embeddings = _parallelize_scan(_apply_predicate(embeddings, predicate))
    corpus_assign = _ivf_assign(embeddings, cents, 1, id_col, vec_col, "c_id")
    q_assign = _ivf_assign(queries, cents, nprobe, id_col, vec_col, "query_id")
    cand = (
        corpus_assign.join(F.broadcast(q_assign), on="cell", how="inner")
        .filter(F.col("c_id") != F.col("query_id"))
        .select("c_id", "query_id")
        .distinct()
    )
    return _exact_topk_on_candidates(cand, embeddings, queries, k, id_col, vec_col)


def ivf_topk_batched(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int | None = None,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_count: int | None = None,
    centroids: DataFrame | None = None,
    exclude_self: bool = True,
    predicate=None,
) -> DataFrame:
    """Batched-query IVF ANN: assign BOTH sides to cells and join on
    ``cell`` with NO broadcast of either side — the IVF twin of
    :func:`ann_topk_batched` exactly as :func:`ivf_topk` is the IVF
    twin of :func:`ann_srp_topk`.

    :func:`ivf_topk` broadcasts the per-query probe assignments —
    right for interactive queries, an executor OOM when the query side
    is itself corpus-sized (millions of chunk embeddings probing a
    document index). Here the corpus assignment (one cell per vector)
    and the query probe assignment (``nprobe`` cells per query,
    exploded) each shuffle ONCE on ``cell``; the candidate id pairs
    shuffle on ``c_id``/``query_id`` for the exact re-rank; the only
    broadcast anywhere is the O(sqrt N) centroid table inside
    ``_ivf_assign``. Every stage is ~linear in corpus + queries. Same
    output shape, cell policy and determinism contract as
    :func:`ivf_topk`, so the two are drop-in interchangeable and an
    identical oracle checks both.

    ``exclude_self`` follows :func:`ann_topk_batched`: ``True`` when
    queries are a subset of the corpus (drop the self-match), ``False``
    when query ids live in a different id space.

    Scaling law (measured): IVF-flat's centroid assignment is a LINEAR
    scan over cells, so for corpus-sized query batches the optimum
    cells ~ sqrt(N) yields total cost ~ N^1.5 — measured exponent 1.20
    at a 10x scale-up with ``auto_cells`` (a FIXED cell count measures
    1.55: per-query candidates then grow linearly). When the probe
    side scales with the corpus and linearity matters more than IVF's
    interactive latency, use :func:`ann_topk_batched` — SRP assignment
    is O(planes), and its measured exponent at the same shape is ~1.0.
    """
    if centroids is not None:
        cents = centroids
    else:
        if n_cells is None:
            n = corpus_count if corpus_count is not None else embeddings.count()
            n_cells = auto_cells(n)
            corpus_count = n
        cents = ivf_centroids(embeddings, n_cells, id_col, vec_col, corpus_count)
    embeddings = _parallelize_scan(_apply_predicate(embeddings, predicate))  # see ivf_topk
    corpus_assign = _ivf_assign(embeddings, cents, 1, id_col, vec_col, "c_id")
    q_assign = _ivf_assign(queries, cents, nprobe, id_col, vec_col, "query_id")
    cand = corpus_assign.join(q_assign, on="cell", how="inner")
    if exclude_self:
        cand = cand.filter(F.col("c_id") != F.col("query_id"))
    cand = cand.select("c_id", "query_id").distinct()
    return _exact_topk_on_candidates(
        cand, embeddings, queries, k, id_col, vec_col, broadcast_queries=False
    )


def label_centroids(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label centroid of an embedding column, one output row per
    (label, dimension) — the class-prototype computation behind
    nearest-centroid classification, cluster drift monitoring and
    label-quality audits over embedded corpora.

    Determinism design (the repo's bit-stable-doubles discipline):
    each component is fixed-pointed to integer micro-units
    (``round(v * 1e6)`` — float32→double is exact, the scale/round is
    the shared cross-engine convention, away-from-zero on both
    engines), summed in ``decimal(38,0)`` (order-independent,
    overflow-safe at any corpus size), and the centroid is ONE final
    cast+divide chain — so even the emitted doubles hash identically.

    Plan: ``posexplode`` multiplies the scan by dim (scan-side, no
    data motion), then ONE map-side-combined aggregation on
    (label, pos) — shuffle rows are |labels|·dim · partials, never
    corpus-sized. Output cardinality |labels|·dim.
    """
    micro = "CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)"
    return (
        embeddings.select(
            F.col(label_col).alias("label"),
            F.posexplode(F.col(vec_col)).alias("pos", "v"),
        )
        .groupBy("label", "pos")
        .agg(
            F.count("*").alias("n_vecs"),
            F.expr(f"sum(CAST({micro} AS DECIMAL(38,0)))").alias("__s"),
        )
        .select(
            "label",
            F.col("pos").cast("long").alias("pos"),
            "n_vecs",
            F.expr(
                "CAST(__s AS DOUBLE) / CAST(n_vecs AS DOUBLE) / 1000000.0"
            ).alias("centroid"),
        )
    )


def hard_negatives(
    embeddings: DataFrame,
    k: int = 5,
    dup_threshold: float = 0.95,
    n_planes: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    n_tables: int = 4,
    multi_probe: int = 0,
    bucket_cap: int | None = None,
    corpus_count: int | None = None,
) -> DataFrame:
    """HARD-NEGATIVE mining for contrastive/retrieval training: for
    every vector, the k MOST similar corpus vectors whose cosine is
    still below ``dup_threshold`` — similar enough to be informative
    negatives, not so similar that they are near-duplicates (those are
    positives in disguise; training on them as negatives poisons the
    embedding space — the vector-space twin of
    ``training_data.in_batch_negatives``' cluster exclusion).

    Physical shape is exactly :func:`ann_topk_batched` (every vector
    is a query, so nothing may broadcast) with the threshold filter
    applied before ranking; candidates at or above the threshold never
    occupy a top-k slot. Same bucket policy, determinism contract and
    output shape as the ANN family.

    Self-mining single-pass shape: both candidate sides AND both
    re-rank sides are the SAME corpus here, so the SRP signatures and
    the quantized (qv, n2) features are each computed ONCE and
    eagerly materialized (``localCheckpoint`` — the ``bm25_topk``
    house rule for a frame with differently-keyed consumers), then
    consumed by rename. The lazy spelling evaluated the planes x dims
    signature dots and the quantize+norm pass TWICE each (corpus +
    query branches are differently-shaped subtrees — window-capped vs
    probe-exploded — so no exchange reuse can collapse them); the
    materialized rows are 3-4 integers wide, the same bytes the
    candidate exchange ships anyway. Row-identical either way.
    """
    n_planes = _resolve_planes(embeddings, n_planes, corpus_count)
    sigs = (
        srp_signatures(embeddings, n_planes, id_col, vec_col, dims, n_tables)
        .select(F.col(id_col), "table", "bucket")
        .localCheckpoint(eager=False)
    )
    corpus = _cap_buckets(
        sigs.select(F.col(id_col).alias("c_id"), "table", "bucket"),
        "c_id",
        bucket_cap,
    )
    qs = _multi_probe(
        sigs.select(F.col(id_col).alias("query_id"), "table", "bucket"),
        n_planes,
        multi_probe,
    )
    cand = (
        corpus.join(qs, on=["table", "bucket"], how="inner")
        .filter(F.col("c_id") != F.col("query_id"))
        .select("c_id", "query_id")
        .distinct()
    )
    feats = (
        embeddings.select(F.col(id_col), quantize(vec_col, "qv"))
        .withColumn("n2", F.expr(_dot("qv", "qv")))
        .where(F.col("n2") > 0)
        .localCheckpoint(eager=False)
    )
    return _exact_topk_on_candidates(
        cand, feats, feats, k, id_col, "qv",
        broadcast_queries=False, max_cosine=dup_threshold,
        prequantized=True,
    )


# ------------------------------------------------ product quantization

def _l2sq(a: str, b: str) -> str:
    """Exact integer squared-L2 distance between two quantized
    (micro-unit BIGINT) vectors — pure integer arithmetic, so both
    engines compute the identical value; no division anywhere, so
    zero vectors are fully valid (unlike the cosine family)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
        f" 0L, (acc, v) -> acc + v)"
    )


def _pq_slice_rows(
    df: DataFrame, key_col: str, m: int, w: int, out_vec: str
) -> DataFrame:
    """Explode a ``(key, qv)`` frame into ``(key, subspace, out_vec)``
    subvector rows — the ONE spelling of the subspace slicing every PQ
    stage (codebooks, encoding, query LUTs) shares, so the slice
    boundaries can never drift between the gated queries and their
    oracles. Scan-side array ops, no shuffle."""
    subspaces = F.array(*[
        F.struct(
            F.lit(s).alias("subspace"),
            F.slice("qv", s * w + 1, w).alias(out_vec),
        )
        for s in range(m)
    ])
    return df.select(key_col, F.explode(subspaces).alias("__s")).select(
        key_col,
        F.col("__s.subspace").alias("subspace"),
        F.col(f"__s.{out_vec}").alias(out_vec),
    )


def _pq_lut(
    queries: DataFrame,
    codebooks: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    w: int,
) -> DataFrame:
    """Per-query ADC distance lookup table: exact integer squared-L2
    from each query subvector to every codebook centroid —
    ``m * n_codes`` rows per query (the classic ADC trick). The tiny
    codebook is the broadcast side of the build join."""
    qsub = _pq_slice_rows(
        queries.where(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("query_id"), quantize(vec_col, "qv")
        ),
        "query_id", m, w, "sv",
    )
    return qsub.join(F.broadcast(codebooks), on="subspace").select(
        "query_id", "subspace", "code",
        F.expr(_l2sq("sv", "cb")).alias("__d"),
    )


def _adc_rank(scored: DataFrame, k: int, id_col: str) -> DataFrame:
    """Shared ADC tail: rank ``(query_id, c_id, adc_dist)`` ascending
    by distance, ties by candidate id, keep top ``k`` — the single
    determinism contract both PQ rankers (flat and IVF-bounded) and
    their oracles pin."""
    win = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("c_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("c_id").alias(id_col),
            "adc_dist",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def pq_codebooks(
    embeddings: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    corpus_count: int | None = None,
) -> DataFrame:
    """Product-quantization codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011 — public
    algorithm): split the ``dims`` dimensions into ``m`` equal
    subspaces and give each subspace ``n_codes`` centroid subvectors.
    Output ``(subspace, code, cb)`` — ``m * n_codes`` rows, the tiny
    table everything downstream broadcasts.

    Centroids are SEEDED like :func:`ivf_centroids` (corpus vectors at
    ids ``{0, step, ...}``, ``step = N div n_codes``): k-means would be
    engine-dependent and the oracle unverifiable; a production
    deployment trains codebooks offline and feeds them in as a table,
    which changes only this function. ``n_codes`` is a FIXED quality
    knob (classic PQ uses 256 per subspace at any corpus size) — it
    scales compression, not per-row cost, so fixing it is not the
    fixed-fan-out trap the scale bench caught in n_cells/n_batches.
    """
    if dims % m:
        raise ValueError(f"m={m} must divide dims={dims}")
    w = dims // m
    n = corpus_count if corpus_count is not None else embeddings.count()
    step = max(1, n // n_codes)
    seeds = (
        embeddings.where(F.col(vec_col).isNotNull())
        .filter((F.col(id_col) % step == 0) & (F.col(id_col) < step * n_codes))
        .select(
            (F.col(id_col) / step).cast("int").alias("code"),
            quantize(vec_col, "qv"),
        )
    )
    return _pq_slice_rows(seeds, "code", m, w, "cb").select(
        "subspace", "code", "cb"
    )


def pq_encode(
    embeddings: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> DataFrame:
    """PQ-encode every vector: per subspace, the code of the nearest
    codebook subvector by exact integer squared-L2 (ties -> lowest
    code). Output ``(id, subspace, code)`` — ``log2(n_codes)`` bits of
    payload per subspace, the 10-100x compressed representation an
    ANN index stores instead of raw floats.

    Plan: subvectors slice out scan-side; the ``m * n_codes`` codebook
    broadcasts; argmin is ONE thin shuffle of ``(id, subspace)`` rows
    with map-side partial ``min(struct(dist, code))``. Nothing
    corpus-sized is ever wider than 3 integers after the scan.
    """
    if dims % m:
        raise ValueError(f"m={m} must divide dims={dims}")
    w = dims // m
    sub = _pq_slice_rows(
        embeddings.where(F.col(vec_col).isNotNull()).select(
            F.col(id_col), quantize(vec_col, "qv")
        ),
        id_col, m, w, "sv",
    )
    scored = sub.join(F.broadcast(codebooks), on="subspace").withColumn(
        "__d", F.expr(_l2sq("sv", "cb"))
    )
    return (
        scored.groupBy(id_col, "subspace")
        .agg(F.min(F.struct(F.col("__d"), F.col("code"))).alias("__m"))
        .select(id_col, "subspace", F.col("__m.code").alias("code"))
    )


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    corpus_count: int | None = None,
    rerank: int | None = None,
    predicate=None,
) -> DataFrame:
    """Asymmetric-distance (ADC) PQ top-k: queries keep their exact
    quantized subvectors; corpus vectors are represented ONLY by their
    PQ codes, and the approximate distance is the sum over subspaces
    of the exact squared-L2 between the query subvector and the coded
    centroid. Output ``(query_id, vec_id, adc_dist, rank)`` — rank
    ascending by distance, ties by candidate id, self excluded. All
    integer arithmetic: the result is bit-identical across engines.

    Scale shape: the per-query distance LOOKUP TABLE (``m * n_codes``
    entries per query — the classic ADC trick) broadcasts; the corpus
    side joins it by ``(subspace, code)`` carrying only 3-integer rows,
    and the per-(query, vector) sum is ONE map-side-combinable
    aggregate. Corpus cost is O(N * m) rows per query batch — the
    point-query/RAG-probe shape; corpus-sized query sets compose with
    IVF cells (IVF-PQ) exactly as ``ivf_topk_batched`` does for flat
    vectors, with this operator replacing the exact re-rank.
    """
    cbs = pq_codebooks(
        embeddings, m, n_codes, id_col, vec_col, dims, corpus_count
    )
    # codebooks train on the UNFILTERED corpus (the plane/cell rule:
    # a selective predicate must not move quantization geometry); the
    # filter applies before encode, so only qualifying vectors are
    # coded, scored or re-ranked
    embeddings = _parallelize_scan(
        _apply_predicate(embeddings, predicate)
    )
    codes = pq_encode(embeddings, cbs, m, id_col, vec_col, dims)
    lut = _pq_lut(queries, cbs, id_col, vec_col, m, dims // m)
    scored = (
        codes.join(F.broadcast(lut), on=["subspace", "code"])
        .where(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", F.col(id_col).alias("c_id"))
        .agg(F.sum("__d").alias("adc_dist"))
    )
    if rerank is None:
        return _adc_rank(scored, k, id_col)
    # production PQ shape: ADC shortlists `rerank` candidates, exact
    # cosine re-ranks them. Pure ADC recall is TIE-limited — every
    # vector coded identically to the true neighbor has the same
    # distance (measured recall@5 ~0.16 on clustered data because
    # whole clusters share codes; ties break by id), and the exact
    # re-rank over the tie pool restores it (~1.0 measured). Output
    # shape matches the ANN family: (query_id, vec_id, cosine, rank);
    # zero-norm candidates drop at the re-rank (cosine undefined),
    # same contract as ivf_topk/ann_srp_topk.
    cand = _adc_rank(scored, rerank, id_col).select(
        F.col(id_col).alias("c_id"), "query_id"
    )
    return _exact_topk_on_candidates(
        cand, embeddings, queries, k, id_col, vec_col
    )


def ivf_pq_topk_batched(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    n_codes: int = 16,
    n_cells: int | None = None,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    corpus_count: int | None = None,
    rerank: int | None = None,
    predicate=None,
) -> DataFrame:
    """IVF-PQ for corpus-sized query batches — the composition the flat
    operators promise, shipped as code: IVF cells bound WHICH vectors a
    query compares against (both sides assigned and shuffle-joined on
    ``cell``, nothing corpus-sized broadcasts — the
    :func:`ivf_topk_batched` shape), and PQ ADC distances replace the
    exact re-rank (candidates carry 3-integer code rows instead of raw
    vectors — the :func:`pq_topk` shape). This is the classic
    billion-scale ANN index layout (IVF-PQ, Jégou et al. 2011): probe
    cost bounded by cells, memory bounded by codes.

    ``rerank=None`` output: ``(query_id, vec_id, adc_dist, rank)``
    over probed-cell candidates, ranked ascending by the integer ADC
    distance, ties by candidate id, self excluded — deterministic, so
    the composed DuckDB oracle checks it end to end.

    ``rerank=R`` is the PRODUCTION shape (same contract as
    :func:`pq_topk`): the ADC ranking shortlists ``R`` candidates per
    query, then exact quantized cosine re-ranks the shortlist —
    output ``(query_id, vec_id, cosine, rank)``. Pure ADC recall is
    tie-limited (identically coded vectors share a distance; measured
    recall@5 ~0.16 on clustered data vs ~1.0 re-ranked), and the
    re-rank stage pays only O(R) raw-vector joins per query — the one
    place full-width vectors re-enter the plan, bounded by the
    shortlist, never the cell. Query vectors are NOT broadcast in the
    re-rank (the query batch is corpus-sized by contract here);
    zero-norm candidates drop at the re-rank, the ANN-family rule.

    Plan: the O(sqrt N) centroid table and the m*n_codes codebook are
    the ONLY broadcasts; candidates join codes on ``c_id`` and the
    per-query lookup table on ``(query_id, subspace, code)`` — every
    corpus-sized row in flight is 3-4 integers wide until the bounded
    re-rank joins raw vectors for shortlisted candidates only.
    """
    if n_cells is None:
        n = corpus_count if corpus_count is not None else embeddings.count()
        n_cells = auto_cells(n)
        corpus_count = n
    cents = ivf_centroids(embeddings, n_cells, id_col, vec_col, corpus_count)
    cbs = pq_codebooks(
        embeddings, m, n_codes, id_col, vec_col, dims, corpus_count
    )
    # cells + codebooks derive from the UNFILTERED corpus (see
    # pq_topk); the filter applies before assignment and encode
    embeddings = _parallelize_scan(_apply_predicate(embeddings, predicate))
    corpus_assign = _ivf_assign(embeddings, cents, 1, id_col, vec_col, "c_id")
    q_assign = _ivf_assign(queries, cents, nprobe, id_col, vec_col, "query_id")
    cand = (
        corpus_assign.join(q_assign, on="cell", how="inner")
        .filter(F.col("c_id") != F.col("query_id"))
        .select("c_id", "query_id")
        .distinct()
    )
    codes = pq_encode(embeddings, cbs, m, id_col, vec_col, dims).select(
        F.col(id_col).alias("c_id"), "subspace", "code"
    )
    # per-query distance lookup table: Q * m * n_codes rows — NOT
    # broadcast (the query side is corpus-sized by contract here);
    # the tiny codebook is the broadcast side of its build join
    lut = _pq_lut(queries, cbs, id_col, vec_col, m, dims // m)
    scored = (
        cand.join(codes, on="c_id")
        .join(lut, on=["query_id", "subspace", "code"])
        .groupBy("query_id", "c_id")
        .agg(F.sum("__d").alias("adc_dist"))
    )
    if rerank is None:
        return _adc_rank(scored, k, id_col)
    shortlist = _adc_rank(scored, rerank, id_col).select(
        F.col(id_col).alias("c_id"), "query_id"
    )
    return _exact_topk_on_candidates(
        shortlist, embeddings, queries, k, id_col, vec_col,
        broadcast_queries=False,
    )
