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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1_000_000


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


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: for each query vector, the k most
    similar corpus vectors (excluding itself), ties broken by vec_id.

    Output: ``(query_id, vec_id, cosine, rank)``. The query side is
    broadcast (small by construction); the corpus scan stays narrow.
    """
    corpus = embeddings.select(
        F.col(id_col).alias("c_id"), quantize(vec_col, "c_q")
    ).withColumn("c_n2", F.expr(_dot("c_q", "c_q")))
    qs = queries.select(
        F.col(id_col).alias("query_id"), quantize(vec_col, "q_q")
    ).withColumn("q_n2", F.expr(_dot("q_q", "q_q")))

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
    return (
        embeddings.select(F.col(id_col), F.col(vec_col), q)
        .withColumn("__tb", F.explode(tables))
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.col("__tb.table").alias("table"),
            F.col("__tb.bucket").alias("bucket"),
        )
    )


def ann_srp_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    n_tables: int = 4,
) -> DataFrame:
    """Bucketed ANN: exact cosine top-k among SRP bucket collisions
    (candidate = same bucket in ANY of ``n_tables`` tables).

    Same output shape as :func:`cosine_topk`; recall < 1 by design
    (tests measure it against the exact baseline). The join is keyed on
    ``(table, bucket)`` — at scale this is a shuffle/bucket-pruned
    plan, not a cross product; more tables buy recall for shuffle rows.
    """
    corpus = srp_signatures(
        embeddings, n_planes, id_col, vec_col, dims, n_tables
    ).select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"), "table", "bucket")
    qs = srp_signatures(
        queries, n_planes, id_col, vec_col, dims, n_tables
    ).select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "table", "bucket")
    joined = (
        corpus.join(F.broadcast(qs), on=["table", "bucket"], how="inner")
        .filter(F.col("c_id") != F.col("query_id"))
        .select("c_id", "c_vec", "query_id", "q_vec")
        .distinct()
    )
    scored = (
        joined.withColumn("c_q", quantize("c_vec", "c_q"))
        .withColumn("q_q", quantize("q_vec", "q_q"))
        .withColumn(
            "cosine",
            F.expr(_dot("c_q", "q_q")).cast("double")
            / (
                F.sqrt(F.expr(_dot("c_q", "c_q")).cast("double"))
                * F.sqrt(F.expr(_dot("q_q", "q_q")).cast("double"))
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("c_id").alias(id_col), "cosine", "rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    n_tables: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via SRP buckets: pairs
    colliding in any table with cosine >= threshold. Output ``(id_a,
    id_b, cosine)``, ``id_a < id_b``. Near-identical vectors collide in
    every table (all plane signs agree), so recall at high thresholds
    is ~1.

    Cost shape: candidate ids are deduped FIRST (ids only — no arrays
    through the distinct), then each pair joins the per-vector
    (qvec, squared-norm) computed ONCE per vector — one dot product per
    pair instead of three (measured 42 s -> ~14 s at sf0.1)."""
    sigs = srp_signatures(embeddings, n_planes, id_col, vec_col, dims, n_tables)
    a = sigs.select(F.col(id_col).alias("id_a"), "table", "bucket")
    b = sigs.select(F.col(id_col).alias("id_b"), "table", "bucket")
    cand = (
        a.join(b, on=["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    feats = embeddings.select(F.col(id_col), quantize(vec_col, "qv")).withColumn(
        "n2", F.expr(_dot("qv", "qv"))
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
