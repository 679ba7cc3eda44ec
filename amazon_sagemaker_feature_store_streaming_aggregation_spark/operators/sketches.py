"""Deterministic approximate-aggregation sketches (KMV, Count-Min).

Production Spark answers "approximately how many distinct / how
frequent" with ``approx_count_distinct`` (HyperLogLog++) and
``count_min_sketch`` — both JVM builtins whose binary state no
external engine reproduces, so neither can be *oracle-checked*.
These operators implement the same two sketch families on top of the
repo's md5-derived 60-bit hash (``functions/hashing.h64``), making
every estimate a deterministic function of the input that DuckDB
recomputes bit-for-bit.  The point is the *distributed shape* of a
sketch pipeline — what gets shuffled is the sketch domain (8-byte
hashes, (row,bucket) cells), never the raw data:

* **KMV** (k-minimum-values) distinct estimator: keep the ``k``
  smallest normalized hash values per group; with ``u_k`` the k-th
  smallest as a fraction of hash space, ``est = (k-1)/u_k``
  (Bar-Yossef et al., "Counting distinct elements in a data stream",
  RANDOM 2002). Groups with fewer than ``k`` distinct values are
  exact by construction.
* **Count-Min** heavy hitters: a ``d × w`` counter grid, cell
  ``(i, h_i(x) mod w)`` summed per row; the estimate for any item is
  the min over its ``d`` cells (Cormode & Muthukrishnan, J.Alg 2005
  — always an over-estimate, biased by collisions).

The reference has no sketch operators (SURVEY §2.7 lists no
approximate aggregation at all); these extend the LLM-pipeline layer
where 100 TB corpora make exact distinct/frequency passes a luxury.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from ..functions.hashing import h64

#: 2^60 — the h64 hash space, for normalizing hashes to (0, 1].
HASH_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    group: str,
    value: Column | str,
    k: int = 32,
    est_col: str = "est_distinct",
) -> DataFrame:
    """Per-``group`` KMV distinct-count estimate of ``value``.

    Output: ``(group, n_kept, est_distinct)`` where ``n_kept`` =
    min(k, exact distinct) — the sketch size actually retained.

    Distributed shape: the only shuffle carries *distinct (group,
    hash) pairs* (8-byte hashes, map-side-combined by the groupBy),
    never the values themselves; the per-group sort ranks at most the
    distinct hashes. A production variant would pre-trim to
    per-partition k-mins before the shuffle (the sketch's merge is
    "union then keep k smallest"), which this plan's groupBy already
    approximates for low-cardinality groups.
    """
    v = F.col(value) if isinstance(value, str) else value
    # null values are excluded (COUNT DISTINCT semantics): a null
    # hashes to null, which Spark's ascending sort ranks FIRST — it
    # would occupy rank 1 and shift every real hash's rank, corrupting
    # both n_kept and the u_k pick.
    hashes = (
        df.select(F.col(group), h64(v.cast("string")).alias("__h"))
        .where(F.col("__h").isNotNull())
        .distinct()
    )
    rn = F.row_number().over(Window.partitionBy(group).orderBy("__h"))
    ranked = hashes.select(group, "__h", rn.alias("__rn")).where(
        F.col("__rn") <= k
    )
    # u_k normalized to (0,1]; fixed IEEE sequence: cast -> divide.
    u_k = F.max(F.when(F.col("__rn") == k, F.col("__h"))).cast(
        "double"
    ) / F.lit(HASH_SPACE)
    n_kept = F.max("__rn")
    return ranked.groupBy(group).agg(
        n_kept.alias("n_kept"),
        F.when(n_kept < k, n_kept.cast("double"))
        .otherwise(F.lit(float(k - 1)) / u_k)
        .alias(est_col),
    )


def cms_sketch(
    tokens: DataFrame,
    item: str = "w",
    depth: int = 4,
    width: int = 1024,
    seed_prefix: str = "cms",
) -> DataFrame:
    """Build the Count-Min counter grid over a token column.

    Output: ``(i, bucket, c)`` — ``depth × width`` cells at most.
    One shuffle of (i, bucket) pairs with map-side partial counts;
    the grid size is a constant regardless of corpus size, which is
    the entire point of the sketch at 100 TB.
    """
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    (
                        h64(F.concat(F.lit(f"{seed_prefix}{i}:"), F.col(item)))
                        % width
                    ).alias("bucket"),
                )
                for i in range(depth)
            ]
        )
    )
    return (
        tokens.select(cells.alias("__c"))
        .select("__c.i", "__c.bucket")
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    item: str = "w",
    depth: int = 4,
    width: int = 1024,
    seed_prefix: str = "cms",
    est_col: str = "cms_est",
) -> DataFrame:
    """Point-query the sketch for each candidate item.

    ``est = min_i grid[i][h_i(item) mod width]`` — the candidate set
    is expanded ``depth``-fold (tiny), the grid is broadcast, and the
    min folds back per item. Adds ``est_col`` to ``candidates``.
    """
    probes = candidates.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        (
                            h64(
                                F.concat(
                                    F.lit(f"{seed_prefix}{i}:"), F.col(item)
                                )
                            )
                            % width
                        ).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("__p"),
    ).select("*", "__p.i", "__p.bucket")
    keep = [c for c in candidates.columns]
    # LEFT join + coalesce-to-0: a grid cell absent from the sketch IS
    # a zero counter. An inner join would drop absent cells, so an
    # item the corpus never contained would take min() over only its
    # colliding cells (an overestimate) — or vanish from the output
    # entirely when all d cells are empty — instead of the correct
    # CMS answer est=0.
    return (
        probes.join(F.broadcast(sketch), on=["i", "bucket"], how="left")
        .groupBy(*keep)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias(est_col))
    )


def cms_heavy_hitters(
    df: DataFrame,
    text: str = "text",
    top_n: int = 20,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Top-``top_n`` words by exact count, annotated with their
    Count-Min estimate (always ≥ exact; equality means no collision).

    Candidate selection is a distributed TakeOrdered (``orderBy +
    limit`` — no single-partition window), deterministically
    tie-broken by the word itself.  Output: ``(w, exact_cnt,
    cms_est)``.
    """
    toks = df.select(
        F.explode(F.split(F.col(text), " ")).alias("w")
    ).where(F.col("w") != "")
    exact = toks.groupBy("w").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), F.asc("w")).limit(top_n)
    sketch = cms_sketch(toks, item="w", depth=depth, width=width)
    return cms_estimate(
        top, sketch, item="w", depth=depth, width=width
    )
