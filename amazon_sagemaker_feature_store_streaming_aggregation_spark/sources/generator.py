"""Synthetic transaction-dataset generator (reference G1-G5).

Spark-native re-expression of
``notebooks/0_prepare_transactions_dataset.ipynb``: 10 K unique card
numbers (G1, ``:239-259``), N uniform sorted timestamps over a date
span (G2, ``:321-330``), 5-bucket mixture-distribution amounts (G3,
``:413-434``), md5-derived transaction ids (G4, ``:522-525``) and
injected fraud chains — 0.25 % of transactions in bursts of 3-10 on a
single card spaced 30-120 s apart (G5, ``:609-812``).

Everything is ``spark.range`` + column expressions: no driver-side
loops, no Python UDFs, deterministic under a fixed seed and partition
count (``rand(seed)`` streams are per-partition deterministic), so the
same (seed, n, partitions) always yields the same table — at any scale
up to the reference's 5.4 M rows and far beyond.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VISA_PREFIX = 4_000_000_000_000_000  # 16-digit, leading 4 (G1)


def gen_cards(spark: SparkSession, n_cards: int = 10_000) -> DataFrame:
    """G1: ``n_cards`` unique 16-digit card numbers.

    Uniqueness by construction (sequential ids scrambled into the low
    digits) rather than Faker rejection sampling — same invariant the
    reference asserts (10 K unique, 16 digits)."""
    return spark.range(n_cards).select(
        (F.lit(VISA_PREFIX) + F.col("id") * 17 + 11).alias("cc_num")
    )


def gen_transactions(
    spark: SparkSession,
    n: int = 5_400_000,
    n_cards: int = 10_000,
    start: str = "2020-01-01",
    end: str = "2020-06-01",
    seed: int = 123,
    partitions: int = 32,
) -> DataFrame:
    """G2-G4: uniform sorted timestamps, mixture amounts, md5 tids.

    Amount mixture (G3): 5 % [0.01,1], 7.5 % [1,11], 52.5 % [10,100],
    25 % [100,1000], 10 % [1000,10000] — cumulative rand() buckets.
    """
    start_s = F.unix_timestamp(F.to_timestamp(F.lit(start)))
    span_s = F.unix_timestamp(F.to_timestamp(F.lit(end))) - start_s
    # Materialize every random draw ONCE per row first: rand() is
    # nondeterministic, so each textual occurrence in a projection is
    # re-evaluated independently — referencing one Column object from
    # several expressions silently draws fresh numbers.
    base = spark.range(0, n, 1, partitions).select(
        F.rand(seed).alias("u_ts"),
        F.rand(seed + 1).alias("u_amt"),
        F.rand(seed + 2).alias("u_card"),
    )
    u_amt = F.col("u_amt")
    amount = (
        F.when(u_amt < 0.05, F.lit(0.01) + u_amt / 0.05 * 0.99)
        .when(u_amt < 0.125, F.lit(1.0) + (u_amt - 0.05) / 0.075 * 10.0)
        .when(u_amt < 0.65, F.lit(10.0) + (u_amt - 0.125) / 0.525 * 90.0)
        .when(u_amt < 0.90, F.lit(100.0) + (u_amt - 0.65) / 0.25 * 900.0)
        .otherwise(F.lit(1000.0) + (u_amt - 0.90) / 0.10 * 9000.0)
    )
    tx = base.select(
        F.timestamp_seconds(
            start_s + (F.col("u_ts") * span_s).cast("long")
        ).alias("datetime"),
        (
            F.lit(VISA_PREFIX)
            + (F.col("u_card") * n_cards).cast("long") * 17
            + 11
        ).alias("cc_num"),
        F.round(amount, 2).alias("amount"),
        F.lit(0).alias("fraud_label"),
    )
    return tx.withColumn(
        "tid",
        F.md5(
            F.concat_ws(
                "", F.col("datetime").cast("string"), F.col("cc_num"), F.col("amount")
            )
        ),
    ).select("tid", "datetime", "cc_num", "amount", "fraud_label")


def inject_fraud_chains(
    tx: DataFrame,
    fraud_rate: float = 0.0025,
    min_chain: int = 3,
    max_chain: int = 10,
    min_gap_s: int = 30,
    max_gap_s: int = 120,
    seed: int = 123,
) -> DataFrame:
    """G5: replace ~``fraud_rate`` of rows with fraud-burst chains.

    Seed rows are sampled and REPLACED: each seed explodes into a 3-10
    transaction chain on its card spaced 30-120 s apart, labeled
    ``fraud_label=1``; the seed's original clean row is anti-joined out
    before the union (no ``fraud_label=0`` duplicate remains at the
    chain's start timestamp). Mean chain length (min+max)/2 sizes the
    number of seeds so the injected-row share ≈ fraud_rate — the
    reference's own accounting (``0_…ipynb:609-611``).
    """
    mean_chain = (min_chain + max_chain) / 2.0
    seed_frac = fraud_rate / mean_chain
    seeds = tx.filter(F.rand(seed + 10) < seed_frac)
    chains = (
        seeds.withColumn(
            "__len",
            (F.lit(min_chain) + (F.rand(seed + 11) * (max_chain - min_chain + 1)).cast("int")),
        )
        # per-chain gap drawn BEFORE the explode: one draw per chain,
        # keeps the burst monotonic (step i lands at i * gap)
        .withColumn(
            "__gap",
            # +1 so the documented max gap is actually drawable
            # (rand() < 1.0, so without it the range was [min, max-1])
            F.lit(min_gap_s)
            + (F.rand(seed + 12) * (max_gap_s - min_gap_s + 1)).cast("int"),
        )
        .withColumn("__i", F.explode(F.sequence(F.lit(0), F.col("__len") - 1)))
        .withColumn(
            "datetime",
            F.timestamp_seconds(
                F.unix_timestamp("datetime") + F.col("__i") * F.col("__gap")
            ),
        )
        .withColumn("amount", F.round(F.lit(1.0) + F.rand(seed + 13) * 99.0, 2))
        .withColumn("fraud_label", F.lit(1))
        .withColumn(
            "tid",
            F.md5(F.concat_ws("", "datetime", "cc_num", "amount", "__i")),
        )
        .select("tid", "datetime", "cc_num", "amount", "fraud_label")
    )
    # drop the replaced seed rows (broadcast anti-join on tid: the seed
    # side is ~fraud_rate/mean_chain of the corpus, always tiny)
    clean = tx.join(F.broadcast(seeds.select("tid")), on="tid", how="left_anti")
    return clean.unionByName(chains)
