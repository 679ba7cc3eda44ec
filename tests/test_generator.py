"""Generator invariants (reference 0_prepare_transactions_dataset
inline assertions, SURVEY.md §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources.generator import (
    gen_cards,
    gen_transactions,
    inject_fraud_chains,
)


def test_cards_unique_16_digits(spark):
    cards = gen_cards(spark, 10_000)
    assert cards.distinct().count() == 10_000
    bounds = cards.agg(F.min("cc_num"), F.max("cc_num")).first()
    assert len(str(bounds[0])) == 16 and len(str(bounds[1])) == 16


def test_transactions_shape_and_determinism(spark):
    tx1 = gen_transactions(spark, n=20_000, n_cards=100, partitions=8)
    tx2 = gen_transactions(spark, n=20_000, n_cards=100, partitions=8)
    assert tx1.count() == 20_000
    # deterministic under fixed (seed, n, partitions)
    assert tx1.exceptAll(tx2).count() == 0
    r = tx1.agg(
        F.min("datetime"), F.max("datetime"), F.min("amount"), F.max("amount")
    ).first()
    assert str(r[0]) >= "2020-01-01" and str(r[1]) < "2020-06-01"
    assert r[2] >= 0.01 and r[3] <= 10_000.0


def test_amount_mixture_buckets(spark):
    tx = gen_transactions(spark, n=50_000, n_cards=100, partitions=8)
    frac = (
        tx.select(
            F.avg((F.col("amount") < 10.0).cast("double")).alias("low"),
            F.avg((F.col("amount") >= 1000.0).cast("double")).alias("high"),
        ).first()
    )
    # ~12.5% below $10 (buckets 1+2 — the $10-100 bucket starts at 10),
    # ~10% at $1000+; generous tolerance for sampling noise
    assert 0.08 < frac["low"] < 0.18
    assert 0.07 < frac["high"] < 0.13


def test_fraud_injection_rate_and_chains(spark):
    tx = gen_transactions(spark, n=100_000, n_cards=500, partitions=8)
    out = inject_fraud_chains(tx)
    total = out.count()
    fraud = out.filter("fraud_label = 1")
    n_fraud = fraud.count()
    rate = n_fraud / total
    assert 0.001 < rate < 0.006, rate  # target 0.25%

    # chains: per card, consecutive fraud tx spaced 30-120s apart
    w = fraud.select("cc_num", "datetime").orderBy("cc_num", "datetime")
    rows = w.collect()
    gaps = []
    for a, b in zip(rows, rows[1:]):
        if a["cc_num"] == b["cc_num"]:
            gaps.append((b["datetime"] - a["datetime"]).total_seconds())
    in_band = [g for g in gaps if 30 <= g <= 120 * 9]
    assert len(in_band) >= 0.9 * len(gaps)


def test_fraud_seeds_replaced_not_duplicated(spark):
    """G5 accounting: a chain REPLACES its seed row — no fraud_label=0
    twin may survive at the chain's start (cc_num, datetime)."""
    tx = gen_transactions(spark, n=20_000, n_cards=200, partitions=4)
    out = inject_fraud_chains(tx, fraud_rate=0.01)
    starts = (
        out.filter("fraud_label = 1")
        .groupBy("cc_num")
        .agg(F.min("datetime").alias("datetime"))
    )
    dupes = (
        out.filter("fraud_label = 0")
        .join(starts, on=["cc_num", "datetime"])
        .count()
    )
    assert dupes == 0
