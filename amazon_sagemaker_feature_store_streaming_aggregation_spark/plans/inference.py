"""Inference enrichment pipeline (reference I1-I11).

Reference ``src/lambda/InvokeFraudEndpointLambda/lambda_function.py``:
per incoming transaction, point-lookup the streaming (10-min) and batch
(1-week) feature groups, zero-fill missing keys, zero the 10-minute
aggregates when staler than 600 s, compute guarded ratio features,
assemble the model feature vector, score, threshold.

Spark-first: the per-event ``get_record`` RPCs become ONE stream-static
(or batch) **broadcast left equi-join** per feature table — the feature
tables are small keyed dimensions (10 K cards in the reference), so the
join ships the dimension to every executor and never shuffles the event
stream. ``F.broadcast`` makes that explicit rather than relying on the
autoBroadcastJoinThreshold. All guards are Catalyst ``when()`` column
expressions (codegen, no UDFs).

At 100 TB: the event side stays un-shuffled (narrow plan); if a feature
table outgrows broadcast size, drop the hint and let AQE pick a shuffled
hash join keyed on ``cc_num`` — the code path is identical.

LONG-RUNNING STREAMING CAVEAT: in a standing ``writeStream`` query a
stream-static join's static side is PLAN-FROZEN at query start — the
broadcast feature tables never refresh, so after ``staleness_s`` every
row silently trips the cutoff and scores on amount alone. A continuous
deployment must route the dimension through
``streaming/enrich.py::start_refreshed_dim_enrich`` (per-micro-batch
re-read, fresh broadcast each batch); the joins here are correct for
batch replays and ``availableNow`` runs, which is how the gated queries
and tests drive them.

Key-uniqueness precondition: both feature tables must be keyed (at
most one row per ``cc_num``) — the contract ``FeatureGroup.get_latest``
and ``latest_per_key(keep_ties=False)`` provide. A duplicate key fans
each transaction into multiple scored rows (the reference's point
``get_record`` cannot return two records).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from ..operators.ratios import with_guarded_inference_ratios

#: Reference staleness bound (``lambda_function.py:17``).
TEN_MINUTES_IN_SEC = 600


def enrich_transactions(
    tx: DataFrame,
    features_10m: DataFrame,
    features_1w: DataFrame,
    now: Column,
    staleness_s: int = TEN_MINUTES_IN_SEC,
    key: str = "cc_num",
    join_strategy: str = "broadcast",
) -> DataFrame:
    """I3-I7: two keyed left joins + staleness + guarded ratios.

    ``tx`` columns: ``(cc_num, amount, trans_ts, ...)``.
    ``features_10m``: ``(cc_num, num_trans_last_10m, avg_amt_last_10m,
    trans_time)`` — the online 10-minute aggregates with their ingest
    time. ``features_1w``: ``(cc_num, num_trans_last_1w,
    avg_amt_last_1w)``. ``now`` is the evaluation clock as a column
    (``F.current_timestamp()`` in production; a fixed literal for
    deterministic replay/tests).

    Missing 10-min key -> zero-filled defaults (``lambda_function.py:
    113-118``); record staler than ``staleness_s`` -> 10-min aggregates
    zeroed AND ratios forced to 0.0 (``:137-146,215-227``).

    ``join_strategy``: ``'broadcast'`` (the reference regime — 10 K
    cards ship to every task, the event side never shuffles) or
    ``'shuffle_hash'`` — the 100×-dim regime where the feature table
    outgrows broadcast: both sides hash-partition on the key and each
    partition builds a hash map of ONLY its dimension slice (no
    cluster-wide replication, no per-partition sort — a sort-merge
    join would sort the giant probe side for nothing). Results are
    identical; only the physical strategy moves (both pinned in
    tests/test_plans.py).
    """
    f10 = features_10m.select(
        key, "num_trans_last_10m", "avg_amt_last_10m", "trans_time"
    )
    f1w = features_1w.select(key, "num_trans_last_1w", "avg_amt_last_1w")
    if join_strategy == "broadcast":
        f10, f1w = F.broadcast(f10), F.broadcast(f1w)
    elif join_strategy == "shuffle_hash":
        f10, f1w = f10.hint("SHUFFLE_HASH"), f1w.hint("SHUFFLE_HASH")
    else:
        raise ValueError(f"unknown join_strategy: {join_strategy!r}")

    joined = tx.join(f10, on=key, how="left").join(f1w, on=key, how="left")

    # microsecond-exact staleness (integer unix_micros diff — no
    # truncation, no IEEE concerns): the reference compares FLOAT time
    # diffs (lambda_function.py eval_cutoff_window), so a record
    # 600.4 s old is stale — unix_timestamp()'s whole-second
    # truncation would serve it as fresh. DuckDB twin: epoch_us().
    stale = (
        F.col("trans_time").isNull()
        | (
            (
                F.unix_micros(now.cast("timestamp"))
                - F.unix_micros(F.col("trans_time").cast("timestamp"))
            )
            > F.lit(staleness_s) * F.lit(1_000_000)
        )
    )
    joined = (
        joined.withColumn("is_stale_10m", stale)
        .withColumn(
            "num_trans_last_10m",
            F.when(stale, F.lit(0)).otherwise(
                F.coalesce(F.col("num_trans_last_10m"), F.lit(0))
            ),
        )
        .withColumn(
            "avg_amt_last_10m",
            F.when(stale, F.lit(0.0)).otherwise(
                F.coalesce(F.col("avg_amt_last_10m"), F.lit(0.0))
            ),
        )
        .withColumn(
            "num_trans_last_1w", F.coalesce(F.col("num_trans_last_1w"), F.lit(0))
        )
        .withColumn(
            "avg_amt_last_1w", F.coalesce(F.col("avg_amt_last_1w"), F.lit(0.0))
        )
    )
    return with_guarded_inference_ratios(joined, invalid=F.col("is_stale_10m"))


def assemble_features_csv(
    df: DataFrame,
    cols: tuple[str, ...] = ("amount", "amt_ratio1", "amt_ratio2", "count_ratio"),
    out: str = "features_csv",
) -> DataFrame:
    """I7: comma-joined feature string (reference ``assemble_features``,
    ``lambda_function.py:193-212``).

    Each column is str()-joined exactly as the reference does — a NULL
    feature renders as ``'None'`` so the CSV ALWAYS has ``len(cols)``
    fields. ``concat_ws`` alone silently DROPS null columns, producing
    a shorter string whose downstream parse shifts every later feature
    into the wrong position with no error.
    """
    rendered = [
        F.coalesce(F.col(c).cast("string"), F.lit("None")) for c in cols
    ]
    return df.withColumn(out, F.concat_ws(",", *rendered))


def threshold_classify(
    df: DataFrame,
    probability_col: str = "probability",
    threshold: float = 0.25,
    out: str = "prediction",
) -> DataFrame:
    """I9: ``probability > 0.25 -> 'FRAUD' else 'NOT FRAUD'`` (threshold
    from ``templates/sagemaker-featurestore-template.yaml:289``).

    A NULL probability (an unscored row — see ``scoring.score``'s
    null-feature routing) yields a NULL prediction, NOT 'NOT FRAUD':
    failing open would silently clear a transaction nobody scored
    (the reference's ``probability > float(...)`` raises on None).
    """
    p = F.col(probability_col)
    return df.withColumn(
        out,
        F.when(p > F.lit(threshold), F.lit("FRAUD"))
        .when(p.isNotNull(), F.lit("NOT FRAUD")),
    )


def latency_metric(df: DataFrame, event_ts: str = "trans_ts", now: Column | None = None) -> DataFrame:
    """I11: per-event end-to-end latency column (``lambda_function.py:102-107``).

    Fractional seconds (timestamp->double), matching the reference's
    float time diff — a freshness SLO measured in whole seconds would
    hide up to 1 s of real latency.
    """
    clock = now if now is not None else F.current_timestamp()
    return df.withColumn(
        "latency_sec",
        (
            F.unix_micros(clock.cast("timestamp"))
            - F.unix_micros(F.col(event_ts).cast("timestamp"))
        )
        / F.lit(1_000_000.0),
    )
