"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` pair every implemented operator from
SURVEY.md §2 with a DuckDB-checkable ANSI-SQL twin at sf0.01.

Hash-stability convention: floating-point aggregates are computed
bit-deterministically in BOTH engines — amounts quantized to integer
cents, window SUM over longs (exact, order-independent), averages and
ratios derived with the identical sequence of IEEE-754 double ops — so
value hashes compare exactly without any rounding fuzz
(see operators/window_agg.py::trailing_window_features_exact).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
    agg_features_query,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import (
    batch_feature_records,
    train_prep,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import (
    load_transactions,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
    read_event_stream,
    sliding_agg_exact,
)

from entry_ext import ext_oracles, ext_queries

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship E1 window-aggregation query on /root/testdata/sf0.001."""
    return agg_features_query(load_transactions(spark, SF0001))


# --------------------------------------------------------------------------
# Shared oracle scaffolding: the E1 windowed CTE over the events table.
# epoch_us ordering + integer-cent sums make every double a fixed IEEE-op
# sequence over identical inputs in both engines (bit-equal, no rounding).
# --------------------------------------------------------------------------

_ORACLE_WINDOWED = """
WITH transactions AS (
  SELECT event_id AS tid, ts AS datetime, user_id AS cc_num, value AS amount,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS fraud_label,
         CAST(round(value * 100) AS BIGINT) AS amt_cents
  FROM events
), windowed AS (
  SELECT tid, datetime, cc_num, amount, fraud_label,
         COUNT(*) OVER w10 AS num_trans_last_10m,
         (CAST(SUM(amt_cents) OVER w10 AS DOUBLE) / 100.0)
           / COUNT(*) OVER w10 AS avg_amt_last_10m,
         COUNT(*) OVER w1w AS num_trans_last_1w,
         (CAST(SUM(amt_cents) OVER w1w AS DOUBLE) / 100.0)
           / COUNT(*) OVER w1w AS avg_amt_last_1w
  FROM transactions
  WINDOW
    w10 AS (PARTITION BY cc_num ORDER BY epoch_us(datetime)
            RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW),
    w1w AS (PARTITION BY cc_num ORDER BY epoch_us(datetime)
            RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
), enriched AS (
  SELECT *,
         avg_amt_last_10m / avg_amt_last_1w AS amt_ratio1,
         amount / avg_amt_last_1w AS amt_ratio2,
         CAST(num_trans_last_10m AS DOUBLE)
           / CAST(num_trans_last_1w AS DOUBLE) AS count_ratio
  FROM windowed
)
"""

# ------------------------------------------------------------------ E1 (B3-B9)

def _q_e1_agg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg_features_query(load_transactions(spark, sf_dir))


_E1_ORACLE = (
    _ORACLE_WINDOWED
    + """
SELECT tid, datetime, cc_num, amount,
       num_trans_last_10m, avg_amt_last_10m,
       num_trans_last_1w, avg_amt_last_1w,
       amt_ratio1, amt_ratio2, count_ratio
FROM enriched
"""
)

# ------------------------------------------------- E1 skew (bucketed) rewrite

def _q_e1_skew_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key rewrite of the E1 windows: pre-aggregate per (key, 1-s
    bucket), sweep-cumsum the bucket totals, join back — the per-key
    window input is O(active buckets) regardless of key heat. The oracle
    states the operator's bucket-grain semantics directly (RANGE over
    integer second-buckets); on second-grain data this equals E1 exactly
    (asserted in tests/test_window_agg.py)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        trailing_window_features_bucketed,
    )

    return trailing_window_features_bucketed(
        load_transactions(spark, sf_dir)
    ).select(
        "tid", "datetime", "cc_num", "amount",
        "num_trans_last_10m", "avg_amt_last_10m",
        "num_trans_last_1w", "avg_amt_last_1w",
    )


_E1_SKEW_ORACLE = """
WITH transactions AS (
  SELECT event_id AS tid, ts AS datetime, user_id AS cc_num, value AS amount,
         CAST(round(value * 100) AS BIGINT) AS amt_cents,
         epoch_us(ts) // 1000000 AS b
  FROM events
)
SELECT tid, datetime, cc_num, amount,
       COUNT(*) OVER w10 AS num_trans_last_10m,
       (CAST(SUM(amt_cents) OVER w10 AS DOUBLE) / 100.0)
         / COUNT(*) OVER w10 AS avg_amt_last_10m,
       COUNT(*) OVER w1w AS num_trans_last_1w,
       (CAST(SUM(amt_cents) OVER w1w AS DOUBLE) / 100.0)
         / COUNT(*) OVER w1w AS avg_amt_last_1w
FROM transactions
WINDOW
  w10 AS (PARTITION BY cc_num ORDER BY b
          RANGE BETWEEN 600 PRECEDING AND CURRENT ROW),
  w1w AS (PARTITION BY cc_num ORDER BY b
          RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
"""


# ------------------------------------------------------ B2 SQL-string entry

#: The reference's flagship query IS a SQL string over a temp view
#: (``2_batch_ingestion.ipynb:271-289``): subquery + named WINDOW clause
#: + RANGE INTERVAL frames + ratio projection. Same structure here,
#: dialect-fixed (``INTERVAL 7 DAYS`` — Spark has no ``1 WEEK`` interval
#: literal) and with the averages computed via exact integer-cent sums
#: instead of ``AVG(amount)`` so the result is bit-identical to the
#: DataFrame twin and the DuckDB oracle (same numeric plumbing as
#: operators/window_agg.py — double accumulation order is engine-
#: specific, integer sums are not).
_B2_SQL = """
SELECT tid, datetime, cc_num, amount,
       num_trans_last_10m, avg_amt_last_10m,
       num_trans_last_1w, avg_amt_last_1w,
       avg_amt_last_10m / avg_amt_last_1w AS amt_ratio1,
       amount / avg_amt_last_1w AS amt_ratio2,
       CAST(num_trans_last_10m AS DOUBLE)
         / CAST(num_trans_last_1w AS DOUBLE) AS count_ratio
FROM (
    SELECT *,
           COUNT(*) OVER w1 AS num_trans_last_10m,
           (CAST(SUM(CAST(ROUND(amount * 100) AS BIGINT)) OVER w1 AS DOUBLE)
              / 100.0) / COUNT(*) OVER w1 AS avg_amt_last_10m,
           COUNT(*) OVER w2 AS num_trans_last_1w,
           (CAST(SUM(CAST(ROUND(amount * 100) AS BIGINT)) OVER w2 AS DOUBLE)
              / 100.0) / COUNT(*) OVER w2 AS avg_amt_last_1w
    FROM transactions
    WINDOW
        w1 AS (PARTITION BY cc_num ORDER BY CAST(datetime AS TIMESTAMP)
               RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW),
        w2 AS (PARTITION BY cc_num ORDER BY CAST(datetime AS TIMESTAMP)
               RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
)
"""


def _q_b2_sql_agg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: the SQL-string surface — ``createOrReplaceTempView`` +
    ``spark.sql`` of the reference query shape, proving the engine's SQL
    entry point (not just the DataFrame API) reproduces E1 exactly
    (shares the E1 oracle)."""
    load_transactions(spark, sf_dir).createOrReplaceTempView("transactions")
    return spark.sql(_B2_SQL)


# ----------------------------------------- incremental (delta-scoped) E1

def _q_inc_delta_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of the E1 windows: features for the
    last DAY of events only, computed from the delta plus the
    key-pruned, horizon-pruned (1-week) history sliver — never a full
    recompute (operators/incremental.py). Bit-identical to the full
    window restricted to the delta rows, which is what the oracle
    states."""
    from pyspark.sql import functions as F

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.incremental import (
        delta_scoped_features,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "value",
    )
    # Deterministic split: delta = the trailing day, relative to the
    # data's own max timestamp (broadcast scalar — no driver action).
    mx = ev.agg(F.max(F.unix_micros("ts")).alias("__mx"))
    evm = ev.crossJoin(F.broadcast(mx))
    day_us = 86_400_000_000
    in_delta = F.unix_micros("ts") >= F.col("__mx") - F.lit(day_us)
    history = evm.where(~in_delta).drop("__mx")
    delta = evm.where(in_delta).drop("__mx")
    return delta_scoped_features(
        history, delta, key="user_id", ts="ts", amount="value"
    )


_INC_DELTA_ORACLE = """
WITH mx AS (SELECT max(epoch_us(ts)) AS m FROM events),
src AS (
  SELECT event_id, ts, user_id, value,
         CAST(round(value * 100) AS BIGINT) AS amt_cents
  FROM events
),
feat AS (
  SELECT event_id, ts, user_id, value,
         COUNT(*) OVER w10 AS num_trans_last_10m,
         (CAST(SUM(amt_cents) OVER w10 AS DOUBLE) / 100.0)
           / COUNT(*) OVER w10 AS avg_amt_last_10m,
         COUNT(*) OVER w1w AS num_trans_last_1w,
         (CAST(SUM(amt_cents) OVER w1w AS DOUBLE) / 100.0)
           / COUNT(*) OVER w1w AS avg_amt_last_1w
  FROM src
  WINDOW
    w10 AS (PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW),
    w1w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
)
SELECT f.event_id, f.ts, f.user_id, f.value,
       f.num_trans_last_10m, f.avg_amt_last_10m,
       f.num_trans_last_1w, f.avg_amt_last_1w
FROM feat f, mx
WHERE epoch_us(f.ts) >= mx.m - 86400000000
"""


# --------------------------------------------------------- B11-B13 feature recs

def _q_batch_feature_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    return batch_feature_records(
        agg_features_query(load_transactions(spark, sf_dir), keep_cent_sums=True)
    )


# 2-dp rounding done half-up in integer space ((2s+n) // (2n) cents):
# rounding a *double* to decimals is engine-specific at representable
# midpoints (observed: 74.085 -> Spark 74.09, DuckDB 74.08).
# Sign note: Spark `div` and DuckDB `//` BOTH truncate toward zero
# (verified: -7 // 2 = -3 in DuckDB), so the pairing is cross-engine
# exact for any sign; "half-up" describes the non-negative case
# (amounts here), negatives round half-toward-zero in both engines.
_B13_ORACLE = (
    _ORACLE_WINDOWED
    + """
, summed AS (
  SELECT cc_num, datetime,
         COUNT(*) OVER w1w AS num_trans_last_1w,
         SUM(amt_cents) OVER w1w AS sum_amt_cents_1w
  FROM transactions
  WINDOW w1w AS (PARTITION BY cc_num ORDER BY epoch_us(datetime)
                 RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
), ranked AS (
  SELECT cc_num, num_trans_last_1w, sum_amt_cents_1w,
         dense_rank() OVER (PARTITION BY cc_num ORDER BY datetime DESC) AS rnk
  FROM summed
)
SELECT cc_num, num_trans_last_1w,
       CAST((2 * sum_amt_cents_1w + num_trans_last_1w)
            // (2 * num_trans_last_1w) AS DOUBLE) / 100.0 AS avg_amt_last_1w
FROM ranked
WHERE rnk = 1 AND cc_num IS NOT NULL
"""
)

# ----------------------------------------------------------- T1-T4 train prep

_TRAIN_START, _TRAIN_END = "2024-01-08", "2024-01-25"


def _q_train_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = agg_features_query(load_transactions(spark, sf_dir, with_label=True))
    return train_prep(agg, "fraud_label", _TRAIN_START, _TRAIN_END)


_TRAIN_ORACLE = (
    _ORACLE_WINDOWED
    + f"""
SELECT CAST(fraud_label AS BIGINT) AS fraud_label,
       amount, amt_ratio1, amt_ratio2, count_ratio
FROM enriched
WHERE datetime > TIMESTAMP '{_TRAIN_START}'
  AND datetime < TIMESTAMP '{_TRAIN_END}'
  AND fraud_label IS NOT NULL AND amount IS NOT NULL
  AND amt_ratio1 IS NOT NULL AND amt_ratio2 IS NOT NULL
  AND count_ratio IS NOT NULL
"""
)


# ------------------------------------------------- S4 streaming sliding agg

_S4_SEQ = __import__("itertools").count()


def _set_stream_partitions(spark: SparkSession) -> str:
    """Shrink shuffle partitions for a bounded streaming replay and
    return the previous value (caller restores in its ``finally``).

    Stateful streaming provisions one state-store instance per shuffle
    partition per stateful operator, re-opened every micro-batch — so
    the partition count should track the query's sustained throughput,
    not the session default sized for batch scans (measured at sf0.1
    on the stream-stream join replay: 12.7s @32 -> ~4.3s @16 ->
    ~2.5s @8; 8 won or tied on every stateful replay). On a real
    cluster, size this to input rate BEFORE the first start: the
    value is baked into the checkpoint.
    """
    import os

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8"),
    )
    return old


def _q_s4_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the REAL streaming operator (applyInPandasWithState) over the
    events table replayed as a file stream, availableNow trigger, memory
    sink — then returns the materialized result. The oracle is the batch
    RANGE-window twin: the reference's batch/stream duality as an exact,
    checkable invariant."""
    import os
    import shutil
    import tempfile

    name = f"s4_out_{next(_S4_SEQ)}"
    # The file stream source requires a *directory*; expose the single
    # events.parquet file through a temp dir symlink.
    stream_dir = tempfile.mkdtemp(prefix="s4_src_")
    ckpt_dir = tempfile.mkdtemp(prefix="s4_ckpt_")
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(stream_dir, "events.parquet"),
    )
    old_parts = _set_stream_partitions(spark)
    try:
        stream = read_event_stream(
            spark,
            stream_dir,
            "event_id long, ts timestamp_ntz, user_id long, value double",
        )
        agg = sliding_agg_exact(stream, key="user_id", ts="ts", amount="value")
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "s4_sliding_agg availableNow replay exceeded 300s; "
                "memory table would be partial"
            )
        # memory-sink table is fully materialized once the query ends
        return spark.table(name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(stream_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)


# sliding_agg_exact routes malformed records OUT wholesale (NULL
# key/ts/value — the reference Lambda's skip-bad-record rule), so the
# oracle states the same predicate; vacuous on the clean driver data
_S4_ORACLE = """
WITH src AS (
  SELECT user_id AS cc_num, ts,
         CAST(round(value * 100) AS BIGINT) AS amt_cents
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
)
SELECT cc_num, ts,
       COUNT(*) OVER w AS num_trans_last_10m,
       (CAST(SUM(amt_cents) OVER w AS DOUBLE) / 100.0)
         / COUNT(*) OVER w AS avg_amt_last_10m
FROM src
WINDOW w AS (PARTITION BY cc_num ORDER BY epoch_us(ts)
             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
"""


# ------------------------------------ sessionization / rollup / sampling

_SESSION_GAP_S = 1800


def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the event stream + per-session stats
    (count, bounds, duration, exact cent sum)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        session_stats,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    return session_stats(ev, key="user_id", ts="ts", gap_s=_SESSION_GAP_S)


_SESSIONIZE_ORACLE = f"""
WITH lagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                  > {_SESSION_GAP_S * 1_000_000}
              THEN 1 ELSE 0 END AS st
  -- NULL event times are routed OUT of the timeline (session NULL
  -- below), mirroring sessionize's explicit rule — left in, Spark
  -- (NULLS FIRST) and DuckDB (NULLS LAST) would not even agree where
  -- they land and every real session ordinal would shift
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
), sid AS (
  SELECT user_id, ts, value,
         SUM(st) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                       ROWS UNBOUNDED PRECEDING) AS session_id
  FROM lagged
  UNION ALL
  SELECT user_id, ts, value, NULL AS session_id
  FROM events WHERE ts IS NULL
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM sid GROUP BY user_id, session_id
"""


def _q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical hour->day rollup (continuous-aggregate pattern): raw
    events aggregate once at hour grain; day re-aggregates the hour
    buckets — no Expand-style G-times shuffle of the events."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        time_rollup,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    return time_rollup(ev, key="user_id", ts="ts", value="value",
                       grains=("hour", "day"))


_ROLLUP_ORACLE = """
WITH h AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket_start,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM events GROUP BY 1, 2
), d AS (
  SELECT user_id, date_trunc('day', bucket_start) AS bucket_start,
         CAST(SUM(n_events) AS BIGINT) AS n_events,
         CAST(SUM(value_cents) AS BIGINT) AS value_cents
  FROM h GROUP BY 1, 2
), u AS (
  SELECT user_id, 'hour' AS grain, bucket_start, n_events, value_cents FROM h
  UNION ALL
  SELECT user_id, 'day' AS grain, bucket_start, n_events, value_cents FROM d
)
SELECT user_id, grain, bucket_start, n_events, value_cents,
       (CAST(value_cents AS DOUBLE) / 100.0) / CAST(n_events AS DOUBLE)
         AS avg_value
FROM u
"""


_SAMPLE_FRACTIONS = {"en": 0.5, "de": 0.25, "zh": 0.1}


def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic sampling of the documents corpus:
    membership is a pure md5 function of doc_id, stable under any
    partitioning/engine (DataFrame.sample is not) — absent strata drop
    to 0 (es/fr here)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        stratified_sample,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs, _SAMPLE_FRACTIONS, strata_col="lang", id_col="doc_id"
    )


_SAMPLE_ORACLE = """
SELECT doc_id, text, lang, source, n_chars
FROM documents
WHERE CAST('0x' || substring(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15)
           AS BIGINT) % 10000
      < CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2500
                  WHEN 'zh' THEN 1000 ELSE 0 END
"""


# ------------------------------------------------------- streaming dedup

def _q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup under total redelivery: the events table is
    replayed TWICE (two micro-batches — an at-least-once transport
    redelivering everything); watermark-bounded per-key state must drop
    the entire second pass, so the sink holds exactly the distinct
    events. Oracle: the events table itself."""
    import os
    import shutil
    import tempfile

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        dedup_stream_exact,
        read_event_stream,
    )

    name = f"stream_dedup_out_{next(_S4_SEQ)}"
    stream_dir = tempfile.mkdtemp(prefix="sdedup_src_")
    ckpt_dir = tempfile.mkdtemp(prefix="sdedup_ckpt_")
    src = os.path.join(sf_dir, "events.parquet")
    os.symlink(src, os.path.join(stream_dir, "00.parquet"))
    shutil.copy(src, os.path.join(stream_dir, "01.parquet"))  # redelivery
    old_parts = _set_stream_partitions(spark)
    try:
        stream = read_event_stream(
            spark,
            stream_dir,
            "event_id long, ts timestamp_ntz, user_id long, value double",
            max_files_per_trigger=1,
        )
        deduped = dedup_stream_exact(
            stream, ["event_id"], ts_col="ts", watermark="10 minutes"
        )
        q = (
            deduped.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("stream_dedup availableNow replay exceeded 300s")
        return spark.table(name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(stream_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)


_STREAM_DEDUP_ORACLE = """
SELECT event_id, ts, user_id, value FROM events
"""


# ----------------------------------------- cross-batch running totals

def _q_stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-stateful streaming with CROSS-BATCH state: per-user
    running (count, cent-sum) emitted per event. The events table is
    replayed as TWO micro-batches split at the time midpoint, so the
    second batch's totals are only correct if state survived the batch
    boundary — which is the property under test. State per key is one
    (long, long) pair (constant; no eviction). Oracle: the batch
    cumulative window (ROWS UNBOUNDED PRECEDING). See
    streaming/running_totals.py for the transformWithState note."""
    import os
    import shutil
    import tempfile
    import time

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        read_event_stream,
        running_totals,
    )

    name = f"stream_runtot_out_{next(_S4_SEQ)}"
    stream_dir = tempfile.mkdtemp(prefix="sruntot_src_")
    ckpt_dir = tempfile.mkdtemp(prefix="sruntot_ckpt_")
    src = os.path.join(sf_dir, "events.parquet")
    tbl = pq.read_table(src, columns=["event_id", "ts", "user_id", "value"])
    lo = pc.min(tbl["ts"]).value
    hi = pc.max(tbl["ts"]).value
    mid = pa.scalar(lo + (hi - lo) // 2, pa.timestamp("us"))
    pq.write_table(
        tbl.filter(pc.less_equal(tbl["ts"], mid)),
        os.path.join(stream_dir, "00.parquet"),
    )
    pq.write_table(
        tbl.filter(pc.greater(tbl["ts"], mid)),
        os.path.join(stream_dir, "01.parquet"),
    )
    now = time.time()
    os.utime(os.path.join(stream_dir, "01.parquet"), (now + 10, now + 10))
    old_parts = _set_stream_partitions(spark)
    try:
        stream = read_event_stream(
            spark,
            stream_dir,
            "event_id long, ts timestamp_ntz, user_id long, value double",
            max_files_per_trigger=1,
        )
        out = running_totals(stream, key="user_id")
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "stream_running_totals availableNow run exceeded 300s"
            )
        return spark.table(name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(stream_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)


# running_totals drops NULL key/id/ts/value rows (per-record failure
# isolation, streaming/running_totals.py:99); same predicate here
_STREAM_RUNTOT_ORACLE = """
WITH src AS (
  SELECT user_id, event_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
  WHERE user_id IS NOT NULL AND event_id IS NOT NULL
    AND ts IS NOT NULL AND value IS NOT NULL
)
SELECT user_id, event_id,
       COUNT(*) OVER w AS running_n,
       CAST(SUM(cents) OVER w AS BIGINT) AS running_cents
FROM src
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)
"""


# ------------------------------------------------ stream-static enrich join

def _q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the events stream enriched against the
    static customer dimension with an explicit ``broadcast()`` — the
    dimension is shipped to every task once per micro-batch, the
    stream side never shuffles, and no state store is involved (the
    static side is re-planned, not buffered). This is the streaming
    twin of the I3/I5 point-lookup joins in plans/inference.py, here
    proven through the actual writeStream execution path. LEFT join:
    events without a dimension row keep NULL attributes. Oracle: the
    identical batch join."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import (
        load_table,
    )

    name = f"stream_enrich_out_{next(_S4_SEQ)}"
    stream_dir = tempfile.mkdtemp(prefix="senrich_src_")
    ckpt_dir = tempfile.mkdtemp(prefix="senrich_ckpt_")
    src = os.path.join(sf_dir, "events.parquet")
    os.symlink(src, os.path.join(stream_dir, "00.parquet"))
    old_parts = _set_stream_partitions(spark)
    try:
        stream = read_event_stream(
            spark,
            stream_dir,
            "event_id long, ts timestamp_ntz, user_id long, value double",
        )
        dim = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("user_id"), "c_name", "c_mktsegment"
        )
        enriched = stream.join(F.broadcast(dim), on="user_id", how="left")
        q = (
            enriched.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("stream_enrich availableNow run exceeded 300s")
        return spark.table(name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(stream_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)


_STREAM_ENRICH_ORACLE = """
SELECT e.user_id, e.event_id, e.ts, e.value, c.c_name, c.c_mktsegment
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
"""


def _q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization: ``session_window`` + zero-delay
    watermark over a replay of the events table. Two far-future
    sentinel rows (user_id = -1) ride in as extra micro-batches purely
    to advance the watermark past every real session so append mode
    flushes them all — the standard end-of-stream flush technique for
    a bounded replay; the sentinels themselves never emit (their own
    session end never passes the final watermark) and are filtered out
    regardless. Oracle: batch gap-sessionization with the strict-> gap
    break rule — session_window merges an event landing EXACTLY at
    session_end (verified in tests/test_streaming_sessions.py), i.e.
    identical boundary semantics to operators/sessionize.py."""
    import os
    import shutil
    import tempfile
    import time

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        read_event_stream,
        session_window_stats,
    )

    name = f"stream_sessions_out_{next(_S4_SEQ)}"
    stream_dir = tempfile.mkdtemp(prefix="ssess_src_")
    ckpt_dir = tempfile.mkdtemp(prefix="ssess_ckpt_")
    src = os.path.join(sf_dir, "events.parquet")
    os.symlink(src, os.path.join(stream_dir, "00.parquet"))
    max_us = pc.max(pq.read_table(src, columns=["ts"])["ts"]).value
    gap_us = _SESSION_GAP_S * 1_000_000
    now = time.time()
    for i in (1, 2):
        sentinel = pa.table(
            {
                "event_id": pa.array([-i], pa.int64()),
                "ts": pa.array(
                    [max_us + i * (gap_us + 10**7)], pa.timestamp("us")
                ),
                "user_id": pa.array([-1], pa.int64()),
                "value": pa.array([0.0], pa.float64()),
            }
        )
        p = os.path.join(stream_dir, f"0{i}.parquet")
        pq.write_table(sentinel, p)
        # the file source orders batches by mtime: events (old) first,
        # then the sentinels in sequence
        os.utime(p, (now + 10 * i, now + 10 * i))
    old_parts = _set_stream_partitions(spark)
    try:
        stream = read_event_stream(
            spark,
            stream_dir,
            "event_id long, ts timestamp_ntz, user_id long, value double",
            max_files_per_trigger=1,
        )
        sessions = session_window_stats(
            stream, key="user_id", ts_col="ts", gap_s=_SESSION_GAP_S
        )
        q = (
            sessions.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("stream_sessions availableNow run exceeded 300s")
        # keep NULL-key sessions (they group and emit like SQL);
        # only the -1 sentinels are artifacts
        return spark.table(name).where("user_id IS NULL OR user_id >= 0")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(stream_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)


def _q_stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE watermark-based streaming aggregation (append mode): per
    (user, 1-hour tumbling window) COUNT + exact-cents AVG. Append
    mode only emits a window once the watermark passes its end — the
    state store holds exactly the open windows — so a far-future
    sentinel batch flushes the bounded replay's tail (it never emits
    itself; its own window stays open, and its user_id = -1 row is
    filtered regardless). The batch twin of this aggregation is
    ``s4_sliding_windowed``; THIS entry proves the streaming execution
    path with watermark eviction. Oracle: hourly GROUP BY."""
    import os
    import shutil
    import tempfile
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyarrow import compute as pc

    from pyspark.sql import functions as F

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        read_event_stream,
    )

    name = f"stream_tumble_out_{next(_S4_SEQ)}"
    stream_dir = tempfile.mkdtemp(prefix="stumble_src_")
    ckpt_dir = tempfile.mkdtemp(prefix="stumble_ckpt_")
    src = os.path.join(sf_dir, "events.parquet")
    os.symlink(src, os.path.join(stream_dir, "00.parquet"))
    max_us = pc.max(pq.read_table(src, columns=["ts"])["ts"]).value
    sentinel = pa.table(
        {
            "event_id": pa.array([-1], pa.int64()),
            "ts": pa.array([max_us + 10**10], pa.timestamp("us")),
            "user_id": pa.array([-1], pa.int64()),
            "value": pa.array([0.0], pa.float64()),
        }
    )
    p = os.path.join(stream_dir, "01.parquet")
    pq.write_table(sentinel, p)
    now = time.time()
    os.utime(p, (now + 10, now + 10))
    old_parts = _set_stream_partitions(spark)
    try:
        stream = read_event_stream(
            spark,
            stream_dir,
            "event_id long, ts timestamp_ntz, user_id long, value double",
            max_files_per_trigger=1,
        )
        agg = (
            stream.withWatermark("ts", "0 seconds")
            .groupBy(F.window("ts", "1 hour"), "user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.expr("cast(round(value * 100) as bigint)")).alias(
                    "__cents"
                ),
            )
            .select(
                "user_id",
                F.col("window.end").alias("window_end"),
                "n_events",
                F.expr(
                    "(CAST(__cents AS DOUBLE) / 100.0)"
                    " / CAST(n_events AS DOUBLE)"
                ).alias("avg_value"),
            )
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("stream_tumbling_agg exceeded 300s")
        # keep NULL-key windows; only the -1 sentinel is an artifact
        return spark.table(name).where("user_id IS NULL OR user_id >= 0")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(stream_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)


# ts IS NOT NULL on BOTH sides: a NULL event time is dropped by the
# stream-stream join's watermark machinery before it can even emit as
# an unmatched outer row (probed); NULL join KEYS behave like SQL
# (no match, emit unmatched in outer modes)
_STREAM_IJOIN_FULL_ORACLE = """
SELECT coalesce(a.user_id, b.user_id) AS user_id,
       a.event_id AS a_id, b.event_id AS b_id,
       a.ts AS a_ts, b.ts AS b_ts
FROM (SELECT * FROM events WHERE event_id % 2 = 0 AND ts IS NOT NULL) a
FULL JOIN (SELECT * FROM events WHERE event_id % 2 = 1 AND ts IS NOT NULL) b
  ON a.user_id = b.user_id
 AND epoch_us(b.ts) >= epoch_us(a.ts) - 60000000
 AND epoch_us(b.ts) <= epoch_us(a.ts) + 60000000
"""


# ts IS NOT NULL: a NULL event time never enters a watermark
# aggregation (the watermark filter's WHERE semantics drop it —
# probed empirically); NULL user_id rows DO group and emit
_STREAM_TUMBLE_ORACLE = """
SELECT user_id,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       count(*) AS n_events,
       (CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0)
         / CAST(count(*) AS DOUBLE) AS avg_value
FROM events
WHERE ts IS NOT NULL
GROUP BY user_id, date_trunc('hour', ts)
"""


def _q_stream_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark LATE-DATA DROP, proven end-to-end: the replay delivers
    (1) all on-time events (everything but event_type='error'), (2) a
    far-future sentinel that advances the watermark past every real
    timestamp, then (3) the 'error' rows as late arrivals. Because the
    watermark used by micro-batch N is computed from data seen through
    N-1, batch (3)'s rows arrive with every tumbling window already
    closed and emitted — append-mode aggregation discards them, which
    is exactly the at-most-once-per-window contract that bounds state
    at 100 TB event rates. The result therefore equals the batch
    aggregate over the ON-TIME subset only; the oracle encodes the
    drop as an explicit ``event_type <> 'error'`` predicate.

    (Same replay scaffolding as ``s_stream_tumbling_agg``; file order
    is forced via mtimes + maxFilesPerTrigger=1.)
    """
    import os
    import shutil
    import tempfile
    import time

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        read_event_stream,
    )

    name = f"stream_late_drop_out_{next(_S4_SEQ)}"
    stream_dir = tempfile.mkdtemp(prefix="slate_src_")
    ckpt_dir = tempfile.mkdtemp(prefix="slate_ckpt_")
    src = os.path.join(sf_dir, "events.parquet")
    tbl = pq.read_table(
        src, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    is_late = pc.equal(tbl["event_type"], "error")
    pq.write_table(
        tbl.filter(pc.invert(is_late)), os.path.join(stream_dir, "00.parquet")
    )
    max_us = pc.max(tbl["ts"]).value

    # TWO sentinel batches before the late file: the row filter of
    # micro-batch N uses the watermark computed from batches <= N-2
    # (one batch more lag than the progress line reports — verified
    # empirically), so a single sentinel would leave the late batch
    # filtering against the pre-sentinel watermark and the final open
    # window would accept "late" rows. The spacer guarantees the late
    # batch sees the first sentinel's far-future watermark.
    def _sentinel(i: int) -> "pa.Table":
        return pa.table(
            {
                "event_id": pa.array([-i], pa.int64()),
                "ts": pa.array([max_us + i * 10**10], pa.timestamp("us")),
                "user_id": pa.array([-1], pa.int64()),
                "event_type": pa.array(["__sentinel__"], pa.string()),
                "value": pa.array([0.0], pa.float64()),
            }
        )

    now = time.time()
    for i, t in ((1, _sentinel(1)), (2, _sentinel(2))):
        p = os.path.join(stream_dir, f"0{i}.parquet")
        pq.write_table(t, p)
        os.utime(p, (now + 10 * i, now + 10 * i))
    p3 = os.path.join(stream_dir, "03.parquet")
    pq.write_table(tbl.filter(is_late), p3)
    os.utime(p3, (now + 30, now + 30))
    old_parts = _set_stream_partitions(spark)
    try:
        stream = read_event_stream(
            spark,
            stream_dir,
            "event_id long, ts timestamp_ntz, user_id long,"
            " event_type string, value double",
            max_files_per_trigger=1,
        )
        agg = (
            stream.withWatermark("ts", "0 seconds")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.expr("cast(round(value * 100) as bigint)")).alias(
                    "__cents"
                ),
            )
            .select(
                "event_type",
                F.col("window.end").alias("window_end"),
                "n_events",
                F.expr("CAST(__cents AS DOUBLE) / 100.0").alias("total_value"),
            )
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("stream_late_drop exceeded 300s")
        return spark.table(name).where("event_type <> '__sentinel__'")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(stream_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)


_STREAM_LATE_DROP_ORACLE = """
SELECT event_type,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_value
FROM events
WHERE event_type <> 'error' AND ts IS NOT NULL
GROUP BY event_type, date_trunc('hour', ts)
"""


def _run_interval_join_replay(
    spark: SparkSession, sf_dir: str, how: str
) -> DataFrame:
    """Shared replay harness for ALL stream-stream interval-join modes:
    the event stream split by event-id parity into two live sides,
    joined per user where the odd-side event lands within ±60 s of the
    even-side event.

    Mode differences (everything else — symlink source, checkpoint,
    partition sizing, memory sink, cleanup — is identical and lives
    ONCE here):

    * ``inner`` / ``left_semi`` — matches emit immediately; no flush
      sentinels needed. Semi emits left columns only (streaming
      EXISTS).
    * ``left_outer`` / ``full_outer`` — unmatched rows emit (other
      side NULL) only once the watermark passes their match horizon,
      so two far-future sentinel events (one per parity — the
      multiple-watermark policy is min() across inputs) ride in as a
      later micro-batch to flush the unmatched tail; sentinels carry
      user_id = -1 and are filtered out of the result.
    """
    import os
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        interval_join,
        read_event_stream,
    )

    with_sentinels = how in ("left_outer", "full_outer")
    name = f"stream_ijoin_{how}_out_{next(_S4_SEQ)}"
    stream_dir = tempfile.mkdtemp(prefix="sij_src_")
    ckpt_dir = tempfile.mkdtemp(prefix="sij_ckpt_")
    src = os.path.join(sf_dir, "events.parquet")
    os.symlink(src, os.path.join(stream_dir, "00.parquet"))
    if with_sentinels:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyarrow import compute as pc

        max_us = pc.max(pq.read_table(src, columns=["ts"])["ts"]).value
        now = time.time()
        sentinel = pa.table(
            {
                "event_id": pa.array([10**12, 10**12 + 1], pa.int64()),
                "ts": pa.array([max_us + 10**9] * 2, pa.timestamp("us")),
                "user_id": pa.array([-1, -1], pa.int64()),
                "value": pa.array([0.0, 0.0], pa.float64()),
            }
        )
        p = os.path.join(stream_dir, "01.parquet")
        pq.write_table(sentinel, p)
        os.utime(p, (now + 10, now + 10))
    old_parts = _set_stream_partitions(spark)
    try:
        schema = "event_id long, ts timestamp_ntz, user_id long, value double"
        kwargs = {"max_files_per_trigger": 1} if with_sentinels else {}
        left = (
            read_event_stream(spark, stream_dir, schema, **kwargs)
            .where("event_id % 2 = 0")
            .select("user_id", F.col("event_id").alias("a_id"),
                    F.col("ts").alias("a_ts"))
        )
        right = (
            read_event_stream(spark, stream_dir, schema, **kwargs)
            .where("event_id % 2 = 1")
            .select("user_id", F.col("event_id").alias("b_id"),
                    F.col("ts").alias("b_ts"))
        )
        out_cols = (
            ["user_id", "a_id", "a_ts"]
            if how == "left_semi"
            else ["user_id", "a_id", "b_id", "a_ts", "b_ts"]
        )
        joined = interval_join(
            left, right, key="user_id", left_ts="a_ts", right_ts="b_ts",
            lower_s=-60, upper_s=60, how=how,
        ).select(*out_cols)
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                f"stream_interval_join {how} replay exceeded 300s"
            )
        result = spark.table(name)
        if with_sentinels:
            # Drop sentinel artifacts: the two sentinels match EACH
            # OTHER (same user -1, same far-future ts), emitting one
            # row with user_id = -1; unmatched sentinels never emit
            # (their own horizon never passes). interval_join
            # coalesces the key for full_outer, so right-unmatched
            # rows carry their real (>= 0) user_id and survive this
            # filter; the IS NULL arm is defensive only.
            result = result.where("user_id IS NULL OR user_id >= 0")
        return result
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(stream_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)


def _q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INNER stream-stream interval join (see
    _run_interval_join_replay). Oracle: the equivalent batch
    self-join."""
    return _run_interval_join_replay(spark, sf_dir, "inner")


def _q_stream_interval_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI stream-stream interval join — the streaming EXISTS:
    each even-parity event emits ONCE if any odd-parity event of the
    same user lands within ±60 s (see _run_interval_join_replay).
    Oracle: batch EXISTS."""
    return _run_interval_join_replay(spark, sf_dir, "left_semi")


_STREAM_IJOIN_SEMI_ORACLE = """
SELECT a.user_id, a.event_id AS a_id, a.ts AS a_ts
FROM events a
WHERE a.event_id % 2 = 0
  AND EXISTS (
    SELECT 1 FROM events b
    WHERE b.user_id = a.user_id AND b.event_id % 2 = 1
      AND epoch_us(b.ts) >= epoch_us(a.ts) - 60000000
      AND epoch_us(b.ts) <= epoch_us(a.ts) + 60000000
  )
"""


def _q_stream_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join (see
    _run_interval_join_replay). Oracle: batch LEFT JOIN."""
    return _run_interval_join_replay(spark, sf_dir, "left_outer")


def _q_stream_interval_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER stream-stream interval join: unmatched rows of BOTH
    sides emit with the other side NULL. Oracle: batch FULL JOIN."""
    return _run_interval_join_replay(spark, sf_dir, "full_outer")


_STREAM_IJOIN_OUTER_ORACLE = """
SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
       a.ts AS a_ts, b.ts AS b_ts
FROM (SELECT * FROM events WHERE event_id % 2 = 0 AND ts IS NOT NULL) a
LEFT JOIN (SELECT * FROM events WHERE event_id % 2 = 1 AND ts IS NOT NULL) b
  ON a.user_id = b.user_id
 AND epoch_us(b.ts) >= epoch_us(a.ts) - 60000000
 AND epoch_us(b.ts) <= epoch_us(a.ts) + 60000000
"""


_STREAM_IJOIN_ORACLE = """
SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
       a.ts AS a_ts, b.ts AS b_ts
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id % 2 = 0 AND b.event_id % 2 = 1
 AND epoch_us(b.ts) >= epoch_us(a.ts) - 60000000
 AND epoch_us(b.ts) <= epoch_us(a.ts) + 60000000
"""


# ts IS NOT NULL: session_window drops NULL event times exactly like
# the tumbling window does (probed); NULL user_id sessions DO emit
_STREAM_SESSIONS_ORACLE = f"""
WITH lagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                  > {_SESSION_GAP_S * 1_000_000}
              THEN 1 ELSE 0 END AS st
  FROM events
  WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
), sid AS (
  SELECT user_id, ts, value,
         SUM(st) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                       ROWS UNBOUNDED PRECEDING) AS session_id
  FROM lagged
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_last,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM sid GROUP BY user_id, session_id
"""


# ----------------------------------------------------- as-of join (I3/I4)

_ASOF_TOL_US = 600 * 1_000_000  # the reference's 600 s staleness cutoff


def _q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward-inclusive as-of join: every event reads the most recent
    'feature update' (every 10th event, per user) at-or-before its own
    time, NULLed when staler than 600 s — the reference's point-lookup
    + staleness semantics (I3/I4) as a first-class time-series join.
    Oracle: DuckDB's native ASOF LEFT JOIN."""
    from pyspark.sql import functions as F

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        asof_join,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    probe = ev.select("event_id", "ts", "user_id", "value")
    build = ev.filter(F.col("event_id") % 10 == 0).select(
        "user_id", "ts", F.col("value").alias("feat_value")
    )
    return asof_join(
        probe,
        build,
        key="user_id",
        probe_ts="ts",
        build_ts="ts",
        value_cols=["feat_value"],
        tolerance_us=_ASOF_TOL_US,
    )


def _q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch range join via the bucketed-explode rewrite: every event
    joined to the same user's 'signup' follow-up windows
    [signup_ts, signup_ts + 30 min] that contain it. The naive
    spelling is a BroadcastNestedLoopJoin; this plans as a shuffled
    equi-join on (user, hour-bucket) with the range check residual
    (plan asserted in tests/test_range_join.py). Oracle: the naive
    BETWEEN join, which DuckDB executes natively (IEJoin)."""
    from pyspark.sql import functions as F

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import range_join
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    points = ev.select("event_id", "ts", "user_id", "value")
    windows = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("event_id").alias("signup_id"),
            F.col("ts").alias("w_lo"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_hi"),
        )
    )
    return range_join(
        points, windows, point_ts="ts", lo="w_lo", hi="w_hi",
        key="user_id", bucket_s=1800,
    ).select("event_id", "user_id", "signup_id", "ts", "w_lo", "w_hi")


_RANGE_JOIN_ORACLE = """
SELECT p.event_id, p.user_id, w.signup_id, p.ts, w.w_lo, w.w_hi
FROM events p
JOIN (
  SELECT user_id, event_id AS signup_id, ts AS w_lo,
         ts + INTERVAL 30 MINUTE AS w_hi
  FROM events WHERE event_type = 'signup'
) w
  ON p.user_id = w.user_id
 AND epoch_us(p.ts) >= epoch_us(w.w_lo)
 AND epoch_us(p.ts) <= epoch_us(w.w_hi)
"""


def _q_pit_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time training join: every 'purchase' event (the label
    row) reads the user's latest 'click' and 'view' events as of the
    purchase time — clicks NULLed beyond a 1-hour staleness tolerance,
    views unbounded. No feature may postdate its label (leakage guard
    tested in tests/test_point_in_time.py). Oracle: two DuckDB native
    ASOF LEFT JOINs."""
    from pyspark.sql import functions as F

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.featurestore import (
        point_in_time_features,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    labels = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", F.col("value").alias("label_value")
    )
    hist = {
        "click": ev.filter(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("value").alias("v")
        ),
        "view": ev.filter(F.col("event_type") == "view").select(
            "user_id", "ts", F.col("value").alias("v")
        ),
    }
    return point_in_time_features(
        labels,
        hist,
        key="user_id",
        tolerances_us={"click": 3_600_000_000},
    )


_PIT_ORACLE = """
WITH labels AS (
  SELECT event_id, ts, user_id, value AS label_value
  FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, ts, value AS v FROM events WHERE event_type = 'click'
), views AS (
  SELECT user_id, ts, value AS v FROM events WHERE event_type = 'view'
)
SELECT l.event_id, l.ts, l.user_id, l.label_value,
       CASE WHEN c.ts IS NOT NULL
             AND epoch_us(l.ts) - epoch_us(c.ts) <= 3600000000
            THEN c.ts END AS click__asof_ts,
       CASE WHEN c.ts IS NOT NULL
             AND epoch_us(l.ts) - epoch_us(c.ts) <= 3600000000
            THEN c.v END AS click__v,
       v.ts AS view__asof_ts,
       v.v AS view__v
FROM labels l
ASOF LEFT JOIN clicks c ON l.user_id = c.user_id AND l.ts >= c.ts
ASOF LEFT JOIN views v ON l.user_id = v.user_id AND l.ts >= v.ts
"""


_ASOF_ORACLE = f"""
WITH probe AS (
  SELECT event_id, ts, user_id, value FROM events
), build AS (
  SELECT user_id, ts, value AS feat_value FROM events WHERE event_id % 10 = 0
)
SELECT p.event_id, p.ts, p.user_id, p.value,
       CASE WHEN b.ts IS NOT NULL
             AND epoch_us(p.ts) - epoch_us(b.ts) <= {_ASOF_TOL_US}
            THEN b.ts END AS matched_ts,
       CASE WHEN b.ts IS NOT NULL
             AND epoch_us(p.ts) - epoch_us(b.ts) <= {_ASOF_TOL_US}
            THEN b.feat_value END AS feat_value
FROM probe p ASOF LEFT JOIN build b
  ON p.user_id = b.user_id AND p.ts >= b.ts
"""


# ---------------------------------------------- I3-I6 inference enrichment


def _q_inference_enrich(
    spark: SparkSession, sf_dir: str, join_strategy: str = "broadcast"
) -> DataFrame:
    """Batch replay of the inference pipeline: every event enriched
    against the feature tables as of dataset end; 'now' = max event
    time (deterministic clock). Exercises both broadcast left joins,
    the staleness cutoff and the guarded ratios (I3-I6)."""
    from pyspark.sql import functions as F

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        latest_per_key,
        trailing_window_features_exact,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import (
        enrich_transactions,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import (
        load_table,
    )

    tx_all = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("tid"),
        F.col("ts"),
        F.col("user_id").alias("cc_num"),
        F.col("value").alias("amount"),
    )
    win = trailing_window_features_exact(
        tx_all, key="cc_num", ts="ts", amount="amount", keep_cent_sums=True
    )
    latest = latest_per_key(win, key="cc_num", ts="ts", keep_ties=False)
    f10 = latest.select(
        "cc_num",
        "num_trans_last_10m",
        "avg_amt_last_10m",
        F.col("ts").alias("trans_time"),
    )
    f1w = latest.select(
        "cc_num",
        "num_trans_last_1w",
        F.expr(
            "cast((2 * sum_amt_cents_1w + num_trans_last_1w) "
            "div (2 * num_trans_last_1w) as double) / 100.0"
        ).alias("avg_amt_last_1w"),
    )
    # Deterministic clock for the oracle: 'now' = max event time. This
    # is a second (2-column, filter-free) scan of events by design — a
    # driver-side action here is the price of a reproducible staleness
    # cutoff; a deployment would pass wall-clock 'now' and scan once.
    now = tx_all.agg(F.max("ts")).first()[0]
    tx = tx_all.select("tid", "cc_num", F.col("ts").alias("trans_ts"), "amount")
    return enrich_transactions(
        tx, f10, f1w, now=F.lit(now), join_strategy=join_strategy
    )


def _q_inference_enrich_shuffle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 100×-dimension regime of i_enrich: identical semantics, but
    the feature tables join via SHUFFLE_HASH instead of broadcast —
    the physical plan a deployment flips to once the dimension
    outgrows executor memory (each partition builds a hash map of only
    its slice; no cluster-wide replication, no probe-side sort).
    Shares the i_enrich oracle verbatim: only the join strategy moves,
    never the answer."""
    return _q_inference_enrich(spark, sf_dir, join_strategy="shuffle_hash")


_I_ENRICH_ORACLE = """
WITH transactions AS (
  SELECT event_id AS tid, ts, user_id AS cc_num, value AS amount,
         CAST(round(value * 100) AS BIGINT) AS amt_cents
  FROM events
), win AS (
  SELECT tid, ts, cc_num, amount,
         COUNT(*) OVER w10 AS n10,
         (CAST(SUM(amt_cents) OVER w10 AS DOUBLE) / 100.0)
           / COUNT(*) OVER w10 AS a10,
         COUNT(*) OVER w1w AS n1w,
         SUM(amt_cents) OVER w1w AS s1w
  FROM transactions
  WINDOW
    w10 AS (PARTITION BY cc_num ORDER BY epoch_us(ts)
            RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW),
    w1w AS (PARTITION BY cc_num ORDER BY epoch_us(ts)
            RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
), latest AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY cc_num ORDER BY ts DESC) AS rn
    FROM win
  ) WHERE rn = 1
), f10 AS (
  SELECT cc_num, n10, a10, ts AS trans_time FROM latest
), f1w AS (
  SELECT cc_num, n1w,
         CAST((2 * s1w + n1w) // (2 * n1w) AS DOUBLE) / 100.0 AS a1w
  FROM latest
), nowt AS (
  SELECT max(ts) AS now FROM events
), joined AS (
  SELECT t.tid, t.cc_num, t.ts AS trans_ts, t.amount,
         f10.n10, f10.a10, f10.trans_time, f1w.n1w, f1w.a1w,
         -- microsecond-exact staleness (integer epoch_us diff),
         -- matching Spark's unix_micros comparison and the
         -- reference's float time diff — a record 600.4 s old IS
         -- stale; whole-second truncation would serve it as fresh
         (f10.trans_time IS NULL
          OR (epoch_us(nowt.now) - epoch_us(f10.trans_time)) > 600000000)
           AS is_stale_10m
  FROM transactions t
  LEFT JOIN f10 USING (cc_num)
  LEFT JOIN f1w USING (cc_num)
  CROSS JOIN nowt
), zeroed AS (
  SELECT tid, cc_num, trans_ts, amount, trans_time, is_stale_10m,
         CASE WHEN is_stale_10m THEN 0 ELSE coalesce(n10, 0) END
           AS num_trans_last_10m,
         CASE WHEN is_stale_10m THEN 0.0 ELSE coalesce(a10, 0.0) END
           AS avg_amt_last_10m,
         coalesce(n1w, 0) AS num_trans_last_1w,
         coalesce(a1w, 0.0) AS avg_amt_last_1w
  FROM joined
)
SELECT tid, cc_num, trans_ts, amount, trans_time, is_stale_10m,
       num_trans_last_10m, avg_amt_last_10m,
       num_trans_last_1w, avg_amt_last_1w,
       CASE WHEN avg_amt_last_1w IS NULL OR avg_amt_last_1w <= 0.0
                 OR num_trans_last_1w IS NULL OR num_trans_last_1w <= 0
                 OR is_stale_10m
            THEN 0.0 ELSE avg_amt_last_10m / avg_amt_last_1w END AS amt_ratio1,
       CASE WHEN avg_amt_last_1w IS NULL OR avg_amt_last_1w <= 0.0
                 OR num_trans_last_1w IS NULL OR num_trans_last_1w <= 0
                 OR is_stale_10m
            THEN 0.0 ELSE amount / avg_amt_last_1w END AS amt_ratio2,
       CASE WHEN avg_amt_last_1w IS NULL OR avg_amt_last_1w <= 0.0
                 OR num_trans_last_1w IS NULL OR num_trans_last_1w <= 0
                 OR is_stale_10m
            THEN 0.0
            ELSE CAST(num_trans_last_10m AS DOUBLE)
                 / CAST(num_trans_last_1w AS DOUBLE) END AS count_ratio
FROM zeroed
"""


# Driver-gate rotation: the per-round CORRECTNESS gate covers the first 50
# entries of queries() in registration order, so which 50 get a driver row
# each round is decided by the ordering below.  Rounds 2-3 used a
# hand-edited priority list; round 4 makes the rotation MECHANICAL: the
# ordering is derived from the prior CORRECTNESS_r*.json artifacts —
# queries with no fully-green driver row ever (new additions, or rows that
# came back red like q_profile_table in r3) go first, then everything else
# oldest-green-first, ties broken by registration order.  Net effect: no
# query's latest green row is ever more than ceil(n_queries/50) rounds
# stale, with zero per-round hand edits.


# A driver green describes the (query plan, oracle) pair that was live
# THAT round — when a key's plan or oracle changes semantically in a
# later round, the old green is evidence about a different computation
# and must not keep the key out of the gate.  Record such changes here
# (key -> round the change landed); _gate_history then discounts any
# green from an earlier round, which mechanically sends the key to the
# never-green front of the rotation until the driver re-gates it.  This
# is part of the add-a-key discipline, not a hand-reorder: the rotation
# ordering itself stays fully derived.  (The four entries below are the
# r12 re-point of the semantic-text family from the IVF plan to the
# linear SRP plan — VERDICT r12 "what's wrong #1".)
_PLAN_CHANGES: dict[str, int] = {
    "dedup_semantic_text": 12,
    "sim_text_near_dup": 12,
    "sim_text_topk": 12,
    "s_stream_semantic_text": 12,
    # r14 optimization-round rewrites that restructured how the key's
    # result is COMPUTED (one-pass tokenize + distinct-gram LM joins;
    # percentile_disc calibration; hamming NULL routing after the
    # collapse checkpoint; curate's persisted-model calibration +
    # parallel-action protocol; BPE deferred-unpersist drive).  Each was
    # builder-verified vs the DuckDB oracle in-commit, but the driver's
    # rotation sample missed them in r14 — recording the change round
    # front-loads their re-gating (VERDICT r14 "what's wrong #2").
    "text_lm_score": 14,
    "text_lm3_score": 14,
    "text_lm5_score": 14,
    "text_ccnet_buckets": 14,
    "pipeline_quality_filter": 14,
    "pipeline_quality_filter3": 14,
    "pipeline_quality_filter_linear": 14,
    "dedup_hamming_pairs": 14,
    "dedup_hamming_edges": 14,
    "s_stream_curate": 14,
    "s_stream_curate_near": 14,
    "s_stream_curate_clf_near": 14,
    "text_bpe_vocab": 14,
    "text_bpe_encode": 14,
    "t_pack_windows_real_bpe": 14,
}


def _gate_history() -> dict[str, int]:
    """Map query name -> latest round with a fully-green driver row
    that POSTDATES any recorded plan/oracle change for the key
    (``_PLAN_CHANGES``; an older green describes a different
    computation and counts as never-green).

    Reads the driver-written ``CORRECTNESS_r*.json`` artifacts next to this
    file.  A row counts as green only when it has no error and rows,
    schema, and value-hash all matched (a missing hash_match — the
    rows-only channel for non-SQL-expressible ops — counts as green, since
    re-gating it can never upgrade the signal).
    """
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("err") is None
                and row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") is not False
            )
            if green:
                latest[name] = max(latest.get(name, 0), rnd)
    for name, changed in _PLAN_CHANGES.items():
        if latest.get(name, 0) < changed:
            latest.pop(name, None)
    return latest


def _rotate_for_gate(entries: dict) -> dict:
    """Order `entries` never-green first, then oldest-green-first.
    Ties break by NAME — a dict-independent key, so queries() and
    oracle_sql() always agree on the ordering even when their
    registration positions differ (registration-index tie-breaks
    diverged the two dicts once _PLAN_CHANGES re-tied old keys with
    new ones registered at different anchor points)."""
    latest = _gate_history()
    order = sorted(entries, key=lambda name: (latest.get(name, 0), name))
    return {k: entries[k] for k in order}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotate_for_gate(_all_queries())


def _all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "e1_agg_features": _q_e1_agg_features,
        "e1_skew_window": _q_e1_skew_window,
        "b2_sql_agg_features": _q_b2_sql_agg_features,
        "inc_delta_features": _q_inc_delta_features,
        "b13_feature_records": _q_batch_feature_records,
        "t_train_prep": _q_train_prep,
        "s4_sliding_agg": _q_s4_sliding_agg,
        "i_enrich": _q_inference_enrich,
        "i_enrich_shuffle": _q_inference_enrich_shuffle,
        "asof_join": _q_asof_join,
        "range_join": _q_range_join,
        "pit_training_set": _q_pit_training_set,
        "s_stream_dedup": _q_stream_dedup,
        "s_stream_enrich": _q_stream_enrich,
        "s_stream_running_totals": _q_stream_running_totals,
        "s_stream_sessions": _q_stream_sessions,
        "s_stream_tumbling_agg": _q_stream_tumbling_agg,
        "s_stream_interval_join": _q_stream_interval_join,
        "s_stream_interval_join_outer": _q_stream_interval_join_outer,
        "s_stream_interval_join_full": _q_stream_interval_join_full,
        "s_stream_interval_join_semi": _q_stream_interval_join_semi,
        "s_stream_late_drop": _q_stream_late_drop,
        "sessionize": _q_sessionize,
        "time_rollup": _q_time_rollup,
        "stratified_sample": _q_stratified_sample,
        **ext_queries(),
    }


def oracle_sql() -> dict[str, str]:
    return _rotate_for_gate(_all_oracles())


def _all_oracles() -> dict[str, str]:
    return {
        "e1_agg_features": _E1_ORACLE,
        "e1_skew_window": _E1_SKEW_ORACLE,
        "b2_sql_agg_features": _E1_ORACLE,
        "inc_delta_features": _INC_DELTA_ORACLE,
        "b13_feature_records": _B13_ORACLE,
        "t_train_prep": _TRAIN_ORACLE,
        "s4_sliding_agg": _S4_ORACLE,
        "i_enrich": _I_ENRICH_ORACLE,
        "i_enrich_shuffle": _I_ENRICH_ORACLE,
        "asof_join": _ASOF_ORACLE,
        "range_join": _RANGE_JOIN_ORACLE,
        "pit_training_set": _PIT_ORACLE,
        "s_stream_dedup": _STREAM_DEDUP_ORACLE,
        "s_stream_enrich": _STREAM_ENRICH_ORACLE,
        "s_stream_running_totals": _STREAM_RUNTOT_ORACLE,
        "s_stream_sessions": _STREAM_SESSIONS_ORACLE,
        "s_stream_tumbling_agg": _STREAM_TUMBLE_ORACLE,
        "s_stream_interval_join": _STREAM_IJOIN_ORACLE,
        "s_stream_interval_join_outer": _STREAM_IJOIN_OUTER_ORACLE,
        "s_stream_interval_join_full": _STREAM_IJOIN_FULL_ORACLE,
        "s_stream_interval_join_semi": _STREAM_IJOIN_SEMI_ORACLE,
        "s_stream_late_drop": _STREAM_LATE_DROP_ORACLE,
        "sessionize": _SESSIONIZE_ORACLE,
        "time_rollup": _ROLLUP_ORACLE,
        "stratified_sample": _SAMPLE_ORACLE,
        **ext_oracles(),
    }
