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
from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import (
    load_transactions,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship E1 window-aggregation query on /root/testdata/sf0.001."""
    return agg_features_query(load_transactions(spark, SF0001))


def _q_e1_agg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg_features_query(load_transactions(spark, sf_dir))


# DuckDB twin of the E1 query. epoch_us ordering + integer-cent sums make
# every double a fixed IEEE-op sequence over identical inputs in both
# engines (bit-equal, no rounding needed).
_E1_ORACLE = """
WITH transactions AS (
  SELECT event_id AS tid, ts AS datetime, user_id AS cc_num, value AS amount,
         CAST(round(value * 100) AS BIGINT) AS amt_cents
  FROM events
), windowed AS (
  SELECT tid, datetime, cc_num, amount,
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
)
SELECT tid, datetime, cc_num, amount,
       num_trans_last_10m, avg_amt_last_10m,
       num_trans_last_1w, avg_amt_last_1w,
       avg_amt_last_10m / avg_amt_last_1w AS amt_ratio1,
       amount / avg_amt_last_1w AS amt_ratio2,
       CAST(num_trans_last_10m AS DOUBLE)
         / CAST(num_trans_last_1w AS DOUBLE) AS count_ratio
FROM windowed
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "e1_agg_features": _q_e1_agg_features,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "e1_agg_features": _E1_ORACLE,
    }
