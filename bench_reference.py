"""Reference-scale benchmark: the E1 batch aggregation job at the
reference's own workload size — 5.4 M transactions, 10 K cards, 5-month
span (BASELINE.md: Spark 2.4 on 1x ml.r5.4xlarge, hard cap 1200 s).

Generates the workload with the G1-G5 generator (sources/generator.py),
runs the full flagship query (two time-RANGE windows + ratios) plus the
latest-per-key feature-record reduction, and prints one JSON line.

Usage: python bench_reference.py [n_rows]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import force

from amazon_sagemaker_feature_store_streaming_aggregation_spark import get_spark
from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
    agg_features_query,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import (
    batch_feature_records,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources.generator import (
    gen_transactions,
    inject_fraud_chains,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_400_000
    spark = get_spark("bench-reference")

    t0 = time.perf_counter()
    tx = inject_fraud_chains(gen_transactions(spark, n=n))
    n_rows = tx.count()  # generation only needs row count
    t_gen = time.perf_counter() - t0

    t0 = time.perf_counter()
    agg = agg_features_query(tx, keep_cent_sums=True)
    n_agg = force(agg)  # checksum forces both windows + ratios
    t_query = time.perf_counter() - t0

    t0 = time.perf_counter()
    recs = batch_feature_records(agg)
    n_keys = force(recs)
    t_records = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "e1_reference_scale",
                "unit": "sec",
                "rows": n_rows,
                "agg_rows": n_agg,
                "feature_keys": n_keys,
                "gen_sec": round(t_gen, 2),
                "query_sec": round(t_query, 2),
                "records_sec": round(t_records, 2),
                "value": round(t_query + t_records, 2),
                "reference_budget_sec": 1200,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
