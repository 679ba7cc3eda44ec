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
    # persist: the upsert leg below must time the MERGE, not a fresh
    # recompute of the whole window pipeline through the lazy plan
    recs = batch_feature_records(agg).persist()
    n_keys = force(recs)
    t_records = time.perf_counter() - t0

    # ---- streaming S4 envelope (BASELINE: >= 1,000 events/s sustained,
    # the reference's 1-Kinesis-shard ceiling). Replays the SAME
    # generated workload through the stateful streaming operator.
    import os
    import shutil
    import tempfile

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        sliding_agg_exact,
    )

    stream_dir = tempfile.mkdtemp(prefix="benchref_src_")
    ckpt_dir = tempfile.mkdtemp(prefix="benchref_ckpt_")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "16"),
    )  # same sizing knob as __spark_entry__._set_stream_partitions
    try:
        tx.select("tid", "datetime", "cc_num", "amount").write.mode(
            "overwrite"
        ).parquet(stream_dir)
        stream = (
            spark.readStream.schema("tid string, datetime timestamp, "
                                    "cc_num long, amount double")
            .parquet(stream_dir)
        )
        s4 = sliding_agg_exact(
            stream, key="cc_num", ts="datetime", amount="amount"
        )
        t0 = time.perf_counter()
        q = (
            s4.writeStream.format("memory")
            .queryName("benchref_s4")
            .outputMode("append")
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(900):
            q.stop()
            raise TimeoutError("reference-scale S4 replay exceeded 900s")
        n_stream = spark.table("benchref_s4").count()
        t_stream = time.perf_counter() - t0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(stream_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)

    # ---- feature-store upsert envelope (BASELINE: 10 K keys, 100 %
    # coverage — the reference asserts success==10000 on its put loop).
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.featurestore import (
        FeatureGroup,
    )

    store_dir = tempfile.mkdtemp(prefix="benchref_store_")
    try:
        fg = FeatureGroup(
            spark, "cc-agg-batch", "cc_num", "trans_time", store_dir
        )
        t0 = time.perf_counter()
        fg.upsert(recs)
        covered = fg.get_latest().count()
        t_upsert = time.perf_counter() - t0
    finally:
        recs.unpersist()
        shutil.rmtree(store_dir, ignore_errors=True)

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
                "stream_rows": n_stream,
                "stream_sec": round(t_stream, 2),
                "stream_events_per_sec": round(n_stream / t_stream),
                "reference_stream_ceiling_eps": 1000,
                "upsert_keys_covered": covered,
                "upsert_sec": round(t_upsert, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
