"""B15: the batch-aggregation job driver as a CLI.

The reference ships its E1 pipeline as a spark-submit script with an
argparse main (``2_batch_ingestion.ipynb`` cell ``batch_aggregation.py``:
``parse_args`` -> schema'd CSV scan -> windowed SQL aggregation -> CSV
write + per-record feature-store ingest). Same sequencing here over the
Spark-native pipeline: B1 scan -> B3-B9 window features -> B10 CSV sink
-> B11-B14 latest-per-key store upsert.

Run::

    python -m amazon_sagemaker_feature_store_streaming_aggregation_spark.cli \
        --input /path/tx.csv --csv-out /path/agg.csv \
        --store-path /path/store --feature-group cc-agg-batch-fg
"""

from __future__ import annotations

import argparse
import sys
from collections.abc import Sequence


def parse_args(argv: Sequence[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        prog="amazon_sagemaker_feature_store_streaming_aggregation_spark.cli",
        description="E1 batch feature-aggregation job (scan -> window "
        "features -> CSV sink -> feature-store upsert)",
    )
    p.add_argument(
        "--input",
        required=True,
        help="transactions input: a headerless CSV path (reference wire "
        "format: tid,datetime,cc_num,amount,fraud_label) or a driver "
        "testdata sf dir containing events.parquet (--input-format)",
    )
    p.add_argument(
        "--input-format",
        choices=["csv", "sf-parquet"],
        default="csv",
        help="csv = reference-shape CSV scan (default); sf-parquet = "
        "driver testdata events.parquet mapped to the transaction shape",
    )
    p.add_argument("--csv-out", required=True, help="aggregated-features CSV path")
    p.add_argument("--store-path", required=True, help="feature store base dir")
    p.add_argument(
        "--feature-group", default="cc-agg-batch-fg", help="feature group name"
    )
    p.add_argument(
        "--n-buckets", type=int, default=32, help="store hash-bucket count"
    )
    return p.parse_args(argv)


def main(argv: Sequence[str] | None = None) -> int:
    args = parse_args(argv)

    from .featurestore import FeatureGroup
    from .plans.batch_ingest import run_batch_ingest
    from .session import get_spark
    from .sources.batch import load_transactions, read_transactions_csv

    spark = get_spark()
    if args.input_format == "csv":
        tx = read_transactions_csv(spark, args.input)
    else:
        tx = load_transactions(spark, args.input)

    fg = FeatureGroup(
        spark,
        args.feature_group,
        record_identifier_feature_name="cc_num",
        event_time_feature_name="trans_time",
        base_path=args.store_path,
        n_buckets=args.n_buckets,
    )
    agg = run_batch_ingest(tx, args.csv_out, fg)
    n = agg.count()
    print(f"aggregated {n} transactions -> {args.csv_out}; "
          f"store {args.feature_group!r} at {args.store_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
