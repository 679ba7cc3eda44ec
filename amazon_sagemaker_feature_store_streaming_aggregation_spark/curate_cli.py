"""Corpus-curation job driver: raw documents parquet → training
shards on disk, from the command line.

The batch CLI (``cli.py``) is reference parity (B15); this is its
extension-pipeline twin — the ``curate_and_shard`` chain (quality →
language → exact dedup → deterministic sample → per-source cap →
global shuffle) materialized with ``write_training_shards``, so the
output directory is directly consumable by a sequential training
reader (``shard=K/`` files in deterministic shuffle order).

Run::

    python -m amazon_sagemaker_feature_store_streaming_aggregation_spark.curate_cli \
        --input /root/testdata/sf0.001/documents.parquet \
        --out /tmp/shards --shards 8 --cap 100

Prints ONE JSON line: input/survivor/shard counts — the manifest a
pipeline orchestrator checks before pointing a trainer at the output.
"""

from __future__ import annotations

import argparse
import json
import sys
from collections.abc import Sequence


def parse_args(argv: Sequence[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        prog="amazon_sagemaker_feature_store_streaming_aggregation_spark.curate_cli",
        description="corpus curation: quality/lang/dedup/sample/cap -> "
        "shuffled training shards",
    )
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--out", required=True, help="output shard directory")
    p.add_argument("--lang", default="en")
    p.add_argument("--min-quality", type=float, default=0.5)
    p.add_argument("--keep-bp", type=int, default=9000,
                   help="deterministic sample rate in basis points")
    p.add_argument("--cap", type=int, default=100, help="per-source cap")
    p.add_argument("--shards", type=int, default=8)
    args = p.parse_args(argv)
    if args.shards < 1:
        p.error("--shards must be >= 1")
    if args.cap < 1:
        p.error("--cap must be >= 1")
    if not 0 <= args.keep_bp <= 10000:
        p.error("--keep-bp must be in [0, 10000]")
    return args


def main(argv: Sequence[str] | None = None) -> int:
    args = parse_args(argv)

    from pyspark.sql import functions as F

    from .operators.training_data import write_training_shards
    from .plans.pipeline import curate_survivors
    from .session import get_spark

    spark = get_spark()
    docs = spark.read.parquet(args.input)
    n_in = docs.count()
    survivors = curate_survivors(
        docs,
        min_quality=args.min_quality,
        lang=args.lang,
        keep_bp=args.keep_bp,
        cap=args.cap,
    )
    write_training_shards(survivors, args.out, n_shards=args.shards)
    # zero survivors writes only _SUCCESS — an orchestrator still gets
    # its manifest line (survivors=0), never a schema-inference crash.
    # Pre-CHECK for data files instead of swallowing read errors: a
    # transient read failure after a successful shard write must raise,
    # not masquerade as "nothing survived" (orchestrators gate on this).
    # Hadoop-FS variant, not os.walk: --out may be any URI scheme
    # (hdfs://, s3a://) and a local walk would answer zero for a remote
    # directory Spark just wrote — counts={} despite real shards.
    from .sinks.compaction import fs_dir_stats

    if fs_dir_stats(spark, args.out)[0] > 0:
        manifest = spark.read.parquet(args.out)
        counts = {
            int(r["shard"]): r["n"]
            for r in manifest.groupBy("shard")
            .agg(F.count("*").alias("n"))
            .collect()
        }
    else:
        counts = {}
    print(
        json.dumps(
            {
                "input_docs": n_in,
                "survivors": sum(counts.values()),
                "n_shards": len(counts),
                "docs_per_shard": counts,
                "out": args.out,
            },
            sort_keys=True,
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
