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
    return p.parse_args(argv)


def main(argv: Sequence[str] | None = None) -> int:
    args = parse_args(argv)

    from pyspark.sql import functions as F

    from .operators.training_data import cap_per_source, write_training_shards
    from .plans.pipeline import _cleaned
    from .session import get_spark

    spark = get_spark()
    docs = spark.read.parquet(args.input)
    n_in = docs.count()
    survivors = cap_per_source(
        _cleaned(
            docs, args.min_quality, args.lang, args.keep_bp, "text", "doc_id"
        ).select("doc_id", "text", "source"),
        cap=args.cap,
        presort_cap=4 * args.cap,
    )
    write_training_shards(survivors, args.out, n_shards=args.shards)
    manifest = spark.read.parquet(args.out)
    counts = {
        int(r["shard"]): r["n"]
        for r in manifest.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
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
