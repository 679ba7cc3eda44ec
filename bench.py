"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced to FULL materialization with a row count + an
xxhash64-over-all-columns checksum aggregate — a bare ``count()`` lets
Catalyst prune every derived column (a window query 'benchmarked' with
count() never computes the windows).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark import get_spark


def force(df):
    """Materialize every column: (row_count, checksum) in one pass."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("checksum"),
    ).first()
    return row["n"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    qmap = entrymod.queries()

    # Best-of-N per query (default 2): this host shows occasional
    # multi-second whole-VM pauses (CPU idle, load rising) that land
    # inside whichever query is running and poison its wall-clock;
    # min-of-2 keeps one pause from being recorded as query cost. Every
    # rep still fully materializes via the checksum aggregate.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in qmap.items():
        best, n = None, 0
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = force(df)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        total += best
        print(f"# {name}: {best:.3f}s rows={n}", file=sys.stderr)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
