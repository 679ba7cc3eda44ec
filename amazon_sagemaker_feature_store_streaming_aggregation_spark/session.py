"""SparkSession factory with scale-aware defaults.

Local test runs use ``local[N]`` (one JVM); the configuration below is
chosen so the same logical plans survive a 1000-executor cluster:

* AQE on (runtime coalescing, skew-join splitting) — at 100 TB the static
  shuffle-partition count is always wrong, AQE re-plans from actual map
  output sizes;
* Arrow transfer on, so the few Pandas-UDF operators batch via Arrow
  instead of pickling rows;
* UTC session timezone — event-time arithmetic must not depend on the
  driver host's zone;
* shuffle partitions sized to the local core count for tests (a cluster
  deployment overrides this; AQE coalesces either way).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "feature-aggregation-engine",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all local cores.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 0)) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 4)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # InferFiltersFromGenerate turns explode(expensive_expr) into a
        # scan-level filter size(expensive_expr)>0 that is pushed below
        # every exchange — the whole array expression then re-evaluates
        # in the scan task (measured: minhash/fingerprint queries ran
        # their md5 pipelines twice, once single-task). The inferred
        # filter is worthless for our always-non-empty arrays.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        # Every query compiles fresh whole-stage-codegen classes; across
        # a few dozen queries (plus streaming's class load) the default
        # 240 MB JIT code cache fills, HotSpot disables compilation, and
        # CPU-bound expression loops (md5/minhash) crawl ~10x until the
        # sweeper frees space — observed as a roving ~40 s slow window
        # mid-benchmark. 512 MB keeps the JIT on for the whole run.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing",
        )
        # Streaming micro-batches in tests write checkpoints under /tmp.
        .config("spark.sql.streaming.stateStore.stateSchemaCheck", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
