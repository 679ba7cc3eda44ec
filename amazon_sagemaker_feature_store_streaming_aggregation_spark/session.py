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


def local_rows(spark: SparkSession, rows: list, schema) -> "DataFrame":
    """Small driver-side constant table as a JVM ``LocalTableScan``.

    ``spark.createDataFrame(python_list)`` builds a Python-PICKLED RDD
    (``Scan ExistingRDD`` in the plan): every downstream action ships
    the pickle to a Python worker and pays worker spin-up — measured
    ~4.6 s PER ACTION for a 1-row frame on the bench host, vs ~0.2 s
    for the Arrow path. Constant tables sit on per-trigger hot paths
    (store ``_meta`` sidecars, centroid seeds, BPE merge tables,
    quality cutoffs), so they must stay JVM-side: routing the rows
    through a pandas frame with an EXPLICIT schema produces an
    Arrow-backed ``LocalTableScan`` that never touches a Python worker
    again. Empty inputs can't take that route (zero-row pandas frames
    fall back to the pickled RDD), so they build as a ``range(0)``
    projection — also pure JVM.

    ``rows`` is a list of tuples; ``schema`` is a DDL string or
    ``StructType``. Driver-sized inputs only (vocab/meta/constant
    scale) — corpus data belongs in files, never on the driver.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if not rows:
        return spark.range(0).select(
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ]
        )
    import pandas as pd

    pdf = pd.DataFrame.from_records(
        list(rows), columns=[f.name for f in schema.fields]
    )
    return spark.createDataFrame(pdf, schema=schema)
