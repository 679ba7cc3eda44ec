"""Online feature store: keyed latest-record-per-key table.

Re-expression of the reference's SageMaker Feature Store usage as a
Spark-native keyed table:

* schema with a mandatory *record identifier* feature and *event time*
  feature — reference ``notebooks/schema/cc-agg-fg-schema.json:26-27``,
  creation API ``notebooks/1_setup.ipynb:263-270``;
* ``upsert`` = latest-record-per-key merge (the semantics of repeated
  ``put_record``, ``src/lambda/StreamingIngestAggFeatures/
  lambda_function.py:25-32``);
* point ``get_record`` by identifier — ``src/lambda/
  InvokeFraudEndpointLambda/lambda_function.py:262-277``.

Scale design (100 TB / 1000 executors)
--------------------------------------
The store is a snapshot-versioned parquet table hash-bucketed on the
record identifier:

* every snapshot is written ``partitionBy(bucket)`` where
  ``bucket = pmod(xxhash64(key), n_buckets)`` — a point lookup prunes
  to ONE bucket directory (partition pruning on the filter), and the
  upsert's latest-per-key window shuffles once on the same key the data
  is already bucketed by;
* upsert is a distributed window merge (``row_number() over (partition
  by key order by event_time desc) = 1``) — never a driver-side
  ``collect`` + RPC loop like the reference's batch ingest
  (``2_batch_ingestion.ipynb:311-343``); on a real deployment the same
  logic is a Delta/Iceberg ``MERGE INTO`` — snapshot versioning here
  keeps the engine dependency-free;
* snapshots give readers a consistent view while an upsert is in
  flight (the ``_VERSION`` pointer flips only after the new snapshot is
  fully written).

The tie policy is ``row_number`` (exactly one row per key). The
reference's *batch* dedup uses ``dense_rank`` (keeps ties,
``2_batch_ingestion.ipynb:303-307``) — that operator lives in
``operators/latest_per_key.py``; a *store* must hold one record per
identifier (``put_record`` overwrite semantics), hence row_number with
a deterministic tie-break on all value columns.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_BUCKET = "__fg_bucket"


class FeatureGroup:
    """A keyed latest-record-per-key feature table on parquet snapshots."""

    def __init__(
        self,
        spark: SparkSession,
        name: str,
        record_identifier_feature_name: str,
        event_time_feature_name: str,
        base_path: str,
        n_buckets: int = 16,
    ) -> None:
        self.spark = spark
        self.name = name
        self.key = record_identifier_feature_name
        self.event_time = event_time_feature_name
        self.path = os.path.join(base_path, name)
        self.n_buckets = n_buckets
        os.makedirs(self.path, exist_ok=True)

    # ---------------------------------------------------------------- state
    def _version_file(self) -> str:
        return os.path.join(self.path, "_VERSION")

    def _current_version(self) -> int:
        try:
            with open(self._version_file()) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return 0

    def _snapshot_dir(self, version: int) -> str:
        return os.path.join(self.path, f"v={version}")

    def exists(self) -> bool:
        return self._current_version() > 0

    # ---------------------------------------------------------------- write
    def upsert(self, df: DataFrame) -> None:
        """Merge ``df`` into the store, keeping the latest record per key.

        Rows missing the event-time column are stamped with the current
        timestamp (the reference stamps ``trans_time = now()`` at ingest,
        ``StreamingIngestAggFeatures/lambda_function.py:29``).
        """
        if self.event_time not in df.columns:
            df = df.withColumn(self.event_time, F.current_timestamp())
        df = df.filter(F.col(self.key).isNotNull())

        cur = self._current_version()
        if cur > 0:
            existing = self.spark.read.parquet(self._snapshot_dir(cur)).drop(_BUCKET)
            df = existing.unionByName(df, allowMissingColumns=True)

        value_cols = [c for c in df.columns if c not in (self.key, self.event_time)]
        w = Window.partitionBy(self.key).orderBy(
            F.col(self.event_time).desc(), *[F.col(c).desc_nulls_last() for c in value_cols]
        )
        latest = (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .withColumn(_BUCKET, F.pmod(F.xxhash64(F.col(self.key)), F.lit(self.n_buckets)))
        )

        nxt = cur + 1
        latest.write.mode("overwrite").partitionBy(_BUCKET).parquet(
            self._snapshot_dir(nxt)
        )
        tmp = self._version_file() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(nxt))
        os.replace(tmp, self._version_file())
        # Retire snapshots older than the previous one (kept for in-flight readers).
        for v in range(1, cur):
            old = self._snapshot_dir(v)
            if os.path.isdir(old):
                shutil.rmtree(old, ignore_errors=True)

    def put_record(self, record: dict) -> None:
        """Single-record upsert (reference ``put_record`` parity).

        Driver-side convenience only — at scale, batch ``upsert`` is the
        API; a per-record loop is the reference's anti-pattern.
        """
        self.upsert(self.spark.createDataFrame([record]))

    # ----------------------------------------------------------------- read
    def get_latest(self) -> DataFrame:
        """The full latest-record-per-key table (one row per key)."""
        cur = self._current_version()
        if cur == 0:
            raise ValueError(f"feature group {self.name!r} has no data")
        return self.spark.read.parquet(self._snapshot_dir(cur)).drop(_BUCKET)

    def get_record(self, identifier) -> dict | None:
        """Point lookup by record identifier (reference ``get_record``).

        The bucket predicate prunes the scan to one partition directory;
        the key predicate pushes down into the parquet row groups.
        """
        cur = self._current_version()
        if cur == 0:
            return None
        snap = self.spark.read.parquet(self._snapshot_dir(cur))
        # xxhash64 is type-sensitive: the literal must carry the stored
        # key type (lit(7) is int, a long key hashes differently).
        key_type = snap.schema[self.key].dataType
        key_lit = F.lit(identifier).cast(key_type)
        bucket = (
            self.spark.range(1)
            .select(F.pmod(F.xxhash64(key_lit), F.lit(self.n_buckets)))
            .first()[0]
        )
        rows = (
            snap.filter((F.col(_BUCKET) == bucket) & (F.col(self.key) == identifier))
            .drop(_BUCKET)
            .limit(1)
            .collect()
        )
        return rows[0].asDict() if rows else None
