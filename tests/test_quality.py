"""In-flight quality observation (plans/quality.py): counters ride the
materializing job (no second scan) and gate publication."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import (
    check_quality,
    ingest_quality_gate,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import (
    load_transactions,
)
from .conftest import SF0001


def test_clean_batch_passes_and_counts(spark, tmp_path):
    tx = load_transactions(spark, SF0001)
    observed, obs = ingest_quality_gate(tx)
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    m = check_quality(obs)
    assert m["rows"] == tx.count()
    assert m["null_keys"] == 0
    assert m["null_ts"] == 0


def test_dirty_batch_fails_gate(spark):
    tx = load_transactions(spark, SF0001).limit(50)
    dirty = tx.unionByName(
        tx.limit(3).withColumn("cc_num", F.lit(None).cast("long"))
    )
    observed, obs = ingest_quality_gate(dirty)
    observed.count()  # any single action materializes the counters
    with pytest.raises(ValueError, match="null_keys=3"):
        check_quality(obs)
