from __future__ import annotations

import pytest

from amazon_sagemaker_feature_store_streaming_aggregation_spark import get_spark

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s
    s.stop()


def plan_str(df) -> str:
    """Executed-plan string for plan-shape assertions (single home so
    AQE/stringification changes are fixed in one place)."""
    return df._jdf.queryExecution().executedPlan().toString()
