"""The overlapped-action helper behind every standing runner's
order-free write groups (``streaming/dedup.py::_run_independent``):
all thunks run (concurrently when more than one), the FIRST failure
propagates only after every thunk settles — so a runner's
``_touch_success`` after a failing group never executes and no
half-submitted write is abandoned mid-flight — and concurrent Spark
write actions from driver threads land both artifacts correctly."""

from __future__ import annotations

import threading
import time

import pytest

from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming.dedup import (
    _run_independent,
)


def test_single_thunk_runs_inline():
    ran = []
    main_tid = threading.get_ident()
    _run_independent(lambda: ran.append(threading.get_ident()))
    assert ran == [main_tid]


def test_all_thunks_run_concurrently():
    started = threading.Barrier(3, timeout=10)
    done = []

    def mk(i):
        def t():
            # every thunk must be in flight at once for the barrier to
            # release — serial execution would deadlock (and time out)
            started.wait()
            done.append(i)

        return t

    _run_independent(mk(0), mk(1), mk(2))
    assert sorted(done) == [0, 1, 2]


def test_failure_propagates_after_all_settle():
    settled = []

    def slow_ok():
        time.sleep(0.2)
        settled.append("ok")

    def fast_fail():
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        _run_independent(slow_ok, fast_fail)
    # the surviving thunk was NOT abandoned when its sibling failed
    assert settled == ["ok"]


def test_concurrent_spark_writes_land_both(spark, tmp_path):
    a = spark.range(100).withColumnRenamed("id", "x")
    b = spark.range(50).withColumnRenamed("id", "y")
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    _run_independent(
        lambda: a.write.mode("overwrite").parquet(pa),
        lambda: b.write.mode("overwrite").parquet(pb),
    )
    assert spark.read.parquet(pa).count() == 100
    assert spark.read.parquet(pb).count() == 50
