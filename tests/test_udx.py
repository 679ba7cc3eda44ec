"""UDF/UDAF/UDTF surface tests (functions/udx.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.functions.udx import (
    median_value_by_user,
    with_luhn_flag,
    word_positions,
)
from .conftest import SF0001


def test_luhn_known_values(spark):
    # 4532015112830366 is a textbook-valid Luhn number; flipping the
    # check digit must invalidate it.
    df = spark.createDataFrame(
        [(4532015112830366,), (4532015112830367,), (79927398713,)],
        "cc_num long",
    )
    got = [r["luhn_ok"] for r in with_luhn_flag(df).collect()]
    assert got == [1, 0, 1]


def test_luhn_above_2_53_unaffected_by_nulls_in_batch(spark):
    # 9_999_999_999_999_999 > 2^53: a nullable-int64 Arrow batch
    # surfaces as float64 in pandas and rounds it to 1e16 — digits
    # would be computed on a corrupted number.  The string input path
    # must give the same verdict with and without a null in the batch.
    big = 9_999_999_999_999_995  # Luhn-valid 16-digit number
    assert (
        sum(
            (d * 2 - 9 if d * 2 > 9 else d * 2) if i % 2 else d
            for i, d in enumerate(map(int, reversed(str(big))))
        )
        % 10
        == 0
    )
    clean = spark.createDataFrame([(big,)], "cc_num long")
    dirty = spark.createDataFrame(
        [(big,), (None,), (big + 1,)], "cc_num long"
    )
    assert [r["luhn_ok"] for r in with_luhn_flag(clean).collect()] == [1]
    got = {
        r["cc_num"]: r["luhn_ok"] for r in with_luhn_flag(dirty).collect()
    }
    assert got == {big: 1, None: None, big + 1: 0}


def test_udaf_median_matches_sql_percentile(spark):
    ev = spark.read.parquet(f"{SF0001}/events.parquet")
    got = {
        r["user_id"]: r["median_cents"]
        for r in median_value_by_user(ev).collect()
    }
    # lower median == percentile_disc-style pick at (n-1)//2
    want = {
        r["user_id"]: r["m"]
        for r in ev.selectExpr(
            "user_id", "cast(round(value * 100) as bigint) as c"
        )
        .groupBy("user_id")
        .agg(F.expr("sort_array(collect_list(c))").alias("vs"))
        .selectExpr(
            "user_id", "vs[cast((size(vs) - 1) / 2 as int)] as m"
        )
        .collect()
    }
    assert got == want


def test_udtf_equals_posexplode(spark):
    docs = spark.read.parquet(f"{SF0001}/documents.parquet").limit(50)
    via_udtf = word_positions(docs)
    via_builtin = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("p0", "word"),
    ).where(F.col("word") != "").selectExpr(
        "doc_id", "cast(p0 + 1 as int) as pos", "word"
    )
    a = sorted(map(tuple, via_udtf.collect()))
    b = sorted(map(tuple, via_builtin.collect()))
    assert a == b


def test_udtf_irregular_spacing_keeps_original_index(spark):
    # Leading/trailing/consecutive spaces produce empty split tokens;
    # positions must keep the ORIGINAL split index (not compact), to
    # match the posexplode twin and the DuckDB oracle.
    docs = spark.createDataFrame(
        [(1, " a  b "), (2, "x y"), (3, "  "), (4, None)],
        "doc_id long, text string",
    )
    got = sorted(map(tuple, word_positions(docs).collect()))
    assert got == [(1, 2, "a"), (1, 4, "b"), (2, 1, "x"), (2, 2, "y")]
