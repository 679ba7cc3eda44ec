"""Format parity for the batch sources: the SAME transaction rows read
back identically from CSV, JSON-lines and ORC (schema-declared scans,
no inference), and the columnar formats keep predicate pushdown."""

from __future__ import annotations

from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import (
    load_transactions,
    read_transactions_csv,
    read_transactions_jsonl,
    read_transactions_orc,
)

from .conftest import SF0001


def _rows(df):
    return sorted(
        (r["tid"], r["datetime"], r["cc_num"], round(r["amount"], 9))
        for r in df.select("tid", "datetime", "cc_num", "amount").collect()
    )


def test_jsonl_and_orc_roundtrip_match_parquet(spark, tmp_path):
    from pyspark.sql import functions as F

    tx = (
        load_transactions(spark, SF0001)
        .limit(500)
        .withColumn("tid", F.col("tid").cast("string"))  # declared type
    )
    want = _rows(tx)

    jdir, odir = str(tmp_path / "j"), str(tmp_path / "o")
    # microsecond-carrying format on BOTH sides (default truncates to
    # ms); the NTZ column uses timestampNTZFormat on write
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    tx.write.option("timestampFormat", fmt).option(
        "timestampNTZFormat", fmt
    ).json(jdir)
    # ORC files store the declared (LTZ) timestamp type — the reader
    # schema cannot coerce an NTZ-typed file column
    tx.withColumn("datetime", F.col("datetime").cast("timestamp")).write.orc(
        odir
    )

    assert _rows(read_transactions_jsonl(spark, jdir)) == want
    assert _rows(read_transactions_orc(spark, odir)) == want


def test_orc_scan_pushes_predicates(spark, tmp_path):
    from pyspark.sql import functions as F

    odir = str(tmp_path / "o")
    load_transactions(spark, SF0001).limit(500).withColumn(
        "datetime", F.col("datetime").cast("timestamp")
    ).write.orc(odir)
    plan = (
        read_transactions_orc(spark, odir)
        .filter("cc_num = 7")
        .select("tid", "amount")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "cc_num" in plan.split("PushedFilters")[1][:80]
    # column pruning: the scan schema must not include fraud_label
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "fraud_label" not in read_schema
