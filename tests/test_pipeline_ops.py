"""Sessionization, hierarchical rollup, deterministic sampling."""

from __future__ import annotations

import datetime as dt
import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
    deterministic_sample,
    session_stats,
    sessionize,
    stratified_sample,
    time_rollup,
)

T0 = dt.datetime(2024, 3, 1, 10, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")


def test_sessionize_gap_boundaries(spark):
    s = dt.timedelta
    rows = [
        (1, T0, 1.0),                      # session 1
        (1, T0 + s(seconds=1800), 2.0),    # gap == 1800s: NOT > gap -> same
        (1, T0 + s(seconds=3601), 3.0),    # gap 1801s -> session 2
        (1, T0 + s(seconds=9000), 4.0),    # -> session 3
        (2, T0, 5.0),                      # other key: own session 1
    ]
    out = {
        (r["user_id"], r["value"]): r["session_id"]
        for r in sessionize(_ev(spark, rows), gap_s=1800).collect()
    }
    assert out == {(1, 1.0): 1, (1, 2.0): 1, (1, 3.0): 2, (1, 4.0): 3,
                   (2, 5.0): 1}


def test_session_stats(spark):
    s = dt.timedelta
    rows = [
        (1, T0, 1.25),
        (1, T0 + s(seconds=60), 2.50),
        (1, T0 + s(hours=2), 10.0),
    ]
    stats = {
        r["session_id"]: r
        for r in session_stats(_ev(spark, rows), gap_s=1800).collect()
    }
    assert stats[1]["n_events"] == 2
    assert stats[1]["duration_us"] == 60_000_000
    assert stats[1]["value_cents"] == 375
    assert stats[2]["n_events"] == 1 and stats[2]["value_cents"] == 1000


def test_rollup_hierarchy_matches_direct_grouping(spark):
    """Day rows re-aggregated from hour buckets must equal grouping the
    raw events by day directly (lossless re-aggregation)."""
    import random

    rnd = random.Random(11)
    rows = [
        (
            rnd.randrange(3),
            T0 + dt.timedelta(minutes=rnd.randrange(5000)),
            rnd.randrange(1, 10_000) / 100.0,
        )
        for _ in range(500)
    ]
    ev = _ev(spark, rows)
    got = {
        (r["user_id"], r["bucket_start"]): (r["n_events"], r["value_cents"])
        for r in time_rollup(ev, grains=("hour", "day")).collect()
        if r["grain"] == "day"
    }
    direct = {
        (r["user_id"], r["bucket_start"]): (r["n"], r["c"])
        for r in ev.groupBy(
            "user_id", F.date_trunc("day", "ts").alias("bucket_start")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("c"),
        )
        .collect()
    }
    assert got == direct


def test_deterministic_sample_stable_under_repartition(spark):
    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    a = {r["doc_id"] for r in deterministic_sample(docs, 0.3, "doc_id").collect()}
    b = {
        r["doc_id"]
        for r in deterministic_sample(
            docs.repartition(17), 0.3, "doc_id"
        ).collect()
    }
    assert a == b  # membership is a pure function of the id
    assert 0.25 < len(a) / 2000 < 0.35
    # different salts give (near-)independent samples
    c = {
        r["doc_id"]
        for r in deterministic_sample(docs, 0.3, "doc_id", salt="other").collect()
    }
    assert c != a
    overlap = len(a & c) / len(a)
    assert 0.15 < overlap < 0.45  # ~0.3 expected under independence


def test_stratified_sample_rates(spark):
    docs = spark.range(6000).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )
    out = (
        stratified_sample(docs, {"en": 0.5, "de": 0.1}, "lang", "doc_id")
        .groupBy("lang")
        .count()
        .collect()
    )
    counts = {r["lang"]: r["count"] for r in out}
    assert "fr" not in counts  # default fraction 0
    assert 800 < counts["en"] < 1200  # ~1000 of 2000
    assert 120 < counts["de"] < 280  # ~200 of 2000


def test_dedup_append_incremental_equals_full_rerun(spark):
    """The O(batch) incremental formulation must equal re-running
    exact dedup over the whole corpus, restricted to the new batch's
    winners."""
    from pyspark.sql import functions as F

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.dedup import (
        build_text_hash_index,
        dedup_append,
        dedup_exact,
    )

    rows = [
        (0, "alpha"), (1, "beta"), (2, "alpha"),      # existing corpus
        (10, "beta"),   # batch dup of existing
        (11, "gamma"), (12, "gamma"),  # batch-internal dup
        (13, "delta"),  # genuinely new
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    existing = docs.where("doc_id < 10")
    batch = docs.where("doc_id >= 10")

    inc = {
        (r.doc_id,) for r in dedup_append(
            build_text_hash_index(existing), batch
        ).collect()
    }
    # full re-run over everything: batch winners = survivors with a
    # batch id (an existing text always wins by smaller id)
    full = {
        (r.doc_id,)
        for r in dedup_exact(docs).collect()
        if r.doc_id >= 10
    }
    assert inc == full == {(11,), (13,)}


def test_curate_cli_end_to_end(spark, tmp_path, capsys):
    """The curation CLI produces consumable shards and an accurate
    manifest line from a raw documents parquet."""
    import glob
    import json

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.curate_cli import main

    out = str(tmp_path / "shards")
    rc = main([
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--out", out, "--shards", "4", "--cap", "100",
    ])
    assert rc == 0
    manifest = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert manifest["input_docs"] > 0
    assert 0 < manifest["survivors"] <= manifest["input_docs"]
    # on-disk shards match the manifest
    rows = sum(
        spark.read.parquet(f).count()
        for f in glob.glob(f"{out}/shard=*/*.parquet")
    )
    assert rows == manifest["survivors"]


def test_curate_cli_zero_survivors_emits_manifest(tmp_path, capsys):
    """Filters that keep nothing must still yield the one-line JSON
    manifest (survivors=0), not a schema-inference crash."""
    import json

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.curate_cli import main

    rc = main([
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--out", str(tmp_path / "none"), "--lang", "zz",
    ])
    assert rc == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["survivors"] == 0 and m["n_shards"] == 0


def test_curate_cli_rejects_bad_args(capsys):
    import pytest as _pytest

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.curate_cli import parse_args

    for bad in (["--shards", "0"], ["--cap", "0"], ["--keep-bp", "10001"]):
        with _pytest.raises(SystemExit):
            parse_args(["--input", "x", "--out", "y", *bad])


def test_dedup_append_bloom_exact_even_at_saturation(spark):
    """The Bloom prefilter must be a pure optimization: with a
    ridiculously small bitmap (64 bits for 200 corpus texts — heavily
    saturated, so most batch rows are false positives and take the
    exact anti-join path) AND with a roomy bitmap (mostly
    definite-new path), the output must equal plain dedup_append."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.dedup import (
        build_dedup_bloom,
        build_text_hash_index,
        dedup_append,
        dedup_append_bloom,
    )

    corpus = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(200)], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        # 50 dups of the corpus + 50 new + an internal dup pair
        [(1000 + i, f"text number {i}") for i in range(50)]
        + [(2000 + i, f"fresh {i}") for i in range(50)]
        + [(3000, "fresh 0")],
        ["doc_id", "text"],
    )
    index = build_text_hash_index(corpus)
    want = sorted(
        map(tuple, dedup_append(index, batch).collect())
    )
    for m in (64, 1 << 16):
        bloom = build_dedup_bloom(index, num_bits=m)
        got = sorted(
            map(
                tuple,
                dedup_append_bloom(index, batch, bloom, num_bits=m).collect(),
            )
        )
        assert got == want, f"num_bits={m}"
    # and the roomy bitmap actually prunes: most fresh rows skip the
    # anti-join (no false-positive saturation)
    assert len(want) == 50  # fresh 0..49, internal dup collapsed


def test_weighted_sample_rates_follow_weights(spark):
    """Keep rate per weight tier must track the weight (0 keeps
    nothing, 1 keeps everything, 0.5 keeps about half), and membership
    must be a pure function of the id (stable under repartition)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.sampling import weighted_sample

    rows = [(i, [0.0, 0.5, 1.0][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, ["id", "w"])
    kept = weighted_sample(df, "w", id_col="id")
    by_w = {
        r["w"]: r["n"]
        for r in kept.groupBy("w").agg(F.count("*").alias("n")).collect()
    }
    assert by_w.get(0.0, 0) == 0
    assert by_w[1.0] == 1000
    assert 400 <= by_w[0.5] <= 600
    a = {r["id"] for r in kept.collect()}
    b = {r["id"] for r in weighted_sample(df.repartition(7), "w", id_col="id").collect()}
    assert a == b
    # NULL weight counts as 0 by documented rule (explicit coalesce,
    # not an accidental NULL-fails-the-filter): row excluded
    dirty = spark.createDataFrame([(1, None), (2, 1.0)], "id long, w double")
    assert [r["id"] for r in weighted_sample(dirty, "w", id_col="id").collect()] == [2]


def test_source_overlap_matrix_counts_shared_texts(spark):
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.dedup import source_overlap_matrix

    rows = [
        ("a", "s1"), ("b", "s1"), ("c", "s1"),
        ("a", "s2"), ("b", "s2"),          # s1 ∩ s2 = {a, b}
        ("a", "s3"),                        # s1 ∩ s3 = s2 ∩ s3 = {a}
        ("a", "s1"),                        # duplicate within s1: no double count
    ]
    docs = spark.createDataFrame(rows, ["text", "source"])
    got = {
        (r["source_a"], r["source_b"]): r["n_shared"]
        for r in source_overlap_matrix(docs).collect()
    }
    assert got == {("s1", "s2"): 2, ("s1", "s3"): 1, ("s2", "s3"): 1}


def test_dedup_append_bloom_keeps_null_text_rows_like_plain(spark):
    """A NULL text hashes to NULL: the Bloom path must keep such rows
    exactly as the plain path does (NULL hash never matches the
    anti-join), not silently drop them into neither branch."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.dedup import (
        build_dedup_bloom,
        build_text_hash_index,
        dedup_append,
        dedup_append_bloom,
    )

    corpus = spark.createDataFrame([(1, "seen")], ["doc_id", "text"])
    batch = spark.createDataFrame(
        [(10, "seen"), (11, None), (12, "new")], ["doc_id", "text"]
    )
    index = build_text_hash_index(corpus)
    bloom = build_dedup_bloom(index, num_bits=1 << 10)
    want = sorted(map(tuple, dedup_append(index, batch).collect()))
    got = sorted(
        map(
            tuple,
            dedup_append_bloom(
                index, batch, bloom, num_bits=1 << 10
            ).collect(),
        )
    )
    assert got == want
    assert {r[0] for r in got} == {11, 12}  # null-text row survives
