"""Semantic tests for training-data sharding
(operators/training_data.py): global shuffle, per-source caps, and
context-window packing, on micro-fixtures where the expected answer
is computable by eye — plus the two-phase == one-phase equivalence
property that justifies the skew-guarded cap path.

(DuckDB oracle equivalence of the registered queries is covered by
tests/test_entry_oracles.py.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.training_data import (
    cap_per_source,
    global_shuffle,
    pack_context_windows,
    write_training_shards,
)


def _docs(spark, n=40, n_sources=4):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % n_sources).cast("string")).alias("source"),
        # deterministic text with id-dependent token count (3..10 words)
        F.concat(
            F.lit("w "),
            F.repeat(F.lit("tok "), (F.col("id") % 8 + 2).cast("int")),
        ).alias("text"),
    )


def test_global_shuffle_is_a_permutation(spark):
    df = _docs(spark)
    out = global_shuffle(df, n_shards=4).select("doc_id", "shard", "pos").collect()
    # every doc appears exactly once
    assert sorted(r.doc_id for r in out) == list(range(40))
    # per-shard positions are 1..n contiguous
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= {0, 1, 2, 3}
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_global_shuffle_deterministic_and_seed_sensitive(spark):
    df = _docs(spark)
    a = {(r.doc_id, r.shard, r.pos) for r in global_shuffle(df, n_shards=4).collect()}
    b = {(r.doc_id, r.shard, r.pos) for r in global_shuffle(df, n_shards=4).collect()}
    assert a == b  # reproducible across runs
    c = {
        (r.doc_id, r.shard, r.pos)
        for r in global_shuffle(df, n_shards=4, seed="other-seed").collect()
    }
    assert a != c  # the seed actually steers the permutation


def test_cap_per_source_exact_and_two_phase_equal(spark):
    df = _docs(spark, n=80, n_sources=4)  # 20 docs per source
    one = cap_per_source(df, cap=5)
    two = cap_per_source(df, cap=5, presort_cap=10)
    kept_one = {(r.doc_id, r.source) for r in one.collect()}
    kept_two = {(r.doc_id, r.source) for r in two.collect()}
    # exactness: 5 per source, and the hash-prefilter changes nothing
    assert kept_one == kept_two
    per_src: dict[str, int] = {}
    for _id, src in kept_one:
        per_src[src] = per_src.get(src, 0) + 1
    assert per_src == {f"src{i}": 5 for i in range(4)}


def test_cap_per_source_under_cap_keeps_all(spark):
    df = _docs(spark, n=12, n_sources=4)  # 3 per source < cap
    kept = cap_per_source(df, cap=5, presort_cap=10)
    assert kept.count() == 12


def test_pack_windows_partition_token_stream(spark):
    df = _docs(spark)
    budget = 16
    packed = pack_context_windows(df, n_shards=2, budget=budget).collect()
    tok = F.expr("size(filter(split(trim(text), '\\\\s+'), t -> t != ''))")
    total_tokens = df.select(F.sum(tok)).first()[0]
    total_docs = df.count()
    # every doc is packed exactly once; token mass is conserved
    assert sum(r.n_docs for r in packed) == total_docs
    assert sum(r.win_tokens for r in packed) == total_tokens
    for shard in {r.shard for r in packed}:
        rows = sorted((r for r in packed if r.shard == shard), key=lambda r: r.win)
        # windows hold contiguous position ranges that tile the shard
        assert rows[0].first_pos == 1
        for prev, cur in zip(rows, rows[1:]):
            assert cur.first_pos == prev.last_pos + 1
        # window ids advance by the token mass of the window: the
        # next window index is floor(cum_tokens / budget) of the
        # stream so far — i.e. wins are non-decreasing and a window
        # never *starts* beyond the budget boundary it belongs to
        cum = 0
        for r in rows:
            assert r.win == cum // budget
            cum += r.win_tokens


# ---- physical-plan pins (same discipline as tests/test_plans.py) ----

from .conftest import plan_str as _plan  # noqa: E402


def test_global_shuffle_single_exchange(spark):
    df = global_shuffle(_docs(spark), n_shards=4)
    plan = _plan(df)
    # one hash exchange on shard; per-shard sort, never a global one
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "rangepartitioning" not in plan, plan


def test_pack_windows_adds_no_exchange_beyond_shuffle(spark):
    packed = pack_context_windows(_docs(spark), n_shards=4, budget=16)
    plan = _plan(packed)
    # ONE exchange total: both windows sort on the shard partitioning,
    # and the final groupBy(shard, win) reuses it too — equal
    # (shard, win) implies equal shard, so hashpartitioning(shard)
    # already satisfies the aggregate's clustering requirement
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_cap_two_phase_broadcasts_thresholds(spark):
    kept = cap_per_source(_docs(spark, n=80), cap=5, presort_cap=10)
    plan = _plan(kept)
    # the per-source threshold table rides a broadcast, not a shuffle
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_write_training_shards_preserves_shuffle_order(spark, tmp_path):
    df = _docs(spark)
    out = str(tmp_path / "shards")
    write_training_shards(df, out, n_shards=4)
    expected = {
        (r.shard, r.pos): r.doc_id
        for r in global_shuffle(df, n_shards=4).collect()
    }
    import glob
    import pyarrow.parquet as pq

    seen = 0
    for shard_dir in glob.glob(f"{out}/shard=*"):
        shard = int(shard_dir.rsplit("=", 1)[1])
        files = sorted(glob.glob(f"{shard_dir}/*.parquet"))
        ids = []
        for f in files:
            ids.extend(pq.read_table(f, columns=["doc_id", "pos"]).to_pydict()["doc_id"])
            # on-disk row order must equal pos order within the file
            pos = pq.read_table(f, columns=["pos"]).to_pydict()["pos"]
            assert pos == sorted(pos)
        # file rows in shard follow the deterministic shuffle sequence
        want = [expected[(shard, p)] for p in range(1, len(ids) + 1)]
        assert ids == want
        seen += len(ids)
    assert seen == 40


def test_cap_two_phase_keeps_null_source_group(spark):
    # NULL sources are a real group for the one-phase window; the
    # two-phase threshold join must match them too (null-safe join)
    rows = [(i, "srcA") for i in range(30)] + [(i + 100, None) for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    one = {(r.doc_id, r.source) for r in cap_per_source(df, cap=5).collect()}
    two = {
        (r.doc_id, r.source)
        for r in cap_per_source(df, cap=5, presort_cap=20).collect()
    }
    assert one == two
    assert sum(1 for _id, s in two if s is None) == 5


def test_write_training_shards_no_idle_tasks(spark):
    # range partitioning (not hash-of-shard) must spread the write:
    # with 4 shards over 4 tasks every task holds rows
    df = _docs(spark)
    parts = (
        global_shuffle(df, n_shards=4)
        .repartitionByRange(4, F.col("shard"), F.col("pos"))
        .withColumn("pid", F.spark_partition_id())
        .select("pid")
        .distinct()
        .count()
    )
    assert parts == 4


def test_chunk_documents_covers_text_with_overlap(spark):
    """Chunk boundary semantics: step = chunk - overlap, final chunk
    may be short, short/empty texts yield exactly one chunk, and
    consecutive chunks overlap by exactly `overlap` chars."""
    from pyspark.sql import functions as F

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.training_data import (
        chunk_documents,
    )

    text = "abcdefghij" * 5  # 50 chars
    docs = spark.createDataFrame(
        [(1, text), (2, "tiny"), (3, "")], ["doc_id", "text"]
    )
    out = chunk_documents(docs, chunk_chars=20, overlap=5).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1 (50 chars): starts 1, 16, 31 (step 15; starts stop at
    # length - overlap = 45, so the would-be start 46 — whose chunk is
    # fully contained in chunk 31..50 — is NOT emitted)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["chunk_start"] for r in c1] == [1, 16, 31]
    assert [r["chunk_len"] for r in c1] == [20, 20, 20]
    # coverage: the last chunk reaches the end of the text
    assert c1[-1]["chunk_start"] + c1[-1]["chunk_len"] - 1 == 50
    # overlap check: chunk i's window [s, s+20) overlaps next by 5
    for a, b in zip(c1, c1[1:]):
        assert (a["chunk_start"] + 20) - b["chunk_start"] == 5
    # short and empty docs: one chunk each
    assert [r["chunk_len"] for r in by_doc[2]] == [4]
    assert [r["chunk_len"] for r in by_doc[3]] == [0]
    # hashes match h64 of the actual substrings
    want_h = [
        r["h"]
        for r in spark.createDataFrame(
            [(text[i - 1 : i - 1 + 20],) for i in (1, 16, 31)], ["c"]
        )
        .select(F.expr(
            "cast(conv(substring(md5(c), 1, 15), 16, 10) as bigint)"
        ).alias("h"))
        .collect()
    ]
    assert [r["chunk_hash"] for r in c1] == want_h


def test_pack_windows_pluggable_token_count(spark):
    """Tokenizer-fidelity packing: a precomputed subword-count column
    must drive the cut points instead of the whitespace tokenizer —
    same plan, different window boundaries — and a NULL count packs
    as 0 by explicit rule."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.training_data import (
        pack_context_windows,
    )

    # 6 docs, whitespace count 2 each; subword counts 4x larger for
    # doc_id >= 3 so the two tokenizations cut differently
    rows = [(i, "aa bb", 2 if i < 3 else 8) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_subwords long")
    ws = pack_context_windows(df, n_shards=1, budget=6).collect()
    sub = pack_context_windows(
        df, n_shards=1, budget=6, token_count_col="n_subwords"
    ).collect()
    assert sum(r["win_tokens"] for r in ws) == 12  # 6 docs x 2 ws tokens
    assert sum(r["win_tokens"] for r in sub) == 3 * 2 + 3 * 8  # 30 subwords
    # subword packing needs more windows for the same corpus
    assert len(sub) > len(ws)
    # NULL count packs as zero tokens, not as poison for later docs
    dirty = spark.createDataFrame(
        [(1, "x", None), (2, "y", 5)], "doc_id long, text string, n_subwords long"
    )
    out = pack_context_windows(
        dirty, n_shards=1, budget=100, token_count_col="n_subwords"
    ).collect()
    assert sum(r["win_tokens"] for r in out) == 5
    assert sum(r["n_docs"] for r in out) == 2


def test_chunk_documents_excludes_null_text(spark):
    """NULL-text docs emit NO chunk rows (same null routing as
    minhash_signatures) — without the filter, greatest(NULL,1)=1
    would emit one row with a NULL chunk_hash that poisons every
    downstream chunk-hash dedup/embedding stage."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.training_data import (
        chunk_documents,
    )

    docs = spark.createDataFrame(
        [(1, "some text"), (2, None)], ["doc_id", "text"]
    )
    out = chunk_documents(docs, chunk_chars=20, overlap=5).collect()
    assert {r["doc_id"] for r in out} == {1}
    assert all(r["chunk_hash"] is not None for r in out)


def test_token_spectrum_counts_of_counts(spark):
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.tfidf import (
        token_frequency_spectrum,
    )

    docs = spark.createDataFrame(
        [(1, "a A a b B c"), (2, "b  c   d")], ["doc_id", "text"]
    )
    # lower-cased like the sibling vocab builders: a:3, b:3, c:2, d:1
    # -> freq 3: 2 terms, freq 2: 1, freq 1: 1
    got = {
        r["freq"]: r["n_terms"]
        for r in token_frequency_spectrum(docs).collect()
    }
    assert got == {3: 2, 2: 1, 1: 1}


def test_in_batch_negatives_excludes_cluster_mates(spark):
    """Near-dup cluster mates must never appear as negatives even when
    hashed into the same batch; unrelated same-batch docs appear in
    both directions; NULL ids are excluded."""
    from pyspark.sql import functions as F

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.training_data import (
        in_batch_negatives,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(40)] + [(None,)], "doc_id long"
    )
    # docs 0..9 all one near-dup cluster
    clusters = spark.createDataFrame(
        [(i, 0) for i in range(10)], "doc_id long, cluster_id long"
    )
    out = in_batch_negatives(docs, clusters, n_batches=2)
    pairs = {(r.anchor_id, r.negative_id) for r in out.collect()}
    assert pairs, "same-batch unrelated docs must pair"
    # no intra-cluster pair in either direction
    assert not any(a < 10 and b < 10 for a, b in pairs)
    # direction symmetry: anchor/negative both ways for unrelated docs
    assert all((b, a) in pairs for a, b in pairs)
    # NULL id appears nowhere
    assert all(a is not None and b is not None for a, b in pairs)
    # batch assignment is a pure function: two runs identical
    again = {(r.anchor_id, r.negative_id) for r in
             in_batch_negatives(docs, clusters, n_batches=2).collect()}
    assert pairs == again


def test_leakage_safe_split_keeps_clusters_whole(spark):
    """No near-dup edge may straddle train/test; singletons get
    exactly the per-id hash_split assignment; NULL ids drop with the
    label table (the near_dup_clusters rule)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        leakage_safe_split,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.train_prep import (
        hash_split,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(40)] + [(None,)], "doc_id long"
    )
    # chain 0-1-2 and pair (10,11); everything else singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "doc_a long, doc_b long"
    )
    out = leakage_safe_split(docs, pairs).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert None not in by_id and len(by_id) == 40
    # clusters whole: every member shares its cluster's split
    for a, b in [(0, 1), (1, 2), (10, 11)]:
        assert by_id[a]["cluster_id"] == by_id[b]["cluster_id"]
        assert by_id[a]["split"] == by_id[b]["split"]
    # cluster split == hash_split of the cluster id (the convention)
    want = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.where("doc_id is not null"), "doc_id").collect()
    }
    for r in out:
        assert r["split"] == want[r["cluster_id"]]
    # singleton docs: cluster is the own id, split is the own hash
    assert by_id[25]["cluster_id"] == 25 and by_id[25]["split"] == want[25]
    # both sides non-empty at this size (sanity that the split splits)
    splits = {r["split"] for r in out}
    assert splits == {"train", "test"}
