"""Document deduplication operators (training-data pipeline extension).

Beyond the reference's own surface (its only dedup-like op is
latest-per-key, ``2_batch_ingestion.ipynb:303-307``), a 100 TB training
-data pipeline needs document dedup. All operators below are pure JVM
column expressions / joins — no Python UDFs — and every hash is the
cross-engine-reproducible md5-based ``h64`` (functions/hashing.py), so
each operator has an exact DuckDB oracle.

Scale notes per operator:

* ``dedup_exact`` — one hash-shuffle on a 60-bit text hash (not the
  full text: shuffle keys stay 8 bytes); keeps the min doc_id per group.
* ``minhash_signatures`` / ``lsh_candidate_pairs`` — the classic
  MinHash+LSH banding pipeline: signatures are computed scan-side
  (higher-order array exprs, no shuffle), candidates come from ONE
  shuffle on (band_id, band_hash); pair verification joins only within
  buckets. This is the scale path for near-dup: O(N·bands) shuffle
  rows, never O(N^2) comparisons.
* ``ngram_jaccard_pairs`` — exact pairwise Jaccard via a shingle
  self-join; O(sum_shingle_freq^2) blowup on hot shingles, so it is the
  *verification* stage to run on LSH candidates (or small corpora), not
  the discovery stage. Common-shingle counting happens map-side first.
* ``simhash`` — 60-bit per-document signature from token-hash bit
  votes; exact-match grouping on the signature finds near-dups with
  single-bit tolerance left to a banded variant.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import h64, shingle_hashes

DEFAULT_SHINGLE_K = 9
SIMHASH_BITS = 60


def _let_bound(expensive: str, var: str, body: str) -> str:
    """Bind ``expensive`` ONCE as lambda variable ``var`` inside a
    single projection expression: ``transform(array(e), v -> body)[0]``.

    Catalyst's CollapseProject inlines a withColumn'd array into every
    consumer lambda (recomputing an md5-heavy array per consumer — the
    O(n·seeds) pathology); the classic fix was an exchange barrier
    between the two projections, i.e. a full extra shuffle of the
    corpus. The single-element-transform let binding removes the need:
    the expensive subtree appears exactly once in the expression tree,
    so no projection collapse can duplicate it — and no barrier shuffle
    is paid. (Higher-order functions evaluate their argument once per
    outer element; the outer array has exactly one element.)"""
    return f"transform(array({expensive}), {var} -> {body})[0]"


def _parallelize_scan(df: DataFrame) -> DataFrame:
    """Repartition ONLY when the scan under-parallelizes the cluster
    (local single-file inputs -> 1-2 partitions; the md5-heavy
    projections must not run single-task). A 100 TB input already has
    thousands of splits — repartitioning it would be a pointless full
    shuffle of the corpus text, so it is skipped. Streaming inputs
    pass through untouched: partition introspection (.rdd) is illegal
    on a streaming DataFrame, and micro-batch parallelism is the
    source's concern (maxFilesPerTrigger / input partitions)."""
    if df.isStreaming:
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= min(par, 8):
        return df
    return df.repartition(par)


def _shingle_expr(text_col: str, k: int) -> str:
    """Distinct character-k-gram 60-bit hashes, as a SQL array expr —
    delegates to functions/hashing.py::shingle_expr, the single source
    of shingle semantics for discovery AND verification stages."""
    from ..functions.hashing import shingle_expr

    return shingle_expr(text_col, k)


def dedup_exact(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_bits: int = 64,
) -> DataFrame:
    """Exact dedup: keep the smallest id per distinct text.

    The default group key is ``h64(text)`` (8-byte shuffle key; ~N²/2⁶¹
    expected collisions — negligible through ~10⁸ docs, ~0.4 expected
    at 10⁹). ``hash_bits=128`` switches to the full md5 digest
    (``functions/hashing.py::h128``) for the ≥10⁹-doc regime — a
    32-byte key, still tiny against the texts it stands in for.
    """
    from ..functions.hashing import content_key

    return (
        docs.withColumn("__th", content_key(text_col, hash_bits))
        .groupBy("__th")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
        .drop("__th")
    )


def dedup_url_canonical(
    docs: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level exact dedup — the standard FIRST pass of the public
    CC curation recipes (RefinedWeb arXiv:2306.01116 §3.2; see
    ``functions/url.py`` for the canonical form): one row per distinct
    CANONICAL url, carrying the smallest surviving ``id_col``
    (``keep_id``), the distinct-document count collapsed into it
    (``n_docs``), and the canonical ``domain`` (host) — the grouping
    key ``cap_per_source(source_col="domain")`` consumes for
    per-domain caps.

    Runs before any content dedup at 100 TB because it is the cheap
    pass: the canonicalization is scan-side string work inside the
    same codegen stage as the read, and the only shuffle is the
    groupBy on the canonical string. Rows with a NULL/unparseable URL
    or NULL id identify no page and join no group (the engine-wide
    NULL-key rule) — they are EXCLUDED here; a pipeline that wants
    them routes them explicitly, exactly like NULL-text rows around
    ``dedup_exact``.
    """
    from ..functions.url import canonical_host_sql, with_canonical_url

    return (
        with_canonical_url(docs, url_col)
        .where(
            F.col("canonical_url").isNotNull() & F.col(id_col).isNotNull()
        )
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.countDistinct(id_col).alias("n_docs"),
        )
        .withColumn("domain", F.expr(canonical_host_sql("canonical_url")))
    )


def dedup_append(
    corpus_index: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental exact dedup for CONTINUOUS ingestion: given the
    existing corpus's hash index (``text_hash`` rows, the running
    artifact a curation pipeline persists between batches) and a new
    batch of documents, return the batch's genuinely-new survivors —
    dedup'd within the batch (smallest id per text) AND against
    everything already ingested.

    This is the O(batch) formulation of "re-run dedup over the whole
    corpus": within-batch dedup is one aggregation over the batch's
    8-byte text hashes, and the against-corpus check is an anti-join
    of batch hashes against the index — the corpus never rescans, and
    the index rides the shuffle as bare hashes (at 100 TB the index
    is ~0.1% of corpus bytes). The survivors' ``(text_hash)`` rows are
    exactly what the caller appends to the index for the next batch —
    ``build_text_hash_index`` bootstraps it.

    This formulation still shuffles the INDEX once per batch. For the
    standing-pipeline case persist the index bucketed on ``text_hash``
    (:func:`build_text_hash_index_bucketed`) and use
    :func:`dedup_append_bucketed`: the index scan then already
    satisfies the anti-join's partitioning, so only the O(batch) side
    moves — the plan-pin test asserts zero exchange above the index.
    """
    batch_best = (
        new_docs.withColumn(
            "text_hash", _index_content_key(corpus_index, text_col)
        )
        .groupBy("text_hash")
        .agg(F.min(id_col).alias(id_col))
    )
    fresh = batch_best.join(
        corpus_index.select("text_hash"), on="text_hash", how="left_anti"
    )
    return fresh.select(id_col, "text_hash")


def _index_content_key(corpus_index: DataFrame, text_col: str):
    """The batch-side content key at the WIDTH THE INDEX WAS BUILT
    WITH, inferred from its ``text_hash`` dtype (bigint → h64,
    string → h128). Inference instead of a parameter: the width is
    baked into the persisted index, and a mismatched parameter would
    hash the batch into a different key space — every prior document
    would silently look new (worse, a long-vs-string equi-join would
    ANSI-cast instead of failing)."""
    from ..functions.hashing import content_key

    dtype = dict(corpus_index.dtypes).get("text_hash")
    if dtype == "bigint":
        return content_key(text_col, 64)
    if dtype == "string":
        return content_key(text_col, 128)
    raise ValueError(
        f"corpus index text_hash has dtype {dtype!r}; expected bigint "
        "(h64 index) or string (h128 index)"
    )


def build_text_hash_index(
    docs: DataFrame, text_col: str = "text", hash_bits: int = 64
) -> DataFrame:
    """The persistent dedup index for :func:`dedup_append`: one
    ``text_hash`` row per distinct text already in the corpus.
    ``hash_bits=128`` builds the full-md5 (string-keyed) index for the
    ≥10⁹-doc regime; :func:`dedup_append` infers the width from the
    index dtype, so the pair can never silently mismatch."""
    from ..functions.hashing import content_key

    return docs.select(
        content_key(text_col, hash_bits).alias("text_hash")
    ).distinct()


def build_text_hash_index_bucketed(
    docs: DataFrame,
    table_name: str,
    text_col: str = "text",
    num_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist the dedup index as a Spark-native table BUCKETED on
    ``text_hash`` (``bucketBy`` + ``sortBy`` via ``saveAsTable``).

    A bucketed index scan reports ``HashPartitioning(text_hash,
    num_buckets)`` to the planner, so every subsequent
    :func:`dedup_append_bucketed` anti-join is satisfied by storage —
    the 100 TB corpus's index is pre-shuffled ONCE here and never
    again, instead of once per ingest batch. Appending each batch's
    survivors stays bucketed via ``insertInto`` (Spark routes rows to
    the right bucket files on write).
    """
    from ..sinks.layout import write_bucketed_table

    write_bucketed_table(
        build_text_hash_index(docs, text_col),
        table_name,
        "text_hash",
        num_buckets,
        sort_col="text_hash",
        path=path,
    )


def dedup_append_bucketed(
    spark,
    new_docs: DataFrame,
    index_table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """:func:`dedup_append` against a BUCKETED on-disk index table
    (written by :func:`build_text_hash_index_bucketed`).

    Identical semantics, strictly better plan for continuous ingest:
    the index side of the anti-join is co-partitioned by its storage
    bucketing, so the only exchange in the whole plan is the O(batch)
    within-batch aggregation — at 100 TB the multi-TB index never
    moves. The ``merge`` hint pins sort-merge (broadcasting the
    corpus index would replicate it to every executor — exactly the
    failure mode bucketing exists to avoid).
    """
    corpus_index = spark.table(index_table).select("text_hash")
    batch_best = (
        new_docs.withColumn("text_hash", h64(text_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias(id_col))
    )
    fresh = batch_best.join(
        corpus_index.hint("merge"), on="text_hash", how="left_anti"
    )
    return fresh.select(id_col, "text_hash")


def _bloom_positions(var: str, num_bits: int, num_hashes: int) -> list:
    """``num_hashes`` bit positions of a 60-bit hash ``var`` in an
    m-bit Bloom filter, via the repo's overflow-free affine
    permutation family (pure codegen integer ops — no md5 per probe,
    no Python)."""
    from ..functions.hashing import minhash_perm_constants, minhash_perm_sql

    return [
        F.expr(f"({minhash_perm_sql(var, a, b)}) % {num_bits}")
        for a, b in minhash_perm_constants(num_hashes)
    ]


def build_dedup_bloom(
    corpus_index: DataFrame, num_bits: int = 1 << 23, num_hashes: int = 5
) -> DataFrame:
    """Compact Bloom bitmap over the dedup index's ``text_hash``es:
    ``(word, bits)`` rows, word = 64-bit chunk index — at the default
    m=2^23 that is ≤131k rows / ~2 MB regardless of corpus size.

    Spark's own ``bloom_filter_agg`` is not in the public function
    registry, so the bitmap is built from codegen expressions: each
    hash explodes to its ``num_hashes`` bit positions, and one
    map-side-combinable ``bit_or`` per 64-bit word folds them. The
    caller persists this next to the index and rebuilds it only on
    compaction — probing it never touches the index itself.
    """
    probes = corpus_index.select(
        F.explode(
            F.array(*_bloom_positions("text_hash", num_bits, num_hashes))
        ).alias("__pos")
    )
    return (
        probes.groupBy((F.col("__pos") / 64).cast("long").alias("word"))
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), "
                "CAST(__pos % 64 AS INT)))"
            ).alias("bits")
        )
    )


def dedup_append_bloom(
    corpus_index: DataFrame,
    new_docs: DataFrame,
    bloom: DataFrame,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """:func:`dedup_append` with a Bloom prefilter — EXACT semantics
    (the oracle is identical): a batch row whose ``num_hashes`` bits
    are not all set is *definitely* new and skips the index anti-join
    entirely; only Bloom-positive rows (true duplicates + the ~p
    false-positive sliver) reach the exact anti-join.

    Why it matters at 100 TB: for the common mostly-new batch, the
    anti-join's probe side shrinks from |batch| to |dups| + p·|batch|,
    and the only thing broadcast is the ~2 MB bitmap — the index is
    scanned by the anti-join alone, for a fraction of the batch.
    ``num_bits``/``num_hashes`` must match the :func:`build_dedup_bloom`
    call that produced ``bloom``.
    """
    batch_best = (
        new_docs.withColumn("text_hash", h64(text_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias(id_col))
    )
    probes = batch_best.select(
        id_col,
        "text_hash",
        F.explode(
            F.array(*_bloom_positions("text_hash", num_bits, num_hashes))
        ).alias("__pos"),
    ).select(
        id_col,
        "text_hash",
        (F.col("__pos") / 64).cast("long").alias("word"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))"
        ).alias("__mask"),
    )
    flagged = (
        probes.join(F.broadcast(bloom), on="word", how="left")
        .withColumn(
            "__hit",
            # outer coalesce: a NULL text hashes to NULL -> NULL
            # positions/masks -> NULL __hit; without it min(__hit) is
            # NULL and the row falls out of BOTH branches below, while
            # plain dedup_append KEEPS null-text rows (a NULL hash
            # never matches the anti-join) — forcing False routes the
            # row to definite_new, matching the exact path.
            F.coalesce(
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(
                    F.col("__mask")
                )
                != 0,
                F.lit(False),
            ),
        )
        .groupBy("text_hash", id_col)
        .agg(F.min("__hit").alias("__maybe"))  # all k bits set
    )
    definite_new = flagged.where(~F.col("__maybe")).select(id_col, "text_hash")
    maybe = flagged.where(F.col("__maybe")).select(id_col, "text_hash")
    checked = maybe.join(
        corpus_index.select("text_hash"), on="text_hash", how="left_anti"
    ).select(id_col, "text_hash")
    return definite_new.unionByName(checked)


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    k: int = DEFAULT_SHINGLE_K,
) -> DataFrame:
    """Per-document MinHash signature, ``array<bigint>`` of length
    ``num_hashes``.

    Permutation ``i`` is the integer universal-hash family over the
    60-bit shingle hash (functions/hashing.py::minhash_perm_constants
    — overflow-free int64 arithmetic, exact in both engines): md5 runs
    ONCE per shingle, each of the ``num_hashes`` permutations is ~10
    integer ops. The md5-per-seed variant costs ~100 us per call
    (MessageDigest set-up dominates interpreted eval) — 75 s at sf0.1.

    One projection, ZERO shuffles beyond scan parallelization: the
    shingle-hash array is let-bound (:func:`_let_bound`) inside the
    signature expression, so CollapseProject cannot duplicate it into
    the per-seed ``array_min`` lambdas — the round-1 design paid a full
    extra corpus shuffle as an anti-inlining exchange barrier here.
    """
    from ..functions.hashing import minhash_perm_constants, minhash_perm_sql

    sigs = ", ".join(
        f"array_min(transform(__sh, g -> {minhash_perm_sql('g', a, b)}))"
        for a, b in minhash_perm_constants(num_hashes)
    )
    minhash = _let_bound(_shingle_expr(text_col, k), "__sh", f"array({sigs})")
    # NULL text is EXCLUDED from the near-dup pipeline: its signature
    # slots would all be NULL, concat_ws in the banding stage then
    # skips them, and EVERY null-text doc would share every (band,
    # bhash) bucket — a quadratic candidate blowup (~N^2/2 pairs) the
    # bucket math cannot cap. A null document duplicates nothing, the
    # same routing rule as dedup_append/dedup_stream_content.
    return (
        _parallelize_scan(docs)
        .where(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.expr(minhash).alias("minhash"))
    )


def band_rows(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 4,
) -> DataFrame:
    """Explode MinHash signatures into ``(id, band, bhash)`` rows —
    THE single banding spelling, shared by :func:`lsh_candidate_pairs`
    (batch self-join), :func:`build_lsh_band_index` (the persisted
    incremental index) and :func:`lsh_append_candidates` (batch
    probe), so the band hash can never drift between the one-shot and
    incremental paths."""
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                h64(
                    F.concat_ws(
                        ":",
                        *[
                            F.col("minhash")[b * rows_per_band + r]
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("bhash"),
            )
            for b in range(bands)
        ]
    )
    return (
        signatures.withColumn("__band", F.explode(band_cols))
        .select(
            id_col,
            F.col("__band.band").alias("band"),
            F.col("__band.bhash").alias("bhash"),
        )
    )


def _collapse_members(
    rows: DataFrame, id_col: str, key_col: str
) -> DataFrame:
    """Group rows by an exact-duplicate key and tag every row with its
    group REPRESENTATIVE (the minimum id in the group): one window
    shuffle on the key, output ``rows + __rep``. The representative
    table is ``where(id == __rep)`` over the result — same subtree,
    same exchange, so Catalyst reuses the shuffle for both.

    This is the hot-bucket linearizer for the banded candidate joins:
    k documents with an IDENTICAL fingerprint/signature (the planted
    1,000-identical-docs case, or any boilerplate pile-up) put ONE
    representative row through the band self-join instead of k — the
    k²-per-bucket candidate blowup collapses to O(distinct²), and the
    group members re-attach afterwards at output-sized cost.

    The result is materialized ONCE (``localCheckpoint``, the
    :func:`jaccard_verify_pairs` precedent): downstream it feeds up to
    six subtrees (two banded join sides, two expansion link sides, two
    intra-pair sides) whose exchanges hash on different keys, so
    Catalyst's ReuseExchange cannot deduplicate them — without the
    checkpoint, the md5-heavy signature scan under the window re-runs
    per subtree (measured 6-8 FileScans, +25-70% on the sf0.1 bench).
    The checkpoint is LAZY: the plan is a flat LogicalRDD immediately
    (so a caller's filter on the derived key still cannot push the
    hash tree into a scan predicate — the NULL-routing contract), and
    materialization rides the caller's FIRST action instead of a
    dedicated job (one fewer driver action per operator call; the six
    subtrees within that action read the cache per partition). The
    cached rows are (id, fingerprint/signature, rep) — tens of bytes
    per document, far below corpus bytes; a standing pipeline would
    persist the same table between stages."""
    w = Window.partitionBy(key_col)
    return rows.withColumn("__rep", F.min(id_col).over(w)).localCheckpoint(
        eager=False
    )


def _cap_band_buckets(
    exploded: DataFrame,
    id_col: str,
    band_max: int | None,
    bucket_cols: tuple = ("band", "bhash"),
) -> DataFrame:
    """Optional residual-skew guard for the banded self-joins: keep at
    most ``band_max`` rows (the lowest ids, deterministic) per band
    bucket. Collapse (:func:`_collapse_members`) already makes
    IDENTICAL fingerprints O(k); this caps the remaining case — many
    DISTINCT fingerprints colliding on one band slice (shared
    boilerplate headers) — at the price of recall on pairs routed
    through the dropped rows. Same policy shape as
    ``dedup_edit_distance``'s ``block_max`` and the ANN family's
    ``_cap_buckets`` (operators/similarity.py). ``None`` = off
    (exact; the default, and the gated-oracle configuration)."""
    if band_max is None:
        return exploded
    w = Window.partitionBy(*bucket_cols).orderBy(F.col(id_col))
    return (
        exploded.withColumn("__bn", F.row_number().over(w))
        .filter(F.col("__bn") <= band_max)
        .drop("__bn")
    )


def _expand_rep_pairs(
    rep_pairs: DataFrame, mem: DataFrame, id_col: str, carry: list | None = None
) -> DataFrame:
    """Expand representative-level verified pairs back to member-level
    pairs: every (member of rep_a) × (member of rep_b) combination,
    ordered with least/greatest. Output-sized — for near-dup pairs the
    output IS the quadratic object, but nothing upstream of this join
    ever was. ``carry`` columns (e.g. the verified hamming distance,
    identical for every member pair of a fingerprint pair) ride along.
    """
    carry = carry or []
    links = mem.select(
        F.col("__rep").alias("__r"), F.col(id_col).alias("__m")
    )
    return (
        rep_pairs.join(
            links.select(
                F.col("__r").alias("doc_a"), F.col("__m").alias("__ma")
            ),
            on="doc_a",
        )
        .join(
            links.select(
                F.col("__r").alias("doc_b"), F.col("__m").alias("__mb")
            ),
            on="doc_b",
        )
        .select(
            F.least("__ma", "__mb").alias("doc_a"),
            F.greatest("__ma", "__mb").alias("doc_b"),
            *carry,
        )
    )


def _intra_group_pairs(
    mem: DataFrame, id_col: str, carry_exprs: list | None = None
) -> DataFrame:
    """All ordered pairs WITHIN each exact-duplicate group (identical
    fingerprint/signature ⇒ distance 0 ⇒ verified by construction —
    no band join, no verification pass). Output-sized: the self-join
    key is the group representative."""
    a = mem.select(F.col("__rep").alias("__r"), F.col(id_col).alias("doc_a"))
    b = mem.select(F.col("__rep").alias("__r"), F.col(id_col).alias("doc_b"))
    out = a.join(b, on="__r").where(F.col("doc_a") < F.col("doc_b"))
    return out.select("doc_a", "doc_b", *(carry_exprs or []))


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 4,
    band_max: int | None = None,
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature are
    candidate near-duplicates. Output: distinct ``(doc_a, doc_b)``
    with ``doc_a < doc_b``.

    Hot buckets stay linear: identical SIGNATURES collapse to one
    representative before the band join (:func:`_collapse_members` —
    a pile of k exact near-dups costs O(k) through the shuffle, not
    k²; candidacy is a pure function of the signature, so collapsing
    is exact), and ``band_max`` optionally caps the residual
    distinct-signature skew (:func:`_cap_band_buckets`). Member pairs
    re-attach after the rep-level distinct at output-sized cost:
    intra-group pairs (identical signature ⇒ every band collides) plus
    the rep-pair cross expansion.

    One shuffle keyed on ``(band, band_hash)`` for the rep-level
    self-join, which is pinned to sort-merge (``hint('merge')``): both
    sides then require the IDENTICAL exchange on (band, bhash), so
    Catalyst's ReuseExchange evaluates the signature+explode subtree
    ONCE and the second side reads the shuffle files. Left to AQE at
    small scale, the join flips to broadcast-hash — which broadcasts
    the exploded corpus signatures AND recomputes the md5-heavy
    signatures separately per side: wrong twice at 100 TB.
    """
    # NULL ids can never appear in output pairs (strict < in the old
    # single-join spelling); excluding them up front keeps least/
    # greatest in the expansion from fabricating self-pairs.
    mem = _collapse_members(
        signatures.where(F.col(id_col).isNotNull()), id_col, "minhash"
    )
    reps = mem.where(F.col(id_col) == F.col("__rep")).select(id_col, "minhash")
    exploded = _cap_band_buckets(
        band_rows(reps, id_col, bands, rows_per_band), id_col, band_max
    )
    a = exploded.hint("merge").alias("a")
    b = exploded.hint("merge").alias("b")
    rep_cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )
    # cross pairs (distinct signatures) and intra pairs (identical
    # signatures) are disjoint by construction — no final distinct.
    return _expand_rep_pairs(rep_cand, mem, id_col).unionByName(
        _intra_group_pairs(mem, id_col)
    )


def build_lsh_band_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
) -> DataFrame:
    """The persistent NEAR-dup index for :func:`lsh_append_candidates`:
    ``(doc_id, band, bhash)`` rows for the already-ingested corpus —
    the LSH twin of :func:`build_text_hash_index` (which only catches
    EXACT duplicates). A curation pipeline persists this between
    batches and appends each batch's surviving rows; at 100 TB it is
    ~``bands`` 16-byte rows per document, ~0.1% of corpus bytes."""
    return band_rows(
        minhash_signatures(docs, text_col, id_col, num_hashes),
        id_col,
        bands,
        rows_per_band,
    )


def lsh_append_candidates(
    band_index: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Incremental NEAR-dup discovery for continuous ingestion: given
    the corpus's persisted LSH band index and a new batch, return the
    candidate near-duplicate pairs the batch introduces — batch vs
    corpus AND within-batch — as distinct ``(doc_a, doc_b)``,
    ``doc_a < doc_b``. The incremental twin of
    :func:`lsh_candidate_pairs` exactly as :func:`dedup_append` is of
    :func:`dedup_exact`; feed the output to
    :func:`jaccard_verify_pairs` as usual, and append
    ``band_rows(batch survivors)`` to the index for the next batch.

    O(batch) plan shape: the batch side computes signatures + bands
    (scan work proportional to the BATCH) and, with
    ``broadcast_batch=True`` (the standing-pipeline regime: the daily
    increment is tiny vs the corpus), ships them to the index scan as
    a broadcast — the multi-TB index is probed in place and NEVER
    shuffles; re-running :func:`lsh_candidate_pairs` over
    corpus+batch would re-hash and re-shuffle everything already
    ingested. Within-batch pairs reuse the same batch band rows
    through :func:`lsh_candidate_pairs`' merge-hinted self-join. Pass
    ``broadcast_batch=False`` for a backfill-sized batch — both sides
    then shuffle once on ``(band, bhash)``.
    """
    sigs = minhash_signatures(new_docs, text_col, id_col, num_hashes)
    batch_bands = band_rows(sigs, id_col, bands, rows_per_band)
    probe = F.broadcast(batch_bands) if broadcast_batch else batch_bands
    cross = (
        band_index.alias("a")
        .join(
            probe.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("doc_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("doc_b"),
        )
    )
    within = lsh_candidate_pairs(sigs, id_col, bands, rows_per_band)
    return cross.unionByName(within).distinct()


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_SHINGLE_K,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing >= 1 shingle.

    Jaccard computed from exact integer counts (|A∩B| via the join,
    |A∪B| = |A|+|B|-|A∩B|), division double-deterministic. Output:
    ``(doc_a, doc_b, jaccard)`` with ``jaccard >= threshold``.
    """
    with_sh = docs.withColumn("__shingles", F.expr(_shingle_expr(text_col, k)))
    sizes = with_sh.select(
        F.col(id_col), F.size("__shingles").alias("n_shingles"), "__shingles"
    )
    ex = sizes.select(id_col, "n_shingles", F.explode("__shingles").alias("sh"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.n_shingles").alias("na"),
            F.col("b.n_shingles").alias("nb"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("doc_a", "doc_b", "jaccard")
    )


def jaccard_verify_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_SHINGLE_K,
    threshold: float = 0.5,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Exact Jaccard for a given candidate-pair list (the verification
    stage after LSH discovery).

    Each pair joins its two shingle sets and computes
    ``|A∩B| / (|A|+|B|-|A∩B|)`` with JVM ``array_intersect`` — per-pair
    array math, NO shingle self-join, so cost is O(pairs · shingles)
    instead of the O(sum_freq^2) hot-shingle blowup of
    :func:`ngram_jaccard_pairs`. This composition (LSH -> verify) is
    the scale path for near-dup detection.

    Shingles are computed only for documents that actually occur in a
    candidate pair (semi-join pre-filter): candidates are a vanishing
    fraction of a deduped-ish corpus, so this turns two full-corpus
    md5-shingle passes into two passes over the candidate set.
    """
    # The pairs plan (typically the whole LSH pipeline) is referenced
    # three times below; localCheckpoint materializes its tiny result
    # once instead of re-running discovery per reference. Eager: a lazy
    # checkpoint would let the three subtrees of the final job race to
    # compute the un-materialized RDD concurrently (observed 3x cost).
    pairs = pairs.localCheckpoint(eager=True)
    pair_ids = (
        pairs.select(F.col("doc_a").alias(id_col))
        .union(pairs.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    filtered = docs.join(pair_ids, on=id_col, how="left_semi").select(
        id_col, text_col
    )
    if (
        min_parallelism is not None
        and docs.rdd.getNumPartitions() < min_parallelism
    ):
        # the md5 shingle walk fuses into the semi-join probe stage,
        # which runs at SCAN parallelism — and after a selective
        # filter (or on a one-row-group input) that can be a single
        # task. Spread the surviving (id, text) rows first: only
        # candidate docs ride the exchange. Same escape hatch as
        # contamination_overlap; None at production scale.
        filtered = filtered.repartition(min_parallelism)
    sh = filtered.select(
        F.col(id_col), F.expr(_shingle_expr(text_col, k)).alias("__sh")
    )
    out = (
        pairs.join(
            sh.select(F.col(id_col).alias("doc_a"), F.col("__sh").alias("__sa")),
            on="doc_a",
        )
        .join(
            sh.select(F.col(id_col).alias("doc_b"), F.col("__sh").alias("__sb")),
            on="doc_b",
        )
        .withColumn("__ni", F.size(F.array_intersect("__sa", "__sb")))
        .withColumn(
            "jaccard",
            F.col("__ni").cast("double")
            / (F.size("__sa") + F.size("__sb") - F.col("__ni")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
    )
    return out.select("doc_a", "doc_b", "jaccard")


def lsh_near_dup_edges(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
    k: int = DEFAULT_SHINGLE_K,
    threshold: float = 0.5,
    band_max: int | None = None,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Component-exact SPARSE edge set for the MinHash/Jaccard near-dup
    graph — the :func:`hamming_near_dup_edges` twin for the text
    chain, and what :func:`near_dup_clusters` consumers should feed to
    connected components instead of the full
    ``lsh_candidate_pairs → jaccard_verify_pairs`` pair table.
    Output ``(doc_a, doc_b, jaccard)``:

    * exact-duplicate TEXTS collapse first (key = ``h64(text)``, the
      same key as :func:`dedup_exact`): one STAR edge (representative ↔
      member, jaccard 1.0) per non-rep member — verified by
      construction, since identical texts have identical shingle sets;
    * MinHash + banding + exact Jaccard verification run over the
      DISTINCT texts only.

    Jaccard is a pure function of the two texts, so every verified
    pair of the full graph maps to a verified representative pair with
    the SAME jaccard, and star edges restore member connectivity:
    components (and min-id labels) are identical. On a dup-heavy
    corpus (CommonCrawl-class inputs run 30–50% duplicate mass) this
    also SAVES the dominant scan cost — md5 shingling and signature
    work run once per distinct text, not once per copy. The collapse
    itself is one shuffle of (id, text) rows keyed on the 8-byte text
    hash; its :func:`_collapse_members` checkpoint carries the text
    column here (unlike the signature/fingerprint paths), i.e. one
    materialized copy of the corpus text in exchange for single-scan
    input — the trade a pipeline makes by persisting its exact-dedup
    output as a table.

    Collision exposure (same convention as :func:`dedup_exact`, stated
    here because an edge table AMPLIFIES it): "identical text" means
    identical 60-BIT ``h64(text)`` (md5 truncated to 15 hex chars,
    stored as an 8-byte long — functions/hashing.py) — two DISTINCT
    texts colliding on the hash would fabricate a jaccard-1.0 star
    edge and merge their components. The expected collision count at
    N documents is ~N²/2⁶¹ (birthday bound over 2⁶⁰ values: ~0.43
    expected collisions at 10⁹ docs, ~43 at 10¹⁰ — NOT negligible at
    frontier-corpus scale), which the repo's exact-dedup family
    accepts by convention at sub-billion scale rather than paying a
    full byte-compare shuffle of the corpus text; a pipeline at 10⁹+
    documents verifies text equality within each collapse group (one
    extra comparison per member against its representative, O(dup
    mass) — never all-pairs) before emitting the star.
    """
    d = docs.where(
        F.col(text_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(F.col(id_col), F.col(text_col))
    mem = _collapse_members(d.withColumn("__th", h64(text_col)), id_col, "__th")
    rep_docs = mem.where(F.col(id_col) == F.col("__rep")).select(
        id_col, text_col
    )
    sigs = minhash_signatures(rep_docs, text_col, id_col, num_hashes, k)
    cands = lsh_candidate_pairs(sigs, id_col, bands, rows_per_band, band_max)
    rep_edges = jaccard_verify_pairs(
        rep_docs, cands, text_col, id_col, k, threshold,
        min_parallelism=min_parallelism,
    )
    star = mem.where(F.col(id_col) != F.col("__rep")).select(
        F.col("__rep").alias("doc_a"),
        F.col(id_col).alias("doc_b"),
        F.lit(1.0).alias("jaccard"),
    )
    return rep_edges.unionByName(star)


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """60-bit SimHash per document over whitespace tokens.

    Bit ``b`` of the signature is 1 iff the majority of token hashes
    have bit ``b`` set (ties -> 1, since vote >= 0). Pure array
    expressions: tokens -> h64 per token -> per-bit votes -> bit
    assembly with shifts. No shuffle, no UDF.
    """
    tokens = f"""
      transform(
        filter(split(trim({text_col}), '\\\\s+'), t -> t != ''),
        t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)
      )
    """
    # vote_b = sum over tokens of (bit set ? 1 : -1); bit set iff vote >= 0
    bit_terms = " + ".join(
        f"""(case when aggregate(__th, 0L,
               (acc, h) -> acc + (case when (shiftright(h, {b}) & 1) = 1
                                 then 1 else -1 end)
             ) >= 0 then shiftleft(1L, {b}) else 0L end)"""
        for b in range(bits)
    )
    # token-hash array let-bound once inside the expression — immune to
    # CollapseProject inlining into the ``bits`` vote lambdas, no
    # exchange barrier needed (see minhash_signatures)
    sim = _let_bound(tokens, "__th", f"({bit_terms})")
    return _parallelize_scan(docs).select(
        F.col(id_col), F.expr(sim).alias("simhash")
    )


def _cc_union_find(sym: DataFrame) -> DataFrame:
    """Single-pass union-find over a SYMMETRIZED, size-bounded edge
    list (the small-graph fast path of ``connected_components`` —
    caller enforces the row bound). One ``coalesce(1)`` +
    ``mapInPandas`` job: no shuffle, no per-round actions; memory is
    O(nodes) <= O(rows) in the single task, bounded by the caller's
    threshold. Union-by-min-root + path compression, so every final
    root is the component's minimum node id — byte-identical output
    to the distributed loop.
    """
    node_t = sym.schema["src"].dataType.simpleString()

    def fold(batches):
        parent = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for pdf in batches:
            for a, b in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
                if a not in parent:
                    parent[a] = a
                if b not in parent:
                    parent[b] = b
                ra, rb = find(a), find(b)
                if ra < rb:
                    parent[rb] = ra
                elif rb < ra:
                    parent[ra] = rb
        nodes = list(parent)
        yield pd.DataFrame(
            {"node": nodes, "label": [find(x) for x in nodes]}
        )

    return sym.coalesce(1).mapInPandas(
        fold, schema=f"node {node_t}, label {node_t}"
    )


def connected_components(
    edges: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
    small_graph_max_edges: int = 100_000,
) -> DataFrame:
    """Connected components over an undirected edge list: each node is
    labelled with the MINIMUM node id reachable from it.

    Output: ``(node, label)`` for every node that appears in an edge.

    Algorithm: min-label propagation with pointer jumping (the
    map-reduce CC family of Kiveris et al., "Connected Components in
    MapReduce and Beyond" — public algorithm). Each round

    1. propagates ``min(label)`` across edges (one groupBy shuffle of
       O(E) fixed-width ``(node, label)`` rows), then
    2. pointer-jumps ``label <- label(label)`` (one self-join),

    so label distance to the component minimum roughly doubles per
    round: O(log(diameter)) rounds, each O(E) shuffle rows — never
    materializing O(N^2) pairs. Per-node labels are monotonically
    non-increasing, so convergence is detected when ``sum(label)``
    stops decreasing (one cheap agg action per round on the cached
    frame). Lineage is truncated per round with ``localCheckpoint``
    (iterative plans otherwise grow exponentially in Catalyst).

    This is driver-COORDINATED but not driver-computed: the driver
    sees one 8-byte sum per round; labels stay distributed.

    SMALL-GRAPH FAST PATH: near-dup graphs are SPARSE by construction
    (the edge builders emit star edges, so E = O(N_dup)), and the
    streaming delta fold runs CC every micro-batch on a touched
    subgraph that is usually a few hundred edges — where the
    distributed loop's cost is pure fixed overhead (each
    checkpoint+sum round is a multi-stage job; measured 3.8 s for a
    131-edge graph at 8 shuffle partitions). When the materialized
    edge list is at most ``small_graph_max_edges`` rows the component
    fold runs as ONE Arrow-batched ``mapInPandas`` pass over the
    coalesced edges: a path-halving union-find producing the identical
    min-label output. Memory, honestly: that single task holds the
    symmetrized pandas frame plus a <=2*E-entry Python dict whose int
    keys/values are ~60-80 B apiece — roughly 50-60 MB at the 100k
    default, and ~0.5 GB had it stayed at the old 500k default, which
    is why the default is 100k: executors sized for streaming
    micro-batch folds (the main consumer) must not need a half-GB
    headroom spike for one task. Larger graphs take the distributed
    loop unchanged; raise the threshold explicitly when the executors
    have the memory, or pass ``small_graph_max_edges=0`` to force the
    loop. The size probe reads at most ``2*threshold+1`` rows of the
    checkpointed edge list, so corpus-scale calls don't pay a full
    count before taking the loop.
    """
    # Materialize the symmetrized edge list ONCE: every round joins
    # against it, and without the checkpoint each round would re-run
    # the entire upstream pipeline that produced the pairs (for the
    # LSH workflow that is the full signature+banding computation).
    # LAZY checkpoint: the size probe right below is the
    # materializing action (its doCheckpoint completes any partitions
    # the limit left uncomputed), so the truncation costs no
    # dedicated job — one fewer driver action per CC call, which the
    # streaming delta fold pays every micro-batch.
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(
            edges.select(
                F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
            )
        )
        .localCheckpoint(eager=False)
    )
    cap = 2 * small_graph_max_edges
    if small_graph_max_edges and sym.limit(cap + 1).count() <= cap:
        return _cc_union_find(sym)
    # lazy: the prev_sum agg below materializes the label table
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=False)
    )

    def _round(lab):
        nbr = sym.join(lab, sym["src"] == lab["node"]).select(
            F.col("dst").alias("node"), F.col("label")
        )
        merged = (
            lab.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        jump = merged.select(
            F.col("node").alias("jn"), F.col("label").alias("jl")
        )
        return merged.join(jump, merged["label"] == jump["jn"], "left").select(
            F.col("node"),
            F.coalesce(F.col("jl"), F.col("label")).alias("label"),
        )

    prev_sum = labels.agg(F.sum("label")).first()[0]
    for _ in range(max_iter):
        # TWO propagate+jump rounds per checkpoint/action: each
        # checkpoint+sum is a full job (the dominant fixed cost of the
        # loop on small touched subgraphs — the streaming delta fold
        # runs this every micro-batch), the composed two-round plan is
        # still shallow, and label distance to the minimum roughly
        # QUADRUPLES per iteration. Convergence stays sound: at a
        # fixpoint two more rounds change nothing (sum equal → stop);
        # off fixpoint the sum strictly decreases across the block.
        # Lazy checkpoint: the new_sum agg IS the materializing
        # action — one action per iteration instead of two.
        new_labels = _round(_round(labels)).localCheckpoint(eager=False)
        new_sum = new_labels.agg(F.sum("label")).first()[0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


def near_dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Canonicalize near-duplicate PAIRS into clusters — the final step
    of the LSH dedup workflow: every document gets a ``cluster_id``
    (the minimum doc id of its connected component in the near-dup
    graph), a ``cluster_size``, and ``is_canonical`` = 1 for the one
    row per cluster a dedup job would KEEP.

    Documents in no pair are singleton clusters of themselves. The
    component-map join is left to the planner: on a real training
    corpus the near-dup mass is corpus-scale (CommonCrawl-class inputs
    run 30-50% duplicates), so ``comp`` is O(N) rows and a forced
    broadcast would OOM the executors — AQE broadcasts it when it
    actually fits and shuffle-joins on the id otherwise. Cluster sizes
    reuse the cluster_id shuffle.

    Feed SPARSE component-equivalent edges
    (:func:`hamming_near_dup_edges` / :func:`lsh_near_dup_edges`)
    rather than the full pair table: the cluster output is provably
    identical and the edge list stays O(N + rep-pairs) on duplicate
    pile-ups instead of quadratic.
    """
    comp = connected_components(pairs, max_iter=max_iter).withColumnRenamed(
        "node", id_col
    )
    assigned = (
        docs.select(id_col)
        .join(comp, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("label"), F.col(id_col)).alias("cluster_id"),
        )
    )
    # canonical = the minimum id PRESENT in docs, not the component
    # label: pairs computed over a superset (pre-filter corpus) can
    # label a cluster with an id that was filtered out of docs — a
    # label-equality canonical would then mark NOBODY, and a "keep
    # canonical" job would delete the entire surviving cluster.
    sizes = assigned.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size"),
        F.min(id_col).alias("__canon"),
    )
    return assigned.join(sizes, "cluster_id").select(
        id_col,
        "cluster_id",
        "cluster_size",
        F.when(F.col(id_col) == F.col("__canon"), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_canonical"),
    )


def clusters_append(
    labels: DataFrame,
    new_docs: DataFrame,
    new_edges: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Incremental near-dup CLUSTER maintenance: given the persisted
    ``(id, cluster_id)`` labels of the already-ingested corpus, a new
    document batch, and the near-dup edges the batch introduces
    (:func:`lsh_append_candidates` / the streaming index verdicts /
    :func:`hamming_near_dup_edges` over batch∪probe — any edge list
    with at least one endpoint touching the batch, plus any late
    old↔old edges), return the full corpus's updated
    ``(id, cluster_id, cluster_size, is_canonical)`` — EXACTLY what a
    from-scratch :func:`near_dup_clusters` over all edges would emit.

    Cost, honestly: the ITERATIVE part (connected components) is
    bounded by the touched subgraph — untouched labels never enter the
    loop — which is the expensive part of the from-scratch twin
    (O(E·log d) shuffles). But the function's CONTRACT is the full
    label table, so the final sizes/canonical aggregate and the output
    itself are O(corpus) per call — one flat groupBy + join, unavoidable
    while emitting every row. A standing pipeline that cannot afford an
    O(corpus) tail per batch wants :func:`clusters_delta` (emits only
    the changed rows) + a persisted label store — exactly what
    ``streaming/dedup.py::run_cluster_maintain_stream`` does.

    The completion of the incremental dedup lifecycle: discovery has
    :func:`dedup_append`/:func:`lsh_append_candidates`, streaming has
    the index runners, and this closes clustering — a standing
    pipeline re-labels only what the batch touched.

    Exactness: only clusters containing an endpoint of a new edge can
    change. Each touched OLD cluster is re-entered into connected
    components as STAR edges ``(cluster_id ↔ member)`` — its label IS
    its minimum member id, so the stars reproduce the old component's
    connectivity and minimum exactly; unions with batch edges then
    yield ``min(mins)``, which is the from-scratch label. Untouched
    labels pass through without entering the iterative loop at all
    (anti-join), so CC cost is bounded by the affected subgraph, not
    the corpus. Cluster sizes/canonicals are recomputed in one
    columnar aggregate over the merged labels (min id PRESENT in the
    corpus, same rule as :func:`near_dup_clusters`).
    """
    edges = new_edges.select("doc_a", "doc_b")
    eps = (
        edges.select(F.col("doc_a").alias(id_col))
        .union(edges.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    touched_cids = (
        labels.join(eps, id_col, "left_semi").select("cluster_id").distinct()
    )
    touched = labels.join(touched_cids, "cluster_id", "left_semi")
    star = touched.select(
        F.col("cluster_id").alias("doc_a"), F.col(id_col).alias("doc_b")
    ).where(F.col("doc_a") != F.col("doc_b"))
    comp = connected_components(
        edges.unionByName(star), max_iter=max_iter
    ).withColumnRenamed("node", id_col)
    all_docs = (
        labels.select(id_col)
        .unionByName(new_docs.select(id_col))
        .distinct()
    )
    assigned = (
        all_docs.join(comp, id_col, "left")
        .join(
            labels.select(id_col, F.col("cluster_id").alias("__old")),
            id_col,
            "left",
        )
        .select(
            F.col(id_col),
            F.coalesce(F.col("label"), F.col("__old"), F.col(id_col)).alias(
                "cluster_id"
            ),
        )
    )
    sizes = assigned.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size"),
        F.min(id_col).alias("__canon"),
    )
    return assigned.join(sizes, "cluster_id").select(
        id_col,
        "cluster_id",
        "cluster_size",
        F.when(F.col(id_col) == F.col("__canon"), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_canonical"),
    )


def clusters_delta(
    touched_members: DataFrame,
    new_docs: DataFrame,
    new_edges: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """The DELTA core of incremental cluster maintenance: given the
    FULL current membership of every cluster the batch touches
    (``touched_members``: ``(id, cluster_id)`` rows — all members of
    every cluster containing an edge endpoint), the genuinely NEW
    document ids, and the batch's near-dup edges, return updated
    ``(id, cluster_id, cluster_size, is_canonical)`` rows for the
    AFFECTED docs only — O(batch + touched-cluster mass) rows in, out,
    and through the iterative loop; the rest of the corpus is never
    read, shuffled, or rewritten. :func:`clusters_append` is the
    full-table twin (same relabel math, O(corpus) output contract);
    this is what a persisted label store folds per batch
    (``streaming/dedup.py::run_cluster_maintain_stream``).

    Exactness (same induction as :func:`clusters_append`): each
    touched cluster re-enters connected components as STAR edges
    ``(cluster_id ↔ member)`` — its label IS its minimum member id, so
    the stars reproduce the old component's connectivity and minimum
    exactly, and unions with batch edges yield ``min(mins)``, the
    from-scratch label. Sizes/canonicals are exact because every
    RESULT cluster's membership is fully inside the scope: merged
    clusters bring all members via ``touched_members``, new-doc
    clusters are batch-contained by construction. Callers must
    therefore route a re-delivered doc whose cluster is untouched
    AROUND this function (it is not "new", and emitting it alone would
    shrink its cluster's size) — the streaming runner's
    prior-label lookup does exactly that.

    NULL ids in ``new_docs`` are dropped (the :func:`near_dup_clusters`
    rule: the null-unsafe sizes join excludes them from the label
    table there too — probed, not assumed).
    """
    edges = new_edges.select("doc_a", "doc_b")
    star = touched_members.select(
        F.col("cluster_id").alias("doc_a"), F.col(id_col).alias("doc_b")
    ).where(F.col("doc_a") != F.col("doc_b"))
    comp = connected_components(
        edges.unionByName(star), max_iter=max_iter
    ).withColumnRenamed("node", id_col)
    scope_ids = (
        touched_members.select(id_col)
        .unionByName(new_docs.select(id_col).where(F.col(id_col).isNotNull()))
        .distinct()
    )
    assigned = (
        scope_ids.join(comp, id_col, "left")
        .join(
            touched_members.select(
                id_col, F.col("cluster_id").alias("__old")
            ),
            id_col,
            "left",
        )
        .select(
            F.col(id_col),
            F.coalesce(F.col("label"), F.col("__old"), F.col(id_col)).alias(
                "cluster_id"
            ),
        )
    )
    sizes = assigned.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size"),
        F.min(id_col).alias("__canon"),
    )
    return assigned.join(sizes, "cluster_id").select(
        id_col,
        "cluster_id",
        "cluster_size",
        F.when(F.col(id_col) == F.col("__canon"), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_canonical"),
    )


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_SHINGLE_K,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing character
    ``k``-gram shingles with a benchmark set (the n-gram-overlap test
    every pretraining pipeline runs so eval data doesn't leak into
    training data — e.g. GPT-3's 13-gram and Gopher's overlap checks;
    here over the repo's standard ``k``-gram md5 shingles so the
    oracle reproduces it exactly).

    Output: ``(doc_id, n_overlap)`` — corpus docs with >= 1 shared
    shingle and their DISTINCT shared-shingle count (the ranking
    signal for quarantine-vs-drop decisions).

    Scale shape: shingles explode scan-side on BOTH sides; the join
    ships 8-byte hashes only. The benchmark side is tiny by nature
    (eval suites), so its exploded shingle set broadcasts — the corpus
    never shuffles. The distinct-overlap count groups on
    (doc, shingle) pairs AFTER the broadcast join has filtered to
    matches, i.e. the aggregate sees only contaminated rows.
    """
    if (
        min_parallelism is not None
        and corpus.rdd.getNumPartitions() < min_parallelism
    ):
        # the md5 shingle walk is the dominant cost and runs AT THE
        # SCAN — an under-split input (one parquet row group)
        # serializes it onto one task. Round-robin-spread the raw
        # rows first; at 100 TB the file splits already provide the
        # parallelism and this stays None. Row-wise → result
        # identical either way.
        corpus = corpus.repartition(min_parallelism)
    c = corpus.select(
        F.col(id_col),
        F.explode(shingle_hashes(text_col, k)).alias("__sh"),
    )
    b = benchmark.select(
        F.explode(shingle_hashes(text_col, k)).alias("__sh")
    ).distinct()
    return (
        c.join(F.broadcast(b), on="__sh", how="inner")
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("__sh")).alias("n_overlap"))
    )


def dedup_edit_distance(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_chars: int = 32,
    cap_chars: int = 400,
    max_dist: int = 80,
    block_max: int = 64,
) -> DataFrame:
    """Edit-distance near-dup verification with prefix blocking: pair
    up documents sharing a normalized ``block_chars`` prefix, then keep
    pairs whose Levenshtein distance over the first ``cap_chars`` is at
    most ``max_dist`` — the classic blocking+verify pipeline where the
    quadratic DP only ever runs inside a block.

    Cost bounds (the two knobs that keep this scale-safe):

    * ``cap_chars`` caps the DP at cap² cells per pair, and Spark's
      thresholded ``levenshtein(l, r, k)`` abandons a pair as soon as
      the distance provably exceeds ``max_dist`` (banded DP, O(k·cap));
    * ``block_max`` drops blocks with more members — boilerplate
      prefixes (licence headers, templates) otherwise go quadratic;
      real dedup pipelines cap or sub-split hot blocks, and the cap
      makes worst-case work per block a constant.

    Text is ASCII-sanitized first (non-ASCII → '?') because engines
    disagree on Levenshtein's unit for multi-byte text (byte vs
    codepoint); after sanitization byte and codepoint distances
    coincide, so the DuckDB oracle matches exactly.
    """
    t = F.regexp_replace(F.col(text_col), "[^ -~]", "?")
    # empty texts are excluded: a pair of them would divide by
    # greatest(length)=0 in the similarity (engine-divergent 0/0), and
    # "identical empties" is exact-dedup's job, not near-dup's
    base = docs.where(F.length(t) > 0).select(
        F.col(id_col).alias("__id"),
        F.substring(t, 1, cap_chars).alias("__t"),
        F.substring(t, 1, block_chars).alias("__blk"),
    )
    counts = base.groupBy("__blk").agg(F.count("*").alias("__bn"))
    small = base.join(
        F.broadcast(counts.where(F.col("__bn") <= block_max)), "__blk"
    )
    a = small.select(
        F.col("__blk"), F.col("__id").alias("id_a"), F.col("__t").alias("ta")
    )
    b = small.select(
        F.col("__blk"), F.col("__id").alias("id_b"), F.col("__t").alias("tb")
    )
    pairs = a.join(b, "__blk").where(F.col("id_a") < F.col("id_b"))
    lev = F.expr(f"levenshtein(ta, tb, {max_dist})")
    return (
        pairs.withColumn("edit_distance", lev)
        .where(F.col("edit_distance") >= 0)  # -1 = threshold exceeded
        .select(
            "id_a",
            "id_b",
            F.col("edit_distance").cast("long").alias("edit_distance"),
            F.expr(
                "1.0 - CAST(edit_distance AS DOUBLE)"
                " / CAST(greatest(length(ta), length(tb)) AS DOUBLE)"
            ).alias("similarity"),
        )
    )


def source_overlap_matrix(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Pairwise duplicate overlap between sources: for every source
    pair (a < b), how many distinct texts appear in BOTH — the
    provenance analysis a curation pipeline runs before choosing
    per-source mixing weights (two mirrors of the same crawl should
    not both contribute at full weight).

    Plan: one distinct over (text-hash, source) — 8-byte hash plus a
    dictionary-coded source, map-side combined; the pair join is a
    SELF-join on the hash that reuses the distinct's partitioning
    (co-partitioned, no second exchange for the probe side), and the
    per-hash blowup is bounded by |sources|^2, not corpus size. The
    raw text never shuffles.
    """
    hs = (
        docs.select(
            h64(text_col).alias("__th"), F.col(source_col).alias("__src")
        )
        .distinct()
    )
    a = hs.select("__th", F.col("__src").alias("source_a"))
    b = hs.select("__th", F.col("__src").alias("source_b"))
    return (
        a.join(b, on="__th")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared"))
    )


def _hamming_band_width(bands: int, n_bits: int) -> int:
    if n_bits % bands:
        raise ValueError(f"bands={bands} must divide n_bits={n_bits}")
    return n_bits // bands


def hamming_band_rows(
    fp: DataFrame, id_col: str, hash_col: str, bands: int, width: int
) -> DataFrame:
    """Explode a fingerprint table to one row per (id, band, band
    value). The fingerprint column rides along for the STREAMING index
    path (streaming/dedup.py persists (id, fp, band, bv) rows so batch
    probes verify without re-reading the corpus); the batch pair path
    deliberately drops it before its candidate distinct — no 16-byte
    fingerprints ride the shuffle, the verify joins the (tiny,
    distinct-fingerprint) rep table back instead. Scan-side bit
    slicing, no shuffle."""
    mask = (1 << width) - 1
    return fp.select(
        id_col,
        hash_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.expr(
                        f"shiftrightunsigned({hash_col}, {b * width}) & {mask}"
                    ).alias("bv"),
                )
                for b in range(bands)
            ])
        ).alias("__b"),
    ).select(
        id_col, hash_col, F.col("__b.band").alias("band"),
        F.col("__b.bv").alias("bv"),
    )


def _hamming_rep_pairs(
    hashes: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int,
    bands: int,
    n_bits: int,
    band_max: int | None,
) -> tuple:
    """Shared discovery core of the hamming near-dup family: collapse
    identical fingerprints to representatives, band the DISTINCT
    fingerprints, self-join per (band, band value), popcount-verify.
    Returns ``(mem, rep_pairs)``: the member→representative map and the
    verified rep-level ``(doc_a, doc_b, hamming)`` pairs (both ids are
    representatives, fingerprints guaranteed distinct so hamming ≥ 1).

    This is where the k²-hot-bucket problem dies: k docs with one
    fingerprint put ONE row per band through the shuffle. Candidate
    ids dedupe BEFORE fingerprints join back for the popcount verify —
    no wide rows ride the distinct. NULL fingerprints and NULL ids are
    excluded outright (neither can appear in an output pair).
    """
    width = _hamming_band_width(bands, n_bits)
    # NULL routing AFTER the collapse's eager checkpoint, not before:
    # a pre-collapse `where(hash_col IS NOT NULL)` is pushed below the
    # scan-spread exchange all the way to the FileScan, where the
    # optimizer substitutes the fingerprint's full expression tree
    # into the predicate — the SimHash vote tree then evaluates TWICE
    # per row, once SERIALLY on the under-split scan (measured 2.2 s
    # single-task at sf0.1) and once spread for the projection.
    # Filtering the materialized flat rows is exact: F.min over the
    # window skips NULL ids, so each surviving row's representative is
    # the same with or without the dropped rows in its group, and the
    # dropped rows themselves appear in no output.
    fp = hashes.select(F.col(id_col), F.col(hash_col).alias("__fp"))
    mem = _collapse_members(fp, id_col, "__fp").where(
        F.col("__fp").isNotNull() & F.col(id_col).isNotNull()
    )
    reps = mem.where(F.col(id_col) == F.col("__rep")).select(id_col, "__fp")
    exploded = _cap_band_buckets(
        hamming_band_rows(reps, id_col, "__fp", bands, width).drop("__fp"),
        id_col,
        band_max,
        bucket_cols=("band", "bv"),
    )
    a = exploded.hint("merge").alias("a")
    b = exploded.hint("merge").alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .distinct()
    )
    rep_pairs = (
        cand.join(
            reps.select(F.col(id_col).alias("doc_a"), F.col("__fp").alias("__fa")),
            on="doc_a",
        )
        .join(
            reps.select(F.col(id_col).alias("doc_b"), F.col("__fp").alias("__fb")),
            on="doc_b",
        )
        .withColumn("hamming", F.expr("cast(bit_count(__fa ^ __fb) as int)"))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
    return mem, rep_pairs


def hamming_near_dup_pairs(
    hashes: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "phash",
    max_hamming: int = 3,
    bands: int = 4,
    n_bits: int = 64,
    band_max: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs under HAMMING distance over a fixed-width
    integer fingerprint column (perceptual image hashes, SimHash
    values, any bit-signature): band the ``n_bits`` fingerprint into
    ``bands`` equal bit-slices, candidate = any band equal, verify =
    exact ``bit_count(a XOR b) <= max_hamming``. Output
    ``(doc_a, doc_b, hamming)`` with ``doc_a < doc_b``.

    Completeness: by pigeonhole the banding finds EVERY pair with
    distance < ``bands`` (``max_hamming < bands`` means recall 1);
    a larger radius than ``bands - 1`` makes the stage approximate —
    widening bands instead raises random-collision cost (band width
    ``n_bits/bands`` bits → collision odds 2^-width per band), which
    is the standard hamming-LSH trade.

    Plan shape (:func:`_hamming_rep_pairs`): identical fingerprints
    collapse to one representative BEFORE banding — hamming distance
    is a pure function of the fingerprints, so the collapse is exact,
    and a hot bucket of k identical docs costs O(k) through the band
    shuffle instead of k². The pairs OUTPUT is inherently quadratic in
    group size (k identical docs really do form k·(k-1)/2 hamming-0
    pairs); that expansion happens after discovery, at output-sized
    cost, keyed on the representative. ``band_max`` caps residual
    distinct-fingerprint band skew (off by default = exact). Cluster
    consumers should use :func:`hamming_near_dup_edges` instead, which
    skips the quadratic expansion entirely.
    """
    mem, rep_pairs = _hamming_rep_pairs(
        hashes, id_col, hash_col, max_hamming, bands, n_bits, band_max
    )
    cross = _expand_rep_pairs(rep_pairs, mem, id_col, carry=["hamming"])
    intra = _intra_group_pairs(
        mem, id_col, carry_exprs=[F.lit(0).cast("int").alias("hamming")]
    )
    return cross.unionByName(intra)


def hamming_near_dup_edges(
    hashes: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "phash",
    max_hamming: int = 3,
    bands: int = 4,
    n_bits: int = 64,
    band_max: int | None = None,
) -> DataFrame:
    """Component-exact SPARSE edge set for the hamming near-dup graph —
    what :func:`near_dup_clusters` consumers should feed to connected
    components instead of :func:`hamming_near_dup_pairs`'s full pair
    table. Output ``(doc_a, doc_b, hamming)``, O(N + rep-pairs) rows:

    * one STAR edge (representative ↔ member, hamming 0) per non-rep
      member of each identical-fingerprint group — k identical docs
      contribute k-1 edges, never k²;
    * the popcount-verified representative-level pairs.

    Component-exactness: hamming distance depends only on the
    fingerprint, so every verified pair (x, y) in the full graph maps
    to the verified pair (rep(x), rep(y)) — same distance — and star
    edges connect each member to its representative; conversely every
    edge here IS a verified pair of the full graph. Unions of paths
    therefore coincide: the connected components (and their min-id
    labels) are identical to the full pair table's, while a planted
    pile of 1,000 identical documents yields 999 edges instead of
    ~500k pairs. The same argument licenses ``near_dup_clusters``'s
    cluster_id/size/canonical output being byte-identical over either
    input.
    """
    mem, rep_pairs = _hamming_rep_pairs(
        hashes, id_col, hash_col, max_hamming, bands, n_bits, band_max
    )
    star = mem.where(F.col(id_col) != F.col("__rep")).select(
        F.col("__rep").alias("doc_a"),
        F.col(id_col).alias("doc_b"),
        F.lit(0).cast("int").alias("hamming"),
    )
    return rep_pairs.unionByName(star)
