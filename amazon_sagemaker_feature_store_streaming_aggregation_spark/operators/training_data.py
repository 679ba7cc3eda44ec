"""Training-data sharding: deterministic global shuffle, per-source
caps, and context-window packing.

The last mile of a curation pipeline (after dedup/quality/lang
filtering) is turning the surviving corpus into *training shards*:

1. a **global shuffle** so each shard is an i.i.d.-looking sample of
   the whole corpus (a model must not see a month of one crawl source
   in a row);
2. **per-source caps** so no single domain/source dominates the
   mixture (domain balancing);
3. **context-window packing** — concatenate documents in shard order
   and chunk the token stream into fixed-budget windows, tracking
   which window each document starts in.

All three are pure DataFrame ops and all three hash with the repo's
md5-derived ``h64`` family (functions/hashing.py) so a DuckDB oracle
reproduces every assignment bit-for-bit — the same determinism that
makes the shuffle *resumable*: re-running the job on the same corpus
and seed yields identical shards, which is what makes downstream
training reproducible.

Scale notes (100 TB):

- ``global_shuffle`` is ONE hash-partitioned exchange on ``shard``
  followed by a per-shard sort — exactly the shape of a shuffle-write
  of N output shards. No global ordering bottleneck: position is
  ``row_number`` *within* a shard, never over the whole corpus.
  ``n_shards`` should be chosen so a shard's docs fit an output file
  (corpus_tokens / shard ≈ a few GB), i.e. tens of thousands of
  shards at 100 TB — far above any skew threshold since the md5 hash
  is uniform by construction.
- ``cap_per_source`` windows over ``source``; a pathological source
  holding half the corpus makes one hot partition. The docstring
  documents the two-phase mitigation (hash-threshold preselection)
  which this module implements in ``cap_per_source(presort_cap=...)``:
  a scan-side hash predicate discards the obvious bulk before the
  exact windowed rank runs, bounding the hot partition to
  ~``presort_cap`` rows instead of the source's full row count.
- ``pack_context_windows`` reuses the shuffle's per-shard ordering;
  the cumulative token sum is a per-shard window (no global state),
  so packing parallelizes across shards like everything else.

Reference scope note: the reference pipeline (amazon-sagemaker-
feature-store-streaming-aggregation) stops at train/test CSVs
(1_setup.ipynb batch prep); sharding/packing is extension surface for
the LLM-pipeline brief, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import h64
from ..functions.text import _TOKENS


def _shuffle_hash(key_col: str, seed: str):
    """Deterministic 60-bit shuffle hash of ``seed || ':' || key``."""
    return h64(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string")))


def global_shuffle(
    df: DataFrame,
    key_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "shuffle-v1",
) -> DataFrame:
    """Assign every row a ``(shard, pos)`` — a deterministic global
    shuffle into ``n_shards`` ordered shards.

    shard = h64(seed:key) mod n_shards   (uniform, reproducible)
    pos   = row_number within the shard, ordered by (hash, key)

    The (hash, key) order key makes ``pos`` total and deterministic
    even under hash collisions. One exchange on ``shard``; the sort is
    per-shard (``row_number`` over a ``partitionBy(shard)`` window),
    so no stage ever sees more than corpus/n_shards rows — the global
    shuffle never funnels through a single task.
    """
    h = _shuffle_hash(key_col, seed)
    w = Window.partitionBy("shard").orderBy("h_shuffle", key_col)
    return (
        df.withColumn("h_shuffle", h)
        .withColumn("shard", F.pmod(F.col("h_shuffle"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("h_shuffle")
    )


def cap_per_source(
    df: DataFrame,
    source_col: str = "source",
    key_col: str = "doc_id",
    cap: int = 100,
    seed: str = "cap-v1",
    presort_cap: int | None = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per source, chosen by deterministic
    hash rank (a reproducible uniform sample of each source).

    Exact semantics: rank rows within each source by
    ``(h64(seed:key), key)`` and keep rank <= cap. The hash order
    makes the kept set a uniform sample that is stable across runs
    and across engines (the DuckDB oracle reproduces it exactly).

    Skew guard: the windowed rank puts one source's rows in one
    partition (Spark's map-side WindowGroupLimit already bounds what
    reaches it to cap × input-partitions rows per source; the
    prefilter tightens that to ~presort_cap). With ``presort_cap``,
    a per-source ``count`` + broadcast threshold join keeps only rows
    whose hash falls in the smallest ``~presort_cap / n`` fraction,
    discarding the bulk of a huge source BEFORE the sort.

    Equivalence guarantee: the two-phase result equals the one-phase
    result WHENEVER at least ``cap`` rows of each filtered source
    survive the prefilter (hash rank is preserved under hash
    filtering; the exact rank then trims to precisely ``cap`` —
    over-capping is impossible). Survival is probabilistic: survivors
    of a source with n rows are ~Binomial(n, presort_cap/n), so by
    Chernoff P(survivors < cap) <= exp(-presort_cap·(1-cap/presort_cap)²/2)
    — choose ``presort_cap >= 4*cap`` in production (~1e-8 per
    source); a shortfall under-caps that source (a smaller uniform
    sample), it never corrupts rank order. NULL sources form their
    own group, same as the one-phase window (null-safe threshold
    join).

    NULL-``key_col`` rows are EXCLUDED outright: they have no
    deterministic hash rank (h64(NULL) is NULL), so the one-phase
    window would place them by engine-specific NULL ordering while
    the two-phase prefilter's threshold comparison silently drops
    them — the dirty suite caught exactly that phase disagreement.
    Stated in the oracle as ``key IS NOT NULL``.
    """
    h = _shuffle_hash(key_col, seed)
    work = df.where(F.col(key_col).isNotNull()).withColumn("h_cap", h)
    if presort_cap is not None:
        if presort_cap < cap:
            raise ValueError("presort_cap must be >= cap")
        # phase 1: per-source row counts (one partial-agg exchange on
        # small (source, count) pairs), broadcast back as thresholds
        counts = work.groupBy(source_col).agg(F.count("*").alias("__n"))
        # keep a hash fraction ~ presort_cap/n per source (ceiling:
        # never round the keep-threshold down); the exact rank below
        # restores the precise cap on the survivors
        frac_cut = (
            F.when(
                F.col("__n") > presort_cap,
                F.ceil(
                    F.lit(float(1 << 60)) * F.lit(presort_cap) / F.col("__n")
                ).cast("long"),
            )
            .otherwise(F.lit((1 << 60) - 1))
            .alias("__cut")
        )
        thresholds = counts.select(
            F.col(source_col).alias("__src_t"), frac_cut
        )
        # null-safe equality: a NULL source is a real group for the
        # one-phase window, so the threshold join must match it too
        work = (
            work.join(
                F.broadcast(thresholds),
                F.col(source_col).eqNullSafe(F.col("__src_t")),
                "inner",
            )
            .where(F.col("h_cap") <= F.col("__cut"))
            .drop("__src_t")
        )
    w = Window.partitionBy(source_col).orderBy("h_cap", key_col)
    kept = work.withColumn("__rk", F.row_number().over(w)).where(F.col("__rk") <= cap)
    return kept.drop("h_cap", "__rk", "__n", "__cut")


def pack_context_windows(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_shards: int = 8,
    budget: int = 2048,
    seed: str = "shuffle-v1",
    token_count_col: str | None = None,
) -> DataFrame:
    """Pack shuffled documents into fixed-token-budget context
    windows per shard; returns one row per (shard, win) with doc and
    token counts.

    Semantics match LLM pre-training chunking with document
    concatenation: documents are laid out in shard order (the same
    deterministic order as :func:`global_shuffle`) into one token
    stream per shard, the stream is cut every ``budget`` tokens, and
    a document belongs to the window in which its FIRST token lands —
    ``win = floor((cumsum_tokens - n_tokens) / budget)``. A document
    longer than the budget spans windows but is counted once, at its
    start (the downstream loader slices the overflow; assignment
    stays single-valued and oracle-checkable).

    By default the token count is the whitespace tokenizer shared
    with ``with_text_stats`` so "tokens" means the same thing across
    the text operators. Real pipelines pack on SUBWORD counts:
    pass ``token_count_col`` naming a precomputed per-doc count
    column (from an offline BPE/SentencePiece pass — typically
    written alongside the text at ingest) and the cut points follow
    it instead; nothing else changes — no UDF, same one-window plan,
    same oracle shape. A NULL count is treated as 0 (explicit
    ``coalesce``, the empty-document case) — left NULL it would
    silently corrupt the window assignment of every LATER doc in the
    shard (``sum`` skips NULLs but ``cum - n`` goes NULL).

    Everything is scan expressions plus one per-shard cumulative-sum
    window over the shuffle's exchange — packing adds no extra
    shuffle beyond the shuffle itself.
    """
    if token_count_col is not None:
        n_tokens = F.coalesce(F.col(token_count_col).cast("long"), F.lit(0))
    else:
        n_tokens = F.expr(f"size({_TOKENS.format(c=text_col)})").cast("long")
    shuffled = global_shuffle(df, key_col=key_col, n_shards=n_shards, seed=seed)
    w = (
        Window.partitionBy("shard")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = (
        shuffled.withColumn("n_tokens", n_tokens)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn(
            "win",
            F.floor((F.col("cum_tokens") - F.col("n_tokens")) / F.lit(budget)).cast("long"),
        )
    )
    return placed.groupBy("shard", "win").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("win_tokens"),
        F.min("pos").alias("first_pos"),
        F.max("pos").alias("last_pos"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "shuffle-v1",
) -> None:
    """Materialize :func:`global_shuffle` as on-disk training shards:
    ``path/shard=K/*.parquet`` with rows stored in shard order
    (``pos`` ascending), ready for a sequential training reader.

    Write discipline: ``repartitionByRange(shard, pos)`` gives every
    task a contiguous slice of the (shard, pos) order — NOT
    ``repartition(hash(shard))``, whose murmur3 collisions leave some
    tasks empty and stack several shards on another — and
    ``sortWithinPartitions(shard, pos)`` hands the file writer
    pre-sorted rows, so the dynamic-partition writer streams each
    slice in iterator order (one open file at a time, no writer-side
    re-sort buffer). On-disk row order IS the shuffle order: within a
    part file rows are ``pos``-ascending, and when a shard spans
    consecutive range slices the lexicographic part-file order
    continues the sequence. A reader that scans ``shard=K``'s files
    in name order sees the deterministic global-shuffle sequence
    without any sort of its own.

    At 100 TB, ``n_shards`` is sized so one shard ≈ one target file
    (a few GB); range slices are balanced by construction (the
    partitioner splits the sampled (shard, pos) distribution evenly),
    so the job is one exchange + one sorted write with no idle tasks.
    """
    shuffled = global_shuffle(df, key_col=key_col, n_shards=n_shards, seed=seed)
    (
        shuffled.repartitionByRange(n_shards, F.col("shard"), F.col("pos"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_chars: int = 256,
    overlap: int = 64,
) -> DataFrame:
    """Overlapping fixed-size character chunks — the RAG-ingestion
    shape (embed each chunk, retrieve by chunk, attribute by doc).

    Chunk ``i`` covers ``[1 + i*step, 1 + i*step + chunk_chars)`` with
    ``step = chunk_chars - overlap``; starts run while they lie inside
    the text, so the final chunk may be shorter and a text shorter
    than one chunk yields exactly one chunk (an empty text yields one
    empty chunk — the caller filters if it wants). Output one row per
    (doc, chunk): ``(id, chunk_idx, chunk_start, chunk_len,
    chunk_hash)`` — the hash (``h64`` of the chunk text) is what
    downstream dedup/embedding stages key on, so the full text never
    needs to leave the scan projection.

    Plan: ``sequence()`` + ``explode`` + ``substring`` — all scan-side
    codegen, ZERO shuffles; at 100 TB chunking adds no data motion,
    only an output-row multiplier of ~len/step per doc.

    NULL-text docs are EXCLUDED (same null routing as
    ``dedup.minhash_signatures``): ``greatest(NULL, 1)`` is 1 in
    Spark, so without the filter a NULL doc would emit one row with
    NULL chunk_len/chunk_hash — a NULL hash key leaking into every
    downstream chunk-hash dedup/embedding stage.
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be < chunk_chars")
    step = chunk_chars - overlap
    df = df.filter(F.col(text_col).isNotNull())
    t = F.col(text_col)
    # starts stop at length - overlap: a start inside the final
    # overlap region would emit a chunk FULLY CONTAINED in its
    # predecessor (zero new characters) — for RAG ingestion that
    # duplicate would be embedded, indexed, and retrieved as a
    # spurious near-duplicate of its neighbor.
    starts = F.expr(
        f"sequence(1, greatest(length({text_col}) - {overlap}, 1), {step})"
    )
    chunk = F.expr(f"substring({text_col}, __start, {chunk_chars})")
    return (
        df.select(F.col(id_col), t)
        .withColumn("__start", F.explode(starts))
        .select(
            id_col,
            ((F.col("__start") - 1) / step).cast("long").alias("chunk_idx"),
            F.col("__start").cast("long").alias("chunk_start"),
            F.length(chunk).cast("long").alias("chunk_len"),
            h64(chunk).alias("chunk_hash"),
        )
    )


def in_batch_negatives(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    n_batches: int = 64,
    seed: str = "negatives-v1",
) -> DataFrame:
    """Deterministic IN-BATCH negative pairs for contrastive training:
    documents are assigned to pseudo-random training batches by a pure
    md5 hash of their id (stable under any partitioning/engine, like
    every sampler in this package), and every ordered
    ``(anchor, negative)`` pair WITHIN a batch is emitted — except
    pairs from the same near-dup cluster, which would be false
    negatives (the classic contrastive-training poisoning:
    near-duplicates pushed apart as if unrelated).

    ``clusters`` is a ``(id, cluster_id)`` assignment — typically
    ``near_dup_clusters`` over LSH/Jaccard or hamming-fingerprint
    pairs; documents absent from it are singleton clusters of
    themselves (``coalesce`` to own id). Output:
    ``(anchor_id, negative_id, batch)``, both directions per unordered
    pair (each doc serves as anchor), NULL-id documents excluded (a
    NULL hash has no batch).

    Scale: batch membership is scan-side; ONE self-join shuffle keyed
    on ``batch`` with cluster labels riding the rows (no second join
    against the corpus-sized cluster map); output ~N x batch_size
    rows, the size the training loop actually consumes. Choose
    ``n_batches ~ N / desired_batch_size``.
    """
    labeled = (
        docs.select(F.col(id_col))
        .where(F.col(id_col).isNotNull())
        .join(
            clusters.select(
                F.col(id_col), F.col(cluster_col).alias("__cl")
            ),
            on=id_col,
            how="left",
        )
        .select(
            F.col(id_col),
            F.coalesce(F.col("__cl"), F.col(id_col)).alias("__cl"),
            (
                h64(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
                % F.lit(n_batches)
            ).alias("batch"),
        )
    )
    a = labeled.alias("a")
    b = labeled.alias("b")
    return (
        a.join(
            b,
            (F.col("a.batch") == F.col("b.batch"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
            & (F.col("a.__cl") != F.col("b.__cl")),
        )
        .select(
            F.col(f"a.{id_col}").alias("anchor_id"),
            F.col(f"b.{id_col}").alias("negative_id"),
            F.col("a.batch").alias("batch"),
        )
    )


#: boilerplate threshold granularity: fractions in 1/10000ths keep the
#: doc-frequency comparison all-integer (engine-exact)
BP_DENOM = 10_000


def remove_boilerplate_lines(
    docs: DataFrame,
    min_doc_frac: float = 0.05,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    corpus_count: int | None = None,
) -> DataFrame:
    """Line-level boilerplate removal — the CCNet / RefinedWeb cleanup
    pass this engine's quality stack was missing: a line whose TRIMMED
    form appears in at least ``max(min_docs, min_doc_frac * n_docs)``
    DISTINCT documents (nav bars, cookie banners, license footers) is
    stripped from every document; the survivors reassemble in original
    order. Output: ``(id, text_clean, n_lines, n_removed)`` — one row
    per input row.

    The frequency test is ALL-INTEGER (``df * 10000 >= frac_q * N``
    with the fraction quantized to 1/10000ths), so the oracle
    reproduces it bit-for-bit at any corpus size. Lines key on
    ``h64(trim(line))`` — the 60-bit hash (an 8-byte long on the wire)
    rides the df shuffle, never the text (the ``dedup_exact``
    convention, same documented ~N²/2⁶¹ collision exposure — see
    ``lsh_near_dup_edges``; distinct LINES here, far fewer than docs). Empty/whitespace-only lines are never
    boilerplate (they'd glue unrelated documents into one "dup") and
    always survive; NULL ``text`` stays NULL with ``n_lines = 0``; a
    document whose every line is boilerplate comes back as ``''``
    (cleaned-to-empty, distinguishable from NULL-input).

    Plan shape: line explode + trim + hash are scan-side; ONE
    distinct-doc-count shuffle on the 8-byte line hash builds the
    (small — only above-threshold lines) boilerplate table; lines mark
    themselves boilerplate via one left join against it (broadcastable
    by size), and ONE groupBy on the doc id computes counts AND the
    ordered reassembly together — ``collect_list`` skips the NULLed
    boilerplate structs, ``array_sort`` restores order without a
    window. ``corpus_count`` skips the one count() action (pass it on
    a large corpus).
    """
    n = corpus_count if corpus_count is not None else docs.count()
    frac_q = int(round(min_doc_frac * BP_DENOM))
    # the threshold product is computed DRIVER-side as a Python int:
    # F.lit(frac_q) * F.lit(n) would fold two int32 literals and
    # overflow (ANSI: query-killing error) past ~4.3M docs at the
    # default 5% — the df side stays column arithmetic (long)
    bar = frac_q * n
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "ln"),
    ).withColumn("lh", h64(F.trim(F.col("ln"))))
    bl = (
        lines.where(F.trim(F.col("ln")) != "")
        .groupBy("lh")
        .agg(F.count_distinct(F.col(id_col)).alias("df"))
        .where(
            (F.col("df") * F.lit(BP_DENOM).cast("long") >= F.lit(bar))
            & (F.col("df") >= min_docs)
        )
        .select("lh", F.lit(True).alias("__bp"))
    )
    agg = (
        lines.join(bl, "lh", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(F.col("__bp").isNull(), 1).otherwise(0)).alias(
                "__n_kept"
            ),
            F.concat_ws(
                "\n",
                F.expr(
                    "transform(array_sort(collect_list("
                    "  case when __bp is null then struct(pos, ln) end)),"
                    " s -> s.ln)"
                ),
            ).alias("text_clean"),
        )
    )
    return docs.select(id_col).join(agg, id_col, "left").select(
        F.col(id_col),
        F.when(
            F.col("n_lines").isNotNull(), F.col("text_clean")
        ).alias("text_clean"),
        F.coalesce(F.col("n_lines"), F.lit(0)).cast("long").alias("n_lines"),
        (
            F.coalesce(F.col("n_lines"), F.lit(0))
            - F.coalesce(F.col("__n_kept"), F.lit(0))
        ).cast("long").alias("n_removed"),
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    test_pct: int = 30,
    id_col: str = "doc_id",
    salt: str = "split-v1",
    max_iter: int = 25,
) -> DataFrame:
    """Near-dup-aware train/eval split: assign whole near-duplicate
    CLUSTERS to one side, so a paraphrase or template twin of an eval
    document can never sit in train — the leakage failure mode a
    per-document hash split cannot prevent (eval sets built this way
    overstate model quality; the standard fix in every public
    pretraining recipe is to split at the duplicate-cluster level).

    ``pairs`` is a near-dup edge/pair table ``(doc_a, doc_b)`` from
    any discovery family (MinHash-LSH, SimHash-hamming, SemDeDup);
    feed the SPARSE component-equivalent edges for pile-up safety
    (the :func:`~.dedup.near_dup_clusters` note). Output: ``(id,
    cluster_id, split)`` with ``split`` ∈ {'train', 'test'} — the
    deterministic md5 bucket of the CLUSTER id (the
    ``plans/train_prep.py::hash_split`` convention: stable across
    reruns and engines, entity-consistent, incremental — a new
    near-dup of an already-split cluster lands on its cluster's side
    as long as it links to it, and the ``salt`` isolates experiments).

    Unpaired docs are singleton clusters: their split is the hash of
    their own id, exactly ``hash_split`` on the id. NULL-id docs drop
    out with the label table (the :func:`~.dedup.near_dup_clusters`
    null-unsafe-join rule — a row without an identity cannot be
    consistently routed to a side across reruns).

    Scale shape: clustering is the shared :func:`~.dedup
    .connected_components` machinery (O(E) rounds, O(log d) depth);
    the split itself is one scan-side md5 over the label table — no
    extra shuffle beyond the clustering.
    """
    from ..plans.train_prep import hash_split
    from .dedup import near_dup_clusters

    labels = near_dup_clusters(docs, pairs, id_col=id_col, max_iter=max_iter)
    return hash_split(
        labels.select(id_col, "cluster_id"), "cluster_id", test_pct, salt
    )
