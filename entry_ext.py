"""Extension queries()/oracle_sql() entries: dedup, similarity search,
text analysis (SURVEY.md §7-M4), OLAP star-schema plans, and the
relational §2.7 coverage (semi/anti/set ops, distinct agg, scalar
function families, pivot/unpivot, percentiles, windowed distinct) —
all graded as first-class operators.

Imported by __spark_entry__.py. Same hash-stability convention: every
hash is md5-derived (bit-equal in DuckDB), every ratio/cosine a fixed
IEEE op sequence over exact integers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark.functions import (
    LANG_STOPWORDS,
    with_fingerprint,
    with_lang_id,
    with_text_stats,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
    bm25_topk,
    cosine_topk,
    dedup_exact,
    rrf_fuse,
    jaccard_verify_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.sources import load_table
from amazon_sagemaker_feature_store_streaming_aggregation_spark.session import local_rows

# 60-bit md5 hash, DuckDB spelling (bit-equal with functions/hashing.h64).
# '0x' || ... (NOT concat): || propagates NULL like Spark's md5/concat
# chain, while concat('0x', NULL) = '0x' would CRASH the cast — a NULL
# text/id input must hash to NULL in both engines, not abort the oracle.
_H64 = "CAST('0x' || substring(md5({x}), 1, 15) AS BIGINT)"

_SHINGLES = (
    "list_distinct([" + _H64.format(x="substring(text, i, 9)") + " "
    "for i in range(1, greatest(length(text) - 8, 1) + 1)])"
)


def _spread_replay(stream: DataFrame) -> DataFrame:
    """The replay harnesses feed ONE small file per trigger
    (maxFilesPerTrigger=1 over a two-file tempdir), so every
    micro-batch scan is a single partition — and any heavy scan-side
    expression attached in the STREAM lineage (the embed fold, the
    SimHash tree, IVF assign/encode) runs on one task. Round-robin the
    thin raw rows across the session's cores BEFORE the heavy
    expression: the streaming twin of operators/dedup.
    _parallelize_scan, which cannot introspect (and so passes through)
    streaming plans. Row-identical — everything downstream is per-row
    pure or set-shaped. A production stream with well-split
    micro-batches would not route through this harness helper."""
    sc = stream.sparkSession.sparkContext
    return stream.repartition(sc.defaultParallelism)

# ------------------------------------------------------------- exact dedup


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_exact(load_table(spark, sf_dir, "documents"))


_DEDUP_EXACT_ORACLE = f"""
SELECT min(doc_id) AS doc_id, count(*) AS dup_count
FROM documents
GROUP BY {_H64.format(x="text")}
"""


def _q_dedup_exact_128(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the OPT-IN 128-bit content key (full md5 digest,
    functions/hashing.py::h128) — the ≥10⁹-doc regime where the 60-bit
    default's ~N²/2⁶¹ collision bound stops being negligible. Same
    output shape as dedup_exact; the oracle groups by DuckDB's
    md5(text) verbatim, so the key itself is bit-checked."""
    return dedup_exact(
        load_table(spark, sf_dir, "documents"), hash_bits=128
    )


_DEDUP_EXACT_128_ORACLE = """
SELECT min(doc_id) AS doc_id, count(*) AS dup_count
FROM documents
GROUP BY md5(text)
"""

# ------------------------------------------------- URL-canonical dedup

# Deterministic messy-URL fixture derived from doc_id: seven surface
# variants per logical article id (doc_id div 7) — case, www., default
# ports, tracking params, unsorted params, fragments, and one
# no-scheme string that must canonicalize to NULL. The SAME expression
# builds the column in both engines, so the gate checks the full
# canonicalization chain end to end.
_URL_FIXTURE = {
    0: ("'https://news.example.com/articles/'", "''"),
    1: ("'HTTPS://News.Example.COM:443/articles/'", "'/'"),
    2: (
        "'https://www.news.example.com/articles/'",
        "'?utm_source=rss&utm_medium=feed'",
    ),
    3: ("'https://news.example.com/articles/'", "'?b=2&a=1#section'"),
    4: ("'https://news.example.com:443/articles/'", "'?a=1&b=2'"),
    5: ("'http://other.example.org:80/items/'", "'?fbclid=xyz&x=9'"),
    6: ("'news.example.com/articles/'", "''"),
}


def _url_fixture_sql(div: str, cast: str) -> str:
    """CASE expression building the messy url; ``div`` is the engine's
    integer-division spelling, ``cast`` its string cast."""
    whens = " ".join(
        f"WHEN {v} THEN {pre} || {cast.format(x=f'(doc_id {div} 7)')} || {post}"
        for v, (pre, post) in _URL_FIXTURE.items()
    )
    return f"CASE doc_id % 7 {whens} END"


def _q_dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level exact dedup (operators/dedup.py::dedup_url_canonical
    over functions/url.py::with_canonical_url): the messy-URL fixture
    collapses each logical article's surface variants — {case, www,
    :443, utm-params} into one canonical key, {unsorted params,
    fragment} into another — and the no-scheme variant canonicalizes
    to NULL and joins nothing. The oracle replays every rewrite step
    in DuckDB, so host/port/param/fragment handling is bit-checked
    cross-engine."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        dedup_url_canonical,
    )

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "url", F.expr(_url_fixture_sql("div", "cast({x} as string)"))
    )
    return dedup_url_canonical(docs)


_URL_CANONICAL_ORACLE = f"""
WITH urls AS (
  SELECT doc_id, {_url_fixture_sql("//", "CAST({x} AS VARCHAR)")} AS url
  FROM documents
), p1 AS (
  SELECT doc_id,
    lower(regexp_extract(trim(url), '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    regexp_replace(regexp_replace(trim(url), '#.*$', ''),
                   '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS after
  FROM urls WHERE url IS NOT NULL
), p2 AS (
  SELECT doc_id, scheme, after,
    regexp_extract(after, '^([^/?]*)', 1) AS auth,
    substr(after, length(regexp_extract(after, '^([^/?]*)', 1)) + 1) AS pathq
  FROM p1
), p3 AS (
  SELECT doc_id, scheme,
    CASE WHEN scheme = 'http'
           THEN regexp_replace(regexp_replace(lower(auth), '^www\\.', ''), ':80$', '')
         WHEN scheme = 'https'
           THEN regexp_replace(regexp_replace(lower(auth), '^www\\.', ''), ':443$', '')
         ELSE regexp_replace(lower(auth), '^www\\.', '') END AS host,
    regexp_replace(regexp_replace(pathq, '\\?.*$', ''), '/+$', '') AS cpath,
    CASE WHEN instr(pathq, '?') > 0
         THEN substr(pathq, instr(pathq, '?') + 1) ELSE '' END AS query
  FROM p2
), p4 AS (
  SELECT doc_id, scheme, host, cpath,
    -- coalesce: DuckDB array_to_string([]) is NULL, Spark
    -- array_join([]) is '' — the empty-query family must not vanish
    coalesce(array_to_string(list_sort(list_filter(string_split(query, '&'),
      p -> p <> '' AND NOT regexp_matches(lower(p),
        '^(utm_[^=&]*|gclid|fbclid|msclkid|igshid|mc_cid|mc_eid|ref|ref_src)(=.*)?$'
      ))), '&'), '') AS cq
  FROM p3
), canon AS (
  SELECT doc_id,
    CASE WHEN scheme = '' OR host = '' THEN NULL
         ELSE scheme || '://' || host || cpath ||
              CASE WHEN cq = '' THEN '' ELSE '?' || cq END END AS canonical_url
  FROM p4
)
SELECT canonical_url,
       min(doc_id) AS keep_id,
       count(DISTINCT doc_id) AS n_docs,
       regexp_extract(canonical_url, '^[a-z][a-z0-9+.-]*://([^/?]*)', 1) AS domain
FROM canon
WHERE canonical_url IS NOT NULL AND doc_id IS NOT NULL
GROUP BY canonical_url
"""

# ---------------------------------------------------------- minhash + LSH

_NUM_HASHES = 16
_BANDS, _ROWS_PER_BAND = 4, 4


def _q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = minhash_signatures(load_table(spark, sf_dir, "documents"))
    return sigs.select(
        "doc_id", F.posexplode("minhash").alias("seed", "sig")
    )


def _minhash_list_sql() -> str:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.functions.hashing import (
        minhash_perm_constants,
        minhash_perm_sql,
    )

    per_seed = [
        "list_min(["
        + minhash_perm_sql("g", a, b).replace(" div ", " // ")
        + " for g in __sh])"
        for a, b in minhash_perm_constants(_NUM_HASHES)
    ]
    return "[" + ", ".join(per_seed) + "]"


_MINHASH_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLES} AS __sh FROM documents
  -- NULL-text docs excluded, mirroring minhash_signatures'
  -- WHERE text IS NOT NULL (a NULL-text doc must emit no
  -- signature and join no LSH bucket)
  WHERE text IS NOT NULL
), sig AS (
  SELECT doc_id, {_minhash_list_sql()} AS minhash FROM sh
)
SELECT doc_id, i - 1 AS seed, minhash[i] AS sig
FROM sig, range(1, {_NUM_HASHES} + 1) AS t(i)
"""


def _q_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = minhash_signatures(load_table(spark, sf_dir, "documents"))
    return lsh_candidate_pairs(sigs, bands=_BANDS, rows_per_band=_ROWS_PER_BAND)


def _band_hash_sql(b: int) -> str:
    parts = ", ".join(
        f"CAST(minhash[{b * _ROWS_PER_BAND + r + 1}] AS VARCHAR)"
        for r in range(_ROWS_PER_BAND)
    )
    return _H64.format(x=f"concat_ws(':', {parts})")


_LSH_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLES} AS __sh FROM documents
  -- NULL-text docs excluded, mirroring minhash_signatures'
  -- WHERE text IS NOT NULL (a NULL-text doc must emit no
  -- signature and join no LSH bucket)
  WHERE text IS NOT NULL
), sig AS (
  SELECT doc_id, {_minhash_list_sql()} AS minhash FROM sh
), bands AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {b} AS band, {_band_hash_sql(b)} AS bhash FROM sig"
      for b in range(_BANDS)
  )}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id
"""

def _q_stream_lsh_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup discovery against the persistent band index
    (streaming/dedup.py::run_index_lsh_stream): the documents table is
    replayed as TWO micro-batches split at the id midpoint. Every
    near-dup pair is discovered exactly once — when its later member's
    batch probes the index — so the UNION of per-batch pair outputs
    must equal the one-shot LSH run over the whole corpus, and the
    oracle is the batch _LSH_ORACLE verbatim. (Temp dirs are left for
    the OS tmp reaper: the returned DataFrame lazily reads them.)"""
    import os
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        run_index_lsh_stream,
    )
    # local import: __spark_entry__ imports this module at load time
    from __spark_entry__ import _set_stream_partitions

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = sorted(x.as_py() for x in t.column("doc_id") if x.as_py() is not None)
    mid = ids[len(ids) // 2]
    stream_dir = tempfile.mkdtemp(prefix="slsh_src_")
    work = tempfile.mkdtemp(prefix="slsh_work_")
    # NULL ids ride in batch 0: their band rows pair with nothing in
    # either engine (every pair predicate is a NULL comparison), but
    # the replay must still deliver the rows rather than drop them
    key = t.column("doc_id")
    in_b0 = pc.or_kleene(pc.less(key, mid), pc.is_null(key))
    pq.write_table(
        t.filter(pc.fill_null(in_b0, True)),
        os.path.join(stream_dir, "00.parquet"),
    )
    pq.write_table(
        t.filter(pc.fill_null(pc.invert(in_b0), False)),
        os.path.join(stream_dir, "01.parquet"),
    )
    old_parts = _set_stream_partitions(spark)
    try:
        stream = (
            spark.readStream.format("parquet")
            .schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .load(stream_dir)
        )
        q = run_index_lsh_stream(
            stream,
            os.path.join(work, "out"),
            os.path.join(work, "index"),
            checkpoint_dir=os.path.join(work, "ckpt"),
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("stream_lsh availableNow replay exceeded 300s")
        return spark.read.parquet(os.path.join(work, "out", "batch=*", "pairs"))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def _q_stream_hamming_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming fingerprint near-dup discovery against the persistent
    index (streaming/dedup.py::run_index_hamming_stream): the
    documents table is replayed as TWO micro-batches split at the id
    midpoint, each batch SimHash-fingerprinted IN the stream (pure
    array expressions work on streaming DataFrames) and probed against
    the on-disk fingerprint index. Every pair is discovered exactly
    once — when its later member's batch arrives — so the union of
    per-batch pair outputs must equal the one-shot batch
    hamming_near_dup_pairs run, and the oracle is
    _HAMMING_PAIRS_ORACLE verbatim."""
    import os
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        run_index_hamming_stream,
    )
    from __spark_entry__ import _set_stream_partitions

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = sorted(x.as_py() for x in t.column("doc_id") if x.as_py() is not None)
    mid = ids[len(ids) // 2]
    stream_dir = tempfile.mkdtemp(prefix="shamm_src_")
    work = tempfile.mkdtemp(prefix="shamm_work_")
    # NULL ids ride in batch 0 (less-than on NULL is null -> excluded
    # by both filters otherwise); their NULL fingerprint joins nothing
    key = t.column("doc_id")
    in_b0 = pc.or_kleene(pc.less(key, mid), pc.is_null(key))
    pq.write_table(
        t.filter(pc.fill_null(in_b0, True)),
        os.path.join(stream_dir, "00.parquet"),
    )
    pq.write_table(
        t.filter(pc.fill_null(pc.invert(in_b0), False)),
        os.path.join(stream_dir, "01.parquet"),
    )
    old_parts = _set_stream_partitions(spark)
    try:
        stream = (
            spark.readStream.format("parquet")
            .schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .load(stream_dir)
        )
        fps = simhash(_spread_replay(stream)).withColumnRenamed(
            "simhash", "fp"
        )
        q = run_index_hamming_stream(
            fps,
            os.path.join(work, "out"),
            os.path.join(work, "index"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            id_col="doc_id",
            hash_col="fp",
            max_hamming=3,
            bands=4,
            n_bits=60,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("stream_hamming availableNow replay exceeded 300s")
        return spark.read.parquet(os.path.join(work, "out", "batch=*", "pairs"))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def _q_stream_semantic_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming semantic near-dup discovery against the persistent
    cell-partitioned vector index (streaming/similarity.py::
    run_index_embedding_stream): the embeddings table replays as TWO
    micro-batches split at the id midpoint, each assigned to the SAME
    fixed seeded centroids the batch operator derives (written to a
    tmp table up front — the offline-trained-centroids production
    shape) and probed against only the index cells it touches. Every
    pair is discovered exactly once — when its later member's batch
    arrives — so the union of per-batch pair outputs must equal the
    one-shot semantic_dedup_pairs run, and the oracle is
    _semantic_oracle(clusters=False) verbatim."""
    import os
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.similarity import (
        ivf_centroids,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        run_index_embedding_stream,
    )
    from __spark_entry__ import _set_stream_partitions

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = sorted(x.as_py() for x in t.column("vec_id") if x.as_py() is not None)
    mid = ids[len(ids) // 2]
    stream_dir = tempfile.mkdtemp(prefix="ssem_src_")
    work = tempfile.mkdtemp(prefix="ssem_work_")
    key = t.column("vec_id")
    in_b0 = pc.or_kleene(pc.less(key, mid), pc.is_null(key))
    pq.write_table(
        t.filter(pc.fill_null(in_b0, True)),
        os.path.join(stream_dir, "00.parquet"),
    )
    pq.write_table(
        t.filter(pc.fill_null(pc.invert(in_b0), False)),
        os.path.join(stream_dir, "01.parquet"),
    )
    cents_dir = os.path.join(work, "centroids")
    emb = load_table(spark, sf_dir, "embeddings")
    ivf_centroids(
        emb, _ivf_cells_for(sf_dir), corpus_count=_emb_count(sf_dir)
    ).write.parquet(cents_dir)
    old_parts = _set_stream_partitions(spark)
    try:
        stream = (
            spark.readStream.format("parquet")
            .schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .load(stream_dir)
        )
        q = run_index_embedding_stream(
            _spread_replay(stream),
            os.path.join(work, "out"),
            os.path.join(work, "index"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            centroids_dir=cents_dir,
            threshold=_SEMDEDUP_THRESHOLD,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "stream_semantic availableNow replay exceeded 300s"
            )
        return spark.read.parquet(os.path.join(work, "out", "batch=*", "pairs"))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def _emb_standing_index(spark: SparkSession, sf_dir: str):
    """Build (once per process per sf_dir — see _STANDING_IDX_CACHE)
    the standing cell-partitioned embedding index carrying its label
    metadata: the embeddings table replayed as two micro-batches
    through streaming/similarity.py::run_index_embedding_stream.
    Returns (index_dir, centroids_dir, n_cells)."""
    import os
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.similarity import (
        ivf_centroids,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        run_index_embedding_stream,
    )
    from __spark_entry__ import _set_stream_partitions

    ckey = ("emb", sf_dir)
    if ckey in _STANDING_IDX_CACHE:
        return _STANDING_IDX_CACHE[ckey]
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"],
    )
    ids = sorted(x.as_py() for x in t.column("vec_id") if x.as_py() is not None)
    mid = ids[len(ids) // 2]
    stream_dir = tempfile.mkdtemp(prefix="sidx_src_")
    work = tempfile.mkdtemp(prefix="sidx_work_")
    key = t.column("vec_id")
    in_b0 = pc.or_kleene(pc.less(key, mid), pc.is_null(key))
    pq.write_table(
        t.filter(pc.fill_null(in_b0, True)),
        os.path.join(stream_dir, "00.parquet"),
    )
    pq.write_table(
        t.filter(pc.fill_null(pc.invert(in_b0), False)),
        os.path.join(stream_dir, "01.parquet"),
    )
    cents_dir = os.path.join(work, "centroids")
    emb = load_table(spark, sf_dir, "embeddings")
    n_cells = _ivf_cells_for(sf_dir)
    ivf_centroids(
        emb, n_cells, corpus_count=_emb_count(sf_dir)
    ).write.parquet(cents_dir)
    old_parts = _set_stream_partitions(spark)
    try:
        stream = (
            spark.readStream.format("parquet")
            .schema("vec_id long, embedding array<double>, label int")
            .option("maxFilesPerTrigger", 1)
            .load(stream_dir)
        )
        q = run_index_embedding_stream(
            _spread_replay(stream),
            os.path.join(work, "out"),
            os.path.join(work, "index"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            centroids_dir=cents_dir,
            threshold=_SEMDEDUP_THRESHOLD,
            extra_cols=("label",),
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "sim_index_topk_filtered availableNow replay exceeded 300s"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    _STANDING_IDX_CACHE[ckey] = (
        os.path.join(work, "index"), cents_dir, n_cells
    )
    return _STANDING_IDX_CACHE[ckey]


def _q_sim_index_topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED top-k SERVED from the standing vector index
    (streaming/similarity.py::probe_embedding_index — the standing-
    index half of the r12 verdict's Missing #2, next to the batch
    operators' predicate=): the embeddings table replays as two
    micro-batches into the cell-partitioned index CARRYING its label
    metadata (extra_cols), then the probe ranks only ``label = 1``
    vectors — the predicate pushed into the pruned cell scan
    (PushedFilters; plan-pinned in tests/test_streaming_similarity),
    never rank-then-discard. nprobe = the full cell count, so the
    probe is EXACT filtered top-k over every indexed vector and the
    oracle is the label-filtered cosine_topk spelling."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        probe_embedding_index,
    )

    index_dir, cents_dir, n_cells = _emb_standing_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    return probe_embedding_index(
        spark,
        index_dir,
        cents_dir,
        emb.filter(F.col("vec_id") < _N_QUERIES),
        k=_TOPK_K,
        nprobe=n_cells,
        predicate="label = 1",
    )


_SIM_INDEX_TOPK_FILTERED_ORACLE_TMPL = """
WITH q0 AS (
  SELECT vec_id AS query_id,
         [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
          for x in embedding] AS qq
  FROM embeddings WHERE vec_id < {n_queries}
), q AS (
  SELECT * FROM q0 WHERE len(list_filter(qq, x -> x != 0)) > 0
), c0 AS (
  -- the probe's predicate restricts the INDEX side only; NULL ids
  -- never index (the runner's isNotNull guard)
  SELECT vec_id AS c_id,
         [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
          for x in embedding] AS cq
  FROM embeddings WHERE label = 1 AND vec_id IS NOT NULL
), c AS (
  SELECT * FROM c0 WHERE len(list_filter(cq, x -> x != 0)) > 0
), scored AS (
  SELECT q.query_id, c.c_id,
         {cos} AS cosine
  FROM c JOIN q ON c.c_id != q.query_id
), ranked AS (
  SELECT query_id, c_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, c_id) AS rank
  FROM scored
)
SELECT query_id, c_id AS vec_id, cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {k}
"""


def _q_sim_pq_index_topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED top-k SERVED from the standing IVF-PQ index
    (streaming/similarity_pq.py::probe_pq_index — the compressed-
    layout twin of sim_index_topk_filtered): the embeddings table
    replays as two micro-batches into the two-store PQ layout with
    label metadata on BOTH stores (extra_cols), then the probe ranks
    only ``label = 1`` vectors — the predicate pushed into the pruned
    CODE-index cell scan, so non-qualifying vectors never enter the
    ADC ranking. nprobe = the full cell count and shortlist >= the
    corpus, so the probe is EXACT filtered top-k over every indexed
    vector and the oracle is the sim_index_topk_filtered spelling
    verbatim (two standing layouts, one contract). The deterministic
    two-batch build is memoized per process (_STANDING_IDX_CACHE, the
    served-index convention shared with the flat and BM25 twins)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        probe_pq_index,
    )

    index_dir, vecs_dir, cents_dir, cbs_dir, n_cells = _pq_standing_index(
        spark, sf_dir
    )
    emb = load_table(spark, sf_dir, "embeddings")
    return probe_pq_index(
        spark,
        index_dir,
        vecs_dir,
        cents_dir,
        cbs_dir,
        emb.filter(F.col("vec_id") < _N_QUERIES),
        k=_TOPK_K,
        nprobe=n_cells,
        shortlist=_emb_count(sf_dir),
        m=_PQ_M,
        predicate="label = 1",
    )


def _pq_standing_index(spark: SparkSession, sf_dir: str):
    """Build (once per process per sf_dir — see _STANDING_IDX_CACHE)
    the standing IVF-PQ two-store layout with label metadata on both
    stores. Returns (index_dir, vecs_dir, centroids_dir,
    codebooks_dir, n_cells)."""
    import os
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.similarity import (
        ivf_centroids,
        pq_codebooks,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        run_index_embedding_pq_stream,
    )
    from __spark_entry__ import _set_stream_partitions

    ckey = ("pq", sf_dir)
    if ckey in _STANDING_IDX_CACHE:
        return _STANDING_IDX_CACHE[ckey]
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"],
    )
    ids = sorted(x.as_py() for x in t.column("vec_id") if x.as_py() is not None)
    mid = ids[len(ids) // 2]
    stream_dir = tempfile.mkdtemp(prefix="spqf_src_")
    work = tempfile.mkdtemp(prefix="spqf_work_")
    key = t.column("vec_id")
    in_b0 = pc.or_kleene(pc.less(key, mid), pc.is_null(key))
    pq.write_table(
        t.filter(pc.fill_null(in_b0, True)),
        os.path.join(stream_dir, "00.parquet"),
    )
    pq.write_table(
        t.filter(pc.fill_null(pc.invert(in_b0), False)),
        os.path.join(stream_dir, "01.parquet"),
    )
    cents_dir = os.path.join(work, "centroids")
    cbs_dir = os.path.join(work, "codebooks")
    emb = load_table(spark, sf_dir, "embeddings")
    n_cells = _ivf_cells_for(sf_dir)
    n_vecs = _emb_count(sf_dir)
    ivf_centroids(emb, n_cells, corpus_count=n_vecs).write.parquet(cents_dir)
    pq_codebooks(
        emb, m=_PQ_M, n_codes=_PQ_CODES, corpus_count=n_vecs
    ).write.parquet(cbs_dir)
    old_parts = _set_stream_partitions(spark)
    try:
        stream = (
            spark.readStream.format("parquet")
            .schema("vec_id long, embedding array<double>, label int")
            .option("maxFilesPerTrigger", 1)
            .load(stream_dir)
        )
        q = run_index_embedding_pq_stream(
            _spread_replay(stream),
            os.path.join(work, "out"),
            os.path.join(work, "index"),
            os.path.join(work, "vecs"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            centroids_dir=cents_dir,
            codebooks_dir=cbs_dir,
            threshold=_SEMDEDUP_THRESHOLD,
            shortlist=_SPQ_SHORTLIST,
            m=_PQ_M,
            extra_cols=("label",),
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "sim_pq_index_topk_filtered availableNow replay "
                "exceeded 300s"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    _STANDING_IDX_CACHE[ckey] = (
        os.path.join(work, "index"), os.path.join(work, "vecs"),
        cents_dir, cbs_dir, n_cells,
    )
    return _STANDING_IDX_CACHE[ckey]


_SPQ_SHORTLIST = 8


def _q_stream_semantic_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ STANDING vector index (streaming/similarity_pq.py::
    run_index_embedding_pq_stream — the compressed-index upgrade of
    s_stream_semantic_index): the embeddings table replays as TWO
    micro-batches against a cell-partitioned index holding only PQ
    CODES (m=4 small ints/vector instead of 64 bigints), with the
    bucketed exact store consulted only for redelivery routing and the
    ADC shortlist's exact re-rank. Discovery: each arriving vector
    ranks its cellmates-so-far by integer ADC distance, keeps the top
    shortlist, exact-verifies cosine >= threshold — under the
    id-ordered replay that is exactly "rank smaller-id cellmates per
    vector", which the composed oracle spells (seeded centroids +
    seeded codebooks + ADC + exact verify, all integer/fixed-IEEE →
    hash-exact)."""
    import os
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.similarity import (
        ivf_centroids,
        pq_codebooks,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        run_index_embedding_pq_stream,
    )
    from __spark_entry__ import _set_stream_partitions

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = sorted(x.as_py() for x in t.column("vec_id") if x.as_py() is not None)
    mid = ids[len(ids) // 2]
    stream_dir = tempfile.mkdtemp(prefix="spq_src_")
    work = tempfile.mkdtemp(prefix="spq_work_")
    key = t.column("vec_id")
    in_b0 = pc.or_kleene(pc.less(key, mid), pc.is_null(key))
    pq.write_table(
        t.filter(pc.fill_null(in_b0, True)),
        os.path.join(stream_dir, "00.parquet"),
    )
    pq.write_table(
        t.filter(pc.fill_null(pc.invert(in_b0), False)),
        os.path.join(stream_dir, "01.parquet"),
    )
    cents_dir = os.path.join(work, "centroids")
    cbs_dir = os.path.join(work, "codebooks")
    emb = load_table(spark, sf_dir, "embeddings")
    ivf_centroids(
        emb, _ivf_cells_for(sf_dir), corpus_count=_emb_count(sf_dir)
    ).write.parquet(cents_dir)
    pq_codebooks(
        emb, m=_PQ_M, n_codes=_PQ_CODES, corpus_count=_emb_count(sf_dir)
    ).write.parquet(cbs_dir)
    old_parts = _set_stream_partitions(spark)
    try:
        stream = (
            spark.readStream.format("parquet")
            .schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .load(stream_dir)
        )
        q = run_index_embedding_pq_stream(
            _spread_replay(stream),
            os.path.join(work, "out"),
            os.path.join(work, "index"),
            os.path.join(work, "vecs"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            centroids_dir=cents_dir,
            codebooks_dir=cbs_dir,
            threshold=_SEMDEDUP_THRESHOLD,
            shortlist=_SPQ_SHORTLIST,
            m=_PQ_M,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "stream_semantic_pq availableNow replay exceeded 300s"
            )
        return spark.read.parquet(os.path.join(work, "out", "batch=*", "pairs"))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def _stream_semantic_pq_oracle() -> str:
    """Composed IVF-PQ standing-index oracle: the _semantic_oracle
    seeded-centroid/assignment CTEs (scale-invariant cells), the
    _PQ_ORACLE_BODY seeded codebooks/encoding, an ADC ranking of every
    vector's smaller-id cellmates (== "cellmates seen so far" under
    the gate's id-ordered replay), top-shortlist cut, exact-cosine
    verify — every stage integer or fixed-IEEE, hash-exact."""
    cos_vc = _COS_SQL.format(a="v.qv", b="c.cq")
    cos_ab = _COS_SQL.format(a="ea.qv", b="eb.qv")
    return f"""
WITH pqv AS MATERIALIZED (
  SELECT vec_id,
         [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
          for x in embedding] AS qv
  FROM embeddings WHERE embedding IS NOT NULL
), q AS MATERIALIZED (
  SELECT vec_id, qv FROM pqv
  WHERE CAST(list_sum([z[1] * z[2] for z in list_zip(qv, qv)])
             AS BIGINT) > 0
), params AS (
  SELECT n_cells, greatest(1, n // n_cells) AS step
  FROM (SELECT {_scaled_cells_sql()} AS n_cells, count(*) AS n
        FROM embeddings)
), cent AS (
  SELECT CAST(q.vec_id // p.step AS INTEGER) AS cell, q.qv AS cq
  FROM q, params p
  WHERE q.vec_id % p.step = 0 AND q.vec_id < p.step * p.n_cells
), allassign AS (
  SELECT v.vec_id, c.cell,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY {cos_vc} DESC, c.cell) AS rn
  FROM q v CROSS JOIN cent c
), assign AS (
  SELECT vec_id, cell FROM allassign WHERE rn = 1
), pqparams AS (
  SELECT greatest(1, (SELECT count(*) FROM embeddings) // {_PQ_CODES})
           AS step
), pqsub AS MATERIALIZED (
  SELECT vec_id, t.s, qv[t.s*{_PQ_W}+1 : (t.s+1)*{_PQ_W}] AS sv
  FROM q, unnest(range(0, {_PQ_M})) AS t(s)
), pqcb AS MATERIALIZED (
  SELECT CAST(v.vec_id // p.step AS INTEGER) AS code, t.s,
         v.qv[t.s*{_PQ_W}+1 : (t.s+1)*{_PQ_W}] AS cb
  FROM pqv v, pqparams p, unnest(range(0, {_PQ_M})) AS t(s)
  WHERE v.vec_id % p.step = 0 AND v.vec_id < p.step * {_PQ_CODES}
), pqenc AS MATERIALIZED (
  SELECT vec_id, s, code FROM (
    SELECT x.vec_id, x.s, c.code,
           row_number() OVER (
             PARTITION BY x.vec_id, x.s
             ORDER BY {_PQ_L2.format(a="x.sv", b="c.cb")}, c.code
           ) AS rn
    FROM pqsub x JOIN pqcb c ON x.s = c.s
  ) WHERE rn = 1
), pqlutall AS MATERIALIZED (
  SELECT x.vec_id AS query_id, x.s, c.code,
         {_PQ_L2.format(a="x.sv", b="c.cb")} AS d
  FROM pqsub x JOIN pqcb c ON x.s = c.s
), spqcand AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM assign a JOIN assign b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
), spqadc AS (
  SELECT c.id_a, c.id_b, CAST(sum(l.d) AS BIGINT) AS adc_dist
  FROM spqcand c
  JOIN pqenc e ON e.vec_id = c.id_a
  JOIN pqlutall l
    ON l.query_id = c.id_b AND l.s = e.s AND l.code = e.code
  GROUP BY c.id_a, c.id_b
), spqshort AS (
  SELECT id_a, id_b FROM (
    SELECT id_a, id_b,
           row_number() OVER (PARTITION BY id_b
                              ORDER BY adc_dist, id_a) AS rk
    FROM spqadc
  ) WHERE rk <= {_SPQ_SHORTLIST}
)
SELECT s.id_a, s.id_b, {cos_ab} AS cosine
FROM spqshort s
JOIN q ea ON ea.vec_id = s.id_a
JOIN q eb ON eb.vec_id = s.id_b
WHERE {cos_ab} >= {_SEMDEDUP_THRESHOLD}
"""


def _q_stream_semantic_text_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB text near-dup pipeline END TO END on the COMPRESSED
    index: raw documents replay as two micro-batches, each batch
    embedding its own text (embed_text_hashed, scan-side) into the
    IVF-PQ standing index — PQ codes in the cell index, exact
    coordinates only in the bucketed side store, ADC shortlist + exact
    re-rank per trigger. Composes the two r12 additions
    (dedup_semantic_text's derived vectors, s_stream_semantic_pq's
    compressed layout); centroids and codebooks are the seeded layouts
    over the derived corpus embeddings, so the composed oracle
    (derived-qv CTEs + seeded codebooks + ADC + exact verify) is
    hash-exact."""
    import os
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        embed_text_hashed,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.similarity import (
        ivf_centroids,
        pq_codebooks,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        run_index_embedding_pq_stream,
    )
    from __spark_entry__ import _set_stream_partitions

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = sorted(x.as_py() for x in t.column("doc_id") if x.as_py() is not None)
    mid = ids[len(ids) // 2]
    stream_dir = tempfile.mkdtemp(prefix="sstpq_src_")
    work = tempfile.mkdtemp(prefix="sstpq_work_")
    key = t.column("doc_id")
    in_b0 = pc.or_kleene(pc.less(key, mid), pc.is_null(key))
    pq.write_table(
        t.filter(pc.fill_null(in_b0, True)),
        os.path.join(stream_dir, "00.parquet"),
    )
    pq.write_table(
        t.filter(pc.fill_null(pc.invert(in_b0), False)),
        os.path.join(stream_dir, "01.parquet"),
    )
    n = _doc_count(sf_dir)
    corpus_emb = embed_text_hashed(
        load_table(spark, sf_dir, "documents"), dims=_EMBED_DIMS
    ).select(F.col("doc_id").alias("vec_id"), "embedding").localCheckpoint(eager=False)
    cents_dir = os.path.join(work, "centroids")
    cbs_dir = os.path.join(work, "codebooks")
    ivf_centroids(
        corpus_emb, _semtext_cells(n), corpus_count=n
    ).write.parquet(cents_dir)
    pq_codebooks(
        corpus_emb, m=_PQ_M, n_codes=_PQ_CODES, corpus_count=n
    ).write.parquet(cbs_dir)
    old_parts = _set_stream_partitions(spark)
    try:
        stream = (
            spark.readStream.format("parquet")
            .schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .load(stream_dir)
        )
        embedded = embed_text_hashed(
            _spread_replay(stream), dims=_EMBED_DIMS
        ).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )
        q = run_index_embedding_pq_stream(
            embedded,
            os.path.join(work, "out"),
            os.path.join(work, "index"),
            os.path.join(work, "vecs"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            centroids_dir=cents_dir,
            codebooks_dir=cbs_dir,
            threshold=_SEMTEXT_THRESHOLD,
            shortlist=_SPQ_SHORTLIST,
            m=_PQ_M,
            # derived vectors: materialize each batch before the
            # assignment/encoding inline the embed fold per reference
            materialize_input=True,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "stream_semantic_text_pq availableNow replay exceeded 300s"
            )
        return spark.read.parquet(os.path.join(work, "out", "batch=*", "pairs"))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def _stream_semantic_text_pq_oracle() -> str:
    """Derived-text twin of _stream_semantic_pq_oracle: the
    _hash_qv_prefix derived quantized vectors feed the seeded-centroid
    assignment, the seeded codebooks, the ADC smaller-id-cellmate
    ranking and the exact verify. (For derived vectors the codebook
    seed set equals q — embed_text_hashed emits NULL embeddings for
    exactly the zero-norm/NULL-text docs the qv CTE excludes.)"""
    cos_vc = _COS_SQL.format(a="v.qv", b="c.cq")
    cos_ab = _COS_SQL.format(a="ea.qv", b="eb.qv")
    auto = (
        "CAST(power(2, round_even(log2(sqrt(greatest(4.0,"
        " CAST(count(*) AS DOUBLE)))), 0)) AS BIGINT)"
    )
    return f"""
WITH {_hash_qv_prefix()}, params AS (
  SELECT n_cells, greatest(1, n // n_cells) AS step
  FROM (SELECT greatest(4, least(65536, {auto})) AS n_cells,
               count(*) AS n
        FROM documents)
), cent AS (
  SELECT CAST(q.vec_id // p.step AS INTEGER) AS cell, q.qv AS cq
  FROM q, params p
  WHERE q.vec_id % p.step = 0 AND q.vec_id < p.step * p.n_cells
), allassign AS (
  SELECT v.vec_id, c.cell,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY {cos_vc} DESC, c.cell) AS rn
  FROM q v CROSS JOIN cent c
), assign AS (
  SELECT vec_id, cell FROM allassign WHERE rn = 1
), pqparams AS (
  SELECT greatest(1, (SELECT count(*) FROM documents) // {_PQ_CODES})
           AS step
), pqsub AS MATERIALIZED (
  SELECT vec_id, t.s, qv[t.s*{_PQ_W}+1 : (t.s+1)*{_PQ_W}] AS sv
  FROM q, unnest(range(0, {_PQ_M})) AS t(s)
), pqcb AS MATERIALIZED (
  SELECT CAST(v.vec_id // p.step AS INTEGER) AS code, t.s,
         v.qv[t.s*{_PQ_W}+1 : (t.s+1)*{_PQ_W}] AS cb
  FROM q v, pqparams p, unnest(range(0, {_PQ_M})) AS t(s)
  WHERE v.vec_id % p.step = 0 AND v.vec_id < p.step * {_PQ_CODES}
), pqenc AS MATERIALIZED (
  SELECT vec_id, s, code FROM (
    SELECT x.vec_id, x.s, c.code,
           row_number() OVER (
             PARTITION BY x.vec_id, x.s
             ORDER BY {_PQ_L2.format(a="x.sv", b="c.cb")}, c.code
           ) AS rn
    FROM pqsub x JOIN pqcb c ON x.s = c.s
  ) WHERE rn = 1
), pqlutall AS MATERIALIZED (
  SELECT x.vec_id AS query_id, x.s, c.code,
         {_PQ_L2.format(a="x.sv", b="c.cb")} AS d
  FROM pqsub x JOIN pqcb c ON x.s = c.s
), spqcand AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM assign a JOIN assign b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
), spqadc AS (
  SELECT c.id_a, c.id_b, CAST(sum(l.d) AS BIGINT) AS adc_dist
  FROM spqcand c
  JOIN pqenc e ON e.vec_id = c.id_a
  JOIN pqlutall l
    ON l.query_id = c.id_b AND l.s = e.s AND l.code = e.code
  GROUP BY c.id_a, c.id_b
), spqshort AS (
  SELECT id_a, id_b FROM (
    SELECT id_a, id_b,
           row_number() OVER (PARTITION BY id_b
                              ORDER BY adc_dist, id_a) AS rk
    FROM spqadc
  ) WHERE rk <= {_SPQ_SHORTLIST}
)
SELECT s.id_a, s.id_b, {cos_ab} AS cosine
FROM spqshort s
JOIN q ea ON ea.vec_id = s.id_a
JOIN q eb ON eb.vec_id = s.id_b
WHERE {cos_ab} >= {_SEMTEXT_THRESHOLD}
"""


def _q_stream_semantic_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fully in-engine STREAMING semantic pipeline: raw documents
    replay as two micro-batches, each batch embedding its own text
    (embed_text_hashed — scan-side, stream-safe expressions) before
    entering the standing cell-partitioned vector index. No fixture
    vector exists anywhere: text → embedding → index probe → exact
    cosine pairs, end to end under a streaming trigger. Centroids are
    the seeded layout over the DERIVED corpus embeddings (written up
    front — the offline-trained production shape), so the union of
    per-batch pairs equals the one-shot IVF-cell pair run over the
    derived vectors (the cell layout IS the standing index's
    architecture; the gated BATCH dedup key moved to the SRP linear
    plan in r12) and the oracle is _semantic_text_ivf_pairs_oracle()
    verbatim."""
    import os
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        embed_text_hashed,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.similarity import (
        ivf_centroids,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        run_index_embedding_stream,
    )
    from __spark_entry__ import _set_stream_partitions

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = sorted(x.as_py() for x in t.column("doc_id") if x.as_py() is not None)
    mid = ids[len(ids) // 2]
    stream_dir = tempfile.mkdtemp(prefix="ssemtext_src_")
    work = tempfile.mkdtemp(prefix="ssemtext_work_")
    key = t.column("doc_id")
    in_b0 = pc.or_kleene(pc.less(key, mid), pc.is_null(key))
    pq.write_table(
        t.filter(pc.fill_null(in_b0, True)),
        os.path.join(stream_dir, "00.parquet"),
    )
    pq.write_table(
        t.filter(pc.fill_null(pc.invert(in_b0), False)),
        os.path.join(stream_dir, "01.parquet"),
    )
    n = _doc_count(sf_dir)
    corpus_emb = embed_text_hashed(
        load_table(spark, sf_dir, "documents"), dims=_EMBED_DIMS
    ).select(F.col("doc_id").alias("vec_id"), "embedding")
    cents_dir = os.path.join(work, "centroids")
    ivf_centroids(
        corpus_emb, _semtext_cells(n), corpus_count=n
    ).write.parquet(cents_dir)
    old_parts = _set_stream_partitions(spark)
    try:
        stream = (
            spark.readStream.format("parquet")
            .schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .load(stream_dir)
        )
        embedded = embed_text_hashed(
            _spread_replay(stream), dims=_EMBED_DIMS
        ).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )
        q = run_index_embedding_stream(
            embedded,
            os.path.join(work, "out"),
            os.path.join(work, "index"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            centroids_dir=cents_dir,
            threshold=_SEMTEXT_THRESHOLD,
            # derived vectors: materialize each batch before the
            # assignment inlines the embed fold per (row, centroid)
            materialize_input=True,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "stream_semantic_text availableNow replay exceeded 300s"
            )
        return spark.read.parquet(
            os.path.join(work, "out", "batch=*", "pairs")
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def _q_stream_cluster_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standing cluster maintenance (streaming/dedup.py::
    run_cluster_maintain_stream): the documents table replays as TWO
    micro-batches, each SimHash-fingerprinted in the stream; per batch
    the runner discovers the edges the batch introduces (vs the
    persistent fingerprint index + within-batch sparse edges) and
    folds O(batch + touched) DELTA rows into the persisted label
    store with clusters_delta. read_cluster_labels reconstructs the
    full table (compaction + deltas, latest-batch-wins), which must
    equal the from-scratch near_dup_clusters over the whole corpus —
    the oracle is _HAMMING_CLUSTERS_ORACLE verbatim."""
    import os
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        read_cluster_labels,
        run_cluster_maintain_stream,
    )
    from __spark_entry__ import _set_stream_partitions

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = sorted(x.as_py() for x in t.column("doc_id") if x.as_py() is not None)
    mid = ids[len(ids) // 2]
    stream_dir = tempfile.mkdtemp(prefix="sclm_src_")
    work = tempfile.mkdtemp(prefix="sclm_work_")
    # NULL ids ride in batch 0: they label as NULL-cluster singleton
    # rows (the near_dup_clusters rule) and join no edge
    key = t.column("doc_id")
    in_b0 = pc.or_kleene(pc.less(key, mid), pc.is_null(key))
    pq.write_table(
        t.filter(pc.fill_null(in_b0, True)),
        os.path.join(stream_dir, "00.parquet"),
    )
    pq.write_table(
        t.filter(pc.fill_null(pc.invert(in_b0), False)),
        os.path.join(stream_dir, "01.parquet"),
    )
    old_parts = _set_stream_partitions(spark)
    try:
        stream = (
            spark.readStream.format("parquet")
            .schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .load(stream_dir)
        )
        fps = simhash(_spread_replay(stream)).withColumnRenamed(
            "simhash", "fp"
        )
        out = os.path.join(work, "out")
        q = run_cluster_maintain_stream(
            fps,
            out,
            os.path.join(work, "index"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            id_col="doc_id",
            hash_col="fp",
            max_hamming=3,
            bands=4,
            n_bits=60,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "stream_cluster_maintain availableNow replay exceeded 300s"
            )
        return read_cluster_labels(spark, out)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


_LSH_APPEND_SPLIT = 250


def _q_lsh_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup discovery (operators/dedup.py::
    lsh_append_candidates): docs below the split are the already-
    ingested corpus (persisted LSH band index,
    ``build_lsh_band_index``), the rest arrive as a new batch; output
    = candidate pairs the batch introduces (batch-vs-corpus +
    within-batch). The oracle replays it as ALL LSH pairs minus the
    pairs entirely inside the index — the set-algebra identity the
    incremental plan must preserve."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        build_lsh_band_index,
        lsh_append_candidates,
    )

    docs = load_table(spark, sf_dir, "documents")
    index = build_lsh_band_index(
        docs.filter(F.col("doc_id") < _LSH_APPEND_SPLIT),
        bands=_BANDS,
        rows_per_band=_ROWS_PER_BAND,
    )
    batch = docs.filter(F.col("doc_id") >= _LSH_APPEND_SPLIT)
    return lsh_append_candidates(
        index, batch, bands=_BANDS, rows_per_band=_ROWS_PER_BAND
    )


_LSH_APPEND_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLES} AS __sh FROM documents
  WHERE text IS NOT NULL
), sig AS (
  SELECT doc_id, {_minhash_list_sql()} AS minhash FROM sh
), bands AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {b} AS band, {_band_hash_sql(b)} AS bhash FROM sig"
      for b in range(_BANDS)
  )}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id
-- everything EXCEPT pairs already known to the index (both below the
-- split): exactly what the incremental batch run must discover
WHERE NOT (a.doc_id < {_LSH_APPEND_SPLIT} AND b.doc_id < {_LSH_APPEND_SPLIT})
"""


# ------------------------------------------------------- n-gram jaccard

_JACCARD_THRESHOLD = 0.2


def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: LSH candidate discovery -> exact per-pair Jaccard
    verification (no shingle self-join; the exact all-pairs variant
    explodes to ~4e8 joined rows on sf0.1's hot shingles)."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs)
    cands = lsh_candidate_pairs(sigs, bands=_BANDS, rows_per_band=_ROWS_PER_BAND)
    return jaccard_verify_pairs(
        docs, cands, threshold=_JACCARD_THRESHOLD,
        min_parallelism=spark.sparkContext.defaultParallelism,
    )


_JACCARD_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLES} AS __sh FROM documents
  -- NULL-text docs excluded, mirroring minhash_signatures'
  -- WHERE text IS NOT NULL (a NULL-text doc must emit no
  -- signature and join no LSH bucket)
  WHERE text IS NOT NULL
), sig AS (
  SELECT doc_id, {_minhash_list_sql()} AS minhash FROM sh
), bands AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {b} AS band, {_band_hash_sql(b)} AS bhash FROM sig"
      for b in range(_BANDS)
  )}
), cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id
), verified AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(sa.__sh, sb.__sh)) AS ni,
         len(sa.__sh) AS na, len(sb.__sh) AS nb
  FROM cands c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b,
       CAST(ni AS DOUBLE) / CAST(na + nb - ni AS DOUBLE) AS jaccard
FROM verified
WHERE CAST(ni AS DOUBLE) / CAST(na + nb - ni AS DOUBLE) >= {_JACCARD_THRESHOLD}
"""

# --------------------------------------------------------------- simhash


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(load_table(spark, sf_dir, "documents"))


# coalesce(.., 0): DuckDB list_sum([]) is NULL while Spark's aggregate
# over an empty token array returns the 0 seed — without it an empty/
# whitespace-only document would hash to 0 here but 2^60-1 in Spark
# (0 >= 0 sets every bit under the tie rule).
_SIMHASH_BIT_TERMS = " + ".join(
    f"""(CASE WHEN coalesce(list_sum([
           CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END for h in __th
         ]), 0) >= 0 THEN 1::BIGINT << {b} ELSE 0 END)"""
    for b in range(60)
)

_SIMHASH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         [{_H64.format(x="t")}
          for t in list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               t -> t != '')] AS __th
  FROM documents
)
SELECT doc_id,
       -- NULL text: Spark's aggregate over a NULL array is NULL ->
       -- every bit's CASE takes the else-0 branch -> simhash 0; the
       -- per-bit coalesce alone would instead set all bits
       CAST(CASE WHEN __th IS NULL THEN 0
                 ELSE {_SIMHASH_BIT_TERMS} END AS BIGINT) AS simhash
FROM toks
"""

# ------------------------------------------------------------- text stats


def _q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_text_stats(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        "n_tokens",
        "n_tokens_bpe",
        "n_chars_m",
        "n_punct",
        "n_stopwords",
        "punct_ratio",
        "stopword_ratio",
        "quality_score",
    )


_EN_STOP = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])

_TEXT_STATS_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t != '')
           AS toks,
         length(text) AS n_chars_m,
         length(text) - length(regexp_replace(text, '[\\.\\,\\;\\:\\!\\?]', '', 'g'))
           AS n_punct,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
           AS n_bpe
  FROM documents
), counted AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(n_bpe AS BIGINT) AS n_tokens_bpe,
         CAST(n_chars_m AS BIGINT) AS n_chars_m,
         CAST(n_punct AS BIGINT) AS n_punct,
         CAST(len(list_filter(toks,
              t -> list_contains([{_EN_STOP}], lower(t)))) AS BIGINT)
           AS n_stopwords
  FROM base
)
SELECT doc_id, n_tokens, n_tokens_bpe, n_chars_m, n_punct, n_stopwords,
       CASE WHEN n_chars_m > 0
            THEN CAST(n_punct AS DOUBLE) / CAST(n_chars_m AS DOUBLE)
            ELSE 0.0 END AS punct_ratio,
       CASE WHEN n_tokens > 0
            THEN CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE)
            ELSE 0.0 END AS stopword_ratio,
       (CASE WHEN n_tokens >= 20 AND n_tokens <= 1000 THEN 0.4 ELSE 0.0 END)
       + 0.3 * (1.0 - CASE WHEN n_chars_m > 0
                  THEN CAST(n_punct AS DOUBLE) / CAST(n_chars_m AS DOUBLE)
                  ELSE 0.0 END)
       + 0.3 * (CASE WHEN n_tokens > 0
                  THEN CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                  ELSE 0.0 END) AS quality_score
FROM counted
"""

def _q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule flags (functions/text.py::with_gopher_flags,
    Rae et al. 2021 App. A): per-doc counts + one 0/1 flag per rule +
    `passes` — every threshold an integer cross-multiplication, so no
    float exists anywhere in the output."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.functions import with_gopher_flags

    return with_gopher_flags(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "n_words", "word_chars", "n_alpha_words", "n_stop_hits",
        "n_lines", "n_bullet_lines", "n_ellipsis_lines", "n_symbols",
        "f_word_count", "f_mean_word_len", "f_symbol_ratio",
        "f_bullet_lines", "f_ellipsis_lines", "f_alpha_words",
        "f_stopwords", "passes",
    )


_GOPHER_RULES_ORACLE = """
WITH base AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(trim(text), '\s+'),
                     t -> t != '') AS toks,
         list_filter(list_transform(regexp_split_to_array(text, '\n'),
                                    l -> trim(l)),
                     l -> l != '') AS lns
  FROM documents
), counted AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         -- empty token list sums to 0 (Spark aggregate's zero), NULL
         -- text stays NULL — the CASE keeps the two apart (DuckDB
         -- list_sum([]) is NULL)
         CASE WHEN text IS NULL THEN NULL
              ELSE CAST(COALESCE(list_sum(list_transform(toks,
                     t -> length(t))), 0) AS BIGINT) END AS word_chars,
         CAST(len(list_filter(toks,
              t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT)
           AS n_alpha_words,
         CAST(len(list_filter(['the', 'be', 'to', 'of', 'and', 'that',
                               'have', 'with'],
              w -> list_contains(list_transform(toks, t -> lower(t)), w)))
              AS BIGINT) AS n_stop_hits,
         CAST(len(lns) AS BIGINT) AS n_lines,
         CAST(len(list_filter(lns,
              l -> regexp_matches(l, '^[-*]'))) AS BIGINT)
           AS n_bullet_lines,
         CAST(len(list_filter(lns,
              l -> regexp_matches(l, '\.{3,}$'))) AS BIGINT)
           AS n_ellipsis_lines,
         CAST(length(text) - length(replace(text, '#', ''))
              + len(regexp_extract_all(text, '\.{3,}'))
              AS BIGINT) AS n_symbols
  FROM base
)
SELECT doc_id, n_words, word_chars, n_alpha_words, n_stop_hits, n_lines,
       n_bullet_lines, n_ellipsis_lines, n_symbols,
       CAST(n_words >= 50 AND n_words <= 100000 AS INTEGER) AS f_word_count,
       CAST(word_chars >= 3 * n_words AND word_chars <= 10 * n_words
            AS INTEGER) AS f_mean_word_len,
       CAST(10 * n_symbols <= n_words AS INTEGER) AS f_symbol_ratio,
       CAST(10 * n_bullet_lines <= 9 * n_lines AS INTEGER) AS f_bullet_lines,
       CAST(10 * n_ellipsis_lines <= 3 * n_lines AS INTEGER)
         AS f_ellipsis_lines,
       CAST(5 * n_alpha_words >= 4 * n_words AS INTEGER) AS f_alpha_words,
       CAST(n_stop_hits >= 2 AS INTEGER) AS f_stopwords,
       CAST(n_words >= 50 AND n_words <= 100000
            AND word_chars >= 3 * n_words AND word_chars <= 10 * n_words
            AND 10 * n_symbols <= n_words
            AND 10 * n_bullet_lines <= 9 * n_lines
            AND 10 * n_ellipsis_lines <= 3 * n_lines
            AND 5 * n_alpha_words >= 4 * n_words
            AND n_stop_hits >= 2 AS INTEGER) AS passes
FROM counted
"""


# -------------------------------------------------------------------- PII


def _q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII candidate scan + redaction over documents (functions/pii.py):
    per-doc email/phone/16-digit-card counts, composite flag, and the
    token-redacted text — all scan-side regex in codegen."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.functions import (
        redact_pii,
        with_pii_flags,
    )

    docs = load_table(spark, sf_dir, "documents")
    return redact_pii(with_pii_flags(docs)).select(
        "doc_id", "n_emails", "n_phones", "n_cc16", "has_pii", "text_redacted"
    )


def _pii_oracle() -> str:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.functions.pii import (
        CC16_RE,
        CC_TOKEN,
        EMAIL_RE,
        EMAIL_TOKEN,
        PHONE_RE,
        PHONE_TOKEN,
    )

    # identical pattern strings reach both engines verbatim (DuckDB
    # string literals do not process backslash escapes); RE2 and Java
    # agree on these classes
    email = EMAIL_RE
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{email}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(text, '{CC16_RE}')) AS BIGINT) AS n_cc16,
       (len(regexp_extract_all(text, '{email}'))
        + len(regexp_extract_all(text, '{PHONE_RE}'))
        + len(regexp_extract_all(text, '{CC16_RE}'))) > 0 AS has_pii,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{CC16_RE}', '{CC_TOKEN}', 'g'),
           '{PHONE_RE}', '{PHONE_TOKEN}', 'g'),
           '{email}', '{EMAIL_TOKEN}', 'g') AS text_redacted
FROM documents
"""


# ---------------------------------------------------------------- lang id


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = with_lang_id(load_table(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", *[f"score_{lang}" for lang in sorted(LANG_STOPWORDS)], "lang_pred"
    )


def _lang_score_cols_sql() -> str:
    """Per-language stopword-score columns over a ``toks`` list — THE
    single SQL spelling of with_lang_id's scores, shared by
    _lang_oracle and _clean_cte_prefix so the pipeline oracles can
    never drift from the text_lang_id oracle."""
    return ", ".join(
        "CAST(len(list_filter(toks, t -> list_contains(["
        + ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        + f"], lower(t)))) AS BIGINT) AS score_{lang}"
        for lang in sorted(LANG_STOPWORDS)
    )


def _lang_argmax_case_sql() -> str:
    """Argmax CASE over the score columns: first language (sorted
    order) reaching the maximum — mirrors the Spark aggregate's
    strictly-greater replacement rule. Shared with _clean_cte_prefix."""
    langs = sorted(LANG_STOPWORDS)
    case = "CASE "
    for lang in langs:
        conds = " AND ".join(
            f"score_{lang} >= score_{other}" for other in langs if other != lang
        )
        case += f"WHEN {conds} THEN '{lang}' "
    return case + "END"


def _lang_oracle() -> str:
    langs = sorted(LANG_STOPWORDS)
    score_cols = _lang_score_cols_sql()
    case = _lang_argmax_case_sql()
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t != '')
           AS toks
  FROM documents
), scored AS (
  SELECT doc_id, {score_cols} FROM toks
)
SELECT doc_id, {", ".join("score_" + lang for lang in langs)},
       {case} AS lang_pred
FROM scored
"""


def _q_lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cavnar–Trenkle 2-/3-gram profile language ID (upgrades the
    stopword heuristic; functions/text.py::with_lang_id_ngram)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.functions.text import (
        with_lang_id_ngram,
    )

    out = with_lang_id_ngram(
        load_table(spark, sf_dir, "documents"),
        min_parallelism=spark.sparkContext.defaultParallelism,
    )
    return out.select("doc_id", "lang_pred_ngram")


def _lang_ngram_oracle() -> str:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.functions.text import (
        LANG_PROFILES,
        NGRAM_SAMPLE_CHARS,
        PROFILE_K,
    )

    values = ", ".join(
        f"('{lang}', '{g}', {r})"
        for lang in sorted(LANG_PROFILES)
        for g, r in LANG_PROFILES[lang]
    )
    # Same pipeline as the Spark expression: normalize, 2-/3-gram walk,
    # rank top-K by (count desc, gram asc), out-of-place distance with
    # penalty K, Han-script override, argmin with lang-asc ties.
    # RE2 spells the Han class \p{Han} (Java: \p{IsHan}).
    # The prediction is a pure function of the TEXT, so the pipeline is
    # keyed by DISTINCT text and joined back null-safely — a per-doc_id
    # keying would lose NULL-id documents' predictions (NULL keys never
    # equi-join; the dirty suite caught exactly that) while Spark
    # computes the expression per row regardless of id.
    return rf"""
WITH doc AS (
  SELECT DISTINCT text,
         ' ' || trim(regexp_replace(regexp_replace(
             lower(left(text, {NGRAM_SAMPLE_CHARS})),
             '[^\p{{L}} ]', ' ', 'g'), ' +', ' ', 'g')) || ' ' AS s
  FROM documents
), han AS (
  SELECT text,
         length(s) - length(regexp_replace(s, '\p{{Han}}', '', 'g'))
           AS han_cnt,
         length(replace(s, ' ', '')) AS letters
  FROM doc
), tg AS (
  SELECT text, substring(s, CAST(i AS INTEGER), 2) AS g
  FROM doc, LATERAL unnest(range(1, length(s))) AS t(i)
  WHERE length(s) >= 2
  UNION ALL
  SELECT text, substring(s, CAST(i AS INTEGER), 3) AS g
  FROM doc, LATERAL unnest(range(1, length(s) - 1)) AS t(i)
  WHERE length(s) >= 3
), cnt AS (
  SELECT text, g, count(*) AS c FROM tg
  WHERE trim(g) <> ''
  GROUP BY text, g
), ranked AS (
  SELECT text, g,
         row_number() OVER (PARTITION BY text ORDER BY c DESC, g) AS r
  FROM cnt
), prof AS (
  SELECT * FROM ranked WHERE r <= {PROFILE_K}
), lprof AS (
  SELECT * FROM (VALUES {values}) v(lang, g, lr)
), dist AS (
  SELECT p.text, l.lang,
         sum(coalesce(abs(lp.lr - p.r), {PROFILE_K})) AS d
  FROM prof p
  CROSS JOIN (SELECT DISTINCT lang FROM lprof) l
  LEFT JOIN lprof lp ON lp.lang = l.lang AND lp.g = p.g
  GROUP BY p.text, l.lang
), best AS (
  SELECT text, lang,
         row_number() OVER (PARTITION BY text ORDER BY d, lang) AS rn
  FROM dist
), pred AS (
  SELECT d.text,
         CASE WHEN h.han_cnt > 0 AND h.han_cnt * 2 > h.letters THEN 'zh'
              ELSE b.lang END AS lang_pred_ngram
  FROM doc d
  LEFT JOIN han h ON h.text IS NOT DISTINCT FROM d.text
  LEFT JOIN best b ON b.text IS NOT DISTINCT FROM d.text AND b.rn = 1
)
SELECT dd.doc_id, p.lang_pred_ngram
FROM documents dd
LEFT JOIN pred p ON p.text IS NOT DISTINCT FROM dd.text
"""


# ------------------------------------------------------------ fingerprint


def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    fp = with_fingerprint(load_table(spark, sf_dir, "documents"))
    return fp.select("doc_id", F.posexplode("fingerprint").alias("pos", "fp_hash"))


_FP_ORACLE = f"""
WITH grams AS (
  SELECT doc_id,
         [{_H64.format(x="substring(text, i, 9)")}
          for i in range(1, greatest(length(text) - 8, 1) + 1)] AS g
  FROM documents
), fp AS (
  SELECT doc_id,
         list_sort(list_distinct(
           [list_min(g[i:i+3]) for i in range(1, greatest(len(g) - 3, 1) + 1)]
         )) AS fingerprint
  FROM grams
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY fp_hash) - 1
            AS INTEGER) AS pos,
       fp_hash
FROM (SELECT doc_id, unnest(fingerprint) AS fp_hash FROM fp)
"""

# ------------------------------------------------------------ cosine topk

_TOPK_K = 5
_N_QUERIES = 10

#: THE quantized-cosine SQL template (exact int64 dot products, one
#: fixed IEEE op sequence) — every cosine-emitting oracle must format
#: THIS string so the op order can never drift between oracles or
#: from the Spark-side _dot chain (operators/similarity.py).
_COS_SQL = (
    "CAST(CAST(list_sum([z[1] * z[2] for z in list_zip({a}, {b})])"
    " AS BIGINT) AS DOUBLE)"
    " / (sqrt(CAST(CAST(list_sum([z[1] * z[2] for z in list_zip({a}, {a})])"
    " AS BIGINT) AS DOUBLE))"
    " * sqrt(CAST(CAST(list_sum([z[1] * z[2] for z in list_zip({b}, {b})])"
    " AS BIGINT) AS DOUBLE)))"
)


def _q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return cosine_topk(emb, queries, k=_TOPK_K)


_COSINE_TOPK_ORACLE = f"""
WITH q0 AS (
  SELECT vec_id AS query_id,
         [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
          for x in embedding] AS qq
  FROM embeddings WHERE vec_id < {_N_QUERIES}
), q AS (
  -- zero-norm vectors excluded on BOTH sides, mirroring cosine_topk's
  -- n2 > 0 filters (cosine undefined; Spark never emits those rows)
  SELECT * FROM q0 WHERE len(list_filter(qq, x -> x != 0)) > 0
), c0 AS (
  SELECT vec_id AS c_id,
         [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
          for x in embedding] AS cq
  FROM embeddings
), c AS (
  SELECT * FROM c0 WHERE len(list_filter(cq, x -> x != 0)) > 0
), scored AS (
  SELECT q.query_id, c.c_id,
         {_COS_SQL.format(a="c.cq", b="q.qq")} AS cosine
  FROM c JOIN q ON c.c_id != q.query_id
), ranked AS (
  SELECT query_id, c_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, c_id) AS rank
  FROM scored
)
SELECT query_id, c_id AS vec_id, cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {_TOPK_K}
"""


# ------------------------------------------------- BM25 / hybrid retrieval

def _q_text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical BM25 top-k retrieval (operators/retrieval.py::
    bm25_topk): the first N docs' texts query the whole corpus.
    Engine-exact per the module contract — raw Robertson idf ratio
    (no ln), integer-rational tf saturation (k1=1.2, b=0.75),
    per-term contributions quantized to micro-units and INTEGER-
    summed, so the score hashes bit-equal cross-engine."""
    docs = load_table(spark, sf_dir, "documents")
    queries = docs.where(f"doc_id < {_N_QUERIES}").select(
        F.col("doc_id").alias("query_id"), "text"
    )
    return bm25_topk(docs, queries, k=_TOPK_K)


#: the BM25 CTE chain through the quantized-contribution sum —
#: shared verbatim by the standalone key, the hybrid fusion, and the
#: standing-index probe (format args: exclude_self SQL predicate
#: tail; src = the corpus relation — the streaming key passes the
#: NULL-id-filtered view, the keyed-store contract)
_BM25_CTES_TMPL = f"""
btoks AS (
  SELECT doc_id, lower(unnest(list_filter(regexp_split_to_array(trim(text),
                '\\s+'), t -> t != ''))) AS term
  FROM {{src}}
), btf AS (
  SELECT doc_id, term, count(*) AS tf FROM btoks GROUP BY 1, 2
), bdl AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM btf GROUP BY 1
), bdf AS (
  SELECT term, count(*) AS df FROM btf GROUP BY 1
), bn AS (SELECT count(*) AS n_docs FROM {{src}}),
btt AS (SELECT count(*) AS t_tokens FROM btoks),
bqt AS (
  SELECT DISTINCT doc_id AS query_id,
         lower(unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
               t -> t != ''))) AS term
  FROM {{src}} WHERE doc_id < {_N_QUERIES}
), bscored AS (
  -- spelled as operators/retrieval.py's contrib expression: idf
  -- ratio x integer-rational tf part, one multiply, half-up round,
  -- integer sum (addition-order-free)
  SELECT query_id, btf.doc_id,
    CAST(sum(CAST(round((1000000.0
       * (CAST(2*n_docs - 2*df + 1 AS DOUBLE) / CAST(2*df + 1 AS DOUBLE)))
       * ((44.0 * CAST(t_tokens AS DOUBLE) * CAST(tf AS DOUBLE))
          / (20.0 * CAST(t_tokens AS DOUBLE) * CAST(tf AS DOUBLE)
             + 6.0 * CAST(t_tokens AS DOUBLE)
             + 18.0 * CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE)))
      ) AS BIGINT)) AS BIGINT) AS bm25_q
  FROM btf JOIN bqt USING (term) JOIN bdf USING (term) JOIN bdl USING (doc_id)
  CROSS JOIN bn CROSS JOIN btt
  {{self_pred}}
  GROUP BY 1, 2
), branked AS (
  SELECT query_id, doc_id, bm25_q,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY bm25_q DESC, doc_id) AS rank
  FROM bscored
)"""

_BM25_TOPK_ORACLE = f"""
WITH {_BM25_CTES_TMPL.format(self_pred="", src="documents")}
SELECT query_id, doc_id, bm25_q, CAST(rank AS INTEGER) AS rank
FROM branked WHERE rank <= {_TOPK_K}
"""


def _q_sim_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (operators/retrieval.py::rrf_fuse): the BM25
    lexical leg over documents and the exact-cosine dense leg over
    the aligned embeddings (doc_id == vec_id in the testdata), fused
    by reciprocal-rank (k0=60). Both legs exclude the self hit (the
    cosine_topk convention). Each reciprocal is one correctly-rounded
    IEEE division and the two-leg sum is spelled in fixed order, so
    the fused score hashes bit-equal cross-engine."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    queries = docs.where(f"doc_id < {_N_QUERIES}").select(
        F.col("doc_id").alias("query_id"), "text"
    )
    lex = bm25_topk(docs, queries, k=_TOPK_K, exclude_self=True)
    dense = cosine_topk(emb, emb.filter(F.col("vec_id") < _N_QUERIES), k=_TOPK_K)
    return rrf_fuse(lex, dense, k=_TOPK_K)


def _hybrid_rrf_oracle(cos: str, src: str = "documents",
                       dense_pred: str = "") -> str:
    """The RRF hybrid oracle: the BM25 CTE chain (self-excluded) and
    the quantized-cosine dense leg, fused 1/(60+r) in fixed two-leg
    order. ``src``/``dense_pred`` carry the standing-index keyed-store
    contract (NULL ids never index) for the served variant."""
    return f"""
WITH {_BM25_CTES_TMPL.format(self_pred="WHERE btf.doc_id != query_id", src=src)},
dq0 AS (
  SELECT vec_id AS query_id,
         [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
          for x in embedding] AS qq
  FROM embeddings WHERE vec_id < {_N_QUERIES}
), dq AS (
  SELECT * FROM dq0 WHERE len(list_filter(qq, x -> x != 0)) > 0
), dc0 AS (
  SELECT vec_id AS c_id,
         [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
          for x in embedding] AS cq
  FROM embeddings {dense_pred}
), dc AS (
  SELECT * FROM dc0 WHERE len(list_filter(cq, x -> x != 0)) > 0
), dscored AS (
  SELECT dq.query_id, dc.c_id,
         {cos} AS cosine
  FROM dc JOIN dq ON dc.c_id != dq.query_id
), dranked AS (
  SELECT query_id, c_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, c_id) AS rank
  FROM dscored
), lex AS (
  SELECT query_id, doc_id AS id, rank AS rl FROM branked
  WHERE rank <= {_TOPK_K}
), dense AS (
  SELECT query_id, c_id AS id, rank AS rd FROM dranked
  WHERE rank <= {_TOPK_K}
), fused AS (
  SELECT coalesce(lex.query_id, dense.query_id) AS query_id,
         coalesce(lex.id, dense.id) AS id,
         coalesce(1.0 / (60 + CAST(rl AS DOUBLE)), 0.0)
           + coalesce(1.0 / (60 + CAST(rd AS DOUBLE)), 0.0) AS rrf
  FROM lex FULL OUTER JOIN dense
    ON lex.query_id = dense.query_id AND lex.id = dense.id
), franked AS (
  SELECT query_id, id, rrf,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rrf DESC, id) AS rank
  FROM fused
)
SELECT query_id, id AS doc_id, rrf, CAST(rank AS INTEGER) AS rank
FROM franked WHERE rank <= {_TOPK_K}
"""


#: standing-index build memo per (family, sf_dir): the BM25 postings
#: index feeds BOTH s_stream_bm25_index and the served-hybrid key in
#: one gate/bench pass, and the build (a two-batch availableNow
#: replay) is deterministic, so rebuilding it per key is
#: observationally identical. Dirs live under tempfile for the
#: process lifetime (the OS tmp reaper owns them).
_STANDING_IDX_CACHE: dict = {}


def _bm25_standing_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process per sf_dir) the standing BM25 index:
    the documents table replayed as TWO micro-batches through
    streaming/retrieval.py::run_index_bm25_stream. NULL ids ride in
    batch 0 so the replay delivers them (the runner drops them — the
    keyed-store contract the oracle's src filter mirrors); splitting
    ON the id co-locates duplicate ids in one batch, where the
    runner's groupBy merges them exactly as the batch operator."""
    import os
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        run_index_bm25_stream,
    )
    from __spark_entry__ import _set_stream_partitions

    ckey = ("bm25", sf_dir)
    if ckey in _STANDING_IDX_CACHE:
        return _STANDING_IDX_CACHE[ckey]
    # lang rides as extra_cols metadata on every posting row — inert
    # for the unfiltered probes, the filtered key's predicate target
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    ids = sorted(x.as_py() for x in t.column("doc_id") if x.as_py() is not None)
    mid = ids[len(ids) // 2]
    stream_dir = tempfile.mkdtemp(prefix="sbm25_src_")
    work = tempfile.mkdtemp(prefix="sbm25_work_")
    key = t.column("doc_id")
    in_b0 = pc.or_kleene(pc.less(key, mid), pc.is_null(key))
    pq.write_table(
        t.filter(pc.fill_null(in_b0, True)),
        os.path.join(stream_dir, "00.parquet"),
    )
    pq.write_table(
        t.filter(pc.fill_null(pc.invert(in_b0), False)),
        os.path.join(stream_dir, "01.parquet"),
    )
    old_parts = _set_stream_partitions(spark)
    try:
        stream = (
            spark.readStream.format("parquet")
            .schema("doc_id long, text string, lang string")
            .option("maxFilesPerTrigger", 1)
            .load(stream_dir)
        )
        q = run_index_bm25_stream(
            stream,
            os.path.join(work, "out"),
            os.path.join(work, "index"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            extra_cols=("lang",),
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("stream_bm25 availableNow replay exceeded 300s")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    _STANDING_IDX_CACHE[ckey] = os.path.join(work, "index")
    return _STANDING_IDX_CACHE[ckey]


def _q_stream_bm25_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword top-k SERVED from the standing BM25 postings index
    (streaming/retrieval.py::run_index_bm25_stream + probe_bm25_index):
    the documents table replays as TWO micro-batches into the
    postings/docs/stats layout, then the probe answers the same first-
    N-docs queries as the batch key — BM25's corpus stats all derive
    from the index (df live from the term buckets, dl on the posting
    rows, N/T from the ledger), so the served scores equal the batch
    operator over the union corpus bit-exactly and the oracle is the
    batch _BM25_CTES chain over the NULL-id-filtered corpus (the
    keyed-store contract: a NULL doc_id is never indexed)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        probe_bm25_index,
    )

    index_dir = _bm25_standing_index(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    queries = docs.where(f"doc_id < {_N_QUERIES}").select(
        F.col("doc_id").alias("query_id"), "text"
    )
    return probe_bm25_index(spark, index_dir, queries, k=_TOPK_K)


def _q_text_bm25_topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED BM25 (operators/retrieval.py::bm25_topk(predicate=)):
    top-k among ``lang = 'en'`` documents. The predicate restricts
    CANDIDACY only — a document scores iff any of its rows passes —
    while N/T/df/dl stay global (the deployed IR-engine contract: a
    filter narrows results, never the ranking model; the BM25
    analogue of the vector family's geometry rule)."""
    docs = load_table(spark, sf_dir, "documents")
    queries = docs.where(f"doc_id < {_N_QUERIES}").select(
        F.col("doc_id").alias("query_id"), "text"
    )
    return bm25_topk(docs, queries, k=_TOPK_K, predicate="lang = 'en'")


_BM25_TOPK_FILTERED_ORACLE = f"""
WITH {_BM25_CTES_TMPL.format(
    self_pred=(
        "WHERE btf.doc_id IN "
        "(SELECT doc_id FROM documents WHERE lang = 'en')"
    ),
    src="documents",
)}
SELECT query_id, doc_id, bm25_q, CAST(rank AS INTEGER) AS rank
FROM branked WHERE rank <= {_TOPK_K}
"""


def _q_stream_bm25_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED keyword top-k SERVED from the standing BM25 index:
    the probe's predicate evaluates against the ``lang`` metadata the
    runner denormalized onto every posting row (extra_cols),
    restricting candidacy before the scoring join while df/N/T stay
    global — the batch ``predicate=`` contract on the standing
    layout. Merged duplicate ids pin lang to the per-id MIN (the
    runner's deterministic rule), which the oracle's min-pinned
    allowed-id subquery states."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        probe_bm25_index,
    )

    index_dir = _bm25_standing_index(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    queries = docs.where(f"doc_id < {_N_QUERIES}").select(
        F.col("doc_id").alias("query_id"), "text"
    )
    return probe_bm25_index(
        spark, index_dir, queries, k=_TOPK_K, predicate="lang = 'en'"
    )


_STREAM_BM25_FILTERED_ORACLE = f"""
WITH {_BM25_CTES_TMPL.format(
    self_pred=(
        "WHERE btf.doc_id IN (SELECT doc_id FROM "
        "(SELECT doc_id, min(lang) AS l FROM documents "
        "WHERE doc_id IS NOT NULL GROUP BY doc_id) WHERE l = 'en')"
    ),
    src="(SELECT * FROM documents WHERE doc_id IS NOT NULL) documents",
)}
SELECT query_id, doc_id, bm25_q, CAST(rank AS INTEGER) AS rank
FROM branked WHERE rank <= {_TOPK_K}
"""


def _q_stream_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search SERVED entirely from standing indexes — the
    retrieval tier as it actually deploys: the lexical leg probes the
    standing BM25 postings index (probe_bm25_index, self-excluded),
    the dense leg probes the standing cell-partitioned vector index
    (probe_embedding_index at nprobe = the full cell count — exact),
    and operators/retrieval.py::rrf_fuse fuses the two ranked lists.
    Both standing builds replay two micro-batches and are shared with
    their single-leg keys (_STANDING_IDX_CACHE). Oracle = the batch
    hybrid spelling with the keyed-store contract on both legs (NULL
    doc/vec ids never index)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        probe_bm25_index,
        probe_embedding_index,
    )

    bm25_dir = _bm25_standing_index(spark, sf_dir)
    emb_dir, cents_dir, n_cells = _emb_standing_index(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    queries = docs.where(f"doc_id < {_N_QUERIES}").select(
        F.col("doc_id").alias("query_id"), "text"
    )
    lex = probe_bm25_index(
        spark, bm25_dir, queries, k=_TOPK_K, exclude_self=True
    )
    dense = probe_embedding_index(
        spark,
        emb_dir,
        cents_dir,
        emb.filter(F.col("vec_id") < _N_QUERIES),
        k=_TOPK_K,
        nprobe=n_cells,
    )
    return rrf_fuse(lex, dense, k=_TOPK_K)


_STREAM_BM25_ORACLE = f"""
WITH {_BM25_CTES_TMPL.format(
    self_pred="",
    src="(SELECT * FROM documents WHERE doc_id IS NOT NULL) documents",
)}
SELECT query_id, doc_id, bm25_q, CAST(rank AS INTEGER) AS rank
FROM branked WHERE rank <= {_TOPK_K}
"""


# ------------------------------------------------------------ SRP ANN top-k

_ANN_TABLES, _ANN_DIMS, _ANN_K = 2, 64, 5
_ANN_BUCKET_CAP = 512  # generous at sf0.01/sf0.1 — the cap exists to
# bound adversarially skewed buckets; the oracle mirrors it exactly.
#: the driver contract runs oracle_sql() against sf0.01 — the plane
#: policy for the SQL side is evaluated at this scale.
_ORACLE_SF_DIR = "/root/testdata/sf0.01"


def _emb_count(sf_dir: str) -> int:
    """Embeddings row count from the parquet footer (no Spark job)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(
        os.path.join(sf_dir, "embeddings.parquet")
    ).metadata.num_rows


def _ann_planes_for(sf_dir: str) -> int:
    """Corpus-scaled SRP plane count (auto_planes policy) for the
    embeddings table at ``sf_dir`` — queries() and oracle_sql() both
    derive planes from the corpus they actually run on, so the two
    sides always agree at the driver's sf0.01 while bench at larger
    scales automatically gets more buckets."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.similarity import (
        auto_planes,
    )

    return auto_planes(_emb_count(sf_dir))


def _q_ann_srp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        ann_srp_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return ann_srp_topk(
        emb,
        queries,
        k=_ANN_K,
        n_planes=None,
        n_tables=_ANN_TABLES,
        multi_probe=1,
        bucket_cap=_ANN_BUCKET_CAP,
        corpus_count=_emb_count(sf_dir),
    )


def _srp_bucket_sql(table: int, n_planes: int, dims: int = _ANN_DIMS) -> str:
    """DuckDB bucket expression for one SRP table (same md5-derived
    integer weights as operators/similarity.py::srp_signatures)."""
    terms = []
    for p in range(n_planes):
        seed = table * n_planes + p
        weights = ", ".join(
            "(" + _H64.format(x=f"'{seed}:{d}'") + " % 2001) - 1000"
            for d in range(dims)
        )
        terms.append(
            f"(CASE WHEN list_sum([z[1] * z[2] for z in"
            f" list_zip(qv, [{weights}]::BIGINT[])]) >= 0"
            f" THEN 1::BIGINT << {p} ELSE 0 END)"
        )
    return " + ".join(terms)


def _sigs_sql(n_planes: int, capped: bool) -> str:
    """Shared CTE body: per-(vector, table) buckets, optionally with the
    deterministic per-bucket cap (row_number by vec_id <= cap) the Spark
    operator applies."""
    # zero vectors are excluded from bucketing exactly as
    # srp_signatures does (they would all share the all-ones bucket
    # and consume deterministic bucket_cap slots Spark never fills)
    buckets = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, {_srp_bucket_sql(t, n_planes)} AS bucket"
        f" FROM q WHERE len(list_filter(qv, x -> x != 0)) > 0"
        for t in range(_ANN_TABLES)
    )
    if not capped:
        return f"sigs AS (\n  {buckets}\n)"
    return f"""rawsigs AS (
  {buckets}
), sigs AS (
  SELECT vec_id, tbl, bucket FROM (
    SELECT vec_id, tbl, bucket,
           row_number() OVER (PARTITION BY tbl, bucket ORDER BY vec_id) AS __bn
    FROM rawsigs)
  WHERE __bn <= {_ANN_BUCKET_CAP}
)"""


def _ann_oracle(
    query_pred: str = f"vec_id < {_N_QUERIES}",
    max_cos: float | None = None,
) -> str:
    """SRP-ANN oracle; ``query_pred`` selects the query rows — the
    interactive fixture uses a handful of ids, the batched fixture
    (``ann_topk_batched``) a corpus-sized slice. The SQL is IDENTICAL
    otherwise: the batched operator changes the physical plan (no
    broadcast), never the semantics. ``max_cos`` adds the
    hard-negative exclusion (cosine < threshold BEFORE ranking)."""
    n_planes = _ann_planes_for(_ORACLE_SF_DIR)
    cos_filter = f"WHERE cosine < {max_cos}" if max_cos is not None else ""
    return f"""
WITH q AS (
  SELECT vec_id,
         [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
          for x in embedding] AS qv
  FROM embeddings
), {_sigs_sql(n_planes, capped=True)}
, qprobe AS (
  -- query side: UNCAPPED signatures (the cap is corpus-side only in
  -- the operator) expanded to Hamming-distance-<=1 probe buckets
  SELECT vec_id, tbl, bucket FROM rawsigs s WHERE s.{query_pred}
  UNION ALL
  SELECT s.vec_id, s.tbl, xor(s.bucket, 1::BIGINT << pp.p) AS bucket
  FROM rawsigs s CROSS JOIN (SELECT unnest(range({n_planes})) AS p) pp
  WHERE s.{query_pred}
), cand AS (
  SELECT DISTINCT a.vec_id AS c_id, b.vec_id AS query_id
  FROM sigs a JOIN qprobe b ON a.tbl = b.tbl AND a.bucket = b.bucket
  WHERE a.vec_id != b.vec_id
), scored AS (
  SELECT c.query_id, c.c_id,
         {_COS_SQL.format(a="ca.qv", b="qa.qv")} AS cosine
  FROM cand c
  JOIN q ca ON ca.vec_id = c.c_id
  JOIN q qa ON qa.vec_id = c.query_id
), ranked AS (
  SELECT query_id, c_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, c_id) AS rank
  FROM scored
  {cos_filter}
)
SELECT query_id, c_id AS vec_id, cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {_ANN_K}
"""


_BATCH_QUERY_PRED = "vec_id % 5 = 0"  # 20% of the corpus as queries —
# the batched regime: the query side is itself corpus-sized, so
# nothing may be broadcast (ann_topk_batched's contract)


def _q_ann_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched-query SRP ANN (operators/similarity.py::
    ann_topk_batched): both sides SRP-bucketed and shuffle-joined on
    (table, bucket) — no broadcast of either side. Same semantics as
    sim_ann_srp_topk (shared oracle generator), different physical
    plan; the plan test pins the no-broadcast shape."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        ann_topk_batched,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.expr(_BATCH_QUERY_PRED))
    return ann_topk_batched(
        emb,
        queries,
        k=_ANN_K,
        n_planes=None,
        n_tables=_ANN_TABLES,
        multi_probe=1,
        bucket_cap=_ANN_BUCKET_CAP,
        corpus_count=_emb_count(sf_dir),
    )


# ------------------------------------------------------------- IVF ANN topk

_IVF_CELLS, _IVF_NPROBE = 32, 2


def _ivf_cells_for(sf_dir: str) -> int:
    """Corpus-scaled IVF cell count (auto_cells ~ sqrt N policy) with a
    floor keeping the driver-gate corpus (500 vectors) at the original
    32 cells. Fixed cells make per-query candidates grow linearly
    (measured exponent 1.55 at 10x); cells ~ sqrt(N) is optimal for
    IVF-flat, whose centroid assignment is a LINEAR scan — total cost
    N^1.5 for corpus-sized query batches, the structural reason the
    SRP batched path (O(planes) assignment, measured ~1.0) is the
    linear alternative at that shape."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.similarity import (
        auto_cells,
    )

    return max(_IVF_CELLS, auto_cells(_emb_count(sf_dir)))
# (_COS_SQL — the shared quantized-cosine template — is defined with
# the top-k constants above, before its first use.)


def _q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF(-flat) ANN: seeded Voronoi cells, nprobe-cell probe, exact
    re-rank of cell members — the second scale path next to SRP-LSH."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        ivf_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return ivf_topk(
        emb,
        queries,
        k=_ANN_K,
        n_cells=_IVF_CELLS,
        nprobe=_IVF_NPROBE,
        corpus_count=_emb_count(sf_dir),
    )


def _q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (operators/similarity.py::hard_negatives):
    for every vector, the k most similar vectors below the near-dup
    threshold — the batched-ANN plan (no broadcast anywhere) with the
    threshold filter before ranking, so near-duplicates never occupy
    negative slots. Shares the ANN oracle generator (query side = the
    whole corpus, max_cos = the near-dup threshold)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import hard_negatives

    emb = load_table(spark, sf_dir, "embeddings")
    return hard_negatives(
        emb,
        k=_ANN_K,
        dup_threshold=_NEAR_DUP_THRESHOLD,
        n_planes=None,
        n_tables=_ANN_TABLES,
        multi_probe=1,
        bucket_cap=_ANN_BUCKET_CAP,
        corpus_count=_emb_count(sf_dir),
    )


def _q_ivf_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched-query IVF ANN (operators/similarity.py::
    ivf_topk_batched): both sides assigned to cells and shuffle-joined
    on `cell` — no broadcast of either side (only the O(sqrt N)
    centroid table broadcasts inside assignment). Same semantics as
    sim_ivf_topk (shared oracle generator, batched query predicate);
    different physical plan, pinned no-broadcast in tests/test_plans."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        ivf_topk_batched,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.expr(_BATCH_QUERY_PRED))
    return ivf_topk_batched(
        emb,
        queries,
        k=_ANN_K,
        n_cells=_ivf_cells_for(sf_dir),
        nprobe=_IVF_NPROBE,
        corpus_count=_emb_count(sf_dir),
    )


def _scaled_cells_sql() -> str:
    """auto_cells in SQL: 2^round_even(log2(sqrt(max(4, N)))) clamped,
    floored at the original 32 — count-derived, so any oracle using it
    is scale-invariant."""
    auto = (
        "CAST(power(2, round_even(log2(sqrt(greatest(4.0,"
        " CAST(count(*) AS DOUBLE)))), 0)) AS BIGINT)"
    )
    return f"greatest({_IVF_CELLS}, least(65536, {auto}))"


def _ivf_oracle(query_pred: str | None = None, scaled_cells: bool = False) -> str:
    # SCALE-INVARIANT params: n_cells / step derive from count(*) in
    # SQL exactly as the query side derives them from the parquet
    # footer count (auto_cells = 2^round_even(log2(sqrt(max(4, N))))
    # clamped to [4, 65536] then floored at the original 32 —
    # round_even matches Python round()'s banker's rounding; the only
    # residual parity risk is a corpus of EXACTLY 2^odd rows, where
    # log2(sqrt(N)) lands on a .5 tie whose libm rounding could differ
    # by 1 ulp across engines). This keeps the oracle valid at any
    # sf_dir — including the salted dirty corpus — instead of baking
    # the sf0.01 constants at import.
    n_cells_sql = (
        _scaled_cells_sql() if scaled_cells else f"CAST({_IVF_CELLS} AS BIGINT)"
    )
    cos_vc = _COS_SQL.format(a="v.qv", b="c.cq")
    if query_pred is None:
        query_pred = f"vec_id < {_N_QUERIES}"
    # zero-norm / NULL vectors excluded from assignment AND centroid
    # roles (cosine undefined; mirrors _ivf_assign's guard)
    return f"""
WITH qraw AS (
  SELECT vec_id,
         [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
          for x in embedding] AS qv
  FROM embeddings
), params AS (
  SELECT n_cells, greatest(1, n // n_cells) AS step
  FROM (SELECT {n_cells_sql} AS n_cells, count(*) AS n FROM embeddings)
), q AS (
  SELECT vec_id, qv FROM qraw
  WHERE CAST(list_sum([z[1] * z[2] for z in list_zip(qv, qv)])
             AS BIGINT) > 0
), cent AS (
  SELECT CAST(q.vec_id // p.step AS INTEGER) AS cell, q.qv AS cq
  FROM q, params p
  WHERE q.vec_id % p.step = 0 AND q.vec_id < p.step * p.n_cells
), allassign AS (
  SELECT v.vec_id, c.cell,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY {cos_vc} DESC, c.cell) AS rn
  FROM q v CROSS JOIN cent c
), assign AS (
  SELECT vec_id AS c_id, cell FROM allassign WHERE rn = 1
), qassign AS (
  SELECT vec_id AS query_id, cell FROM allassign
  WHERE rn <= {_IVF_NPROBE} AND {query_pred}
), cand AS (
  SELECT DISTINCT a.c_id, b.query_id
  FROM assign a JOIN qassign b ON a.cell = b.cell
  WHERE a.c_id != b.query_id
), scored AS (
  SELECT c.query_id, c.c_id,
         {_COS_SQL.format(a="ca.qv", b="qa.qv")} AS cosine
  FROM cand c
  JOIN q ca ON ca.vec_id = c.c_id
  JOIN q qa ON qa.vec_id = c.query_id
), ranked AS (
  SELECT query_id, c_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, c_id) AS rank
  FROM scored
)
SELECT query_id, c_id AS vec_id, cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {_ANN_K}
"""


def _q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k (operators/similarity.py::
    pq_topk): seeded per-subspace codebooks, integer squared-L2 codes,
    asymmetric-distance ranking — the compressed-index member of the
    ANN family next to brute-force / SRP-LSH / IVF. All-integer
    arithmetic, so the oracle is bit-exact; the codebook step derives
    from count(*) (scale-invariant, like the IVF oracle)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return pq_topk(
        emb, queries, k=_ANN_K, m=_PQ_M, n_codes=_PQ_CODES,
        corpus_count=_emb_count(sf_dir),
    )


_PQ_M, _PQ_CODES = 4, 16
_PQ_W = _ANN_DIMS // _PQ_M

_PQ_L2 = (
    "CAST(list_sum([(z[1]-z[2])*(z[1]-z[2])"
    " for z in list_zip({a}, {b})]) AS BIGINT)"
)

def _pq_oracle(rerank: int | None = None) -> str:
    """PQ ADC oracle; with ``rerank`` the ADC top-``rerank`` shortlist
    is exact-cosine re-ranked (zero-norm candidates drop — cosine
    undefined), mirroring pq_topk(rerank=...)'s production shape."""
    body = _PQ_ORACLE_BODY
    if rerank is None:
        return body.format(final=f"""
SELECT query_id, c_id AS vec_id, adc_dist, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT query_id, c_id, adc_dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_dist, c_id) AS rank
  FROM pqadc
)
WHERE rank <= {_ANN_K}
""")
    return body.format(final=f"""
, pqshort AS (
  SELECT query_id, c_id FROM (
    SELECT query_id, c_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc_dist, c_id) AS rank
    FROM pqadc
  ) WHERE rank <= {rerank}
), pqnorm AS (
  SELECT vec_id, qv FROM pqv
  WHERE CAST(list_sum([z[1] * z[2] for z in list_zip(qv, qv)])
             AS BIGINT) > 0
), pqscored AS (
  SELECT s.query_id, s.c_id,
         {_COS_SQL.format(a="cv.qv", b="qq.qv")} AS cosine
  FROM pqshort s
  JOIN pqnorm cv ON cv.vec_id = s.c_id
  JOIN pqnorm qq ON qq.vec_id = s.query_id
)
SELECT query_id, c_id AS vec_id, cosine, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT query_id, c_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, c_id) AS rank
  FROM pqscored
)
WHERE rank <= {_ANN_K}
""")


_PQ_ORACLE_BODY = f"""
WITH pqv AS MATERIALIZED (
  SELECT vec_id,
         [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
          for x in embedding] AS qv
  FROM embeddings WHERE embedding IS NOT NULL
), pqparams AS (
  SELECT greatest(1, (SELECT count(*) FROM embeddings) // {_PQ_CODES})
           AS step
), pqsub AS MATERIALIZED (
  SELECT vec_id, t.s, qv[t.s*{_PQ_W}+1 : (t.s+1)*{_PQ_W}] AS sv
  FROM pqv, unnest(range(0, {_PQ_M})) AS t(s)
), pqcb AS MATERIALIZED (
  SELECT CAST(v.vec_id // p.step AS INTEGER) AS code, t.s,
         v.qv[t.s*{_PQ_W}+1 : (t.s+1)*{_PQ_W}] AS cb
  FROM pqv v, pqparams p, unnest(range(0, {_PQ_M})) AS t(s)
  WHERE v.vec_id % p.step = 0 AND v.vec_id < p.step * {_PQ_CODES}
), pqenc AS (
  SELECT vec_id, s, code FROM (
    SELECT x.vec_id, x.s, c.code,
           row_number() OVER (
             PARTITION BY x.vec_id, x.s
             ORDER BY {_PQ_L2.format(a="x.sv", b="c.cb")}, c.code
           ) AS rn
    FROM pqsub x JOIN pqcb c ON x.s = c.s
  ) WHERE rn = 1
), pqlut AS (
  SELECT x.vec_id AS query_id, x.s, c.code,
         {_PQ_L2.format(a="x.sv", b="c.cb")} AS d
  FROM pqsub x JOIN pqcb c ON x.s = c.s
  WHERE x.vec_id < {_N_QUERIES}
), pqadc AS (
  SELECT l.query_id, e.vec_id AS c_id, CAST(sum(l.d) AS BIGINT) AS adc_dist
  FROM pqenc e JOIN pqlut l ON e.s = l.s AND e.code = l.code
  WHERE e.vec_id != l.query_id
  GROUP BY l.query_id, e.vec_id
){{final}}
"""

_PQ_ORACLE = _pq_oracle()
_PQ_RERANK = 50


def _q_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-shape PQ: ADC shortlists _PQ_RERANK candidates,
    exact quantized cosine re-ranks them (operators/similarity.py::
    pq_topk(rerank=...)). Pure ADC is tie-limited — identically coded
    vectors share a distance — so the re-rank is what real PQ
    deployments run; measured recall@5 on clustered fixtures: 0.16
    ADC-only vs 1.0 re-ranked (tests/test_pq.py pins the floors)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return pq_topk(
        emb, queries, k=_ANN_K, m=_PQ_M, n_codes=_PQ_CODES,
        corpus_count=_emb_count(sf_dir), rerank=_PQ_RERANK,
    )


def _q_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ for corpus-sized query batches (operators/similarity.py
    ::ivf_pq_topk_batched): IVF cells bound the candidate set (both
    sides shuffle-joined on cell — the batched no-broadcast shape), PQ
    ADC distances replace the exact re-rank. The composed oracle runs
    both machineries end to end; integer arithmetic keeps it
    hash-exact and the count-derived cells/step keep it
    scale-invariant."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        ivf_pq_topk_batched,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.expr(_BATCH_QUERY_PRED))
    return ivf_pq_topk_batched(
        emb, queries, k=_ANN_K, m=_PQ_M, n_codes=_PQ_CODES,
        n_cells=_ivf_cells_for(sf_dir), nprobe=_IVF_NPROBE,
        corpus_count=_emb_count(sf_dir),
    )


_IVF_PQ_RERANK = 50


def _q_ivf_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The billion-scale PRODUCTION composition: IVF-PQ ADC shortlists
    _IVF_PQ_RERANK candidates per query inside the probed cells, exact
    quantized cosine re-ranks the shortlist (operators/similarity.py::
    ivf_pq_topk_batched(rerank=...)). Pure ADC is tie-limited —
    identically coded vectors share a distance — so without this stage
    the one operator a 100 TB deployment would actually run ships
    recall@5 ~0.16 on clustered data (vs >=0.95 re-ranked;
    tests/test_pq.py pins both floors)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        ivf_pq_topk_batched,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.expr(_BATCH_QUERY_PRED))
    return ivf_pq_topk_batched(
        emb, queries, k=_ANN_K, m=_PQ_M, n_codes=_PQ_CODES,
        n_cells=_ivf_cells_for(sf_dir), nprobe=_IVF_NPROBE,
        corpus_count=_emb_count(sf_dir), rerank=_IVF_PQ_RERANK,
    )


def _ivf_pq_oracle(rerank: int | None = None) -> str:
    cos_vc = _COS_SQL.format(a="v.qv", b="c.cq")
    body = f"""
WITH ipraw AS MATERIALIZED (
  SELECT vec_id,
         [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
          for x in embedding] AS qv
  FROM embeddings WHERE embedding IS NOT NULL
), ipparams AS (
  SELECT n_cells, greatest(1, n // n_cells) AS step
  FROM (SELECT {_scaled_cells_sql()} AS n_cells, count(*) AS n
        FROM embeddings)
), ippqp AS (
  SELECT greatest(1, (SELECT count(*) FROM embeddings) // {_PQ_CODES})
           AS step
), ipq AS MATERIALIZED (
  SELECT vec_id, qv FROM ipraw
  WHERE CAST(list_sum([z[1] * z[2] for z in list_zip(qv, qv)])
             AS BIGINT) > 0
), ipcent AS (
  SELECT CAST(q.vec_id // p.step AS INTEGER) AS cell, q.qv AS cq
  FROM ipq q, ipparams p
  WHERE q.vec_id % p.step = 0 AND q.vec_id < p.step * p.n_cells
), ipall AS (
  SELECT v.vec_id, c.cell,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY {cos_vc} DESC, c.cell) AS rn
  FROM ipq v CROSS JOIN ipcent c
), ipassign AS (
  SELECT vec_id AS c_id, cell FROM ipall WHERE rn = 1
), ipqassign AS (
  SELECT vec_id AS query_id, cell FROM ipall
  WHERE rn <= {_IVF_NPROBE} AND {_BATCH_QUERY_PRED}
), ipcand AS (
  SELECT DISTINCT a.c_id, b.query_id
  FROM ipassign a JOIN ipqassign b ON a.cell = b.cell
  WHERE a.c_id != b.query_id
), ipsub AS MATERIALIZED (
  SELECT vec_id, t.s, qv[t.s*{_PQ_W}+1 : (t.s+1)*{_PQ_W}] AS sv
  FROM ipraw, unnest(range(0, {_PQ_M})) AS t(s)
), ipcb AS MATERIALIZED (
  SELECT CAST(v.vec_id // p.step AS INTEGER) AS code, t.s,
         v.qv[t.s*{_PQ_W}+1 : (t.s+1)*{_PQ_W}] AS cb
  FROM ipraw v, ippqp p, unnest(range(0, {_PQ_M})) AS t(s)
  WHERE v.vec_id % p.step = 0 AND v.vec_id < p.step * {_PQ_CODES}
), ipenc AS (
  SELECT vec_id, s, code FROM (
    SELECT x.vec_id, x.s, c.code,
           row_number() OVER (
             PARTITION BY x.vec_id, x.s
             ORDER BY {_PQ_L2.format(a="x.sv", b="c.cb")}, c.code
           ) AS rn
    FROM ipsub x JOIN ipcb c ON x.s = c.s
  ) WHERE rn = 1
), iplut AS (
  SELECT x.vec_id AS query_id, x.s, c.code,
         {_PQ_L2.format(a="x.sv", b="c.cb")} AS d
  FROM ipsub x JOIN ipcb c ON x.s = c.s
  WHERE {_BATCH_QUERY_PRED.replace("vec_id", "x.vec_id")}
), ipadc AS (
  SELECT n.query_id, n.c_id, CAST(sum(l.d) AS BIGINT) AS adc_dist
  FROM ipcand n
  JOIN ipenc e ON e.vec_id = n.c_id
  JOIN iplut l ON l.query_id = n.query_id
                AND l.s = e.s AND l.code = e.code
  GROUP BY n.query_id, n.c_id
){{final}}
"""
    if rerank is None:
        return body.format(final=f"""
SELECT query_id, c_id AS vec_id, adc_dist, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT query_id, c_id, adc_dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_dist, c_id) AS rank
  FROM ipadc
)
WHERE rank <= {_ANN_K}
""")
    # ADC shortlist -> exact quantized-cosine re-rank, mirroring
    # ivf_pq_topk_batched(rerank=...). ipq is already the zero-norm-
    # filtered vector table, so the re-rank joins drop nothing extra.
    return body.format(final=f"""
, ipshort AS (
  SELECT query_id, c_id FROM (
    SELECT query_id, c_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc_dist, c_id) AS rank
    FROM ipadc
  ) WHERE rank <= {rerank}
), ipscored AS (
  SELECT s.query_id, s.c_id,
         {_COS_SQL.format(a="cv.qv", b="qq.qv")} AS cosine
  FROM ipshort s
  JOIN ipq cv ON cv.vec_id = s.c_id
  JOIN ipq qq ON qq.vec_id = s.query_id
)
SELECT query_id, c_id AS vec_id, cosine, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT query_id, c_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, c_id) AS rank
  FROM ipscored
)
WHERE rank <= {_ANN_K}
""")


# -------------------------------------------------- embedding near-dup pairs

_NEAR_DUP_THRESHOLD = 0.3  # testdata embeddings are centered: max
# pairwise cosine ~0.40, so 0.3 exercises both match and reject paths


def _q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        embedding_near_dup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(
        emb,
        threshold=_NEAR_DUP_THRESHOLD,
        n_planes=None,
        n_tables=_ANN_TABLES,
        bucket_cap=_ANN_BUCKET_CAP,
        corpus_count=_emb_count(sf_dir),
        min_parallelism=spark.sparkContext.defaultParallelism,
    )


def _near_dup_oracle() -> str:
    n_planes = _ann_planes_for(_ORACLE_SF_DIR)
    return f"""
WITH q AS (
  SELECT vec_id,
         [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
          for x in embedding] AS qv
  FROM embeddings
), {_sigs_sql(n_planes, capped=True)}
, cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sigs a JOIN sigs b ON a.tbl = b.tbl AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
), scored AS (
  SELECT c.id_a, c.id_b,
         {_COS_SQL.format(a="va.qv", b="vb.qv")} AS cosine
  FROM cand c
  JOIN q va ON va.vec_id = c.id_a
  JOIN q vb ON vb.vec_id = c.id_b
)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= {_NEAR_DUP_THRESHOLD}
"""


# ------------------------------------------------------------ semantic dedup

_SEMDEDUP_THRESHOLD = 0.3  # same centered-testdata rationale as
# _NEAR_DUP_THRESHOLD: exercises both the match and reject paths


def _q_dedup_semantic_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup candidate pairs (operators/similarity.py::
    semantic_dedup_pairs, arXiv:2303.09540): cell-partition the
    embeddings (seeded deterministic centroids, cells ~ sqrt(N)),
    exactly score ONLY within-cell pairs, keep cosine >= threshold."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        semantic_dedup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup_pairs(
        emb,
        threshold=_SEMDEDUP_THRESHOLD,
        n_cells=_ivf_cells_for(sf_dir),
        corpus_count=_emb_count(sf_dir),
    )


def _q_dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keep/drop labels: connected components over the
    semantic pair edges, min-id canonical per semantic cluster (the
    engine-wide dedup contract; the paper's farthest-from-centroid
    keep rule is a documented one-line deviation)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        semantic_dedup,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb,
        threshold=_SEMDEDUP_THRESHOLD,
        n_cells=_ivf_cells_for(sf_dir),
        corpus_count=_emb_count(sf_dir),
    )


def _semantic_oracle(clusters: bool) -> str:
    """Scale-invariant SemDeDup oracle: the seeded-centroid/assignment
    CTEs of _ivf_oracle (params from count(*)), a within-cell
    self-join, the _COS_SQL exact verify — and for the clusters twin
    the recursive min-reachable-id component labelling of
    _CLUSTERS_ORACLE over the kept pairs."""
    cos_vc = _COS_SQL.format(a="v.qv", b="c.cq")
    prefix = f"""
WITH RECURSIVE qraw AS (
  SELECT vec_id,
         [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
          for x in embedding] AS qv
  FROM embeddings
), params AS (
  SELECT n_cells, greatest(1, n // n_cells) AS step
  FROM (SELECT {_scaled_cells_sql()} AS n_cells, count(*) AS n
        FROM embeddings)
), q AS (
  SELECT vec_id, qv FROM qraw
  WHERE CAST(list_sum([z[1] * z[2] for z in list_zip(qv, qv)])
             AS BIGINT) > 0
), cent AS (
  SELECT CAST(q.vec_id // p.step AS INTEGER) AS cell, q.qv AS cq
  FROM q, params p
  WHERE q.vec_id % p.step = 0 AND q.vec_id < p.step * p.n_cells
), allassign AS (
  SELECT v.vec_id, c.cell,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY {cos_vc} DESC, c.cell) AS rn
  FROM q v CROSS JOIN cent c
), assign AS (
  SELECT vec_id, cell FROM allassign WHERE rn = 1
), sdkeep AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         {_COS_SQL.format(a="ea.qv", b="eb.qv")} AS cosine
  FROM assign a
  JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
  JOIN q ea ON ea.vec_id = a.vec_id
  JOIN q eb ON eb.vec_id = b.vec_id
  WHERE {_COS_SQL.format(a="ea.qv", b="eb.qv")} >= {_SEMDEDUP_THRESHOLD}
)"""
    if not clusters:
        return prefix + "\nSELECT id_a, id_b, cosine FROM sdkeep"
    return prefix + """, sdedges AS (
  SELECT id_a AS src, id_b AS dst FROM sdkeep
  UNION
  SELECT id_b, id_a FROM sdkeep
), reach(node, r) AS (
  SELECT src, dst FROM sdedges
  UNION
  SELECT reach.node, e.dst FROM reach JOIN sdedges e ON reach.r = e.src
), comp AS (
  SELECT node, LEAST(node, MIN(r)) AS cluster_id FROM reach GROUP BY node
), assigned AS (
  SELECT emb.vec_id, COALESCE(c.cluster_id, emb.vec_id) AS cluster_id
  FROM embeddings emb LEFT JOIN comp c ON emb.vec_id = c.node
), sizes AS (
  SELECT cluster_id, COUNT(*) AS cluster_size, MIN(vec_id) AS canon
  FROM assigned GROUP BY cluster_id
)
SELECT a.vec_id, a.cluster_id, s.cluster_size,
       CASE WHEN a.vec_id = s.canon THEN 1 ELSE 0 END AS is_canonical
FROM assigned a JOIN sizes s ON a.cluster_id = s.cluster_id
"""


# ------------------------------------- in-engine text embeddings (hashing)

_EMBED_DIMS = 64  # matches the fixture embeddings table's width
_SEMTEXT_THRESHOLD = 0.9  # hashed BoW cosines over the shared-vocab
# fixture corpus run high (shared tokens everywhere); 0.9 keeps 119 of
# ~7.4k within-cell candidates at sf0.01 — both paths exercised


def _q_text_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed text embedding (operators/embedding.py::
    embed_text_hashed, Weinberger et al. 2009): signed bag-of-tokens
    folded into a 64-dim integer vector scan-side, exploded to one
    (doc, dim) row per NONZERO coordinate with the exact L2 norm² and
    the micro-unit normalized coordinate — zero shuffles, zero UDFs."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        embed_text_hashed,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = embed_text_hashed(docs, dims=_EMBED_DIMS)
    return (
        out.select(
            "doc_id", F.posexplode("hvec").alias("dim", "v"), "norm2", "q_micro"
        )
        .where(F.col("v") != 0)
        .select(
            "doc_id",
            "dim",
            "v",
            "norm2",
            F.expr("q_micro[dim]").alias("q_micro"),
        )
    )


def _hash_embed_cte(
    dims: int = _EMBED_DIMS, src: str = "documents", text_col: str = "text"
) -> str:
    """DuckDB CTE prefix deriving the signed feature-hash vector from
    ``src.text_col`` — THE single SQL spelling of embed_text_hashed's
    semantics (tokens → md5 60-bit hash → disjoint index/sign bits →
    signed per-dim sums → exact int64 norm²); every embedding oracle
    (similarity gates, the quality-classifier gates) composes it so
    the gates can never drift."""
    return f"""heb_toks AS (
  SELECT doc_id,
         lower(unnest(list_filter(regexp_split_to_array(trim({text_col}), '\\s+'),
                                  t -> t != ''))) AS tok
  FROM {src}
), heb_hashed AS (
  SELECT doc_id, CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT) AS h
  FROM heb_toks
), heb_raw AS (
  SELECT doc_id, CAST(h % {dims} AS INTEGER) AS dim,
         CAST(sum(CASE WHEN (h // {dims}) % 2 = 0 THEN 1 ELSE -1 END)
              AS BIGINT) AS v
  FROM heb_hashed GROUP BY doc_id, dim
), heb_nrm AS (
  SELECT doc_id, CAST(sum(v * v) AS BIGINT) AS norm2
  FROM heb_raw GROUP BY doc_id
)"""


_HASH_EMBED_ORACLE = f"""
WITH {_hash_embed_cte()}
SELECT r.doc_id, r.dim, r.v, n.norm2,
       CAST(round(CAST(r.v AS DOUBLE) * 1000000.0
                  / sqrt(CAST(n.norm2 AS DOUBLE))) AS BIGINT) AS q_micro
-- NULL-safe join: a NULL-doc_id document still embeds scan-side in
-- Spark (no join in that plan); the oracle's raw->norm join must not
-- drop it. (With >1 NULL-id doc the GROUP BY merges them — the same
-- NULL-key convention as the dedup-family oracles.)
FROM heb_raw r JOIN heb_nrm n ON r.doc_id IS NOT DISTINCT FROM n.doc_id
WHERE r.v != 0
"""


def _semtext_cells(n: int) -> int:
    """Cell policy for the derived-text CELL-PARTITIONED paths (the
    STANDING vector index fed by s_stream_semantic_text — per-batch
    O(batch + touched cells), measured exponent 0.97 — and the
    demoted batch IVF opt-in): auto_cells (cells ~ sqrt(N)). For the
    one-shot batch plan this is the IVF-flat balanced optimum whose
    total is ~N^1.5 (assignment N·cells vs within-cell verify
    N²/cells) — which is exactly why the GATED batch key
    dedup_semantic_text now takes the SRP linear plan instead (r12);
    the standing index amortizes the same layout per micro-batch and
    stays linear."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.similarity import (
        auto_cells,
    )

    return auto_cells(n)


def _q_dedup_semantic_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end in-engine semantic DEDUP pipeline, on the
    LINEAR-scale plan (r12: the r11 verdict's "what's wrong #1" fix):
    documents → embed_text_hashed (derived vectors, no fixture) → SRP
    near-dup pairs (O(N·planes) sign-random-projection bucketing +
    exact-cosine verify — measured 10x exponent 0.72 vs the IVF-flat
    plan's structural ~N^1.5) → connected components → keep/drop
    cluster labels, the engine-wide dedup contract ``(doc_id,
    cluster_id, cluster_size, is_canonical)``.

    The former IVF-cell plan (embed → semantic_dedup_pairs at
    auto_cells ~ sqrt(N)) is DEMOTED to a recall-shaped opt-in: with
    cells ~ sqrt(N) the assignment scan (N·cells) balances the
    within-cell exact verify (N²/cells) at ~N^1.5 total — measured
    exponent 1.349, over the repo's 1.3 scale bar, ~1000x cost at 100x
    data. (A constant-occupancy cell policy was tried and REVERTED:
    quadratic assignment, 2x slower at sf1.) The opt-in remains the
    operator composition ``embed_text_hashed →
    semantic_dedup_pairs(cell_cap=...)`` for corpora that fit the
    N^1.5 budget and want cell-local (centroid-aware) candidate
    generation; its recall floor stays pinned by
    tests/test_hash_embed.py::test_semantic_text_recall_vs_exact."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        embed_text_hashed,
        embedding_near_dup_pairs,
        near_dup_clusters,
    )

    docs = load_table(spark, sf_dir, "documents")
    # materialization barrier (the embed_text_hashed fan-out contract):
    # the fold expression is an interpreted higher-order function that
    # CollapseProject inlines into EVERY downstream reference — the
    # SRP plane dots and both pair-score joins would re-evaluate it
    # per reference (measured 155 s -> 5 s at sf0.1 on the old plan)
    emb = (
        embed_text_hashed(docs, dims=_EMBED_DIMS)
        .select(F.col("doc_id").alias("vec_id"), "embedding")
        .localCheckpoint(eager=False)
    )
    pairs = embedding_near_dup_pairs(
        emb,
        threshold=_SEMTEXT_THRESHOLD,
        n_planes=None,
        n_tables=_ANN_TABLES,
        bucket_cap=_ANN_BUCKET_CAP,
        corpus_count=_doc_count(sf_dir),
        min_parallelism=spark.sparkContext.defaultParallelism,
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    return near_dup_clusters(docs.select("doc_id"), pairs, id_col="doc_id")


def _hash_qv_prefix() -> str:
    """CTE chain documents → dense quantized derived-embedding vectors
    ``q(vec_id, qv)``: the _hash_embed_cte prefix, a float32 round-trip
    quantization (embed_text_hashed emits array<float>; every
    similarity operator re-quantizes it — round(double(float32(v /
    sqrt(norm2))) * 1e6), one fixed IEEE sequence both engines share),
    zero-quantized-norm vectors excluded (cosine undefined). Shared by
    every derived-text-embedding oracle so the quantization spelling
    can never drift."""
    return f"""{_hash_embed_cte()},
hedims AS (SELECT unnest(range(0, {_EMBED_DIMS})) AS dim),
hedense AS (
  SELECT n.doc_id, d.dim, COALESCE(r.v, 0) AS v, n.norm2
  FROM heb_nrm n CROSS JOIN hedims d
  LEFT JOIN heb_raw r ON r.doc_id = n.doc_id AND r.dim = d.dim
  WHERE n.norm2 > 0
), qraw AS (
  SELECT doc_id AS vec_id,
         list(CAST(round(CAST(CAST(CAST(v AS DOUBLE)
                / sqrt(CAST(norm2 AS DOUBLE)) AS REAL) AS DOUBLE)
                * 1000000.0) AS BIGINT) ORDER BY dim) AS qv
  FROM hedense GROUP BY doc_id
), q AS (
  SELECT vec_id, qv FROM qraw
  WHERE CAST(list_sum([z[1] * z[2] for z in list_zip(qv, qv)])
             AS BIGINT) > 0
)"""


def _semantic_text_ivf_pairs_oracle() -> str:
    """IVF-cell pairs oracle over the DERIVED text vectors — the
    STREAMING standing-index gate (s_stream_semantic_text): the
    _hash_qv_prefix derived vectors, then the seeded-centroid /
    within-cell / exact-verify pattern of _semantic_oracle with
    auto_cells(count(documents)). (The BATCH dedup_semantic_text key
    moved to the SRP linear plan in r12; the cell layout remains the
    standing index's architecture — per-batch cost there is
    O(batch + touched cells), not the one-shot N^1.5.)"""
    cos_vc = _COS_SQL.format(a="v.qv", b="c.cq")
    cos_ab = _COS_SQL.format(a="ea.qv", b="eb.qv")
    auto = (
        "CAST(power(2, round_even(log2(sqrt(greatest(4.0,"
        " CAST(count(*) AS DOUBLE)))), 0)) AS BIGINT)"
    )
    return f"""
WITH {_hash_qv_prefix()}, params AS (
  SELECT n_cells, greatest(1, n // n_cells) AS step
  FROM (SELECT greatest(4, least(65536, {auto})) AS n_cells,
               count(*) AS n
        FROM documents)
), cent AS (
  SELECT CAST(q.vec_id // p.step AS INTEGER) AS cell, q.qv AS cq
  FROM q, params p
  WHERE q.vec_id % p.step = 0 AND q.vec_id < p.step * p.n_cells
), allassign AS (
  SELECT v.vec_id, c.cell,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY {cos_vc} DESC, c.cell) AS rn
  FROM q v CROSS JOIN cent c
), assign AS (
  SELECT vec_id, cell FROM allassign WHERE rn = 1
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {cos_ab} AS cosine
FROM assign a
JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
JOIN q ea ON ea.vec_id = a.vec_id
JOIN q eb ON eb.vec_id = b.vec_id
WHERE {cos_ab} >= {_SEMTEXT_THRESHOLD}
"""


def _semantic_text_oracle() -> str:
    """Composed LINEAR-plan oracle: the _hash_qv_prefix derived
    vectors, the SRP signature + capped-bucket CTEs (_sigs_sql — the
    sim_text_near_dup pair stage verbatim, so the two gates share one
    spelling), the exact-cosine keep, then the recursive
    min-reachable-id component labelling over ALL documents (the
    _semantic_oracle clusters tail: unpaired docs are singleton
    clusters of themselves)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.similarity import (
        auto_planes,
    )

    n_planes = auto_planes(_doc_count(_ORACLE_SF_DIR))
    cos_ab = _COS_SQL.format(a="va.qv", b="vb.qv")
    return f"""
WITH RECURSIVE {_hash_qv_prefix()}, {_sigs_sql(n_planes, capped=True)}
, cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sigs a JOIN sigs b ON a.tbl = b.tbl AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
), sdkeep AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN q va ON va.vec_id = c.id_a
  JOIN q vb ON vb.vec_id = c.id_b
  WHERE {cos_ab} >= {_SEMTEXT_THRESHOLD}
), sdedges AS (
  SELECT id_a AS src, id_b AS dst FROM sdkeep
  UNION
  SELECT id_b, id_a FROM sdkeep
), reach(node, r) AS (
  SELECT src, dst FROM sdedges
  UNION
  SELECT reach.node, e.dst FROM reach JOIN sdedges e ON reach.r = e.src
), comp AS (
  SELECT node, LEAST(node, MIN(r)) AS cluster_id FROM reach GROUP BY node
), assigned AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
), sizes AS (
  SELECT cluster_id, COUNT(*) AS cluster_size, MIN(doc_id) AS canon
  FROM assigned GROUP BY cluster_id
)
SELECT a.doc_id, a.cluster_id, s.cluster_size,
       CAST(CASE WHEN a.doc_id = s.canon THEN 1 ELSE 0 END AS INTEGER)
         AS is_canonical
FROM assigned a JOIN sizes s ON a.cluster_id = s.cluster_id
"""


def _q_sim_text_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k over DERIVED text embeddings: documents →
    embed_text_hashed → cosine_topk — similarity search with no
    fixture vector anywhere in the plan (the ANN composition twin of
    dedup_semantic_text). Query side = the first 10 doc ids, the
    sim_cosine_topk convention."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        cosine_topk,
        embed_text_hashed,
    )

    docs = load_table(spark, sf_dir, "documents")
    # materialization barrier — see _q_dedup_semantic_text (the
    # brute-force scorer references the fold 3x per joined pair;
    # measured 145 s -> 1.2 s at sf0.1)
    emb = (
        embed_text_hashed(docs, dims=_EMBED_DIMS)
        .select(F.col("doc_id").alias("vec_id"), "embedding")
        .localCheckpoint(eager=False)
    )
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return cosine_topk(emb, queries, k=_TOPK_K)


def _q_sim_text_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP near-dup pairs over DERIVED text embeddings
    (embedding_near_dup_pairs): the LINEAR-scale path of the
    text-semantic family — O(N·planes) sign-random-projection
    bucketing instead of the IVF cell scan's N^1.5 (see
    _semtext_cells), same exact-cosine verify, same threshold."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        embed_text_hashed,
        embedding_near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = (
        embed_text_hashed(docs, dims=_EMBED_DIMS)
        .select(F.col("doc_id").alias("vec_id"), "embedding")
        .localCheckpoint(eager=False)  # the embed fan-out barrier
    )
    return embedding_near_dup_pairs(
        emb,
        threshold=_SEMTEXT_THRESHOLD,
        n_planes=None,
        n_tables=_ANN_TABLES,
        bucket_cap=_ANN_BUCKET_CAP,
        corpus_count=_doc_count(sf_dir),
        min_parallelism=spark.sparkContext.defaultParallelism,
    )


def _sim_text_near_dup_oracle() -> str:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.similarity import (
        auto_planes,
    )

    n_planes = auto_planes(_doc_count(_ORACLE_SF_DIR))
    return f"""
WITH {_hash_qv_prefix()}, {_sigs_sql(n_planes, capped=True)}
, cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sigs a JOIN sigs b ON a.tbl = b.tbl AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
), scored AS (
  SELECT c.id_a, c.id_b,
         {_COS_SQL.format(a="va.qv", b="vb.qv")} AS cosine
  FROM cand c
  JOIN q va ON va.vec_id = c.id_a
  JOIN q vb ON vb.vec_id = c.id_b
)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= {_SEMTEXT_THRESHOLD}
"""


def _sim_text_topk_oracle() -> str:
    cos = _COS_SQL.format(a="c.qv", b="qs.qq")
    return f"""
WITH {_hash_qv_prefix()}, qs AS (
  SELECT vec_id AS query_id, qv AS qq FROM q WHERE vec_id < {_N_QUERIES}
), scored AS (
  SELECT qs.query_id, c.vec_id AS c_id, {cos} AS cosine
  FROM q c JOIN qs ON c.vec_id != qs.query_id
), ranked AS (
  SELECT query_id, c_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, c_id) AS rank
  FROM scored
)
SELECT query_id, c_id AS vec_id, cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {_TOPK_K}
"""


#: the filtered-ANN gated key's corpus predicate — a plain metadata
#: equality, the shape a parquet scan can push (plan-pinned in
#: tests/test_filtered_ann.py)
_TOPK_FILTER_PRED = "lang = 'en'"


def _q_sim_text_topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED (metadata-constrained) exact cosine top-k — the r12
    verdict's Missing #2: the most common real vector-search call
    ranks only candidates satisfying a predicate (here ``lang =
    'en'``), never rank-then-discard. The predicate goes through
    ``cosine_topk(predicate=...)`` (operators/similarity.py::
    _apply_predicate — applied to the corpus side BEFORE quantization
    and scoring; on a direct source read it lands in PushedFilters,
    plan-pinned by tests/test_filtered_ann.py). Queries stay
    UNFILTERED (the first 10 doc ids, any language, the sim_text_topk
    convention): a query needn't satisfy the constraint it searches
    under."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        cosine_topk,
        embed_text_hashed,
    )

    docs = load_table(spark, sf_dir, "documents")
    # metadata columns ride through the embed (it APPENDS columns), so
    # the operator-level predicate can see them; the localCheckpoint
    # is the embed fan-out barrier (see _q_sim_text_topk)
    emb = (
        embed_text_hashed(docs, dims=_EMBED_DIMS)
        .select(F.col("doc_id").alias("vec_id"), "embedding", "lang")
        .localCheckpoint(eager=False)
    )
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        "vec_id", "embedding"
    )
    return cosine_topk(emb, queries, k=_TOPK_K, predicate=_TOPK_FILTER_PRED)


def _sim_text_topk_filtered_oracle() -> str:
    cos = _COS_SQL.format(a="c.qv", b="qs.qq")
    return f"""
WITH {_hash_qv_prefix()}, qs AS (
  SELECT vec_id AS query_id, qv AS qq FROM q WHERE vec_id < {_N_QUERIES}
), scored AS (
  SELECT qs.query_id, c.vec_id AS c_id, {cos} AS cosine
  FROM q c
  JOIN documents dd ON dd.doc_id = c.vec_id AND dd.{_TOPK_FILTER_PRED}
  JOIN qs ON c.vec_id != qs.query_id
), ranked AS (
  SELECT query_id, c_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, c_id) AS rank
  FROM scored
)
SELECT query_id, c_id AS vec_id, cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {_TOPK_K}
"""


# ------------------------------------------- S4b windowed sliding agg (1-min)


def _q_sliding_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The built-in groupBy(window(...)) sliding aggregation (S4 option
    b) in batch mode over events: per (key, 1-min-grain 10-min window)
    COUNT + exact-cents AVG. Watermark applies only in streaming; the
    batch plan is the same aggregation."""
    events = load_table(spark, sf_dir, "events")
    prepared = events.select(
        F.col("user_id").alias("cc_num"),
        F.col("ts"),
        F.expr("cast(round(value * 100) as bigint)").alias("amt_cents"),
    )
    return (
        prepared.groupBy(
            F.window(F.col("ts"), "10 minutes", "1 minute"), F.col("cc_num")
        )
        .agg(
            F.count("*").alias("num_trans_last_10m"),
            F.expr(
                "(cast(sum(amt_cents) as double) / 100.0) / count(*)"
            ).alias("avg_amt_last_10m"),
        )
        .select(
            F.col("cc_num"),
            F.col("window.end").alias("ts"),
            "num_trans_last_10m",
            "avg_amt_last_10m",
        )
    )


# Spark's window(ts, 10m, 1m) assigns each event to the 10 slide-aligned
# windows with start <= ts < end; reproduce by exploding 10 offsets.
_SLIDING_WINDOWED_ORACLE = """
WITH src AS (
  -- ts IS NOT NULL: Spark's sliding-window generator emits no window
  -- for a NULL event time (the explode over NULL produces nothing)
  SELECT user_id AS cc_num, ts,
         CAST(round(value * 100) AS BIGINT) AS amt_cents,
         CAST(floor(epoch(ts) / 60) AS BIGINT) AS slide_idx
  FROM events
  WHERE ts IS NOT NULL
), assigned AS (
  -- make_timestamp(us) is TZ-independent; to_timestamp(...)::TIMESTAMP
  -- localizes to the DuckDB session TimeZone and would shift every
  -- window end by the UTC offset on a non-UTC oracle host
  SELECT cc_num, amt_cents,
         make_timestamp((slide_idx + 1 + i) * 60 * 1000000) AS w_end
  FROM src, range(0, 10) AS t(i)
)
SELECT cc_num, w_end AS ts,
       COUNT(*) AS num_trans_last_10m,
       (CAST(SUM(amt_cents) AS DOUBLE) / 100.0) / COUNT(*) AS avg_amt_last_10m
FROM assigned
GROUP BY cc_num, w_end
"""


# --------------------------------------------- near-dup cluster keep-list


def _q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dedup workflow: exact-text collapse -> MinHash over
    distinct texts -> LSH candidates -> exact-Jaccard verify -> sparse
    component-equivalent edges (operators/dedup.py::lsh_near_dup_edges,
    star edges inside identical-text groups) -> connected components ->
    one canonical doc per cluster. The oracle stays the full-pair-table
    recursive CTE: the edge list provably has the same components, so
    the cluster output is identical while duplicate pile-ups stay
    linear instead of quadratic through the candidate join."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        lsh_near_dup_edges,
        near_dup_clusters,
    )

    docs = load_table(spark, sf_dir, "documents")
    edges = lsh_near_dup_edges(
        docs, bands=_BANDS, rows_per_band=_ROWS_PER_BAND,
        threshold=_JACCARD_THRESHOLD,
        min_parallelism=spark.sparkContext.defaultParallelism,
    )
    return near_dup_clusters(docs, edges)


# Component labels via recursive CTE: min reachable id (+ self) per node.
_CLUSTERS_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({_JACCARD_ORACLE})
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
), reach(node, r) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
), comp AS (
  SELECT node, LEAST(node, MIN(r)) AS cluster_id FROM reach GROUP BY node
), assigned AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
), sizes AS (
  SELECT cluster_id, COUNT(*) AS cluster_size FROM assigned GROUP BY cluster_id
)
SELECT a.doc_id, a.cluster_id, s.cluster_size,
       CASE WHEN a.doc_id = a.cluster_id THEN 1 ELSE 0 END AS is_canonical
FROM assigned a JOIN sizes s ON a.cluster_id = s.cluster_id
"""

# ------------------------------------------------- repetition signals


def _q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.functions import with_repetition

    cols = ["doc_id"]
    for n in (2, 3):
        cols += [
            f"n_{n}grams",
            f"top_{n}gram_count",
            f"dup_{n}gram_tokens",
            f"top_{n}gram_frac",
            f"dup_{n}gram_frac",
        ]
    return with_repetition(load_table(spark, sf_dir, "documents")).select(*cols)


def _rep_gram_cte(n: int) -> str:
    gram = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n))
    return f"""
g{n} AS (
  SELECT doc_id, unnest([{gram} for i in range(1, len(toks) - {n - 2})]) AS g
  FROM rep_base
), gc{n} AS (
  SELECT doc_id, g, count(*) AS c FROM g{n} GROUP BY doc_id, g
), a{n} AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS total,
         CAST(max(c) AS BIGINT) AS top,
         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup
  FROM gc{n} GROUP BY doc_id
)"""


def _rep_cols(n: int) -> str:
    return f"""
       COALESCE(a{n}.total, 0) AS n_{n}grams,
       COALESCE(a{n}.top, 0) AS top_{n}gram_count,
       COALESCE(a{n}.dup, 0) AS dup_{n}gram_tokens,
       CASE WHEN COALESCE(a{n}.total, 0) > 0
            THEN CAST(a{n}.top AS DOUBLE) / CAST(a{n}.total AS DOUBLE)
            ELSE 0.0 END AS top_{n}gram_frac,
       CASE WHEN COALESCE(a{n}.total, 0) > 0
            THEN CAST(a{n}.dup AS DOUBLE) / CAST(a{n}.total AS DOUBLE)
            ELSE 0.0 END AS dup_{n}gram_frac"""


_REPETITION_ORACLE = f"""
WITH rep_base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t != '')
           AS toks
  FROM documents
), {_rep_gram_cte(2)}, {_rep_gram_cte(3)}
SELECT d.doc_id, {_rep_cols(2)}, {_rep_cols(3)}
FROM documents d
-- IS NOT DISTINCT FROM: Spark computes the stats per ROW regardless
-- of id, so a NULL-id doc must re-join its own stats here (a plain =
-- drops it and zero-fills). Like every doc_id-keyed oracle, this
-- assumes doc_id is unique apart from at most one NULL.
LEFT JOIN a2 ON d.doc_id IS NOT DISTINCT FROM a2.doc_id
LEFT JOIN a3 ON d.doc_id IS NOT DISTINCT FROM a3.doc_id
"""


# --------------------------------------------------- OLAP star queries

_OLAP_CENTS = "CAST(round({c} * 100) AS BIGINT)"


def _q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import pricing_summary

    return pricing_summary(load_table(spark, sf_dir, "lineitem"))


def _pricing_oracle() -> str:
    ep = _OLAP_CENTS.format(c="l_extendedprice")
    d = _OLAP_CENTS.format(c="l_discount")
    t = _OLAP_CENTS.format(c="l_tax")
    return f"""
WITH agg AS (
  SELECT l_returnflag, l_linestatus,
         sum(CAST(round(l_quantity) AS BIGINT)) AS s_qty,
         sum({ep}) AS s_base,
         sum({ep} * (100 - {d})) AS s_disc,
         sum({ep} * (100 - {d}) * (100 + {t})) AS s_charge,
         sum({d}) AS s_dpct,
         count(*) AS count_order
  FROM lineitem
  WHERE l_shipdate < TIMESTAMP '2001-09-01'
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
       CAST(s_qty AS BIGINT) AS sum_qty,
       CAST(s_base AS DOUBLE) / 100.0 AS sum_base_price,
       CAST(s_disc AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(s_charge AS DOUBLE) / 1000000.0 AS sum_charge,
       CAST(s_qty AS DOUBLE) / CAST(count_order AS DOUBLE) AS avg_qty,
       CAST(s_base AS DOUBLE) / CAST(count_order AS DOUBLE) / 100.0
         AS avg_price,
       CAST(s_dpct AS DOUBLE) / CAST(count_order AS DOUBLE) / 100.0
         AS avg_disc,
       count_order
FROM agg
"""


def _q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import revenue_by_nation

    return revenue_by_nation(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
    )


def _revenue_oracle() -> str:
    ep = _OLAP_CENTS.format(c="l_extendedprice")
    d = _OLAP_CENTS.format(c="l_discount")
    return f"""
SELECT n_name,
       CAST(sum({ep} * (100 - {d})) AS DOUBLE) / 10000.0 AS revenue,
       count(DISTINCT o_orderkey) AS n_orders,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def _q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import topk_orders_per_customer

    return topk_orders_per_customer(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )


_TOPK_ORDERS_ORACLE = """
WITH ranked AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
)
SELECT c_custkey, c_name, rk AS order_rank, o_orderkey, o_totalprice
FROM ranked JOIN customer ON o_custkey = c_custkey
WHERE rk <= 3
"""


def _q_revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import revenue_cube

    return revenue_cube(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
    )


def _cube_oracle() -> str:
    cents = _OLAP_CENTS.format(c="o_totalprice")
    return f"""
SELECT n_name, o_orderpriority,
       CAST(GROUPING(n_name) AS INTEGER) AS g_nation,
       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
       CAST(sum({cents}) AS DOUBLE) / 100.0 AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY CUBE (n_name, o_orderpriority)
"""


def _q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped EXISTS via left_semi join
    (plans/analytics.py::late_shipment_priority)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import (
        late_shipment_priority,
    )

    return late_shipment_priority(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


_LATE_SHIP_ORACLE = """
SELECT o_orderpriority, count(*) AS late_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


def _q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily resample with zero-filled gaps
    (plans/analytics.py::gap_filled_daily_counts)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import (
        gap_filled_daily_counts,
    )

    return gap_filled_daily_counts(load_table(spark, sf_dir, "events"))


_GAP_FILL_ORACLE = """
WITH bounds AS (
  SELECT date_trunc('day', min(ts)) AS lo, date_trunc('day', max(ts)) AS hi
  FROM events
), calendar AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
), types AS (
  SELECT DISTINCT event_type FROM events
), cnt AS (
  SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT c.day, t.event_type,
       CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_events
FROM calendar c CROSS JOIN types t
LEFT JOIN cnt ON cnt.day = c.day AND cnt.event_type = t.event_type
"""


def _q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import (
        status_priority_grouping_sets,
    )

    return status_priority_grouping_sets(load_table(spark, sf_dir, "orders"))


def _grouping_sets_oracle() -> str:
    cents = _OLAP_CENTS.format(c="o_totalprice")
    return f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
       count(*) AS n_orders,
       CAST(sum(CAST({cents} AS DECIMAL(38,0))) AS DOUBLE) / 100.0
         AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), ())
"""


def _q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import small_quantity_revenue

    return small_quantity_revenue(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )


def _small_qty_oracle() -> str:
    # Written in the CORRELATED form on purpose: DuckDB decorrelates it
    # into the same per-part aggregate + join our DataFrame plan spells
    # out — so this row also proves the decorrelation equivalence.
    cents = _OLAP_CENTS.format(c="l_extendedprice")
    return f"""
SELECT CAST(sum(CAST({cents} AS DECIMAL(38,0))) AS BIGINT)
         AS small_qty_revenue_cents,
       count(*) AS n_items
FROM lineitem l
JOIN part ON l.l_partkey = p_partkey AND p_brand = 'Brand#13'
WHERE l.l_quantity < (
  SELECT CAST(sum(CAST(round(l2.l_quantity) AS BIGINT)) AS DOUBLE)
           / count(*) * 0.2
  FROM lineitem l2
  WHERE l2.l_partkey = l.l_partkey
)
"""


# ------------------------------------------- relational coverage (§2.7)
# Semi/anti joins, set operators, distinct aggregation, regex/date
# scalar functions, JSON/array functions, exact percentiles — the
# remaining categories SURVEY §2.7 lists as absent from the reference.


def _q_rel_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import customers_with_urgent_orders

    return customers_with_urgent_orders(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
    )


_REL_SEMI_ORACLE = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_mktsegment = 'BUILDING'
  AND EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderpriority = '1-URGENT')
"""


def _q_rel_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import dormant_customers

    return dormant_customers(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
    )


_REL_ANTI_ORACLE = """
SELECT c_custkey, c_name, c_nationkey
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
"""


def _q_rel_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import repeat_buyers

    return repeat_buyers(load_table(spark, sf_dir, "orders"))


_REL_INTERSECT_ORACLE = """
SELECT o_custkey AS custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
INTERSECT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
"""


def _q_rel_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import churned_buyers

    return churned_buyers(load_table(spark, sf_dir, "orders"))


_REL_EXCEPT_ORACLE = """
SELECT o_custkey AS custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
EXCEPT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
"""


def _q_rel_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import nation_order_profile

    return nation_order_profile(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
    )


_REL_DISTINCT_ORACLE = """
SELECT n_name,
       count(DISTINCT o_custkey) AS n_buyers,
       count(DISTINCT strftime(o_orderdate, '%Y-%m')) AS n_months,
       count(*) AS n_orders,
       CAST(sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                     AS DECIMAL(38,0))) AS DOUBLE) / 100.0 AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def _q_rel_regex_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import monthly_orders_by_id_parity

    return monthly_orders_by_id_parity(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )


_REL_REGEX_ORACLE = r"""
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       -- TRY_CAST: a non-matching c_name extracts '' — Spark's
       -- non-ANSI cast yields a NULL parity group, DuckDB's plain
       -- CAST('' AS BIGINT) would abort the whole oracle query
       TRY_CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) % 2
         AS id_parity,
       count(*) AS n_orders,
       CAST(sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                     AS DECIMAL(38,0))) AS DOUBLE) / 100.0 AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY month, id_parity
"""


def _q_rel_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import props_profile

    return props_profile(load_table(spark, sf_dir, "events"))


_REL_JSON_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT))
         AS n_distinct_k,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


def _q_rel_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import user_value_arrays

    return user_value_arrays(load_table(spark, sf_dir, "events"))


_REL_ARRAY_ORACLE = """
WITH arrs AS (
  -- FILTER mirrors Spark collect_list's NULL-dropping (DuckDB list()
  -- KEEPS NULL elements); coalesce keeps an all-NULL user at an empty
  -- array like Spark rather than a NULL array
  SELECT user_id,
         list_sort(coalesce(
           list(CAST(round(value * 100) AS BIGINT))
             FILTER (WHERE value IS NOT NULL), [])) AS vals
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(len(vals) AS INTEGER) AS n_values,
       vals[1] AS v_min,
       vals[-1] AS v_max,
       CAST(list_sum(vals) AS BIGINT) AS v_sum
FROM arrs
"""


def _q_rel_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import trailing_distinct_types

    return trailing_distinct_types(load_table(spark, sf_dir, "events"))


_REL_WDISTINCT_ORACLE = """
SELECT event_id, user_id, ts,
       CAST(count(DISTINCT event_type) OVER w AS INTEGER)
         AS n_distinct_types_1h,
       count(*) OVER w AS n_events_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


def _q_rel_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import unpivot_lineitem_measures

    return unpivot_lineitem_measures(load_table(spark, sf_dir, "lineitem"))


_REL_UNPIVOT_ORACLE = """
-- SQL-standard UNPIVOT form with INCLUDE NULLS: Spark's
-- DataFrame.unpivot keeps NULL measure values; DuckDB's default
-- (and its simplified UNPIVOT syntax, which cannot say INCLUDE
-- NULLS) drops them
SELECT l_orderkey, l_linenumber, measure, value
FROM (SELECT l_orderkey, l_linenumber, l_quantity,
             l_extendedprice, l_discount FROM lineitem)
  UNPIVOT INCLUDE NULLS
  (value FOR measure IN (l_quantity, l_extendedprice, l_discount))
"""


def _q_rel_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import value_percentiles

    return value_percentiles(load_table(spark, sf_dir, "events"))


_REL_PCTL_ORACLE = """
WITH ranked AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY CAST(round(value * 100) AS BIGINT))
           AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
  WHERE value IS NOT NULL
)
SELECT event_type,
       max(CASE WHEN rn = CAST(ceil(0.5 * n) AS INTEGER)
                THEN cents END) AS p50_cents,
       max(CASE WHEN rn = CAST(ceil(0.9 * n) AS INTEGER)
                THEN cents END) AS p90_cents,
       max(CASE WHEN rn = CAST(ceil(0.99 * n) AS INTEGER)
                THEN cents END) AS p99_cents
FROM ranked
WHERE rn = CAST(ceil(0.5 * n) AS INTEGER)
   OR rn = CAST(ceil(0.9 * n) AS INTEGER)
   OR rn = CAST(ceil(0.99 * n) AS INTEGER)
GROUP BY event_type
"""


def _q_rel_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import order_deltas

    return order_deltas(load_table(spark, sf_dir, "orders"))


_REL_WINDOW_ORACLE = """
SELECT o_custkey, o_orderkey,
       row_number() OVER seq AS order_idx,
       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
       lag(CAST(round(o_totalprice * 100) AS BIGINT)) OVER seq
         AS prev_cents,
       CAST(round(o_totalprice * 100) AS BIGINT)
         - lag(CAST(round(o_totalprice * 100) AS BIGINT)) OVER seq
         AS delta_cents,
       CAST(ntile(4) OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC NULLS LAST,
                                    o_orderkey NULLS FIRST)
            AS INTEGER) AS spend_quartile
FROM orders
WINDOW seq AS (PARTITION BY o_custkey
               ORDER BY o_orderdate NULLS FIRST, o_orderkey NULLS FIRST)
"""


def _q_rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import revenue_pivot_by_priority

    return revenue_pivot_by_priority(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
    )


def _rel_pivot_oracle() -> str:
    cents = _OLAP_CENTS.format(c="o_totalprice")
    cols = []
    for p in ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"):
        cols.append(
            f"CAST(sum(CAST({cents} AS DECIMAL(38,0))) "
            f"FILTER (WHERE o_orderpriority = '{p}') AS BIGINT) "
            f"AS rev_p{p[0]}_cents"
        )
    sel = ",\n       ".join(cols)
    return f"""
SELECT n_name,
       {sel}
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# ------------------------------------------------- Q8-shape market share


def _q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: per-year revenue share of one supplier nation —
    conditional FILTER-style aggregation over the star join, computed
    in a single pass (see plans/analytics.py::market_share)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import market_share

    return market_share(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


def _market_share_oracle() -> str:
    ep = _OLAP_CENTS.format(c="l_extendedprice")
    d = _OLAP_CENTS.format(c="l_discount")
    rev = f"CAST({ep} * (100 - {d}) AS HUGEINT)"
    return f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(sum({rev}) AS DOUBLE) / 10000.0 AS revenue,
       CAST(sum(CASE WHEN n_name = 'NATION_9' THEN {rev} ELSE 0 END)
            AS DOUBLE)
         / CAST(sum({rev}) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY o_year
"""


# ---------------------------------------------------------- map functions


def _q_rel_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function family (map_from_entries / map_filter / map_entries
    / transform / size) over per-document word-count maps; serialized
    deterministically because raw maps have no cross-engine order."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import doc_word_profile

    return doc_word_profile(load_table(spark, sf_dir, "documents"))


_REL_MAP_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), wc AS (
  SELECT doc_id, w, count(*) AS c FROM tok WHERE w <> '' GROUP BY doc_id, w
)
SELECT doc_id,
       CAST(count(*) AS INTEGER) AS n_distinct_words,
       coalesce(
         array_to_string(
           list_sort(list(w || ':' || CAST(c AS VARCHAR))
                     FILTER (WHERE c >= 3)),
           ','),
         ''
       ) AS frequent
FROM wc
GROUP BY doc_id
"""


# ------------------------------------------------ multimodal metadata


def _q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata op through the driver gate: video frame
    sampling (every 5th frame index from the metadata struct,
    JVM-side sequence+explode — no payload decode). The media table
    is the deterministic synthetic fixture over documents, so the
    oracle regenerates it exactly; payload-decoding ops stay
    pytest-verified (binary outputs don't value-hash across engines).
    """
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        sample_frames,
        synth_media,
    )

    media = synth_media(
        spark, load_table(spark, sf_dir, "documents"), kind="video"
    )
    return sample_frames(media, every_n=5)


_MM_FRAME_ORACLE = """
WITH media AS (
  SELECT doc_id AS media_id, (doc_id % 30) + 1 AS n_frames FROM documents
)
SELECT media_id,
       CAST(unnest(range(0, greatest(n_frames - 1, 0) + 1, 5)) AS INTEGER)
         AS frame_idx
FROM media
-- n_frames >= 1 mirrors sample_frames' corrupt-video guard: a NULL/0
-- frame count emits NO phantom frame row (greatest() ignores NULLs in
-- both engines, so without the predicate a NULL-id video would emit
-- frame 0)
WHERE n_frames >= 1
"""


# ------------------------------------------- image near-dup (gated)

# dHash-invertible PPM fixture: each 9x8 grayscale image encodes the
# 64 bits of a 60-bit md5 value H(doc_id) as its horizontal luminance
# steps — pixel(y, x+1) = pixel(y, x) +/- 1 according to bit
# 63-(y*8+x) of H — so operators/multimodal.py::perceptual_hashes
# decodes REAL pixels through the REAL PPM decoder and block-mean,
# yet dhash(image) == H exactly (dhash compares neighbours; the walk
# stays inside [120, 136], and 1x1 blocks make the area-mean the
# identity). Groups of 4 consecutive ids share a base H with bit
# masks {0, 1 bit, 4 bits, 0} flipped per variant, so each group
# contributes exactly the pairs (v0,v3,h=0), (v0,v1,h=1), (v1,v3,h=1)
# and variant 2 (h=4 > max 3) pairs with nothing. The oracle computes
# the same H in DuckDB md5 arithmetic and brute-forces verified pairs
# — the whole decode->hash->band->verify pipeline is value-checked.
_MM_PHASH_MASKS = (0, 1 << 5, 0b1111 << 20, 0)


def _mm_phash_h(group: int) -> int:
    import hashlib

    return int(hashlib.md5(str(group).encode()).hexdigest()[:15], 16)


def _q_mm_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs end to end (operators/multimodal.py::
    image_near_dup_pairs = perceptual_hashes -> hamming_near_dup_pairs)
    over the dHash-invertible PPM fixture above."""
    import pandas as _pd

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        image_near_dup_pairs,
    )

    def _ppm(doc_id):
        # NULL ids arrive as None or NaN depending on the Arrow batch's
        # pandas dtype (int64 vs float64) — both mean "no identity":
        # emit no payload, so the hash stage emits NULL and the row
        # joins nothing (the engine-wide NULL-key rule)
        if doc_id is None or _pd.isna(doc_id):
            return None
        g, v = divmod(int(doc_id), 4)
        h = _mm_phash_h(g) ^ _MM_PHASH_MASKS[v]
        body = bytearray()
        for y in range(8):
            val = 128
            row = [val]
            for x in range(8):
                val += 1 if (h >> (63 - (y * 8 + x))) & 1 else -1
                row.append(val)
            for px in row:
                body += bytes((px, px, px))
        return b"P6\n9 8\n255\n" + bytes(body)

    def _build(batches):
        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "image",
                    "content": [_ppm(i) for i in pdf["doc_id"]],
                    "meta": [{"format": "ppm"}] * len(pdf),
                }
            )

    media = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        # spread the thin ids so payload GENERATION parallelizes too
        # (the single-file scan is 1 split; the decode stage's own
        # _parallelize_scan guard only parallelizes AFTER the build)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(
            _build,
            schema="media_id long, kind string, content binary, "
            "meta map<string,string>",
        )
    )
    return image_near_dup_pairs(media, max_hamming=3, bands=4)


def _q_mm_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup pairs end to end (operators/multimodal.py::
    audio_near_dup_pairs = audio_fingerprint -> hamming_near_dup_pairs)
    over a fingerprint-invertible WAV fixture: window k holds constant
    amplitude a_k with a_{k+1} = a_k +/- 16 by bit 63-k of the same
    h(doc_id) the image fixture uses, so the energy-delta fingerprint
    equals h exactly and the oracle is _MM_NEAR_DUP_ORACLE verbatim —
    the real WAV encode/decode round-trips inside the gate."""
    import pandas as _pd

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        audio_near_dup_pairs,
    )

    def _wav(doc_id):
        if doc_id is None or _pd.isna(doc_id):
            return None
        import io
        import wave

        g, v = divmod(int(doc_id), 4)
        h = _mm_phash_h(g) ^ _MM_PHASH_MASKS[v]
        amp, samples = 2000, []
        for k in range(65):
            samples.extend([amp] * 16)
            if k < 64:
                amp += 16 if (h >> (63 - k)) & 1 else -16
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(
                b"".join(int(s).to_bytes(2, "little", signed=True)
                         for s in samples)
            )
        return buf.getvalue()

    def _build(batches):
        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "audio",
                    "content": [_wav(i) for i in pdf["doc_id"]],
                    "meta": [{"format": "wav"}] * len(pdf),
                }
            )

    media = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        # spread the thin ids so payload GENERATION parallelizes too
        # (the single-file scan is 1 split; the decode stage's own
        # _parallelize_scan guard only parallelizes AFTER the build)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(
            _build,
            schema="media_id long, kind string, content binary, "
            "meta map<string,string>",
        )
    )
    return audio_near_dup_pairs(media)


def _q_mm_video_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup pairs end to end (operators/multimodal.py::
    video_near_dup_pairs = Y4M container walk -> per-frame dHash ->
    bitwise-majority fold -> hamming_near_dup_pairs) over a
    fold-invertible Y4M fixture: each video holds THREE 9x8 mono
    frames — two encoding h(doc_id) as luminance steps (the image
    fixture's walk) and one minority frame encoding h with four extra
    bits flipped, which the majority fold must outvote — so
    vfp(video) == h exactly and the oracle is _MM_NEAR_DUP_ORACLE
    verbatim. The REAL container walk, frame decode, per-frame dHash
    and fold all run inside the gate."""
    import pandas as _pd

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        video_near_dup_pairs,
    )

    def _frame(h):
        body = bytearray()
        for y in range(8):
            val = 128
            row = [val]
            for x in range(8):
                val += 1 if (h >> (63 - (y * 8 + x))) & 1 else -1
                row.append(val)
            body += bytes(row)
        return b"FRAME\n" + bytes(body)

    def _y4m(doc_id):
        if doc_id is None or _pd.isna(doc_id):
            return None
        g, v = divmod(int(doc_id), 4)
        h = _mm_phash_h(g) ^ _MM_PHASH_MASKS[v]
        minority = h ^ (0b1111 << 40)  # outvoted 2:1 by the fold
        return (
            b"YUV4MPEG2 W9 H8 F25:1 Ip A0:0 Cmono\n"
            + _frame(h) + _frame(minority) + _frame(h)
        )

    def _build(batches):
        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "video",
                    "content": [_y4m(i) for i in pdf["doc_id"]],
                    "meta": [{"format": "y4m"}] * len(pdf),
                }
            )

    media = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        # spread the thin ids so payload GENERATION parallelizes too
        # (the single-file scan is 1 split; the decode stage's own
        # _parallelize_scan guard only parallelizes AFTER the build)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(
            _build,
            schema="media_id long, kind string, content binary, "
            "meta map<string,string>",
        )
    )
    return video_near_dup_pairs(media, max_hamming=3, bands=4)


_MM_NEAR_DUP_ORACLE = f"""
WITH h AS (
  SELECT doc_id AS media_id,
         xor({_H64.format(x="CAST(doc_id // 4 AS VARCHAR)")},
             CASE doc_id % 4 WHEN 1 THEN {1 << 5}
                             WHEN 2 THEN {0b1111 << 20}
                             ELSE 0 END) AS dh
  FROM documents WHERE doc_id IS NOT NULL
)
SELECT a.media_id AS doc_a, b.media_id AS doc_b,
       CAST(bit_count(xor(a.dh, b.dh)) AS INTEGER) AS hamming
FROM h a JOIN h b ON a.media_id < b.media_id
WHERE bit_count(xor(a.dh, b.dh)) <= 3
"""


# ---------------------------------------------------- decontamination


def _q_dedup_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/dedup.py): corpus docs
    (doc_id >= 10) sharing 9-gram shingles with the 'benchmark' set
    (doc_id < 10); distinct shared-shingle count per contaminated
    doc. The benchmark's exploded shingles broadcast; the corpus
    never shuffles before the contamination filter."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        contamination_overlap,
    )

    docs = load_table(spark, sf_dir, "documents")
    return contamination_overlap(
        docs.where("doc_id >= 10"),
        docs.where("doc_id < 10"),
        min_parallelism=spark.sparkContext.defaultParallelism,
    )


_CONTAMINATION_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, unnest({_SHINGLES}) AS sh FROM documents WHERE doc_id >= 10
), bench AS (
  SELECT DISTINCT unnest({_SHINGLES}) AS sh FROM documents WHERE doc_id < 10
)
SELECT c.doc_id, count(DISTINCT c.sh) AS n_overlap
FROM corpus c JOIN bench b ON c.sh = b.sh
GROUP BY c.doc_id
"""


def _q_stream_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standing decontamination guard (streaming/quality.py::
    run_contamination_stream): the benchmark set's (doc_id < 10)
    distinct shingle hashes persist ONCE up front
    (write_benchmark_shingles — the offline eval-suite artifact); the
    corpus (doc_id >= 10) then replays as TWO micro-batches, each
    probed statelessly against that fixed set. A doc's overlap count
    depends only on its own shingles and the benchmark, so the union
    of per-batch outputs equals the one-shot batch
    contamination_overlap run — the oracle is _CONTAMINATION_ORACLE
    verbatim."""
    import os
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        run_contamination_stream,
        write_benchmark_shingles,
    )
    from __spark_entry__ import _set_stream_partitions

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    key = t.column("doc_id")
    # corpus = doc_id >= 10 (NULL ids excluded, mirroring the batch
    # query's filter); split at the corpus id midpoint
    corpus = t.filter(pc.fill_null(pc.greater_equal(key, 10), False))
    ids = sorted(x.as_py() for x in corpus.column("doc_id"))
    mid = ids[len(ids) // 2]
    stream_dir = tempfile.mkdtemp(prefix="scont_src_")
    work = tempfile.mkdtemp(prefix="scont_work_")
    ckey = corpus.column("doc_id")
    pq.write_table(
        corpus.filter(pc.less(ckey, mid)),
        os.path.join(stream_dir, "00.parquet"),
    )
    pq.write_table(
        corpus.filter(pc.greater_equal(ckey, mid)),
        os.path.join(stream_dir, "01.parquet"),
    )
    shingle_dir = os.path.join(work, "bench_shingles")
    write_benchmark_shingles(
        load_table(spark, sf_dir, "documents").where("doc_id < 10"),
        shingle_dir,
    )
    old_parts = _set_stream_partitions(spark)
    try:
        stream = (
            spark.readStream.format("parquet")
            .schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .load(stream_dir)
        )
        q = run_contamination_stream(
            stream,
            os.path.join(work, "out"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            shingle_dir=shingle_dir,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "stream_contamination availableNow replay exceeded 300s"
            )
        return spark.read.parquet(
            os.path.join(work, "out", "batch=*", "overlap")
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


# ------------------------------- substring-level dedup (Lee et al. 2021)

_SUBSTR_K = 8
_SUBSTR_MIN_COUNT = 2


def _q_dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup discovery (operators/substring.py::
    repeated_spans, the Lee et al. 2021 ExactSubstr pass re-expressed
    relationally): every k-token window hashes scan-side, windows
    whose hash occurs >= 2 times corpus-wide mark their occurrences,
    marked windows merge into maximal per-doc token extents via
    gaps-and-islands on one doc-keyed window. All stages O(windows);
    no pair materialization anywhere."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.substring import (
        repeated_spans,
    )

    return repeated_spans(
        load_table(spark, sf_dir, "documents"),
        k=_SUBSTR_K,
        min_count=_SUBSTR_MIN_COUNT,
    )


def _q_dedup_substring_removed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring surgery (operators/substring.py::
    remove_repeated_spans): one row per input row, tokens inside the
    repeated extents cut, text single-space rejoined; NULL text stays
    NULL, NULL ids pass through untouched (outside span accounting by
    the null-unsafe rule)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.substring import (
        remove_repeated_spans,
    )

    return remove_repeated_spans(
        load_table(spark, sf_dir, "documents"),
        k=_SUBSTR_K,
        min_count=_SUBSTR_MIN_COUNT,
    )


def _q_stream_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming/incremental substring dedup (streaming/substring.py::
    run_index_substring_stream — the r11 verdict's "Missing #2"
    closed): documents replay as TWO micro-batches; each batch's
    k-token windows probe the persistent bucketed window-hash index,
    occurrences crossing min_count mark (including RETROACTIVE marks
    for past documents a later copy pushes over the threshold), and
    read_repeated_spans folds the accumulated marks into merged span
    extents with the batch operator's own gaps-and-islands code. Union
    of per-batch marks == the one-shot marked-window set, so the
    oracle is _SUBSTRING_SPANS_ORACLE verbatim."""
    import os
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        read_repeated_spans,
        run_index_substring_stream,
    )
    from __spark_entry__ import _set_stream_partitions

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = sorted(x.as_py() for x in t.column("doc_id") if x.as_py() is not None)
    mid = ids[len(ids) // 2]
    stream_dir = tempfile.mkdtemp(prefix="ssub_src_")
    work = tempfile.mkdtemp(prefix="ssub_work_")
    key = t.column("doc_id")
    in_b0 = pc.or_kleene(pc.less(key, mid), pc.is_null(key))
    pq.write_table(
        t.filter(pc.fill_null(in_b0, True)),
        os.path.join(stream_dir, "00.parquet"),
    )
    pq.write_table(
        t.filter(pc.fill_null(pc.invert(in_b0), False)),
        os.path.join(stream_dir, "01.parquet"),
    )
    old_parts = _set_stream_partitions(spark)
    try:
        stream = (
            spark.readStream.format("parquet")
            .schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .load(stream_dir)
        )
        q = run_index_substring_stream(
            stream,
            os.path.join(work, "out"),
            os.path.join(work, "index"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            k=_SUBSTR_K,
            min_count=_SUBSTR_MIN_COUNT,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "stream_substring availableNow replay exceeded 300s"
            )
        return read_repeated_spans(
            spark, os.path.join(work, "out"), k=_SUBSTR_K
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def _substring_grp_cte(k: int, mc: int) -> str:
    """Shared CTE chain (tokenize -> window-hash -> corpus-wide dup
    mark -> gaps-and-islands) for both substring oracles — one source
    of truth so discovery and removal can never drift. Tokenizer is
    the engine-wide list_filter(regexp_split_to_array(...)) twin;
    window hash = h64 of the space-joined window (tokens cannot
    contain whitespace, so the join is boundary-unambiguous)."""
    wh = _H64.format(x=f"array_to_string(tk[i + 1 : i + {k}], ' ')")
    return f"""
spans AS (
  SELECT doc_id,
         unnest(range(len(tk) - {k} + 1)) AS pos,
         unnest(list_transform(range(len(tk) - {k} + 1), i -> {wh})) AS sh
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(trim(text), '\\s+'),
                           t -> t != '') AS tk
        FROM documents WHERE doc_id IS NOT NULL)
  WHERE len(tk) >= {k}
), dup AS (
  SELECT sh FROM spans GROUP BY sh HAVING count(*) >= {mc}
), marked AS (
  SELECT s.doc_id, s.pos FROM spans s JOIN dup USING (sh)
), isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos > coalesce(max(pos) OVER (PARTITION BY doc_id
              ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              + {k}, -1)
              THEN 1 ELSE 0 END AS brk
  FROM marked
), grp AS (
  SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM isl
)"""


_SUBSTRING_SPANS_ORACLE = f"""
WITH {_substring_grp_cte(_SUBSTR_K, _SUBSTR_MIN_COUNT)}
SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + {_SUBSTR_K} AS BIGINT) AS span_end,
       count(*) AS n_windows
FROM grp GROUP BY doc_id, island
"""

# Removal: reconstruction groups per DISTINCT (doc_id, text) — dirty
# corpora carry duplicate ids with different texts, and the merged
# doc-level extents apply to EACH row's own token stream; joining the
# per-(id, text) reconstruction back to the base table restores row
# multiplicity. string_agg over zero kept rows vanishes, hence the
# coalesce('') for fully-covered docs; NULL ids and NULL texts ride
# their own branches (outside span accounting / no text contract).
_SUBSTRING_REMOVED_ORACLE = f"""
WITH {_substring_grp_cte(_SUBSTR_K, _SUBSTR_MIN_COUNT)}, ext AS (
  SELECT doc_id, min(pos) AS s, max(pos) + {_SUBSTR_K} AS e
  FROM grp GROUP BY doc_id, island
), dd AS (
  SELECT DISTINCT doc_id, text FROM documents
  WHERE text IS NOT NULL AND doc_id IS NOT NULL
), dtoks AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(trim(text), '\\s+'),
                     t -> t != '') AS tk
  FROM dd
), tokpos AS (
  SELECT doc_id, text, unnest(tk) AS tok, unnest(range(len(tk))) AS i
  FROM dtoks
), keptrows AS (
  SELECT t.doc_id, t.text, t.tok, t.i
  FROM tokpos t LEFT JOIN ext e
    ON t.doc_id = e.doc_id AND t.i >= e.s AND t.i < e.e
  WHERE e.doc_id IS NULL
), kc AS (
  SELECT doc_id, text, count(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY i) AS text_clean
  FROM keptrows GROUP BY doc_id, text
), recon AS (
  SELECT t.doc_id, t.text, coalesce(k.text_clean, '') AS text_clean,
         CAST(len(t.tk) AS BIGINT) AS n_tokens,
         CAST(len(t.tk) - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed
  FROM dtoks t LEFT JOIN kc k ON t.doc_id = k.doc_id AND t.text = k.text
)
SELECT d.doc_id, r.text_clean, r.n_tokens, r.n_removed
FROM documents d JOIN recon r ON d.doc_id = r.doc_id AND d.text = r.text
WHERE d.text IS NOT NULL AND d.doc_id IS NOT NULL
UNION ALL
SELECT doc_id,
       array_to_string(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                   t -> t != ''), ' ') AS text_clean,
       CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                            t -> t != '')) AS BIGINT) AS n_tokens,
       CAST(0 AS BIGINT) AS n_removed
FROM documents WHERE doc_id IS NULL AND text IS NOT NULL
UNION ALL
SELECT doc_id, CAST(NULL AS VARCHAR) AS text_clean,
       CAST(NULL AS BIGINT) AS n_tokens, CAST(NULL AS BIGINT) AS n_removed
FROM documents WHERE text IS NULL
"""


# ------------------------------------------------------- salted join


def _q_rel_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated shuffled join (operators/salted_join.py): the
    probe side scatters each key across 8 salts (derived from the
    event id — deterministic, never rand()), the build side replicates
    8x, the join keys on (key, salt). The oracle is the UNsalted join:
    identical rows is the contract."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import salted_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return salted_join(
        ev, cust, on="user_id", salt_source="event_id", salt=8
    )


_REL_SALTED_ORACLE = """
SELECT e.event_id, e.user_id, e.value, c.c_mktsegment
FROM events e JOIN customer c ON e.user_id = c.c_custkey
"""


# ------------------------------------------- composed cleaning pipeline


def _q_pipeline_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline (plans/pipeline.py): quality +
    language filters scan-side BEFORE the one dedup exchange (they
    commute with text-keyed dedup), deterministic id-sample after."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import clean_corpus

    return clean_corpus(load_table(spark, sf_dir, "documents"))


def _clean_cte_prefix(with_source: bool) -> str:
    """WITH-clause prefix replaying the shared cleaning chain
    (plans/pipeline.py::_cleaned) up to the ``dedup`` CTE — one
    source of truth for BOTH _pipeline_oracle and
    _curate_shards_oracle, mirroring the Spark-side helper."""
    score_cols = _lang_score_cols_sql()
    case = _lang_argmax_case_sql()
    en_stop = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
    src = ", source" if with_source else ""
    return f"""
WITH base AS (
  SELECT doc_id, text{src},
         list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t != '')
           AS toks,
         length(text) AS n_chars_m,
         length(text) - length(regexp_replace(text, '[\\.\\,\\;\\:\\!\\?]', '', 'g'))
           AS n_punct
  FROM documents
), counted AS (
  SELECT doc_id, text{src}, toks,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(n_chars_m AS BIGINT) AS n_chars_m,
         CAST(n_punct AS BIGINT) AS n_punct,
         CAST(len(list_filter(toks, t -> list_contains([{en_stop}],
              lower(t)))) AS BIGINT) AS n_stopwords
  FROM base
), ratios AS (
  SELECT *,
         CASE WHEN n_chars_m > 0
              THEN CAST(n_punct AS DOUBLE) / CAST(n_chars_m AS DOUBLE)
              ELSE 0.0 END AS punct_ratio,
         CASE WHEN n_tokens > 0
              THEN CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE)
              ELSE 0.0 END AS stopword_ratio
  FROM counted
), scored AS (
  SELECT doc_id, text{src}, n_tokens,
         CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 0.4 ELSE 0.0 END
           + 0.3 * (1.0 - punct_ratio) + 0.3 * stopword_ratio
           AS quality_score,
         {score_cols}
  FROM ratios
), lang_pred AS (
  SELECT doc_id, text{src}, n_tokens, quality_score, {case} AS lang_pred
  FROM scored
), filtered AS (
  SELECT * FROM lang_pred
  WHERE quality_score >= 0.5 AND lang_pred = 'en'
), dedup AS (
  SELECT *, row_number() OVER (
           PARTITION BY {_H64.format(x="text")} ORDER BY doc_id) AS rn
  FROM filtered
)"""


def _pipeline_oracle() -> str:
    return _clean_cte_prefix(with_source=False) + f"""
SELECT doc_id, n_tokens, quality_score, lang_pred
FROM dedup
WHERE rn = 1
  AND {_H64.format(x="'clean:' || CAST(doc_id AS VARCHAR)")} % 10000
      < 9000
"""


def _dedup_append_scenario(spark: SparkSession, sf_dir: str):
    """Shared (index, batch) scenario for BOTH incremental-dedup gate
    queries — one source of truth so the plain and Bloom variants can
    never drift against their shared oracle. The testdata's texts are
    all-distinct, so the batch is the id>=250 slice UNION ALL every
    document re-keyed (+1M) — giving the batch real corpus-duplicates
    (anti-joined away) AND real internal duplicates (min id wins);
    both removal paths are live in the gate, not just the hash
    plumbing."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.dedup import build_text_hash_index

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    index = build_text_hash_index(docs.where("doc_id < 250"))
    batch = docs.where("doc_id >= 250").unionAll(
        docs.select(
            (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"), "text"
        )
    )
    return index, batch


def _q_dedup_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup (operators/dedup.py::dedup_append)
    over the shared scenario (see _dedup_append_scenario)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.dedup import dedup_append

    index, batch = _dedup_append_scenario(spark, sf_dir)
    return dedup_append(index, batch)


def _q_dedup_append_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered incremental dedup
    (operators/dedup.py::dedup_append_bloom) over the SAME shared
    scenario and oracle as dedup_inc_append — the Bloom stage is a
    pure prefilter (false positives fall through to the exact
    anti-join), so any output difference is a bug in the bitmap
    math."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.dedup import (
        build_dedup_bloom,
        dedup_append_bloom,
    )

    index, batch = _dedup_append_scenario(spark, sf_dir)
    # small m stresses the false-positive path at gate scale
    bloom = build_dedup_bloom(index, num_bits=1 << 12)
    return dedup_append_bloom(index, batch, bloom, num_bits=1 << 12)


_DEDUP_APPEND_ORACLE = f"""
WITH idx AS (
  SELECT DISTINCT {_H64.format(x="text")} AS th
  FROM documents WHERE doc_id < 250
), raw_batch AS (
  SELECT doc_id, text FROM documents WHERE doc_id >= 250
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
), batch AS (
  SELECT {_H64.format(x="text")} AS text_hash, min(doc_id) AS doc_id
  FROM raw_batch GROUP BY 1
)
SELECT doc_id, text_hash FROM batch b
WHERE NOT EXISTS (SELECT 1 FROM idx WHERE idx.th = b.text_hash)
"""


def _q_curate_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation showcase: quality → lang → dedup → sample
    → per-source cap → shuffle → pack, one composed job
    (plans/pipeline.py::curate_and_shard); the oracle replays the
    ENTIRE chain in DuckDB."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.pipeline import curate_and_shard

    return curate_and_shard(load_table(spark, sf_dir, "documents"))


def _curate_shards_oracle() -> str:
    cap_h = _H64.format(x="'cap-v1:' || CAST(doc_id AS VARCHAR)")
    shuf_h = _H64.format(x="'shuffle-v1:' || CAST(doc_id AS VARCHAR)")
    return _clean_cte_prefix(with_source=True) + f""", sampled AS (
  SELECT doc_id, source, n_tokens FROM dedup
  WHERE rn = 1
    AND {_H64.format(x="'clean:' || CAST(doc_id AS VARCHAR)")} % 10000
        < 9000
), capped AS (
  SELECT doc_id, n_tokens,
         row_number() OVER (PARTITION BY source
                            ORDER BY {cap_h}, doc_id) AS cap_rk
  FROM sampled
), shuffled AS (
  SELECT doc_id, n_tokens, {shuf_h} % 8 AS shard,
         row_number() OVER (PARTITION BY {shuf_h} % 8
                            ORDER BY {shuf_h}, doc_id) AS pos
  FROM capped WHERE cap_rk <= 10
), cum AS (
  SELECT shard, pos, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY pos)
              AS BIGINT) AS c
  FROM shuffled
)
SELECT shard, CAST(floor((c - n_tokens) / 512.0) AS BIGINT) AS win,
       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS win_tokens,
       min(pos) AS first_pos, max(pos) AS last_pos
FROM cum GROUP BY 1, 2
"""


_RAG_DIMS, _RAG_PLANES, _RAG_TABLES = 16, 6, 2


def _q_rag_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RAG-ingestion pipeline end-to-end (plans/pipeline.py::
    rag_index): overlapping chunking → exact chunk-hash dedup →
    deterministic stub embedding → SRP bucket index, one composed job;
    the oracle replays the ENTIRE chain in DuckDB."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.pipeline import rag_index

    return rag_index(
        load_table(spark, sf_dir, "documents"),
        chunk_chars=256,
        overlap=64,
        dims=_RAG_DIMS,
        n_planes=_RAG_PLANES,
        n_tables=_RAG_TABLES,
    )


def _rag_index_oracle() -> str:
    chunk_h = _H64.format(x="substring(text, t.s, 256)")
    comp = lambda d: (  # noqa: E731 — local SQL fragment builder
        "CAST(round(CAST(CAST((("
        + _H64.format(
            x=f"CAST(chunk_hash AS VARCHAR) || ':' || '{d}'"
        )
        + " % 2001) - 1000) / 1000.0 AS REAL) AS DOUBLE)"
        " * 1000000.0) AS BIGINT)"
    )
    qv = "[" + ", ".join(comp(d) for d in range(_RAG_DIMS)) + "]"
    per_table = "\nUNION ALL\n".join(
        f"SELECT chunk_hash, doc_id, chunk_idx, chunk_start,"
        f" {t} AS \"table\","
        f" {_srp_bucket_sql(t, _RAG_PLANES, _RAG_DIMS)} AS bucket FROM q"
        for t in range(_RAG_TABLES)
    )
    return f"""
WITH c AS (
  SELECT doc_id,
         CAST((t.s - 1) // 192 AS BIGINT) AS chunk_idx,
         CAST(t.s AS BIGINT) AS chunk_start,
         {chunk_h} AS chunk_hash
  FROM documents,
       LATERAL unnest(range(1, greatest(length(text) - 64, 1) + 1, 192))
         AS t(s)
  -- NULL ids dropped by explicit rule (rag_index doctrine): a NULL id
  -- would win its dedup group NULLS-FIRST in Spark, NULLS-LAST here
  WHERE text IS NOT NULL AND doc_id IS NOT NULL
), d AS (
  -- exact chunk-hash dedup, first (doc_id, chunk_idx) wins
  SELECT chunk_hash, doc_id, chunk_idx, chunk_start FROM (
    SELECT c.*, row_number() OVER (PARTITION BY chunk_hash
                                   ORDER BY doc_id, chunk_idx) AS __rn
    FROM c)
  WHERE __rn = 1
), q0 AS (
  SELECT chunk_hash, doc_id, chunk_idx, chunk_start, {qv} AS qv FROM d
), q AS (
  -- stub embedding, quantized to SRP's integer micro-units; all-zero
  -- vectors excluded exactly as srp_signatures does
  SELECT * FROM q0 WHERE len(list_filter(qv, x -> x != 0)) > 0
)
{per_table}
"""


# ------------------------------------------ UDF / UDAF / UDTF surfaces


def _q_udx_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Pandas UDF surface (functions/udx.py): Luhn mod-10 check
    over a synthetic 16-digit card number (md5-derived so the oracle
    regenerates the identical inputs). One ArrowEvalPython stage;
    numpy fixed-width digit arithmetic, no per-row Python."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.functions.hashing import h64
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.functions.udx import with_luhn_flag

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        (h64(F.col("event_id").cast("string")) % F.lit(10**16)).alias(
            "cc_num"
        ),
    )
    return with_luhn_flag(ev)


def _luhn_oracle() -> str:
    # unrolled 16-position Luhn sum, integer-only
    terms = []
    for pos in range(16):
        digit = f"((cc_num // {10**pos}) % 10)"
        if pos % 2 == 1:
            terms.append(
                f"(CASE WHEN {digit} * 2 > 9 THEN {digit} * 2 - 9"
                f" ELSE {digit} * 2 END)"
            )
        else:
            terms.append(digit)
    total = " + ".join(terms)
    cc = _H64.format(x="CAST(event_id AS VARCHAR)") + " % 10000000000000000"
    return f"""
WITH src AS (SELECT event_id, {cc} AS cc_num FROM events)
SELECT event_id, cc_num,
       CAST(CASE WHEN ({total}) % 10 = 0 THEN 1 ELSE 0 END AS INTEGER)
         AS luhn_ok
FROM src
"""


def _q_udx_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate Pandas UDF (UDAF) surface: exact lower-median
    cents per user — order-statistic pick, int64 end-to-end, so the
    result is partitioning-independent and oracle-exact."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.functions.udx import (
        median_value_by_user,
    )

    return median_value_by_user(load_table(spark, sf_dir, "events"))


_UDX_MEDIAN_ORACLE = """
SELECT user_id,
       quantile_disc(CAST(round(value * 100) AS BIGINT), 0.5)
         AS median_cents
FROM events
GROUP BY user_id
"""


def _q_udx_word_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF surface (Spark 4 ``@udtf`` + LATERAL): (pos, word) per
    document. Row-at-a-time Python by construction — registered to
    prove the table-function extension point end-to-end; the codegen
    equivalent (posexplode) is what real plans should use, and
    tests/test_udx.py asserts they produce identical rows."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.functions.udx import word_positions

    return word_positions(load_table(spark, sf_dir, "documents"))


_UDX_WORDPOS_ORACLE = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
z AS (SELECT doc_id, unnest(list_zip(range(1, len(ws) + 1), ws)) AS z FROM d)
SELECT doc_id, CAST(z[1] AS INTEGER) AS pos, CAST(z[2] AS VARCHAR) AS word
FROM z
WHERE CAST(z[2] AS VARCHAR) <> ''
"""


# ------------------------------------------------- approximate sketches

_KMV_K = 32
_H64_SPACE = "1152921504606846976.0"  # 2^60 as a double literal


def _q_sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-user estimate per day over the events table
    (operators/sketches.py). md5-derived hashes make the estimate a
    deterministic function of the data, so the oracle recomputes it
    bit-for-bit — the check a native HLL sketch can never pass."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.sketches import (
        kmv_distinct,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd").alias(
            "day"
        ),
        "user_id",
    )
    return kmv_distinct(ev, group="day", value="user_id", k=_KMV_K)


_KMV_ORACLE = f"""
WITH h AS (
  -- NULL values are excluded (COUNT DISTINCT semantics), mirroring
  -- kmv_distinct's null filter: DuckDB would otherwise rank the NULL
  -- hash (NULLS LAST here, FIRST in Spark) and skew n_kept/u_k.
  SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day,
         {_H64.format(x="CAST(user_id AS VARCHAR)")} AS hh
  FROM events
  WHERE user_id IS NOT NULL
), r AS (
  SELECT day, hh,
         row_number() OVER (PARTITION BY day ORDER BY hh) AS rn
  FROM h
)
SELECT day, max(rn) AS n_kept,
       CASE WHEN max(rn) < {_KMV_K} THEN CAST(max(rn) AS DOUBLE)
            ELSE {float(_KMV_K - 1)} /
                 (CAST(max(CASE WHEN rn = {_KMV_K} THEN hh END) AS DOUBLE)
                  / {_H64_SPACE})
       END AS est_distinct
FROM r
WHERE rn <= {_KMV_K}
GROUP BY day
"""

_CMS_DEPTH, _CMS_WIDTH, _CMS_TOPN = 4, 1024, 20


def _q_sketch_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters over the documents corpus: exact top-20
    words annotated with their sketch estimate (always >= exact; the
    gap is the collision bias). The counter grid is depth x width
    cells regardless of corpus size — the shuffle carries the sketch
    domain, never the tokens."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.sketches import (
        cms_heavy_hitters,
    )

    return cms_heavy_hitters(
        load_table(spark, sf_dir, "documents"),
        text="text",
        top_n=_CMS_TOPN,
        depth=_CMS_DEPTH,
        width=_CMS_WIDTH,
    )


def _cms_oracle() -> str:
    seeded = _H64.format(x="'cms' || CAST(i AS VARCHAR) || ':' || w")
    seeded_e = _H64.format(x="'cms' || CAST(i AS VARCHAR) || ':' || e.w")
    return f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
), tok2 AS (
  SELECT w FROM tok WHERE w <> ''
), ii AS (
  SELECT unnest(range({_CMS_DEPTH})) AS i
), exact AS (
  SELECT w, count(*) AS exact_cnt FROM tok2 GROUP BY w
  ORDER BY exact_cnt DESC, w LIMIT {_CMS_TOPN}
), cells AS (
  SELECT i, {seeded} % {_CMS_WIDTH} AS bucket
  FROM tok2 CROSS JOIN ii
), grid AS (
  SELECT i, bucket, count(*) AS c FROM cells GROUP BY i, bucket
), probes AS (
  SELECT e.w, e.exact_cnt, i,
         {seeded_e} % {_CMS_WIDTH} AS bucket
  FROM exact e CROSS JOIN ii
)
SELECT p.w, p.exact_cnt, min(g.c) AS cms_est
FROM probes p JOIN grid g USING (i, bucket)
GROUP BY p.w, p.exact_cnt
"""


# ------------------------------------------------- round-3 OLAP shapes
# (TPC-H Q13/Q18/Q15/Q10/Q7/Q14/Q19/Q22 adapted to the testdata columns)


def _q_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (plans/analytics.py::order_count_distribution)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import order_count_distribution

    return order_count_distribution(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


_ORDER_COUNT_DIST_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey, count(*) AS n FROM orders
  WHERE o_orderpriority <> '1-URGENT' GROUP BY o_custkey
)
SELECT CAST(coalesce(n, 0) AS BIGINT) AS c_count, count(*) AS custdist
FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
GROUP BY 1
"""


def _q_big_ticket_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (plans/analytics.py::big_ticket_orders)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import big_ticket_orders

    return big_ticket_orders(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


_BIG_TICKET_ORACLE = """
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 300
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def _q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (plans/analytics.py::top_supplier)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import top_supplier

    return top_supplier(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "supplier")
    )


def _top_supplier_oracle() -> str:
    ep = _OLAP_CENTS.format(c="l_extendedprice")
    d = _OLAP_CENTS.format(c="l_discount")
    return f"""
WITH pr AS (
  SELECT l_suppkey, sum(CAST({ep} * (100 - {d}) AS HUGEINT)) AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) / 10000.0 AS total_revenue
FROM pr JOIN supplier ON l_suppkey = s_suppkey
WHERE rev = (SELECT max(rev) FROM pr)
"""


def _q_returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (plans/analytics.py::returned_item_top_customers)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import (
        returned_item_top_customers,
    )

    return returned_item_top_customers(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "nation"),
    )


def _returned_top_oracle() -> str:
    ep = _OLAP_CENTS.format(c="l_extendedprice")
    d = _OLAP_CENTS.format(c="l_discount")
    return f"""
WITH per AS (
  SELECT o_custkey, sum(CAST({ep} * (100 - {d}) AS HUGEINT)) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1996-04-01'
  GROUP BY o_custkey
)
SELECT c_custkey, c_name, CAST(rev AS DOUBLE) / 10000.0 AS revenue,
       c_acctbal, n_name
FROM per JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY rev DESC, c_custkey LIMIT 20
"""


def _q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (plans/analytics.py::volume_shipping)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import volume_shipping

    return volume_shipping(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


def _volume_shipping_oracle() -> str:
    ep = _OLAP_CENTS.format(c="l_extendedprice")
    d = _OLAP_CENTS.format(c="l_discount")
    return f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(sum(CAST({ep} * (100 - {d}) AS HUGEINT)) AS DOUBLE) / 10000.0
         AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('NATION_1', 'NATION_2')
  AND n2.n_name IN ('NATION_1', 'NATION_2')
  AND n1.n_name <> n2.n_name
  AND year(l_shipdate) BETWEEN 1996 AND 1997
GROUP BY 1, 2, 3
"""


def _q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (plans/analytics.py::promo_revenue_share)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import promo_revenue_share

    return promo_revenue_share(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def _promo_share_oracle() -> str:
    ep = _OLAP_CENTS.format(c="l_extendedprice")
    d = _OLAP_CENTS.format(c="l_discount")
    rev = f"CAST({ep} * (100 - {d}) AS HUGEINT)"
    return f"""
SELECT 100.0 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE) AS promo_pct,
       CAST(promo AS DOUBLE) / 10000.0 AS promo_revenue,
       CAST(total AS DOUBLE) / 10000.0 AS total_revenue,
       n_items
FROM (
  SELECT sum(CASE WHEN p_type = 'PROMO' THEN {rev} ELSE 0 END) AS promo,
         sum({rev}) AS total, count(*) AS n_items
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-09-01'
    AND l_shipdate < TIMESTAMP '1996-10-01'
)
"""


def _q_brand_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (plans/analytics.py::brand_bracket_revenue)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import brand_bracket_revenue

    return brand_bracket_revenue(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def _brand_brackets_oracle() -> str:
    ep = _OLAP_CENTS.format(c="l_extendedprice")
    d = _OLAP_CENTS.format(c="l_discount")
    return f"""
SELECT CAST(sum(CAST({ep} * (100 - {d}) AS HUGEINT)) AS DOUBLE) / 10000.0
         AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
       AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
       AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30
       AND p_size BETWEEN 1 AND 15)
"""


def _q_rich_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (plans/analytics.py::rich_inactive_customers)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import (
        rich_inactive_customers,
    )

    return rich_inactive_customers(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "nation"),
    )


def _rich_inactive_oracle() -> str:
    cents = _OLAP_CENTS.format(c="c_acctbal")
    return f"""
SELECT n_name, count(*) AS numcust,
       CAST(sum(CAST({cents} AS HUGEINT)) AS DOUBLE) / 100.0 AS totacctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (
        SELECT CAST(sum(CAST({cents} AS HUGEINT)) AS DOUBLE)
               / count(*) / 100.0
        FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY n_name
"""


# --------------------------------------------- round-3 time-series shapes


def _q_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resample (plans/analytics.py::ohlc_bars)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import ohlc_bars

    return ohlc_bars(load_table(spark, sf_dir, "events"))


_OHLC_ORACLE = """
WITH ranked AS (
  -- CAST to TIMESTAMP: DuckDB's date_trunc('day') yields DATE while
  -- Spark's yields TIMESTAMP; values are equal but the repr/type
  -- differs, which a strict harness hashes as a mismatch.
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, value,
         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, day,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       count(*) AS volume,
       CAST(sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT))
            AS DOUBLE) / 100.0 AS total_value
FROM ranked GROUP BY 1, 2
"""


def _q_interpolate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled linear interpolation
    (plans/analytics.py::interpolated_hourly_series)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import (
        interpolated_hourly_series,
    )

    return interpolated_hourly_series(load_table(spark, sf_dir, "events"))


_INTERPOLATE_ORACLE = """
WITH totals AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         CAST(sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT))
              AS DOUBLE) / 100.0 AS v
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events
), grid AS (
  SELECT g.hour, t.event_type
  FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        FROM bounds) g
  CROSS JOIN (SELECT DISTINCT event_type FROM events) t
), j AS (
  SELECT grid.hour, grid.event_type, totals.v
  FROM grid LEFT JOIN totals
    ON totals.hour = grid.hour AND totals.event_type = grid.event_type
), w AS (
  SELECT hour, event_type, v,
    last_value(CASE WHEN v IS NOT NULL THEN {'h': hour, 'v': v} END
               IGNORE NULLS)
      OVER (PARTITION BY event_type ORDER BY hour
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p,
    first_value(CASE WHEN v IS NOT NULL THEN {'h': hour, 'v': v} END
                IGNORE NULLS)
      OVER (PARTITION BY event_type ORDER BY hour
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS n
  FROM j
)
SELECT hour, event_type, (v IS NOT NULL) AS observed,
  CASE WHEN v IS NOT NULL THEN v
       WHEN p IS NOT NULL AND n IS NOT NULL THEN
         p.v + (n.v - p.v) * (CAST((epoch(hour) - epoch(p.h)) / 3600
                                   AS DOUBLE)
                              / CAST((epoch(n.h) - epoch(p.h)) / 3600
                                     AS DOUBLE))
       WHEN p IS NOT NULL THEN p.v
       ELSE n.v END AS value
FROM w
"""


# ---------------------------------------------- round-3 pipeline shapes


def _q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic entity-consistent split
    (plans/train_prep.py::hash_split), summarized per split."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.train_prep import hash_split

    labeled = hash_split(load_table(spark, sf_dir, "events"), "user_id")
    return labeled.groupBy("split").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_rows"),
    )


_HASH_SPLIT_ORACLE = """
WITH labeled AS (
  SELECT user_id,
         -- || (NOT concat) on both layers: a NULL user_id must yield a
         -- NULL hash -> 'train' (Spark's F.concat is NULL-propagating;
         -- DuckDB concat would hash the bare 'split-v1:' prefix)
         CASE WHEN CAST('0x' ||
                  substring(md5('split-v1:' || CAST(user_id AS VARCHAR)),
                            1, 15) AS BIGINT) % 100 < 30
              THEN 'test' ELSE 'train' END AS split
  FROM events
)
SELECT split, count(DISTINCT user_id) AS n_users, count(*) AS n_rows
FROM labeled GROUP BY split
"""


def _q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc TF-IDF top terms (operators/tfidf.py::tfidf_top_terms)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.tfidf import tfidf_top_terms

    return tfidf_top_terms(load_table(spark, sf_dir, "documents"), k=3).withColumnRenamed(
        "rank", "term_rank"
    )


_TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                            t -> t != '')) AS tok
  FROM documents
), tf AS (
  SELECT doc_id, lower(tok) AS term, count(*) AS tf FROM toks GROUP BY 1, 2
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT doc_id, term, tf, df,
         CAST(tf AS DOUBLE) * (CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
           AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
), r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term) AS term_rank
  FROM scored
)
SELECT doc_id, term_rank, term, tf, df, score FROM r WHERE term_rank <= 3
"""


_BPE_K = 8

#: merge-table memo per (sf_dir, k): the three BPE-family queries
#: (vocab / encode / packing) would otherwise each re-run the k
#: driver-coordinated learning iterations on the same corpus within
#: one bench/gate pass. Learning is deterministic, so caching is
#: observationally identical; the cache holds O(k) tuples per dir.
_BPE_MERGE_CACHE: dict = {}


def _bpe_merges(spark: SparkSession, sf_dir: str, k: int = None):
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.tfidf import learn_bpe_merges

    k = _BPE_K if k is None else k
    key = (sf_dir, k)
    if key not in _BPE_MERGE_CACHE:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        _BPE_MERGE_CACHE[key] = [
            (r.step, r.lhs, r.rhs, r.weight)
            for r in learn_bpe_merges(docs, k=k).orderBy("step").collect()
        ]
    return _BPE_MERGE_CACHE[key]


def _q_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained BPE merge table (operators/tfidf.py::
    learn_bpe_merges): k deterministic most-frequent-pair merges over
    the word-count table, ties (weight DESC, lhs, rhs). The oracle
    replays the identical k stages in DuckDB over the wrapped-symbol
    encoding, so the learned table is bit-checkable cross-engine."""
    return local_rows(
        spark,
        _bpe_merges(spark, sf_dir),
        "step int, lhs string, rhs string, weight long",
    )


def _bpe_chain_sql(k: int) -> str:
    """The shared k-stage BPE WITH-chain: each stage computes adjacent
    pair weights from the previous symbolization, picks the best pair
    (scalar subqueries keep the stage 1-row even when no pairs
    remain), and re-symbolizes via plain replace on the SOH/STX
    wrapped encoding — byte-for-byte the operator's procedure. Every
    CTE is MATERIALIZED: the stage graph references each predecessor
    twice, so default inlining re-evaluates (and re-opens the parquet)
     2^k times. The chain carries `word` so consumers can read the
    final per-word symbolization s{k} (the packing oracle does)."""
    parts = ["""WITH words AS MATERIALIZED (
  SELECT word, count(*) AS n FROM (
    SELECT lower(t.tok) AS word
    FROM documents,
         unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                            t -> t != '')) AS t(tok)
  )
  WHERE NOT contains(word, chr(1)) AND NOT contains(word, chr(2))
  GROUP BY word
), s0 AS MATERIALIZED (
  SELECT word,
         regexp_replace(word, '(.)', chr(1) || '\\1' || chr(2), 'g') AS seq, n
  FROM words
)"""]
    for i in range(1, k + 1):
        p = i - 1
        parts.append(f""", p{i} AS MATERIALIZED (
  SELECT syms[j] AS lhs, syms[j + 1] AS rhs, SUM(n) AS weight
  FROM (SELECT string_split(seq[2:length(seq) - 1], chr(2) || chr(1)) AS syms, n
        FROM s{p}) x,
       UNNEST(range(1, len(syms))) AS u(j)
  GROUP BY 1, 2
), b{i} AS MATERIALIZED (
  SELECT lhs, rhs, weight FROM p{i} ORDER BY weight DESC, lhs, rhs LIMIT 1
), m{i} AS MATERIALIZED (
  SELECT {i} AS step,
         (SELECT lhs FROM b{i}) AS lhs,
         (SELECT rhs FROM b{i}) AS rhs,
         (SELECT weight FROM b{i}) AS weight
), s{i} AS MATERIALIZED (
  SELECT s.word, CASE WHEN m.lhs IS NOT NULL
              THEN replace(s.seq,
                           chr(1) || m.lhs || chr(2) || chr(1) || m.rhs || chr(2),
                           chr(1) || m.lhs || m.rhs || chr(2))
              ELSE s.seq END AS seq, s.n
  FROM s{p} s CROSS JOIN m{i} m
)""")
    return "".join(parts)


def _bpe_oracle(k: int) -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT step, lhs, rhs, CAST(weight AS BIGINT) AS weight FROM m{i} WHERE lhs IS NOT NULL"
        for i in range(1, k + 1)
    )
    return _bpe_chain_sql(k) + "\n" + union


def _q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary (operators/tfidf.py::build_vocabulary)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.tfidf import build_vocabulary

    return build_vocabulary(load_table(spark, sf_dir, "documents"))


_VOCAB_ORACLE = """
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                            t -> t != '')) AS tok
  FROM documents
), counts AS (
  SELECT lower(tok) AS term, count(*) AS n_occurrences
  FROM toks GROUP BY 1 HAVING count(*) >= 2
), top AS (
  SELECT * FROM counts ORDER BY n_occurrences DESC, term LIMIT 1000
)
SELECT row_number() OVER (ORDER BY n_occurrences DESC, term) AS term_id,
       term, n_occurrences
FROM top
"""


def _q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (plans/analytics.py::funnel_conversion)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import funnel_conversion

    return funnel_conversion(load_table(spark, sf_dir, "events"))


_FUNNEL_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t0,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t1,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t2
  FROM events GROUP BY user_id
), counts AS (
  SELECT
    sum(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS n0,
    sum(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0
             THEN 1 ELSE 0 END) AS n1,
    sum(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0
              AND t2 IS NOT NULL AND t2 > t1 THEN 1 ELSE 0 END) AS n2
  FROM per_user
)
SELECT CAST(s.step_index AS INTEGER) AS step_index, s.step,
       CAST(coalesce(
         CASE s.step_index WHEN 1 THEN n0 WHEN 2 THEN n1 ELSE n2 END, 0)
            AS BIGINT) AS n_users
FROM counts,
     (VALUES (1, 'view'), (2, 'click'), (3, 'purchase'))
       AS s(step_index, step)
"""


def _q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle (plans/analytics.py::cohort_retention)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import cohort_retention

    return cohort_retention(load_table(spark, sf_dir, "events"))


_COHORT_ORACLE = """
WITH user_days AS (
  -- TIMESTAMP cast: align DuckDB's DATE-typed date_trunc with Spark's
  -- TIMESTAMP-typed one (equal values, different repr/type).
  SELECT DISTINCT user_id,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
  FROM events
), cohorts AS (
  SELECT user_id, min(day) AS cohort_day FROM user_days GROUP BY user_id
)
SELECT cohort_day,
       CAST(date_diff('day', cohort_day, day) AS INTEGER) AS day_offset,
       count(*) AS n_users
FROM user_days JOIN cohorts USING (user_id)
GROUP BY 1, 2
"""


def _q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension-history build (plans/relational.py::scd2_intervals)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import scd2_intervals

    return scd2_intervals(load_table(spark, sf_dir, "events"))


# NULL-ts change rows are routed OUT of the version timeline (NULL
# valid_to / is_current) — left in the window, Spark's NULLS FIRST
# would make them the oldest version while DuckDB's NULLS LAST makes
# them current, shifting every real version's interval (the dirty
# suite caught exactly this flip)
_SCD2_ORACLE = """
SELECT user_id, value AS attr_value, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS valid_to,
       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
         AS is_current
FROM events
WHERE ts IS NOT NULL
UNION ALL
SELECT user_id, value AS attr_value, ts AS valid_from,
       CAST(NULL AS TIMESTAMP) AS valid_to,
       CAST(NULL AS BOOLEAN) AS is_current
FROM events
WHERE ts IS NULL
"""


def _q_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series z-score outliers (plans/analytics.py::zscore_anomalies)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import zscore_anomalies

    return zscore_anomalies(load_table(spark, sf_dir, "events"))


_ZSCORE_ORACLE = """
WITH stats AS (
  SELECT event_type,
         CAST(sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT))
              AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_c,
         sqrt(greatest(
           CAST(sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
                    * CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT))
                AS DOUBLE) / CAST(count(*) AS DOUBLE)
           - (CAST(sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT))
                   AS DOUBLE) / CAST(count(*) AS DOUBLE))
             * (CAST(sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT))
                     AS DOUBLE) / CAST(count(*) AS DOUBLE)),
           0.0)) AS std_c
  FROM events GROUP BY event_type
)
SELECT event_id, event_type, ts, value,
       (CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) - mean_c) / std_c
         AS zscore
FROM events JOIN stats USING (event_type)
WHERE std_c > 0
  AND abs((CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) - mean_c)
          / std_c) > 3.0
"""


def _q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling correlation (plans/analytics.py::rolling_correlation)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import rolling_correlation

    return rolling_correlation(load_table(spark, sf_dir, "events"))


_ROLLING_CORR_ORACLE = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         coalesce(sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(CAST(round(value * 100) AS BIGINT)
                                AS HUGEINT) END), 0) AS a,
         coalesce(sum(CASE WHEN event_type = 'view'
                      THEN CAST(CAST(round(value * 100) AS BIGINT)
                                AS HUGEINT) END), 0) AS b
  FROM events
  WHERE event_type IN ('purchase', 'view')
  GROUP BY 1
), grid AS (
  SELECT unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS day
  FROM daily
), dense AS (
  SELECT grid.day, coalesce(daily.a, 0) AS a, coalesce(daily.b, 0) AS b
  FROM grid LEFT JOIN daily ON daily.day = grid.day
), rolled AS (
  SELECT day,
    count(*) OVER w AS n,
    sum(a) OVER w AS sa, sum(b) OVER w AS sb,
    sum(a * b) OVER w AS sab,
    sum(a * a) OVER w AS saa, sum(b * b) OVER w AS sbb
  FROM dense
  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT day, CAST(n AS BIGINT) AS n_days,
  CASE WHEN (CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
             - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) > 0
        AND (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
             - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) > 0
       THEN (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
             - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
            / sqrt((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                    - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                   * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                      - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))
       ELSE NULL END AS corr
FROM rolled
"""


def _q_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency binning (plans/analytics.py::quantile_bins)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import quantile_bins

    return quantile_bins(load_table(spark, sf_dir, "events"))


_QUANTILE_BINS_ORACLE = """
WITH binned AS (
  SELECT event_type, value,
         ntile(10) OVER (PARTITION BY event_type
                         ORDER BY value, event_id) AS bin
  -- NULL measures excluded (quantile_bins' explicit rule): left in,
  -- Spark sorts them FIRST and DuckDB LAST — every boundary shifts
  FROM events WHERE value IS NOT NULL
)
SELECT event_type, bin, count(*) AS n_events,
       min(value) AS lo, max(value) AS hi
FROM binned GROUP BY 1, 2
"""


def _q_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (plans/analytics.py::local_supplier_revenue)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import local_supplier_revenue

    return local_supplier_revenue(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def _local_supplier_oracle() -> str:
    ep = _OLAP_CENTS.format(c="l_extendedprice")
    d = _OLAP_CENTS.format(c="l_discount")
    return f"""
SELECT n_name,
       CAST(sum(CAST({ep} * (100 - {d}) AS HUGEINT)) AS DOUBLE) / 10000.0
         AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def _q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profile (plans/quality.py::profile_table)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans import profile_table

    return profile_table(load_table(spark, sf_dir, "events"))


def _profile_oracle() -> str:
    # mirror of profile_table's numeric handling per events column
    num = {
        "event_id": "CAST(event_id AS BIGINT) * 100",
        "ts": "CAST(NULL AS BIGINT)",
        "user_id": "CAST(user_id AS BIGINT) * 100",
        "event_type": "CAST(NULL AS BIGINT)",
        "value": "CAST(round(value * 100) AS BIGINT)",
        "props": "CAST(NULL AS BIGINT)",
    }
    parts = [
        f"""
SELECT '{c}' AS "column", count(*) AS n_rows,
       CAST(coalesce(sum(CAST({c} IS NULL AS BIGINT)), 0) AS BIGINT) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct,
       CAST(min({e}) AS DOUBLE) / 100.0 AS min_value,
       CAST(max({e}) AS DOUBLE) / 100.0 AS max_value
FROM events"""
        for c, e in num.items()
    ]
    return "\nUNION ALL\n".join(parts)


def _q_dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance near-dup verify
    (operators/dedup.py::dedup_edit_distance)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.dedup import dedup_edit_distance

    return dedup_edit_distance(load_table(spark, sf_dir, "documents"))


_EDIT_DISTANCE_ORACLE = """
WITH base AS (
  SELECT doc_id AS id,
         substring(regexp_replace(text, '[^ -~]', '?', 'g'), 1, 400) AS t,
         substring(regexp_replace(text, '[^ -~]', '?', 'g'), 1, 32) AS blk
  FROM documents
  WHERE length(regexp_replace(text, '[^ -~]', '?', 'g')) > 0
), counts AS (
  SELECT blk FROM base GROUP BY blk HAVING count(*) <= 64
), small AS (
  SELECT base.* FROM base JOIN counts USING (blk)
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(levenshtein(a.t, b.t) AS BIGINT) AS edit_distance,
       1.0 - CAST(levenshtein(a.t, b.t) AS DOUBLE)
             / CAST(greatest(length(a.t), length(b.t)) AS DOUBLE)
         AS similarity
FROM small a JOIN small b ON a.blk = b.blk AND a.id < b.id
WHERE levenshtein(a.t, b.t) <= 80
"""


# ------------------------------------- corpus statistics (round 3)


def _q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top adjacent-bigram collocations by PMI ratio
    (operators/tfidf.py::pmi_collocations)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.tfidf import pmi_collocations

    return pmi_collocations(
        load_table(spark, sf_dir, "documents"), k=20, min_count=5
    )


_PMI_ORACLE = """
WITH t AS (
  SELECT list_transform(
           list_filter(regexp_split_to_array(trim(text), '\\s+'),
                       x -> x != ''), x -> lower(x)) AS toks
  FROM documents
), bg AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2
  FROM t, unnest(generate_series(1, len(toks) - 1)) AS g(i)
  WHERE len(toks) >= 2
), pair_counts AS (
  SELECT w1, w2, count(*) AS n_ab FROM bg GROUP BY 1, 2
  HAVING count(*) >= 5
), uni AS (
  SELECT unnest(toks) AS term FROM t
), uni_counts AS (
  SELECT term, count(*) AS n FROM uni GROUP BY 1
), total AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_tokens_total FROM uni_counts
)
SELECT w1, w2, n_ab, a.n AS n_a, b.n AS n_b,
       (CAST(n_ab AS DOUBLE) * CAST(n_tokens_total AS DOUBLE))
       / (CAST(a.n AS DOUBLE) * CAST(b.n AS DOUBLE)) AS pmi_ratio
FROM pair_counts
JOIN uni_counts a ON a.term = w1
JOIN uni_counts b ON b.term = w2
CROSS JOIN total
ORDER BY pmi_ratio DESC, w1, w2
LIMIT 20
"""


def _q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source OOV rate against the top-1000 vocabulary
    (operators/tfidf.py::vocab_coverage)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.tfidf import vocab_coverage

    return vocab_coverage(
        load_table(spark, sf_dir, "documents"), vocab_size=1000, min_count=2
    )


_VOCAB_COVERAGE_ORACLE = """
WITH toks AS (
  SELECT source,
         lower(unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                  t -> t != ''))) AS term
  FROM documents
), counts AS (
  SELECT term, count(*) AS n_occurrences
  FROM toks GROUP BY 1 HAVING count(*) >= 2
), vocab AS (
  SELECT term FROM counts ORDER BY n_occurrences DESC, term LIMIT 1000
)
SELECT source, count(*) AS n_tokens,
       count(*) FILTER (vocab.term IS NULL) AS n_oov,
       CAST(count(*) FILTER (vocab.term IS NULL) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS oov_rate
FROM toks LEFT JOIN vocab ON toks.term = vocab.term
GROUP BY source
"""


def _q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure-scan revenue-change aggregate with exact
    basis-point discount banding
    (plans/analytics.py::forecast_revenue_change)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.analytics import (
        forecast_revenue_change,
    )

    return forecast_revenue_change(load_table(spark, sf_dir, "lineitem"))


_FORECAST_REVENUE_ORACLE = """
SELECT CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(round(l_discount * 10000) AS BIGINT)
                     AS HUGEINT)) AS DOUBLE) / 1000000.0
         AS revenue_increase,
       count(*) AS n_items
FROM lineitem
WHERE year(l_shipdate) = 1994
  AND CAST(round(l_discount * 10000) AS BIGINT) BETWEEN 500 AND 700
  AND l_quantity < 24
"""


def _q_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape decorrelated: sole-late-supplier counts per
    supplier (plans/analytics.py::sole_late_supplier)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.analytics import sole_late_supplier

    return sole_late_supplier(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


_SOLE_LATE_ORACLE = """
WITH lines AS (
  SELECT l_orderkey, l_suppkey,
         date_diff('day', CAST(o_orderdate AS DATE),
                   CAST(l_shipdate AS DATE)) > 90 AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN is_late THEN l_suppkey END)
           AS n_late_supp
  FROM lines GROUP BY 1
), culprits AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lines l JOIN per_order p ON l.l_orderkey = p.l_orderkey
  WHERE l.is_late AND p.n_supp >= 2 AND p.n_late_supp = 1
)
SELECT s_name, n_name, count(*) AS numwait
FROM culprits
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY s_name, n_name
ORDER BY numwait DESC, s_name
LIMIT 25
"""


def _q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top unshipped orders by revenue for one market
    segment (plans/analytics.py::shipping_priority)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.analytics import shipping_priority

    return shipping_priority(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )


_SHIPPING_PRIORITY_ORACLE = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT))
                     AS HUGEINT)) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-30'
  AND l_shipdate > TIMESTAMP '1998-06-30'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def _q_decay_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted per-user features with exact dyadic decay
    (plans/analytics.py::time_decay_features)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.analytics import time_decay_features

    return time_decay_features(load_table(spark, sf_dir, "events"))


# weights are powers of two and sums run in HUGEINT, so the single
# final cast+divide is the only floating-point op — bit-equal across
# engines (same discipline as the interpolation oracle).
_DECAY_ORACLE = """
WITH anchor AS (
  SELECT max(CAST(ts AS DATE)) AS a FROM events
), w AS (
  SELECT user_id,
         CAST(floor(date_diff('day', CAST(ts AS DATE), a) / 7.0) AS INTEGER)
           AS u,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events CROSS JOIN anchor
)
SELECT user_id, count(*) AS n_events,
       CAST(sum(CAST(cents AS HUGEINT) * (CAST(1 AS BIGINT) << (20 - u)))
            AS DOUBLE) / 104857600.0 AS decayed_value,
       CAST(sum(CAST((CAST(1 AS BIGINT) << (20 - u)) AS HUGEINT))
            AS DOUBLE) / 1048576.0 AS decayed_count
FROM w WHERE u BETWEEN 0 AND 20
GROUP BY user_id
"""


def _q_validate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint suite over orders
    (plans/quality.py::validate_table): not-null, range, accepted-set
    and PK rules share ONE scan; the FK rule is a key-only anti join
    against customer."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.quality import validate_table

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return validate_table(
        orders,
        not_null=["o_orderkey", "o_orderdate"],
        ranges={"o_totalprice": (0.01, 600000.0)},
        accepted={"o_orderstatus": ["O", "F", "P"]},
        unique=[["o_orderkey"]],
        foreign_keys=[("o_custkey", customer, "c_custkey")],
    )


_VALIDATE_ORACLE = """
SELECT 'not_null:o_orderkey' AS rule,
       CAST(coalesce(sum(CASE WHEN o_orderkey IS NULL THEN 1 END), 0)
            AS BIGINT) AS n_violations FROM orders
UNION ALL
SELECT 'not_null:o_orderdate',
       CAST(coalesce(sum(CASE WHEN o_orderdate IS NULL THEN 1 END), 0)
            AS BIGINT) FROM orders
UNION ALL
SELECT 'range:o_totalprice',
       CAST(coalesce(sum(CASE WHEN o_totalprice IS NULL
                          OR o_totalprice < 0.01
                          OR o_totalprice > 600000.0 THEN 1 END), 0)
            AS BIGINT) FROM orders
UNION ALL
SELECT 'accepted:o_orderstatus',
       CAST(coalesce(sum(CASE WHEN o_orderstatus IS NULL
                          OR o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 END),
                     0) AS BIGINT) FROM orders
UNION ALL
SELECT 'unique:o_orderkey',
       -- SQL-unique semantics (mirrors validate_table): NULL keys
       -- never conflict, so the excess is measured against the
       -- NON-NULL row count — count(*) would report every null-keyed
       -- row as a phantom violation
       CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT)
FROM orders
UNION ALL
SELECT 'foreign_key:o_custkey',
       CAST(count(*) AS BIGINT)
FROM orders o WHERE o.o_custkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey)
"""
# (FK oracle uses NOT EXISTS, not NOT IN: a NULL ref key would make
# NOT IN return zero rows while the Spark anti join still counts
# orphans — same semantics both sides even on dirty reference data.)


# ------------------------------------- training-data sharding (round 3)

# DuckDB spelling of the deterministic shuffle hash h64('seed:' || key)
_SHUF_H = _H64.format(
    x="'{seed}:' || CAST(doc_id AS VARCHAR)"
)

# DuckDB spelling of the whitespace token count shared with text_stats
_DUCK_NTOK = (
    "CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),"
    " t -> t != '')) AS BIGINT)"
)


def _q_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into ordered shards
    (operators/training_data.py::global_shuffle), summarized per
    shard with a position-weighted checksum so the oracle verifies
    the exact within-shard ordering, not just membership."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.training_data import global_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    shuffled = global_shuffle(docs, key_col="doc_id", n_shards=8)
    return shuffled.groupBy(F.col("shard").cast("long").alias("shard")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("pos") * F.col("doc_id")).alias("pos_checksum"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


_GLOBAL_SHUFFLE_ORACLE = f"""
WITH h AS (
  SELECT doc_id, {_SHUF_H.format(seed='shuffle-v1')} AS h
  FROM documents
), s AS (
  SELECT doc_id, h % 8 AS shard,
         row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS pos
  FROM h
)
SELECT shard, count(*) AS n_docs,
       CAST(sum(pos * doc_id) AS BIGINT) AS pos_checksum,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM s GROUP BY shard
"""


def _q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap via deterministic hash rank
    (operators/training_data.py::cap_per_source). Runs the TWO-PHASE
    skew-guarded path (presort_cap) while the oracle is the naive
    one-phase windowed rank — the gate proves the optimization is
    semantics-preserving."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.training_data import cap_per_source

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    # presort_cap = 4*cap per cap_per_source's equivalence analysis; at
    # 2*cap the prefilter-survivor shortfall probability is non-negligible
    # and the gate's equality with the one-phase oracle would depend on
    # the particular testdata hashes.
    kept = cap_per_source(docs, cap=10, presort_cap=40)
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum("doc_id").alias("kept_sum"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


_SOURCE_CAP_ORACLE = f"""
WITH h AS (
  -- NULL ids excluded: no deterministic hash rank (see cap_per_source)
  SELECT doc_id, source, {_SHUF_H.format(seed='cap-v1')} AS h
  FROM documents WHERE doc_id IS NOT NULL
), r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
  FROM h
)
SELECT source, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS kept_sum,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM r WHERE rk <= 10 GROUP BY source
"""


def _q_pack_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing of the shuffled corpus
    (operators/training_data.py::pack_context_windows): documents
    concatenated in shard order, cut every 512 tokens, each doc
    assigned to the window its first token lands in."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.training_data import (
        pack_context_windows,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    packed = pack_context_windows(docs, n_shards=8, budget=512)
    return packed.withColumn("shard", F.col("shard").cast("long"))


_PACK_WINDOWS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_NTOK} AS n_tokens,
         {_SHUF_H.format(seed='shuffle-v1')} AS h
  FROM documents
), s AS (
  SELECT doc_id, n_tokens, h % 8 AS shard,
         row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS pos
  FROM toks
), c AS (
  SELECT shard, pos, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY pos)
              AS BIGINT) AS cum
  FROM s
)
SELECT shard, CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS win,
       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS win_tokens,
       min(pos) AS first_pos, max(pos) AS last_pos
FROM c GROUP BY 1, 2
"""


def _q_pack_windows_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fidelity packing: the SAME packing operator driven by
    a precomputed SUBWORD count column (token_count_col) instead of
    whitespace tokens — here the BPE-ish n_tokens_bpe from
    with_text_stats plays the offline-tokenizer column; cut points
    follow it exactly (operators/training_data.py::
    pack_context_windows, token_count_col=)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.functions import with_text_stats
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.training_data import (
        pack_context_windows,
    )

    docs = with_text_stats(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ).select("doc_id", "text", "n_tokens_bpe")
    packed = pack_context_windows(
        docs, n_shards=8, budget=512, token_count_col="n_tokens_bpe"
    )
    return packed.withColumn("shard", F.col("shard").cast("long"))


#: DuckDB spelling of the BPE-ish subword count (with_text_stats)
_DUCK_NBPE = (
    "CAST(len(regexp_extract_all(text,"
    " '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)"
)

_PACK_WINDOWS_BPE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, coalesce({_DUCK_NBPE}, 0) AS n_tokens,
         {_SHUF_H.format(seed='shuffle-v1')} AS h
  FROM documents
), s AS (
  SELECT doc_id, n_tokens, h % 8 AS shard,
         row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS pos
  FROM toks
), c AS (
  SELECT shard, pos, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY pos)
              AS BIGINT) AS cum
  FROM s
)
SELECT shard, CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS win,
       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS win_tokens,
       min(pos) AS first_pos, max(pos) AS last_pos
FROM c GROUP BY 1, 2
"""


def _q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-subwords encoding under the corpus-trained BPE table
    (operators/tfidf.py::bpe_encode): learn k merges, re-tokenize
    scan-side, explode subwords, aggregate per (doc, subword). The
    oracle joins each word occurrence to the merge chain's final
    symbolization and splits it — the tokenizer and the chain can
    never disagree because both are the same k replaces."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.tfidf import (
        bpe_encode,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = [(l, r) for _, l, r, _ in _bpe_merges(spark, sf_dir)]
    return bpe_encode(docs, merges)


def _bpe_encode_oracle(k: int) -> str:
    return _bpe_chain_sql(k) + f"""
, occ AS (
  SELECT doc_id, lower(t.tok) AS word
  FROM documents,
       unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                          t -> t != '')) AS t(tok)
), symrows AS (
  -- inner join: words carrying the SOH/STX framing chars are outside
  -- the chain's word table and outside the Spark tokenizer alike
  SELECT o.doc_id,
         unnest(string_split(s.seq[2:length(s.seq) - 1],
                             chr(2) || chr(1))) AS subword
  FROM occ o JOIN s{k} s ON o.word = s.word
)
SELECT doc_id, subword, count(*) AS n_occurrences
FROM symrows GROUP BY 1, 2
"""


def _q_pack_windows_real_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end tokenizer-fidelity packing with a TRAINED subword
    vocabulary: learn the k-merge BPE table from the corpus itself
    (operators/tfidf.py::learn_bpe_merges), re-tokenize every document
    under it scan-side (bpe_token_counts — the O(k) merge table rides
    as a replace chain, no UDF), and pack on the REAL subword counts
    (pack_context_windows, token_count_col=). The oracle replays the
    identical chain: the shared k-stage merge CTEs, the per-word final
    symbolization, per-doc occurrence sums, then the standard packing
    SQL. NULL-id documents keep their (NULL-grouped) count and a NULL
    shard hash, exactly as t_pack_windows_bpe's convention."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.tfidf import (
        bpe_token_counts,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.training_data import (
        pack_context_windows,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = [(l, r) for _, l, r, _ in _bpe_merges(spark, sf_dir)]
    counts = bpe_token_counts(docs, merges)
    packed = pack_context_windows(
        counts, n_shards=8, budget=512, token_count_col="n_bpe_tokens"
    )
    return packed.withColumn("shard", F.col("shard").cast("long"))


def _pack_real_bpe_oracle(k: int) -> str:
    """The packing oracle on trained-BPE counts: the shared merge
    chain (carrying word), per-word symbol counts from the final
    symbolization s{k} (one STX per symbol), occurrence-level doc
    sums with the explode_outer [NULL]-padding convention, then the
    same packing SQL as _PACK_WINDOWS_BPE_ORACLE."""
    shuf = _SHUF_H.format(seed="shuffle-v1")
    return _bpe_chain_sql(k) + f"""
, wordcnt AS MATERIALIZED (
  SELECT word, length(seq) - length(replace(seq, chr(2), '')) AS n_syms
  FROM s{k}
), occ AS (
  -- explode_outer: a NULL/empty token list still yields one [NULL]
  -- row so every document reaches the per-doc aggregate
  SELECT doc_id,
         unnest(coalesce(
           nullif(list_transform(
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         t -> t != ''), t -> lower(t)), []),
           [NULL])) AS word
  FROM documents
), doccnt AS MATERIALIZED (
  -- words outside wordcnt (NULL padding, control-char words) count 0
  SELECT o.doc_id,
         CAST(coalesce(SUM(coalesce(w.n_syms, 0)), 0) AS BIGINT)
           AS n_tokens
  FROM occ o LEFT JOIN wordcnt w ON o.word = w.word
  GROUP BY o.doc_id
), toksr AS (
  SELECT doc_id, n_tokens, {shuf} AS h FROM doccnt
), sp AS (
  SELECT doc_id, n_tokens, h % 8 AS shard,
         row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS pos
  FROM toksr
), cp AS (
  SELECT shard, pos, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY pos)
              AS BIGINT) AS cum
  FROM sp
)
SELECT shard, CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS win,
       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS win_tokens,
       min(pos) AS first_pos, max(pos) AS last_pos
FROM cp GROUP BY 1, 2
"""


def _q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate overlap matrix
    (operators/dedup.py::source_overlap_matrix). The testdata's texts
    are source-unique, so the query mirrors every 3rd document under a
    synthetic 'mirror' source — giving every real source a known
    overlap with the mirror and zero with each other."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.dedup import (
        source_overlap_matrix,
    )

    docs = load_table(spark, sf_dir, "documents").select("text", "source")
    mirrored = load_table(spark, sf_dir, "documents").where(
        "doc_id % 3 = 0"
    ).select("text", F.lit("mirror").alias("source"))
    return source_overlap_matrix(docs.unionByName(mirrored))


_SOURCE_OVERLAP_ORACLE = f"""
WITH aug AS (
  SELECT text, source FROM documents
  UNION ALL
  SELECT text, 'mirror' AS source FROM documents WHERE doc_id % 3 = 0
), hs AS (
  SELECT DISTINCT {_H64.format(x="text")} AS th, source FROM aug
)
SELECT a.source AS source_a, b.source AS source_b,
       count(*) AS n_shared
FROM hs a JOIN hs b ON a.th = b.th AND a.source < b.source
GROUP BY 1, 2
"""


def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row Bernoulli importance sampling by document length
    (operators/sampling.py::weighted_sample): keep probability
    ``min(n_chars/500, 1)`` — longer documents kept more often.
    Summarized per source so the gate hashes counts and id-sums, not
    60k membership rows."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.sampling import (
        weighted_sample,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    w = F.least(F.col("n_chars") / F.lit(500.0), F.lit(1.0))
    kept = weighted_sample(docs, w, id_col="doc_id")
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum("doc_id").alias("kept_sum"),
    )


_WEIGHTED_SAMPLE_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, source,
         {_H64.format(x="'wsample:' || CAST(doc_id AS VARCHAR)")}
           % 10000 AS bucket,
         CAST(least(greatest(
           round(least(n_chars / 500.0, 1.0) * 10000), 0), 10000) AS BIGINT)
           AS threshold
  FROM documents
)
SELECT source, count(*) AS n_kept,
       CAST(sum(doc_id) AS BIGINT) AS kept_sum
FROM scored WHERE bucket < threshold
GROUP BY source
"""


def _q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget source mixing (operators/sampling.py::
    token_budget_mix): select docs so each weighted source contributes
    just-under-plus-one-doc of its share of a total TOKEN budget — the
    unit pretraining mixes are written in. Budget scales with the
    corpus (2 tokens/doc x footer count) so the cut discriminates at
    any sf; weights cover four sources, the rest contribute nothing."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import token_budget_mix

    docs = load_table(spark, sf_dir, "documents")
    return token_budget_mix(
        docs,
        weights={"src0": 4000, "src1": 3000, "src2": 2000, "src3": 1000},
        budget_tokens=2 * _doc_count(sf_dir),
    ).select("doc_id", "source", "n_tokens", "cum_tokens")


_TOKEN_BUDGET_ORACLE = f"""
WITH params AS (
  SELECT 2 * count(*) AS budget FROM documents
), t AS (
  SELECT doc_id, source, {_DUCK_NTOK} AS n_tokens,
         {_SHUF_H.format(seed="budget-v1")} AS h
  FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL AND source IS NOT NULL
), w AS (
  SELECT * FROM (VALUES ('src0', 4000), ('src1', 3000),
                        ('src2', 2000), ('src3', 1000)) v(source, bp)
), c AS (
  SELECT t.doc_id, t.source, t.n_tokens,
         sum(t.n_tokens) OVER (PARTITION BY t.source ORDER BY t.h, t.doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum_tokens,
         CAST((SELECT budget FROM params) * w.bp // 10000 AS BIGINT)
           AS target
  FROM t JOIN w ON t.source = w.source
)
SELECT doc_id, source, n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM c WHERE cum_tokens - n_tokens < target
"""


def _q_epoch_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-aware token-budget mixing (operators/sampling.py::
    token_budget_mix_epochs, Muennighoff 2023 data-constrained
    recipe): sources whose weighted target exceeds their corpus repeat
    for up to 4 deterministic-reshuffled epochs. Weights are tuned so
    the gate exercises all three regimes at any sf (tokens/doc is
    scale-free): src0 hits the max_epochs cap and exhausts below
    target, src1 runs 2 epochs with a partial second, src2 stays
    single-epoch partial."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        token_budget_mix_epochs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return token_budget_mix_epochs(
        docs,
        weights={"src0": 6000, "src1": 2000, "src2": 500},
        budget_tokens=20 * _doc_count(sf_dir),
        max_epochs=4,
    ).select("doc_id", "source", "epoch", "n_tokens", "cum_tokens", "n_epochs")


_EPOCH_H = _H64.format(
    x="'budget-v1:e' || CAST(epoch AS VARCHAR) || ':'"
    " || CAST(doc_id AS VARCHAR)"
)

_EPOCH_MIX_ORACLE = f"""
WITH params AS (
  SELECT 20 * count(*) AS budget FROM documents
), t AS (
  SELECT doc_id, source, {_DUCK_NTOK} AS n_tokens
  FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL AND source IS NOT NULL
), w AS (
  SELECT * FROM (VALUES ('src0', 6000), ('src1', 2000),
                        ('src2', 500)) v(source, bp)
), base AS (
  SELECT t.doc_id, t.source, t.n_tokens,
         CAST((SELECT budget FROM params) * w.bp // 10000 AS BIGINT)
           AS target
  FROM t JOIN w ON t.source = w.source
), tot AS (
  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS corpus
  FROM base GROUP BY source
), ep AS (
  SELECT b.*, CAST(least(4, greatest(1,
           CASE WHEN tt.corpus > 0
                THEN (b.target + tt.corpus - 1) // tt.corpus
                ELSE 1 END)) AS INTEGER) AS n_epochs
  FROM base b JOIN tot tt ON b.source = tt.source
), rep AS (
  SELECT ep.*, CAST(e.epoch AS INTEGER) AS epoch
  FROM ep, unnest(range(0, ep.n_epochs)) AS e(epoch)
), hashed AS (
  SELECT rep.*, {_EPOCH_H} AS h FROM rep
), c AS (
  SELECT doc_id, source, epoch, n_tokens, n_epochs, target,
         sum(n_tokens) OVER (PARTITION BY source
                             ORDER BY epoch, h, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM hashed
)
SELECT doc_id, source, epoch, n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens, n_epochs
FROM c WHERE cum_tokens - n_tokens < target
"""


def _q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (operators/sampling.py::
    temperature_mixture, the XLM-R/Pile recipe): per-source keep rates
    ∝ n_s^tau normalized to a target output fraction, membership by
    the md5 id coin. tau=0.5 flattens hard enough that the small
    sources keep visibly more than the natural share. Summarized per
    source (counts + id-sums) like t_weighted_sample."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.sampling import (
        temperature_mixture,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    kept = temperature_mixture(
        docs, tau=0.5, strata_col="source", id_col="doc_id",
        target_fraction=0.5,
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum("doc_id").alias("kept_sum"),
    )


# op-order mirror of temperature_mixture: pow quantized to 1e-6 BEFORE
# the cross-source sum (raw-double sums are addition-order-dependent),
# then (tf * ntot) * (qpow/z) / n, * 10000, half-up round, clamp.
_TEMPERATURE_MIX_ORACLE = f"""
WITH tcounts AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(round(pow(CAST(count(*) AS DOUBLE), 0.5) * 1000000)
              AS BIGINT) AS qpow
  FROM documents WHERE source IS NOT NULL GROUP BY source
), ttots AS (
  SELECT CAST(sum(n) AS BIGINT) AS ntot, CAST(sum(qpow) AS BIGINT) AS z
  FROM tcounts
), trates AS (
  SELECT c.source,
         least(10000, greatest(0,
           CAST(round(((0.5 * CAST(t.ntot AS DOUBLE))
                       * (CAST(c.qpow AS DOUBLE) / CAST(t.z AS DOUBLE))
                       / CAST(c.n AS DOUBLE)) * 10000) AS BIGINT))) AS qrate
  FROM tcounts c CROSS JOIN ttots t
), tkept AS (
  SELECT d.doc_id, d.source
  FROM documents d JOIN trates r ON d.source = r.source
  WHERE {_H64.format(x="'tmix:' || CAST(doc_id AS VARCHAR)")} % 10000
        < r.qrate
)
SELECT source, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS kept_sum
FROM tkept GROUP BY source
"""


def _q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 VARIANT semi-structured path
    (plans/relational.py::variant_props_histogram): parse_json once,
    typed variant_get extraction, histogram on the derived bucket."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.relational import (
        variant_props_histogram,
    )

    return variant_props_histogram(load_table(spark, sf_dir, "events"))


_VARIANT_PROPS_ORACLE = """
WITH x AS (
  SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events
)
-- ((k % 10) + 10) % 10: DuckDB's % keeps the sign of k while Spark's
-- pmod is always non-negative; the double-mod makes the twin exact on
-- negative payloads too
SELECT ((k % 10) + 10) % 10 AS k_mod, count(*) AS n_events,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k, max(k) AS max_k
FROM x GROUP BY 1
"""


def _q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style overlapping chunker
    (operators/training_data.py::chunk_documents), summarized per doc
    (count + order-independent XOR of chunk hashes + total chunk
    chars) so the gate hashes one row per document."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.training_data import (
        chunk_documents,
    )

    chunks = chunk_documents(
        load_table(spark, sf_dir, "documents"), chunk_chars=256, overlap=64
    )
    return chunks.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.expr("bit_xor(chunk_hash)").alias("chunks_xor"),
        F.sum("chunk_len").alias("total_chunk_chars"),
    )


_CHUNK_DOCS_ORACLE = f"""
WITH c AS (
  SELECT doc_id,
         length(substring(text, t.s, 256)) AS chunk_len,
         {_H64.format(x="substring(text, t.s, 256)")} AS chunk_hash
  FROM documents,
       -- starts stop at length - overlap (64): a start inside the
       -- final overlap region would chunk zero new characters
       LATERAL unnest(range(1, greatest(length(text) - 64, 1) + 1, 192))
         AS t(s)
  -- NULL-text docs excluded, matching chunk_documents' null routing
  WHERE text IS NOT NULL
)
SELECT doc_id, count(*) AS n_chunks,
       bit_xor(chunk_hash) AS chunks_xor,
       CAST(sum(chunk_len) AS BIGINT) AS total_chunk_chars
FROM c GROUP BY doc_id
"""


def _q_token_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-of-counts Zipf spectrum
    (operators/tfidf.py::token_frequency_spectrum)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.tfidf import (
        token_frequency_spectrum,
    )

    return token_frequency_spectrum(load_table(spark, sf_dir, "documents"))


_TOKEN_SPECTRUM_ORACLE = r"""
WITH toks AS (
  SELECT lower(unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                  t -> t != ''))) AS term
  FROM documents
), tc AS (
  SELECT term, count(*) AS freq FROM toks GROUP BY term
)
SELECT freq, count(*) AS n_terms FROM tc GROUP BY freq
"""


def _q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level boilerplate removal (operators/training_data.py::
    remove_boilerplate_lines, the CCNet/RefinedWeb cleanup pass):
    lines whose trimmed form appears in >= max(2, 5% of docs) distinct
    documents are stripped; survivors reassemble in original order.
    The clean corpus is single-line with no sharing (pins the
    reassembly identity); the dirty corpus plants duplicate texts that
    actually get removed."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        remove_boilerplate_lines,
    )

    return remove_boilerplate_lines(load_table(spark, sf_dir, "documents"))


_BOILERPLATE_ORACLE = f"""
WITH bsplit AS (
  SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents
), bnest AS (
  SELECT doc_id,
         unnest([{{'pos': i - 1, 'ln': ls[i]}}
                 for i in range(1, len(ls) + 1)]) AS s
  FROM bsplit
), blines AS (
  SELECT doc_id, s.pos AS pos, s.ln AS ln,
         {_H64.format(x="trim(s.ln)")} AS lh
  FROM bnest
), bl AS (
  SELECT lh FROM blines WHERE trim(ln) != ''
  GROUP BY lh
  HAVING count(DISTINCT doc_id) * 10000
           >= 500 * (SELECT count(*) FROM documents)
     AND count(DISTINCT doc_id) >= 2
), bkept AS (
  SELECT l.* FROM blines l LEFT JOIN bl ON l.lh = bl.lh
  WHERE bl.lh IS NULL
), bagg AS (
  SELECT doc_id,
         -- ORDER BY pos, ln: the ln tie-break matches the engine's
         -- array_sort over struct(pos, ln) when duplicate doc_ids
         -- carry different texts (equal-pos collisions per group)
         string_agg(ln, chr(10) ORDER BY pos, ln) AS text_clean,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM bkept GROUP BY doc_id
), btot AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines
  FROM blines GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN t.n_lines IS NOT NULL
            THEN COALESCE(a.text_clean, '') END AS text_clean,
       COALESCE(t.n_lines, 0) AS n_lines,
       COALESCE(t.n_lines, 0) - COALESCE(a.n_kept, 0) AS n_removed
FROM documents d
LEFT JOIN btot t ON d.doc_id = t.doc_id
LEFT JOIN bagg a ON d.doc_id = a.doc_id
"""


def _q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality score (operators/lm.py::lm_transition_scores,
    the CCNet-style filter), self-trained on the documents corpus.
    Engine-exact by construction: integer counts, one correctly-
    rounded division/multiply/round per transition (no ln — see the
    module docstring's determinism contract)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        lm_transition_scores,
    )

    return lm_transition_scores(load_table(spark, sf_dir, "documents"))


# bigram key = w1 || ' ' || w2 is injective (whitespace tokenizer);
# one division -> one multiply -> half-up round mirrors the Spark
# expression order exactly (every step IEEE-correctly-rounded).
# Parameterized by source table/column so the composed quality-filter
# oracle can run it over the boilerplate-cleaned corpus.
def _lm_score_sql(src: str = "documents", text_col: str = "text") -> str:
    return rf"""
WITH tk AS (
  SELECT doc_id,
         [lower(t) for t in
          list_filter(regexp_split_to_array(trim({text_col}), '\s+'),
                      t -> t != '')] AS tk
  FROM {src}
), bg AS (
  SELECT doc_id,
         unnest([tk[i] || ' ' || tk[i + 1]
                 for i in range(1, len(tk))]) AS big
  FROM tk WHERE tk IS NOT NULL AND len(tk) >= 2
), big_counts AS (
  SELECT big, count(*) AS cb FROM bg GROUP BY big
), prev_counts AS (
  SELECT split_part(big, ' ', 1) AS w1, CAST(sum(cb) AS BIGINT) AS cp
  FROM big_counts GROUP BY 1
), vocab AS (
  SELECT count(DISTINCT t) AS v
  FROM (SELECT unnest(tk) AS t FROM tk)
), scored AS (
  SELECT bg.doc_id,
         CAST(round((CAST(COALESCE(bc.cb, 0) + 1 AS DOUBLE)
                     / CAST(COALESCE(pc.cp, 0) + greatest(vocab.v, 1)
                            AS DOUBLE))
                    * 1000000000.0) AS BIGINT) AS qp
  FROM bg
  LEFT JOIN big_counts bc ON bg.big = bc.big
  LEFT JOIN prev_counts pc ON split_part(bg.big, ' ', 1) = pc.w1
  CROSS JOIN vocab
), agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(qp) AS BIGINT) AS lm_prob_sum
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_bigrams, 0) AS n_bigrams,
       COALESCE(a.lm_prob_sum, 0) AS lm_prob_sum,
       CASE WHEN a.n_bigrams > 0
            THEN (CAST(a.lm_prob_sum AS DOUBLE)
                  / CAST(a.n_bigrams AS DOUBLE)) / 1000000000.0
            ELSE NULL END AS lm_score
FROM {src} d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


_LM_SCORE_ORACLE = _lm_score_sql()

_CURATE_SHARDS = 8


def _q_stream_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STANDING curation (streaming/curate.py::run_curate_stream — the
    production composition): documents replay as two micro-batches;
    each batch is LM-scored against the persisted self-trained model,
    cut at the precomputed P20 threshold (the quality_filter exact
    PERCENTILE_DISC convention, computed offline here exactly like the
    model), exact-deduped against the persistent hash index of every
    previously KEPT document, and assigned its deterministic training
    shard. Scoring is stateless, the cutoff a value comparison, the
    shard a pure id hash, dedup keeps first arrival — so the union of
    per-batch survivors equals the one-shot score→cutoff→min-id-dedup
    →shard composition the oracle spells."""
    return _curate_replay(spark, sf_dir, near=False)


def _q_stream_curate_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STANDING curation with the FUZZY near-dup stage (streaming/
    curate.py::run_curate_stream with near_index_dir — the r12
    verdict's top task): between the quality cut and the exact keep
    index, each batch is near-deduped against a persistent MinHash LSH
    band index of every gate-passing document seen so far — a doc
    drops when any of its bands is held by a smaller-id gate-passer
    (the min-id band-collision rule; dropped docs' bands still index
    because near-duplication is not transitive). Monotone in arrival
    order, so the union of per-batch survivors under the id-ordered
    replay equals the one-shot score→cut→band-near-dedup→exact-dedup
    →shard composition the oracle spells."""
    return _curate_replay(spark, sf_dir, near=True)


def _q_stream_curate_clf_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL production curation composition as one standing job
    (run_curate_stream(scorer='linear', near_index_dir=...)): each
    micro-batch is gated by the SUPERVISED quality classifier at its
    trained decision boundary (scan-side exact-int64 margin — no model
    table, the weights ride the plan), near-deduped against the
    persistent LSH band index of every gate-passer, exact-deduped
    against the keep index, and sharded. Union-of-batches == one-shot
    by the same monotonicity arguments as s_stream_curate_near; the
    oracle swaps the LM-score CTEs for the classifier margin CTE."""
    return _curate_replay(spark, sf_dir, near=True, scorer="linear")


def _curate_replay(
    spark: SparkSession, sf_dir: str, near: bool, scorer: str = "lm"
) -> DataFrame:
    import os
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.lm import (
        lm_transition_scores,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        run_curate_stream,
        write_lm_model,
    )
    from __spark_entry__ import _set_stream_partitions

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = sorted(x.as_py() for x in t.column("doc_id") if x.as_py() is not None)
    mid = ids[len(ids) // 2]
    stream_dir = tempfile.mkdtemp(prefix="scur_src_")
    work = tempfile.mkdtemp(prefix="scur_work_")
    key = t.column("doc_id")
    in_b0 = pc.or_kleene(pc.less(key, mid), pc.is_null(key))
    pq.write_table(
        t.filter(pc.fill_null(in_b0, True)),
        os.path.join(stream_dir, "00.parquet"),
    )
    pq.write_table(
        t.filter(pc.fill_null(pc.invert(in_b0), False)),
        os.path.join(stream_dir, "01.parquet"),
    )
    docs = load_table(spark, sf_dir, "documents")
    model_dir = os.path.join(work, "model")
    if scorer == "linear":
        # the classifier gate needs no corpus-trained model or
        # percentile calibration: the offline artifact is the
        # deterministic fixture-trained weights, the cutoff its
        # trained decision boundary
        cutoff = 0.0
    else:
        write_lm_model(docs, model_dir)
        # the offline calibration: exact P20 of the scorable corpus
        # scores (smallest score with rank >= ceil(0.2 * n) — the
        # quality_filter spelling, one thin-column driver read).
        # Scored against the JUST-PERSISTED model tables (bit-equal to
        # a self-trained refit — same fit wrote them) so the count
        # aggregations run once, not twice.
        from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
            read_lm_model,
        )

        scorable = lm_transition_scores(
            docs, model=read_lm_model(spark, model_dir)
        ).where(F.col("n_bigrams") > 0)
        # exact P20 as ONE percentile_disc aggregate (bit-identical to
        # the former ranked-window spelling — quality_filter's shared
        # convention — minus its two single-partition window passes)
        cut_row = scorable.select("lm_score").agg(
            F.expr(
                "percentile_disc(0.2) WITHIN GROUP (ORDER BY lm_score)"
            ).alias("lm_score")
        ).collect()[0]
        if cut_row["lm_score"] is None:
            raise ValueError(
                "stream_curate calibration found no scorable documents "
                f"under {sf_dir} (every text NULL or single-token?) — "
                "cannot derive a quality cutoff"
            )
        cutoff = float(cut_row["lm_score"])
    old_parts = _set_stream_partitions(spark)
    try:
        stream = (
            spark.readStream.format("parquet")
            .schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .load(stream_dir)
        )
        q = run_curate_stream(
            stream,
            os.path.join(work, "out"),
            os.path.join(work, "index"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            model_dir=model_dir,
            cutoff=cutoff,
            n_shards=_CURATE_SHARDS,
            near_index_dir=os.path.join(work, "near_index") if near else None,
            scorer=scorer,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "stream_curate availableNow replay exceeded 300s"
            )
        return spark.read.parquet(
            os.path.join(work, "out", "batch=*", *(["kept"] if near else []))
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


# one-shot spelling of the standing curation: score -> exact P20 cut
# (value comparison) -> min-id exact dedup over the KEPT set -> md5
# shard. The cut and the dedup commute with the batch boundary because
# scoring is stateless against the fixed model and only KEPT docs ever
# enter the index.
_STREAM_CURATE_ORACLE = f"""
WITH lmout AS (
{_lm_score_sql("documents", "text")}
), cscorable AS (
  SELECT doc_id, lm_score FROM lmout WHERE n_bigrams > 0
), cranked AS (
  SELECT lm_score, row_number() OVER (ORDER BY lm_score) AS rn,
         count(*) OVER () AS n
  FROM cscorable
), ccut AS (
  SELECT lm_score AS t FROM cranked
  WHERE rn = CAST(ceil(0.2 * n) AS BIGINT)
), ckept AS (
  SELECT d.doc_id, d.text, s.lm_score
  FROM documents d
  JOIN cscorable s ON d.doc_id = s.doc_id, ccut
  WHERE s.lm_score >= ccut.t
), chashed AS (
  SELECT doc_id, {_H64.format(x="text")} AS text_hash, lm_score
  FROM ckept
), cbest AS (
  SELECT text_hash, min(doc_id) AS doc_id
  FROM chashed GROUP BY text_hash
)
SELECT b.doc_id, b.text_hash, min(h.lm_score) AS lm_score,
       CAST({_H64.format(x="'shuffle-v1:' || CAST(b.doc_id AS VARCHAR)")}
            % {_CURATE_SHARDS} AS INTEGER) AS shard
FROM cbest b
JOIN chashed h ON h.text_hash = b.text_hash AND h.doc_id = b.doc_id
GROUP BY b.doc_id, b.text_hash
"""


def _curate_near_tail() -> str:
    """The near-dedup → exact-dedup → shard tail, shared by every
    near-enabled curation oracle (a ``ckept(doc_id, text, lm_score)``
    CTE must precede it): min-id BAND near-dedup (a gate-passer drops
    iff any of its MinHash LSH bands is held by a smaller-id
    gate-passer — the runner's monotone rule, the _LSH_ORACLE band
    spelling verbatim), then min-id exact dedup over the
    near-survivors, then the md5 shard."""
    nbands_union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, {_band_hash_sql(b)} AS bhash FROM nsig"
        for b in range(_BANDS)
    )
    return f""", nsh AS (
  SELECT doc_id, {_SHINGLES} AS __sh FROM ckept
  WHERE text IS NOT NULL
), nsig AS (
  SELECT doc_id, {_minhash_list_sql()} AS minhash FROM nsh
), nbands AS (
  {nbands_union}
), nmin AS (
  SELECT band, bhash, min(doc_id) AS mid
  FROM nbands GROUP BY band, bhash
), ndrop AS (
  SELECT DISTINCT b.doc_id
  FROM nbands b JOIN nmin m ON b.band = m.band AND b.bhash = m.bhash
  WHERE m.mid < b.doc_id
), nkeep AS (
  SELECT k.doc_id, k.text, k.lm_score
  FROM ckept k LEFT JOIN ndrop d ON k.doc_id = d.doc_id
  WHERE d.doc_id IS NULL
), chashed AS (
  SELECT doc_id, {_H64.format(x="text")} AS text_hash, lm_score
  FROM nkeep
), cbest AS (
  SELECT text_hash, min(doc_id) AS doc_id
  FROM chashed GROUP BY text_hash
)
SELECT b.doc_id, b.text_hash, min(h.lm_score) AS lm_score,
       CAST({_H64.format(x="'shuffle-v1:' || CAST(b.doc_id AS VARCHAR)")}
            % {_CURATE_SHARDS} AS INTEGER) AS shard
FROM cbest b
JOIN chashed h ON h.text_hash = b.text_hash AND h.doc_id = b.doc_id
GROUP BY b.doc_id, b.text_hash
"""


def _stream_curate_near_oracle() -> str:
    """One-shot spelling of the near-enabled standing curation: score
    → exact P20 cut → the shared near/exact/shard tail
    (:func:`_curate_near_tail` — the cut and both dedup stages commute
    with the batch boundary exactly like the exact-only
    composition)."""
    return f"""
WITH lmout AS (
{_lm_score_sql("documents", "text")}
), cscorable AS (
  SELECT doc_id, lm_score FROM lmout WHERE n_bigrams > 0
), cranked AS (
  SELECT lm_score, row_number() OVER (ORDER BY lm_score) AS rn,
         count(*) OVER () AS n
  FROM cscorable
), ccut AS (
  SELECT lm_score AS t FROM cranked
  WHERE rn = CAST(ceil(0.2 * n) AS BIGINT)
), ckept AS (
  SELECT d.doc_id, d.text, s.lm_score
  FROM documents d
  JOIN cscorable s ON d.doc_id = s.doc_id, ccut
  WHERE s.lm_score >= ccut.t
){_curate_near_tail()}"""


def _stream_curate_clf_near_oracle() -> str:
    """One-shot spelling of the CLASSIFIER-gated near-enabled standing
    curation: the supervised margin gate at the trained decision
    boundary (the _clf_margin_cte spelling, margin cast to double as
    the plug-in lm_score), then the shared near/exact/shard tail."""
    return f"""
WITH {_clf_margin_cte()}, ckept AS (
  SELECT d.doc_id, d.text, CAST(m.quality_margin AS DOUBLE) AS lm_score
  FROM documents d
  JOIN clfmarg m ON d.doc_id = m.doc_id
  WHERE m.quality_margin >= 0
){_curate_near_tail()}"""


def _q_lm3_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated trigram-LM quality score (operators/lm.py::
    lm3_transition_scores — the higher-order rung of the CCNet filter;
    fixed λ=(3,2,1)/6 Jelinek-Mercer over add-one trigram/bigram/
    unigram legs, every step IEEE-correctly-rounded), self-trained on
    the documents corpus like text_lm_score."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        lm3_transition_scores,
    )

    return lm3_transition_scores(load_table(spark, sf_dir, "documents"))


# trigram key = w1||' '||w2||' '||w3 (injective, whitespace tokenizer);
# the interpolation is spelled in the exact Spark op order: three
# exact-int divisions, two weighted multiplies, two adds, /6, *QUANT,
# half-up round — bit-equal across engines.
def _lm3_score_sql(src: str = "documents", text_col: str = "text") -> str:
    return rf"""
WITH tk AS (
  SELECT doc_id,
         [lower(t) for t in
          list_filter(regexp_split_to_array(trim({text_col}), '\s+'),
                      t -> t != '')] AS tk
  FROM {src}
), tg AS (
  SELECT doc_id,
         unnest([tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2]
                 for i in range(1, len(tk) - 1)]) AS tri
  FROM tk WHERE tk IS NOT NULL AND len(tk) >= 3
), tri_counts AS (
  SELECT tri, count(*) AS c3 FROM tg GROUP BY tri
), ctx_counts AS (
  SELECT split_part(tri, ' ', 1) || ' ' || split_part(tri, ' ', 2) AS ctx,
         CAST(sum(c3) AS BIGINT) AS cp3
  FROM tri_counts GROUP BY 1
), bg AS (
  SELECT doc_id,
         unnest([tk[i] || ' ' || tk[i + 1]
                 for i in range(1, len(tk))]) AS big
  FROM tk WHERE tk IS NOT NULL AND len(tk) >= 2
), big_counts AS (
  SELECT big, count(*) AS cb FROM bg GROUP BY big
), prev_counts AS (
  SELECT split_part(big, ' ', 1) AS w1, CAST(sum(cb) AS BIGINT) AS cp
  FROM big_counts GROUP BY 1
), uni_counts AS (
  SELECT t, count(*) AS cu
  FROM (SELECT unnest(tk) AS t FROM tk) GROUP BY t
), totals AS (
  SELECT count(*) AS n_tokens, count(DISTINCT t) AS v
  FROM (SELECT unnest(tk) AS t FROM tk)
), scored AS (
  SELECT tg.doc_id,
         CAST(round((
           3.0 * (CAST(COALESCE(tc.c3, 0) + 1 AS DOUBLE)
                  / CAST(COALESCE(cc.cp3, 0) + greatest(tt.v, 1) AS DOUBLE))
           + 2.0 * (CAST(COALESCE(bc.cb, 0) + 1 AS DOUBLE)
                    / CAST(COALESCE(pc.cp, 0) + greatest(tt.v, 1) AS DOUBLE))
           + (CAST(COALESCE(uc.cu, 0) + 1 AS DOUBLE)
              / CAST(tt.n_tokens + greatest(tt.v, 1) AS DOUBLE))
         ) / 6.0 * 1000000000.0) AS BIGINT) AS qp
  FROM tg
  LEFT JOIN tri_counts tc ON tg.tri = tc.tri
  LEFT JOIN ctx_counts cc
    ON split_part(tg.tri, ' ', 1) || ' ' || split_part(tg.tri, ' ', 2)
       = cc.ctx
  LEFT JOIN big_counts bc
    ON split_part(tg.tri, ' ', 2) || ' ' || split_part(tg.tri, ' ', 3)
       = bc.big
  LEFT JOIN prev_counts pc ON split_part(tg.tri, ' ', 2) = pc.w1
  LEFT JOIN uni_counts uc ON split_part(tg.tri, ' ', 3) = uc.t
  CROSS JOIN totals tt
), agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
         CAST(sum(qp) AS BIGINT) AS lm3_prob_sum
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_trigrams, 0) AS n_trigrams,
       COALESCE(a.lm3_prob_sum, 0) AS lm3_prob_sum,
       CASE WHEN a.n_trigrams > 0
            THEN (CAST(a.lm3_prob_sum AS DOUBLE)
                  / CAST(a.n_trigrams AS DOUBLE)) / 1000000000.0
            ELSE NULL END AS lm3_score
FROM {src} d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


_LM3_SCORE_ORACLE = _lm3_score_sql()


def _q_lm5_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated 5-GRAM LM quality score (operators/lm.py::
    lm5_transition_scores — the published CCNet order, Wenzek et al.
    arXiv:1911.00359 use a 5-gram KenLM; fixed λ=(5,4,3,2,1)/15
    Jelinek-Mercer over add-one legs of orders 5..1, every step
    IEEE-correctly-rounded), self-trained on the documents corpus like
    the lower-order keys. Long-range (4-token-context) repetition
    moves the top legs, so the percentile cut keeps a different set
    than the trigram scorer (divergence pinned in tests/test_lm5.py)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        lm5_transition_scores,
    )

    return lm5_transition_scores(load_table(spark, sf_dir, "documents"))


# 5-gram key = space-joined tokens (injective); per-leg sub-keys are
# split_part recompositions; the interpolation is spelled in the exact
# Spark op order: five exact-int divisions, four weighted multiplies,
# four adds, /15, *QUANT, half-up round — bit-equal across engines.
def _lm5_score_sql(src: str = "documents", text_col: str = "text") -> str:
    j = lambda lo, hi: " || ' ' || ".join(
        f"split_part(g.g5, ' ', {i})" for i in range(lo, hi + 1)
    )
    return rf"""
WITH tk AS (
  SELECT doc_id,
         [lower(t) for t in
          list_filter(regexp_split_to_array(trim({text_col}), '\s+'),
                      t -> t != '')] AS tk
  FROM {src}
), g5g AS (
  SELECT doc_id,
         unnest([tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2] || ' ' ||
                 tk[i + 3] || ' ' || tk[i + 4]
                 for i in range(1, len(tk) - 3)]) AS g5
  FROM tk WHERE tk IS NOT NULL AND len(tk) >= 5
), g5_counts AS (
  SELECT g5, count(*) AS c5 FROM g5g GROUP BY g5
), ctx5_counts AS (
  SELECT split_part(g5, ' ', 1) || ' ' || split_part(g5, ' ', 2) || ' ' ||
         split_part(g5, ' ', 3) || ' ' || split_part(g5, ' ', 4) AS ctx5,
         CAST(sum(c5) AS BIGINT) AS cp5
  FROM g5_counts GROUP BY 1
), g4g AS (
  SELECT doc_id,
         unnest([tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2] || ' ' ||
                 tk[i + 3]
                 for i in range(1, len(tk) - 2)]) AS g4
  FROM tk WHERE tk IS NOT NULL AND len(tk) >= 4
), g4_counts AS (
  SELECT g4, count(*) AS c4 FROM g4g GROUP BY g4
), ctx4_counts AS (
  SELECT split_part(g4, ' ', 1) || ' ' || split_part(g4, ' ', 2) || ' ' ||
         split_part(g4, ' ', 3) AS ctx4,
         CAST(sum(c4) AS BIGINT) AS cp4
  FROM g4_counts GROUP BY 1
), tg AS (
  SELECT doc_id,
         unnest([tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2]
                 for i in range(1, len(tk) - 1)]) AS tri
  FROM tk WHERE tk IS NOT NULL AND len(tk) >= 3
), tri_counts AS (
  SELECT tri, count(*) AS c3 FROM tg GROUP BY tri
), ctx_counts AS (
  SELECT split_part(tri, ' ', 1) || ' ' || split_part(tri, ' ', 2) AS ctx,
         CAST(sum(c3) AS BIGINT) AS cp3
  FROM tri_counts GROUP BY 1
), bg AS (
  SELECT doc_id,
         unnest([tk[i] || ' ' || tk[i + 1]
                 for i in range(1, len(tk))]) AS big
  FROM tk WHERE tk IS NOT NULL AND len(tk) >= 2
), big_counts AS (
  SELECT big, count(*) AS cb FROM bg GROUP BY big
), prev_counts AS (
  SELECT split_part(big, ' ', 1) AS w1, CAST(sum(cb) AS BIGINT) AS cp
  FROM big_counts GROUP BY 1
), uni_counts AS (
  SELECT t, count(*) AS cu
  FROM (SELECT unnest(tk) AS t FROM tk) GROUP BY t
), totals AS (
  SELECT count(*) AS n_tokens, count(DISTINCT t) AS v
  FROM (SELECT unnest(tk) AS t FROM tk)
), scored AS (
  SELECT g.doc_id,
         CAST(round((
           5.0 * (CAST(COALESCE(c5c.c5, 0) + 1 AS DOUBLE)
                  / CAST(COALESCE(x5.cp5, 0) + greatest(tt.v, 1) AS DOUBLE))
           + 4.0 * (CAST(COALESCE(c4c.c4, 0) + 1 AS DOUBLE)
                    / CAST(COALESCE(x4.cp4, 0) + greatest(tt.v, 1) AS DOUBLE))
           + 3.0 * (CAST(COALESCE(tc.c3, 0) + 1 AS DOUBLE)
                    / CAST(COALESCE(cc.cp3, 0) + greatest(tt.v, 1) AS DOUBLE))
           + 2.0 * (CAST(COALESCE(bc.cb, 0) + 1 AS DOUBLE)
                    / CAST(COALESCE(pc.cp, 0) + greatest(tt.v, 1) AS DOUBLE))
           + (CAST(COALESCE(uc.cu, 0) + 1 AS DOUBLE)
              / CAST(tt.n_tokens + greatest(tt.v, 1) AS DOUBLE))
         ) / 15.0 * 1000000000.0) AS BIGINT) AS qp
  FROM g5g g
  LEFT JOIN g5_counts c5c ON g.g5 = c5c.g5
  LEFT JOIN ctx5_counts x5 ON {j(1, 4)} = x5.ctx5
  LEFT JOIN g4_counts c4c ON {j(2, 5)} = c4c.g4
  LEFT JOIN ctx4_counts x4 ON {j(2, 4)} = x4.ctx4
  LEFT JOIN tri_counts tc ON {j(3, 5)} = tc.tri
  LEFT JOIN ctx_counts cc ON {j(3, 4)} = cc.ctx
  LEFT JOIN big_counts bc ON {j(4, 5)} = bc.big
  LEFT JOIN prev_counts pc ON split_part(g.g5, ' ', 4) = pc.w1
  LEFT JOIN uni_counts uc ON split_part(g.g5, ' ', 5) = uc.t
  CROSS JOIN totals tt
), agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_5grams,
         CAST(sum(qp) AS BIGINT) AS lm5_prob_sum
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_5grams, 0) AS n_5grams,
       COALESCE(a.lm5_prob_sum, 0) AS lm5_prob_sum,
       CASE WHEN a.n_5grams > 0
            THEN (CAST(a.lm5_prob_sum AS DOUBLE)
                  / CAST(a.n_5grams AS DOUBLE)) / 1000000000.0
            ELSE NULL END AS lm5_score
FROM {src} d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


_LM5_SCORE_ORACLE = _lm5_score_sql()


def _q_stream_clf_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standing SUPERVISED quality scoring (streaming/quality.py::
    run_clf_score_stream — the classifier twin of s_stream_lm_score):
    the documents corpus replays as TWO micro-batches scored
    statelessly against the fixture-trained linear model (scan-side
    exact-int64 margins; the weights ride the plan, no model table).
    Scoring depends only on each doc's own tokens and the fixed
    weights, so the union of per-batch scores equals the one-shot
    classify_quality run — the oracle is the batch classifier oracle
    verbatim."""
    import os
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        run_clf_score_stream,
    )
    from __spark_entry__ import _set_stream_partitions

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = sorted(x.as_py() for x in t.column("doc_id") if x.as_py() is not None)
    mid = ids[len(ids) // 2]
    stream_dir = tempfile.mkdtemp(prefix="sclf_src_")
    work = tempfile.mkdtemp(prefix="sclf_work_")
    key = t.column("doc_id")
    in_b0 = pc.or_kleene(pc.less(key, mid), pc.is_null(key))
    pq.write_table(
        t.filter(pc.fill_null(in_b0, True)),
        os.path.join(stream_dir, "00.parquet"),
    )
    pq.write_table(
        t.filter(pc.fill_null(pc.invert(in_b0), False)),
        os.path.join(stream_dir, "01.parquet"),
    )
    old_parts = _set_stream_partitions(spark)
    try:
        stream = (
            spark.readStream.format("parquet")
            .schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .load(stream_dir)
        )
        q = run_clf_score_stream(
            stream,
            os.path.join(work, "out"),
            checkpoint_dir=os.path.join(work, "ckpt"),
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "stream_clf_score availableNow replay exceeded 300s"
            )
        return spark.read.parquet(
            os.path.join(work, "out", "batch=*", "scores")
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def _q_stream_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standing LM quality scoring (streaming/quality.py::
    run_lm_score_stream): the bigram model is fitted ONCE on the full
    documents corpus and persisted (the offline-training artifact);
    the corpus then replays as TWO micro-batches scored statelessly
    against it. Scoring depends only on each doc's own tokens and the
    fixed model, so the union of per-batch scores equals the one-shot
    batch run — the oracle is _LM_SCORE_ORACLE verbatim (reference ==
    corpus == self-trained)."""
    import os
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.streaming import (
        run_lm_score_stream,
        write_lm_model,
    )
    from __spark_entry__ import _set_stream_partitions

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = sorted(x.as_py() for x in t.column("doc_id") if x.as_py() is not None)
    mid = ids[len(ids) // 2]
    stream_dir = tempfile.mkdtemp(prefix="slm_src_")
    work = tempfile.mkdtemp(prefix="slm_work_")
    key = t.column("doc_id")
    in_b0 = pc.or_kleene(pc.less(key, mid), pc.is_null(key))
    pq.write_table(
        t.filter(pc.fill_null(in_b0, True)),
        os.path.join(stream_dir, "00.parquet"),
    )
    pq.write_table(
        t.filter(pc.fill_null(pc.invert(in_b0), False)),
        os.path.join(stream_dir, "01.parquet"),
    )
    model_dir = os.path.join(work, "model")
    write_lm_model(load_table(spark, sf_dir, "documents"), model_dir)
    old_parts = _set_stream_partitions(spark)
    try:
        stream = (
            spark.readStream.format("parquet")
            .schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .load(stream_dir)
        )
        q = run_lm_score_stream(
            stream,
            os.path.join(work, "out"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            model_dir=model_dir,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("stream_lm_score availableNow replay exceeded 300s")
        return spark.read.parquet(
            os.path.join(work, "out", "batch=*", "scores")
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def _q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed CCNet-shaped quality chain
    (plans/pipeline.py::quality_filter): boilerplate-clean -> bigram-LM
    score the cleaned text -> drop the worst 20% of scorable docs at
    the exact PERCENTILE_DISC cut. One oracle checks the whole chain."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.pipeline import (
        quality_filter,
    )

    return quality_filter(load_table(spark, sf_dir, "documents"))


# the boilerplate and LM oracles nest as CTE bodies (their WITH
# clauses scope locally); the cut is a VALUE threshold, so rank-order
# ties between engines cannot change membership
_QUALITY_FILTER_ORACLE = f"""
WITH cleaned AS (
{_BOILERPLATE_ORACLE}
), lmout AS (
{_lm_score_sql("cleaned", "text_clean")}
), qscorable AS (
  SELECT l.doc_id, l.lm_score, l.n_bigrams, c.n_removed
  FROM lmout l JOIN cleaned c ON l.doc_id = c.doc_id
  WHERE l.n_bigrams > 0
), qranked AS (
  SELECT lm_score, row_number() OVER (ORDER BY lm_score) AS rn,
         count(*) OVER () AS n
  FROM qscorable
), qcut AS (
  SELECT lm_score AS t FROM qranked
  WHERE rn = CAST(ceil(0.2 * n) AS BIGINT)
)
SELECT s.doc_id, s.lm_score, s.n_bigrams, s.n_removed
FROM qscorable s, qcut WHERE s.lm_score >= qcut.t
"""


def _clf_margin_cte(src: str = "documents", text_col: str = "text") -> str:
    """CTE chain ``src`` → ``clfmarg(doc_id, quality_margin)``: the
    supervised linear quality classifier's EXACT int64 margin
    (operators/quality_clf.py::classify_quality) — the engine's
    q_micro integer embedding of each doc dotted with the fixture-
    trained micro-quantized weights plus the micro²-unit bias, weights
    inlined as a VALUES table (both engines consume the identical
    model, trained once per process by the deterministic numpy
    trainer). Unscorable docs (no tokens / zero-norm bag) have no
    clfmarg row — callers LEFT JOIN for NULL-margin semantics or
    inner-join to keep scorable docs only."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        model_weights_sql,
    )

    wts, bias = model_weights_sql()
    return f"""{_hash_embed_cte(src=src, text_col=text_col)}, clfq AS (
  SELECT r.doc_id, r.dim,
         CAST(round(CAST(r.v AS DOUBLE) * 1000000.0
                    / sqrt(CAST(n.norm2 AS DOUBLE))) AS BIGINT) AS q
  FROM heb_raw r JOIN heb_nrm n ON r.doc_id IS NOT DISTINCT FROM n.doc_id
  WHERE n.norm2 > 0
), clfmarg AS (
  SELECT c.doc_id,
         CAST({bias} + sum(c.q * wts.w) AS BIGINT) AS quality_margin
  FROM clfq c JOIN {wts} ON wts.dim = c.dim
  GROUP BY c.doc_id
)"""


def _q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised quality classifier (operators/quality_clf.py — the
    r12 verdict's Missing #4, the CCNet/fastText labeled leg): a
    linear model trained on the built-in labeled fixture (fluent
    prose positives vs navigation/footer boilerplate negatives;
    deterministic numpy full-batch GD, the offline-artifact shape)
    scores every document scan-side — exact int64 margin over the
    hashed-feature q_micro embedding, quality_keep = margin >= 0
    (NULL for unscorable docs). Zero shuffles, zero UDFs."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        classify_quality,
    )

    return classify_quality(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "quality_margin", "quality_keep"
    )


def _quality_classifier_oracle() -> str:
    return f"""
WITH {_clf_margin_cte()}
SELECT d.doc_id, m.quality_margin,
       m.quality_margin >= 0 AS quality_keep
FROM documents d
LEFT JOIN clfmarg m ON d.doc_id IS NOT DISTINCT FROM m.doc_id
"""


def _q_quality_filter_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed quality chain under the SUPERVISED scorer
    (plans/pipeline.py::quality_filter(scorer='linear', cutoff=0.0)):
    boilerplate-clean, then keep the docs the fixture-trained linear
    classifier accepts at its decision boundary — the classifier
    deployment shape (a fixed threshold, no percentile calibration).
    The score column keeps the plug-in name lm_score (the margin cast
    to double — exact, magnitudes sit under 2^53); kept-set
    divergence vs the lm_order=5 cut is pinned in
    tests/test_quality_clf.py."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.pipeline import (
        quality_filter,
    )

    return quality_filter(
        load_table(spark, sf_dir, "documents"), scorer="linear", cutoff=0.0
    )


def _quality_filter_linear_oracle() -> str:
    return f"""
WITH cleaned AS (
{_BOILERPLATE_ORACLE}
), {_clf_margin_cte(src="cleaned", text_col="text_clean")}
SELECT c.doc_id, CAST(m.quality_margin AS DOUBLE) AS lm_score,
       CAST(1 AS BIGINT) AS n_scorable, c.n_removed
FROM cleaned c JOIN clfmarg m ON c.doc_id = m.doc_id
WHERE CAST(m.quality_margin AS DOUBLE) >= 0.0
"""


def _q_quality_filter3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed quality chain under the INTERPOLATED TRIGRAM
    scorer (plans/pipeline.py::quality_filter(lm_order=3)): same
    boilerplate-clean and 20% PERCENTILE_DISC cut, higher-order LM —
    the kept set materially differs from the bigram cut (pinned in
    tests/test_lm3.py)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.pipeline import (
        quality_filter,
    )

    return quality_filter(load_table(spark, sf_dir, "documents"), lm_order=3)


_QUALITY_FILTER3_ORACLE = f"""
WITH cleaned AS (
{_BOILERPLATE_ORACLE}
), lm3out AS (
{_lm3_score_sql("cleaned", "text_clean")}
), q3scorable AS (
  SELECT l.doc_id, l.lm3_score AS lm_score, l.n_trigrams, c.n_removed
  FROM lm3out l JOIN cleaned c ON l.doc_id = c.doc_id
  WHERE l.n_trigrams > 0
), q3ranked AS (
  SELECT lm_score, row_number() OVER (ORDER BY lm_score) AS rn,
         count(*) OVER () AS n
  FROM q3scorable
), q3cut AS (
  SELECT lm_score AS t FROM q3ranked
  WHERE rn = CAST(ceil(0.2 * n) AS BIGINT)
)
SELECT s.doc_id, s.lm_score, s.n_trigrams, s.n_removed
FROM q3scorable s, q3cut WHERE s.lm_score >= q3cut.t
"""


def _q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail bucketing (operators/lm.py::
    lm_quality_buckets, Wenzek et al. §4.3): per-source exact
    PERCENTILE_DISC terciles of the self-trained bigram-LM score;
    bucket membership by VALUE comparison so rank ties cannot flip
    labels across engines."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.lm import (
        lm_quality_buckets,
    )

    return lm_quality_buckets(load_table(spark, sf_dir, "documents"))


_CCNET_BUCKETS_ORACLE = f"""
WITH lmsc AS (
{_lm_score_sql()}
), su AS (
  SELECT DISTINCT doc_id, lm_score FROM lmsc
  WHERE doc_id IS NOT NULL AND n_bigrams > 0
), pairs AS (
  SELECT DISTINCT doc_id, source FROM documents
  WHERE doc_id IS NOT NULL AND source IS NOT NULL
), scor AS (
  SELECT p.doc_id, p.source, s.lm_score
  FROM pairs p JOIN su s ON p.doc_id = s.doc_id
), ranked AS (
  SELECT doc_id, source, lm_score,
         row_number() OVER (PARTITION BY source ORDER BY lm_score) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM scor
), cuts AS (
  SELECT source,
         max(CASE WHEN rn = CAST(ceil(n / 3.0) AS BIGINT)
                  THEN lm_score END) AS cut1,
         max(CASE WHEN rn = CAST(ceil(2.0 * n / 3.0) AS BIGINT)
                  THEN lm_score END) AS cut2
  FROM ranked GROUP BY source
)
SELECT s.doc_id, s.source, s.lm_score,
       CASE WHEN s.lm_score >= c.cut2 THEN 'head'
            WHEN s.lm_score >= c.cut1 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scor s JOIN cuts c ON s.source = c.source
"""


def _q_pipeline_curate_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL modern curation recipe end-to-end (plans/pipeline.py::
    curate_mix_shards): CCNet boilerplate clean -> bigram-LM score ->
    exact percentile cut -> temperature source mixing over the
    survivors -> exact dedup on the CLEANED text -> deterministic
    shuffle + context-window packing. One composed DuckDB oracle
    replays every stage; output is the per-(shard, win) manifest."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.plans.pipeline import (
        curate_mix_shards,
    )

    return curate_mix_shards(load_table(spark, sf_dir, "documents"))


def _curate_mix_oracle() -> str:
    """Composed oracle for the clean->score->cut->mix->dedup->pack
    pipeline. Stage bodies are the registered single-stage oracles
    nested as CTEs (boilerplate + source-parameterized LM + the
    quality cut from _QUALITY_FILTER_ORACLE + the temperature-mix
    arithmetic from _TEMPERATURE_MIX_ORACLE with counts over the
    SURVIVOR population + the dedup/pack chain from
    _curate_shards_oracle). qscorable/wsrc are MATERIALIZED: each
    feeds two consumers, and default inlining would re-run the
    boilerplate+LM chain once per reference."""
    tmix_h = _H64.format(x="'tmix:' || CAST(doc_id AS VARCHAR)")
    dedup_h = _H64.format(x="text_clean")
    shuf_h = _H64.format(x="'shuffle-v1:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH cleaned AS MATERIALIZED (
{_BOILERPLATE_ORACLE}
), lmout AS (
{_lm_score_sql("cleaned", "text_clean")}
), qscorable AS MATERIALIZED (
  SELECT l.doc_id, l.lm_score, l.n_bigrams, c.n_removed, c.text_clean
  FROM lmout l JOIN cleaned c ON l.doc_id = c.doc_id
  WHERE l.n_bigrams > 0
), qranked AS (
  SELECT lm_score, row_number() OVER (ORDER BY lm_score) AS rn,
         count(*) OVER () AS n
  FROM qscorable
), qcut AS (
  SELECT lm_score AS t FROM qranked
  WHERE rn = CAST(ceil(0.2 * n) AS BIGINT)
), wsrc AS MATERIALIZED (
  SELECT s.doc_id, s.text_clean, d.source
  FROM qscorable s, qcut, documents d
  WHERE s.lm_score >= qcut.t AND s.doc_id = d.doc_id
), tcounts AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(round(pow(CAST(count(*) AS DOUBLE), 0.5) * 1000000)
              AS BIGINT) AS qpow
  FROM wsrc WHERE source IS NOT NULL GROUP BY source
), ttots AS (
  SELECT CAST(sum(n) AS BIGINT) AS ntot, CAST(sum(qpow) AS BIGINT) AS z
  FROM tcounts
), trates AS (
  SELECT c.source,
         least(10000, greatest(0,
           CAST(round(((0.5 * CAST(t.ntot AS DOUBLE))
                       * (CAST(c.qpow AS DOUBLE) / CAST(t.z AS DOUBLE))
                       / CAST(c.n AS DOUBLE)) * 10000) AS BIGINT))) AS qrate
  FROM tcounts c CROSS JOIN ttots t
), mixed AS (
  SELECT w.doc_id, w.text_clean
  FROM wsrc w JOIN trates r ON w.source = r.source
  WHERE {tmix_h} % 10000 < r.qrate
), mdedup AS (
  SELECT doc_id, text_clean FROM (
    SELECT m.doc_id, m.text_clean,
           row_number() OVER (PARTITION BY {dedup_h}
                              ORDER BY doc_id) AS dd_rn
    FROM mixed m)
  WHERE dd_rn = 1
), shuffled AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(trim(text_clean),
              '\\s+'), t -> t != '')) AS BIGINT) AS n_tokens,
         {shuf_h} % 8 AS shard,
         row_number() OVER (PARTITION BY {shuf_h} % 8
                            ORDER BY {shuf_h}, doc_id) AS pos
  FROM mdedup
), cum AS (
  SELECT shard, pos, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY pos)
              AS BIGINT) AS c
  FROM shuffled
)
SELECT shard, CAST(floor((c - n_tokens) / 512.0) AS BIGINT) AS win,
       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS win_tokens,
       CAST(min(pos) AS BIGINT) AS first_pos,
       CAST(max(pos) AS BIGINT) AS last_pos
FROM cum GROUP BY 1, 2
"""


def _q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids
    (operators/similarity.py::label_centroids)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.similarity import (
        label_centroids,
    )

    return label_centroids(load_table(spark, sf_dir, "embeddings"))


_LABEL_CENTROIDS_ORACLE = """
WITH e AS (
  SELECT label, t.i AS pos,
         embedding[t.i + 1] AS v
  FROM embeddings, LATERAL unnest(range(0, len(embedding))) AS t(i)
)
SELECT label, CAST(pos AS BIGINT) AS pos, count(*) AS n_vecs,
       CAST(sum(CAST(CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)
                     AS HUGEINT)) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) / 1000000.0 AS centroid
FROM e GROUP BY label, pos
"""


def _q_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic hamming-distance near-dup stage (operators/dedup.py::
    hamming_near_dup_pairs) gated over the cross-engine 60-bit SimHash
    fingerprint: 4 x 15-bit bands, exact popcount verify at radius 3
    (max_hamming < bands -> pigeonhole-complete). On image corpora the
    SAME machinery runs over dHash fingerprints
    (operators/multimodal.py::image_near_dup_pairs, pytest-verified on
    decoded pixels — DuckDB cannot decode images, SimHash it can)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.dedup import (
        hamming_near_dup_pairs,
    )

    fps = simhash(load_table(spark, sf_dir, "documents"))
    return hamming_near_dup_pairs(
        fps, id_col="doc_id", hash_col="simhash",
        max_hamming=3, bands=4, n_bits=60,
    )


_HAMMING_PAIRS_ORACLE = f"""
WITH fp AS (
  SELECT doc_id, simhash AS fp FROM ({_SIMHASH_ORACLE})
  WHERE simhash IS NOT NULL
), bands AS (
  SELECT doc_id, t.b, (fp >> (t.b * 15)) & 32767 AS bv
  FROM fp, unnest([0, 1, 2, 3]) AS t(b)
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv
  WHERE a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(fa.fp, fb.fp)) AS INTEGER) AS hamming
FROM cand c
JOIN fp fa ON fa.doc_id = c.doc_a
JOIN fp fb ON fb.doc_id = c.doc_b
WHERE bit_count(xor(fa.fp, fb.fp)) <= 3
"""



#: fingerprint near-dup edge table, persisted as parquet per sf_dir:
#: the cluster and in-batch-negative queries CONSUME the near-dup
#: graph that the hamming discovery stage produces — a pipeline
#: persists that table and reads it back, it does not re-run SimHash
#: + banding per consumer. The persisted artifact is the SPARSE
#: component-equivalent edge list (hamming_near_dup_edges: star edges
#: inside identical-fingerprint groups + rep-level verified pairs) —
#: O(N + rep-pairs) rows even on duplicate pile-ups, so unlike the
#: full pair table it never exceeds storage/driver budgets at scale.
#: Concurrency + staleness contract: the cache key hashes the sf_dir
#: path PLUS the documents.parquet (mtime, size) signature PLUS a code
#: version token, so regenerated testdata or a semantics change land
#: at a NEW path; a keyed table's content is therefore immutable, and
#: it is written WRITE-ONCE via temp-dir + atomic rename — concurrent
#: processes (bench + pytest on the same sf_dir) either rename first
#: or discard their temp copy and read the winner; a reader never
#: observes a partially (re)written directory.
_HAMMING_EDGES_VERSION = 2  # bump when hamming_near_dup_edges semantics change
#: simhash implementation token: bump when operators/dedup.py::simhash
#: itself changes (token hashing, majority rule, bit order) — the edge
#: cache is a pure function of (input data, simhash impl, banding
#:  params), and only the first is observable from the filesystem.
_SIMHASH_IMPL_VERSION = 1
#: the banding/verify parameters the cached edge table was built with —
#: part of the cache key, so changing them lands at a NEW path instead
#: of silently serving edges computed under the old radius/band count.
_HAMMING_EDGES_PARAMS = {"max_hamming": 3, "bands": 4, "n_bits": 60}
_GATE_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "spark-warehouse", "_gate_cache"
)


def _hamming_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import shutil

    docs_path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(docs_path)
    p = _HAMMING_EDGES_PARAMS
    sig = (
        f"{os.path.abspath(sf_dir)}|{st.st_mtime_ns}|{st.st_size}"
        f"|v{_HAMMING_EDGES_VERSION}|sh{_SIMHASH_IMPL_VERSION}"
        f"|mh{p['max_hamming']}|b{p['bands']}|n{p['n_bits']}"
    )
    key = hashlib.md5(sig.encode()).hexdigest()[:16]
    path = os.path.join(_GATE_CACHE_DIR, f"hamming_edges_{key}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.dedup import (
            hamming_near_dup_edges,
        )

        tmp = f"{path}.tmp.{os.getpid()}"
        fps = simhash(load_table(spark, sf_dir, "documents"))
        hamming_near_dup_edges(
            fps, id_col="doc_id", hash_col="simhash", **p,
        ).write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            # another process renamed first — identical deterministic
            # content, keep theirs
            shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(path).select("doc_a", "doc_b")


def _q_hamming_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint dedup workflow end-to-end: SimHash -> banded
    hamming candidates + popcount verify (radius 3, complete) ->
    persisted sparse edge table (component-equivalent to the full pair
    table — the oracle's recursive CTE over ALL pairs provably labels
    the same components) -> connected components -> one canonical doc
    per cluster — the fingerprint twin of dedup_clusters'
    MinHash/Jaccard chain, and exactly what an image-dedup job runs
    over dHash values."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.dedup import (
        near_dup_clusters,
    )

    docs = load_table(spark, sf_dir, "documents")
    return near_dup_clusters(docs, _hamming_edges(spark, sf_dir))


def _q_hamming_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse component-equivalent near-dup edge set in fingerprint
    space (operators/dedup.py::hamming_near_dup_edges): star edges
    inside identical-SimHash groups (hamming 0 by construction) plus
    popcount-verified representative-level pairs — the O(N + rep-pairs)
    artifact a dedup pipeline persists instead of the quadratic pair
    table. The oracle mirrors the collapse exactly: group by
    fingerprint, min-id representative, banded candidates over
    representatives only."""
    fps = simhash(load_table(spark, sf_dir, "documents"))
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.dedup import (
        hamming_near_dup_edges,
    )

    return hamming_near_dup_edges(
        fps, id_col="doc_id", hash_col="simhash",
        max_hamming=3, bands=4, n_bits=60,
    )


_HAMMING_EDGES_ORACLE = f"""
WITH hefp AS (
  SELECT doc_id, simhash AS fp FROM ({_SIMHASH_ORACLE})
  WHERE simhash IS NOT NULL AND doc_id IS NOT NULL
), hegrp AS (
  SELECT fp, min(doc_id) AS rep FROM hefp GROUP BY fp
), hestar AS (
  SELECT g.rep AS doc_a, x.doc_id AS doc_b, CAST(0 AS INTEGER) AS hamming
  FROM hefp x JOIN hegrp g ON x.fp = g.fp
  WHERE x.doc_id != g.rep
), hereps AS (
  SELECT rep AS doc_id, fp FROM hegrp
), hebands AS (
  SELECT doc_id, t.b, (fp >> (t.b * 15)) & 32767 AS bv
  FROM hereps, unnest([0, 1, 2, 3]) AS t(b)
), hecand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM hebands a JOIN hebands b ON a.b = b.b AND a.bv = b.bv
  WHERE a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(fa.fp, fb.fp)) AS INTEGER) AS hamming
FROM hecand c
JOIN hereps fa ON fa.doc_id = c.doc_a
JOIN hereps fb ON fb.doc_id = c.doc_b
WHERE bit_count(xor(fa.fp, fb.fp)) <= 3
UNION ALL
SELECT doc_a, doc_b, hamming FROM hestar
"""


def _q_lsh_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse component-equivalent near-dup edge set in text space
    (operators/dedup.py::lsh_near_dup_edges): exact-duplicate texts
    collapse first (star edges, jaccard 1.0 by construction), then
    MinHash + banding + exact-Jaccard verification over DISTINCT texts
    only — the linear-on-dup-mass artifact the curation pipeline feeds
    to near_dup_clusters."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        lsh_near_dup_edges,
    )

    return lsh_near_dup_edges(
        load_table(spark, sf_dir, "documents"),
        bands=_BANDS, rows_per_band=_ROWS_PER_BAND,
        threshold=_JACCARD_THRESHOLD,
        min_parallelism=spark.sparkContext.defaultParallelism,
    )


_LSH_EDGES_ORACLE = f"""
WITH led AS (
  SELECT doc_id, text, {_H64.format(x="text")} AS th FROM documents
  WHERE text IS NOT NULL AND doc_id IS NOT NULL
), legrp AS (
  SELECT th, min(doc_id) AS rep FROM led GROUP BY th
), lestar AS (
  SELECT g.rep AS doc_a, x.doc_id AS doc_b, CAST(1.0 AS DOUBLE) AS jaccard
  FROM led x JOIN legrp g ON x.th = g.th
  WHERE x.doc_id != g.rep
), lesh AS (
  SELECT doc_id, {_SHINGLES} AS __sh
  FROM (SELECT d.doc_id, d.text FROM led d
        JOIN legrp g ON d.th = g.th AND d.doc_id = g.rep)
), lesig AS (
  SELECT doc_id, {_minhash_list_sql()} AS minhash FROM lesh
), lebands AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {b} AS band, {_band_hash_sql(b)} AS bhash FROM lesig"
      for b in range(_BANDS)
  )}
), lecands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM lebands a JOIN lebands b
    ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id
), leverified AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(sa.__sh, sb.__sh)) AS ni,
         len(sa.__sh) AS na, len(sb.__sh) AS nb
  FROM lecands c
  JOIN lesh sa ON sa.doc_id = c.doc_a
  JOIN lesh sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b,
       CAST(ni AS DOUBLE) / CAST(na + nb - ni AS DOUBLE) AS jaccard
FROM leverified
WHERE CAST(ni AS DOUBLE) / CAST(na + nb - ni AS DOUBLE) >= {_JACCARD_THRESHOLD}
UNION ALL
SELECT doc_a, doc_b, jaccard FROM lestar
"""


def _q_clusters_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cluster maintenance (operators/dedup.py::
    clusters_append): the corpus is split at the median-ish doc id —
    the first half is 'already ingested' (labelled by a prior
    near_dup_clusters run over the edges internal to it), the second
    half is 'the new batch' whose edges (everything touching it) are
    appended. The operator re-labels only touched clusters; the oracle
    is the FULL from-scratch recompute (identical to
    dedup_hamming_clusters' oracle), pinning the exactness claim: the
    incremental path must be indistinguishable from rerunning the
    whole corpus."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.dedup import (
        clusters_append,
        near_dup_clusters,
    )

    docs = load_table(spark, sf_dir, "documents")
    edges = _hamming_edges(spark, sf_dir)
    mid = docs.agg(F.max("doc_id")).first()[0]
    mid = (mid // 2) if mid is not None else 0
    old_docs = docs.where(F.col("doc_id").isNull() | (F.col("doc_id") <= mid))
    new_docs = docs.where(F.col("doc_id") > mid)
    old_edges = edges.where(
        (F.col("doc_a") <= mid) & (F.col("doc_b") <= mid)
    )
    new_edges = edges.where(
        (F.col("doc_a") > mid) | (F.col("doc_b") > mid)
    )
    labels = near_dup_clusters(old_docs, old_edges).select(
        "doc_id", "cluster_id"
    )
    return clusters_append(labels, new_docs, new_edges)


_HAMMING_CLUSTERS_ORACLE = f"""
WITH RECURSIVE hpairs AS (
  SELECT doc_a, doc_b FROM ({_HAMMING_PAIRS_ORACLE})
), hedges AS (
  SELECT doc_a AS src, doc_b AS dst FROM hpairs
  UNION
  SELECT doc_b, doc_a FROM hpairs
), hreach(node, r) AS (
  SELECT src, dst FROM hedges
  UNION
  SELECT hreach.node, e.dst FROM hreach JOIN hedges e ON hreach.r = e.src
), hcomp AS (
  SELECT node, LEAST(node, MIN(r)) AS cluster_id FROM hreach GROUP BY node
), hassigned AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN hcomp c ON d.doc_id = c.node
), hsizes AS (
  SELECT cluster_id, COUNT(*) AS cluster_size FROM hassigned GROUP BY cluster_id
)
SELECT a.doc_id, a.cluster_id, s.cluster_size,
       CASE WHEN a.doc_id = a.cluster_id THEN 1 ELSE 0 END AS is_canonical
FROM hassigned a JOIN hsizes s ON a.cluster_id = s.cluster_id
"""



def _q_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/eval split (operators/training_data.py::
    leakage_safe_split): SimHash hamming edges -> connected-component
    cluster labels -> deterministic md5 hash split of the CLUSTER id,
    so no near-dup pair ever straddles train/test — the leakage guard
    every public pretraining recipe applies before building eval
    sets. Reuses the cached sparse hamming edge table; the oracle
    composes the clusters oracle with the hash_split CASE verbatim."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        leakage_safe_split,
    )

    docs = load_table(spark, sf_dir, "documents")
    return leakage_safe_split(docs, _hamming_edges(spark, sf_dir))


_LEAKAGE_SPLIT_ORACLE = f"""
WITH lbl AS (
  SELECT doc_id, cluster_id FROM ({_HAMMING_CLUSTERS_ORACLE})
)
SELECT doc_id, cluster_id,
       -- || (NOT concat) so a NULL cluster hashes NULL -> 'train'
       -- (unreachable here: NULL-id docs drop with the label table)
       CASE WHEN CAST('0x' ||
                substring(md5('split-v1:' || CAST(cluster_id AS VARCHAR)),
                          1, 15) AS BIGINT) % 100 < 30
            THEN 'test' ELSE 'train' END AS split
FROM lbl
"""


def _doc_count(sf_dir: str) -> int:
    """Documents row count from the parquet footer (no Spark job)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")
    ).metadata.num_rows


def _neg_batches_for(sf_dir: str) -> int:
    """Corpus-scaled batch count for in-batch negatives: batches grow
    WITH the corpus so per-batch size (and per-doc negative fan-out)
    stays ~32 — a fixed batch count would make the pair output
    quadratic at 10x (the same policy shape as auto_planes). The
    floor keeps the driver-gate corpus (500 docs) at 16 batches."""
    return max(16, _doc_count(sf_dir) // 32)


def _q_inbatch_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training negative pairs (operators/training_data.py
    ::in_batch_negatives): md5-deterministic batch assignment, all
    ordered within-batch pairs, same-near-dup-cluster pairs excluded
    as false negatives. Clusters come from the fingerprint chain
    (SimHash radius-3 components), so the whole query is the
    composition a contrastive data loader actually runs."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.dedup import (
        near_dup_clusters,
    )
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.training_data import (
        in_batch_negatives,
    )

    docs = load_table(spark, sf_dir, "documents")
    clusters = near_dup_clusters(
        docs, _hamming_edges(spark, sf_dir)
    ).select("doc_id", "cluster_id")
    return in_batch_negatives(
        docs, clusters, n_batches=_neg_batches_for(sf_dir)
    )


# SCALE-INVARIANT batch count: greatest(16, count(*) // 32) in SQL,
# mirroring _neg_batches_for's per-dir policy (the parquet footer
# count and count(*) agree), so the oracle is valid at ANY sf_dir —
# including the dirty corpus and scale fixtures — instead of baking
# the sf0.01 constant at import.
_INBATCH_NEG_ORACLE = f"""
WITH RECURSIVE nhpairs AS (
  SELECT doc_a, doc_b FROM ({_HAMMING_PAIRS_ORACLE})
), nhedges AS (
  SELECT doc_a AS src, doc_b AS dst FROM nhpairs
  UNION
  SELECT doc_b, doc_a FROM nhpairs
), nhreach(node, r) AS (
  SELECT src, dst FROM nhedges
  UNION
  SELECT nhreach.node, e.dst FROM nhreach JOIN nhedges e ON nhreach.r = e.src
), nhcomp AS (
  SELECT node, LEAST(node, MIN(r)) AS cluster_id FROM nhreach GROUP BY node
), nbparams AS (
  SELECT greatest(16, count(*) // 32) AS n_batches FROM documents
), labeled AS (
  SELECT d.doc_id,
         COALESCE(c.cluster_id, d.doc_id) AS cl,
         {_H64.format(x="'negatives-v1:' || CAST(d.doc_id AS VARCHAR)")}
           % p.n_batches AS batch
  FROM documents d
  CROSS JOIN nbparams p
  LEFT JOIN nhcomp c ON d.doc_id = c.node
  WHERE d.doc_id IS NOT NULL
)
SELECT a.doc_id AS anchor_id, b.doc_id AS negative_id, a.batch
FROM labeled a JOIN labeled b
  ON a.batch = b.batch AND a.doc_id != b.doc_id AND a.cl != b.cl
"""


def ext_queries():
    return {
        "olap_pricing_summary": _q_pricing_summary,
        "olap_revenue_by_nation": _q_revenue_by_nation,
        "olap_topk_orders": _q_topk_orders,
        "olap_revenue_cube": _q_revenue_cube,
        "olap_small_qty_revenue": _q_small_qty_revenue,
        "olap_grouping_sets": _q_grouping_sets,
        "olap_market_share": _q_market_share,
        "olap_late_shipment_priority": _q_late_shipment_priority,
        "ts_gap_fill_daily": _q_gap_fill,
        "dedup_exact": _q_dedup_exact,
        "dedup_url_canonical": _q_dedup_url_canonical,
        "dedup_exact_128": _q_dedup_exact_128,
        "mm_image_near_dup": _q_mm_image_near_dup,
        "mm_audio_near_dup": _q_mm_audio_near_dup,
        "mm_video_near_dup": _q_mm_video_near_dup,
        "dedup_minhash_sigs": _q_minhash_signatures,
        "dedup_minhash_lsh_pairs": _q_lsh_pairs,
        "dedup_ngram_jaccard": _q_ngram_jaccard,
        "dedup_clusters": _q_dedup_clusters,
        "dedup_simhash": _q_simhash,
        "dedup_hamming_pairs": _q_hamming_pairs,
        "dedup_hamming_clusters": _q_hamming_clusters,
        "t_leakage_split": _q_leakage_split,
        "dedup_hamming_edges": _q_hamming_edges,
        "dedup_lsh_edges": _q_lsh_edges,
        "dedup_clusters_append": _q_clusters_append,
        "t_inbatch_negatives": _q_inbatch_negatives,
        "text_stats": _q_text_stats,
        "text_gopher_rules": _q_gopher_rules,
        "text_repetition": _q_text_repetition,
        "text_lang_id": _q_lang_id,
        "text_lang_id_ngram": _q_lang_id_ngram,
        "text_pii_scan": _q_pii_scan,
        "text_fingerprint": _q_fingerprint,
        "sim_cosine_topk": _q_cosine_topk,
        "s4_sliding_windowed": _q_sliding_windowed,
        "sim_ann_srp_topk": _q_ann_srp,
        "sim_ann_batched_topk": _q_ann_batched,
        "sim_ivf_topk": _q_ivf_topk,
        "sim_ivf_batched_topk": _q_ivf_batched,
        "sim_pq_topk": _q_pq_topk,
        "sim_pq_rerank_topk": _q_pq_rerank_topk,
        "sim_ivf_pq_batched_topk": _q_ivf_pq_topk,
        "sim_ivf_pq_rerank_topk": _q_ivf_pq_rerank_topk,
        "t_hard_negatives": _q_hard_negatives,
        "sim_embedding_near_dup": _q_embedding_near_dup,
        "dedup_semantic_pairs": _q_dedup_semantic_pairs,
        "dedup_semantic_clusters": _q_dedup_semantic_clusters,
        "text_hash_embed": _q_text_hash_embed,
        "dedup_semantic_text": _q_dedup_semantic_text,
        "sim_text_topk": _q_sim_text_topk,
        "sim_text_near_dup": _q_sim_text_near_dup,
        "rel_semi_join": _q_rel_semi_join,
        "rel_anti_join": _q_rel_anti_join,
        "rel_intersect": _q_rel_intersect,
        "rel_except": _q_rel_except,
        "rel_distinct_agg": _q_rel_distinct_agg,
        "rel_regex_month": _q_rel_regex_month,
        "rel_json_props": _q_rel_json_props,
        "rel_array_agg": _q_rel_array_agg,
        "rel_percentiles": _q_rel_percentiles,
        "rel_window_funcs": _q_rel_window_funcs,
        "rel_pivot": _q_rel_pivot,
        "rel_window_distinct": _q_rel_window_distinct,
        "rel_unpivot": _q_rel_unpivot,
        "rel_map_funcs": _q_rel_map_funcs,
        "sketch_kmv_distinct": _q_sketch_kmv,
        "sketch_cms_heavy_hitters": _q_sketch_cms,
        "mm_frame_sample": _q_mm_frame_sample,
        "dedup_contamination": _q_dedup_contamination,
        "dedup_substring_spans": _q_dedup_substring_spans,
        "s_stream_substring": _q_stream_substring,
        "dedup_substring_removed": _q_dedup_substring_removed,
        "rel_salted_join": _q_rel_salted_join,
        "pipeline_clean_corpus": _q_pipeline_clean,
        "udx_luhn": _q_udx_luhn,
        "udx_median_by_user": _q_udx_median,
        "udx_word_positions": _q_udx_word_positions,
        "olap_order_count_dist": _q_order_count_dist,
        "olap_big_ticket_orders": _q_big_ticket_orders,
        "olap_top_supplier": _q_top_supplier,
        "olap_returned_top_customers": _q_returned_top_customers,
        "olap_volume_shipping": _q_volume_shipping,
        "olap_promo_share": _q_promo_share,
        "olap_brand_brackets": _q_brand_brackets,
        "olap_rich_inactive": _q_rich_inactive,
        "ts_ohlc_daily": _q_ohlc_daily,
        "ts_interpolate_hourly": _q_interpolate_hourly,
        "t_hash_split": _q_hash_split,
        "text_tfidf_top_terms": _q_tfidf_top_terms,
        "text_bm25_topk": _q_text_bm25_topk,
        "sim_hybrid_rrf_topk": _q_sim_hybrid_rrf_topk,
        "s_stream_bm25_index": _q_stream_bm25_index,
        "text_bm25_topk_filtered": _q_text_bm25_topk_filtered,
        "s_stream_bm25_filtered": _q_stream_bm25_filtered,
        "s_stream_hybrid_rrf": _q_stream_hybrid_rrf,
        "text_vocab_topk": _q_vocab_topk,
        "text_bpe_vocab": _q_bpe_vocab,
        "t_pack_windows_real_bpe": _q_pack_windows_real_bpe,
        "text_bpe_encode": _q_bpe_encode,
        "funnel_conversion": _q_funnel_conversion,
        "cohort_retention": _q_cohort_retention,
        "rel_scd2_intervals": _q_scd2_intervals,
        "ts_zscore_anomalies": _q_zscore_anomalies,
        "ts_rolling_corr": _q_rolling_corr,
        "t_quantile_bins": _q_quantile_bins,
        "olap_local_supplier_revenue": _q_local_supplier_revenue,
        "q_profile_table": _q_profile_table,
        "dedup_edit_distance": _q_dedup_edit_distance,
        "t_global_shuffle": _q_global_shuffle,
        "pipeline_source_cap": _q_source_cap,
        "t_pack_windows": _q_pack_windows,
        "t_pack_windows_bpe": _q_pack_windows_bpe,
        "text_pmi_collocations": _q_pmi_collocations,
        "text_vocab_coverage": _q_vocab_coverage,
        "q_validate_orders": _q_validate_orders,
        "ts_decay_features": _q_decay_features,
        "olap_forecast_revenue": _q_forecast_revenue,
        "olap_sole_late_supplier": _q_sole_late_supplier,
        "olap_shipping_priority": _q_shipping_priority,
        "pipeline_curate_shards": _q_curate_shards,
        "pipeline_rag_index": _q_rag_index,
        "dedup_inc_append": _q_dedup_append,
        "dedup_inc_lsh_append": _q_lsh_append,
        "s_stream_lsh_index": _q_stream_lsh_index,
        "s_stream_semantic_index": _q_stream_semantic_index,
        "sim_index_topk_filtered": _q_sim_index_topk_filtered,
        "sim_pq_index_topk_filtered": _q_sim_pq_index_topk_filtered,
        "s_stream_semantic_text": _q_stream_semantic_text,
        "s_stream_semantic_pq": _q_stream_semantic_pq,
        "s_stream_semantic_text_pq": _q_stream_semantic_text_pq,
        "s_stream_hamming_index": _q_stream_hamming_index,
        "s_stream_cluster_maintain": _q_stream_cluster_maintain,
        "dedup_inc_append_bloom": _q_dedup_append_bloom,
        "dedup_source_overlap": _q_source_overlap,
        "t_weighted_sample": _q_weighted_sample,
        "t_temperature_mix": _q_temperature_mix,
        "t_token_budget_mix": _q_token_budget_mix,
        "t_epoch_mix": _q_epoch_mix,
        "rel_variant_props": _q_variant_props,
        "t_chunk_documents": _q_chunk_documents,
        "text_token_spectrum": _q_token_spectrum,
        "text_lm_score": _q_lm_score,
        "text_lm3_score": _q_lm3_score,
        "text_lm5_score": _q_lm5_score,
        "text_clean_boilerplate": _q_boilerplate_lines,
        "pipeline_quality_filter": _q_quality_filter,
        "text_quality_classifier": _q_quality_classifier,
        "pipeline_quality_filter_linear": _q_quality_filter_linear,
        "pipeline_quality_filter3": _q_quality_filter3,
        "pipeline_curate_mix": _q_pipeline_curate_mix,
        "text_ccnet_buckets": _q_ccnet_buckets,
        "s_stream_lm_score": _q_stream_lm_score,
        "s_stream_clf_score": _q_stream_clf_score,
        "s_stream_curate": _q_stream_curate,
        "s_stream_curate_near": _q_stream_curate_near,
        "s_stream_curate_clf_near": _q_stream_curate_clf_near,
        "sim_text_topk_filtered": _q_sim_text_topk_filtered,
        "s_stream_contamination": _q_stream_contamination,
        "sim_label_centroids": _q_label_centroids,
    }


def ext_oracles():
    return {
        "olap_pricing_summary": _pricing_oracle(),
        "olap_revenue_by_nation": _revenue_oracle(),
        "olap_topk_orders": _TOPK_ORDERS_ORACLE,
        "olap_revenue_cube": _cube_oracle(),
        "olap_small_qty_revenue": _small_qty_oracle(),
        "olap_grouping_sets": _grouping_sets_oracle(),
        "olap_market_share": _market_share_oracle(),
        "olap_late_shipment_priority": _LATE_SHIP_ORACLE,
        "ts_gap_fill_daily": _GAP_FILL_ORACLE,
        "dedup_exact": _DEDUP_EXACT_ORACLE,
        "dedup_url_canonical": _URL_CANONICAL_ORACLE,
        "dedup_exact_128": _DEDUP_EXACT_128_ORACLE,
        "mm_image_near_dup": _MM_NEAR_DUP_ORACLE,
        "mm_audio_near_dup": _MM_NEAR_DUP_ORACLE,
        "mm_video_near_dup": _MM_NEAR_DUP_ORACLE,
        "dedup_minhash_sigs": _MINHASH_ORACLE,
        "dedup_minhash_lsh_pairs": _LSH_ORACLE,
        "dedup_ngram_jaccard": _JACCARD_ORACLE,
        "dedup_clusters": _CLUSTERS_ORACLE,
        "dedup_simhash": _SIMHASH_ORACLE,
        "dedup_hamming_pairs": _HAMMING_PAIRS_ORACLE,
        "dedup_hamming_clusters": _HAMMING_CLUSTERS_ORACLE,
        "t_leakage_split": _LEAKAGE_SPLIT_ORACLE,
        "dedup_hamming_edges": _HAMMING_EDGES_ORACLE,
        "dedup_lsh_edges": _LSH_EDGES_ORACLE,
        "dedup_clusters_append": _HAMMING_CLUSTERS_ORACLE,
        "t_inbatch_negatives": _INBATCH_NEG_ORACLE,
        "text_stats": _TEXT_STATS_ORACLE,
        "text_gopher_rules": _GOPHER_RULES_ORACLE,
        "text_repetition": _REPETITION_ORACLE,
        "text_lang_id": _lang_oracle(),
        "text_lang_id_ngram": _lang_ngram_oracle(),
        "text_pii_scan": _pii_oracle(),
        "text_fingerprint": _FP_ORACLE,
        "sim_cosine_topk": _COSINE_TOPK_ORACLE,
        "sim_index_topk_filtered": _SIM_INDEX_TOPK_FILTERED_ORACLE_TMPL.format(
            n_queries=_N_QUERIES, k=_TOPK_K,
            cos=_COS_SQL.format(a="c.cq", b="q.qq"),
        ),
        "sim_pq_index_topk_filtered": _SIM_INDEX_TOPK_FILTERED_ORACLE_TMPL.format(
            n_queries=_N_QUERIES, k=_TOPK_K,
            cos=_COS_SQL.format(a="c.cq", b="q.qq"),
        ),
        "s4_sliding_windowed": _SLIDING_WINDOWED_ORACLE,
        "sim_ann_srp_topk": _ann_oracle(),
        "sim_ann_batched_topk": _ann_oracle(_BATCH_QUERY_PRED),
        "sim_ivf_topk": _ivf_oracle(),
        "sim_ivf_batched_topk": _ivf_oracle(_BATCH_QUERY_PRED, scaled_cells=True),
        "sim_pq_topk": _PQ_ORACLE,
        "sim_pq_rerank_topk": _pq_oracle(rerank=_PQ_RERANK),
        "sim_ivf_pq_batched_topk": _ivf_pq_oracle(),
        "sim_ivf_pq_rerank_topk": _ivf_pq_oracle(rerank=_IVF_PQ_RERANK),
        "t_hard_negatives": _ann_oracle("vec_id IS NOT NULL", max_cos=_NEAR_DUP_THRESHOLD),
        "sim_embedding_near_dup": _near_dup_oracle(),
        "dedup_semantic_pairs": _semantic_oracle(clusters=False),
        "dedup_semantic_clusters": _semantic_oracle(clusters=True),
        "text_hash_embed": _HASH_EMBED_ORACLE,
        "dedup_semantic_text": _semantic_text_oracle(),
        "sim_text_topk": _sim_text_topk_oracle(),
        "sim_text_near_dup": _sim_text_near_dup_oracle(),
        "rel_semi_join": _REL_SEMI_ORACLE,
        "rel_anti_join": _REL_ANTI_ORACLE,
        "rel_intersect": _REL_INTERSECT_ORACLE,
        "rel_except": _REL_EXCEPT_ORACLE,
        "rel_distinct_agg": _REL_DISTINCT_ORACLE,
        "rel_regex_month": _REL_REGEX_ORACLE,
        "rel_json_props": _REL_JSON_ORACLE,
        "rel_array_agg": _REL_ARRAY_ORACLE,
        "rel_percentiles": _REL_PCTL_ORACLE,
        "rel_window_funcs": _REL_WINDOW_ORACLE,
        "rel_pivot": _rel_pivot_oracle(),
        "rel_window_distinct": _REL_WDISTINCT_ORACLE,
        "rel_unpivot": _REL_UNPIVOT_ORACLE,
        "rel_map_funcs": _REL_MAP_ORACLE,
        "sketch_kmv_distinct": _KMV_ORACLE,
        "sketch_cms_heavy_hitters": _cms_oracle(),
        "mm_frame_sample": _MM_FRAME_ORACLE,
        "dedup_contamination": _CONTAMINATION_ORACLE,
        "dedup_substring_spans": _SUBSTRING_SPANS_ORACLE,
        "s_stream_substring": _SUBSTRING_SPANS_ORACLE,
        "dedup_substring_removed": _SUBSTRING_REMOVED_ORACLE,
        "rel_salted_join": _REL_SALTED_ORACLE,
        "pipeline_clean_corpus": _pipeline_oracle(),
        "udx_luhn": _luhn_oracle(),
        "udx_median_by_user": _UDX_MEDIAN_ORACLE,
        "udx_word_positions": _UDX_WORDPOS_ORACLE,
        "olap_order_count_dist": _ORDER_COUNT_DIST_ORACLE,
        "olap_big_ticket_orders": _BIG_TICKET_ORACLE,
        "olap_top_supplier": _top_supplier_oracle(),
        "olap_returned_top_customers": _returned_top_oracle(),
        "olap_volume_shipping": _volume_shipping_oracle(),
        "olap_promo_share": _promo_share_oracle(),
        "olap_brand_brackets": _brand_brackets_oracle(),
        "olap_rich_inactive": _rich_inactive_oracle(),
        "ts_ohlc_daily": _OHLC_ORACLE,
        "ts_interpolate_hourly": _INTERPOLATE_ORACLE,
        "t_hash_split": _HASH_SPLIT_ORACLE,
        "text_tfidf_top_terms": _TFIDF_ORACLE,
        "text_bm25_topk": _BM25_TOPK_ORACLE,
        "s_stream_bm25_index": _STREAM_BM25_ORACLE,
        "text_bm25_topk_filtered": _BM25_TOPK_FILTERED_ORACLE,
        "s_stream_bm25_filtered": _STREAM_BM25_FILTERED_ORACLE,
        "sim_hybrid_rrf_topk": _hybrid_rrf_oracle(
            cos=_COS_SQL.format(a="dc.cq", b="dq.qq")
        ),
        "s_stream_hybrid_rrf": _hybrid_rrf_oracle(
            cos=_COS_SQL.format(a="dc.cq", b="dq.qq"),
            src="(SELECT * FROM documents WHERE doc_id IS NOT NULL)"
                " documents",
            dense_pred="WHERE vec_id IS NOT NULL",
        ),
        "text_vocab_topk": _VOCAB_ORACLE,
        "text_bpe_vocab": _bpe_oracle(_BPE_K),
        "t_pack_windows_real_bpe": _pack_real_bpe_oracle(_BPE_K),
        "text_bpe_encode": _bpe_encode_oracle(_BPE_K),
        "funnel_conversion": _FUNNEL_ORACLE,
        "cohort_retention": _COHORT_ORACLE,
        "rel_scd2_intervals": _SCD2_ORACLE,
        "ts_zscore_anomalies": _ZSCORE_ORACLE,
        "ts_rolling_corr": _ROLLING_CORR_ORACLE,
        "t_quantile_bins": _QUANTILE_BINS_ORACLE,
        "olap_local_supplier_revenue": _local_supplier_oracle(),
        "q_profile_table": _profile_oracle(),
        "dedup_edit_distance": _EDIT_DISTANCE_ORACLE,
        "t_global_shuffle": _GLOBAL_SHUFFLE_ORACLE,
        "pipeline_source_cap": _SOURCE_CAP_ORACLE,
        "t_pack_windows": _PACK_WINDOWS_ORACLE,
        "t_pack_windows_bpe": _PACK_WINDOWS_BPE_ORACLE,
        "text_pmi_collocations": _PMI_ORACLE,
        "text_vocab_coverage": _VOCAB_COVERAGE_ORACLE,
        "q_validate_orders": _VALIDATE_ORACLE,
        "ts_decay_features": _DECAY_ORACLE,
        "olap_forecast_revenue": _FORECAST_REVENUE_ORACLE,
        "olap_sole_late_supplier": _SOLE_LATE_ORACLE,
        "olap_shipping_priority": _SHIPPING_PRIORITY_ORACLE,
        "pipeline_curate_shards": _curate_shards_oracle(),
        "pipeline_rag_index": _rag_index_oracle(),
        "dedup_inc_append": _DEDUP_APPEND_ORACLE,
        "dedup_inc_lsh_append": _LSH_APPEND_ORACLE,
        "s_stream_lsh_index": _LSH_ORACLE,
        "s_stream_semantic_index": _semantic_oracle(clusters=False),
        "s_stream_semantic_text": _semantic_text_ivf_pairs_oracle(),
        "s_stream_semantic_pq": _stream_semantic_pq_oracle(),
        "s_stream_semantic_text_pq": _stream_semantic_text_pq_oracle(),
        "s_stream_hamming_index": _HAMMING_PAIRS_ORACLE,
        "s_stream_cluster_maintain": _HAMMING_CLUSTERS_ORACLE,
        "dedup_inc_append_bloom": _DEDUP_APPEND_ORACLE,
        "dedup_source_overlap": _SOURCE_OVERLAP_ORACLE,
        "t_weighted_sample": _WEIGHTED_SAMPLE_ORACLE,
        "t_temperature_mix": _TEMPERATURE_MIX_ORACLE,
        "t_token_budget_mix": _TOKEN_BUDGET_ORACLE,
        "t_epoch_mix": _EPOCH_MIX_ORACLE,
        "rel_variant_props": _VARIANT_PROPS_ORACLE,
        "t_chunk_documents": _CHUNK_DOCS_ORACLE,
        "text_token_spectrum": _TOKEN_SPECTRUM_ORACLE,
        "text_lm_score": _LM_SCORE_ORACLE,
        "text_lm3_score": _LM3_SCORE_ORACLE,
        "text_lm5_score": _LM5_SCORE_ORACLE,
        "text_clean_boilerplate": _BOILERPLATE_ORACLE,
        "pipeline_quality_filter": _QUALITY_FILTER_ORACLE,
        "text_quality_classifier": _quality_classifier_oracle(),
        "pipeline_quality_filter_linear": _quality_filter_linear_oracle(),
        "pipeline_quality_filter3": _QUALITY_FILTER3_ORACLE,
        "pipeline_curate_mix": _curate_mix_oracle(),
        "text_ccnet_buckets": _CCNET_BUCKETS_ORACLE,
        "s_stream_lm_score": _LM_SCORE_ORACLE,
        "s_stream_clf_score": _quality_classifier_oracle(),
        "s_stream_curate": _STREAM_CURATE_ORACLE,
        "s_stream_curate_near": _stream_curate_near_oracle(),
        "s_stream_curate_clf_near": _stream_curate_clf_near_oracle(),
        "sim_text_topk_filtered": _sim_text_topk_filtered_oracle(),
        "s_stream_contamination": _CONTAMINATION_ORACLE,
        "sim_label_centroids": _LABEL_CENTROIDS_ORACLE,
    }
