"""URL canonicalization (functions/url.py) + URL-level dedup
(operators/dedup.py::dedup_url_canonical).

The canonical form is the documented rewrite chain (case, www.,
default ports, fragments, trailing slashes, tracking params, param
sort); unparseable/NULL urls canonicalize to NULL and join no dedup
group. The gated dedup_url_canonical pair checks the same chain
against DuckDB; this file pins the per-case behavior so a rule change
is a visible diff, not a silent hash flip.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark import local_rows
from amazon_sagemaker_feature_store_streaming_aggregation_spark.functions.url import (
    with_canonical_url,
)
from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
    dedup_url_canonical,
)

CASES = [
    # identity
    ("https://news.example.com/articles/5", "https://news.example.com/articles/5"),
    # case + default https port + trailing slash
    ("HTTPS://News.Example.COM:443/articles/5/", "https://news.example.com/articles/5"),
    # www. + pure-tracking query collapses away entirely
    (
        "https://www.news.example.com/articles/5?utm_source=rss&utm_medium=feed",
        "https://news.example.com/articles/5",
    ),
    # param sort + fragment drop
    (
        "https://news.example.com/articles/5?b=2&a=1#section",
        "https://news.example.com/articles/5?a=1&b=2",
    ),
    # http default port + tracking param amid real params
    (
        "http://other.example.org:80/items/5?fbclid=xyz&x=9",
        "http://other.example.org/items/5?x=9",
    ),
    # no scheme -> NULL (identifies no page)
    ("news.example.com/articles/5", None),
    # surrounding whitespace + root path
    ("  https://a.b/  ", "https://a.b"),
    # NON-default port stays; case-insensitive tracking match
    ("https://a.b:8080/x/?REF=1&z=2&ref=3", "https://a.b:8080/x?z=2"),
    # other schemes keep their (non-default-for-http) ports
    ("ftp://Files.Example.com:21/pub/", "ftp://files.example.com:21/pub"),
    (None, None),
    ("", None),
    ("https://", None),  # empty authority
    # valueless params; empty params dropped; survivors sorted
    ("http://H.co/p?utm_campaign&gclid=1&&c=3&b", "http://h.co/p?b&c=3"),
]


def test_canonical_url_cases(spark):
    df = local_rows(
        spark, [(i, u) for i, (u, _) in enumerate(CASES)], "i int, url string"
    )
    got = {
        r["i"]: r["canonical_url"]
        for r in with_canonical_url(df).collect()
    }
    for i, (u, want) in enumerate(CASES):
        assert got[i] == want, (u, got[i], want)


def test_dedup_url_canonical_groups(spark):
    """Surface variants of one logical URL collapse into one group
    (min id kept, distinct docs counted); unparseable urls and NULL
    ids join nothing; the domain column is the canonical host."""
    rows = [
        (1, "https://news.example.com/articles/9"),
        (2, "HTTPS://News.Example.COM:443/articles/9/"),
        (3, "https://www.news.example.com/articles/9?utm_source=rss"),
        (4, "https://news.example.com/articles/9?b=2&a=1"),
        (5, "not a url"),
        (None, "https://news.example.com/articles/9"),
        (2, "HTTPS://News.Example.COM:443/articles/9/"),  # dup row
        (7, "https://other.example.org:8443/x"),
    ]
    out = dedup_url_canonical(
        local_rows(spark, rows, "doc_id long, url string")
    ).collect()
    by_url = {r["canonical_url"]: r for r in out}
    assert set(by_url) == {
        "https://news.example.com/articles/9",
        "https://news.example.com/articles/9?a=1&b=2",
        "https://other.example.org:8443/x",
    }
    plain = by_url["https://news.example.com/articles/9"]
    assert plain["keep_id"] == 1 and plain["n_docs"] == 3
    assert plain["domain"] == "news.example.com"
    q = by_url["https://news.example.com/articles/9?a=1&b=2"]
    assert q["keep_id"] == 4 and q["n_docs"] == 1
    assert by_url["https://other.example.org:8443/x"]["domain"] == "other.example.org:8443"


def test_dedup_url_canonical_feeds_cap_per_source(spark):
    """The per-domain output plugs straight into cap_per_source: cap
    the deduped pages per domain (RefinedWeb's per-domain limits)."""
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.training_data import (
        cap_per_source,
    )

    rows = [
        (i, f"https://bulk.example.com/p/{i}") for i in range(10)
    ] + [(100, "https://rare.example.org/only")]
    deduped = dedup_url_canonical(
        local_rows(spark, rows, "doc_id long, url string")
    )
    capped = cap_per_source(
        deduped.select(
            F.col("keep_id").alias("doc_id"), F.col("domain").alias("source")
        ),
        cap=3,
    )
    counts = {
        r["source"]: r["n"]
        for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"bulk.example.com": 3, "rare.example.org": 1}


def test_dedup_append_infers_index_hash_width(spark):
    """dedup_append derives the batch-side key width from the
    persisted index's text_hash dtype (bigint=h64, string=h128), so a
    64-bit index and a 128-bit batch can never silently join across
    key spaces; an unexpected dtype is refused loudly."""
    import pytest as _pytest

    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.dedup import (
        build_text_hash_index,
        dedup_append,
    )

    corpus = local_rows(
        spark,
        [(1, "alpha"), (2, "beta")],
        "doc_id long, text string",
    )
    batch = local_rows(
        spark,
        [(10, "alpha"), (11, "gamma"), (12, "gamma")],
        "doc_id long, text string",
    )
    for bits, dtype in ((64, "bigint"), (128, "string")):
        idx = build_text_hash_index(corpus, hash_bits=bits)
        assert dict(idx.dtypes)["text_hash"] == dtype
        fresh = dedup_append(idx, batch)
        assert [r["doc_id"] for r in fresh.collect()] == [11]
    bad = local_rows(spark, [(1.5,)], "text_hash double")
    with _pytest.raises(ValueError, match="dtype 'double'"):
        dedup_append(bad, batch).collect()


def test_image_near_dup_matches_bruteforce(spark):
    """image_near_dup_pairs (decode -> dhash -> band -> verify) equals
    the brute-force all-pairs hamming over the same perceptual hashes
    on the dHash-invertible PPM fixture — recall 1 at
    max_hamming < bands by pigeonhole, pinned here against the real
    decoder path. NULL ids (None payloads) join nothing."""
    from entry_ext import _q_mm_image_near_dup  # the fixture builder
    from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
        image_near_dup_pairs,  # noqa: F401  (imported by the query)
    )

    from tests.conftest import SF0001

    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in _q_mm_image_near_dup(spark, SF0001).collect()
    }
    # brute force from the closed-form dhash values
    import itertools

    import pyarrow.parquet as pq

    from entry_ext import _MM_PHASH_MASKS, _mm_phash_h

    ids = [
        x.as_py()
        for x in pq.read_table(
            f"{SF0001}/documents.parquet", columns=["doc_id"]
        ).column("doc_id")
        if x.as_py() is not None
    ]
    h = {i: _mm_phash_h(i // 4) ^ _MM_PHASH_MASKS[i % 4] for i in ids}
    want = {
        (a, b, bin(h[a] ^ h[b]).count("1"))
        for a, b in itertools.combinations(sorted(ids), 2)
        if bin(h[a] ^ h[b]).count("1") <= 3
    }
    assert got == want and len(want) > 0
