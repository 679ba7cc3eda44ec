"""URL canonicalization — the standard FIRST pass of public web-corpus
curation recipes (RefinedWeb arXiv:2306.01116 §3.2, CCNet arXiv:
1911.00359): before any content dedup, collapse the surface variants
of the same logical URL (case, ``www.``, default ports, tracking
params, parameter order, fragments) so URL-level exact dedup and
per-domain caps see one key per logical page. Orders of magnitude
cheaper than content dedup — pure scan-side string work, no shuffle —
which is exactly why the recipes run it first at 100 TB.

Canonical form, precisely (every step a deterministic string rewrite,
mirrored verbatim by the DuckDB oracle in the gate):

1. trim; parse ``scheme://authority/path?query#fragment``. A string
   with no ``scheme://`` or an empty authority canonicalizes to NULL
   — an unparseable URL identifies no page and must join no dedup
   group (the engine-wide NULL-key rule); callers route those rows
   explicitly.
2. scheme and host lowercase; one leading ``www.`` stripped.
3. default port stripped: ``:80`` for http, ``:443`` for https (other
   ports are semantic and stay).
4. fragment dropped (client-side only, never reaches the server).
5. trailing ``/``s stripped from the path (``/a/`` ≡ ``/a``; root
   path ≡ empty).
6. query: split on ``&``; empty params and TRACKING params dropped
   (``utm_*``, ``gclid``, ``fbclid``, ``msclkid``, ``igshid``,
   ``mc_cid``, ``mc_eid``, ``ref``, ``ref_src`` — case-insensitive,
   matched with or without a value); survivors sorted by their full
   ``k=v`` text (binary order) and rejoined — parameter ORDER is
   transport noise, parameter CONTENT is not.

Deliberately NOT done (they change which resource is fetched or need
out-of-band data): percent-decoding, IDN/punycode folding, path
``..`` resolution, session-id heuristics beyond the fixed tracking
list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: tracking params dropped from query strings (lowercased match, with
#: or without '=value'); the fixed, documented list above
TRACKING_PARAM_RE = (
    "^(utm_[^=&]*|gclid|fbclid|msclkid|igshid|mc_cid|mc_eid|ref|ref_src)(=.*)?$"
)

# one scheme regex everywhere: letter then letters/digits/+/./-
_SCHEME_RE = "^[A-Za-z][A-Za-z0-9+.-]*://"


def canonical_url_sql(c: str) -> str:
    """Spark-SQL expression string computing the canonical URL of
    column ``c`` (docstring steps 1-6). Exposed as a template so the
    registered DuckDB oracle can assert the identical rewrite chain
    step for step."""
    u = f"trim({c})"
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    # strip fragment first, then the scheme prefix
    nofrag = f"regexp_replace({u}, '#.*$', '')"
    after = f"regexp_replace({nofrag}, '{_SCHEME_RE}', '')"
    auth = f"regexp_extract({after}, '^([^/?]*)', 1)"
    pathq = f"substr({after}, length({auth}) + 1)"
    path = f"regexp_replace({pathq}, '[?].*$', '')"
    query = (
        f"CASE WHEN instr({pathq}, '?') > 0 "
        f"THEN substr({pathq}, instr({pathq}, '?') + 1) ELSE '' END"
    )
    host = f"regexp_replace(lower({auth}), '^www\\\\.', '')"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({host}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({host}, ':443$', '') "
        f"ELSE {host} END"
    )
    cpath = f"regexp_replace({path}, '/+$', '')"
    params = (
        f"filter(split({query}, '&'), p -> p != '' AND NOT "
        f"lower(p) RLIKE '{TRACKING_PARAM_RE}')"
    )
    cq = f"array_join(array_sort({params}), '&')"
    return (
        f"CASE WHEN {scheme} = '' OR {host} = '' THEN NULL "
        f"ELSE concat({scheme}, '://', {host}, {cpath}, "
        f"CASE WHEN {cq} = '' THEN '' ELSE concat('?', {cq}) END) END"
    )


def canonical_host_sql(c: str) -> str:
    """Spark-SQL expression for the host (registrable domain + any
    non-default port) of an ALREADY-CANONICAL URL column — the
    per-domain grouping key the source-cap policies consume."""
    return f"regexp_extract({c}, '^[a-z][a-z0-9+.-]*://([^/?]*)', 1)"


def with_canonical_url(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    """Add ``out_col`` = the canonical form of ``url_col`` (module
    docstring rules; NULL for NULL/unparseable input). Pure scan-side
    string expressions — no UDF, no shuffle: at 100 TB this runs
    inside the same whole-stage-codegen pass as the scan."""
    return df.withColumn(out_col, F.expr(canonical_url_sql(url_col)))
