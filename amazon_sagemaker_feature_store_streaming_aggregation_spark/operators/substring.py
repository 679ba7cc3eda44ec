"""Substring-level (long-span) deduplication — the Lee et al. 2021
pass ("Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499): remove any run of >= k tokens that appears verbatim
more than once across the corpus. Doc-level fuzzy dedup (MinHash /
SimHash / SemDeDup, ``operators/dedup.py``/``similarity.py``) misses
templated pages that share long boilerplate runs inside otherwise
distinct documents; this pass catches exactly those.

Re-expression for Spark (the paper builds a corpus-wide suffix array —
a global sorted structure with no good distributed analogue at this
granularity): a repeated run of length >= k contains, and is exactly
covered by, the repeated k-token windows inside it. So:

1. shingle every document into its k-token windows scan-side and hash
   each window with the engine-standard 60-bit ``h64`` (tokens joined
   by a single space — tokens cannot contain whitespace, so the join
   is boundary-unambiguous);
2. a window hash occurring >= ``min_count`` times CORPUS-WIDE
   (within-document repeats count, per the paper) marks every one of
   its occurrences as duplicated;
3. per document, merge the marked windows' ``[pos, pos+k)`` token
   extents into maximal disjoint spans (gaps-and-islands over one
   window shuffle on the doc id).

Every stage is linear in the number of token windows: the count
aggregate is map-side combinable, the mark join is a semi join whose
build side carries ONE row per duplicated hash (AQE's skew handling
covers Zipf-hot boilerplate hashes on the probe side), and no stage
ever emits occurrence PAIRS — unlike the near-dup pair family there is
no quadratic blowup to cap, so this needs no ``band_max`` analogue.

Removal (:func:`remove_repeated_spans`) is token-stream surgery at the
scan: rebuild each text keeping only tokens outside the merged spans.
Output text is single-space joined (whitespace-normalizing by
construction — the standard tokenized-pipeline contract, stated here
because the paper's suffix-array variant cuts raw character ranges
instead).

Reference anchor: the reference pipeline has no corpus-dedup stage at
all (its corpus is keyed transactions —
``src/lambda/StreamingIngestAggFeatures/lambda_function.py`` ingests
by unique id); this operator extends the engine toward LLM training
corpora alongside the rest of the dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import _let_bound, _parallelize_scan

#: Tokenizer shared with functions/text.py (kept textually identical —
#: the DuckDB oracle twin is list_filter(regexp_split_to_array(...))).
_TOKS = "filter(split(trim({c}), '\\\\s+'), t -> t != '')"


def _span_rows(docs: DataFrame, id_col: str, text_col: str, k: int):
    """(id, pos, sh) for every k-token window: pos = 0-based token
    index of the window start, sh = h64 of the space-joined window.
    Docs with fewer than k tokens (or NULL text) emit nothing; NULL
    ids are excluded wholesale (no provenance -> their windows neither
    count toward occurrence totals nor receive extents — the
    engine-wide null-unsafe rule, same as the index runners)."""
    docs = docs.where(F.col(id_col).isNotNull())
    windows = f"""
      case when size(__tk) >= {k} then
        transform(
          sequence(0, size(__tk) - {k}),
          i -> named_struct(
            'pos', cast(i as bigint),
            'sh', cast(conv(substring(
                    md5(array_join(slice(__tk, i + 1, {k}), ' ')),
                    1, 15), 16, 10) as bigint)
          )
        )
      else array() end
    """
    spans = _let_bound(_TOKS.format(c=text_col), "__tk", windows)
    return (
        _parallelize_scan(docs)
        .select(F.col(id_col), F.explode(F.expr(spans)).alias("__s"))
        .select(id_col, F.col("__s.pos").alias("pos"), F.col("__s.sh").alias("sh"))
    )


def repeated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    min_count: int = 2,
) -> DataFrame:
    """Merged repeated-span extents per document: ``(id, span_start,
    span_end, n_windows)`` with ``[span_start, span_end)`` a maximal
    token-index range covered by k-token windows whose hash occurs at
    least ``min_count`` times corpus-wide, and ``n_windows`` the
    number of marked windows merged into the span (multiplicity
    included when the same (id, pos) arrives twice — duplicated
    corpus ROWS duplicate their windows, per the paper's
    count-every-occurrence rule).

    Shuffle census: one groupBy(sh) count (map-combined) + one
    semi join on sh to mark occurrences, then one doc-keyed window
    for the gaps-and-islands merge — three exchanges, all O(windows).
    Deterministic under duplicate (id, pos) rows: the island break
    flag depends only on the sorted pos multiset, so tie order cannot
    change the merged extents.
    """
    spans = _span_rows(docs, id_col, text_col, k)
    dup = (
        spans.groupBy("sh")
        .agg(F.count("*").alias("__cnt"))
        .where(F.col("__cnt") >= min_count)
        .select("sh")
    )
    return merge_marked_windows(
        spans.join(dup, "sh", "left_semi"), id_col, k
    )


def merge_marked_windows(
    marked: DataFrame, id_col: str, k: int
) -> DataFrame:
    """Gaps-and-islands merge of marked k-token windows ``(id, pos)``
    into maximal disjoint span extents ``(id, span_start, span_end,
    n_windows)`` — the final stage of :func:`repeated_spans`, shared
    with the streaming runner's read API
    (``streaming/substring.py::read_repeated_spans``), so batch and
    streaming spans can never diverge on merge semantics. One
    doc-keyed window over the marked rows (O(marked windows))."""
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = (
        F.max("pos").over(w.rowsBetween(Window.unboundedPreceding, -1))
        + F.lit(k)
    )
    grp = (
        marked.withColumn(
            "__brk",
            F.when(F.col("pos") > F.coalesce(prev_end, F.lit(-1)), 1)
            .otherwise(0),
        )
        .withColumn(
            "__isl",
            F.sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return grp.groupBy(id_col, "__isl").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(k)).cast("long").alias("span_end"),
        F.count("*").alias("n_windows"),
    ).drop("__isl")


def remove_repeated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    min_count: int = 2,
) -> DataFrame:
    """Substring surgery: one output row per input row with
    ``text_clean`` = the text minus all tokens inside
    :func:`repeated_spans` extents (single-space rejoined),
    ``n_tokens`` = the original token count, ``n_removed`` = tokens
    cut. NULL text stays NULL (no text -> no clean text; counts NULL
    too); a fully-covered document keeps an EMPTY string — the delete
    happened, the row survives for downstream length filters to drop.
    NULL-id rows pass through with zero removals (they are outside
    span accounting entirely — see :func:`repeated_spans`), their
    text whitespace-normalized like every other survivor.

    The extents table is doc-keyed and sparse (only documents with a
    repeated run); it joins back as a collected per-doc array (one
    shuffle on the id — left to the planner, broadcast when it fits)
    and the token filter runs scan-side: O(tokens x extents-per-doc),
    extents disjoint so each token tests few intervals.
    """
    ext = (
        repeated_spans(docs, id_col, text_col, k, min_count)
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct("span_start", "span_end")).alias("__ext")
        )
    )
    kept = _let_bound(
        _TOKS.format(c=text_col),
        "__tk",
        f"""named_struct(
          'n', size(__tk),
          'kept', filter(__tk, (t, i) ->
            __ext is null or not exists(__ext,
              e -> i >= e.span_start and i < e.span_end))
        )""",
    )
    out = docs.join(ext, id_col, "left").withColumn("__r", F.expr(kept))
    return out.select(
        id_col,
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
        .otherwise(F.array_join(F.col("__r.kept"), " "))
        .alias("text_clean"),
        F.col("__r.n").cast("long").alias("n_tokens"),
        (F.col("__r.n") - F.size("__r.kept")).cast("long").alias("n_removed"),
    )
