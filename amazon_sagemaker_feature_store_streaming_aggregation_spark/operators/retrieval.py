"""Lexical (BM25) retrieval and rank fusion over a document corpus.

The keyword leg of a retrieval stack (extension scope — the reference
has no text surface; the builder's brief names large-scale text
analysis as first-class): ``bm25_topk`` is sparse keyword search,
``rrf_fuse`` combines it with the dense ANN family
(``operators/similarity.py``) into hybrid search — the standard
production pairing (vector recall + lexical precision) behind every
RAG retrieval tier.

Determinism contract (the engine-wide rule, same as ``operators/
lm.py`` and ``tfidf.py``): no ``ln``/``pow`` ever reaches a hashed
value — libm is not correctly rounded and differs by ulps across
engines. BM25 here uses the RAW Robertson idf ratio
``(N - df + 0.5) / (df + 0.5)`` (the argument of the textbook ``ln``,
spelled ``(2N - 2df + 1) / (2df + 1)`` so both operands stay exact
integers) — per-term monotonicity in ``df`` is identical to the log
form; a single-engine deployment that wants textbook log-idf swaps
one marked expression. With ``k1 = 1.2 = 6/5`` and ``b = 0.75 = 3/4``
pinned, the tf saturation term is likewise an exact integer rational::

    tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))        avgdl = T/N
      == 44*T*tf / (20*T*tf + 6*T + 18*dl*N)          (x 20*T)

so each (term, doc) contribution is two correctly-rounded IEEE
divisions of exact integers, one multiply, and a half-up round to
micro-units (bigint). Every operand is exact below 2^53 (the double-
mantissa bound: fine to ~10^14 corpus tokens; beyond that, pre-scale
the quantum). The per-document score is an INTEGER sum of those
quantized contributions — addition-order-independent, so bit-equal
across engines and partitionings, the property the repo's DuckDB
hash gate checks every round.

Scale shape (100 TB posture): the corpus is touched by exactly one
shuffle (the ``(doc, term)`` tf aggregation, map-side combined);
document length and term df re-aggregate that table, never the raw
token stream. Query terms broadcast into the tf table — the
inverted-index prune: only documents sharing a query term are ever
scored. Nothing all-pairs, nothing collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# single tokenizer source, shared with lm/tfidf/quality (oracle twin:
# list_filter(regexp_split_to_array(trim(c), '\s+'), t -> t != ''))
from ..functions.text import _TOKENS

#: score quantum: each (term, doc) BM25 contribution is
#: round(contribution * BM25_QUANT) as bigint (micro-units). idf
#: ratio <= 2N+1, tf part < 2.2, so contributions fit bigint with
#: ~10^12 headroom.
BM25_QUANT = 1_000_000

#: THE per-(term, doc) quantized-BM25 contribution expression —
#: every BM25-emitting surface (this operator, the standing-index
#: probe in streaming/retrieval.py, and the DuckDB oracle twins)
#: spells THIS string so the op order can never drift. Expects
#: columns tf, df, dl, n_docs, t_tokens in scope. Swap the first
#: factor for ln((n_docs - df + 0.5)/(df + 0.5)) to get textbook
#: log-idf on a single engine.
BM25_CONTRIB_SQL = (
    "cast(round((1000000.0"
    " * (cast(2*n_docs - 2*df + 1 as double)"
    "    / cast(2*df + 1 as double)))"
    " * ((44.0 * cast(t_tokens as double) * cast(tf as double))"
    "    / (20.0 * cast(t_tokens as double) * cast(tf as double)"
    "       + 6.0 * cast(t_tokens as double)"
    "       + 18.0 * cast(dl as double) * cast(n_docs as double)))"
    ") as bigint)"
)


def _doc_terms(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One (id, lower-cased term) row per token occurrence. NULL/empty
    text yields no rows (split(NULL) -> NULL, explode(NULL) -> 0 rows
    — same routing as the DuckDB unnest(list_filter(NULL)) twin)."""
    toks = _TOKENS.format(c=text_col)
    return docs.select(
        F.col(id_col),
        F.explode(F.expr(f"transform({toks}, t -> lower(t))")).alias("term"),
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    exclude_self: bool = False,
    predicate=None,
) -> DataFrame:
    """Per-query top-``k`` documents by quantized-BM25 (k1=1.2,
    b=0.75 pinned — see the module contract).

    ``queries`` carries ``(query_id_col, text_col)``; its DISTINCT
    lower-cased terms are matched (query-side tf is ignored, the
    usual short-query convention). Output ``(query_id, <id_col>,
    bm25_q, rank)`` — ``bm25_q`` is the micro-unit integer score,
    rank ties broken by ascending document id; queries with no
    tokens or no matching document emit nothing. ``exclude_self``
    drops the ``query_id == id`` hit for corpus-drawn queries (the
    ``cosine_topk`` convention, used by the hybrid composition).

    ``predicate`` (a SQL string or Column over ``docs``' metadata
    columns) restricts CANDIDACY only — a document scores iff ANY of
    its rows passes — while the corpus statistics (N, T, df, dl)
    stay global: the deployed IR-engine behavior (a filter narrows
    the result set, never the ranking model) and the BM25 analogue
    of the vector family's geometry-from-the-unfiltered-corpus rule.
    Filtering happens before the scoring join (filter-then-rank,
    never rank-then-discard); the predicate lands on its own
    column-pruned docs scan producing the allowed-id list.

    Plan: the corpus text is scanned, exploded, and shuffled exactly
    ONCE — the (doc, term) tf aggregation, map-side combined — and
    eagerly materialized (``localCheckpoint``, the house rule for a
    frame with multiple differently-keyed consumers: ReuseExchange
    cannot collapse them because each consumer prunes different
    columns, so without this the explode+shuffle runs three times —
    for candidates, df, and dl). df and T re-aggregate the
    materialized tf; dl aggregates only the CANDIDATE docs' tf rows;
    N is a count-only corpus scan (column-pruned to parquet
    metadata); query terms broadcast-join tf (the inverted-index
    prune) so only matching docs are ever scored.
    """
    tf = (
        _doc_terms(docs, id_col, text_col)
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    n_tokens = tf.agg(F.sum("tf").alias("t_tokens"))

    qterms = (
        _doc_terms(queries, query_id_col, text_col)
        .select(F.col(query_id_col).alias("query_id"), "term")
        .distinct()
    )
    df_tbl = (
        tf.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    matches = tf.join(F.broadcast(qterms), "term")
    if predicate is not None:
        from .similarity import _apply_predicate

        allowed = _apply_predicate(docs, predicate).select(id_col)
        matches = matches.join(allowed, id_col, "left_semi")
    dl = (
        tf.join(matches.select(id_col).distinct(), id_col, "left_semi")
        .groupBy(id_col)
        .agg(F.sum("tf").alias("dl"))
    )
    cand = (
        matches.join(F.broadcast(df_tbl), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(n_tokens))
    )
    if exclude_self:
        cand = cand.where(F.col(id_col) != F.col("query_id"))
    scored = (
        cand.withColumn("__c", F.expr(BM25_CONTRIB_SQL))
        .groupBy("query_id", id_col)
        .agg(F.sum("__c").alias("bm25_q"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25_q").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select("query_id", id_col, "bm25_q", "rank")
    )


def rrf_fuse(
    lex: DataFrame,
    dense: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    dense_id_col: str = "vec_id",
    k0: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of a lexical and a dense ranked list
    (Cormack/Clarke/Buettcher 2009's k0=60 default): both inputs are
    ``(query_id, <id>, ..., rank)`` frames (the ``bm25_topk`` /
    ``cosine_topk`` contract); output ``(query_id, <id_col>, rrf,
    rank)`` with ``rrf = 1/(k0+rank_lex) + 1/(k0+rank_dense)`` — a
    missing leg contributes 0.

    Determinism: each reciprocal is ONE correctly-rounded IEEE
    division, and the two-leg sum is spelled in fixed (lex + dense)
    order — no aggregation-order dependence, bit-equal cross-engine.
    Plan: a full-outer join on (query_id, id) of two already-top-k
    frames — both sides are O(queries x k), trivially re-rankable
    wherever the legs were computed.
    """
    a = lex.select(
        "query_id", F.col(id_col).alias("__id"), F.col("rank").alias("__rl")
    )
    b = dense.select(
        "query_id",
        F.col(dense_id_col).alias("__id"),
        F.col("rank").alias("__rd"),
    )
    fused = (
        a.join(b, ["query_id", "__id"], "full_outer")
        .withColumn(
            "rrf",
            F.expr(
                f"coalesce(1.0 / ({k0} + cast(__rl as double)), 0.0)"
                f" + coalesce(1.0 / ({k0} + cast(__rd as double)), 0.0)"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("__id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select("query_id", F.col("__id").alias(id_col), "rrf", "rank")
    )
