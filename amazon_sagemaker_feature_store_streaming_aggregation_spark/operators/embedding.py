"""In-engine text embeddings via feature hashing (the "hashing trick",
Weinberger et al. 2009, "Feature Hashing for Large Scale Multitask
Learning", ICML).

Closes the semantic family's fixture dependency: until now every
semantic operator (``semantic_dedup_pairs``, ``cosine_topk``, the
standing vector index) consumed a pre-computed ``embeddings.embedding``
column. :func:`embed_text_hashed` derives the vector FROM the text, so
documents → embedding → near-dup/ANN runs end to end inside the engine.

Semantics (signed feature hashing, the classic construction):

* tokens = whitespace-split, lower-cased (the engine-wide ``_TOKENS``
  tokenizer from ``functions/text.py`` — one tokenizer, zero drift);
* per token ``t``: ``h = h64(lower(t))`` (the md5-derived 60-bit hash,
  ``functions/hashing.py``), bucket ``j = h mod dims``, sign
  ``s = +1 if (h div dims) mod 2 == 0 else -1`` — index and sign come
  from DISJOINT bits of one hash, the ξ/h split of the paper (§3);
* raw vector ``hvec[j] = Σ s`` over token OCCURRENCES (signed tf);
  the signs make the inner product an unbiased kernel estimate;
* ``norm2 = Σ hvec[j]²`` — exact int64 (norm2 ≤ n_tokens², so any
  document under ~3·10⁹ tokens is overflow-free);
* ``embedding[j] = float32(hvec[j] / sqrt(norm2))`` — the L2-normalized
  API-compatible column every downstream similarity operator consumes;
* ``q_micro[j] = round(hvec[j] * 1e6 / sqrt(norm2))`` — the engine's
  integer micro-unit convention, derived in ONE fixed IEEE op sequence
  (exact-int → double multiply → correctly-rounded sqrt/divide → round)
  so DuckDB reproduces it bit-for-bit.

Plan shape (the 100 TB story): everything is scan-side JVM higher-order
array expressions on the document row — tokenize, hash, fold, norm.
ZERO shuffles, zero UDFs, zero driver actions; embedding 100 TB of text
is exactly as parallel as reading it. The fold is O(n_tokens · dims)
integer adds per document; at the default dims=64 that is ~64 adds per
token — far below one md5 — and beats the explode→groupBy(doc, dim)
alternative, which would shuffle one row per token occurrence. For
dims ≥ ~1k prefer the explode form; this operator targets the
near-dup/clustering regime (64–256 dims), matching the fixture
``embeddings`` table's 64.

NULL text ⇒ NULL vector columns (downstream zero-norm guards drop
them); empty/whitespace-only text ⇒ all-zero ``hvec``, ``norm2 = 0``,
NULL ``embedding``/``q_micro`` (cosine is undefined at zero norm — the
same exclusion rule as ``operators/similarity.py::_ivf_assign``).

FAN-OUT CONTRACT (important): the fold is an interpreted higher-order
expression, and Catalyst's CollapseProject INLINES it into every
downstream reference — a similarity join that touches the embedding
three times per candidate pair re-runs the whole fold three times per
pair (measured: brute-force cosine top-k over 5,000 docs went
150 s → 1.2 s with a barrier). MATERIALIZE the embedded frame before
any fan-out consumption: ``.localCheckpoint()`` in-session, or — the
production shape at 100 TB — write the embeddings to a table once and
read them back, exactly how real pipelines treat embeddings as a
persisted artifact. A single linear pass (the ``text_hash_embed``
gate, a streaming batch that is checkpointed immediately) needs no
barrier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import _TOKENS

#: micro-unit scale shared with operators/similarity.py (QUANT)
EMBED_QUANT = 1_000_000

#: md5-derived 60-bit hash as a SQL expression fragment (the
#: functions/hashing.h64 convention, usable inside lambda bodies where
#: Column functions can't reach)
_H64_SQL = "cast(conv(substring(md5({x}), 1, 15), 16, 10) as bigint)"


def embed_text_hashed(
    docs: DataFrame,
    dims: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "embedding",
    grams: tuple[int, int] | None = None,
) -> DataFrame:
    """Append signed-feature-hashing embedding columns to ``docs``.

    Output columns (added): ``hvec array<bigint>`` (raw signed counts),
    ``norm2 bigint``, ``<out_col> array<float>`` (L2-normalized),
    ``q_micro array<bigint>`` (micro-unit integer form, what the
    similarity operators' ``quantize`` would produce up to the float32
    round-trip — see :func:`embedding` note below).

    ``<out_col>`` is float32 for schema compatibility with the fixture
    ``embeddings.embedding`` column; quantizing it back (as every
    similarity operator does) costs one correctly-rounded float32
    round-trip, which the oracles mirror exactly.

    ``grams=(lo, hi)`` swaps the feature stream from whitespace TOKENS
    to CHARACTER n-grams (all lengths lo..hi) of the lower-cased,
    whitespace-normalized text — the standard robustness upgrade for
    near-dup embeddings: word-level hashing treats a one-character
    typo as a whole-token substitution (the bag moves by two full
    token weights), while overlapping char-grams keep most features
    shared, so edited near-dups stay close in cosine (pinned in
    tests/test_hash_embed.py). Both variants are bag models —
    word-level is already reorder-invariant; char-grams additionally
    survive token-INTERNAL edits. Cost: (hi-lo+1) hashes per character
    instead of one per token — still scan-side, zero shuffles; the
    gated keys keep the word-level default.
    """
    if dims < 2 or dims > 4096:
        raise ValueError(f"dims must be in [2, 4096], got {dims}")
    # the O(n_tokens * dims) fold runs at the scan: an under-split
    # local input (single parquet file -> 1 split) would serialize
    # every document's fold onto one task. Guarded no-op on real
    # splits and streaming frames (the dedup.py rule).
    from .dedup import _parallelize_scan

    docs = _parallelize_scan(docs)
    if grams is not None:
        lo, hi = grams
        if not (1 <= lo <= hi <= 16):
            raise ValueError(
                f"grams must satisfy 1 <= lo <= hi <= 16, got {grams}"
            )
        # whitespace-normalize + lower ONCE, then slide every window
        # length over the string (single-space joins keep token
        # boundaries as features, the fastText convention). Short
        # strings guard: Spark's sequence(1, 0) counts DOWN.
        norm = (
            f"lower(array_join({_TOKENS.format(c=text_col)}, ' '))"
        )
        per_n = ", ".join(
            f"case when length(__nt) >= {n} then "
            f"transform(sequence(1, length(__nt) - {n} + 1), "
            f"i -> substring(__nt, i, {n})) else array() end"
            for n in range(lo, hi + 1)
        )
        # bind the normalized text ONCE via a 1-element transform (the
        # repo's _let_bound idiom): the window slicer references it
        # (hi-lo+1) times, and inlining the normalization per window
        # length would re-run the tokenize+join per reference
        feats = (
            f"case when {text_col} is null then null else "
            f"transform(array({norm}), __nt -> concat({per_n}))[0] end"
        )
        hashes = f"transform({feats}, t -> {_H64_SQL.format(x='t')})"
    else:
        toks = _TOKENS.format(c=text_col)
        hashes = f"transform({toks}, t -> {_H64_SQL.format(x='lower(t)')})"
    # fold token hashes into the dims-wide signed count vector:
    # acc[j] += sign for each token hashing to bucket j
    hvec = (
        f"aggregate({hashes}, array_repeat(0L, {dims}), "
        f"(acc, h) -> transform(acc, (v, i) -> "
        f"case when i = cast(h % {dims} as int) "
        f"then v + (case when (h div {dims}) % 2 = 0 then 1L else -1L end) "
        f"else v end))"
    )
    out = docs.withColumn("hvec", F.expr(hvec)).withColumn(
        "norm2", F.expr("aggregate(hvec, 0L, (acc, v) -> acc + v * v)")
    )
    # zero-norm -> NULL vectors (cosine undefined); the when() guard
    # keeps ANSI mode from raising on the 0 divisor
    inv_ok = F.col("norm2") > 0
    out = out.withColumn(
        out_col,
        F.when(
            inv_ok,
            F.expr(
                "transform(hvec, v -> cast(cast(v as double)"
                " / sqrt(cast(norm2 as double)) as float))"
            ),
        ),
    ).withColumn(
        "q_micro",
        F.when(
            inv_ok,
            F.expr(
                f"transform(hvec, v -> cast(round(cast(v as double)"
                f" * {EMBED_QUANT}.0 / sqrt(cast(norm2 as double))) as bigint))"
            ),
        ),
    )
    return out
