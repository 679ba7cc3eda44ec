"""Deterministic sampling (training-data pipeline extension).

Training pipelines sample corpora constantly (eval splits, ablation
subsets, per-source mixing ratios). ``DataFrame.sample`` is seed-stable
only per partitioning — a repartition or scale-up silently changes the
sample, and ``rand()`` re-evaluates per reference (see the rand()
pathology note in streaming/sliding_agg.py's history). These operators
instead hash the ROW IDENTITY (md5-derived ``h64``, cross-engine
reproducible): membership is a pure function of the id, stable under
any partitioning, cluster size, or engine — and exactly twinned in a
SQL oracle.

100 TB: membership is a scan-side predicate (one md5 per row, codegen,
no shuffle) — the filter pushes into the scan stage; per-stratum rates
are a broadcast map join only when rates come as a table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h64

#: Granularity of sampling fractions: rates are expressed in 1/10000ths
#: (0.01 %), keeping membership integer-exact in both engines.
RATE_DENOM = 10_000


def _bucket(id_col: str, salt: str) -> Column:
    """Stable per-row bucket in [0, RATE_DENOM): md5-derived from the
    row id and a salt (different salts -> independent samples).

    NULL-PROPAGATING concat, not concat_ws: concat_ws silently drops
    NULL args, so a NULL id would hash the bare salt into a constant
    bucket — sampled in or out by accident. With concat the bucket is
    NULL and the membership filter excludes the row by documented rule
    (mirrors the oracles' ``'salt:' || CAST(id AS VARCHAR)``, where
    ``||`` propagates NULL — the engine-wide seed-prefix convention)."""
    return F.pmod(
        h64(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
        F.lit(RATE_DENOM),
    )


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    id_col: str,
    salt: str = "sample",
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by id hash: reproducible under
    any partitioning/engine; disjoint samples via different salts."""
    threshold = int(round(fraction * RATE_DENOM))
    return df.filter(_bucket(id_col, salt) < threshold)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    id_col: str,
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-source mixing
    ratios): stratum ``s`` keeps ~``fractions[s]`` of its rows, strata
    absent from the map keep ``default_fraction``. The rate lookup is a
    literal CASE expression (no join, scan-side)."""
    expr = F.lit(int(round(default_fraction * RATE_DENOM)))
    for stratum, frac in sorted(fractions.items()):
        expr = (
            F.when(F.col(strata_col) == stratum, int(round(frac * RATE_DENOM)))
            .otherwise(expr)
        )
    return df.filter(_bucket(id_col, salt) < expr)


def weighted_sample(
    df: DataFrame,
    weight_col: str | Column,
    id_col: str,
    salt: str = "wsample",
) -> DataFrame:
    """Per-row Bernoulli keep with probability = that row's WEIGHT
    (clamped to [0, 1]) — importance downsampling: keep high-quality
    documents with high probability and low-quality ones rarely,
    instead of the all-or-nothing threshold cut.

    Same determinism contract as the other samplers: the coin is the
    md5-derived id bucket (stable under partitioning/engine/scale),
    and the per-row threshold is the weight quantized to integer
    1/10000ths — membership is integer-exact, so a SQL oracle
    reproduces it bit-for-bit. Scan-side predicate: one md5 + a few
    arithmetic ops per row, no shuffle, pushes into the scan stage.

    NULL weights count as 0 (row excluded) — made EXPLICIT via
    ``coalesce`` rather than relying on NULL failing the filter, so a
    dirty weight column shrinks the sample by documented rule, not by
    accident; pre-clean or ``coalesce`` upstream to keep such rows.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w = F.coalesce(w, F.lit(0.0))
    threshold = F.least(
        F.greatest(F.round(w * RATE_DENOM).cast("long"), F.lit(0)),
        F.lit(RATE_DENOM),
    )
    return df.filter(_bucket(id_col, salt) < threshold)


#: Quantum for the pow(n, tau) weights feeding the mixture
#: normalizer: summing RAW doubles across strata would be
#: addition-order-dependent (engines disagree in ulps); rounding each
#: weight to 1e-6 first makes the normalizer an EXACT bigint sum.
POW_QUANT = 1_000_000


def temperature_mixture(
    df: DataFrame,
    tau: float = 0.7,
    strata_col: str = "source",
    id_col: str = "doc_id",
    target_fraction: float = 0.5,
    salt: str = "tmix",
) -> DataFrame:
    """Temperature-based source mixing (the XLM-R / Pile recipe,
    arXiv:1911.02116 §3.1): resample so source ``s`` contributes a
    share ∝ ``n_s^tau`` of the output — ``tau < 1`` flattens the
    mixture toward rare sources, ``tau = 1`` preserves natural
    proportions. The per-source keep rate is

        rate_s = target_fraction * N * (n_s^tau / Σ_t n_t^tau) / n_s

    clamped to [0, 1]: this operator only DOWNSAMPLES (a rate > 1
    means the recipe wants that source repeated — epochs, not
    sampling — so rare sources saturate at keeping everything, the
    standard single-epoch behavior).

    Fully relational — counts, the normalizer, and rates are
    aggregates joined back broadcast; nothing collects. Membership is
    the same md5 id-hash coin as every sampler here (stable under
    partitioning/engine/scale). Rows with NULL ``strata_col`` are
    EXCLUDED (no provenance → no mixing weight; the join is
    null-unsafe by documented rule). Determinism: every arithmetic
    step is integer-exact or IEEE-correctly-rounded EXCEPT ``pow(n,
    tau)`` itself (libm, ±1 ulp across engines) — its result is
    quantized to 1e-6 before use, so a cross-engine flip needs the
    true value within ~1e-10 of a rounding boundary (the same
    documented residual-risk class as the auto_cells log2 tie).
    """
    n = F.col("__n").cast("double")
    qpow = F.expr(
        f"cast(round(pow(cast(__n as double), {tau}) * {POW_QUANT}) as bigint)"
    )
    counts = (
        df.where(F.col(strata_col).isNotNull())
        .groupBy(strata_col)
        .agg(F.count("*").alias("__n"))
        .withColumn("__qpow", qpow)
    )
    tots = counts.agg(
        F.sum("__n").alias("__ntot"), F.sum("__qpow").alias("__z")
    )
    rates = counts.crossJoin(F.broadcast(tots)).select(
        strata_col,
        F.least(
            F.lit(RATE_DENOM),
            F.greatest(
                F.lit(0),
                F.round(
                    (
                        (F.lit(target_fraction) * F.col("__ntot").cast("double"))
                        * (
                            F.col("__qpow").cast("double")
                            / F.col("__z").cast("double")
                        )
                        / n
                    )
                    * RATE_DENOM
                ).cast("long"),
            ),
        ).alias("__qrate"),
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(_bucket(id_col, salt) < F.col("__qrate"))
        .drop("__qrate")
    )


def token_budget_mix(
    df: DataFrame,
    weights: dict[str, int],
    budget_tokens: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "budget-v1",
) -> DataFrame:
    """TOKEN-budget source mixing: select documents so each source
    contributes (just under, plus at most one document over) its
    weighted share of a total token budget — "sample 100 B tokens at
    these mixture weights", the unit pretraining recipes are actually
    written in (the Pile / LLaMA data tables quote token shares, not
    document counts; :func:`temperature_mixture` is the doc-count
    twin for when weights should DERIVE from corpus sizes).

    ``weights`` maps source → basis points (integer 1/10000ths — the
    engine-wide ``RATE_DENOM`` convention; they need not sum to
    10000). Per source, ``target_s = budget_tokens * bp_s div 10000``
    (integer floor), documents order by the deterministic md5 shuffle
    hash ``(h64(salt:id), id)`` — a reproducible uniform order, the
    ``cap_per_source`` rank — and a document is kept while the
    running token total BEFORE it is still under the target: the
    selection meets the target and overshoots by less than one
    document, the classic greedy budget cut. Output: the kept rows +
    ``n_tokens`` (whitespace count, the engine-wide token convention)
    and ``cum_tokens`` (running total through this row — feed it to a
    monitoring sink to see how full each source's budget ran).

    Exclusions, all documented one-way doors: sources ABSENT from
    ``weights`` contribute nothing (the recipe IS the weight table);
    NULL ``strata_col`` rows have no weight to join; NULL ids have no
    deterministic rank (h64(NULL) is NULL — the ``cap_per_source``
    rule); NULL text has no token count and cannot draw down a
    budget.

    Scale shape: token counting is scan-side codegen; the weight
    table is vocab-sized and broadcast; the ONE shuffle is the
    per-source window (same key as every mixer here). A source's
    rows land in one window partition — at pathological single-source
    skew, pre-trim with ``cap_per_source(presort_cap=...)`` first (the
    budget cut is rank-prefix-stable under that trim whenever the
    survivors still cover the target).
    """
    from ..functions.text import _TOKENS
    from ..session import local_rows
    from pyspark.sql import Window

    wrows = [(s, int(bp)) for s, bp in sorted(weights.items())]
    wtab = local_rows(
        df.sparkSession, wrows, f"{strata_col} string, __bp int"
    ).withColumn(
        "__target",
        F.expr(
            f"cast({int(budget_tokens)}L * __bp div {RATE_DENOM} as bigint)"
        ),
    )
    toks = F.expr(f"size({_TOKENS.format(c=text_col)})").cast("long")
    w = Window.partitionBy(strata_col).orderBy("__h", id_col)
    cum = F.sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.where(
            F.col(id_col).isNotNull()
            & F.col(text_col).isNotNull()
            & F.col(strata_col).isNotNull()
        )
        .withColumn("n_tokens", toks)
        .join(F.broadcast(wtab), strata_col)
        # the RAW shuffle hash (not the RATE_DENOM bucket): the order
        # key must be collision-sparse, the cap_per_source rank
        .withColumn(
            "__h",
            h64(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
        )
        .withColumn("cum_tokens", cum)
        .where(F.col("cum_tokens") - F.col("n_tokens") < F.col("__target"))
        .drop("__bp", "__target", "__h")
    )


def token_budget_mix_epochs(
    df: DataFrame,
    weights: dict[str, int],
    budget_tokens: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "budget-v1",
    max_epochs: int = 4,
) -> DataFrame:
    """Epoch-aware token-budget mixing — the data-constrained regime
    (Muennighoff et al. 2023, "Scaling Data-Constrained Language
    Models", arXiv:2305.16264): when a source's weighted token target
    EXCEEDS its corpus, :func:`token_budget_mix` silently under-fills;
    this variant repeats the source for up to ``max_epochs`` epochs
    (the paper's finding: ~4 epochs of repeated data are nearly as
    good as fresh data, with rapidly diminishing returns after) and
    reports how many epochs each kept row came from.

    Semantics: per source, ``n_epochs = clamp(ceil(target /
    corpus_tokens), 1, max_epochs)`` (exact integer arithmetic —
    ``(target + corpus - 1) div corpus``); every eligible document is
    replicated once per epoch; rows order by ``(epoch, h64(salt:e<ep>:
    id), id)`` — a FRESH deterministic shuffle per epoch, so repeated
    epochs present the corpus in different orders (the recipe's
    reshuffle-between-epochs convention) — and the greedy budget cut
    runs over the concatenated stream: full epochs survive whole, the
    last epoch is cut mid-stream, overshoot < one document. A source
    whose budget still exceeds ``max_epochs`` full epochs stops there
    (the diminishing-returns cap) — visible to monitoring because its
    last row's ``cum_tokens`` sits below ``n_epochs * corpus`` ...
    or rather below the target while ``epoch = n_epochs - 1``.

    Output: the kept rows + ``epoch`` (0-based), ``n_tokens``,
    ``cum_tokens`` (running across ALL epochs of the source) and
    ``n_epochs`` (the per-source replication the budget demanded).
    Exclusion rules are exactly :func:`token_budget_mix`'s.

    Scale shape: one extra per-source token-total aggregate vs the
    base mixer (a source-count-sized table, broadcast back); the
    replication is a scan-side ``explode(sequence(...))`` whose factor
    is ≤ ``max_epochs``; the ONE window shuffle keys on the source,
    unchanged. ``max_epochs`` bounds the blow-up by construction.
    """
    from pyspark.sql import Window

    from ..functions.text import _TOKENS
    from ..session import local_rows

    if max_epochs < 1:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    wrows = [(s, int(bp)) for s, bp in sorted(weights.items())]
    wtab = local_rows(
        df.sparkSession, wrows, f"{strata_col} string, __bp int"
    ).withColumn(
        "__target",
        F.expr(
            f"cast({int(budget_tokens)}L * __bp div {RATE_DENOM} as bigint)"
        ),
    )
    toks = F.expr(f"size({_TOKENS.format(c=text_col)})").cast("long")
    eligible = (
        df.where(
            F.col(id_col).isNotNull()
            & F.col(text_col).isNotNull()
            & F.col(strata_col).isNotNull()
        )
        .withColumn("n_tokens", toks)
        .join(F.broadcast(wtab), strata_col)
    )
    totals = eligible.groupBy(strata_col).agg(
        F.sum("n_tokens").alias("__corpus")
    )
    w = Window.partitionBy(strata_col).orderBy("epoch", "__h", id_col)
    cum = F.sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        eligible.join(F.broadcast(totals), strata_col)
        .withColumn(
            "n_epochs",
            F.expr(
                "cast(least(cast(%d as bigint), greatest(1L,"
                " case when __corpus > 0"
                " then (__target + __corpus - 1) div __corpus"
                " else 1 end)) as int)" % int(max_epochs)
            ),
        )
        .withColumn("epoch", F.explode(F.expr("sequence(0, n_epochs - 1)")))
        .withColumn(
            "__h",
            h64(
                F.concat(
                    F.lit(salt + ":e"),
                    F.col("epoch").cast("string"),
                    F.lit(":"),
                    F.col(id_col).cast("string"),
                )
            ),
        )
        .withColumn("cum_tokens", cum)
        .where(F.col("cum_tokens") - F.col("n_tokens") < F.col("__target"))
        .drop("__bp", "__target", "__h", "__corpus")
    )
