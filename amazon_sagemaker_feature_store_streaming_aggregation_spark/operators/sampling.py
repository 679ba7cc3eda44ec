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
    row id and a salt (different salts -> independent samples)."""
    return F.pmod(h64(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))),
                  F.lit(RATE_DENOM))


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
