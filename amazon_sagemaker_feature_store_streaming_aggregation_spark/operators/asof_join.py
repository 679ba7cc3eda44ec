"""Distributed as-of join (backward, inclusive) — a first-class form of
the reference's point-lookup-with-staleness semantics.

The reference's inference path (``lambda_function.py:110-135`` +
``MaximumRecordAgeInSeconds``/staleness cutoff, SURVEY I3/I4) is an
as-of lookup: each event reads the most recent feature record at or
before its own event time, discarded when older than a tolerance. This
operator generalizes that into the standard time-series join (pandas
``merge_asof``, DuckDB/kdb ``ASOF JOIN``) as a native Spark plan.

Spark-first design
------------------
Spark has no AsOfJoin node, and the naive formulation — a non-equi
theta join ``l.ts >= r.ts`` + latest-per-pair dedup — explodes to
O(|L| x |R|) per key. Instead: UNION the build rows into the probe
stream and sweep with ``last(..., ignorenulls=True)`` over
``(key) ORDER BY (ts, side)`` — ONE hash exchange on the key, one
sort, one O(n) running window frame, no Python. Build rows sort
before probe rows at equal timestamps (side 0 < 1), giving the
inclusive ``probe.ts >= build.ts`` match of DuckDB ``ASOF JOIN`` /
``merge_asof(allow_exact_matches=True)``.

100 TB: the shuffle carries each row once, keyed by the join key
(high-cardinality -> even spread); cost is a sort-merge pass, the same
envelope as the E1 window. A hot key serializes one partition — the
mitigation is the same bucket pre-aggregation rewrite as
``trailing_window_features_bucketed`` (probe rows only need the LAST
build row per bucket).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str = "ts",
    build_ts: str = "ts",
    value_cols: Sequence[str] | None = None,
    tolerance_us: int | None = None,
    matched_ts_col: str = "matched_ts",
) -> DataFrame:
    """For every probe row, attach the columns of the LATEST build row
    of the same ``key`` with ``build_ts <= probe_ts`` (backward,
    inclusive). Probe rows with no qualifying build row keep NULLs
    (left-join semantics).

    ``value_cols``: build columns to carry (default: all except key and
    timestamp). ``tolerance_us``: if set, matches older than this many
    microseconds are discarded (NULLed) — the reference's staleness
    cutoff (I4) as a join parameter. ``matched_ts_col``: output column
    holding the matched build row's timestamp (NULL when unmatched).

    Build rows must be unique per ``(key, build_ts)`` — with duplicates
    the surviving row is sort-nondeterministic; pre-dedupe with
    latest_per_key if needed.
    """
    if value_cols is None:
        value_cols = [c for c in build.columns if c not in (key, build_ts)]
    clash = set(value_cols) & set(probe.columns)
    if clash:
        # the output would otherwise carry DUPLICATE column names (the
        # select succeeds; every downstream reference then throws
        # AMBIGUOUS_REFERENCE) — the canonical same-schema time-series
        # case hits this with default arguments, so fail fast
        raise ValueError(
            f"as-of value columns {sorted(clash)} collide with probe "
            "columns — rename them on one side or pass value_cols"
        )

    side = "__side"  # 0 = build, 1 = probe: build first at equal ts
    ts = "__asof_ts"
    vprefix = "__asof_v_"

    p = probe.select(
        "*",
        F.unix_micros(F.col(probe_ts).cast("timestamp")).alias(ts),
        F.lit(1).alias(side),
    )
    b = build.select(
        F.col(key),
        F.unix_micros(F.col(build_ts).cast("timestamp")).alias(ts),
        F.lit(0).alias(side),
        *[F.col(c).alias(vprefix + c) for c in value_cols],
    )
    u = p.unionByName(b, allowMissingColumns=True)

    w = (
        Window.partitionBy(key)
        .orderBy(ts, side)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    build_ts_val = F.when(F.col(side) == 0, F.col(ts))
    # The value sweep carries ONE STRUCT of all value columns, not a
    # per-column last(): the struct is non-null for every build row
    # even when its fields are null, so the sweep atomically picks the
    # LATEST build row. Independent per-column ignorenulls sweeps
    # would resurrect an OLDER row's non-null value wherever the
    # matched row legitimately holds NULL — values from two different
    # build rows stitched into one match.
    sweeps = [F.last(build_ts_val, ignorenulls=True).over(w).alias("__m_ts")]
    if value_cols:
        build_row = F.when(
            F.col(side) == 0,
            F.struct(*[F.col(vprefix + c).alias(c) for c in value_cols]),
        )
        sweeps.append(
            F.last(build_row, ignorenulls=True).over(w).alias("__m_row")
        )
    matched = u.select("*", *sweeps).filter(F.col(side) == 1)

    fresh = F.col("__m_ts").isNotNull()
    if tolerance_us is not None:
        fresh = fresh & ((F.col(ts) - F.col("__m_ts")) <= F.lit(tolerance_us))

    out_cols = [F.col(c) for c in probe.columns]
    out_cols.append(
        F.when(fresh, F.timestamp_micros(F.col("__m_ts")))
        .alias(matched_ts_col)
    )
    out_cols += [
        F.when(fresh, F.col("__m_row").getField(c)).alias(c)
        for c in value_cols
    ]
    return matched.select(*out_cols)
