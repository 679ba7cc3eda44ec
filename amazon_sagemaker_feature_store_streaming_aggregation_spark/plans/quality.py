"""In-flight data-quality observation for ingest plans.

A production ingest refuses to publish a batch whose quality counters
fail (null keys, non-positive amounts, out-of-range timestamps). The
naive implementation runs separate ``count()`` queries — extra full
scans of the batch. Spark's ``Observation`` API attaches aggregate
metrics to the SAME pass that materializes the data: the counters
ride the job that writes the output, cost nothing extra, and are
available on the driver the moment the action finishes.

``ingest_quality_gate`` wires the standard counters onto a
transaction batch; ``check_quality`` turns them into a hard gate.
The reference has no equivalent (its Lambda counts failures one
``put_record`` at a time); this is the distributed replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def ingest_quality_gate(
    df: DataFrame,
    key: str = "cc_num",
    amount: str = "amount",
    ts: str = "datetime",
) -> tuple[DataFrame, Observation]:
    """Attach quality counters to ``df``'s next materialization.

    Returns ``(df_observed, observation)`` — run any ONE action on
    ``df_observed`` (write, count, collect), then read
    ``observation.get``: ``rows``, ``null_keys``,
    ``nonpositive_amounts``, ``null_ts``. No second scan.
    """
    obs = Observation("ingest_quality")
    # coalesce(.., 0): sum over ZERO rows is NULL, and check_quality's
    # comparisons would TypeError on None — an empty batch must read
    # as all-zero counters (same convention as profile_table).
    # The amount predicate is null-tolerant explicitly: (NULL <= 0) is
    # NULL and a bare conditional sum would silently SKIP null amounts
    # — a batch of all-NULL amounts must not pass as "0 nonpositive",
    # so nulls get their own counter.
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.coalesce(
            F.sum(F.col(key).isNull().cast("long")), F.lit(0)
        ).alias("null_keys"),
        F.coalesce(
            F.sum((F.col(amount) <= 0).cast("long")), F.lit(0)
        ).alias("nonpositive_amounts"),
        F.coalesce(
            F.sum(F.col(amount).isNull().cast("long")), F.lit(0)
        ).alias("null_amounts"),
        F.coalesce(
            F.sum(F.col(ts).isNull().cast("long")), F.lit(0)
        ).alias("null_ts"),
    )
    return observed, obs


def check_quality(
    observation: Observation,
    max_null_keys: int = 0,
    max_nonpositive_amounts: int | None = None,
    max_null_amounts: int | None = None,
) -> dict:
    """Gate on the observed counters (call AFTER the action); raises
    ``ValueError`` naming every violated bound, else returns the
    metrics dict."""
    m = observation.get
    problems = []
    if (
        max_null_amounts is not None
        and m["null_amounts"] > max_null_amounts
    ):
        problems.append(
            f"null_amounts={m['null_amounts']} > {max_null_amounts}"
        )
    if m["null_keys"] > max_null_keys:
        problems.append(
            f"null_keys={m['null_keys']} > {max_null_keys}"
        )
    if (
        max_nonpositive_amounts is not None
        and m["nonpositive_amounts"] > max_nonpositive_amounts
    ):
        problems.append(
            f"nonpositive_amounts={m['nonpositive_amounts']} > "
            f"{max_nonpositive_amounts}"
        )
    if problems:
        raise ValueError("ingest quality gate failed: " + "; ".join(problems))
    return dict(m)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Column-level data profile: per column, row/null/distinct counts
    and (for numeric columns) an exact integer-cent min/max — the
    first thing a data-quality pass or schema-drift monitor computes
    over a new partition drop.

    Plan: ONE aggregation pass computes every column's counters
    side-by-side (Spark evaluates all aggregate expressions in the
    same partial/final pair — profiling N columns costs one scan, not
    N); the per-column rows come from unpivoting the 1-row result with
    ``stack``, which is a scan-side Expand over one row.

    ``approx=False`` (the oracle path) keeps distinct counts EXACT —
    each adds a distinct-aggregate Expand over the single pass, the
    right trade for a maintenance query. ``approx=True`` swaps in
    ``approx_count_distinct`` (HLL++, default rsd 5 %): constant
    sketch state, NO Expand multiplication of the scan — the shape to
    use when the profile runs per micro-batch or over 100 TB where N
    exact distincts would N-plicate shuffle bytes.
    """
    from pyspark.sql import types as T

    cols = columns or df.columns
    aggs = []
    # positional aliases + backticked source references: column names
    # are arbitrary (spaces, reserved words) and must never be spliced
    # bare into generated SQL; coalesce keeps the null counter 0 (not
    # NULL) on an empty table, matching the documented semantics
    for i, c in enumerate(cols):
        bq = "`" + c.replace("`", "``") + "`"  # embedded backticks double
        aggs.append(F.count("*").alias(f"__n_{i}"))
        aggs.append(
            F.coalesce(
                F.sum(F.col(c).isNull().cast("long")), F.lit(0)
            ).alias(f"__nn_{i}")
        )
        if approx:
            aggs.append(
                F.approx_count_distinct(F.col(c)).alias(f"__nd_{i}")
            )
        else:
            aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{i}"))
        if isinstance(df.schema[c].dataType, (T.DoubleType, T.FloatType)):
            num = f"CAST(round({bq} * 100) AS BIGINT)"
        elif isinstance(
            df.schema[c].dataType, (T.LongType, T.IntegerType, T.ShortType)
        ):
            num = f"CAST({bq} AS BIGINT) * 100"
        else:
            num = "CAST(NULL AS BIGINT)"
        aggs.append(F.expr(f"min({num})").alias(f"__lo_{i}"))
        aggs.append(F.expr(f"max({num})").alias(f"__hi_{i}"))
    one = df.agg(*aggs)
    triples = ", ".join(
        f"'{c.replace(chr(39), chr(39) * 2)}', __n_{i}, __nn_{i}, __nd_{i}, "
        f"CAST(__lo_{i} AS DOUBLE) / 100.0, CAST(__hi_{i} AS DOUBLE) / 100.0"
        for i, c in enumerate(cols)
    )
    return one.select(
        F.expr(f"stack({len(cols)}, {triples})").alias(
            "column", "n_rows", "n_nulls", "n_distinct", "min_value",
            "max_value",
        )
    )


def validate_table(
    df: DataFrame,
    not_null: list[str] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
    accepted: dict[str, list[str]] | None = None,
    unique: list[list[str]] | None = None,
    foreign_keys: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Declarative constraint validation (the dbt-test / Deequ shape):
    run a rule suite against a table, return one row per rule with its
    violation count — ``(rule: string, n_violations: long)``.

    Rule families and their plan cost:

    * ``not_null`` / ``ranges`` / ``accepted`` — row-local predicates;
      ALL of them evaluate as conditional sums in ONE aggregation over
      ONE scan, regardless of how many rules there are (the Deequ
      "scan-share" trick; never one job per rule).
    * ``unique`` — excess-row count ``n_rows - n_distinct_keys`` per
      key set: one map-side-combined distinct aggregate per key set.
    * ``foreign_keys`` — ``(col, ref_df, ref_col)``: orphan rows via
      left-anti join against the referenced key set (null FKs are not
      violations, per SQL FK semantics). The reference side is
      projected to its bare key column before the join; broadcast when
      small, shuffled otherwise — Catalyst/AQE's choice.

    Results union into one DataFrame; each non-row-local rule adds its
    own (cheap, key-only) job, the row-local block always costs one.
    """
    labels = (
        [f"not_null:{c}" for c in not_null or []]
        + [f"range:{c}" for c in ranges or {}]
        + [f"accepted:{c}" for c in accepted or {}]
        + [f"unique:{','.join(cols)}" for cols in unique or []]
        + [f"foreign_key:{col}" for col, _r, _rc in foreign_keys or []]
    )
    dupes = sorted({l for l in labels if labels.count(l) > 1})
    if dupes:
        # fail fast with the offending rules — a duplicated column in
        # a generated rule list would otherwise surface as an
        # ambiguous-alias/map-key AnalysisException mid-job
        raise ValueError(f"validate_table: duplicate rules {dupes}")

    parts: list[DataFrame] = []

    exprs = []
    for c in not_null or []:
        exprs.append(
            F.coalesce(F.sum(F.col(c).isNull().cast("long")), F.lit(0))
            .alias(f"not_null:{c}")
        )
    for c, (lo, hi) in (ranges or {}).items():
        exprs.append(
            F.coalesce(
                F.sum(
                    (
                        F.col(c).isNull()
                        | (F.col(c) < F.lit(lo))
                        | (F.col(c) > F.lit(hi))
                    ).cast("long")
                ),
                F.lit(0),
            ).alias(f"range:{c}")
        )
    for c, vals in (accepted or {}).items():
        exprs.append(
            F.coalesce(
                F.sum(
                    (F.col(c).isNull() | ~F.col(c).isin(vals)).cast("long")
                ),
                F.lit(0),
            ).alias(f"accepted:{c}")
        )
    if exprs:
        one = df.agg(*exprs)
        names = [f.name for f in one.schema.fields]
        parts.append(
            one.select(
                F.explode(
                    F.map_from_arrays(
                        F.array(*[F.lit(n) for n in names]),
                        F.array(*[F.col(f"`{n}`") for n in names]),
                    )
                ).alias("rule", "n_violations")
            )
        )

    for cols in unique or []:
        label = f"unique:{','.join(cols)}"
        # SQL-unique semantics: NULL key components never conflict
        # (each null-keyed row is its own key). count_distinct DROPS
        # tuples with any NULL component, so the naive
        # count(*) - count_distinct would report every null-keyed row
        # as a phantom violation; compare against the fully-non-null
        # row count instead.
        non_null = F.coalesce(
            F.sum(
                F.expr(
                    " AND ".join(f"`{c}` IS NOT NULL" for c in cols)
                ).cast("long")
            ),
            F.lit(0),
        )
        parts.append(
            df.agg(
                (non_null - F.count_distinct(*[F.col(c) for c in cols]))
                .cast("long")
                .alias("n_violations")
            ).select(F.lit(label).alias("rule"), "n_violations")
        )

    for col, ref_df, ref_col in foreign_keys or []:
        label = f"foreign_key:{col}"
        orphans = (
            df.select(col)
            .where(F.col(col).isNotNull())
            .join(
                ref_df.select(F.col(ref_col).alias(col)).distinct(),
                on=col,
                how="left_anti",
            )
        )
        parts.append(
            orphans.agg(F.count("*").alias("n_violations")).select(
                F.lit(label).alias("rule"), "n_violations"
            )
        )

    if not parts:
        raise ValueError("validate_table: no rules given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
