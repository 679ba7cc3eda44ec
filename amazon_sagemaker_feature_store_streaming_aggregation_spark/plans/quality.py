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
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col(key).isNull().cast("long")).alias("null_keys"),
        F.sum((F.col(amount) <= 0).cast("long")).alias(
            "nonpositive_amounts"
        ),
        F.sum(F.col(ts).isNull().cast("long")).alias("null_ts"),
    )
    return observed, obs


def check_quality(
    observation: Observation,
    max_null_keys: int = 0,
    max_nonpositive_amounts: int | None = None,
) -> dict:
    """Gate on the observed counters (call AFTER the action); raises
    ``ValueError`` naming every violated bound, else returns the
    metrics dict."""
    m = observation.get
    problems = []
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
