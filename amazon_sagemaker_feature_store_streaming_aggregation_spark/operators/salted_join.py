"""Salted equi-join: the skew mitigation for shuffled joins.

A shuffled join hash-partitions both sides on the key, so one hot key
(a celebrity user, a null-ish default, a power-law head) lands its
entire row set in ONE task — the straggler that defines job wall
clock at 100 TB. AQE's skew-join splitting handles sort-merge joins
it can measure; salting is the general, plan-independent rewrite:

* the probe (skewed) side appends ``salt = pmod(xxhash64(tiebreak),
  S)`` — a hot key's rows scatter across ``S`` partitions;
* the build side replicates each row ``S`` times (one per salt) so
  every scattered probe row still finds its match;
* the join key becomes ``(key, salt)``; after the join the salt drops.

Row multiplication is on the BUILD side only (×S — choose the
smaller side and a modest S), and results are exactly the plain
join's rows: the salt is derived (no rand() — a re-evaluated random
salt under retries/AQE would silently drop or duplicate matches,
Spark's classic nondeterminism trap) and every (key, salt) pair is
covered by construction. The DuckDB oracle for the registered query
is the UNsalted join — identical output is the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_source: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Join ``left`` (skewed probe side) to ``right`` (replicated
    build side) on ``on`` with ``salt``-way key scattering.

    ``salt_source``: a left-side column whose values spread a hot key's
    rows (any high-cardinality column — an event id, a timestamp).
    Deterministic by design; never ``rand()``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported join type for salting: {how!r}")
    l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_source)), F.lit(salt))
    )
    r = right.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i).cast("long") for i in range(salt)])),
    )
    return l.join(r, on=[on, "__salt"], how=how).drop("__salt")
