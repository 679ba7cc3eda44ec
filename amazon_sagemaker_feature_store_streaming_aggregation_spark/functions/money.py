"""Exact integer money expressions — the repo's CENTRAL determinism
invariant, defined once.

Every money aggregate in the engine runs in integer units (cents,
1e-4-dollar revenue units, basis points) so sums are associative and
order-independent — the property that makes results bit-equal between
Spark and the DuckDB oracles regardless of partitioning. The
``round(x * 100)`` quantization is bit-stable across both engines for
2-decimal currency data (both round half away from zero for positive
doubles, and 2-decimal values scale to exactly-representable
integers).

Import these instead of restating the strings: a future change to the
quantization convention must land in exactly one place.
"""

from __future__ import annotations

#: 2-decimal currency column -> integer cents.
CENTS = "CAST(round({c} * 100) AS BIGINT)"


def cents(col: str) -> str:
    """Integer-cent expression for a 2-decimal currency column."""
    return CENTS.format(c=col)


def revenue_cents(
    price: str = "l_extendedprice", discount: str = "l_discount"
) -> str:
    """The TPC-H revenue term ``price * (1 - discount)`` in EXACT
    integer 1e-4-dollar units, decimal-widened for overflow-safe
    summation at any row count. Divide the final sum by 10000.0 once
    to emit dollars."""
    return f"CAST({cents(price)} * (100 - {cents(discount)}) AS DECIMAL(38,0))"
