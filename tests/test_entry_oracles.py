"""Every queries() entry must match its DuckDB oracle_sql() twin at sf0.01.

This is a local mirror of the driver's correctness gate — any operator
added to __spark_entry__ is automatically covered here.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod

from .conftest import SF001
from .oracle import assert_matches, run_oracle

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


def test_every_query_has_callable():
    assert _QUERIES, "queries() must not be empty"
    for name, fn in _QUERIES.items():
        assert callable(fn), name


def test_gate_rotation_is_stalest_first():
    # The driver's CORRECTNESS gate covers the first 50 entries of
    # queries(); the rotation is MECHANICAL (round 4+): derived from the
    # CORRECTNESS_r*.json artifacts — never-green queries first, then
    # oldest-green-first, ties by registration order.  So the sequence of
    # latest-green rounds along queries() must be non-decreasing, and
    # every never-green query must come before every green one.
    latest = entrymod._gate_history()
    keys = list(_QUERIES)
    rounds = [latest.get(k, 0) for k in keys]
    assert rounds == sorted(rounds), "rotation must be stalest-first"
    oracle_keys = [k for k in _ORACLES if k in _QUERIES]
    assert [k for k in keys if k in _ORACLES] == oracle_keys


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, name):
    assert name in _QUERIES, f"oracle {name} has no queries() twin"
    oracle = run_oracle(_ORACLES[name], SF001)
    assert_matches(_QUERIES[name](spark, SF001), oracle)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema) >= 4
