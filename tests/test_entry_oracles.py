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


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, name):
    assert name in _QUERIES, f"oracle {name} has no queries() twin"
    oracle = run_oracle(_ORACLES[name], SF001)
    assert_matches(_QUERIES[name](spark, SF001), oracle)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema) >= 4
