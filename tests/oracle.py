"""Mirror of the driver's DuckDB-oracle comparison, for local tests.

Runs a registered Spark query and its oracle SQL side-by-side on the
same parquet tables and asserts row count, schema-sorted column names,
and order-insensitive value equality (doubles to 1e-9 after the
queries' own declared rounding).
"""

from __future__ import annotations

import math
import os

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    # UTC pin: DuckDB's default TimeZone tracks the OS zone; oracles
    # that reconstruct timestamps (make_timestamp) must not shift by
    # the host's UTC offset vs the UTC-pinned Spark session.
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con.sql(sql).df()


def _norm_cell(v, is_float_col=True):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            # in a float64 column NaN is a real value (keep it
            # distinguishable from NULL); in an object column (e.g.
            # boolean-with-NULL round-tripped through pandas) it is
            # the NULL representation itself
            return "nan" if is_float_col else None
        return round(v, 9)
    return v


def assert_matches(spark_df, oracle_pdf):
    import pandas as pd

    spdf = spark_df.toPandas()
    assert len(spdf) == len(oracle_pdf), (
        f"row count: spark={len(spdf)} oracle={len(oracle_pdf)}"
    )
    s_cols = sorted(spdf.columns)
    o_cols = sorted(oracle_pdf.columns)
    assert s_cols == o_cols, f"columns: {s_cols} vs {o_cols}"

    def canon(pdf: pd.DataFrame):
        pdf = pdf[s_cols].copy()
        is_float = [pdf[c].dtype.kind == "f" for c in s_cols]
        rows = [
            tuple(
                _norm_cell(v, f) for v, f in zip(row, is_float)
            )
            for row in pdf.itertuples(index=False, name=None)
        ]
        return sorted(rows, key=lambda r: tuple(str(x) for x in r))

    a, b = canon(spdf), canon(oracle_pdf)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{len(mismatches)} value mismatches; first: {mismatches[:3]}"
