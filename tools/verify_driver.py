"""Driver-contract simulation (the /verify recipe): entry() smoke at
sf0.001 + per-query Spark-vs-DuckDB oracle compare at sf0.01.

Usage: python tools/verify_driver.py [--sf-dir /root/testdata/sf0.01] [--only q1,q2]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

# Pin the PROCESS timezone before Spark starts: PySpark's classic
# .collect() localizes timestamps via the OS zone (datetime.
# fromtimestamp), NOT spark.sql.session.timeZone — on a non-UTC host
# every timestamp-emitting query would shift relative to the
# UTC-pinned DuckDB oracle session even though both engines agree.
os.environ["TZ"] = "UTC"
if hasattr(time, "tzset"):
    time.tzset()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _duck(sf_dir: str):
    con = duckdb.connect()
    # Pin the oracle session to UTC: DuckDB's default TimeZone tracks
    # the OS zone, and any oracle that RECONSTRUCTS a timestamp (e.g.
    # make_timestamp) would otherwise shift by the host's UTC offset
    # relative to the Spark side (session timeZone=UTC). One pin here
    # covers every timestamp-emitting oracle.
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"create view {t} as select * from read_parquet('{p}')"
            )
    return con


def _hash_rows(cols, rows) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(repr(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def _norm(v):
    import datetime as dt

    import numpy as np

    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None)
    return v


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--smoke-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    if os.path.realpath(args.sf_dir) != os.path.realpath(
        "/root/testdata/sf0.01"
    ):
        # oracle_sql() is a FIXED-string contract evaluated for the
        # driver's sf0.01: scale-dependent constants (auto_planes from
        # the embeddings footer, the IVF centroid step) are baked in at
        # import. Spark queries scale with --sf-dir, those oracles do
        # not — sim_ann_*/sim_ivf_topk WILL mismatch at other scales.
        print(
            f"[warn] --sf-dir {args.sf_dir}: oracle constants are baked "
            "for sf0.01; scale-dependent queries (sim_ann_*, "
            "sim_ivf_topk) will false-fail here",
            flush=True,
        )

    import __spark_entry__ as e
    from amazon_sagemaker_feature_store_streaming_aggregation_spark import get_spark

    spark = get_spark()

    t0 = time.time()
    res = e.entry(spark)
    n = res.count()
    print(f"[smoke] entry() -> {n} rows, {len(res.columns)} cols, "
          f"{time.time()-t0:.1f}s", flush=True)

    queries = e.queries()
    oracles = e.oracle_sql()
    only = {q for q in args.only.split(",") if q}
    con = _duck(args.sf_dir)
    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf_dir)
            scols = list(sdf.columns)
            srows = [tuple(_norm(v) for v in r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"[FAIL] {name}: spark error {ex!r}", flush=True)
            failed.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"[rows-only] {name}: {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)", flush=True)
            continue
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = [tuple(_norm(v) for v in r) for r in cur.fetchall()]
        except Exception as ex:  # noqa: BLE001
            print(f"[FAIL] {name}: oracle error {ex!r}", flush=True)
            failed.append(name)
            continue
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        ok_hash = (
            ok_rows
            and ok_schema
            and _hash_rows(scols, srows) == _hash_rows(ocols, orows)
        )
        status = "ok" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        schema_msg = "ok" if ok_schema else f"{sorted(scols)!r}!={sorted(ocols)!r}"
        print(
            f"[{status}] {name}: rows={len(srows)}/{len(orows)} "
            f"schema={schema_msg} "
            f"hash={'ok' if ok_hash else 'MISMATCH'} "
            f"({time.time()-t0:.1f}s)",
            flush=True,
        )
        if status == "FAIL":
            failed.append(name)

    print(f"[done] {len(failed)} failures: {failed}", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
