"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced to FULL materialization with a row count + an
xxhash64-over-all-columns checksum aggregate — a bare ``count()`` lets
Catalyst prune every derived column (a window query 'benchmarked' with
count() never computes the windows).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark import get_spark


def force(df):
    """Materialize every column: (row_count, checksum) in one pass."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("checksum"),
    ).first()
    return row["n"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    qmap = entrymod.queries()
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    if only:  # local-iteration filter; driver runs unset → full suite
        keep = {k.strip() for k in only.split(",") if k.strip()}
        qmap = {k: v for k, v in qmap.items() if k in keep}

    # Best-of-N per query with ADAPTIVE N: this host shows occasional
    # multi-second whole-VM pauses (CPU idle, load rising) that land
    # inside whichever query is running and poison its wall-clock —
    # measured spread on an identical 1.5 s job: 0.8-10.5 s. Two reps
    # are enough only when neither was hit, so reps continue (up to
    # max_reps) until two runs agree within 40% of the minimum; the
    # minimum is reported. Every rep still fully materializes via the
    # checksum aggregate.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    max_reps = max(reps, int(os.environ.get("SPARK_GRAFT_BENCH_MAX_REPS", "4")))

    # Untimed JVM warmup: codegen compilation, parquet footer caches and
    # shuffle machinery all pay first-use costs that previously landed
    # on whichever queries the gate rotation happened to order first —
    # making round-over-round per-query comparisons depend on rotation
    # order (measured: the same query 0.5s warm vs 1.5s when first).
    if qmap:
        first = next(iter(qmap.values()))
        for _ in range(2):
            try:
                force(first(spark, sf_dir))
            except Exception as exc:  # warmup must never kill the bench
                print(f"# warmup skipped: {exc}", file=sys.stderr)
                break
        # the warmup query may be a memory-sink replay whose temp views
        # hold full results in JVM heap — drop them NOW so they don't
        # tax GC during the first timed query (the cleanup loop below
        # only runs after each timed query completes)
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)

    def measure(fn):
        times, n = [], 0
        while len(times) < reps:
            t0 = time.perf_counter()
            n = force(fn(spark, sf_dir))
            times.append(time.perf_counter() - t0)
        while len(times) < max_reps:
            lo = sorted(times)[:2]
            if len(lo) >= 2 and lo[1] <= lo[0] * 1.4:
                break  # minimum confirmed by a second clean run
            t0 = time.perf_counter()
            n = force(fn(spark, sf_dir))
            times.append(time.perf_counter() - t0)
        return min(times), times, n

    def drop_temp_views():
        # Memory-sink replays register temp views holding their full
        # result in JVM heap; dropped so earlier queries' results
        # don't tax later queries' GC.
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)

    # Host-episode sentinel: beyond the short VM pauses the adaptive
    # reps absorb, this host also shows SUSTAINED multi-minute ~10x
    # slowdown episodes — both reps of a query then AGREE at the
    # inflated value and best-of-N records it as real (observed r7:
    # an untouched query measured 2s -> 55s -> 7s across reruns). A
    # fixed calibration job timed after each query detects "the host
    # was slow while this query ran"; suspects are re-measured once
    # more after the full pass, when the episode has usually passed,
    # and the minimum wins.
    def probe_time() -> float:
        t0 = time.perf_counter()
        # bit_xor, not sum: ANSI mode throws on long overflow
        spark.range(1_000_000).selectExpr("bit_xor(xxhash64(id))").collect()
        return time.perf_counter() - t0

    # probe_base is a RUNNING minimum over every probe, not a one-shot
    # startup calibration: a bench that STARTS inside an episode would
    # otherwise bake the inflated baseline in and never flag anything —
    # the running min self-heals the first time any quiet window is
    # observed (and quiet-window probes only ever lower it).
    probe_base = min(probe_time() for _ in range(3))

    timings: dict[str, float] = {}
    suspects: list[str] = []
    probe_raw: dict[str, float] = {}  # probe time after each query's LAST run
    for name, fn in qmap.items():
        best, times, n = measure(fn)
        timings[name] = round(best, 3)
        drop_temp_views()
        p = probe_time()
        probe_raw[name] = p
        probe_base = min(probe_base, p)
        slow_host = p > 3 * probe_base
        if slow_host:
            suspects.append(name)
        print(
            f"# {name}: {best:.3f}s rows={n} "
            f"(reps={len(times)}: {[round(t, 2) for t in times]})"
            + (" [slow-host suspect]" if slow_host else ""),
            file=sys.stderr,
        )
    unresolved: list[str] = []
    for name in suspects:
        best, times, n = measure(qmap[name])
        drop_temp_views()
        p = probe_time()
        probe_raw[name] = p
        probe_base = min(probe_base, p)
        if p > 3 * probe_base:
            unresolved.append(name)
            print(
                f"# {name}: re-measure also ran on a slow host "
                f"(probe {p:.3f}s vs base {probe_base:.3f}s) — "
                f"recorded value may still be inflated",
                file=sys.stderr,
            )
        if best < timings[name]:
            print(
                f"# {name}: re-measured {timings[name]:.3f}s -> {best:.3f}s "
                f"(host episode during first pass)",
                file=sys.stderr,
            )
            timings[name] = round(best, 3)
    total = sum(timings.values())

    # Slow-host evidence IN the artifacts (previously stderr-only, so
    # downstream exponent/regression analysis couldn't tell episode-
    # inflated rows from clean ones — r7: driver recorded 19.89s for a
    # query a quiet window measures at 6.84s, with no marker).
    # "suspects" = queries whose LAST measurement still ran on a slow
    # host (flagged, re-measured, re-measure also flagged) — their
    # recorded minimum may be inflated and should be discounted.
    # "probe_ratios" = last post-query calibration-probe time over the
    # final (running-min) quiet baseline, for every query the episode
    # sentinel ever flagged: ~1.0 means the final number is clean even
    # though the first pass was hit.
    probe_ratios = {
        name: round(probe_raw[name] / probe_base, 2) for name in suspects
    }

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf) if sf else sf_dir
    except ValueError:  # non-numeric dir name (scale-bench corpora)
        sf_val = sf_dir
    full = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "suspects": unresolved,
        "probe_ratios": probe_ratios,
    }
    # The driver captures a BOUNDED tail of stdout; with 100+ per-query
    # entries the full JSON overflows it (BENCH_r03 came back
    # parsed:null).  So: full detail goes to a file + an EARLY stdout
    # line, and the FINAL stdout line is a compact summary that always
    # fits the tail buffer.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(detail_path, "w") as fh:
            json.dump(full, fh)
            fh.write("\n")
    except OSError as exc:  # read-only checkout: detail still on stdout
        print(f"# bench detail not written: {exc}", file=sys.stderr)
    print(json.dumps(full))
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "suspects": unresolved,
                "detail": "BENCH_DETAIL.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
