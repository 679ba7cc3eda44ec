"""Per-job profiler for one gated query: runs the named query once at
the given sf dir and dumps every Spark job's wall-clock + description
via the local UI REST API, so a streaming runner's per-trigger fixed
cost is attributable job by job (VERDICT r9 task #2).

Usage: python tools/profile_stream.py <query_name> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from amazon_sagemaker_feature_store_streaming_aggregation_spark import get_spark


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    import __spark_entry__ as entrymod

    spark = get_spark("profile", extra_conf={"spark.ui.enabled": "true"})
    fn = entrymod.queries()[name]
    t0 = time.time()
    df = fn(spark, sf_dir)
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("c"),
    ).first()
    wall = time.time() - t0
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    jobs = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs")
    )
    jobs.sort(key=lambda j: j["jobId"])
    total = 0.0
    from datetime import datetime

    def ts(s):
        return datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%f%Z").timestamp()

    print(f"== {name}: wall {wall:.2f}s, rows {row['n']}, {len(jobs)} jobs ==")
    prev_end = None
    for j in jobs:
        dur = ts(j["completionTime"]) - ts(j["submissionTime"])
        gap = ""
        if prev_end is not None:
            g = ts(j["submissionTime"]) - prev_end
            if g > 0.05:
                gap = f"  [+{g:.2f}s gap]"
        prev_end = ts(j["completionTime"])
        total += dur
        desc = (j.get("description") or j["name"]).splitlines()[0][:110]
        print(
            f"job {j['jobId']:>3} {dur:6.2f}s  stages={len(j['stageIds'])}"
            f" tasks={j['numTasks']:>4}  {desc}{gap}"
        )
    print(f"== sum of job durations: {total:.2f}s (wall {wall:.2f}s) ==")
    execs = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/sql?length=500"
        )
    )
    execs.sort(key=lambda e: e["id"])
    print(f"== {len(execs)} SQL executions ==")
    for e in execs:
        desc = (e.get("description") or "").splitlines()[0][:100]
        print(
            f"sql {e['id']:>3} {e['duration']/1000:6.2f}s"
            f" jobs={sorted(e.get('successJobIds', []))} {desc}"
        )


if __name__ == "__main__":
    main()
