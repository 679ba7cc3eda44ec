"""Per-job profiler for the standing-index streaming queries.

Runs one query from the ``queries()`` registry (arg 1) at
``$SPARK_GRAFT_SF_DIR`` with the Spark UI enabled, then dumps every
Spark job that ran during the query from the UI REST API — name,
duration, task count — so the fixed per-trigger cost can be read off
directly instead of guessed.

Usage: python tools/profile_stream.py s_stream_lsh_index
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from amazon_sagemaker_feature_store_streaming_aggregation_spark import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]

    def force(df):
        return df.select(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("c"),
        ).first()["n"]

    # warm run (untimed) so codegen/footer caches don't pollute
    force(fn(spark, sf_dir))
    api = "http://localhost:4049/api/v1/applications"
    with urllib.request.urlopen(api) as r:
        app_id = json.load(r)[0]["id"]

    def jobs():
        with urllib.request.urlopen(f"{api}/{app_id}/jobs?status=succeeded") as r:
            return json.load(r)

    def sqls():
        with urllib.request.urlopen(
            f"{api}/{app_id}/sql?length=10000&planDescription=false"
        ) as r:
            return json.load(r)

    before = {j["jobId"] for j in jobs()}
    t0 = time.perf_counter()
    n = force(fn(spark, sf_dir))
    wall = time.perf_counter() - t0
    new = [j for j in jobs() if j["jobId"] not in before]
    new.sort(key=lambda j: j["jobId"])

    def stage_names(j):
        out = []
        for sid in j.get("stageIds", []):
            try:
                with urllib.request.urlopen(
                    f"{api}/{app_id}/stages/{sid}"
                ) as r:
                    for att in json.load(r):
                        out.append(att.get("name", "")[:90])
                        break
            except Exception:
                pass
        return out
    print(f"== {name}: wall={wall:.2f}s rows={n} jobs={len(new)}")
    for j in new:
        sub = j.get("submissionTime", "")
        comp = j.get("completionTime", "")
        dur = ""
        try:
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            d = datetime.strptime(comp, fmt) - datetime.strptime(sub, fmt)
            dur = f"{d.total_seconds():.2f}s"
        except Exception:
            pass
        names = "; ".join(stage_names(j))
        print(
            f"  job {j['jobId']:>4} {dur:>7} tasks={j['numCompletedTasks']:>4} "
            f"stages={len(j.get('stageIds', []))} {names}"
        )
    newjob_ids = {j["jobId"] for j in new}
    print("-- SQL executions overlapping the timed run:")
    for s in sorted(sqls(), key=lambda s: s["id"]):
        jids = set(s.get("successJobIds", [])) | set(s.get("failedJobIds", []))
        if not (jids & newjob_ids):
            continue
        desc = (s.get("description") or "")[:110].replace("\n", " ")
        print(
            f"  sql {s['id']:>4} {s.get('duration', 0)/1000:7.2f}s "
            f"jobs={sorted(jids)} {desc}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
