"""Per-query Spark JOB breakdown via the UI REST API (guide §1/§7).

The replay/audit queries are many-small-job shapes whose wall time is
invisible to plan inspection: the plan of the RETURNED frame is one
scan, while the real cost is the scaffolding jobs (slice staging,
foreachBatch sinks, localCheckpoints, driver collects) that ran before
it. This tool runs one registered query exactly the way bench.py does
(noop sink) and prints every Spark job the run submitted — job id,
description, duration, stage/task counts — so optimization targets the
jobs that actually cost time instead of guessing from the final plan.

Usage: python tools/job_profile.py <query> [<query> ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _jobs(spark) -> list[dict]:
    sc = spark.sparkContext
    url = (
        f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
        f"/jobs?status=succeeded"
    )
    with urllib.request.urlopen(url, timeout=10) as resp:
        return json.load(resp)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ballista_extensions_spark.io import TABLES, load_table
    from ballista_extensions_spark.queries import get_queries
    from ballista_extensions_spark.session import get_session

    spark = get_session("job_profile")
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    qs = get_queries()
    for name in sys.argv[1:]:
        fn = qs[name]
        # warm rep (JIT/caches), then measured rep
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        before = {j["jobId"] for j in _jobs(spark)}
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        time.sleep(0.5)
        new = [j for j in _jobs(spark) if j["jobId"] not in before]
        new.sort(key=lambda j: j["jobId"])
        total_ms = 0
        print(f"\n=== {name}: wall {wall:.2f}s, {len(new)} jobs ===")
        for j in new:
            t_sub = j.get("submissionTime", "")
            t_end = j.get("completionTime", "")
            try:
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                dur = (
                    datetime.strptime(t_end, fmt)
                    - datetime.strptime(t_sub, fmt)
                ).total_seconds() * 1000
            except Exception:  # noqa: BLE001
                dur = -1
            total_ms += max(dur, 0)
            desc = (j.get("description") or j.get("name") or "")[:100]
            print(
                f"  job {j['jobId']:>5} {dur:8.0f}ms "
                f"tasks={j.get('numCompletedTasks', '?'):>4} {desc}"
            )
        print(f"  sum(job durations) = {total_ms / 1000:.2f}s "
              f"(gaps = driver-side time)")


if __name__ == "__main__":
    main()
