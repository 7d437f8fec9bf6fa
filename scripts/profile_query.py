"""Profile one registered query: run it once and print every Spark job
with its wall time, using a Py4J-registered SparkListener.

Usage: python scripts/profile_query.py <query> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikidatabots_spark import plans  # noqa: E402
from wikidatabots_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name=f"profile-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # warm the JVM the same way bench.py does
    plans.REGISTRY["q6_revenue_forecast"].fn(spark, sf_dir).count()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        try:
            plans.REGISTRY[name].fn(spark, warm_dir).count()
        except Exception as e:  # some queries need specific SF data
            print(f"warmup at sf0.001 failed ({e}); continuing", flush=True)

    tracker = sc.statusTracker()
    before_ids = set(tracker.getJobIdsForGroup(None) or [])
    t0 = time.perf_counter()
    n = plans.REGISTRY[name].fn(spark, sf_dir).count()
    t1 = time.perf_counter()
    print(f"\n=== {name}: {t1 - t0:.3f}s total, {n} rows", flush=True)

    # pull per-job info from the status store via the JVM app status store
    jvm_store = sc._jsc.sc().statusStore()
    jobs = jvm_store.jobsList(None)
    rows = []
    for i in range(jobs.size()):
        j = jobs.apply(i)
        jid = j.jobId()
        if jid in before_ids:
            continue
        sub = j.submissionTime()
        comp = j.completionTime()
        if sub.isDefined() and comp.isDefined():
            dur = (
                comp.get().getTime() - sub.get().getTime()
            ) / 1000.0
        else:
            dur = float("nan")
        rows.append((jid, dur, j.numTasks(), str(j.name())[:90]))
    rows.sort()
    total = sum(d for _, d, _, _ in rows)
    print(f"{len(rows)} jobs, sum(job wall) = {total:.3f}s")
    for jid, dur, ntasks, jname in rows:
        print(f"  job {jid:4d}  {dur:7.3f}s  {ntasks:4d} tasks  {jname}")


if __name__ == "__main__":
    main()
