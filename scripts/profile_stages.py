"""Profile one registered query: print every Spark STAGE with wall time,
task count, and name, so big jobs can be attributed to operators.

Usage: python scripts/profile_stages.py <query> [sf_dir] [min_secs]
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
    min_secs = float(sys.argv[3]) if len(sys.argv) > 3 else 0.2
    spark = get_spark(app_name=f"profile-stages-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    plans.REGISTRY["q6_revenue_forecast"].fn(spark, sf_dir).count()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        try:
            plans.REGISTRY[name].fn(spark, warm_dir).count()
        except Exception as e:
            print(f"warmup at sf0.001 failed ({e}); continuing", flush=True)

    jvm_store = sc._jsc.sc().statusStore()
    pre = {s.stageId() for s in _stages(jvm_store)}
    t0 = time.perf_counter()
    n = plans.REGISTRY[name].fn(spark, sf_dir).count()
    t1 = time.perf_counter()
    print(f"\n=== {name}: {t1 - t0:.3f}s total, {n} rows", flush=True)

    rows = []
    total = 0.0
    for s in _stages(jvm_store):
        if s.stageId() in pre:
            continue
        sub = s.submissionTime()
        comp = s.completionTime()
        if not (sub.isDefined() and comp.isDefined()):
            continue
        dur = (comp.get().getTime() - sub.get().getTime()) / 1000.0
        total += dur
        rows.append(
            (
                dur,
                s.stageId(),
                s.numCompleteTasks(),
                s.executorRunTime() / 1000.0,
                s.executorCpuTime() / 1e9,
                str(s.name())[:80],
                str(s.details()).split("\n")[0][:0],
            )
        )
    rows.sort(reverse=True)
    print(f"stages={len(rows)} sum_stage_wall={total:.2f}s")
    for dur, sid, nt, runt, cput, nm, _ in rows:
        if dur < min_secs:
            continue
        print(f"  stage {sid:4d} {dur:7.3f}s wall {runt:8.2f}s run {cput:7.2f}s cpu {nt:4d} tasks  {nm}")


def _stages(jvm_store):
    # Spark 4 signature: stageList(JList[StageStatus], withDetails,
    # withSummaries, unsortedQuantiles: double[], taskStatus: JList)
    from pyspark import SparkContext

    gw = SparkContext._gateway
    statuses = gw.jvm.java.util.ArrayList()
    task_statuses = gw.jvm.java.util.ArrayList()
    quantiles = gw.new_array(gw.jvm.double, 0)
    lst = jvm_store.stageList(statuses, False, False, quantiles, task_statuses)
    return [lst.apply(i) for i in range(lst.size())]


if __name__ == "__main__":
    main()
