"""Time a subset of registered queries with the bench.py protocol
(fresh plan per pass, min over N passes), without running the full suite.

Usage: python scripts/bench_some.py q1 q2 ... [--passes N] [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikidatabots_spark import plans  # noqa: E402
from wikidatabots_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    n_passes = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--passes":
            n_passes = int(args[i + 1])
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    spark = get_spark(app_name="bench-some")
    spark.sparkContext.setLogLevel("ERROR")
    plans.REGISTRY["q6_revenue_forecast"].fn(spark, sf_dir).count()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in names:
            try:
                plans.REGISTRY[name].fn(spark, warm_dir).count()
            except Exception as e:
                print(f"# warmup {name} failed: {e}", flush=True)

    passes: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(n_passes):
        for name in names:
            fn = plans.REGISTRY[name].fn
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).count()
            passes[name].append(time.perf_counter() - t0)
            la = os.getloadavg()[0]
            print(
                f"# {name}: {passes[name][-1]:.3f}s ({rows} rows, la={la:.1f})",
                flush=True,
            )
    print("\n=== mins ===")
    for name in names:
        ts = " ".join(f"{t:.3f}" for t in passes[name])
        print(f"{min(passes[name]):8.3f}  {name}  passes=[{ts}]")


if __name__ == "__main__":
    main()
