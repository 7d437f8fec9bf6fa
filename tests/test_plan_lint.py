"""Registry-wide physical-plan lint: scale-hostile node types must never
appear in ANY registered query plan.

- ``CartesianProduct``: an unkeyed all-pairs stage is quadratic at 100 TB;
  every intentional cross join in this repo is a broadcast scalar/demo
  shape that plans as BroadcastNestedLoopJoin over a 1-row side.
- ``BatchEvalPython``: a row-at-a-time Python UDF in a registered plan
  means something fell off the Arrow path (pandas UDFs plan as
  ArrowEvalPython / MapInPandas instead).

Building all plans costs ~90 s at sf0.001 (a few queries run driver
jobs — kmeans fit, connected components — while planning); that is the
price of a lint that catches a quadratic regression in ANY of the
registered queries before it ships.
"""

from __future__ import annotations

from wikidatabots_spark import plans

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


def test_no_registered_plan_has_cartesian_or_row_udf(spark, sf_dir):
    offenders = {}
    for name, entry in plans.REGISTRY.items():
        plan = (
            entry.fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        bad = [k for k in FORBIDDEN if k in plan]
        if bad:
            offenders[name] = bad
    assert offenders == {}
