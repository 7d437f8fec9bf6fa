"""Registry-wide plan lint: scale-hostile shapes must never appear in ANY
registered query plan.

Physical-plan string rules (executed plan):

- ``CartesianProduct``: an unkeyed all-pairs stage is quadratic at 100 TB;
  every intentional cross join in this repo is a broadcast scalar/demo
  shape that plans as BroadcastNestedLoopJoin over a 1-row side.
- ``BatchEvalPython``: a row-at-a-time Python UDF in a registered plan
  means something fell off the Arrow path (pandas UDFs plan as
  ArrowEvalPython / MapInPandas instead).

Logical-plan tree rule (optimized plan — VERDICT r5 next #2):

- An UNPARTITIONED ``Window`` whose input subtree reaches a large-table
  scan moves the whole table to one task — the single-partition
  serialization class that killed ``_v5_lmdrop``'s 100 TB story in r5.
  Subtrees are walked only until a cardinality fence: an ``Aggregate``
  (this repo's ledger convention — every global window above an
  aggregate must group by a BOUNDED-domain bucket, e.g. the two-phase
  rank's ~1k-bucket ledger, a day, a funnel stage) or a ``Limit``
  (top-k frames are bounded by construction). Leaves that count as
  large: the fact parquet tables by column signature, and ``LogicalRDD``
  (a ``pushdown_fence`` output is usually a corpus-scale projection —
  conservative on purpose). Everything else needs an ALLOWLIST entry
  with a size argument.

Building all plans costs ~90 s at sf0.001 (a few queries run driver
jobs — kmeans fit, connected components — while planning); that is the
price of a lint that catches a quadratic or serializing regression in
ANY registered query before it ships.
"""

from __future__ import annotations

from wikidatabots_spark import plans

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")

# Column signatures of tables that are unboundedly large at 100 TB.
# (region/nation/supplier/part/customer are dims or bounded at the
# reference's scale contract; the fact tables below are not.)
_BIG_LEAF_SIGNATURES = (
    {"doc_id", "text"},  # documents
    {"vec_id", "embedding"},  # embeddings
    {"event_type", "ts"},  # events
    {"l_orderkey", "l_partkey"},  # lineitem
    {"o_orderkey", "o_custkey"},  # orders
)

# Node names that bound the cardinality of everything above them.
_FENCES = ("Aggregate", "GlobalLimit", "LocalLimit")

# Queries allowed to keep an unpartitioned window over a large input,
# each with the size/semantics argument for WHY:
ALLOWLIST: set[str] = set()  # every registered plan passes unexempted



def _iter_nodes(jplan):
    stack = [jplan]
    while stack:
        node = stack.pop()
        yield node
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))


def _node_name(jnode) -> str:
    return jnode.getClass().getSimpleName()


def _output_names(jnode) -> set[str]:
    out = jnode.output()
    return {out.apply(i).name() for i in range(out.size())}


def _unfenced_big_leaves(jwindow) -> list[str]:
    """Leaf descriptions reachable from the window's child without
    crossing a cardinality fence."""
    found = []
    ch = jwindow.children()
    stack = [ch.apply(i) for i in range(ch.size())]
    while stack:
        node = stack.pop()
        name = _node_name(node)
        if name in _FENCES:
            continue
        if name == "LogicalRDD":
            found.append("LogicalRDD(fenced frame)")
            continue
        if name in ("LogicalRelation", "Relation"):
            cols = _output_names(node)
            for sig in _BIG_LEAF_SIGNATURES:
                if sig <= cols:
                    found.append(f"Relation({sorted(sig)})")
                    break
            continue
        kids = node.children()
        for i in range(kids.size()):
            stack.append(kids.apply(i))
    return found


def _global_window_offences(df) -> list[str]:
    plan = df._jdf.queryExecution().optimizedPlan()
    offences = []
    for node in _iter_nodes(plan):
        if _node_name(node) != "Window":
            continue
        if not node.partitionSpec().isEmpty():
            continue
        leaves = _unfenced_big_leaves(node)
        if leaves:
            offences.append(f"global Window over {leaves}")
    return offences


def test_no_registered_plan_has_scale_hostile_shape(spark, sf_dir):
    offenders: dict[str, list[str]] = {}
    for name, entry in plans.REGISTRY.items():
        df = entry.fn(spark, sf_dir)
        phys = df._jdf.queryExecution().executedPlan().toString()
        bad = [k for k in FORBIDDEN if k in phys]
        if name not in ALLOWLIST:
            bad.extend(_global_window_offences(df))
        if bad:
            offenders[name] = bad
    assert offenders == {}
