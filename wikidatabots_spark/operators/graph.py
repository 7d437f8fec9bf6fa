"""Graph analytics over pair graphs: deterministic integer PageRank.

``connected_components`` (operators.dedup) answers "which docs are the
same"; PageRank over the same near-dup pair graph answers "which docs
are HUBS" — a document similar to many others is usually boilerplate, a
template, or chrome, and its rank is a useful curation signal the
component id cannot provide.

Engine-exact by construction, like the integer k-means:
- ranks live in integer units of 1e-9 (M = 10^9);
- init = M div n (truncated), damping 0.85 as integer ops:
  new = (15·(M div n)) div 100 + (85·Σ(rank div deg)) div 100 —
  every intermediate is a non-negative integer, so Spark ``div`` and
  DuckDB ``//`` agree bit-for-bit and the oracle can unroll the fixed
  iteration count CTE by CTE;
- the pair graph is symmetrized, so every node has degree ≥ 1 (no
  dangling-mass term).

Scale shape per iteration: one equi-join (edges ⋈ ranks on the source
id) + one aggregation keyed by the destination id — the classic
distributed PageRank step; a FIXED iteration count keeps the whole
computation one static DAG (no convergence probe), which is also how
you run it at scale (rank deltas below 1e-9 don't change decisions).
The single driver action is the node count for the init value, the
same iterative-driver pattern as ``kmeans_int_fit``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_SCALE = 1_000_000_000


def pagerank_int(
    edges: DataFrame,
    iters: int = 2,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Integer PageRank over an undirected pair graph → (node, rank).

    ``edges`` holds each undirected pair once (id_a < id_b convention);
    both directions are materialized internally. Ranks sum to ≈ M
    (truncation loses at most n·1e-9 of mass per step — irrelevant for
    ordering, and identically computed by the oracle).
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    n = deg.count()
    if n == 0:
        return deg.select("u", F.lit(0).cast("bigint").alias("rank")).select(
            F.col("u").alias("node"), "rank"
        )
    base = RANK_SCALE // n
    teleport = (15 * base) // 100
    r = deg.select("u", F.lit(base).cast("bigint").alias("rank"), "deg")
    for _ in range(iters):
        contrib = sym.join(r, "u").select(
            F.col("v").alias("u"), F.expr("rank div deg").alias("c")
        )
        inc = contrib.groupBy("u").agg(F.sum("c").alias("inc"))
        r = deg.join(inc, "u", "left").select(
            "u",
            (
                F.lit(teleport).cast("bigint")
                + F.expr("(85 * coalesce(inc, 0)) div 100")
            ).alias("rank"),
            "deg",
        )
    return r.select(F.col("u").alias("node"), F.col("rank").cast("bigint"))
