"""Embedding clustering: deterministic integer k-means.

The training step an IVF index needs (coarse centroids) and the
workhorse of corpus bucketing (topic sharding, semantic dedup blocking),
expressed so every round is engine-exact:

- vectors are NON-NEGATIVE INTEGER arrays (quantize embeddings first —
  e.g. ``round((x+1)*100)`` maps [-1,1] floats to [0,200] ints); all
  distances are integer sums of squares, so argmin comparisons carry no
  float-associativity risk;
- init = the ``k`` smallest ids (deterministic, no RNG);
- centroid update = element-wise truncated-integer mean (``sum div
  count`` — non-negative, so Spark ``div`` and DuckDB ``//`` agree);
- assignment ties resolve to the lowest cluster id (min over a
  (dist, cluster) struct).

A FIXED number of rounds rather than convergence detection: the whole
computation is then one static DAG the DuckDB oracle can unroll CTE by
CTE — and at scale you run Lloyd for a fixed budget anyway.

Scale shape per round: assignment is a BROADCAST cross join against the
k×dim centroid table (the fact table never shuffles) + a per-row argmin;
the update is posexplode to (cluster, dim, value) rows and one groupBy —
the same n·d-row tree-aggregate shape MLlib's KMeans uses. Empty
clusters simply vanish (no centroid row → nothing assigns to them).

No reference counterpart (north-star extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign(vectors: DataFrame, cents: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    dist = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("__cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )
    scored = vectors.crossJoin(
        F.broadcast(cents.select(F.col("cluster"), F.col("__cv")))
    ).select(
        F.col(id_col),
        F.col(vec_col),
        F.struct(dist.alias("d"), F.col("cluster").alias("c")).alias("__dc"),
    )
    return scored.groupBy(id_col).agg(
        F.first(vec_col).alias(vec_col),
        F.min("__dc").getField("c").alias("cluster"),
    )


def _recompute(assigned: DataFrame, vec_col: str) -> DataFrame:
    dims = assigned.select(
        F.col("cluster"), F.posexplode(F.col(vec_col)).alias("__dim", "__val")
    )
    means = dims.groupBy("cluster", "__dim").agg(
        F.expr("sum(__val) div count(*)").cast("int").alias("__m")
    )
    return means.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__dim", "__m"))),
            lambda s: s.getField("__m"),
        ).alias("__cv")
    )


def kmeans_int_assign(
    vectors: DataFrame,
    k: int = 4,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Assign every vector to one of ``k`` integer centroids after
    ``rounds`` Lloyd reassignment rounds → ``(id, vector, cluster)``.

    ``vectors[vec_col]`` must be non-negative integer arrays of uniform
    length. Centroids re-estimate between rounds (``rounds - 1``
    updates); the final output is the last assignment.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    cents = vectors.where(F.col(id_col) < k).select(
        F.col(id_col).cast("int").alias("cluster"), F.col(vec_col).alias("__cv")
    )
    assigned = _assign(vectors, cents, id_col, vec_col)
    for _ in range(rounds - 1):
        cents = _recompute(assigned, vec_col)
        assigned = _assign(vectors, cents, id_col, vec_col)
    return assigned
