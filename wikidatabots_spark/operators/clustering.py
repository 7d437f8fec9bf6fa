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

Scale shape per round (r4, after the VERDICT r3 #4 finding): the k×dim
centroid table is collected to the driver — it is tiny (k·dim ints, KB
at any realistic k) — and embedded in the assignment expression as
literal arrays, so assignment is a NARROW MAP: the vector table never
exchanges, not per round and not at all (the r3 shape crossJoined then
``groupBy(id)``-ed, shuffling n·k vector-carrying rows every round —
the dominant cost at 100×). MLlib's KMeans does exactly this (centroids
ride a broadcast variable; assignment is mapPartitions). The centroid
UPDATE is posexplode to (cluster, dim, value) and one groupBy — partial
aggregation map-side, only k·dim aggregated rows cross the wire. The
per-round ``collect()`` of k·dim centroid rows is the standard
iterative-driver pattern (same class as ``connected_components``'s
convergence probe), not a data-path collect. Empty clusters simply
vanish (no centroid row → nothing assigns to them).

No reference counterpart (north-star extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign(
    vectors: DataFrame,
    cent_rows: list[tuple[int, list[int]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Narrow-map assignment against driver-held centroids: per row,
    integer squared distance to each literal centroid array, argmin via
    ``array_min`` over (dist, cluster) structs — lowest cluster wins
    ties, identical semantics to the former join-based shape but with
    ZERO exchanges of the vector relation."""
    return with_cluster(
        vectors.select(F.col(id_col), F.col(vec_col)), cent_rows, vec_col
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


def kmeans_int_fit(
    vectors: DataFrame,
    k: int = 4,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> list[tuple[int, list[int]]]:
    """Train the centroid table: ``rounds - 1`` Lloyd updates from the
    k-smallest-ids init → sorted ``[(cluster, centroid), ...]`` on the
    driver. One Spark job per update round (the k·dim ``collect``); the
    vector table never exchanges — assignment inside each round is the
    same literal-centroid narrow map ``with_cluster`` applies."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    cent_rows = sorted(
        (r["cluster"], r["__cv"])
        for r in vectors.where(F.col(id_col) < k)
        .select(
            F.col(id_col).cast("int").alias("cluster"),
            F.col(vec_col).alias("__cv"),
        )
        .collect()
    )
    for _ in range(rounds - 1):
        assigned = _assign(vectors, cent_rows, id_col, vec_col)
        cent_rows = sorted(
            (r["cluster"], r["__cv"])
            for r in _recompute(assigned, vec_col).collect()
        )
    return cent_rows


def _dist_struct_sql(vec_sql: str, cent_rows: list[tuple[int, list[int]]]) -> str:
    """(dist, cluster) struct array over literal centroids as ONE SQL
    fragment (r14 plan-build optimization, guide §7.3: driver-side
    planning is single-threaded dead time — the former per-cluster
    zip_with/aggregate Column construction plus per-element F.lit
    arrays was hundreds of ~1 ms py4j round trips per centroid set,
    per Lloyd round, per subspace, before any job ran)."""
    structs = []
    for cluster, cv in cent_rows:
        arr = "array(" + ",".join(str(int(x)) for x in cv) + ")"
        dist = (
            f"aggregate(zip_with({vec_sql}, {arr},"
            f" (a, b) -> (a - b) * (a - b)),"
            f" CAST(0 AS BIGINT), (acc, d) -> acc + d)"
        )
        structs.append(
            f"named_struct('d', {dist}, 'c', CAST({int(cluster)} AS INT))"
        )
    return "array(" + ", ".join(structs) + ")"


def nearest_cluster_expr(vec_sql: str, cent_rows: list[tuple[int, list[int]]]):
    """Nearest-centroid id of the integer vector SQL fragment
    ``vec_sql`` as a pure COLUMN expression (centroids are literals):
    integer squared distance to each centroid, argmin via ``array_min``
    over (dist, cluster) structs — lowest cluster id wins ties. The
    narrow building block shared by ``with_cluster`` and the joint PQ
    fit (``operators.pq.pq_fit``)."""
    return F.expr(f"array_min({_dist_struct_sql(vec_sql, cent_rows)}).c")


def top_clusters_expr(vec_sql: str, cent_rows: list[tuple[int, list[int]]], n: int):
    """Array of the ``n`` nearest centroid ids (by integer squared
    distance, ties to lowest cluster id) — the IVF ``nprobe`` dial:
    probing the n nearest cells instead of one trades candidate volume
    for recall. Same literal-centroid narrow-map construction as
    ``nearest_cluster_expr`` (which is the n=1 special case)."""
    ranked = (
        f"slice(array_sort({_dist_struct_sql(vec_sql, cent_rows)}), 1, {n})"
    )
    return F.expr(f"transform({ranked}, s -> s.c)")


def with_cluster(
    df: DataFrame,
    cent_rows: list[tuple[int, list[int]]],
    vec_col: str,
    out_col: str = "cluster",
) -> DataFrame:
    """Attach the nearest-centroid id as ``out_col``, preserving every
    existing column — a pure narrow map (centroids are expression
    literals), so downstream ops see the cluster key without any join
    or exchange of the fact table."""
    if not cent_rows:
        return df.where(F.lit(False)).withColumn(
            out_col, F.lit(0).cast("int")
        )
    return df.withColumn(
        out_col, nearest_cluster_expr(f"`{vec_col}`", cent_rows)
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
    updates); the final output is the last assignment. Each update
    round runs one Spark job (the centroid ``collect``); the returned
    frame's plan is a pure narrow map over the vector table.
    """
    cent_rows = kmeans_int_fit(vectors, k, rounds, id_col, vec_col)
    return _assign(vectors, cent_rows, id_col, vec_col)
