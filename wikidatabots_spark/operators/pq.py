"""Product quantization (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011) — the memory layout that makes
billion-vector ANN feasible: each vector is split into ``m`` subspaces
and every subspace is vector-quantized independently against its own
tiny codebook, so a candidate is stored as ``m`` small integer CODES
instead of the full vector. Search is ADC (asymmetric distance
computation): the query stays exact, per-subspace lookup tables of
query-to-centroid distances are built once per query, and a candidate's
distance is just ``m`` table lookups summed — no vector arithmetic per
candidate at all.

Everything here is deterministic integer math on quantized vectors
(the ``operators.clustering`` integer k-means trains each subspace
codebook: k-smallest-ids init, fixed Lloyd rounds, truncated-integer
centroid means, ties to the lowest cluster id), so a DuckDB oracle can
reproduce training, encoding, and search bit-for-bit.

Scale shape — why this is the 100 TB ANN operating mode:

- **Training** runs all ``m`` subspace k-means fits JOINTLY — one
  init collect plus one Spark job per Lloyd round regardless of ``m``
  (per-round driver state is the m x k x subdim centroid table, KBs);
  the fact table never exchanges (see ``operators.clustering`` /
  VERDICT r3 #4), only m*k*subdim aggregated mean rows do.
- **Encoding** is a pure narrow map: codebooks ride into the plan as
  expression literals; each row computes its ``m`` argmins in place.
  At 64 dims / m=4 / k=4 a code row is 4 small ints — a 64x shrink of
  what search touches; production PQ (m=8..64, k=256) stores one BYTE
  per subspace.
- **Search** never joins vectors against vectors: per-query LUTs
  (m x k distance entries, built driver-side from the tiny codebooks)
  are embedded as literals, each candidate row expands over the query
  batch (an explode of a literal array — narrow, partition-parallel,
  no BroadcastNestedLoopJoin), sums ``m`` lookups, and the only
  shuffle in the whole search is the final per-query top-k window —
  the same single-shuffle shape as ``knn_brute``, but each candidate
  row carries 4 ints instead of a 64-wide vector.

No reference counterpart (north-star extension, BASELINE.json
similarity-search family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wikidatabots_spark.operators.clustering import (
    nearest_cluster_expr,
    with_cluster,
)

Codebook = list[tuple[int, list[int]]]


def pq_fit(
    vectors: DataFrame,
    m: int = 4,
    subdim: int = 16,
    k: int = 4,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> list[Codebook]:
    """Train ``m`` per-subspace codebooks over integer vectors: subspace
    ``s`` covers 1-based slice ``[s*subdim+1, (s+1)*subdim]`` of
    ``vec_col``. Returns driver-held codebooks; total driver state is
    m*k*subdim ints.

    All subspaces train JOINTLY: one collect for the shared k-smallest-
    ids init, then ONE Spark job per Lloyd round — every row assigns all
    ``m`` subvectors against literal centroids (narrow), the per-
    (subspace, cluster, dim) truncated-integer means aggregate in a
    single exchange of m*k*subdim combined rows, and the m*k*subdim
    centroid ints collect once. Job count is 1 + (rounds-1) regardless
    of ``m`` — production PQ (m=8..64) pays nothing extra — and each
    round's semantics are exactly ``kmeans_int_fit`` run per subspace
    (same init rows, same argmin ties, same ``sum div count`` means,
    empty clusters vanish)."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    seed = sorted(
        (r["__id"], r["__v"])
        for r in vectors.where(F.col(id_col) < k)
        .select(F.col(id_col).cast("int").alias("__id"), F.col(vec_col).alias("__v"))
        .collect()
    )
    books: list[Codebook] = [
        [(int(vid), list(vec[s * subdim : (s + 1) * subdim])) for vid, vec in seed]
        for s in range(m)
    ]
    for _ in range(rounds - 1):
        entries = []
        for s, book in enumerate(books):
            sub_sql = f"slice(`{vec_col}`, {s * subdim + 1}, {subdim})"
            entries.append(
                F.struct(
                    F.lit(s).alias("s"),
                    nearest_cluster_expr(sub_sql, book).alias("cluster"),
                    F.expr(sub_sql).alias("vs"),
                )
            )
        ex = vectors.select(F.explode(F.array(*entries)).alias("e")).select(
            F.col("e.s").alias("s"),
            F.col("e.cluster").alias("cluster"),
            F.posexplode(F.col("e.vs")).alias("i", "val"),
        )
        rows = (
            ex.groupBy("s", "cluster", "i")
            .agg(F.expr("sum(val) div count(*)").cast("int").alias("mval"))
            .collect()
        )
        per: dict[tuple[int, int], dict[int, int]] = {}
        for r in rows:
            per.setdefault((r["s"], r["cluster"]), {})[r["i"]] = r["mval"]
        books = [[] for _ in range(m)]
        for (s, c), dims in per.items():
            books[s].append((int(c), [dims[i] for i in sorted(dims)]))
        for s in range(m):
            books[s].sort()
    return books


def pq_encode(
    df: DataFrame,
    books: list[Codebook],
    vec_col: str = "v",
    subdim: int = 16,
    prefix: str = "code",
) -> DataFrame:
    """Attach ``code0..code{m-1}`` (nearest-centroid id per subspace) as
    int columns — a pure narrow map (codebooks are literals; same
    mechanism as ``with_cluster``). Downstream search reads ONLY the
    code columns; the vector column can be dropped after encoding."""
    out = df
    for s, book in enumerate(books):
        out = out.withColumn("__sub", F.slice(vec_col, s * subdim + 1, subdim))
        out = with_cluster(out, book, "__sub", out_col=f"{prefix}{s}")
        out = out.drop("__sub")
    return out


def _sq_dist(a: list[int], b: list[int]) -> int:
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def pq_adc_topk(
    encoded: DataFrame,
    query_rows: list[tuple[int, list[int]]],
    books: list[Codebook],
    subdim: int = 16,
    k_top: int = 3,
    id_col: str = "vec_id",
    prefix: str = "code",
    query_cells: dict[int, list[int]] | None = None,
    cell_col: str = "cell",
) -> DataFrame:
    """ADC search: for each (query_id, exact int vector) in
    ``query_rows`` (a driver-held batch — the LUT build is per-query by
    construction; same driver-state class as the codebooks themselves),
    rank all encoded candidates by the sum of per-subspace
    query-to-centroid squared distances and keep the top ``k_top`` by
    ``(adc_dist ASC, neighbor_id ASC)``. A candidate equal to the query
    id is excluded.

    The LUT literal is |queries| * m * k longs; candidates explode over
    the query batch (narrow), so the only exchange is the final
    per-query top-k window.

    With ``query_cells`` (the IVF-PQ composition), each query carries
    its probed coarse-cell list as one more literal array and only
    candidates whose ``cell_col`` is in it survive — the candidate
    filter is a narrow predicate evaluated BEFORE any exchange, so the
    top-k window sees |probed cells|/|cells| of the corpus instead of
    all of it; ``encoded`` must then carry ``cell_col``.
    """
    m = len(books)
    k_max = 1 + max((c for book in books for c, _ in book), default=0)
    # sentinel for cluster ids absent from a codebook (an empty cluster
    # vanished during fit): no candidate carries that code, the slot
    # only pads the LUT to direct-indexable length
    sentinel = 1 << 60
    q_structs = []
    for qid, qvec in query_rows:
        luts = []
        for s, book in enumerate(books):
            sub = qvec[s * subdim : (s + 1) * subdim]
            by_cluster = dict(book)
            lut = [
                _sq_dist(sub, by_cluster[c]) if c in by_cluster else sentinel
                for c in range(k_max)
            ]
            # one py4j call per LUT (an array<bigint> SQL literal) — the
            # per-element F.lit chain was |queries|*m*k driver round
            # trips of pure plan-build time (r14 optimization; the `L`
            # suffix keeps the former cast("long") element type)
            luts.append(
                F.expr(
                    "array(" + ",".join(f"{int(d)}L" for d in lut) + ")"
                ).alias(f"lut{s}")
            )
        fields = [F.lit(int(qid)).cast("bigint").alias("query_id"), *luts]
        if query_cells is not None:
            fields.append(
                F.expr(
                    "array("
                    + ",".join(str(int(c)) for c in query_cells[int(qid)])
                    + ")"
                ).alias("cells")
            )
        q_structs.append(F.struct(*fields))
    extra_cols = [cell_col] if query_cells is not None else []
    exploded = encoded.select(
        F.col(id_col).alias("neighbor_id"),
        *[f"{prefix}{s}" for s in range(m)],
        *extra_cols,
        F.explode(F.array(*q_structs)).alias("__q"),
    ).where(F.col("__q.query_id") != F.col("neighbor_id"))
    if query_cells is not None:
        exploded = exploded.where(
            F.array_contains(F.col("__q.cells"), F.col(cell_col))
        )
    adc = F.element_at(F.col("__q.lut0"), F.col(f"{prefix}0") + 1)
    for s in range(1, m):
        adc = adc + F.element_at(F.col(f"__q.lut{s}"), F.col(f"{prefix}{s}") + 1)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        exploded.select(
            F.col("__q.query_id").alias("query_id"),
            "neighbor_id",
            adc.cast("long").alias("adc_dist"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k_top)
        .select(
            "query_id", "neighbor_id", "adc_dist", F.col("rank").cast("int").alias("rank")
        )
    )
