"""MLlib-native similarity/dedup variants (SURVEY.md §7 Phase 5 names
these exact pipelines: HashingTF → MinHashLSH.approxSimilarityJoin for
fuzzy dedup; clustering for ANN).

These are the *library* counterparts of the hand-rolled operators in
``similarity.py`` / ``dedup.py``: same semantics, delegated to Spark ML's
distributed implementations. They are approximate and RNG-seeded, so they
register as rows-only checks; the hand-rolled deterministic forms carry
the oracle parity.

- ``knn_ivf``: inverted-file ANN — KMeans centroids (fit is a few driver-
  coordinated passes), assign every corpus vector to its centroid cell,
  probe only the ``nprobe`` nearest cells per query, exact re-rank inside.
  The classic IVF-Flat layout: at 100 TB the corpus shuffles once on
  cell id and each query touches nprobe/k_cells of the data.
- ``minhash_lsh_ml``: tokenize → HashingTF (sparse binary term vectors)
  → MinHashLSH approxSimilarityJoin under a Jaccard-distance threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _l2sq(vec, cent: list[float]):
    """Squared L2 distance between an array column and a literal center
    (a strict left-to-right fold over 64 double terms).

    Cross-engine determinism assumption (ADVICE r11): DuckDB's oracle
    computes the same distance as a SUM over a generate_series join,
    which carries NO per-group ordering guarantee — the two engines may
    associate the 64-term sum differently, so the values can differ by
    the FP reassociation error (≤ ~64·eps·Σ|term| ≈ 1e-13 for unit-
    scale embeddings). The hash check compares RANKINGS (argmin cell,
    nprobe order), never the raw distances, so equality only requires
    every ranking-relevant distance GAP to exceed that error. This is
    an empirical property of the data, not a theorem — pinned by
    tests/test_similarity.py::test_ivf_tie_margin_dwarfs_fp_error,
    which measures the minimum gap at the assignment and nprobe
    boundaries (≥ ~1e-3 on the synthetic embeddings, ten orders above
    the reassociation bound). Near-equidistant centers on OTHER data
    would need an integer-exact or epsilon-quantized assignment."""
    lit = F.array(*[F.lit(float(x)) for x in cent])
    return F.aggregate(
        F.zip_with(
            vec, lit, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def knn_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-Flat approximate top-k: (query_id, neighbor_id, rank).

    ``centroids``: optional driver-held coarse centers (KB-sized — the
    same bounded-literal pattern as the PQ codebooks). When given, the
    quantizer is a pure argmin-L2 NARROW MAP against the literal
    centers — zero shuffle for assignment AND probing, deterministic
    end to end, which is what lets the registry hash-check the full
    IVF pipeline. When None, centers come from MLlib KMeans
    (seed-reproducible but RNG-internal — the library-parity path,
    pytest-covered)."""
    from wikidatabots_spark.operators.similarity import cosine

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    if centroids is None:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        cf = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            array_to_vector(F.col(vec_col).cast("array<double>")).alias(
                "features"
            ),
        )
        km = KMeans(k=n_cells, seed=seed, maxIter=10)
        model = km.fit(cf.select("features"))
        centroids = [[float(x) for x in c_] for c_ in model.clusterCenters()]
        assigned = (
            model.transform(cf)
            .withColumnRenamed("prediction", "cell")
            .select("neighbor_id", "c_vec", "cell")
        )
    else:
        # argmin over literal centers; array_position takes the FIRST
        # (= lowest-cell) occurrence of the min, the deterministic
        # tie-break the oracle mirrors with ORDER BY d2, cell
        dists = F.array(*[_l2sq(F.col("c_vec"), ct) for ct in centroids])
        assigned = c.select(
            "neighbor_id",
            "c_vec",
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int")
            .alias("cell"),
        )
    # nprobe nearest centers per query: sort a 16-element (d2, cell)
    # struct array and slice — narrow, no shuffle, no centroid join
    qd = F.array(
        *[
            F.struct(
                _l2sq(F.col("q_vec"), ct).alias("d"),
                F.lit(i).cast("int").alias("cell"),
            )
            for i, ct in enumerate(centroids)
        ]
    )
    probed = q.select(
        "query_id",
        "q_vec",
        F.explode(
            F.transform(
                F.slice(F.sort_array(qd), 1, nprobe), lambda s: s["cell"]
            )
        ).alias("cell"),
    )
    cand = probed.join(assigned, on="cell")
    cand = cand.where(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.withColumn("sim", cosine(F.col("q_vec"), F.col("c_vec")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def minhash_lsh_ml(
    df: DataFrame,
    jaccard_distance_threshold: float = 0.6,
    num_features: int = 1 << 16,
    num_hash_tables: int = 4,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs via MLlib HashingTF + MinHashLSH (id_a < id_b,
    jaccard_distance DOUBLE — distance, not similarity)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH, Tokenizer

    tok = Tokenizer(inputCol=text_col, outputCol="__words")
    words = tok.transform(df.select(F.col(id_col), F.lower(F.col(text_col)).alias(text_col)))
    tf = HashingTF(
        inputCol="__words", outputCol="__tf", numFeatures=num_features, binary=True
    )
    feats = tf.transform(words)
    mh = MinHashLSH(
        inputCol="__tf", outputCol="__sig", numHashTables=num_hash_tables, seed=seed
    )
    model = mh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, jaccard_distance_threshold, distCol="jaccard_distance"
    )
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.col("jaccard_distance"),
        )
        .where(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
