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


def knn_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-Flat approximate top-k: (query_id, neighbor_id, rank)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    from wikidatabots_spark.operators.similarity import cosine

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    km = KMeans(k=n_cells, seed=seed, maxIter=10)
    model = km.fit(c.select("features"))
    assigned = model.transform(c).withColumnRenamed("prediction", "cell")

    centroids = model.clusterCenters()
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    # nprobe nearest centroids per query, via a tiny broadcast centroid table
    spark = queries.sparkSession
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c_]) for i, c_ in enumerate(centroids)],
        "cell int, centroid array<double>",
    )
    qc = q.crossJoin(F.broadcast(cent_df)).withColumn(
        "dist",
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    F.col("q_vec"),
                    F.col("centroid"),
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("dist"), F.col("cell"))
    probed = (
        qc.withColumn("cell_rank", F.row_number().over(wq))
        .where(F.col("cell_rank") <= nprobe)
        .select("query_id", "q_vec", "cell")
    )
    cand = probed.join(assigned.select("neighbor_id", "c_vec", "cell"), on="cell")
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
