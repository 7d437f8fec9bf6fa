"""Streaming documents source + incremental shard-manifest twin.

``shard_manifest`` (sinks.training_shards) is built from commutative,
associative aggregates — count, sum, bit_xor — which is exactly what a
streaming groupBy maintains incrementally. Run as a stream over a
drop-zone of document files, the manifest UPDATES AS SHARDS LAND: when
the corpus ingest finishes, the streaming manifest equals the batch
manifest bit-for-bit (parity-tested), so a trainer can watch one table
instead of re-scanning the corpus after every delivery. Same mergeable-
state family as the HLL register twin (events_stream).

Scale: state is exactly n_shards rows FOREVER — the same bounded-state
argument as the HLL registers; the per-batch work is the narrow-map
shard assignment plus one partial aggregation.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCS_FILE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents table (drop-zone staging,
    same pattern as ``read_events_stream``; documents carry no event
    time, so no conversion branch is needed)."""
    src = os.path.join(sf_dir, "documents.parquet")
    stage = os.path.join(
        tempfile.gettempdir(),
        "wdb_spark_stream_docs",
        hashlib.sha256(src.encode()).hexdigest()[:16],
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "documents.parquet")
    if not os.path.exists(link):
        try:
            os.symlink(src, link)
        except OSError:
            import shutil

            shutil.copyfile(src, link)
    return spark.readStream.schema(DOCS_FILE_SCHEMA).format("parquet").load(stage)


def shard_manifest_stream(docs: DataFrame, n_shards: int = 64) -> DataFrame:
    """Streaming twin of ``sinks.training_shards.shard_manifest``: the
    identical aggregation expression over a streaming frame — count,
    byte total, and XOR checksum per shard, maintained incrementally
    with state bounded at ``n_shards`` rows."""
    from wikidatabots_spark.sinks.training_shards import shard_manifest

    return shard_manifest(docs, n_shards)


def incremental_dedup_probe_stream(
    new_docs: DataFrame, index: DataFrame
) -> DataFrame:
    """Streaming incremental dedup: arriving documents are MinHash-
    signed ROW-BY-ROW (``minhash_signature_cols`` is a narrow map — no
    aggregation, hence no streaming state at all) and their band rows
    probe a STATIC band index of the existing corpus via a stream-static
    equi-join. Emits (new_id, old_id, band_idx) candidate matches in
    append mode as files land — the drop-zone version of
    ``dedup_incremental_index``.

    Scale: the static index is the big side and never moves (at corpus
    scale it is a bucketed table on (band_idx, band_hash), stored
    bucket-capped via ``cap_band_buckets`` so a boilerplate cluster
    cannot hand every probing doc an unbounded match fan-out); each
    micro-batch ships only the new docs' band rows. State: zero — the
    probe is stateless, so there is nothing to watermark or expire.
    Batch/stream parity is exact because signatures depend only on each
    doc's own text (parity-tested in tests/test_streaming.py).
    """
    from wikidatabots_spark.operators.dedup import minhash_band_table

    probe = minhash_band_table(new_docs).select(
        F.col("doc_id").alias("new_id"), "band_idx", "band_hash"
    )
    idx = index.select(
        F.col("doc_id").alias("old_id"), "band_idx", "band_hash"
    )
    return probe.join(idx, ["band_idx", "band_hash"])


def dsir_score_stream(
    docs: DataFrame, model_ppm: dict[int, int]
) -> DataFrame:
    """Streaming DSIR scoring: documents arriving from the drop zone are
    importance-scored against a batch-trained model with ZERO streaming
    state — the model (≤1024 (bucket, lr_ppm) rows, KB-sized like the
    BPE vocab frames) is embedded as a LITERAL map, so scoring is a pure
    narrow per-row map: imp_ppm = Σ_tokens lr_ppm[bucket(token)]. This
    is the production shape for domain-targeted ingest — train DSIR
    once on the existing corpus (``plans.llmdata.dsir_occ_and_model``),
    then score every arriving document in-flight and route/weight it
    before it lands.

    Identical to the batch scorer by construction: the batch path sums
    cnt·lr_ppm over the per-doc occurrence aggregate; this path sums
    lr_ppm token-by-token — the same integer total (parity-tested).
    Tokens whose bucket is missing from the model contribute 0 (the
    out-of-vocabulary policy; cannot occur when the model was trained
    on a corpus covering the stream's buckets, e.g. the parity test).

    Scale/state: no aggregation, no watermark, no state store rows at
    all — the stream's progress metrics report zero state operators.
    At 1024 buckets the literal map is ~16 KB of plan; for much larger
    models swap the literal for a broadcast stream-static join on
    bucket (the `incremental_dedup_probe_stream` pattern).
    """
    from pyspark.sql import functions as F

    from wikidatabots_spark.operators.textstats import _token_bucket, words

    m = F.create_map(
        *[
            F.lit(x).cast("long")
            for kv in sorted(model_ppm.items())
            for x in kv
        ]
    )
    imp = F.aggregate(
        words(F.col("text")),
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.coalesce(m[_token_bucket(w)], F.lit(0).cast("long")),
    )
    return docs.select("doc_id", "source", imp.alias("imp_ppm"))


def dedup_graph_maintenance(index_path: str, labels_path: str):
    """foreachBatch sink maintaining the dedup graph EXACTLY as document
    micro-batches land — the streaming wiring of
    ``dedup_components_incremental``'s theorem (which proves one
    prior/new step; sequential micro-batches compose by induction,
    parity-tested in tests/test_streaming.py):

    per micro-batch: (a) sign the new docs (narrow — signatures depend
    only on each doc's own text, the property that makes the index
    APPEND-ONLY), (b) probe the accumulated index (capped at probe
    time — stored uncapped, like the deletion twin requires), (c) add
    within-batch capped pairs and yesterday's components as star
    edges, (d) one min-label CC, (e) append the new labels under
    ``__batch_id`` and the new band rows to the index.

    State layout mirrors ``rollup_maintenance``: both tables are
    APPEND-ONLY parquet (labels are versioned by ``__batch_id``;
    ``latest_labels`` serves the current view), so a crashed batch
    never tears existing state and the foreachBatch replay fence is
    the batch id itself.

    Scale: per batch the work is batch-sized signatures + an equi-join
    probe against the index + CC over star-compressed components
    (diameter ~2) plus batch edges — yesterday's corpus is touched
    only through (id, band) rows and (node, component) ids, never
    text.
    """
    from pyspark.sql import functions as F

    from wikidatabots_spark.functions.scale import pushdown_fence
    from wikidatabots_spark.operators.dedup import (
        band_pairs,
        cap_band_buckets,
        connected_components,
        minhash_band_table,
    )

    def apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        bands_new = pushdown_fence(minhash_band_table(batch))
        have_state = os.path.isdir(index_path) and bool(
            os.listdir(index_path)
        )
        if not have_state:
            labels = connected_components(band_pairs(bands_new))
        else:
            prior = spark.read.parquet(index_path)
            prior_labels = latest_labels(spark, labels_path)
            bn = bands_new.select(
                F.col("doc_id").alias("id_n"), "band_idx", "band_hash"
            )
            probe_cross = bn.join(
                cap_band_buckets(prior).select(
                    F.col("doc_id").alias("id_p"), "band_idx", "band_hash"
                ),
                ["band_idx", "band_hash"],
            ).select(
                F.least("id_n", "id_p").alias("id_a"),
                F.greatest("id_n", "id_p").alias("id_b"),
            )
            bn2 = bn.select(
                F.col("id_n").alias("id_n2"), "band_idx", "band_hash"
            )
            probe_new = (
                cap_band_buckets(bn, id_col="id_n")
                .join(bn2, ["band_idx", "band_hash"])
                .where(F.col("id_n") < F.col("id_n2"))
                .select(
                    F.col("id_n").alias("id_a"), F.col("id_n2").alias("id_b")
                )
            )
            stars = prior_labels.where(
                F.col("node") != F.col("component")
            ).select(
                F.col("component").alias("id_a"), F.col("node").alias("id_b")
            )
            edges = (
                probe_cross.unionByName(probe_new).unionByName(stars).distinct()
            )
            labels = connected_components(edges)
        # labels are PARTITIONED by batch id so the current-view read
        # (latest_labels) prunes to one partition instead of scanning
        # every superseded version; old versions are retention history
        # (compact by deleting low-__batch_id partitions — never the
        # index, which is the append-only source of truth)
        labels.withColumn("__batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).partitionBy("__batch_id").parquet(labels_path)
        bands_new.write.mode("append").parquet(index_path)

    return apply


def latest_labels(spark: SparkSession, labels_path: str) -> DataFrame:
    """The current component labels: the highest-``__batch_id``
    PARTITION of the append-only labels table. The max batch id comes
    from the partition directory names (a metadata listing, no data
    read), and the literal equality filter partition-prunes the scan to
    that one version — superseded versions cost nothing to keep."""
    from pyspark.sql import functions as F

    all_labels = spark.read.parquet(labels_path)
    last = all_labels.select("__batch_id").distinct().agg(
        F.max("__batch_id").alias("m")
    ).first().m
    return all_labels.where(F.col("__batch_id") == F.lit(last)).select(
        "node", "component"
    )
