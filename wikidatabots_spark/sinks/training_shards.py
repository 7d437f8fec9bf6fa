"""Training-shard export: the last mile of a pre-training data pipeline.

A trainer consumes a corpus as N fixed shards with a manifest (row
counts + checksums) it can verify before a run burns cluster-days on
corrupt or partial input. Rules encoded here:

- **Deterministic shard assignment**: shard = content-hash bucket of the
  key, NOT ``spark.partition_id`` or round-robin — re-running the export
  on the same corpus bit-reproduces every shard, so a resumed/backfilled
  export never silently reshuffles documents between shards (which would
  break the trainer's resume bookkeeping).
- **One file per shard**: repartition by the shard id before
  ``partitionBy`` — the blind write would emit (input-partitions ×
  shards) small files.
- **Order-insensitive checksums**: per-shard ``bit_xor`` over a per-row
  hash. Parquet row order within a shard is whatever the shuffle
  produced; XOR is commutative, so the manifest pins CONTENT not order,
  and two exports of the same corpus always produce the same manifest.
- The manifest is a driver-side JSON (n_shards rows — KBs); the stats
  aggregation underneath is distributed (groupBy(shard), map-side
  partials).

Scale: assignment is a narrow map; the only exchange is the
repartition-by-shard the write needs anyway; manifest agg reuses that
exchange's key. At 100 TB pick n_shards so a shard is 1-10 GB (the
trainer's streaming-read unit), e.g. 16384.

No reference counterpart (the reference's only sink is stdout RDF,
wd_tmdb.py:395-401; north-star extension).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def assign_shards(
    df: DataFrame,
    n_shards: int = 64,
    key_col: str = "doc_id",
    out_col: str = "shard",
) -> DataFrame:
    """Attach a deterministic shard id: first 4 hex digits of
    ``md5('shard:' || key)`` mod ``n_shards`` — a pure narrow map,
    engine-reproducible (the same md5-bucket arithmetic every
    deterministic sampler in this repo uses)."""
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("shard:"), F.col(key_col).cast("string"))),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")
    return df.withColumn(out_col, (bucket % n_shards).cast("int"))


def _row_hash(key_col: str, payload_col: str) -> Column:
    """32-bit content hash of one row (md5 hex → long): small enough to
    XOR safely in any engine, wide enough that a manifest mismatch on a
    corrupted shard is near-certain."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(key_col).cast("string"),
                    F.lit(":"),
                    F.col(payload_col).cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")


def shard_manifest(
    df: DataFrame,
    n_shards: int = 64,
    key_col: str = "doc_id",
    payload_col: str = "text",
    size_col: str | None = "n_chars",
) -> DataFrame:
    """Per-shard manifest rows → (shard, n_rows, total_size, checksum).

    ``checksum`` is the XOR of per-row content hashes — commutative, so
    identical corpus content yields an identical manifest regardless of
    row order, partitioning, or cluster size.
    """
    sharded = assign_shards(df, n_shards, key_col)
    size = (
        F.sum(F.col(size_col)).alias("total_size")
        if size_col
        else F.lit(None).cast("bigint").alias("total_size")
    )
    return (
        sharded.withColumn("__h", _row_hash(key_col, payload_col))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            size,
            F.expr("bit_xor(__h)").alias("checksum"),
        )
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 64,
    key_col: str = "doc_id",
    payload_col: str = "text",
    size_col: str | None = "n_chars",
    mode: str = "overwrite",
) -> dict:
    """Export the corpus as ``shard=K`` parquet directories plus a
    ``_manifest.json`` the trainer verifies before reading (the leading
    underscore keeps it invisible to parquet directory scans, like
    ``_SUCCESS``). Returns the manifest dict. One exchange total
    (repartition by shard feeds both the write layout and the stats
    aggregation)."""
    sharded = assign_shards(df, n_shards, key_col).repartition("shard")
    sharded.write.mode(mode).partitionBy("shard").parquet(path)
    rows = (
        shard_manifest(df, n_shards, key_col, payload_col, size_col)
        .orderBy("shard")
        .collect()
    )
    manifest = {
        "n_shards": n_shards,
        "key": key_col,
        "payload": payload_col,
        "shards": [
            {
                "shard": r["shard"],
                "n_rows": r["n_rows"],
                "total_size": r["total_size"],
                "checksum": r["checksum"],
            }
            for r in rows
        ],
    }
    with open(os.path.join(path, "_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def verify_training_shards(spark, path: str) -> bool:
    """Trainer-side gate: recompute the manifest from the written files
    and compare to ``_manifest.json``. True iff every shard's row count
    and checksum match (a partial or corrupted export fails loudly
    before any training run starts)."""
    with open(os.path.join(path, "_manifest.json")) as fh:
        want = json.load(fh)
    df = spark.read.parquet(path)
    key_col = want["key"]
    payload_col = want.get("payload", "text")
    got_rows = (
        df.withColumn("__h", _row_hash(key_col, payload_col))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(__h)").alias("checksum"),
        )
        .orderBy("shard")
        .collect()
    )
    got = {
        int(r["shard"]): (r["n_rows"], r["checksum"]) for r in got_rows
    }
    exp = {
        s["shard"]: (s["n_rows"], s["checksum"]) for s in want["shards"]
    }
    return got == exp
