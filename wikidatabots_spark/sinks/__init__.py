"""Sinks: RDF statement stdout emitter with row-cap guard, partitioned
parquet writers, the verifiable training-shard exporter, and the
MERGE-style keyed parquet upsert."""

from wikidatabots_spark.sinks.rdf import print_rdf_statements
from wikidatabots_spark.sinks.training_shards import (
    assign_shards,
    shard_manifest,
    verify_training_shards,
    write_training_shards,
)
from wikidatabots_spark.sinks.upsert import merge_upsert, upsert_parquet

__all__ = [
    "assign_shards",
    "merge_upsert",
    "print_rdf_statements",
    "shard_manifest",
    "upsert_parquet",
    "verify_training_shards",
    "write_training_shards",
]
