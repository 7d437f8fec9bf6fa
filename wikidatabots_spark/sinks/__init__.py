"""Sinks: RDF statement stdout emitter with row-cap guard, partitioned
parquet writers, and the verifiable training-shard exporter."""

from wikidatabots_spark.sinks.rdf import print_rdf_statements
from wikidatabots_spark.sinks.training_shards import (
    assign_shards,
    shard_manifest,
    verify_training_shards,
    write_training_shards,
)

__all__ = [
    "assign_shards",
    "print_rdf_statements",
    "shard_manifest",
    "verify_training_shards",
    "write_training_shards",
]
