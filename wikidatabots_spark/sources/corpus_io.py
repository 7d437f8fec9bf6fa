"""Corpus ingestion/export adapters: JSONL and raw-text documents.

LLM corpora arrive overwhelmingly as JSON-Lines (one document object
per line — Common Crawl derivatives, FineWeb, Dolma, OpenWebText
re-releases) or as raw text files. These adapters wrap Spark's native
readers with the repo's schema discipline (SURVEY.md §1: every external
ingestion point DECLARES its schema; inference is never relied on —
the reference asserts on a missing SPARQL schema the same way,
``sparql.py:69-76``):

- ``read_jsonl_documents`` — schema-declared JSONL scan. Malformed
  lines follow the chosen policy: ``permissive`` keeps them in a
  ``_corrupt_record`` column for quarantine (the 100 TB default — one
  bad crawler record must not kill a 6-hour ingest), ``failfast``
  aborts on first error (for curated hand-offs where corruption means
  upstream breakage).
- ``write_jsonl`` — shard-parallel JSONL export (one file per
  partition; pair with sinks.compaction for size-targeted output).
- ``read_text_documents`` — one document per line with provenance
  (``source_file``) and a CONTENT-DERIVED doc_id (xxhash64 of
  file + text): stable across re-runs and cluster sizes, unlike
  ``monotonically_increasing_id`` whose values depend on partition
  layout. Identical lines within one file collide by construction —
  that is exact-dedup semantics at ingest, documented not hidden.

Scale: all three are narrow, splittable scans/writes — JSONL and text
files split by line boundaries, so a 100 TB drop zone parallelizes to
one task per input split with no shuffle. The JSONL reader prunes to
the declared schema (unreferenced JSON keys are never parsed into
rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl_documents(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mode: str = "permissive",
) -> DataFrame:
    """Scan JSON-Lines with a DECLARED schema (never inferred — a
    schema-inference pass over 100 TB is a full extra read, and a
    drifting inferred schema breaks every downstream plan silently).

    mode='permissive': rows that fail to parse land with all declared
    columns null and the raw line in ``_corrupt_record`` — filter
    ``F.col(CORRUPT_COL).isNotNull()`` into a quarantine sink.
    mode='failfast': first malformed line raises.
    """
    if not isinstance(schema, StructType) or not schema.fields:
        raise ValueError("read_jsonl_documents requires a non-empty StructType")
    if mode not in ("permissive", "failfast"):
        raise ValueError(f"unsupported mode: {mode!r}")
    read_schema = schema
    if mode == "permissive" and CORRUPT_COL not in schema.names:
        # Spark only populates the corrupt column if it is in the schema
        from pyspark.sql.types import StringType

        read_schema = StructType(
            list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
        )
    return (
        spark.read.schema(read_schema)
        .option("mode", mode.upper())
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Shard-parallel JSONL export — one file per partition, written by
    executors (no driver collect). Null columns are omitted per JSON
    convention; readers must treat absent keys as null."""
    df.write.mode(mode).json(path)


def read_text_documents(spark: SparkSession, path: str) -> DataFrame:
    """One document per line from raw text files:
    (doc_id, text, source_file).

    doc_id = xxhash64(source_file, text) — a pure content/provenance
    function, so re-ingesting the same drop zone yields identical ids
    on any cluster layout (monotonically_increasing_id does not).
    Duplicate lines of one file map to one id: exact-dedup-at-ingest
    semantics (keep-any is correct because the rows are
    indistinguishable).
    """
    raw = spark.read.text(path)
    return raw.select(
        F.xxhash64(F.input_file_name(), F.col("value")).alias("doc_id"),
        F.col("value").alias("text"),
        F.input_file_name().alias("source_file"),
    )
