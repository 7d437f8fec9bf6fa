"""Sources: table loaders and external I/O adapters."""

from wikidatabots_spark.sources.corpus_io import (
    read_jsonl_documents,
    read_text_documents,
    write_jsonl,
)
from wikidatabots_spark.sources.tables import load_table, scan_parquet_url

__all__ = [
    "load_table",
    "scan_parquet_url",
    "read_jsonl_documents",
    "read_text_documents",
    "write_jsonl",
]
