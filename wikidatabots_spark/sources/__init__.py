"""Sources: table loaders and external I/O adapters."""

from wikidatabots_spark.sources.tables import load_table, scan_parquet_url

__all__ = ["load_table", "scan_parquet_url"]
