"""Expression library: Spark Columns closing the reference's semantic gaps."""

from wikidatabots_spark.functions.core import (
    between_left_closed,
    binary_to_utf8,
    is_unique,
    limit_warn,
    now_lit,
    pl_format,
    prefix_columns,
    regexp_extract_null,
    sample_n,
    unique_first_by,
    unique_keep_none,
    where_unique,
)

__all__ = [
    "between_left_closed",
    "binary_to_utf8",
    "is_unique",
    "limit_warn",
    "now_lit",
    "pl_format",
    "prefix_columns",
    "regexp_extract_null",
    "sample_n",
    "unique_first_by",
    "unique_keep_none",
    "where_unique",
]
