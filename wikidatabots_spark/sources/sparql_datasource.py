"""SPARQL as a Spark 4 Python Data Source — `spark.read.format("sparql")`.

The idiomatic upgrade path over the driver-side table function
(SURVEY.md §2.1 S4): after ``register_sparql_source(spark)``,

    spark.read.format("sparql")
        .schema("item string, tmdb_id bigint")
        .option("query", "SELECT ?item ?tmdb_id WHERE { ... }")
        .load()

The reader runs in an executor Python worker (one partition — WDQS
result sets are small and the endpoint is rate-limited; fan-out happens
in the plan *after* the scan). Schema is declared, never inferred
(SURVEY §1): either pass ``.schema(ddl)`` or ``columns`` (all-string).

``fixture_path`` option reads the CSV from a local file instead of the
network — the test seam (FIXTURES.md policy: no live network in tests).
"""

from __future__ import annotations

import csv
import datetime
import io
from collections.abc import Iterator

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
    TimestampType,
)


def _convert(value: str | None, dtype) -> object:
    if value is None or value == "":
        return None
    if isinstance(dtype, StringType):
        return value
    if isinstance(dtype, (LongType, IntegerType, ShortType, ByteType)):
        try:
            return int(value)
        except ValueError:
            return None
    if isinstance(dtype, (DoubleType, FloatType)):
        try:
            return float(value)
        except ValueError:
            return None
    if isinstance(dtype, BooleanType):
        return value.lower() in ("true", "1", "t")
    if isinstance(dtype, DateType):
        try:
            return datetime.date.fromisoformat(value[:10])
        except ValueError:
            return None
    if isinstance(dtype, TimestampType):
        try:
            return datetime.datetime.fromisoformat(value.replace("Z", "+00:00")).replace(
                tzinfo=None
            )
        except ValueError:
            return None
    raise TypeError(f"unsupported sparql column type: {dtype}")


class SparqlReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.options = options

    def read(self, partition) -> Iterator[tuple]:
        fixture = self.options.get("fixture_path")
        if fixture:
            with open(fixture, "rb") as f:
                body = f.read()
        else:
            from wikidatabots_spark.sources.sparql import _default_transport, _sparql_csv

            body = _sparql_csv(self.options["query"], _default_transport)
        rows = list(csv.reader(io.StringIO(body.decode("utf-8"))))
        header = rows[0] if rows else []
        names = [f.name for f in self.schema_.fields]
        idx = [header.index(n) if n in header else None for n in names]
        for r in rows[1:]:
            yield tuple(
                _convert(
                    None if i is None or i >= len(r) else r[i], f.dataType
                )
                for i, f in zip(idx, self.schema_.fields)
            )


class SparqlDataSource(DataSource):
    """format("sparql"): options query= (or fixture_path=), declared schema."""

    @classmethod
    def name(cls) -> str:
        return "sparql"

    def schema(self) -> str:
        # no inference: require .schema(...) or a columns= option
        cols = self.options.get("columns")
        if not cols:
            raise ValueError(
                "sparql source needs .schema(ddl) or .option('columns', 'a,b,c')"
            )
        return ", ".join(f"`{c.strip()}` string" for c in cols.split(","))

    def reader(self, schema: StructType) -> SparqlReader:
        if "query" not in self.options and "fixture_path" not in self.options:
            raise ValueError("sparql source needs option 'query' (or 'fixture_path')")
        return SparqlReader(schema, dict(self.options))


def register_sparql_source(spark: SparkSession) -> None:
    spark.dataSource.register(SparqlDataSource)
