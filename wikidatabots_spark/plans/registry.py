"""Registry wiring query callables to their DuckDB oracle SQL.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable plus (usually) an
ANSI-SQL string DuckDB can run over the same parquet tables. The driver
compares row-count + schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- aggregates over doubles go through DECIMAL (exact, associative) and cast
  back to DOUBLE, so Spark's and DuckDB's different summation orders cannot
  produce different bits;
- no query relies on row order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Entry:
    fn: QueryFn
    oracle: str | None  # None → driver runs rows-only check


REGISTRY: dict[str, Entry] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Entry(fn, oracle)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: e.fn for name, e in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.oracle for name, e in REGISTRY.items() if e.oracle is not None}
