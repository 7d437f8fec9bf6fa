"""Deterministic replay STREAMING source (Spark 4 Python data source,
``SimpleDataSourceStreamReader``): serves the rows of a parquet file as
a stream in fixed-size micro-batches, in a stable order.

Why this exists: testing a streaming operator against its batch twin
needs a stream whose batch boundaries are REPRODUCIBLE — the built-in
file source's batching depends on file layout and trigger timing, so a
parity failure can't distinguish "operator wrong" from "batches
sliced differently". The replay source pins the slicing: offset = row
position in (sort-key) order, every run produces byte-identical
batches, and a mid-stream restart resumes from the recorded offset
(offsets are plain dicts the checkpoint log serializes).

This is also the reference implementation for pointing the engine at a
queue-like system: ``initialOffset / read(start) / readBetweenOffsets``
are exactly the Kafka-consumer contract, with the parquet file standing
in for the topic.

Scale note: a SimpleDataSourceStreamReader reads on the DRIVER — right
for fixtures and replay-testing, wrong for production volume (a
partition-planning DataSourceStreamReader is the scale path; the
offset contract is identical). The batch size bounds driver memory per
micro-batch.

No reference counterpart (north-star extension; the reference has no
streaming surface at all).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType


class ParquetReplayStreamReader(SimpleDataSourceStreamReader):
    """Offsets are ``{"row": n}`` — rows [n, n+batch) of the stable
    order serve micro-batch n/batch."""

    def __init__(self, schema: StructType, options: dict) -> None:
        self._path = options["path"]
        self._order_by = options.get("order_by", "")
        self._batch = int(options.get("batch_rows", "100"))
        self._schema = schema
        self._rows: list[tuple] | None = None

    def _load(self) -> list[tuple]:
        # driver-side, loaded once per reader instance; pyarrow keeps
        # this dependency-light (no SparkSession inside the source)
        if self._rows is None:
            import pyarrow.parquet as pq

            tbl = pq.read_table(self._path)
            names = [f.name for f in self._schema.fields]
            tbl = tbl.select(names)
            if self._order_by:
                keys = [k.strip() for k in self._order_by.split(",")]
                tbl = tbl.sort_by([(k, "ascending") for k in keys])
            cols = [c.to_pylist() for c in tbl.columns]
            self._rows = list(zip(*cols)) if cols else []
        return self._rows

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        rows = self._load()
        lo = int(start["row"])
        hi = min(lo + self._batch, len(rows))
        return iter(rows[lo:hi]), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # replay for recovery: must return the same rows as the
        # original read — trivially true, the order is pinned
        rows = self._load()
        return iter(rows[int(start["row"]) : int(end["row"])])


class ParquetReplayDataSource(DataSource):
    """``spark.readStream.format("parquet_replay")`` with options:

    - ``path`` (required): parquet file to replay
    - ``order_by``: comma-separated sort columns pinning the replay
      order (recommended — parquet row order is stable per file, but an
      explicit key makes the stream self-describing)
    - ``batch_rows``: rows per micro-batch (default 100)

    Schema must be declared (``.schema(ddl)``) — no inference, the
    repo-wide source rule (SURVEY §1).
    """

    @classmethod
    def name(cls) -> str:
        return "parquet_replay"

    def schema(self) -> str:
        raise ValueError(
            "parquet_replay needs an explicit .schema(...) — no inference"
        )

    def simpleStreamReader(self, schema: StructType) -> ParquetReplayStreamReader:
        if "path" not in self.options:
            raise ValueError("parquet_replay needs option 'path'")
        return ParquetReplayStreamReader(schema, dict(self.options))


def register_replay_source(spark: SparkSession) -> None:
    spark.dataSource.register(ParquetReplayDataSource)
