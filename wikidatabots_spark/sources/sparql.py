"""SPARQL → DataFrame table function (reference S4, sparql.py:27-90).

The reference wraps a WDQS POST inside a Polars ``map_batches`` so the
query participates in the lazy plan. Result sets are small (the reference
itself materializes them whole), so the idiomatic Spark port is a
**driver-side table function**: fetch once, ``createDataFrame`` with the
declared schema — the frame then joins/filters distributedly like any
other. (A Spark 4 Python Data Source would be the `spark.read.format`
upgrade path; driver-side keeps retry/warning fidelity trivial.)

Behavior preserved from sparql.py:
- caller MUST declare the result shape: ``columns`` (all-string) or a
  full ``schema`` — missing both is an assertion error (:69-76)
- POST with ``Accept: text/csv`` and a bot User-Agent (:14,:32-36)
- embedded-timeout detection inside 200 responses (:39-40)
- exponential backoff, ≤ 30 tries, ≤ 120 s interval (:21-26)
- slow-query logging at 5 s, warning at 45 s (:45-49)
- CSV parsed with the declared schema, never inferred (:78-79)

``transport`` is injectable for tests (no live network — FIXTURES.md).
"""

from __future__ import annotations

import csv
import io
import time
import warnings
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

WDQS_URL = "https://query.wikidata.org/sparql"
USER_AGENT = "wikidatabots-spark/0.1 (analytics engine; batch)"

SLOW_LOG_SECS = 5.0  # sparql.py:48-49
SLOW_WARN_SECS = 45.0  # sparql.py:45-47
MAX_TRIES = 30  # sparql.py:21-26
MAX_BACKOFF_SECS = 120.0

Transport = Callable[[str], tuple[int, bytes]]


def _default_transport(query: str) -> tuple[int, bytes]:
    import requests

    resp = requests.post(
        WDQS_URL,
        data={"query": query},
        headers={"Accept": "text/csv", "User-Agent": USER_AGENT},
        timeout=(1, 90),  # sparql.py:37
    )
    return resp.status_code, resp.content


def _sparql_csv(query: str, transport: Transport) -> bytes:
    """POST with retries, timeout detection and slow-query warnings."""
    delay = 1.0
    for attempt in range(1, MAX_TRIES + 1):
        t0 = time.monotonic()
        try:
            status, body = transport(query)
            elapsed = time.monotonic() - t0
            if elapsed > SLOW_WARN_SECS:
                warnings.warn(f"sparql query took {elapsed:.1f}s")
            elif elapsed > SLOW_LOG_SECS:
                print(f"[sparql] slow query: {elapsed:.1f}s")
            if status == 200 and b"java.util.concurrent.TimeoutException" in body:
                # WDQS embeds timeouts in 200 responses (sparql.py:39-40)
                raise TimeoutError("embedded WDQS timeout")
            if status != 200:
                raise ConnectionError(f"sparql status {status}")
            return body
        except Exception:
            if attempt >= MAX_TRIES:
                raise
            time.sleep(min(delay, MAX_BACKOFF_SECS))
            delay = min(delay * 2, MAX_BACKOFF_SECS)
    raise AssertionError("unreachable")


def sparql(
    spark: SparkSession,
    query: str,
    columns: list[str] | None = None,
    schema: StructType | None = None,
    transport: Transport | None = None,
) -> DataFrame:
    """Run a SPARQL query, return a typed DataFrame.

    Exactly one of ``columns`` (all-Utf8 shorthand) / ``schema`` must be
    given — declared schemas, never inferred (SURVEY.md §1).
    """
    assert (columns is None) != (schema is None), (
        "pass exactly one of columns= or schema="
    )
    body = _sparql_csv(query, transport or _default_transport)
    reader = csv.reader(io.StringIO(body.decode("utf-8")))
    rows = list(reader)
    header = rows[0] if rows else []
    data = [[c if c != "" else None for c in r] for r in rows[1:]]

    if columns is not None:
        names = columns
    else:
        names = [f.name for f in schema.fields]
    # SPARQL SELECT vars may be a superset/reorder of the declared columns
    idx = [header.index(n) if n in header else None for n in names]
    picked = [
        [None if i is None else (r[i] if i < len(r) else None) for i in idx]
        for r in data
    ]

    str_schema = ", ".join(f"`{n}` string" for n in names)
    df = spark.createDataFrame(picked, str_schema)
    if schema is not None:
        # lenient per-column casts mirroring Polars CSV schema_overrides
        df = df.select(
            *[F.col(f.name).try_cast(f.dataType).alias(f.name) for f in schema.fields]
        )
    return df
