"""SPARQL table function, blocklist source, and RDF sink tests —
fixture transports only, no live network (FIXTURES.md)."""

from __future__ import annotations

import io
import json
import warnings

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from wikidatabots_spark.sinks.rdf import print_rdf_statements
from wikidatabots_spark.sources.mediawiki import blocked_qids, is_blocked_item
from wikidatabots_spark.sources.sparql import sparql

CSV_BODY = (
    b"item,imdb_id,tmdb_id\n"
    b"http://www.wikidata.org/entity/Q1,tt111,\n"
    b"http://www.wikidata.org/entity/Q2,tt222,42\n"
)


def test_sparql_columns_mode(spark):
    df = sparql(
        spark,
        "SELECT ?item ?imdb_id ?tmdb_id WHERE {}",
        columns=["item", "imdb_id", "tmdb_id"],
        transport=lambda q: (200, CSV_BODY),
    )
    # all-string schema, empty CSV cells become nulls (sparql.py:69-76)
    assert df.schema == StructType(
        [
            StructField("item", StringType()),
            StructField("imdb_id", StringType()),
            StructField("tmdb_id", StringType()),
        ]
    )
    rows = df.orderBy("item").collect()
    assert rows[0].tmdb_id is None
    assert rows[1].tmdb_id == "42"


def test_sparql_schema_mode_casts(spark):
    schema = StructType(
        [
            StructField("item", StringType()),
            StructField("tmdb_id", LongType()),
        ]
    )
    df = sparql(
        spark,
        "q",
        schema=schema,
        transport=lambda q: (200, CSV_BODY),
    )
    assert df.schema == schema
    assert {r.tmdb_id for r in df.collect()} == {None, 42}


def test_sparql_requires_declared_shape(spark):
    with pytest.raises(AssertionError):
        sparql(spark, "q", transport=lambda q: (200, b"a\n1\n"))
    with pytest.raises(AssertionError):
        sparql(
            spark,
            "q",
            columns=["a"],
            schema=StructType([StructField("a", StringType())]),
            transport=lambda q: (200, b"a\n1\n"),
        )


def test_sparql_retries_then_succeeds(spark):
    calls = {"n": 0}

    def flaky(q):
        calls["n"] += 1
        if calls["n"] < 3:
            return (503, b"")
        return (200, b"a\n1\n")

    import wikidatabots_spark.sources.sparql as sq

    orig = sq.MAX_BACKOFF_SECS
    sq.MAX_BACKOFF_SECS = 0.01
    try:
        df = sparql(spark, "q", columns=["a"], transport=flaky)
    finally:
        sq.MAX_BACKOFF_SECS = orig
    assert calls["n"] == 3
    assert df.collect()[0].a == "1"


def test_sparql_embedded_timeout_retried(spark):
    calls = {"n": 0}

    def t(q):
        calls["n"] += 1
        if calls["n"] == 1:
            # WDQS embeds timeouts in 200 responses (sparql.py:39-40)
            return (200, b"java.util.concurrent.TimeoutException: oops")
        return (200, b"a\nok\n")

    import wikidatabots_spark.sources.sparql as sq

    orig = sq.MAX_BACKOFF_SECS
    sq.MAX_BACKOFF_SECS = 0.01
    try:
        df = sparql(spark, "q", columns=["a"], transport=t)
    finally:
        sq.MAX_BACKOFF_SECS = orig
    assert df.collect()[0].a == "ok"
    assert calls["n"] == 2


def test_blocklist_parse_and_predicate(spark):
    body = json.dumps(
        {
            "query": {
                "pages": {
                    "103442925": {"extract": "Blocked: Q5 and Q42, also Q5 again."}
                }
            }
        }
    ).encode()
    qids = blocked_qids(transport=lambda: body)
    assert qids == ("Q42", "Q5")
    df = spark.createDataFrame(
        [("http://www.wikidata.org/entity/Q5",), ("http://www.wikidata.org/entity/Q6",)],
        "item string",
    )
    out = df.where(~is_blocked_item("item", qids)).collect()
    assert [r.item for r in out] == ["http://www.wikidata.org/entity/Q6"]


def test_rdf_sink_prints_and_caps(spark):
    df = spark.createDataFrame(
        [(f"wd:Q{i} wdt:P1 \"x\" .",) for i in range(5)], "rdf_statement string"
    )
    buf = io.StringIO()
    n = print_rdf_statements(df, limit=250, file=buf)
    assert n == 5
    assert buf.getvalue().count("\n") == 5
    # over the cap: warn + sample down
    buf2 = io.StringIO()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        n2 = print_rdf_statements(df, limit=3, file=buf2, seed=1)
    assert n2 == 3
    assert any("5 rows" in str(x.message) for x in w)


def test_rdf_sink_progress_callback(spark):
    df = spark.createDataFrame(
        [(f"wd:Q{i} wdt:P1 \"x\" .",) for i in range(4)], "rdf_statement string"
    )
    seen: list[int] = []
    n = print_rdf_statements(df, file=io.StringIO(), progress=seen.append)
    assert n == 4 and seen == [1, 2, 3, 4]


def test_rdf_sink_schema_assert(spark):
    bad = spark.createDataFrame([(1, "x")], "a long, rdf_statement string")
    with pytest.raises(AssertionError):
        print_rdf_statements(bad)
