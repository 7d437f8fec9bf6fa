"""HTTP column-operator tests against a local fixture server.

Mirrors test_polars_requests.py's cases (echo, empty input, null rows,
status classes, retry-until-200) without live network (SURVEY.md §5 →
FIXTURES.md fixture policy).
"""

from __future__ import annotations

import json
import threading
import warnings
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import pytest
from pyspark.sql import Row, functions as F

from wikidatabots_spark.functions.structs import (
    HTTP_REQUEST_TYPE,
    HTTP_RESPONSE_TYPE,
    prepare_request,
)
from wikidatabots_spark.sources.http import http_get, response_ok, response_text

_FLAKY_COUNTS: dict[str, int] = {}
_STAMPS: list[float] = []


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        url = urlparse(self.path)
        if url.path == "/echo":
            body = json.dumps(
                {
                    "args": {k: v[0] for k, v in parse_qs(url.query).items()},
                    "headers": {k.lower(): v for k, v in self.headers.items()},
                }
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)
        elif url.path.startswith("/status/"):
            code = int(url.path.rsplit("/", 1)[1])
            self.send_response(code)
            self.end_headers()
            self.wfile.write(b"x")
        elif url.path == "/stamp":
            import time as _time

            _STAMPS.append(_time.monotonic())
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"ok")
        elif url.path.startswith("/flaky/"):
            key = url.path
            _FLAKY_COUNTS[key] = _FLAKY_COUNTS.get(key, 0) + 1
            code = 500 if _FLAKY_COUNTS[key] % 2 == 1 else 200
            self.send_response(code)
            self.end_headers()
            self.wfile.write(b"ok" if code == 200 else b"err")
        else:
            self.send_response(404)
            self.end_headers()


@pytest.fixture(scope="module")
def server():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_echo_roundtrip(spark, server):
    df = spark.createDataFrame([(f"{server}/echo?foo=bar",)], "url string")
    df = df.select(
        prepare_request(F.col("url"), headers={"x-foo": "baz"}).alias("http_request")
    )
    out = http_get(df)
    assert out.schema["http_response"].dataType == HTTP_RESPONSE_TYPE
    row = out.collect()[0]
    assert row.http_response.status == 200
    body = json.loads(bytes(row.http_response.data))
    assert body["args"] == {"foo": "bar"}
    assert body["headers"]["x-foo"] == "baz"
    # response_text helper decodes the same body
    txt = out.select(response_text("http_response").alias("t")).collect()[0].t
    assert json.loads(txt) == body


def test_empty_input_short_circuits(spark, server):
    df = spark.createDataFrame([], HTTP_REQUEST_TYPE).select(
        F.struct("url", "headers").alias("http_request")
    )
    df = spark.createDataFrame([], "http_request struct<url:string,headers:array<struct<name:string,value:string>>>")
    out = http_get(df)
    assert out.count() == 0
    assert out.schema["http_response"].dataType == HTTP_RESPONSE_TYPE


def test_null_request_yields_null_response(spark, server):
    df = spark.createDataFrame(
        [(f"{server}/status/200",), (None,)], "url string"
    ).select(
        F.when(
            F.col("url").isNotNull(), prepare_request(F.col("url"))
        ).alias("http_request")
    )
    rows = http_get(df).collect()
    by_null = {r.http_request is None: r.http_response for r in rows}
    assert by_null[False].status == 200
    assert by_null[True] is None


def test_status_classification(spark, server):
    df = spark.createDataFrame([(f"{server}/status/404",)], "url string").select(
        prepare_request(F.col("url")).alias("http_request")
    )
    # unknown status → warning, response still returned
    out = http_get(df, ok_statuses=(200,)).collect()
    assert out[0].http_response.status == 404
    # ok status listed → no warning path, plain result
    out2 = http_get(
        spark.createDataFrame([(f"{server}/status/201",)], "url string").select(
            prepare_request(F.col("url")).alias("http_request")
        ),
        ok_statuses=(200, 201),
    ).collect()
    assert out2[0].http_response.status == 201


def test_retry_until_ok(spark, server):
    # /flaky alternates 500, 200 → retry_count=2 lands on 200
    df = spark.createDataFrame([(f"{server}/flaky/a",)], "url string").select(
        prepare_request(F.col("url")).alias("http_request")
    )
    rows = http_get(df, retry_count=2).collect()
    assert rows[0].http_response.status == 200


def test_response_ok_predicate(spark, server):
    df = spark.createDataFrame(
        [(f"{server}/status/200",), (f"{server}/status/404",)], "url string"
    ).select(prepare_request(F.col("url")).alias("http_request"))
    out = http_get(df).select(response_ok("http_response").alias("ok"))
    assert sorted(r.ok for r in out.collect()) == [False, True]


def test_retry_count_cap():
    import pyspark.sql

    with pytest.raises(AssertionError):
        http_get(None, retry_count=13)


def test_global_rate_limit_across_partitions(spark, server):
    """With partitions=4 the AGGREGATE request rate must respect
    1/min_time (time-sliced per-partition quotas), not 4x it."""
    _STAMPS.clear()
    urls = [(f"{server}/stamp?i={i}",) for i in range(12)]
    df = spark.createDataFrame(urls, "url string").select(
        prepare_request(F.col("url")).alias("http_request")
    )
    http_get(df, min_time=0.1, partitions=4).collect()
    assert len(_STAMPS) == 12
    ts = sorted(_STAMPS)
    # provable bound: each partition fires at most once per 4*0.1 s, so any
    # window holding 5 requests spans > 0.1 s
    for i in range(len(ts) - 4):
        assert ts[i + 4] - ts[i] >= 0.1 * 0.8
    # and the whole run cannot collapse to a burst: the busiest partition
    # (>= 3 rows) alone needs >= 2 periods
    assert ts[-1] - ts[0] >= 0.55
