"""TMDB API helper tests against a local fixture server with the pinned
answers from FIXTURES.md §5 — no live network."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from wikidatabots_spark.functions.core import apply_elementwise
from wikidatabots_spark.sources.tmdb_api import tmdb_exists, tmdb_find

# FIXTURES.md §5 pinned answers
FIND = {"tt1630029": {"movie": 76600}, "tt14269590": {"tv": 120998},
        "nm3718007": {"person": 1674162}}
EXISTS = {("movie", 2), ("movie", 3), ("collection", 87255)}


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_GET(self):
        url = urlparse(self.path)
        parts = url.path.strip("/").split("/")
        if parts[0] == "find":
            ext = parts[1]
            body = {f"{mt}_results": [] for mt in ("movie", "tv", "person")}
            for mt, tid in FIND.get(ext, {}).items():
                body[f"{mt}_results"] = [{"id": tid}]
            self.send_response(200)
            self.end_headers()
            self.wfile.write(json.dumps(body).encode())
        else:
            mt, tid = parts[0], int(parts[1])
            if (mt, tid) in EXISTS:
                self.send_response(200)
                self.end_headers()
                self.wfile.write(json.dumps({"id": tid}).encode())
            else:
                self.send_response(404)
                self.end_headers()
                self.wfile.write(b"{}")


@pytest.fixture(scope="module")
def tmdb_server():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_tmdb_find_pinned_answers(spark, tmdb_server):
    df = spark.createDataFrame(
        [("tt1630029",), ("tt14269590",), ("nm3718007",)], "ext string"
    )
    # movie lookup: only the movie id resolves (test_wd_tmdb.py:56-86 shape)
    out = {
        r.ext: r.tmdb_id
        for r in tmdb_find(df, "ext", "movie", base_url=tmdb_server).collect()
    }
    assert out == {"tt1630029": 76600, "tt14269590": None, "nm3718007": None}
    out_tv = {
        r.ext: r.tmdb_id
        for r in tmdb_find(df, "ext", "tv", base_url=tmdb_server).collect()
    }
    assert out_tv == {"tt1630029": None, "tt14269590": 120998, "nm3718007": None}


def test_tmdb_exists_pinned_answers(spark, tmdb_server):
    ids = spark.createDataFrame([(0,), (2,), (3,), (4,), (3106,)], "id long")
    out = {
        r.id: r.exists
        for r in tmdb_exists(ids, "id", "movie", base_url=tmdb_server).collect()
    }
    # FIXTURES.md §5: [0,2,3,4,3106] → [false,true,true,false,false]
    assert out == {0: False, 2: True, 3: True, 4: False, 3106: False}


def test_apply_elementwise_none_passthrough(spark):
    up = apply_elementwise(str.upper, "string")
    df = spark.createDataFrame([("a",), (None,)], "s string")
    got = sorted(
        (r.u for r in df.select(up(F.col("s")).alias("u")).collect()),
        key=lambda x: (x is None, x),
    )
    assert got == ["A", None]
