"""Streaming sink tests: checkpointed parquet append + foreachBatch RDF."""

from __future__ import annotations

import io

from pyspark.sql import functions as F

from wikidatabots_spark.functions.core import pl_format
from wikidatabots_spark.sources.tables import load_table
from wikidatabots_spark.streaming.events_stream import dedup_stream, read_events_stream
from wikidatabots_spark.streaming.sinks import stream_rdf_statements, stream_to_parquet


def test_stream_to_parquet_roundtrip(spark, sf_dir, tmp_path):
    ev = read_events_stream(spark, sf_dir)
    out = str(tmp_path / "out")
    q = stream_to_parquet(
        dedup_stream(ev),
        out,
        checkpoint=str(tmp_path / "ckpt"),
        partition_by=["event_type"],
    )
    q.awaitTermination(120)
    back = spark.read.parquet(out)
    want = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert back.count() == want
    # partition layout materialized
    assert back.where(F.col("event_type") == "signup").count() > 0


def test_stream_rdf_statements(spark, sf_dir, tmp_path):
    ev = read_events_stream(spark, sf_dir)
    rdf = dedup_stream(ev, keys=["user_id"]).select(
        pl_format('wd:U{} wdt:P0 "seen" .', F.col("user_id")).alias("rdf_statement")
    )
    buf = io.StringIO()
    q = stream_rdf_statements(rdf, checkpoint=str(tmp_path / "ck2"), file=buf)
    q.awaitTermination(120)
    lines = [l for l in buf.getvalue().split("\n") if l]
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert len(lines) == n_users
    assert all(l.startswith("wd:U") for l in lines)
