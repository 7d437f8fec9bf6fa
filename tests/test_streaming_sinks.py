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


def test_stream_upsert_parquet_applies_cdc_batches(spark, tmp_path):
    """Change rows streamed from a drop-zone fold into the keyed table:
    the final table equals the batch merge of all changes, tombstones
    included, and a re-trigger with the same checkpoint appends nothing
    (exactly-once at the batch level)."""
    import os

    from pyspark.sql import functions as F

    from wikidatabots_spark.streaming.sinks import stream_upsert_parquet

    drop = os.path.join(str(tmp_path), "changes")
    os.makedirs(drop)
    table = os.path.join(str(tmp_path), "table")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    schema = "id long, val string, version long, _deleted boolean"
    spark.createDataFrame(
        [(1, "a", 1, False), (2, "b", 1, False), (3, "c", 1, False)], schema
    ).write.parquet(os.path.join(drop, "b1"))
    spark.createDataFrame(
        [(2, "b2", 2, False), (3, "c", 2, True), (4, "d", 1, False)], schema
    ).write.parquet(os.path.join(drop, "b2"))
    changes = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .format("parquet")
        .load(drop)
    )
    q = stream_upsert_parquet(changes, table, ckpt, "id", "version")
    q.awaitTermination(120)
    got = {
        r["id"]: (r["val"], r["version"])
        for r in spark.read.parquet(table).collect()
    }
    assert got == {1: ("a", 1), 2: ("b2", 2), 4: ("d", 1)}
    # idle re-trigger: nothing new arrives, table unchanged
    q2 = stream_upsert_parquet(
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .format("parquet")
        .load(drop),
        table,
        ckpt,
        "id",
        "version",
    )
    q2.awaitTermination(120)
    got2 = {
        r["id"]: (r["val"], r["version"])
        for r in spark.read.parquet(table).collect()
    }
    assert got2 == got
