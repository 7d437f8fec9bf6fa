"""Replay streaming source tests: deterministic batch slicing, full
parity with the batch table, and multi-batch delivery.

Note: Python micro-batch sources don't support Trigger.AvailableNow
(Spark falls back to one batch), so these tests run a continuous
trigger and poll until the replay drains."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from wikidatabots_spark.sources.replay_stream import register_replay_source

_SCHEMA = "doc_id long, source string, n_chars long"


def _replay(spark, sf_dir, batch_rows):
    register_replay_source(spark)
    return (
        spark.readStream.format("parquet_replay")
        .schema(_SCHEMA)
        .option("path", f"{sf_dir}/documents.parquet")
        .option("order_by", "doc_id")
        .option("batch_rows", str(batch_rows))
        .load()
    )


def _drain(spark, q, count_sql: str, want_n: int, timeout_s: int = 90) -> None:
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if spark.sql(count_sql).collect()[0].n >= want_n:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)


def test_replay_stream_delivers_every_row_exactly_once(spark, sf_dir):
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    q = (
        _replay(spark, sf_dir, batch_rows=64)
        .writeStream.format("memory")
        .queryName("replay_rows")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    _drain(spark, q, "select count(*) n from replay_rows", n_docs)
    got = {
        r.source: (r.n, r.chars)
        for r in spark.sql(
            "select source, count(*) n, sum(n_chars) chars "
            "from replay_rows group by source"
        ).collect()
    }
    want = {
        r.source: (r.n, r.chars)
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("chars"),
        )
        .collect()
    }
    assert got == want and len(got) > 0
    # exactly once: no row delivered twice
    dups = spark.sql(
        "select doc_id from replay_rows group by doc_id having count(*) > 1"
    ).count()
    assert dups == 0


def test_replay_stream_batches_are_offset_sliced(spark, sf_dir):
    """The first micro-batch must be exactly rows [0, batch) of the
    doc_id order — the deterministic slicing that makes stream/batch
    parity failures attributable."""
    batch = 64
    q = (
        _replay(spark, sf_dir, batch_rows=batch)
        .writeStream.format("memory")
        .queryName("replay_first")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    _drain(spark, q, "select count(*) n from replay_first", batch)
    first_ids = sorted(
        r.doc_id
        for r in spark.sql(
            f"select doc_id from replay_first order by doc_id limit {batch}"
        ).collect()
    )
    want = sorted(
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .orderBy("doc_id")
        .limit(batch)
        .collect()
    )
    assert first_ids == want
