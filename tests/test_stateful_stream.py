"""applyInPandasWithState operator test: streaming per-user profiles
must agree with the batch aggregate over the same file."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidatabots_spark.sources.tables import load_table
from wikidatabots_spark.streaming.events_stream import read_events_stream
from wikidatabots_spark.streaming.stateful import user_profile_stream


def test_user_profile_stream_matches_batch(spark, sf_dir):
    ev = read_events_stream(spark, sf_dir)
    q = (
        user_profile_stream(ev)
        .writeStream.format("memory")
        .queryName("profiles")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode: keep the last emitted row per user
    got = {
        r.user_id: (r.n_events, round(r.sum_value, 4))
        for r in spark.sql("select * from profiles").collect()
    }
    want = {
        r.user_id: (r.n_events, round(r.sum_value, 4))
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .collect()
    }
    assert got == want
    assert len(got) > 0
