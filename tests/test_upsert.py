"""MERGE-style parquet upsert sink: latest-wins, tombstones, idempotent
re-apply, atomic publish."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from wikidatabots_spark.sinks.upsert import merge_upsert, upsert_parquet

SCHEMA = "id long, val string, version long"


def test_merge_latest_wins_and_tombstones(spark):
    cur = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], SCHEMA
    )
    chg = spark.createDataFrame(
        [(2, "b2", 2, False), (3, "c", 2, True), (4, "d", 1, False)],
        SCHEMA + ", _deleted boolean",
    )
    got = {r["id"]: r["val"] for r in merge_upsert(cur, chg, "id", "version").collect()}
    assert got == {1: "a", 2: "b2", 4: "d"}  # 3 tombstoned


def test_merge_reapply_is_idempotent(spark):
    cur = spark.createDataFrame([(1, "a", 5)], SCHEMA)
    chg = spark.createDataFrame([(1, "a2", 5)], SCHEMA)  # same version
    once = merge_upsert(cur, chg, "id", "version")
    twice = merge_upsert(once, chg, "id", "version")
    assert once.collect() == twice.collect() == [(1, "a2", 5)]


def test_upsert_parquet_roundtrip_and_atomic_dir(spark, tmp_path):
    table = os.path.join(str(tmp_path), "t")
    b1 = spark.createDataFrame([(1, "a", 1), (2, "b", 1)], SCHEMA)
    upsert_parquet(spark, table, b1, "id", "version")
    assert sorted(
        map(tuple, spark.read.parquet(table).collect())
    ) == [(1, "a", 1), (2, "b", 1)]
    b2 = spark.createDataFrame(
        [(1, "a9", 2, False), (2, "b", 2, True), (5, "e", 1, False)],
        SCHEMA + ", _deleted boolean",
    )
    upsert_parquet(spark, table, b2, "id", "version")
    assert sorted(
        map(tuple, spark.read.parquet(table).collect())
    ) == [(1, "a9", 2), (5, "e", 1)]
    assert not os.path.isdir(table + ".old")  # swap cleaned up


def test_merge_single_shuffle_plan(spark):
    """The merge is one row_number window keyed on the merge key: one
    exchange, no join."""
    cur = spark.createDataFrame([(1, "a", 1)], SCHEMA)
    chg = spark.createDataFrame([(1, "a2", 2)], SCHEMA)
    plan = (
        merge_upsert(cur, chg, "id", "version")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_lm_and_budget_empty_input_safety(spark):
    """Empty-corpus edges for the round-4b operators: no crashes, empty
    outputs with the right schemas."""
    from wikidatabots_spark.operators.lm import with_lm_score

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = with_lm_score(empty)
    assert out.count() == 0
    assert out.columns == ["doc_id", "n_bigrams", "lm_score"]
    ref = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    assert with_lm_score(empty, train_df=ref).count() == 0
    scored = with_lm_score(ref, train_df=empty).collect()[0]
    assert scored["lm_score"] == 0.0  # every transition unseen → backoff


def test_merge_equal_version_ties_are_deterministic(spark):
    """Two change rows with the same key AND version resolve by row-hash
    — arbitrary but stable across re-runs and shuffle orders."""
    cur = spark.createDataFrame([], SCHEMA)
    chg = spark.createDataFrame([(1, "x", 1), (1, "y", 1)], SCHEMA)
    winners = {
        merge_upsert(cur, chg, "id", "version").collect()[0]["val"]
        for _ in range(3)
    }
    assert len(winners) == 1


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    from wikidatabots_spark.sinks.compaction import compact_parquet_dir

    table = os.path.join(str(tmp_path), "many")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(table)
    before = sum(1 for f in os.listdir(table) if f.endswith(".parquet"))
    assert before >= 40
    n = compact_parquet_dir(spark, table, target_bytes=1 << 30)
    assert n == 1
    out = spark.read.parquet(table)
    assert out.count() == 10_000
    assert out.agg(F.sum("v")).collect()[0][0] == 2 * sum(range(10_000))


def test_compaction_with_order_clusters_file_stats(spark, tmp_path):
    """order_by compaction range-partitions the rewrite: each output
    file covers a disjoint id range (min/max stats become selective)."""
    import pyarrow.parquet as pq

    from wikidatabots_spark.sinks.compaction import compact_parquet_dir

    table = os.path.join(str(tmp_path), "ordered")
    spark.range(0, 20_000).withColumn(
        "k", (F.col("id") * 7919) % 20_000
    ).repartition(16).write.parquet(table)
    compact_parquet_dir(
        spark, table, target_bytes=60_000, order_by=[F.col("k")]
    )
    files = [
        os.path.join(table, f)
        for f in os.listdir(table)
        if f.endswith(".parquet")
    ]
    assert len(files) >= 2
    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["k"])["k"].to_pylist()
        ranges.append((min(t), max(t)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint key ranges per file
