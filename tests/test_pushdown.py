"""Scan-efficiency regression pins: predicate pushdown, column pruning,
and partition pruning must actually reach the parquet scan — a plan
that reads all columns for a two-column projection, or all partitions
for a one-partition filter, is wrong at any scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidatabots_spark.sources.tables import load_table


def _scan_line(plan: str) -> str:
    return "\n".join(
        ln for ln in plan.split("\n") if "Scan parquet" in ln or "PushedFilters" in ln or "ReadSchema" in ln
    )


def test_filter_and_projection_reach_the_scan(spark, sf_dir):
    df = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 10)
        .select("doc_id", "source")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # predicate pushdown: the doc_id filter appears as a parquet pushed
    # filter, not only as a post-scan Filter node
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]" in plan, plan
    # column pruning: the scan schema carries ONLY the projected columns
    # (in particular not the wide text column)
    assert "text" not in _scan_line(plan).replace("PushedFilters", ""), plan


def test_partition_pruning_on_partitioned_write(spark, sf_dir, tmp_path):
    out = str(tmp_path / "by_source")
    load_table(spark, sf_dir, "documents").write.partitionBy("source").parquet(
        out
    )
    pruned = spark.read.parquet(out).where(F.col("source") == "src0")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the source predicate must land in PartitionFilters (directory
    # pruning — zero IO for other sources), not in the data filters
    assert "PartitionFilters" in plan and "isnotnull(source" in plan, plan
    n_all = spark.read.parquet(out).count()
    n_pruned = pruned.count()
    assert 0 < n_pruned < n_all


def test_dynamic_partition_overwrite_replaces_only_touched_partitions(
    spark, sf_dir, tmp_path
):
    """Operational sink contract: with partitionOverwriteMode=dynamic,
    overwriting a batch that touches ONE source partition must leave
    every other partition's data intact (static mode would wipe the
    whole table) — the daily-repair write pattern a partitioned corpus
    store depends on."""
    from wikidatabots_spark.sources.tables import load_table

    out = str(tmp_path / "dyn")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", "source"
    )
    d.write.partitionBy("source").parquet(out)
    before = {
        r["source"]: r["n"]
        for r in spark.read.parquet(out).groupBy("source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert len(before) > 1
    target = sorted(before)[0]
    repair = d.where(F.col("source") == target).limit(3)
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        repair.write.mode("overwrite").partitionBy("source").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    after = {
        r["source"]: r["n"]
        for r in spark.read.parquet(out).groupBy("source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert after[target] == 3  # the touched partition was replaced
    for s, n in before.items():
        if s != target:
            assert after[s] == n  # every other partition untouched


def test_dynamic_partition_pruning_on_join(spark, sf_dir, tmp_path):
    """Dynamic partition pruning (the join-driven cousin of static
    partition pruning): a fact table partitioned on the join key must
    be pruned by a FILTERED dim side at runtime — the plan carries a
    dynamicpruning subquery on the partition column, and execution
    reads only the partitions the dim filter selects. This is the
    mechanism that makes star-schema joins on a partitioned 100 TB
    fact scan dim-selectivity-sized, not fact-sized."""
    fact_dir = str(tmp_path / "events_by_type")
    ev = load_table(spark, sf_dir, "events")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(fact_dir)
    dim = spark.createDataFrame(
        [("purchase", 1), ("signup", 2)], "event_type string, type_id int"
    ).where(F.col("type_id") == 1)
    fact = spark.read.parquet(fact_dir)
    joined = fact.join(dim, "event_type")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    want = ev.where(F.col("event_type") == "purchase").count()
    assert joined.count() == want
