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
