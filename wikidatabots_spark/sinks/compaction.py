"""Small-file compaction: rewrite a parquet directory into size-targeted
files.

Long-running ingest (streaming sinks, per-batch upserts, many small
deliveries) accretes thousands of tiny parquet files; every subsequent
scan then pays a task per file plus footer/open overhead — the classic
operational tax at corpus scale (the same reason table formats ship
OPTIMIZE). This utility rewrites a directory to ceil(total_bytes /
target_bytes) files with an atomic directory swap (same publish
protocol as ``sinks.upsert``).

Ordering: pass ``order_by`` to lay rows out clustered (e.g. a z-order
key from ``functions.scale.zorder_key``) — compaction is the natural
moment to fix layout, since the data is being rewritten anyway. With
``order_by`` the rewrite is a repartitionByRange (one shuffle, and the
writer's per-file min/max column stats become selective); without it a
coalesce(n) — no shuffle at all, pure file-count reduction.

Scale: the operation is embarrassingly parallel and in production runs
per PARTITION of a partitioned table (compact only partitions whose
small-file count crossed a threshold), not over the whole corpus.
"""

from __future__ import annotations

import math
import os
import shutil
import tempfile

from pyspark.sql import Column, SparkSession


def compact_parquet_dir(
    spark: SparkSession,
    table_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
    order_by: list[Column] | None = None,
) -> int:
    """Rewrite ``table_dir`` into ~``target_bytes`` files; returns the
    output file count. Atomic swap: readers see old or new, never both.
    """
    total = sum(
        os.path.getsize(os.path.join(table_dir, f))
        for f in os.listdir(table_dir)
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(table_dir)
    if order_by:
        df = df.repartitionByRange(n_files, *order_by).sortWithinPartitions(
            *order_by
        )
    else:
        df = df.coalesce(n_files)
    tmp = tempfile.mkdtemp(
        prefix="compact_", dir=os.path.dirname(os.path.abspath(table_dir))
    )
    staged = os.path.join(tmp, "staged")
    df.write.mode("overwrite").parquet(staged)
    old = table_dir + ".old"
    os.rename(table_dir, old)
    os.rename(staged, table_dir)
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    return sum(1 for f in os.listdir(table_dir) if f.endswith(".parquet"))
