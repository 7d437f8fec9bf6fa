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
import uuid

from pyspark.sql import Column, SparkSession

# ---------------------------------------------------------------------------
# Atomic directory publish (pointer swap)
#
# The r10 swap protocol renamed the live dir aside and the staged dir in
# (two renames). ADVICE r10: between the two renames the store does not
# exist — a concurrent reader throws and a crash strands the data at
# `path + ".old"`, which then wedges the NEXT compaction's rename with
# ENOTEMPTY. The fixed protocol keeps the table path as a SYMLINK to an
# immutable sibling version directory (`path.v-<uuid>`): publishing is
# one os.rename of a fresh symlink over the old one — atomic on POSIX,
# so readers holding the path always resolve to a complete store and a
# crash at ANY step leaves the previous version current (the staged
# version dir is unreferenced garbage, swept by the next publish).
# Writers are oblivious: reads, appends, and Spark's dynamic partition
# overwrite all resolve through the symlink. This is the local-FS
# realization of the VersionedTable manifest-pointer pattern; on an
# object store the symlink becomes the manifest pointer.
#
# Concurrency (r12, VERDICT r11 next #3 + ADVICE r11): publishers are
# SERIALIZED by an unlink-safe kernel flock (`sinks.locks`, the jsonl
# sink's lock) held across stage-rename + pointer swap + sweep, and the
# sweep RETAINS the newest `keep_versions` version dirs (default 2:
# current + immediately previous) instead of only the current one — so
# an in-flight reader, or a LAZY DataFrame whose file listing was
# resolved through the pointer before a publish (trivially easy to
# build in plan code), survives one publish instead of failing with
# FileNotFoundException when finally executed. Version dirs carry a
# monotonic sequence number so "newest" is well-defined across
# publishers and restarts. Production beyond one host: a table format /
# object-store manifest with conditional-put and time-travel retention.
# ---------------------------------------------------------------------------

_PUBLISH_LOCK_SUFFIX = ".publock"


def ensure_linked_store(path: str) -> None:
    """Create an empty store published behind a symlink pointer, so
    every later `publish_dir_swap` is a single atomic rename with no
    migration window. No-op if ``path`` already exists (symlink or
    legacy real directory)."""
    if os.path.islink(path) or os.path.exists(path):
        return
    version = _version_name(path, 0)
    os.makedirs(version)
    _point(path, version)


def resolve_store(path: str) -> str:
    """Pin a read to the CURRENT version of a pointer-published store.
    A DataFrame built over the returned real path keeps serving its
    snapshot across ONE later publish (the retained-version window of
    `publish_dir_swap`), whereas a read built through the symlink
    records pointer-relative file paths and throws FILE_NOT_EXIST as
    soon as the pointer moves (ADVICE r11 — trivially hit by plan code
    that builds a lazy ``latest_labels`` frame before a compaction
    fires). This is the read half of the manifest-pointer pattern:
    resolve the pointer once, scan the immutable-until-swept snapshot."""
    return os.path.realpath(path) if os.path.islink(path) else path


def _version_name(path: str, seq: int) -> str:
    return f"{path}.v-{seq:016d}-{uuid.uuid4().hex}"


def _version_seq(base: str, name: str) -> int:
    """Sequence number of a version dir name; pre-r12 seqless versions
    (``base.v-<uuid>``) sort oldest (-1)."""
    tail = name[len(base) + 3 :]  # after "<base>.v-"
    head = tail.split("-", 1)[0]
    return int(head) if len(head) == 16 and head.isdigit() else -1


def _point(path: str, version: str) -> None:
    """Atomically (re)target ``path`` at ``version`` (a sibling dir):
    create a fresh RELATIVE symlink under a temp name, rename it over
    the path. rename(2) replaces an existing symlink atomically."""
    tmp = path + ".ptr-" + uuid.uuid4().hex
    os.symlink(os.path.basename(version), tmp)
    os.rename(tmp, path)


def publish_dir_swap(staged: str, path: str, keep_versions: int = 2) -> None:
    """Atomically publish the ``staged`` directory as the new contents
    of ``path``. Readers see the old complete store or the new complete
    store at every instant; a crash at any step leaves the old store
    current and at worst an unreferenced version dir (swept on a later
    publish). Concurrent publishers are serialized by a kernel flock
    (`sinks.locks`) held across rename + pointer swap + sweep; the
    sweep keeps the newest ``keep_versions`` versions (current +
    previous by default) so a reader or lazy DataFrame that resolved
    the pointer before this publish survives it (ADVICE r11). A legacy
    real-directory store is migrated behind the pointer on its first
    publish (the one protocol step with a non-atomic window — avoided
    entirely by creating stores via `ensure_linked_store`)."""
    from wikidatabots_spark.sinks.locks import acquire_flock, release_flock

    lock = path + _PUBLISH_LOCK_SUFFIX
    fd = acquire_flock(lock)
    try:
        seq = _max_seq(path) + 1
        if os.path.lexists(path) and not os.path.islink(path):
            # one-time migration of a pre-pointer store: rename it aside
            # (as the previous version) so the pointer can take the
            # path. Window: `path` is absent between this rename and
            # _point (legacy stores only).
            os.rename(path, _version_name(path, seq))
            seq += 1
        version = _version_name(path, seq)
        os.rename(staged, version)
        _point(path, version)
        _sweep_versions(path, keep=max(1, keep_versions))
    finally:
        release_flock(fd, lock)


def _max_seq(path: str) -> int:
    parent = os.path.dirname(os.path.abspath(path)) or "."
    base = os.path.basename(path)
    seqs = [
        _version_seq(base, n)
        for n in os.listdir(parent)
        if n.startswith(base + ".v-")
    ]
    return max(seqs, default=-1)


def _sweep_versions(path: str, keep: int = 2) -> None:
    """Garbage-collect superseded version dirs (all but the newest
    ``keep`` by sequence — the current pointer target is always kept),
    crashed pointer temps, and pre-pointer `.old` leftovers. Safe to
    crash mid-sweep: every removed target is unreferenced by the
    current pointer and older than the retained window."""
    parent = os.path.dirname(os.path.abspath(path)) or "."
    base = os.path.basename(path)
    cur = os.readlink(path) if os.path.islink(path) else None
    versions = sorted(
        (n for n in os.listdir(parent) if n.startswith(base + ".v-")),
        key=lambda n: (_version_seq(base, n), n),
    )
    retained = set(versions[-keep:]) if keep > 0 else set()
    for name in os.listdir(parent):
        full = os.path.join(parent, name)
        if name.startswith(base + ".v-") and name != cur and name not in retained:
            shutil.rmtree(full, ignore_errors=True)
        elif name.startswith(base + ".ptr-"):
            with _suppress_oserror():
                os.remove(full)
        elif name == base + ".old":
            shutil.rmtree(full, ignore_errors=True)


def _suppress_oserror():
    import contextlib

    return contextlib.suppress(OSError)


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
    publish_dir_swap(staged, table_dir)
    shutil.rmtree(tmp, ignore_errors=True)
    return sum(1 for f in os.listdir(table_dir) if f.endswith(".parquet"))
