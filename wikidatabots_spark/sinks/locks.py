"""Unlink-safe kernel flock helpers, shared by every single-host
publisher in the package (the jsonl sink's commit lock, the version-
store publish lock in ``sinks.compaction``).

Why flock and not a staleness heuristic: a stat-age "break stale lock"
protocol has a TOCTOU hole (between stat and remove, a racer can break
the lock AND a new holder can acquire a fresh one, which the slow
breaker then removes — two concurrent holders), and a live holder on a
slow filesystem can be "broken" while alive. Kernel flock has neither
failure mode: a crashed holder's lock is released by the kernel (no
staleness guess) and acquisition is one atomic kernel operation.

Unlink-safety: a releasing holder unlinks the lock file BEFORE closing
(closing drops the flock). A waiter that flocked the now-unlinked inode
holds a lock nobody else contends on — so after acquiring, it
revalidates that the fd's inode is still the inode AT THE PATH and
retries otherwise. Never two holders.

Scope: advisory flock serializes holders on ONE host — exactly the
local[*] deployment these sinks target. A multi-host production
deployment publishes via an object store's conditional-put manifest
pointer (the VersionedTable pattern) instead of a filesystem lock.
"""

from __future__ import annotations

import contextlib
import os
import time


def acquire_flock(
    lock_path: str, timeout_s: float = 300.0, poll_s: float = 0.02
) -> int:
    """Exclusive, unlink-safe advisory lock on ``lock_path``; returns an
    fd to pass to :func:`release_flock`. Raises ``TimeoutError`` if the
    lock cannot be acquired within ``timeout_s``."""
    import fcntl

    deadline = time.monotonic() + timeout_s
    while True:
        fd = os.open(lock_path, os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except BlockingIOError:
            os.close(fd)
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"could not acquire {lock_path} within {timeout_s}s"
                )
            time.sleep(poll_s)
            continue
        try:
            same = os.fstat(fd).st_ino == os.stat(lock_path).st_ino
        except OSError:
            same = False  # unlinked while we raced; retry on the fresh file
        if same:
            return fd
        os.close(fd)


def release_flock(fd: int, lock_path: str) -> None:
    """Unlink BEFORE closing (which drops the flock): waiters blocked on
    the old inode detect the unlink via the inode revalidation in
    :func:`acquire_flock` and re-contend on the fresh file."""
    with contextlib.suppress(OSError):
        os.unlink(lock_path)
    os.close(fd)
