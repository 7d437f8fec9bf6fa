"""Partitioned write path: roundtrip + partition pruning assertions."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wikidatabots_spark.sinks.parquet import read_partitioned, write_partitioned
from wikidatabots_spark.sources.tables import load_table


def test_partitioned_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_by_status")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    write_partitioned(o, path, ["o_orderstatus"])

    # layout: one directory per status value
    dirs = {d for d in os.listdir(path) if d.startswith("o_orderstatus=")}
    assert dirs == {"o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"}
    # coalesced: exactly one data file per partition value
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        assert len(files) == 1

    back = read_partitioned(spark, path)
    assert back.count() == o.count()

    # a predicate on the partition column must prune directories, not
    # filter rows post-scan
    q = back.where(F.col("o_orderstatus") == "F")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
    assert q.count() == o.where(F.col("o_orderstatus") == "F").count()


def test_dynamic_partition_overwrite(spark, sf_dir, tmp_path):
    from wikidatabots_spark.sinks.parquet import overwrite_partitions

    path = str(tmp_path / "orders_dyn")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    write_partitioned(o, path, ["o_orderstatus"])
    before_f = read_partitioned(spark, path).where(F.col("o_orderstatus") == "F")
    n_f_before = before_f.count()
    n_total = read_partitioned(spark, path).count()

    # "daily batch": replace only the O partition with halved data
    new_o = (
        o.where(F.col("o_orderstatus") == "O")
        .where(F.col("o_orderkey") % 2 == 0)
    )
    n_new_o = new_o.count()
    overwrite_partitions(new_o, path, ["o_orderstatus"])

    back = read_partitioned(spark, path)
    # O replaced, F and P untouched
    assert back.where(F.col("o_orderstatus") == "O").count() == n_new_o
    assert back.where(F.col("o_orderstatus") == "F").count() == n_f_before
    assert back.count() < n_total


def test_training_shards_roundtrip_manifest_and_determinism(spark, sf_dir, tmp_path):
    """Training-shard export: deterministic assignment, one file per
    shard, order-insensitive manifest checksums, trainer-side verify."""
    from wikidatabots_spark.sinks.training_shards import (
        shard_manifest,
        verify_training_shards,
        write_training_shards,
    )

    path = str(tmp_path / "shards")
    d = load_table(spark, sf_dir, "documents")
    m1 = write_training_shards(d, path, n_shards=16)
    assert os.path.exists(os.path.join(path, "_manifest.json"))
    assert sum(s["n_rows"] for s in m1["shards"]) == d.count()
    # one data file per shard directory
    shard_dirs = [x for x in os.listdir(path) if x.startswith("shard=")]
    assert 1 <= len(shard_dirs) <= 16
    for sd in shard_dirs:
        files = [f for f in os.listdir(os.path.join(path, sd)) if f.endswith(".parquet")]
        assert len(files) == 1
    # trainer-side verification passes on the intact export
    assert verify_training_shards(spark, path)
    # determinism: a second export produces a bit-identical manifest,
    # even though row order inside shards is shuffle-dependent
    m2 = write_training_shards(d, str(tmp_path / "shards2"), n_shards=16)
    assert m1 == m2
    # the manifest matches the oracle-checked distributed aggregation
    agg = {r["shard"]: (r["n_rows"], r["checksum"])
           for r in shard_manifest(d, 16).collect()}
    assert agg == {s["shard"]: (s["n_rows"], s["checksum"]) for s in m1["shards"]}
    # tampering (dropping a shard) must fail verification
    import shutil

    shutil.rmtree(os.path.join(path, shard_dirs[0]))
    assert not verify_training_shards(spark, path)


def test_jsonl_datasource_writer_two_phase_commit(spark, sf_dir, tmp_path):
    """The Python DataSource WRITER protocol: partition tasks stage
    files + return commit messages; only the driver's commit()
    publishes (files renamed in, _MANIFEST.json written last). A job
    that fails mid-write must publish NOTHING (abort cleans staging) —
    the atomicity contract concurrent readers rely on."""
    import json
    import os

    import pytest
    from pyspark.sql import functions as F

    from wikidatabots_spark.sinks.jsonl_datasource import register_jsonl_sink
    from wikidatabots_spark.sources.corpus_io import read_jsonl_documents
    from wikidatabots_spark.sources.tables import load_table

    register_jsonl_sink(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    out = str(tmp_path / "jsonl_out")
    docs.repartition(4).write.format("jsonl_commit").mode("append").option(
        "path", out
    ).save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["n_rows"] == docs.count()
    assert manifest["n_files"] >= 1
    assert not [x for x in os.listdir(out) if x.startswith("_staging")]
    from pyspark.sql.types import StructType

    back = read_jsonl_documents(
        spark,
        out,
        schema=StructType.fromDDL(
            "doc_id long, text string, lang string, source string"
        ),
    )
    assert sorted(map(tuple, back.select(docs.columns).collect())) == sorted(
        map(tuple, docs.collect())
    )

    # failure path: a poisoned row makes one task throw mid-write; the
    # target must stay unpublished (no manifest, no part files)
    out2 = str(tmp_path / "jsonl_fail")

    @F.udf("string")
    def poison(s):
        raise ValueError("boom")

    bad = docs.limit(10).withColumn("text", poison("text"))
    with pytest.raises(Exception):
        bad.write.format("jsonl_commit").mode("append").option("path", out2).save()
    assert not os.path.exists(os.path.join(out2, "_MANIFEST.json"))
    assert [
        f for f in os.listdir(out2) if f.endswith(".jsonl")
    ] == [] if os.path.isdir(out2) else True


def test_jsonl_datasource_overwrite_and_append_manifest(spark, tmp_path):
    """Save-mode semantics (ADVICE r5): mode('overwrite') must remove
    pre-existing part files (glob readers see ONLY the new rows), and a
    second mode('append') must merge the prior manifest's file map so
    the manifest always describes the full directory contents."""
    import json
    import os

    from wikidatabots_spark.sinks.jsonl_datasource import register_jsonl_sink

    register_jsonl_sink(spark)
    out = str(tmp_path / "jsonl_modes")

    def write(lo, hi, mode):
        spark.range(lo, hi).selectExpr("id", "concat('d', id) AS name") \
            .write.format("jsonl_commit").mode(mode).option("path", out).save()

    def dir_rows():
        return sum(
            sum(1 for _ in open(os.path.join(out, f)))
            for f in os.listdir(out)
            if f.startswith("part-") and f.endswith(".jsonl")
        )

    def manifest():
        return json.load(open(os.path.join(out, "_MANIFEST.json")))

    write(0, 10, "append")
    assert manifest()["n_rows"] == 10 and dir_rows() == 10
    # append merges: manifest and directory both grow to 10 + 5
    write(100, 105, "append")
    m = manifest()
    assert m["n_rows"] == 15 and m["n_files"] == len(m["files"])
    assert dir_rows() == 15
    # overwrite replaces: stale parts removed, manifest matches dir
    write(200, 203, "overwrite")
    m = manifest()
    assert m["n_rows"] == 3 and dir_rows() == 3
    assert set(m["files"]) == {
        f for f in os.listdir(out) if f.startswith("part-")
    }


def _staged_writer(tmp_path, overwrite, rows_per_part=(3, 2)):
    """Build a JsonlWriter with staged part files + commit messages, so
    commit() can be driven directly (it runs driver-side in production;
    unit-driving it lets the crash window be simulated)."""
    import json as _json
    import os

    from pyspark.sql.types import LongType, StructField, StructType

    from wikidatabots_spark.sinks.jsonl_datasource import (
        JsonlCommitMessage,
        JsonlWriter,
    )

    out = str(tmp_path)
    w = JsonlWriter(
        StructType([StructField("id", LongType())]), {"path": out}, overwrite
    )
    os.makedirs(w.staging, exist_ok=True)
    msgs = []
    for i, n in enumerate(rows_per_part):
        name = f"part-new{i}.jsonl"
        with open(os.path.join(w.staging, name), "w") as f:
            for r in range(n):
                f.write(_json.dumps({"id": r}) + "\n")
        msgs.append(JsonlCommitMessage(filename=name, n_rows=n))
    return w, msgs


def test_jsonl_commit_crash_at_manifest_swap_preserves_old_state(
    tmp_path, monkeypatch
):
    """The property the r7 reorder claimed but never tested (VERDICT r7
    #6): a crash AT the manifest swap must leave the OLD manifest and
    every file it lists intact — stale parts are deleted only after the
    swap. On the pre-r7 ordering (delete-then-swap) this fails: the old
    manifest survives but its part files are already gone."""
    import json
    import os

    d = tmp_path / "tbl"
    d.mkdir()
    # committed old state: one part + manifest listing it
    (d / "part-old.jsonl").write_text('{"id": 99}\n')
    (d / "_MANIFEST.json").write_text(
        json.dumps({"n_rows": 1, "n_files": 1, "files": {"part-old.jsonl": 1}})
    )
    w, msgs = _staged_writer(d, overwrite=True)

    real_replace = os.replace

    def crashing_replace(src, dst):
        if dst.endswith("_MANIFEST.json"):
            raise OSError("simulated crash at commit point")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", crashing_replace)
    with pytest.raises(OSError, match="simulated crash"):
        w.commit(msgs)
    monkeypatch.undo()
    # old committed state fully intact: manifest unchanged, its file alive
    m = json.load(open(d / "_MANIFEST.json"))
    assert m["files"] == {"part-old.jsonl": 1}
    assert (d / "part-old.jsonl").exists()


def test_jsonl_commit_sweeps_orphans_and_tolerates_racing_cleanup(
    tmp_path, monkeypatch
):
    """ADVICE r7 lows: (1) parts not listed in the manifest (debris from
    a crash after a previous swap) are swept at the next commit in BOTH
    modes, so glob readers stop double-counting; (2) post-swap stale
    deletion is best-effort — a file removed by a racing cleaner must
    not fail a durably committed write."""
    import json
    import os

    d = tmp_path / "tbl"
    d.mkdir()
    (d / "part-old.jsonl").write_text('{"id": 99}\n')
    (d / "part-orphan.jsonl").write_text('{"id": 1}\n{"id": 2}\n')
    (d / "_MANIFEST.json").write_text(
        json.dumps({"n_rows": 1, "n_files": 1, "files": {"part-old.jsonl": 1}})
    )
    w, msgs = _staged_writer(d, overwrite=False)
    w.commit(msgs)
    m = json.load(open(d / "_MANIFEST.json"))
    assert not (d / "part-orphan.jsonl").exists()  # swept
    assert set(m["files"]) == {"part-old.jsonl", "part-new0.jsonl", "part-new1.jsonl"}
    assert m["n_rows"] == 1 + 3 + 2
    # directory and manifest agree exactly (orphan gone, no extras)
    on_disk = {f for f in os.listdir(d) if f.startswith("part-")}
    assert on_disk == set(m["files"])

    # overwrite where a stale part vanishes mid-delete: commit succeeds
    w2, msgs2 = _staged_writer(d, overwrite=True, rows_per_part=(1,))
    real_remove = os.remove

    def racing_remove(p):
        real_remove(p)
        if p.endswith("part-old.jsonl"):
            raise FileNotFoundError(p)  # racer got there first

    monkeypatch.setattr(os, "remove", racing_remove)
    w2.commit(msgs2)  # must NOT raise
    monkeypatch.undo()
    m2 = json.load(open(d / "_MANIFEST.json"))
    assert set(m2["files"]) == {"part-new0.jsonl"}


def test_jsonl_concurrent_commit_does_not_sweep_in_flight_parts(tmp_path):
    """Two-writer race (VERDICT r9 #4): writer A has renamed its parts
    into the table but not yet swapped its manifest; writer B commits
    concurrently. Without publisher mutual exclusion B's orphan sweep
    deletes A's glob-visible-but-unlisted parts — committed data lost
    the instant A's manifest lands. With the commit lock, B blocks
    until A publishes, then merges A's manifest instead of sweeping
    A's files."""
    import json
    import os
    import threading
    import time

    d = tmp_path / "tbl"
    d.mkdir()
    # writer A, mid-commit: part renamed into the table, flock held,
    # manifest swap still pending
    (d / "part-inflight-a.jsonl").write_text('{"id": 7}\n')
    import fcntl

    lock = d / "_COMMIT.lock"
    fd_a = os.open(lock, os.O_CREAT | os.O_RDWR)
    fcntl.flock(fd_a, fcntl.LOCK_EX)

    w, msgs = _staged_writer(d, overwrite=False)
    done = threading.Event()

    def run_b():
        w.commit(msgs)
        done.set()

    t = threading.Thread(target=run_b, daemon=True)
    t.start()
    time.sleep(0.4)
    # B is parked on the lock; A's in-flight part is untouched
    assert not done.is_set()
    assert (d / "part-inflight-a.jsonl").exists()

    # A publishes and releases (unlink-before-close, the holder's
    # release protocol: waiters re-contend on a fresh inode)
    (d / "_MANIFEST.json").write_text(
        json.dumps(
            {"n_rows": 1, "n_files": 1, "files": {"part-inflight-a.jsonl": 1}}
        )
    )
    os.unlink(lock)
    os.close(fd_a)
    t.join(timeout=60)
    assert done.is_set()

    # no committed part was deleted; B's append merged A's manifest
    assert (d / "part-inflight-a.jsonl").exists()
    m = json.load(open(d / "_MANIFEST.json"))
    assert "part-inflight-a.jsonl" in m["files"]
    assert {msg.filename for msg in msgs} <= set(m["files"])
    assert m["n_rows"] == 1 + sum(msg.n_rows for msg in msgs)
    assert not lock.exists()  # B released on the way out


def test_jsonl_first_commit_sweeps_orphans(tmp_path):
    """A manifest-less directory has no committed parts, so debris from
    an aborted first write is swept on the FIRST commit too (ADVICE r9:
    the old sweep only ran when a prior manifest existed)."""
    import json

    d = tmp_path / "tbl"
    d.mkdir()
    (d / "part-debris.jsonl").write_text('{"id": 1}\n')

    w, msgs = _staged_writer(d, overwrite=False)
    w.commit(msgs)

    assert not (d / "part-debris.jsonl").exists()
    m = json.load(open(d / "_MANIFEST.json"))
    assert set(m["files"]) == {msg.filename for msg in msgs}


def test_jsonl_crashed_committer_lock_does_not_wedge(tmp_path):
    """A lock FILE abandoned by a crashed committer does not wedge the
    table: the kernel dropped the crashed process's flock with the
    process, so the leftover file holds no lock at all and the next
    commit acquires immediately — no staleness heuristic, hence no
    stat→remove TOCTOU where a breaker could delete a FRESH lock and
    admit two concurrent committers (ADVICE r10 medium)."""
    import json
    import os
    import time

    d = tmp_path / "tbl"
    d.mkdir()
    lock = d / "_COMMIT.lock"
    lock.write_text("crashed-writer")  # file exists, flock NOT held
    old = time.time() - 3600
    os.utime(lock, (old, old))

    w, msgs = _staged_writer(d, overwrite=False)
    start = time.monotonic()
    w.commit(msgs)
    assert time.monotonic() - start < 30  # no stale-wait
    m = json.load(open(d / "_MANIFEST.json"))
    assert set(m["files"]) == {msg.filename for msg in msgs}
    assert not lock.exists()


def test_jsonl_lock_unlink_race_never_two_holders(tmp_path):
    """The unlink-safe flock pattern: a waiter that flocked an inode
    the releasing holder already unlinked must detect the dead inode
    and re-contend on the fresh file, never treat the dead flock as
    the table lock. Driven directly against _acquire_commit_lock with
    a holder thread that releases (unlink-before-close) mid-wait."""
    import os
    import threading

    from wikidatabots_spark.sinks.jsonl_datasource import (
        _acquire_commit_lock,
        _release_commit_lock,
    )

    d = str(tmp_path / "tbl")
    os.makedirs(d)
    fd1, lock1 = _acquire_commit_lock(d)

    got = {}

    def waiter():
        got["fdlock"] = _acquire_commit_lock(d)

    t = threading.Thread(target=waiter, daemon=True)
    t.start()
    _release_commit_lock(fd1, lock1)
    t.join(timeout=60)
    assert "fdlock" in got
    fd2, lock2 = got["fdlock"]
    # the acquired lock is on the LIVE inode at the path
    assert os.fstat(fd2).st_ino == os.stat(lock2).st_ino
    _release_commit_lock(fd2, lock2)
    assert not os.path.exists(lock2)


def test_jsonl_per_job_staging_dirs_compose(tmp_path):
    """Concurrent publishers stage independently (ADVICE r10 low): with
    the old SHARED _staging dir, job A's commit rmtree'd job B's
    still-staged parts and B's os.replace raised FileNotFoundError.
    Staging dirs are now per-job (uuid chosen in __init__), so A's
    commit leaves B's staged parts intact and both commits compose."""
    import json
    import os

    d = tmp_path / "tbl"
    d.mkdir()
    wa, msgs_a = _staged_writer(d, overwrite=False)
    wb, msgs_b = _staged_writer(d, overwrite=False)
    assert wa.staging != wb.staging
    # B renames one part name out of A's namespace so the two jobs'
    # part files do not collide in the table dir
    bname = "part-jobB.jsonl"
    os.rename(
        os.path.join(wb.staging, msgs_b[0].filename),
        os.path.join(wb.staging, bname),
    )
    msgs_b[0].filename = bname
    msgs_b = msgs_b[:1]

    wa.commit(msgs_a)
    # A's commit must not have touched B's staging
    assert os.path.exists(os.path.join(wb.staging, bname))
    wb.commit(msgs_b)
    m = json.load(open(d / "_MANIFEST.json"))
    assert {msg.filename for msg in msgs_a} <= set(m["files"])
    assert bname in m["files"]
    assert m["n_rows"] == sum(msg.n_rows for msg in msgs_a) + msgs_b[0].n_rows
    # no staging debris
    assert not [x for x in os.listdir(d) if x.startswith("_staging")]
