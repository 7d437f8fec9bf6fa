"""Tests for sinks.versioned (snapshot log, time travel, rollback,
vacuum)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from wikidatabots_spark.sinks.versioned import VersionedTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_commit_read_and_time_travel(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    assert t.latest_version() is None
    v1 = t.commit(spark.createDataFrame([Row(k=1, v="a")]))
    v2 = t.commit(spark.createDataFrame([Row(k=1, v="b"), Row(k=2, v="c")]))
    assert (v1, v2) == (1, 2)
    assert _rows(t.read(spark)) == [(1, "b"), (2, "c")]
    assert _rows(t.read(spark, version=1)) == [(1, "a")]  # time travel
    hist = t.history()
    assert [(s.version, s.n_rows, s.parent) for s in hist] == [
        (1, 1, None), (2, 2, 1),
    ]


def test_upsert_creates_version_and_keeps_history(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([Row(k=1, ver=1, v="a"), Row(k=2, ver=1, v="b")]))
    changes = spark.createDataFrame(
        [Row(k=2, ver=2, v="b2", _deleted=False),
         Row(k=1, ver=2, v="x", _deleted=True),
         Row(k=3, ver=2, v="new", _deleted=False)]
    )
    v = t.upsert(spark, changes, key="k", version_col="ver")
    assert v == 2
    assert _rows(t.read(spark).select("k", "v")) == [(2, "b2"), (3, "new")]
    # pre-merge table still readable
    assert _rows(t.read(spark, version=1).select("k", "v")) == [(1, "a"), (2, "b")]


def test_upsert_bootstraps_empty_table(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    v = t.upsert(
        spark,
        spark.createDataFrame([Row(k=1, ver=1, v="a")]),
        key="k",
        version_col="ver",
    )
    assert v == 1
    assert _rows(t.read(spark)) == [(1, 1, "a")]


def test_rollback_restores_as_new_head(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([Row(k=1, v="good")]))
    t.commit(spark.createDataFrame([Row(k=1, v="poisoned")]))
    v3 = t.rollback(spark, to_version=1)
    assert v3 == 3
    assert _rows(t.read(spark)) == [(1, "good")]
    # the bad version remains in history for the post-mortem
    assert _rows(t.read(spark, version=2)) == [(1, "poisoned")]
    assert t.history()[-1].parent == 1 and t.history()[-1].tag == "rollback_to_v1"


def test_vacuum_prunes_data_keeps_metadata(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    for i in range(1, 5):
        t.commit(spark.createDataFrame([Row(k=1, v=f"v{i}")]))
    pruned = t.vacuum(keep_last=2)
    assert pruned == [1, 2]
    assert not os.path.isdir(t._snapshot_dir(1))
    assert _rows(t.read(spark, version=3)) == [(1, "v3")]
    assert _rows(t.read(spark)) == [(1, "v4")]
    with pytest.raises(KeyError, match="vacuumed"):
        t.read(spark, version=1)
    with pytest.raises(KeyError, match="never existed"):
        t.read(spark, version=99)
    # metadata survives
    assert [(s.version, s.pruned) for s in t.history()] == [
        (1, True), (2, True), (3, False), (4, False),
    ]
    # vacuum is idempotent and respects the window
    assert t.vacuum(keep_last=2) == []


def test_crash_mid_commit_leaves_previous_version_current(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    t.commit(spark.createDataFrame([Row(k=1, v="a")]))
    # simulate a crashed commit: staged dir exists, no log entry
    staged = os.path.join(t.dir, "_versions", "_staged_crashed")
    os.makedirs(os.path.join(staged, "data"))
    assert t.latest_version() == 1
    assert _rows(t.read(spark)) == [(1, "a")]
    v2 = t.commit(spark.createDataFrame([Row(k=1, v="b")]))
    assert v2 == 2
    t.vacuum(keep_last=2)
    assert not os.path.isdir(staged)  # vacuum swept the garbage


def test_diff_is_a_valid_change_data_feed(spark, tmp_path):
    """diff(v1, v2) emits exactly the insert/delete/update rows, and
    APPLYING the feed to v1 reproduces v2 — the property that makes it
    a replication stream, not just a report. diff(v, v) is empty."""
    t = VersionedTable(str(tmp_path / "tbl"))
    t.commit(
        spark.createDataFrame(
            [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
        )
    )
    t.commit(
        spark.createDataFrame(
            [Row(k=1, v="a"), Row(k=2, v="B"), Row(k=4, v="d")]
        )
    )
    feed = {
        r.k: (r._change, r.v)
        for r in t.diff(spark, 1, 2, key="k").collect()
    }
    assert feed == {
        2: ("update", "B"),
        3: ("delete", "c"),
        4: ("insert", "d"),
    }
    assert t.diff(spark, 2, 2, key="k").count() == 0
    # replay: v1 minus deletes/update-keys plus feed upserts == v2
    import pyspark.sql.functions as F

    v1 = t.read(spark, 1)
    changes = t.diff(spark, 1, 2, key="k")
    keep = v1.join(changes.select("k"), "k", "left_anti")
    applied = keep.unionByName(
        changes.where(F.col("_change") != "delete").select("k", "v")
    )
    assert _rows(applied) == _rows(t.read(spark, 2))


def test_diff_handles_map_valued_columns(spark, tmp_path):
    """Regression (VERDICT r7 #3 / ADVICE r6 low): eqNullSafe cannot
    evaluate over MapType, so the struct-comparison diff failed at
    ANALYSIS time on any map value column. Top-level maps now compare
    via their sorted entry array — equal maps with different insertion
    order are NOT an update — while the emitted value stays a real map."""
    t = VersionedTable(str(tmp_path / "tbl"))
    t.commit(
        spark.createDataFrame(
            [(1, {"a": 1, "b": 2}), (2, {"x": 9}), (3, {"z": 0})],
            "k long, m map<string,int>",
        )
    )
    t.commit(
        spark.createDataFrame(
            # k=1: same entries, reversed literal order -> unchanged;
            # k=2: value changed -> update; k=3 deleted; k=4 inserted
            [(1, {"b": 2, "a": 1}), (2, {"x": 10}), (4, {"n": 7})],
            "k long, m map<string,int>",
        )
    )
    feed = t.diff(spark, 1, 2, key="k")
    got = {(r.k, r._change, tuple(sorted(r.m.items()))) for r in feed.collect()}
    assert got == {
        (2, "update", (("x", 10),)),
        (3, "delete", (("z", 0),)),
        (4, "insert", (("n", 7),)),
    }


def test_diff_rejects_nested_map_with_clear_error(spark, tmp_path):
    """A map nested inside an array can't be canonicalized one level
    down; the contract is a clear ValueError, not an opaque Catalyst
    analysis failure."""
    t = VersionedTable(str(tmp_path / "tbl"))
    df = spark.createDataFrame(
        [(1, [{"a": 1}])], "k long, am array<map<string,int>>"
    )
    t.commit(df)
    t.commit(df)
    with pytest.raises(ValueError, match="map nested inside"):
        t.diff(spark, 1, 2, key="k")
