"""As-of join unit tests (operators/asof.py)."""

from __future__ import annotations

import pytest

from wikidatabots_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")], "uid long, ts long, lv string"
    )
    right = spark.createDataFrame(
        [(1, 5, 100), (1, 15, 200), (2, 50, 300)], "uid long, ts long, rv long"
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    out = {r.lv: (r.rv, r.asof_ts) for r in asof_join(left, right, on=["uid"]).collect()}
    assert out == {
        "a": (100, 5),   # latest right ts<=10 is 5
        "b": (200, 15),  # latest right ts<=20 is 15
        "c": (None, None),  # right row at 50 is after 5
    }


def test_asof_exact_ts_matches(spark):
    left = spark.createDataFrame([(1, 15, "x")], "uid long, ts long, lv string")
    right = spark.createDataFrame([(1, 15, 7)], "uid long, ts long, rv long")
    row = asof_join(left, right, on=["uid"]).collect()[0]
    assert row.rv == 7  # inclusive: right row at exactly left ts wins


def test_asof_matched_row_null_wins(spark):
    """Row-atomic carry: when the most recent right row has NULL in one
    value column, the output keeps THAT row's NULL — it must not backfill
    the value from an older right row (DuckDB/pandas ASOF semantics)."""
    left = spark.createDataFrame([(1, 30, "a")], "uid long, ts long, lv string")
    right = spark.createDataFrame(
        [(1, 10, 100, "old"), (1, 20, None, "new")],
        "uid long, ts long, rv long, tag string",
    )
    row = asof_join(left, right, on=["uid"]).collect()[0]
    assert (row.rv, row.tag, row.asof_ts) == (None, "new", 20)


def test_asof_collision_check(spark):
    left = spark.createDataFrame([(1, 1, "x")], "uid long, ts long, rv string")
    right = spark.createDataFrame([(1, 1, 2)], "uid long, ts long, rv long")
    with pytest.raises(ValueError):
        asof_join(left, right, on=["uid"])


def test_range_join_bucketed(spark):
    """Interval-bucketed range join: closed-open semantics, straddling
    intervals, multiple matching intervals, no nested-loop in the plan."""
    from pyspark.sql import functions as F

    from wikidatabots_spark.operators.rangejoin import range_join

    left = spark.createDataFrame(
        [
            (1, "2024-01-01 12:00:00", "a"),   # inside iv1
            (1, "2024-01-03 00:00:00", "b"),   # == iv1 end → excluded; inside iv2
            (1, "2024-01-05 23:59:59", "c"),   # inside iv2 (last second)
            (2, "2024-01-01 12:00:00", "d"),   # other key, no interval
        ],
        "uid long, ts string, tag string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "2024-01-03 00:00:00", 10),
            (1, "2024-01-02 12:00:00", "2024-01-06 00:00:00", 20),
        ],
        "uid long, start string, end string, iv long",
    ).withColumn("start", F.col("start").cast("timestamp")).withColumn(
        "end", F.col("end").cast("timestamp")
    )
    out = range_join(left, right, on=["uid"], bucket_width="1 day")
    got = sorted((r.tag, r.iv) for r in out.collect())
    assert got == [("a", 10), ("b", 20), ("c", 20)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
    # column collision rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        range_join(left, right.withColumnRenamed("iv", "tag"), on=["uid"])


def test_asof_special_char_value_columns(spark):
    """Right value columns with spaces/dots survive the struct carry."""
    left = spark.createDataFrame([(1, 10, "x")], "uid long, ts long, lv string")
    right = spark.createDataFrame(
        [(1, 5, 7, 8)], ["uid", "ts", "price usd", "a.b"]
    )
    row = asof_join(left, right, on=["uid"]).collect()[0]
    assert row["price usd"] == 7 and row["a.b"] == 8 and row.asof_ts == 5


def test_interval_overlap_join(spark):
    """Overlap pairs emitted exactly once even when intervals share many
    buckets; non-overlapping and touching intervals excluded."""
    from pyspark.sql import functions as F

    from wikidatabots_spark.operators.rangejoin import interval_overlap_join

    def iv(rows, schema, ts_cols):
        df = spark.createDataFrame(rows, schema)
        for c in ts_cols:
            df = df.withColumn(c, F.col(c).cast("timestamp"))
        return df

    left = iv(
        [
            (1, "2024-01-01 00:00:00", "2024-01-10 00:00:00", "L1"),  # long
            (1, "2024-01-20 00:00:00", "2024-01-21 00:00:00", "L2"),
        ],
        "uid long, start string, end string, ltag string",
        ("start", "end"),
    )
    right = iv(
        [
            (1, "2024-01-05 00:00:00", "2024-01-06 00:00:00", "R1"),  # inside L1
            (1, "2024-01-09 00:00:00", "2024-01-12 00:00:00", "R2"),  # tail overlap
            (1, "2024-01-10 00:00:00", "2024-01-11 00:00:00", "R3"),  # touches L1 only
        ],
        "uid long, r_start string, r_end string, rtag string",
        ("r_start", "r_end"),
    )
    out = interval_overlap_join(
        left, right, on=["uid"],
        left_start="start", left_end="end",
        right_start="r_start", right_end="r_end",
    )
    got = sorted((r.ltag, r.rtag) for r in out.collect())
    assert got == [("L1", "R1"), ("L1", "R2")]


def test_interval_overlap_join_defaults_usable(spark):
    # ADVICE r2 rangejoin.py:110 — defaults are now side-distinct, so a
    # frame that uses them joins without tripping the collision check
    import datetime

    from wikidatabots_spark.operators.rangejoin import interval_overlap_join

    t = datetime.datetime
    left = spark.createDataFrame(
        [("a", t(2024, 1, 1), t(2024, 1, 3))],
        "k string, l_start timestamp, l_end timestamp",
    )
    right = spark.createDataFrame(
        [("a", t(2024, 1, 2), t(2024, 1, 4)), ("a", t(2024, 1, 5), t(2024, 1, 6))],
        "k string, r_start timestamp, r_end timestamp",
    )
    rows = interval_overlap_join(left, right, on=["k"]).collect()
    assert len(rows) == 1


def test_asof_directions_and_tolerance(spark):
    from wikidatabots_spark.operators.asof import asof_join

    L = spark.createDataFrame([("k", 10), ("k", 20), ("k", 35)], "key string, ts long")
    R = spark.createDataFrame(
        [("k", 8, "a"), ("k", 19, "b"), ("k", 30, "c"), ("k", 41, "d")],
        "key string, ts long, v string",
    )
    def run(**kw):
        return [
            (r.ts, r.v, r.asof_ts)
            for r in asof_join(L, R, on=["key"], **kw).orderBy("ts").collect()
        ]
    assert run(direction="backward") == [(10, "a", 8), (20, "b", 19), (35, "c", 30)]
    assert run(direction="forward") == [(10, "b", 19), (20, "c", 30), (35, "d", 41)]
    assert run(direction="nearest") == [(10, "a", 8), (20, "b", 19), (35, "c", 30)]
    assert run(direction="nearest", tolerance_seconds=2) == [
        (10, "a", 8), (20, "b", 19), (35, None, None)]
    # inclusive at equal ts, both directions
    R2 = spark.createDataFrame([("k", 20, "x")], "key string, ts long, v string")
    eq_b = asof_join(L, R2, on=["key"], direction="backward").orderBy("ts").collect()
    eq_f = asof_join(L, R2, on=["key"], direction="forward").orderBy("ts").collect()
    assert [r.v for r in eq_b] == [None, "x", "x"]
    assert [r.v for r in eq_f] == ["x", "x", None]
