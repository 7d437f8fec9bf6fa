"""As-of join: enrich each left row with the most recent right row at or
before its timestamp, per key.

Spark has no ASOF JOIN operator (DuckDB/Pandas do). The naive range-join
(``l.ts >= r.ts`` + window max) explodes quadratically per key. This is
the scalable composition:

    union(left-marked, right-marked)
      → window over key ordered by (ts, marker)
      → last(value, ignorenulls) carry-forward
      → keep left rows

One shuffle on the key, one per-key sort — O(n log n) regardless of how
many right rows precede each left row, versus the O(n·m) pair blowup of
the range-join formulation. Skewed keys split by AQE. This is the
standard streaming-friendly shape (the same carry-forward a stateful
stream operator would keep).

North-star extension — no reference counterpart (SURVEY.md §2.4 notes
the reference has no as-of/range joins).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join, pandas ``merge_asof``-complete (inclusive at equal ts).

    ``direction``: ``backward`` (most recent right row at or before
    left_ts — DuckDB ASOF semantics), ``forward`` (earliest right row at
    or after), or ``nearest`` (whichever side is closer in time; exact
    ties resolve backward). ``tolerance_seconds`` nulls the match when
    ``|left_ts - asof_ts|`` exceeds it (timestamps compare as epoch
    seconds; numeric ts columns compare numerically).

    Right value columns (everything except ``on`` + ``right_ts``) are
    appended to every left row, null when no right row matches.
    ``right_ts`` itself is carried as ``asof_ts``. Duplicate right rows
    per (key, ts) must be resolved upstream (dedupe first) — the carry
    keeps the last one in (ts, input) order otherwise.

    All three directions keep the same scale shape: one shuffle on the
    key, one per-key sort, two window passes at most — never a per-key
    pair blowup.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction!r}")
    def qcol(c: str):
        # backtick-quoted reference: a bare F.col("a.b") parses as a
        # nested-field path, not the column literally named "a.b"
        return F.col(f"`{c.replace(chr(96), chr(96) * 2)}`")

    on = list(on)
    val_cols = [c for c in right.columns if c not in (*on, right_ts)]
    l_marked = left.withColumn("__t", F.col(left_ts)).withColumn(
        "__is_left", F.lit(1)
    )
    for c in val_cols:
        if c in l_marked.columns:
            raise ValueError(f"right value column {c!r} collides with left")
    # The whole right row travels as ONE struct and is carried forward by a
    # single last(ignorenulls=True). Per-column carries would mix values
    # from different right rows whenever the most recent right row holds a
    # NULL in one value column (the matched row's NULL must win, as in
    # DuckDB/pandas ASOF) — row atomicity requires the struct.
    rd = dict(right.dtypes)
    # backtick-escape field names in the DDL: value columns with spaces,
    # dots, or punctuation must round-trip through the struct
    rv_type = (
        "struct<"
        + ",".join(f"`{c.replace(chr(96), chr(96) * 2)}`:{rd[c]}" for c in val_cols)
        + ("," if val_cols else "")
        + f"asof_ts:{rd[right_ts]}>"
    )
    r_marked = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(
            *[qcol(c).alias(c) for c in val_cols], F.col(right_ts).alias("asof_ts")
        ).alias("__rv"),
    )
    l_full = l_marked.select(
        *l_marked.columns, F.lit(None).cast(rv_type).alias("__rv")
    )
    r_full = r_marked.select(
        *[
            F.lit(None).cast(dict(l_marked.dtypes)[c]).alias(c)
            if c not in (*on, "__t", "__is_left")
            else qcol(c)
            for c in l_marked.columns
        ],
        F.col("__rv"),
    )
    u = l_full.unionByName(r_full)
    # backward: right rows (marker 0) sort before a left row at the same
    # ts → inclusive semantics, matching DuckDB ASOF (l.ts >= r.ts).
    # forward mirrors it: left rows sort first so a right row at the
    # same ts is inside the following frame. Both windows share the
    # partitioning, so `nearest` still costs ONE exchange (two sorts).
    w_bw = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fw = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t"), F.col("__is_left").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carries = {}
    if direction in ("backward", "nearest"):
        carries["__rv_bw"] = F.last(F.col("__rv"), ignorenulls=True).over(w_bw)
    if direction in ("forward", "nearest"):
        carries["__rv_fw"] = F.first(F.col("__rv"), ignorenulls=True).over(w_fw)
    carried = u.select(
        *[qcol(c).alias(c) for c in left.columns],
        F.col("__is_left"),
        F.col("__t"),
        *[c.alias(n) for n, c in carries.items()],
    )
    lt = F.col("__t").cast("double")
    if direction == "backward":
        rv = F.col("__rv_bw")
    elif direction == "forward":
        rv = F.col("__rv_fw")
    else:
        bw, fw = F.col("__rv_bw"), F.col("__rv_fw")
        d_bw = lt - bw.getField("asof_ts").cast("double")
        d_fw = fw.getField("asof_ts").cast("double") - lt
        rv = (
            F.when(bw.isNull(), fw)
            .when(fw.isNull(), bw)
            # strict <: an exact tie (d_fw == d_bw) resolves backward
            .when(d_fw < d_bw, fw)
            .otherwise(bw)
        )
    if tolerance_seconds is not None:
        dist = F.abs(lt - rv.getField("asof_ts").cast("double"))
        rv = F.when(dist <= F.lit(float(tolerance_seconds)), rv)
    return (
        carried.where(F.col("__is_left") == 1)
        .select(
            *[qcol(c).alias(c) for c in left.columns],
            # getField, not "__rv.<name>" paths: a value column named
            # "a.b" would otherwise resolve as a nested field reference
            *[rv.getField(c).alias(c) for c in val_cols],
            rv.getField("asof_ts").alias("asof_ts"),
        )
    )
