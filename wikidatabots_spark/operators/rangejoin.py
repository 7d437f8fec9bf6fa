"""Range join: match left rows whose timestamp falls inside right-side
intervals, per key — without the nested-loop plan Spark picks for
inequality join conditions.

Spark turns ``l.ts >= r.start AND l.ts < r.end`` into a
BroadcastNestedLoopJoin (or cartesian) — O(n·m) per key and a
scale-killer. The standard fix, implemented here, is **interval
bucketing**: pick a bucket width W; each left row hashes to the single
bucket containing its timestamp, each right interval is exploded to the
buckets it overlaps (ceil(span/W) + 1 rows), and the join becomes a pure
equi-join on (key, bucket) followed by the exact interval filter. Every
(left, right) match co-occurs in exactly one bucket — the one holding
``l.ts`` — so no dedup step is needed.

Cost model: shuffle on (key, bucket); right-side replication factor is
``interval_span / W + 1``. Pick W near the typical interval length so
replication stays O(1) while buckets stay selective. Skewed hot buckets
split under AQE like any equi-join.

North-star extension — no reference counterpart (SURVEY.md §2.4 notes
the reference has no as-of/range joins); complements ``operators.asof``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_UNIT_US = {
    "second": 1_000_000,
    "seconds": 1_000_000,
    "minute": 60_000_000,
    "minutes": 60_000_000,
    "hour": 3_600_000_000,
    "hours": 3_600_000_000,
    "day": 86_400_000_000,
    "days": 86_400_000_000,
    "week": 7 * 86_400_000_000,
    "weeks": 7 * 86_400_000_000,
}


def _interval_micros(spec: str) -> int:
    """'2 days', '12 hours', '90 minutes' → microseconds (fixed-width
    units only — a bucket width must not vary with the calendar)."""
    total = 0
    parts = spec.strip().lower().split()
    if len(parts) % 2:
        raise ValueError(f"bucket_width {spec!r}: expected 'N unit' pairs")
    for n, unit in zip(parts[::2], parts[1::2]):
        if unit not in _UNIT_US:
            raise ValueError(
                f"bucket_width unit {unit!r} not fixed-width; use "
                f"{sorted(set(_UNIT_US))}"
            )
        total += int(n) * _UNIT_US[unit]
    if total <= 0:
        raise ValueError(f"bucket_width {spec!r} must be positive")
    return total


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_start: str = "start",
    right_end: str = "end",
    bucket_width: str = "1 day",
) -> DataFrame:
    """Inner join of left rows to right intervals: ``start <= ts < end``.

    Returns left columns + right columns (key columns once). Interval
    semantics are closed-open ``[start, end)`` — an event at exactly
    ``end`` does not match, so back-to-back intervals never double-match.
    ``bucket_width`` is any Spark interval string.
    """
    on = list(on)
    overlap = set(left.columns) & (set(right.columns) - set(on))
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    # width parsed driver-side: deriving it from an epoch-literal timestamp
    # cast would silently shift by the SESSION TIMEZONE offset (zero or
    # negative widths east of UTC) — bucket arithmetic must be tz-free
    width_us = F.lit(_interval_micros(bucket_width))
    l_bucket = F.floor(F.unix_micros(F.col(left_ts)) / width_us)
    lb = left.withColumn("__bucket", l_bucket)
    r_first = F.floor(F.unix_micros(F.col(right_start)) / width_us)
    r_last = F.floor(F.unix_micros(F.col(right_end)) / width_us)
    # empty/inverted intervals match nothing — and must be dropped BEFORE
    # sequence(), which would otherwise count DOWN (sequence(5,3)=[5,4,3])
    # and file the interval under wrong buckets
    rb = right.where(F.col(right_end) > F.col(right_start)).withColumn(
        "__bucket", F.explode(F.sequence(r_first, r_last))
    )
    out_cols = [*left.columns, *[c for c in right.columns if c not in on]]
    return (
        lb.join(rb, on=[*on, "__bucket"])
        .where(
            (F.col(left_ts) >= F.col(right_start))
            & (F.col(left_ts) < F.col(right_end))
        )
        .select(*out_cols)
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_start: str = "l_start",
    left_end: str = "l_end",
    right_start: str = "r_start",
    right_end: str = "r_end",
    bucket_width: str = "1 day",
) -> DataFrame:
    """Inner join of interval pairs that overlap: ``l.start < r.end AND
    r.start < l.end`` (closed-open intervals), per key — again without the
    nested-loop plan.

    Defaults use side-distinct names (``l_start``/``r_start``): both
    sides' interval columns appear in the output, so same-named defaults
    would always trip the collision check (ADVICE r2 rangejoin.py:110) —
    rename with ``withColumnRenamed`` or pass explicit names.

    Both sides explode to their covered buckets and equi-join on
    (key, bucket); the exact overlap predicate then filters. Duplicate
    emission (a pair can share MANY buckets) is avoided without any
    dedup shuffle by the canonical-bucket trick: emit a pair only from
    the bucket containing ``max(l.start, r.start)`` — for an overlapping
    pair that instant lies inside both intervals, so exactly one joined
    bucket row satisfies it.
    """
    on = list(on)
    overlap = set(left.columns) & (set(right.columns) - set(on))
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    width_us = F.lit(_interval_micros(bucket_width))

    def exploded(df: DataFrame, start: str, end: str) -> DataFrame:
        first = F.floor(F.unix_micros(F.col(start)) / width_us)
        last = F.floor(F.unix_micros(F.col(end)) / width_us)
        return df.where(F.col(end) > F.col(start)).withColumn(
            "__bucket", F.explode(F.sequence(first, last))
        )

    lb = exploded(left, left_start, left_end)
    rb = exploded(right, right_start, right_end)
    latest_start = F.greatest(F.col(left_start), F.col(right_start))
    out_cols = [*left.columns, *[c for c in right.columns if c not in on]]
    return (
        lb.join(rb, on=[*on, "__bucket"])
        .where(
            (F.col(left_start) < F.col(right_end))
            & (F.col(right_start) < F.col(left_end))
            # canonical bucket: exactly one per overlapping pair
            & (F.col("__bucket") == F.floor(F.unix_micros(latest_start) / width_us))
        )
        .select(*out_cols)
    )
