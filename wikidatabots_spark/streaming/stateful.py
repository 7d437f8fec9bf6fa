"""Custom stateful streaming operator via ``applyInPandasWithState``.

The north-star list names "custom stateful operators" explicitly; this
is the canonical shape: per-key mutable state carried across micro-
batches with a timeout. The example operator is a **running per-user
profile** (event count, value sum, last-seen timestamp) — the kind of
online aggregate a training-data pipeline keeps while sessionizing or
rate-limiting a 100 TB/day event stream.

Scale notes: state lives in the state store partitioned by user_id (one
shuffle on the key per micro-batch); the pandas function sees one key
group at a time as Arrow batches. ``GroupStateTimeout`` reaps idle keys
so state is bounded by *active* users, not all-time users.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts_us", LongType()),
    ]
)


# reap a user's state after this much processing-time idleness: state is
# bounded by *active* users (the docstring's claim is only true with a
# real timeout — NoTimeout would keep every all-time key forever)
IDLE_TIMEOUT_MS = 30 * 60 * 1000


def _update_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import datetime

    if state.hasTimedOut:
        # idle key reaped: drop its state, emit nothing
        state.remove()
        return
    if state.exists:
        n, s, last_us = state.get
    else:
        n, s, last_us = 0, 0.0, 0
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        if len(pdf):
            last_us = max(
                last_us, int(pd.to_datetime(pdf["ts"]).max().value // 1000)
            )
    state.update((n, s, last_us))
    state.setTimeoutDuration(IDLE_TIMEOUT_MS)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            "last_ts": [
                datetime.datetime.fromtimestamp(
                    last_us / 1e6, tz=datetime.timezone.utc
                )
            ],
        }
    )


def user_profile_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user running profile (count / sum / last-seen).

    Emits the updated profile row for every user touched by each
    micro-batch ("update" output semantics).
    """
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
