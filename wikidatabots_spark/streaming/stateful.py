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
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
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


QUOTA_OUTPUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("doc_id", LongType()),
    ]
)


class SourceQuotaProcessor(StatefulProcessor):
    """``transformWithState`` processor (the Spark-4 successor to
    applyInPandasWithState, RocksDB-backed): per-source ingest quota.

    State = one ValueState long per source (accepted-so-far). Each batch
    sorts its rows by doc_id and accepts until the quota is exhausted —
    deterministic regardless of shuffle arrival order, so the stream is
    parity-testable against the batch row_number gate. The real-world
    shape: capping an over-represented domain AT INGEST, before
    downstream stages pay to process documents the mixture step would
    discard anyway.
    """

    def __init__(self, quota: int) -> None:
        self._quota = quota

    def init(self, handle) -> None:  # StatefulProcessorHandle
        self._n = handle.getValueState("n", "n long")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(rows), ignore_index=True)
        batch = batch.sort_values("doc_id")
        taken = self._n.get()[0] if self._n.exists() else 0
        room = max(self._quota - taken, 0)
        out = batch.head(room)
        self._n.update((taken + len(out),))
        if len(out):
            yield out[["source", "doc_id"]]

    def close(self) -> None:
        pass


def _tws_available() -> bool:
    """transformWithState's Python↔JVM state protocol is protobuf-based;
    without the ``protobuf`` package the driver worker crashes at the
    first state call. Soft-detect (same pattern as the imaging-lib gate
    in operators.multimodal)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def source_quota_stream(
    docs: DataFrame, quota: int = 50, api: str = "auto"
) -> DataFrame:
    """Per-source quota gate over a streaming documents frame → the
    accepted (source, doc_id) rows.

    ``api="tws"`` uses transformWithStateInPandas (Spark 4, requires the
    RocksDB state store provider AND the protobuf package);
    ``api="apiws"`` uses applyInPandasWithState (works everywhere);
    ``"auto"`` picks tws when its runtime deps exist. Both paths run the
    IDENTICAL quota semantics (sort batch by doc_id, accept until the
    per-source budget is spent), so the parity test pins whichever path
    the environment supports.
    """
    if api == "auto":
        api = "tws" if _tws_available() else "apiws"
    if api == "tws":
        return docs.groupBy("source").transformWithStateInPandas(
            statefulProcessor=SourceQuotaProcessor(quota),
            outputStructType=QUOTA_OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )

    def quota_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values("doc_id")
        taken = state.get[0] if state.exists else 0
        room = max(quota - taken, 0)
        out = batch.head(room)
        state.update((taken + len(out),))
        if len(out):
            yield out[["source", "doc_id"]]

    return docs.groupBy("source").applyInPandasWithState(
        quota_fn,
        outputStructType=QUOTA_OUTPUT_SCHEMA,
        stateStructType="n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("signup_us", LongType()),
        StructField("conv_us", LongType()),
    ]
)


def funnel_stream(
    events: DataFrame, window_days: int = 7
) -> DataFrame:
    """Stateful streaming funnel: per user, earliest signup and first
    purchase within ``window_days`` after it → (user_id, signup_us,
    conv_us µs epoch, conv_us null until converted). The streaming twin
    of the batch ``ev_funnel`` per-user reduction (the cohort rollup is
    a plain downstream aggregation).

    State per user is two longs — bounded by active users, evicted by
    the processing-time timeout. Exactness caveat (documented, not
    hidden): if a batch delivers a user's purchase and a LATER batch
    retroactively delivers an EARLIER signup, a purchase that fell
    outside the old window but inside the new one was already
    discarded — exact replay of that case needs every purchase
    retained (unbounded state). With event-time-ordered ingest (the
    drop-zone pattern) or availableNow over complete files, results
    are exact and equal the batch query.
    """
    win_us = window_days * 86_400_000_000
    NONE = -1  # state sentinel: "no signup/conversion seen yet"

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        su, cv = state.get if state.exists else (NONE, NONE)
        batch = batch.assign(
            __us=pd.to_datetime(batch["ts"]).astype("int64") // 1000
        )
        sign = batch.loc[batch["event_type"] == "signup", "__us"]
        if len(sign):
            mn = int(sign.min())
            su = mn if su == NONE else min(su, mn)
        if su != NONE:
            pur = batch.loc[
                (batch["event_type"] == "purchase")
                & (batch["__us"] > su)
                & (batch["__us"] <= su + win_us),
                "__us",
            ]
            if len(pur):
                mn = int(pur.min())
                cv = mn if cv == NONE else min(cv, mn)
            if cv != NONE and not (su < cv <= su + win_us):
                cv = NONE  # retro-signup moved the window; drop stale conv
        state.update((su, cv))
        if su != NONE:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "signup_us": [su],
                    "conv_us": [None if cv == NONE else cv],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType="signup_us long, conv_us long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# streaming event-type transitions (the ev_markov_transitions twin)
# ---------------------------------------------------------------------------

TRANSITION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("from_type", StringType()),
        StructField("to_type", StringType()),
    ]
)

# state = the user's latest seen event under (ts, event_id) order: the
# bridge that lets batch N+1's first event pair with batch N's last
TRANSITION_STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("last_event_id", LongType()),
        StructField("last_type", StringType()),
    ]
)


def _emit_transitions(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    pdf = pd.concat(list(pdfs), ignore_index=True)
    if not len(pdf):
        return
    pdf["__ts_us"] = pd.to_datetime(pdf["ts"]).astype("int64") // 1000
    pdf = pdf.sort_values(["__ts_us", "event_id"], kind="mergesort")
    types = pdf["event_type"].tolist()
    prev_type = state.get[2] if state.exists else None
    froms, tos = [], []
    for t in types:
        if prev_type is not None:
            froms.append(prev_type)
            tos.append(t)
        prev_type = t
    last = pdf.iloc[-1]
    state.update((int(last["__ts_us"]), int(last["event_id"]), str(last["event_type"])))
    state.setTimeoutDuration(IDLE_TIMEOUT_MS)
    if froms:
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(froms),
                "from_type": froms,
                "to_type": tos,
            }
        )


def event_transitions_stream(events: DataFrame) -> DataFrame:
    """Streaming first-order transitions: one (user_id, from_type,
    to_type) row per consecutive event pair in each user's (ts,
    event_id)-ordered history — the incremental feed of the
    ``ev_markov_transitions`` matrix (a downstream count aggregation,
    mergeable across any window).

    State is ONE row per active user (latest event's ts/id/type), so
    cross-batch pairs bridge correctly and each transition is emitted
    exactly once (append semantics). Within a micro-batch the rows are
    sorted explicitly; ACROSS batches the bridge is exact only when the
    source delivers a user's events in event-time order — an event
    arriving after a later one was already consumed pairs with the
    newest state, the standard at-ingest caveat (documented, same class
    as the funnel's retro-signup replay edge; a watermarked
    re-aggregation repairs late data downstream where exactness is
    required). Idle users are reaped by the processing-time timeout, so
    state is bounded by ACTIVE users.
    """
    return (
        events.where(F.col("user_id").isNotNull())
        .select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _emit_transitions,
            outputStructType=TRANSITION_SCHEMA,
            stateStructType=TRANSITION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# streaming KMV sketch maintenance (the sketch_kmv_overlap feed)
# ---------------------------------------------------------------------------

KMV_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("hashes", StringType()),  # csv of the k smallest, ascending
    ]
)

KMV_STATE_SCHEMA = StructType([StructField("hashes", StringType())])

_KMV_STREAM_K = 32


def _kmv_hash(user_id: int) -> int:
    import hashlib

    return int(hashlib.md5(str(user_id).encode()).hexdigest()[:12], 16)


def _update_kmv(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    cur: set[int] = set()
    if state.exists:
        (csv,) = state.get
        if csv:
            cur = {int(x) for x in csv.split(",")}
    for pdf in pdfs:
        for uid in pdf["user_id"].dropna():
            cur.add(_kmv_hash(int(uid)))
    kept = sorted(cur)[:_KMV_STREAM_K]
    csv = ",".join(str(x) for x in kept)
    state.update((csv,))
    state.setTimeoutDuration(IDLE_TIMEOUT_MS)
    yield pd.DataFrame({"event_type": [key[0]], "hashes": [csv]})


def kmv_sketch_stream(events: DataFrame) -> DataFrame:
    """Streaming K-minimum-values maintenance: one bounded state row per
    event_type holding the k smallest md5-derived 48-bit user hashes —
    "merge new hashes, keep k smallest" is the KMV merge operator, so
    the maintained sketch equals the batch ``kmv_sketch`` over all data
    seen (parity test pins bit-equality), and downstream the
    ``sketch_kmv_overlap`` union/intersection math reads it unchanged.
    State per group is <= k longs REGARDLESS of stream length — the
    same bounded-state argument as the streaming HLL registers, but for
    the sketch family that can intersect. Update semantics: the latest
    emitted row per group is the current sketch.

    Caveat shared with all KMV maintenance: deletions are not
    supported (a min sketch cannot forget); re-derive from storage for
    retraction workloads.
    """
    return (
        events.where(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_kmv,
            outputStructType=KMV_OUTPUT_SCHEMA,
            stateStructType=KMV_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
