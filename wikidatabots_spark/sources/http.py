"""HTTP GET as a column operation (reference S5/X1 — the one genuinely
engine-shaped component, polars_requests.py:90-194).

Design: a Series→Series **pandas UDF** over the request struct column,
marked ``asNondeterministic()`` so Catalyst never reorders predicates
across it nor re-executes it speculatively (SURVEY.md §2.13⚠, §4). The
frame is coalesced to ``partitions`` (default 1) before the UDF — rate
limits are per-process, so one partition preserves the reference's
serialized, polite behavior; pass ``partitions=N`` to opt into parallel
fetching with a per-partition limiter at scale.

Behavioral envelope preserved from polars_requests.py:90-170:
- cardinality guard: assert < 50,000 requests per run (:99)
- empty input → typed empty result (:101-102)
- one shared ``requests.Session`` per worker (:104)
- sequential iteration within a partition (:154-156)
- GET only, redirects disabled (:115-121)
- per-request min-time rate limiting (:144-146)
- status classes: ok (pass), bad (warn + raise_for_status), unknown
  (warn) (:136-142)
- retry with exponential backoff on RequestException: ≤ ``retry_count``
  retries (cap 12), total retry budget 300 s (:77-87,150)
- warning when a retry changes the status code (:123-132)
- null request rows → null response rows (:159-166)

# MARK: pandas_udf — Catalyst optimization barrier (filters cannot be
# pushed across this column; order manual filters *before* it).
"""

from __future__ import annotations

import time
import warnings
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from wikidatabots_spark.functions.structs import HTTP_RESPONSE_TYPE

MAX_REQUESTS = 50_000  # polars_requests.py:99
MAX_RETRY_COUNT = 12  # polars_requests.py:83
MAX_RETRY_TIME = 300.0  # polars_requests.py:84


def http_get(
    df: DataFrame,
    request_col: str = "http_request",
    response_col: str = "http_response",
    log_group: str = "http",
    timeout: float = 10.0,
    min_time: float = 0.0,
    ok_statuses: tuple[int, ...] = (200,),
    bad_statuses: tuple[int, ...] = (),
    retry_count: int = 0,
    partitions: int = 1,
) -> DataFrame:
    """Append a response struct column for each request struct row.

    Signature mirrors ``request()`` (polars_requests.py:173-194).

    Rate limiting is GLOBAL across partitions: with ``partitions=N`` each
    partition runs a limiter with period ``N·min_time`` and phase offset
    ``partitionId·min_time`` (time-sliced quotas), so the aggregate request
    rate against the remote API never exceeds ``1/min_time`` — the same
    politeness envelope as the reference's strictly sequential loop
    (polars_requests.py:154-156), preserved under parallel fetching. No
    cross-worker coordination is needed (nothing to break at 1000
    executors); the phase offsets also stagger the requests so the
    aggregate stream is smooth rather than N-bursty.
    """
    assert retry_count <= MAX_RETRY_COUNT, "retry_count capped at 12"
    ok_set, bad_set = set(ok_statuses), set(bad_statuses)
    if partitions is not None:
        df = df.coalesce(partitions)
    # period scales with the ACTUAL partition count: coalesce() can only
    # reduce partitions, so a 1-partition input asked for partitions=4
    # must not run 4× slower than the sequential reference. (The rdd
    # compile is only paid on the explicit parallel-opt-in path.)
    n_parts = (
        1
        if partitions is None or partitions <= 1
        else max(df.rdd.getNumPartitions(), 1)
    )
    # per-TASK state, keyed by task attempt: a pandas UDF is invoked once
    # per Arrow batch, and batch-local state would (a) let two requests
    # from adjacent batches of one partition fire closer than the period
    # and (b) re-pay the phase-stagger sleep and reset the cardinality
    # guard every maxRecordsPerBatch rows
    task_state: dict[int, dict[str, Any]] = {}

    @pandas_udf(HTTP_RESPONSE_TYPE)
    def _do_requests(reqs: pd.DataFrame) -> pd.DataFrame:
        import requests
        from pyspark import TaskContext

        n = len(reqs)
        out: list[dict[str, Any] | None] = []
        if n == 0:  # empty-input short-circuit (polars_requests.py:101-102)
            return pd.DataFrame(out, columns=["status", "headers", "data"])
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        tid = ctx.taskAttemptId() if ctx is not None else 0
        st = task_state.setdefault(
            tid,
            {
                "session": requests.Session(),  # shared per partition (:104)
                "sent": 0,
                "phase_slept": False,
                "last_start": 0.0,
            },
        )
        st["sent"] += n
        # cardinality guard per RUN-partition, not per Arrow batch
        # (polars_requests.py:99). On the parallel opt-in path the per-task
        # cap is divided by the partition count so the FRAME-level bound
        # stays ≤ MAX_REQUESTS (N tasks × cap/N) — matching the reference's
        # whole-frame cap instead of silently multiplying it by N
        # (ADVICE r2 http.py:118). Coalesce spreads rows near-evenly, so a
        # partition tripping cap/N means the frame is near the global cap.
        task_cap = MAX_REQUESTS if n_parts <= 1 else max(MAX_REQUESTS // n_parts, 1)
        assert st["sent"] < task_cap, (
            f"{st['sent']} requests in one partition exceeds {task_cap} "
            f"(= {MAX_REQUESTS} frame cap / {n_parts} partitions)"
        )
        session = st["session"]
        # per-partition period N·min_time ⇒ aggregate ≤ 1/min_time
        period = min_time * n_parts
        for _, row in reqs.iterrows():  # sequential (:154-156)
            url = row.get("url")
            if url is None or (isinstance(url, float) and pd.isna(url)):
                # placeholder row; the F.when mask below nulls the struct
                out.append({"status": None, "headers": None, "data": None})
                continue
            if not st["phase_slept"]:
                st["phase_slept"] = True
                if min_time > 0 and n_parts > 1:
                    time.sleep((pid % n_parts) * min_time)  # phase stagger
            wait = period - (time.monotonic() - st["last_start"])
            if wait > 0:  # time-sliced rate limit (:144-146 at N=1)
                time.sleep(wait)
            st["last_start"] = time.monotonic()
            raw_headers = row.get("headers")
            if raw_headers is None or (
                isinstance(raw_headers, float) and pd.isna(raw_headers)
            ):
                raw_headers = []
            hdrs = {
                h["name"]: h["value"]
                for h in raw_headers
                if h is not None and h.get("name") is not None
            }
            first_status: int | None = None
            tries = 0
            start = time.monotonic()
            delay = 1.0
            while True:
                tries += 1
                try:
                    resp = session.get(
                        url, headers=hdrs, timeout=timeout, allow_redirects=False
                    )
                except requests.RequestException:
                    left = MAX_RETRY_TIME - (time.monotonic() - start)
                    if tries > retry_count or left <= 0:
                        raise
                    time.sleep(min(delay, max(left, 0.0)))
                    delay = min(delay * 2, 60.0)
                    continue
                status = resp.status_code
                if first_status is None:
                    first_status = status
                if status in ok_set:
                    break
                if status in bad_set:
                    # warn + raise (polars_requests.py:136-142)
                    warnings.warn(f"[{log_group}] bad status {status} for {url}")
                    resp.raise_for_status()
                    break
                if tries <= retry_count:
                    left = MAX_RETRY_TIME - (time.monotonic() - start)
                    if left > 0:
                        time.sleep(min(delay, left))
                        delay = min(delay * 2, 60.0)
                        continue
                warnings.warn(f"[{log_group}] unknown status {status} for {url}")
                break
            if first_status is not None and first_status != resp.status_code:
                # a retry changed the outcome (polars_requests.py:123-132)
                warnings.warn(
                    f"[{log_group}] retry changed status "
                    f"{first_status} → {resp.status_code} for {url}"
                )
            out.append(
                {
                    "status": resp.status_code,
                    "headers": [
                        {"name": k, "value": v} for k, v in resp.headers.items()
                    ],
                    "data": resp.content,
                }
            )
        return pd.DataFrame(out, columns=["status", "headers", "data"])

    udf = _do_requests.asNondeterministic()
    # (df was already coalesced above, before measuring n_parts)
    # null request → null response *struct* (not a struct of nulls): the
    # UDF emits a placeholder row for null inputs which this mask discards
    resp = F.when(
        F.col(request_col).isNull(), F.lit(None).cast(HTTP_RESPONSE_TYPE)
    ).otherwise(udf(F.col(request_col)))
    return df.withColumn(response_col, resp)


def response_ok(response: Column | str) -> Column:
    c = F.col(response) if isinstance(response, str) else response
    return c.getField("status").between(200, 299)


def response_text(response: Column | str) -> Column:
    """Response body as UTF-8 text (polars_requests.py:248 cast)."""
    c = F.col(response) if isinstance(response, str) else response
    return F.decode(c.getField("data"), "UTF-8")
