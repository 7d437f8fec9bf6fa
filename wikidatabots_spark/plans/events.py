"""Event-time operators over the ``events`` table.

Batch forms here (oracle-checked); ``streaming/events_stream.py`` runs the
same logical aggregations as Structured Streaming with watermarks (tested
in pytest — streaming DataFrames can't be driver-collected).

- ``ev_hourly_rollup``   tumbling-window counts + exact decimal sums
- ``ev_sessionize``      30-minute-gap sessionization (lag + cumulative
  sum over a user-partitioned window) — the classic stateful op; the
  streaming twin uses the session_window built-in
- ``ev_json_extract``    typed extraction from the JSON props column

Scale: hourly rollup = one shuffle on (hour, event_type) with map-side
partial aggregation; sessionization = one shuffle on user_id then a
per-user sort — both AQE-coalesced. JSON extraction is a narrow map
(from_json with an explicit schema — the reference never infers, §1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wikidatabots_spark.plans.registry import register
from wikidatabots_spark.sources.tables import load_table

SESSION_GAP_MIN = 30


_EV_HOURLY_ORACLE = """
SELECT date_trunc('hour', ts) AS hour_start,
       event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS sum_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""


@register("ev_hourly_rollup", oracle=_EV_HOURLY_ORACLE)
def ev_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
        F.sum(F.col("value").cast("decimal(14,4)")).cast("double").alias("sum_value"),
    )


_EV_SESSIONIZE_ORACLE = f"""
WITH ordered AS (
    SELECT user_id, ts, event_id,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
),
flagged AS (
    SELECT *,
           CASE WHEN prev_ts IS NULL
                     OR epoch_us(ts) - epoch_us(prev_ts) > {SESSION_GAP_MIN} * 60 * 1000000
                THEN 1 ELSE 0 END AS new_session
    FROM ordered
),
numbered AS (
    SELECT *,
           CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
    FROM flagged
)
SELECT user_id,
       session_seq,
       COUNT(*) AS n_events,
       MIN(event_id) AS first_event_id,
       (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000 AS duration_sec
FROM numbered
GROUP BY user_id, session_seq
"""


@register("ev_sessionize", oracle=_EV_SESSIONIZE_ORACLE)
def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: lag → flag → running sum → per-session agg.

    Batch twin of streaming session windows. duration_sec is integer
    microsecond arithmetic divided once — cross-engine exact.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id", "ts", "event_id", F.lag("ts").over(w).alias("prev_ts")
    ).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (
                F.unix_micros("ts") - F.unix_micros("prev_ts")
                > SESSION_GAP_MIN * 60 * 1_000_000
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    numbered = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event_id"),
        (
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 1_000_000
        ).alias("duration_sec"),
    )


_EV_JSON_ORACLE = """
SELECT event_id,
       CAST(props->>'$.k' AS INT) AS k
FROM events
"""


@register("ev_json_extract", oracle=_EV_JSON_ORACLE)
def ev_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: JSON decode with an explicit schema (never inferred, SURVEY §1)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json(F.col("props"), "k INT").getField("k").alias("k"),
    )


_EV_RANGE_JOIN_ORACLE = """
SELECT p.event_id AS purchase_id,
       s.event_id AS signup_id,
       p.user_id
FROM events p
JOIN events s
  ON p.user_id = s.user_id
 AND p.event_type = 'purchase'
 AND s.event_type = 'signup'
 AND p.ts >= s.ts
 AND p.ts < s.ts + INTERVAL 3 DAY
"""


@register("ev_range_join", oracle=_EV_RANGE_JOIN_ORACLE)
def ev_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases inside any [signup, signup+3d) window, per user — the
    interval-bucketed range join (operators.rangejoin). Spark's native
    plan for the inequality condition is a nested-loop join; the bucketed
    form is a plain equi-join on (user_id, day-bucket) with the interval
    exploded to its ~4 bucket rows."""
    from wikidatabots_spark.operators.rangejoin import range_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    signups = ev.where(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 3 DAYS")).alias("end"),
    )
    return range_join(
        purchases, signups, on=["user_id"], bucket_width="1 day"
    ).select("purchase_id", "signup_id", "user_id")


_EV_TIME_ROLLUP_ORACLE = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
       CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS sum_value
FROM events
GROUP BY GROUPING SETS (
    (date_trunc('day', ts), date_trunc('hour', ts)),
    (date_trunc('day', ts)),
    ()
)
"""


@register("ev_time_rollup", oracle=_EV_TIME_ROLLUP_ORACLE)
def ev_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-hierarchy rollup (hypertable continuous-aggregate shape):
    hour→day→grand-total in ONE pass via ROLLUP on derived time columns —
    partial aggregation combines map-side once, instead of one scan per
    granularity. Decimal-exact sums keep the three levels bit-consistent
    with each other and the oracle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.date_trunc("day", F.col("ts")).alias("day_start"),
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            F.col("value"),
        )
        .rollup("day_start", "hour_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(14,4)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


_EV_OVERLAP_ORACLE = """
WITH s AS (
    SELECT event_id, ts AS s_start, ts + INTERVAL 12 HOUR AS s_end
    FROM events WHERE event_type = 'signup' AND user_id < 100
)
SELECT a.event_id AS id_a, b.event_id AS id_b
FROM s a JOIN s b
  ON a.event_id < b.event_id
 AND a.s_start < b.s_end
 AND b.s_start < a.s_end
"""


@register("ev_interval_overlap", oracle=_EV_OVERLAP_ORACLE)
def ev_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of 12-hour signup windows that overlap in time — the
    interval×interval bucketed overlap join (operators.rangejoin.
    interval_overlap_join): equi-join on time bucket + canonical-bucket
    dedup, no nested-loop stage and no dropDuplicates shuffle."""
    from wikidatabots_spark.operators.rangejoin import interval_overlap_join

    s = (
        load_table(spark, sf_dir, "events")
        .where((F.col("event_type") == "signup") & (F.col("user_id") < 100))
        .select(
            F.col("event_id"),
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 12 HOURS")).alias("w_end"),
        )
    )
    a = s.select(
        F.col("event_id").alias("id_a"),
        F.col("w_start").alias("a_start"),
        F.col("w_end").alias("a_end"),
    )
    b = s.select(
        F.col("event_id").alias("id_b"),
        F.col("w_start").alias("b_start"),
        F.col("w_end").alias("b_end"),
    )
    return (
        interval_overlap_join(
            a,
            b,
            on=[],
            left_start="a_start",
            left_end="a_end",
            right_start="b_start",
            right_end="b_end",
            bucket_width="12 hours",
        )
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )


_EV_FUNNEL_ORACLE = """
WITH su AS (
    SELECT user_id, MIN(ts) AS signup_ts
    FROM events WHERE event_type = 'signup' GROUP BY user_id
),
conv AS (
    SELECT s.user_id, MIN(e.ts) AS first_conv
    FROM su s JOIN events e ON e.user_id = s.user_id
    WHERE e.event_type = 'purchase' AND e.ts > s.signup_ts
      AND e.ts <= s.signup_ts + INTERVAL 7 DAY
    GROUP BY s.user_id
)
SELECT CAST(date_trunc('day', s.signup_ts) AS DATE) AS signup_day,
       COUNT(*) AS n_signups,
       CAST(COUNT(c.first_conv) AS BIGINT) AS n_converted,
       CAST(COALESCE(SUM(epoch_us(c.first_conv) - epoch_us(s.signup_ts)), 0)
            AS BIGINT) AS sum_conv_us
FROM su s LEFT JOIN conv c ON s.user_id = c.user_id
GROUP BY 1
"""


@register("ev_funnel", oracle=_EV_FUNNEL_ORACLE)
def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion funnel: per signup-day cohort, how many
    users signed up, how many made their first purchase within 7 days,
    and the exact summed conversion latency (microseconds — integer,
    engine-exact; the consumer divides for an average).

    Scale notes: both sides reduce to per-user rows before anything
    joins — signups aggregate to (user, min ts) and the purchase join
    output re-aggregates on the same user_id partitioning, so the two
    groupBys and the join share one exchange; the final per-day rollup
    is dimension-sized. No window functions, no fact-x-fact blowup: the
    join is per-user signup row x that user's purchases only.
    """
    ev = load_table(spark, sf_dir, "events")
    su = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    pu = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )
    conv = (
        su.join(pu, "user_id")
        .where(
            (F.col("pts") > F.col("signup_ts"))
            & (F.col("pts") <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS"))
        )
        .groupBy("user_id")
        .agg(F.min("pts").alias("first_conv"))
    )
    return (
        su.join(conv, "user_id", "left")
        .groupBy(F.to_date("signup_ts").alias("signup_day"))
        .agg(
            F.count(F.lit(1)).alias("n_signups"),
            F.count("first_conv").alias("n_converted"),
            F.coalesce(
                F.sum(F.unix_micros("first_conv") - F.unix_micros("signup_ts")),
                F.lit(0),
            )
            .cast("bigint")
            .alias("sum_conv_us"),
        )
    )


_EV_RETENTION_ORACLE = """
WITH first_seen AS (
    SELECT user_id, date_trunc('week', MIN(ts)) AS cw
    FROM events GROUP BY user_id
),
active AS (
    SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events
)
SELECT CAST(f.cw AS DATE) AS cohort_week,
       CAST(date_diff('day', f.cw, a.aw) // 7 AS INT) AS week_offset,
       COUNT(*) AS n_active_users
FROM first_seen f JOIN active a ON f.user_id = a.user_id
GROUP BY 1, 2
"""


@register("ev_retention", oracle=_EV_RETENTION_ORACLE)
def ev_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users bucketed by the week of
    their first event; each (cohort_week, week_offset) cell counts users
    from that cohort active in that later week. Offsets are exact-int
    (both engines truncate weeks to Monday, so the day diff is a
    multiple of 7).

    Scale notes: the fact table collapses to per-user rows twice —
    groupBy user (first event) and distinct (user, week) — both
    map-side-combined on the same user_id-prefixed keys; the join is
    per-user and the retention matrix itself is tiny (weeks x offsets).
    """
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cw")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("aw")
    ).distinct()
    return (
        first_seen.join(active, "user_id")
        .groupBy(
            F.to_date("cw").alias("cohort_week"),
            (F.datediff(F.to_date("aw"), F.to_date("cw")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


# --- SCD2 point-in-time enrichment -----------------------------------------
_EV_PIT_ORACLE = """
WITH dim0 AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                THEN 1 ELSE 0 END AS new_run
    FROM events WHERE event_type != 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
starts AS (
    SELECT user_id, ts AS state_since, event_type AS state,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS BIGINT)
               AS state_version
    FROM dim0 WHERE new_run = 1
),
dim AS (
    SELECT user_id, state_since, state, state_version FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, state_since
                                     ORDER BY state_version DESC) AS rn
        FROM starts
    ) WHERE rn = 1
),
fact AS (
    SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
    FROM events WHERE event_type = 'purchase'
)
SELECT f.purchase_id, f.user_id, f.purchase_ts,
       d.state, d.state_version, d.state_since
FROM fact f ASOF LEFT JOIN dim d
  ON f.user_id = d.user_id AND f.purchase_ts >= d.state_since
"""


@register("ev_scd2_pit_join", oracle=_EV_PIT_ORACLE)
def ev_scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) join against an SCD2 dimension: every
    purchase is enriched with the state the user was in WHEN they
    purchased — the lakehouse pattern for joining facts to a
    slowly-changing dimension without time-travel errors. The dimension
    here is the run-length state log over the user's non-purchase
    events (the ``ev_scd2_intervals`` construction).

    The scale insight: because SCD2 intervals PARTITION time per key,
    interval containment (valid_from <= ts < valid_to) is EXACTLY a
    backward as-of join on valid_from — so the plan never materializes
    intervals, never range-explodes open-ended current rows, and runs
    as one user_id exchange + per-key sort (operators/asof.py), the
    same shape as any as-of. A bucketed-interval range join here would
    pay unbounded fan-out on the open current state; the as-of
    equivalence is the right 100 TB form.

    Same-ts duplicate state starts resolve to the highest version (the
    as-of contract needs a unique right row per (key, ts)).
    """
    from wikidatabots_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim0 = (
        ev.where(F.col("event_type") != "purchase")
        .withColumn("__prev", F.lag("event_type").over(w))
        .withColumn(
            "__new_run",
            F.col("__prev").isNull()
            | ~F.col("__prev").eqNullSafe(F.col("event_type")),
        )
    )
    starts = dim0.where(F.col("__new_run")).select(
        "user_id",
        F.col("ts").alias("state_since"),
        F.col("event_type").alias("state"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .cast("bigint")
        .alias("state_version"),
    )
    dedup_w = Window.partitionBy("user_id", "state_since").orderBy(
        F.col("state_version").desc()
    )
    dim = (
        starts.withColumn("__rn", F.row_number().over(dedup_w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    fact = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    out = asof_join(
        fact, dim, on=["user_id"], left_ts="purchase_ts", right_ts="state_since"
    )
    return out.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        "state",
        "state_version",
        F.col("asof_ts").alias("state_since"),
    )


# --- incremental rollup maintenance (materialized-view delta) --------------
def rollup_partials(df: DataFrame) -> DataFrame:
    """Per-slice PARTIAL aggregates of the hourly rollup: count and
    DECIMAL sum per (hour, event_type). Count and decimal-sum are
    commutative monoids, so any partition of the event stream into
    slices (yesterday/today, micro-batches) merges back bit-for-bit
    via :func:`merge_rollup`. Shared by the batch day-2 query
    (``ev_rollup_incremental``) and the streaming foreachBatch
    maintenance sink (``streaming.events_stream.rollup_maintenance``)."""
    return df.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("p_events"),
        F.sum(F.col("value").cast("decimal(14,4)")).alias("p_sum"),
    )


def rollup_user_keys(df: DataFrame) -> DataFrame:
    """The distinct (hour, type, user) key set — COUNT(DISTINCT) is not
    mergeable from the aggregate alone, so exact maintenance must carry
    this set (its size is the rollup's true state cost; the mergeable
    alternative is the HLL register form, ``sketch_hll_by_type``)."""
    return df.select(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        "event_type",
        "user_id",
    ).distinct()


def merge_rollup(partials: DataFrame, user_keys: DataFrame) -> DataFrame:
    """Merge any number of partial slices back into the exact rollup:
    partial + partial == full, bit-for-bit (sums stay DECIMAL until the
    final cast, so merge order cannot change bits); n_users re-distincts
    the carried key set."""
    merged = partials.groupBy("hour_start", "event_type").agg(
        F.sum("p_events").cast("bigint").alias("n_events"),
        F.sum("p_sum").alias("m_sum"),
    )
    users = (
        user_keys.distinct()
        .groupBy("hour_start", "event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return merged.join(users, ["hour_start", "event_type"]).select(
        "hour_start",
        "event_type",
        "n_events",
        "n_users",
        F.col("m_sum").cast("double").alias("sum_value"),
    )


@register("ev_rollup_incremental", oracle=_EV_HOURLY_ORACLE)
def ev_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-2 maintenance of the hourly rollup, PROVEN equal to full
    recompute (the oracle IS ``ev_hourly_rollup``'s): the even-event_id
    half plays yesterday's events with their rollup PERSISTED as
    partial aggregates; today's odd-id delta is aggregated alone and
    MERGED — count and decimal-sum are commutative monoids, so
    partial + partial == full, bit-for-bit (sums stay DECIMAL until
    the final cast, so merge order cannot change bits).

    The deliberately-not-glossed-over part: COUNT(DISTINCT user_id) is
    NOT mergeable from the aggregate alone — the maintained state must
    include the distinct (hour, type, user) key set (what this plan
    unions and re-distincts; its size is the rollup's true state cost),
    or accept approximation with the MERGEABLE HyperLogLog registers
    (``sketch_hll_by_type`` — bounded state, the 100 TB default).

    Scale: the delta pays one shuffle on its own size; the merge
    shuffles partial rows (groups, not events). At a realistic
    delta:corpus ratio the daily cost is delta-sized — same argument
    as ``dedup_components_incremental``, for aggregates.
    """
    ev = load_table(spark, sf_dir, "events")
    old = ev.where(F.col("event_id") % 2 == 0)
    new = ev.where(F.col("event_id") % 2 == 1)
    return merge_rollup(
        rollup_partials(old).unionByName(rollup_partials(new)),
        rollup_user_keys(old).unionByName(rollup_user_keys(new)),
    )


# --- interval algebra: coalesce + overlap join -----------------------------
_INCIDENT_WIN_MIN = 30

_INTERVAL_MERGE_ORACLE = f"""
WITH wins AS (
    SELECT epoch_us(ts) AS s,
           epoch_us(ts) + {_INCIDENT_WIN_MIN} * 60 * 1000000 AS e
    FROM events WHERE event_type = 'error' AND ts IS NOT NULL
),
ordered AS (
    SELECT s, e,
           MAX(e) OVER (ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max_e
    FROM wins
),
flagged AS (
    SELECT s, e,
           CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END
               AS new_island
    FROM ordered
),
numbered AS (
    SELECT s, e,
           CAST(SUM(new_island) OVER (ORDER BY s, e
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS incident_id
    FROM flagged
)
SELECT incident_id,
       MIN(s) AS inc_start_us,
       MAX(e) AS inc_end_us,
       COUNT(*) AS n_windows
FROM numbered GROUP BY incident_id
"""


def _merged_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase parallel interval merge (VERDICT r5 next #1 class —
    error events are ~20% of the event table, nowhere near
    one-partition-sized at 100 TB).

    The island flag needs ``max(e) over all earlier intervals``; split
    it by an HOURLY time bucket (monotone in the (s, e) order): the
    running max decomposes into the within-bucket running max (window
    PARTITIONED by bucket) combined with a per-bucket carry — the
    running max of bucket maxima over the tiny hour ledger (the only
    single-partition window; |hours| rows). Island NUMBERING is then a
    global running sum of the flags — exactly
    ``bucketed_global_rank(running_sum=new_island)``. Row-identical to
    the one-window form the DuckDB oracle keeps.
    """
    from wikidatabots_spark.functions.scale import (
        bucketed_global_rank,
        pushdown_fence,
    )

    ev = load_table(spark, sf_dir, "events")
    # NULL ts carries no interval — filtered on BOTH sides (oracle has
    # the matching ts IS NOT NULL); unfiltered it would poison the
    # time-bucket key, which bucketed_global_rank now rejects loudly
    wins = ev.where(
        (F.col("event_type") == "error") & F.col("ts").isNotNull()
    ).select(
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + _INCIDENT_WIN_MIN * 60 * 1_000_000).alias("e"),
    )
    b = wins.withColumn("__bkt", F.expr("s div 3600000000"))
    # phase A: per-bucket max end; carry = running max over PRIOR buckets
    ledger = b.groupBy("__bkt").agg(F.max("e").alias("__bmax"))
    wl = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    ledger = ledger.withColumn(
        "__carry_e", F.max("__bmax").over(wl)
    ).select("__bkt", "__carry_e")
    wb = Window.partitionBy("__bkt").orderBy("s", "e")
    # greatest() skips NULLs: first row of the first bucket sees NULL
    # (no prior interval anywhere) — same as the one-window form
    flagged = (
        b.join(F.broadcast(ledger), "__bkt")
        .withColumn(
            "prev_max_e",
            F.greatest(
                F.max("e").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
                F.col("__carry_e"),
            ),
        )
        .withColumn(
            "new_island",
            F.when(
                F.col("prev_max_e").isNull()
                | (F.col("s") > F.col("prev_max_e")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
    )
    # fence: flagged feeds phase B's bucket ledger AND the fact side
    flagged = pushdown_fence(flagged)
    # phase B: global island number = two-phase running sum of the flags
    numbered = bucketed_global_rank(
        flagged,
        bucket=F.col("__bkt"),
        order=[F.col("s").asc(), F.col("e").asc()],
        rn=None,
        running_sum=F.col("new_island"),
        running_sum_out="incident_id",
    ).withColumn("incident_id", F.col("incident_id").cast("bigint"))
    return numbered.groupBy("incident_id").agg(
        F.min("s").alias("inc_start_us"),
        F.max("e").alias("inc_end_us"),
        F.count(F.lit(1)).alias("n_windows"),
    )


@register("ev_interval_merge", oracle=_INTERVAL_MERGE_ORACLE)
def ev_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing (gaps-and-islands over intervals): every
    error event opens a 30-minute incident window; overlapping windows
    MERGE into incidents via the running-max-end rule (an interval
    starts a new island iff it begins after everything before it has
    ended). All boundaries integer epoch-µs — exact in both engines.

    Scale: fully two-phase (see ``_merged_incidents``) — intervals
    merge within hourly buckets in parallel; the cross-bucket stitch is
    a running-max carry over the |hours| ledger, the only
    single-partition window. No event-scale frame ever serializes.
    """
    return _merged_incidents(spark, sf_dir)


_OVERLAP_ORACLE = f"""
WITH wins AS (
    SELECT epoch_us(ts) AS s,
           epoch_us(ts) + {_INCIDENT_WIN_MIN} * 60 * 1000000 AS e
    FROM events WHERE event_type = 'error' AND ts IS NOT NULL
),
ordered AS (
    SELECT s, e,
           MAX(e) OVER (ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max_e
    FROM wins
),
flagged AS (
    SELECT s, e,
           CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END
               AS new_island
    FROM ordered
),
numbered AS (
    SELECT s, e,
           CAST(SUM(new_island) OVER (ORDER BY s, e
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS incident_id
    FROM flagged
),
incidents AS (
    SELECT incident_id, MIN(s) AS inc_s, MAX(e) AS inc_e
    FROM numbered GROUP BY incident_id
),
sess AS (
    SELECT user_id, session_seq,
           MIN(epoch_us(ts)) AS sess_s, MAX(epoch_us(ts)) AS sess_e
    FROM (
        SELECT user_id, ts, event_id,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                > {SESSION_GAP_MIN} * 60 * 1000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
    )
    GROUP BY user_id, session_seq
)
SELECT s.user_id, s.session_seq,
       CAST(COUNT(i.incident_id) AS BIGINT) AS n_incidents,
       CAST(COALESCE(SUM(least(s.sess_e, i.inc_e)
                         - greatest(s.sess_s, i.inc_s)), 0) AS BIGINT)
           AS overlap_us
FROM sess s LEFT JOIN incidents i
  ON s.sess_s < i.inc_e AND i.inc_s < s.sess_e
GROUP BY s.user_id, s.session_seq
"""


@register("ev_session_incident_overlap", oracle=_OVERLAP_ORACLE)
def ev_session_incident_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP join (two interval sets, not point-in-interval):
    each user session is joined to every merged error incident it
    overlaps — strict inequalities on [start, end) — and reports the
    incident count plus total overlapped microseconds (least/greatest
    endpoint arithmetic, all integer). Completes the temporal-join
    family: as-of (point→latest), range join (point→interval), PIT
    (fact→SCD2), and now interval→interval.

    Scale: merged incidents are bounded by real-world outage counts —
    a tiny table — so the overlap join BROADCASTS them with the range
    predicate; sessions never shuffle. When BOTH interval sets are
    huge, ``operators.rangejoin.interval_overlap_join`` is the
    exchange-shaped form (bucket explode + equi-join with the
    canonical-bucket dedup trick, tested in tests/test_asof.py); the
    broadcast form is the right plan at this asymmetry and the plan
    lint still forbids cartesian fallback.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id", "ts", "event_id", F.lag("ts").over(w).alias("prev_ts")
    ).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (
                F.unix_micros("ts") - F.unix_micros("prev_ts")
                > SESSION_GAP_MIN * 60 * 1_000_000
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = (
        flagged.withColumn(
            "session_seq",
            F.sum("new_session")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("bigint"),
        )
        .groupBy("user_id", "session_seq")
        .agg(
            F.min(F.unix_micros("ts")).alias("sess_s"),
            F.max(F.unix_micros("ts")).alias("sess_e"),
        )
    )
    inc = _merged_incidents(spark, sf_dir).select(
        "incident_id",
        F.col("inc_start_us").alias("inc_s"),
        F.col("inc_end_us").alias("inc_e"),
    )
    joined = sess.join(
        F.broadcast(inc),
        (F.col("sess_s") < F.col("inc_e")) & (F.col("inc_s") < F.col("sess_e")),
        "left",
    )
    return joined.groupBy("user_id", "session_seq").agg(
        F.count("incident_id").cast("bigint").alias("n_incidents"),
        F.coalesce(
            F.sum(
                F.least("sess_e", "inc_e") - F.greatest("sess_s", "inc_s")
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("overlap_us"),
    )


# ---------------------------------------------------------------------------
# ev_pivot_user_activity — wide per-user activity matrix via pivot
# ---------------------------------------------------------------------------

# The five event types are a closed enum in this dataset; pivoting with an
# EXPLICIT value list is also the 100 TB-correct form — Spark otherwise
# prepends a whole extra distinct-scan of the fact table just to discover
# the column set, and the output schema becomes data-dependent (a new
# value appearing mid-backfill would silently change the table shape).
_EV_TYPES = ["click", "error", "purchase", "signup", "view"]

_EV_PIVOT_ORACLE = """
SELECT user_id,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
       COUNT(*) AS n_total
FROM events
GROUP BY user_id
"""


@register("ev_pivot_user_activity", oracle=_EV_PIVOT_ORACLE)
def ev_pivot_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-user activity matrix: ``groupBy(user).pivot(event_type,
    <explicit values>).count()`` — the long→wide reshape every
    feature-engineering pipeline runs before model training, and the one
    relational surface (``RelationalGroupedData.pivot``) not yet pinned
    by any registered query.

    Catalyst compiles an explicit-values pivot as two-phase
    aggregation (audited in PLANS.md): a hash aggregate on
    ``(user_id, event_type)`` with map-side partials — the only
    exchange that sees fact-table row counts — then a ``PivotFirst``
    regroup on ``user_id`` whose input is already collapsed to
    |users|×|types| rows, so the second exchange is group-sized, not
    data-sized. No per-value scan and, because the values are
    explicit, no distinct pre-pass. Spark's pivot leaves null where a
    (user, type) combo never occurred while the oracle's conditional
    COUNT yields 0, so the pivoted columns are coalesced to 0 — also
    the contract a downstream trainer wants.
    """
    ev = load_table(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", _EV_TYPES)
        .agg(F.count(F.lit(1)))
    )
    n_total = sum(
        (F.coalesce(F.col(t), F.lit(0)) for t in _EV_TYPES), F.lit(0)
    )
    return pivoted.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}")
            for t in _EV_TYPES
        ],
        n_total.cast("bigint").alias("n_total"),
    )


# ---------------------------------------------------------------------------
# op_unpivot_measures — wide→long melt via DataFrame.unpivot
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
SELECT l_orderkey, l_linenumber, measure, value FROM (
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
           l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
)
"""


@register("op_unpivot_measures", oracle=_UNPIVOT_ORACLE)
def op_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt of the four lineitem measures via
    ``DataFrame.unpivot`` — the inverse reshape of
    ``ev_pivot_user_activity`` and the one remaining relational-surface
    API (`unpivot`/`melt`) no registered query pinned (the `stack()`
    SQL form is exercised inside dq_expectations, but on a pre-
    aggregated single row; this pins the DataFrame API on a fact
    table).

    Scale: unpivot is a zero-shuffle narrow map — each input row
    expands to len(values) output rows in place (Catalyst rewrites it
    to Expand), so the plan is scan → expand with no exchange; output
    row count is exactly 4× the scan. The long form is what a metrics
    store or anomaly detector ingests.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# op_map_ops — map-typed column construction and lookup
# ---------------------------------------------------------------------------

_MAP_OPS_ORACLE = """
SELECT user_id,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END)
       + COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_browse,
       COUNT(DISTINCT event_type) AS n_kinds
FROM events
GROUP BY user_id
"""


@register("op_map_ops", oracle=_MAP_OPS_ORACLE)
def op_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: per-user event-type counts built into a
    ``map<string,bigint>`` (``map_from_entries`` over collected
    structs), then consumed with ``element_at`` (null-safe lookup),
    arithmetic over lookups, and ``map_keys`` cardinality. The final
    projection is all BIGINT so the driver hash never sees the map
    itself (map column order is unspecified — unsafe to hash), but a
    wrong map construction or lookup changes the scalars.

    Scale: one shuffle on (user_id, event_type) with map-side partial
    counts, then a per-user ``collect_list`` of at most
    |event_type| = 5 entries — the map is bounded by the enum's
    cardinality, never by event volume.
    """
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    m = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("counts")
    )
    def look(k):
        return F.coalesce(F.element_at(F.col("counts"), k), F.lit(0))
    return m.select(
        "user_id",
        look("purchase").cast("bigint").alias("n_purchase"),
        (look("click") + look("view")).cast("bigint").alias("n_browse"),
        F.size(F.map_keys(F.col("counts"))).cast("bigint").alias("n_kinds"),
    )


# ---------------------------------------------------------------------------
# ev_bitmap_distinct — EXACT distinct counts via mergeable bitmap partials
# ---------------------------------------------------------------------------

_BITMAP_DISTINCT_ORACLE = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
UNION ALL
SELECT '__all__' AS event_type, COUNT(DISTINCT user_id) AS n_users
FROM events
"""


@register("ev_bitmap_distinct", oracle=_BITMAP_DISTINCT_ORACLE)
def ev_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-user counts from ONE pass of mergeable bitmap
    partials (``bitmap_construct_agg`` over ``bitmap_bit_position``,
    bucketed by ``bitmap_bucket_number``) — the exact counterpart of the
    HLL sketches in ``operators/sketch.py``: same
    partial-aggregate/merge algebra (``bitmap_or_agg`` is the union),
    but no approximation error, at the cost of memory proportional to
    the id range instead of O(1).

    Scale: this is how an exact-distinct rollup cube is built at 100 TB
    — the fact table collapses to |groups|×|id_range/32768| 4 KB bitmap
    partials with map-side combine (the ONLY exchange that sees fact
    rows), and every coarser grouping (here the '__all__' leg; in
    general any rollup level or later-arriving partition) is computed
    by OR-merging the same partials instead of rescanning the fact
    table — COUNT(DISTINCT) itself cannot re-aggregate. ``user_id + 1``
    because the bitmap functions take 1-based positions.
    """
    from wikidatabots_spark.functions.scale import pushdown_fence

    ev = load_table(spark, sf_dir, "events")
    uid = F.col("user_id") + F.lit(1)
    # fence the partials: they feed BOTH output legs, and Catalyst does
    # not reuse the aggregate subplan across a union (plan-audited: the
    # unfenced form scanned the fact table twice and ran the bitmap
    # aggregate twice — exactly the rescan this query exists to avoid).
    # Fenced, the plan is ONE fact scan + ONE partial aggregate, and
    # the '__all__' leg merges the materialized group-sized partials.
    partials = pushdown_fence(
        ev.groupBy(
            "event_type", F.bitmap_bucket_number(uid).alias("bucket")
        ).agg(F.bitmap_construct_agg(F.bitmap_bit_position(uid)).alias("bm"))
    )
    per_type = partials.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).cast("bigint").alias("n_users")
    )
    merged_all = (
        partials.groupBy("bucket")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .agg(F.sum(F.bitmap_count("bm")).cast("bigint").alias("n_users"))
        .select(F.lit("__all__").alias("event_type"), "n_users")
    )
    return per_type.unionByName(merged_all)


# ---------------------------------------------------------------------------
# agg_multi_distinct — several COUNT(DISTINCT ...) in one aggregation
# ---------------------------------------------------------------------------

_MULTI_DISTINCT_ORACLE = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
       COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


@register("agg_multi_distinct", oracle=_MULTI_DISTINCT_ORACLE)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two COUNT(DISTINCT) over DIFFERENT columns plus a plain COUNT in
    one aggregation — the shape Catalyst rewrites through an Expand
    (one replicated row stream per distinct column, tagged by gid) into
    a single two-phase aggregate, rather than N self-joined
    single-distinct aggregates.

    Scale: Expand multiplies the fact rows by the number of distinct
    columns BEFORE the exchange, so cost grows linearly with the
    distinct-column count — fine at 2-3 columns; past that, one pass of
    re-aggregable partials per column (``ev_bitmap_distinct``'s
    bitmaps, or ``sketch_hll_by_type`` when approximate is acceptable)
    beats the multiplied shuffle. Pinning the exact form documents that
    tradeoff under the hard signal.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).alias("n_users"),
        F.count_distinct(F.to_date("ts")).alias("n_days"),
        F.count(F.lit(1)).alias("n_events"),
    )
