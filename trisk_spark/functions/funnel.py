"""Ordered conversion-funnel analytics over the ``events`` stream —
the classic user-journey rollup of the reference's domain (event
streams of user actions; cf. the Nexmark family in
``operators/nexmark.py``): how many users progressed view → click →
purchase IN ORDER, and how long each hop took.

Semantics (the strict first-touch funnel): a user reaches stage k+1 at
the EARLIEST event of that stage's type that happens STRICTLY AFTER
the user reached stage k. "Strictly after" is value-based on the
event's microsecond timestamp — a click in the same microsecond as the
first view does not convert (and, cross-engine, a value-based rule is
the only deterministic one when timestamps tie; row-order frames would
tiebreak arbitrarily).

Float parity: there are no floats at all. Timestamps become exact
epoch microseconds (BIGINT on both engines — ``unix_micros`` /
``epoch_us``), waits are BIGINT differences, and the per-stage average
wait is a FLOOR integer division (waits are non-negative, so DIV ≡
FLOOR ≡ ``//``) — the tie-free integer-grid discipline.

Plan shape (the scale story): ONE shuffle of events on user_id feeds a
shared frame sort; the three stage-reach columns are window MINs over
the SAME (user_id, ts-range) spec — strictly-before frames via RANGE
BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING on the microsecond key —
so Catalyst evaluates them in one Window pass without new exchanges;
the per-user funnel row then partial-aggregates to user cardinality
and the final stage rollup is three constant-size aggregates. No join
anywhere: the "did an earlier stage happen before this event" test is
a window lookback, not a self-join (the funnel-as-3-joins formulation
re-shuffles the corpus once per stage — this one never re-reads it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from trisk_spark.catalog import table

#: the staged journey, in order (stage 1 has no wait by definition)
FUNNEL_STAGES = ("view", "click", "purchase")

EVENT_FUNNEL_SQL = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
),
w AS (
  SELECT user_id, event_type, us,
    MIN(CASE WHEN event_type = 'view' THEN us END) OVER (
      PARTITION BY user_id ORDER BY us
      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS view_before
  FROM e
),
w2 AS (
  SELECT user_id, event_type, us, view_before,
    MIN(CASE WHEN event_type = 'click' AND view_before IS NOT NULL
             THEN us END) OVER (
      PARTITION BY user_id ORDER BY us
      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_before
  FROM w
),
u AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'view' THEN us END) AS t1,
    MIN(CASE WHEN event_type = 'click' AND view_before IS NOT NULL
             THEN us END) AS t2,
    MIN(CASE WHEN event_type = 'purchase' AND click_before IS NOT NULL
             THEN us END) AS t3
  FROM w2 GROUP BY user_id
)
SELECT stage, stage_idx, n_users, sum_wait_us,
  sum_wait_us // n_users AS avg_wait_us
FROM (
  SELECT 'view' AS stage, 1 AS stage_idx,
    COUNT(t1) AS n_users, CAST(0 AS BIGINT) AS sum_wait_us FROM u
  UNION ALL
  SELECT 'click', 2, COUNT(t2),
    CAST(COALESCE(SUM(t2 - t1), 0) AS BIGINT) FROM u
  UNION ALL
  SELECT 'purchase', 3, COUNT(t3),
    CAST(COALESCE(SUM(t3 - t2), 0) AS BIGINT) FROM u
)
WHERE n_users > 0
ORDER BY stage_idx
"""


#: epoch-µs per day — retention buckets on integer epoch-DAYS (never
#: engine date types: integer division of the µs key is tie-free and
#: bit-identical everywhere, the integer-grid discipline; both
#: engines TRUNCATE toward zero — Spark DIV and DuckDB // agree — so
#: a hypothetical pre-1970 event would shift one day on both sides
#: rather than diverge)
_US_PER_DAY = 86_400_000_000

USER_RETENTION_SQL = f"""
WITH e AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_US_PER_DAY} AS day
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
w AS (
  SELECT user_id, day,
    MIN(day) OVER (PARTITION BY user_id) AS cohort_day
  FROM e
),
u AS (
  SELECT user_id, cohort_day,
    MAX(CASE WHEN day = cohort_day + 1 THEN 1 ELSE 0 END) AS r1,
    MAX(CASE WHEN day = cohort_day + 7 THEN 1 ELSE 0 END) AS r7
  FROM w GROUP BY user_id, cohort_day
)
SELECT cohort_day, COUNT(*) AS n_users,
  CAST(SUM(r1) AS BIGINT) AS retained_d1,
  CAST(SUM(r7) AS BIGINT) AS retained_d7
FROM u GROUP BY cohort_day ORDER BY cohort_day
"""


def user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention over the events stream: users cohorted by
    their first active epoch-day, with day-1 and day-7 return counts —
    the second classic user-journey rollup beside the funnel (funnel =
    did they progress; retention = did they come back). Library op;
    oracle USER_RETENTION_SQL. All-integer: epoch-day buckets are
    truncating µs DIV, retained counts are sums of 0/1 flags.

    Plan (two exchanges, deliberately): the distinct (user, day)
    build exchanges on (user_id, day) AFTER map-side partial dedup —
    on a dense stream (many events per user per day, time-clustered
    files) that first exchange carries far fewer rows than the raw
    corpus; the window MIN then needs a second exchange on user_id,
    but it moves only the DISTINCT (user, day) pairs (users ×
    calendar days — the op's natural output grain). Forcing one
    exchange via repartition(user_id)+distinct would ship every RAW
    row across the wire instead, which loses exactly when streams are
    dense; the per-user flag agg and nothing else ride the second
    exchange, and the final cohort rollup shuffles day-cardinality
    rows. No join, no date types, no collect_set."""
    e = (
        table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "user_id",
            # integer DIV (truncating, = DuckDB //), never double
            # division: the µs key is near 2^53 where a double
            # quotient can misround a day boundary
            F.expr(f"unix_micros(ts) DIV {_US_PER_DAY}").alias("day"),
        )
        .distinct()
    )
    w = e.withColumn(
        "cohort_day", F.min("day").over(Window.partitionBy("user_id"))
    )
    u = w.groupBy("user_id", "cohort_day").agg(
        F.max(
            F.when(F.col("day") == F.col("cohort_day") + 1, 1).otherwise(0)
        ).alias("r1"),
        F.max(
            F.when(F.col("day") == F.col("cohort_day") + 7, 1).otherwise(0)
        ).alias("r7"),
    )
    return (
        u.groupBy("cohort_day")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("r1").cast("bigint").alias("retained_d1"),
            F.sum("r7").cast("bigint").alias("retained_d7"),
        )
        .orderBy("cohort_day")
    )


def funnel_user_times(events: DataFrame) -> DataFrame:
    """Per-user strict first-touch stage times (user_id, t1, t2, t3 as
    epoch µs, NULL where the user never reached the stage) — the
    library half the rollup and any cohort analysis share.

    t_k+1 = earliest stage-(k+1)-typed event strictly after t_k; the
    "strictly after" tests are window MINs over a value-based
    strictly-before RANGE frame on the µs key (tie-deterministic on
    both engines), all sharing one (user_id, us) sort."""
    # non-stage event types can never move a stage min — dropping them
    # before the shuffle (a pushdown-eligible IN filter) is semantics-
    # free and cuts the exchanged volume to funnel events only
    e = events.where(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isin(list(FUNNEL_STAGES))
    ).select("user_id", "event_type", F.unix_micros("ts").alias("us"))
    before = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    view_us = F.when(F.col("event_type") == FUNNEL_STAGES[0], F.col("us"))
    w = e.withColumn("view_before", F.min(view_us).over(before))
    click_us = F.when(
        (F.col("event_type") == FUNNEL_STAGES[1])
        & F.col("view_before").isNotNull(),
        F.col("us"),
    )
    w2 = w.withColumn("click_before", F.min(click_us).over(before))
    purchase_us = F.when(
        (F.col("event_type") == FUNNEL_STAGES[2])
        & F.col("click_before").isNotNull(),
        F.col("us"),
    )
    return w2.groupBy("user_id").agg(
        F.min(view_us).alias("t1"),
        F.min(click_us).alias("t2"),
        F.min(purchase_us).alias("t3"),
    )


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The staged conversion rollup: per funnel stage, how many users
    reached it IN ORDER and the total/average wait from the previous
    stage (exact BIGINT µs; FLOOR-division average). Library op;
    oracle EVENT_FUNNEL_SQL. Stages with zero users are omitted (their
    average is undefined). See the module docstring for the one-shuffle
    no-join plan shape."""
    u = funnel_user_times(table(spark, sf_dir, "events"))
    # ONE aggregate pass produces every stage's count and wait sum
    # (three u.agg() calls would scan the corpus three times); the
    # single row then unpivots via stack — driver-sized from here on
    totals = u.agg(
        F.count("t1").alias("n1"),
        F.count("t2").alias("n2"),
        F.count("t3").alias("n3"),
        F.coalesce(F.sum(F.col("t2") - F.col("t1")), F.lit(0))
        .cast("bigint").alias("s2"),
        F.coalesce(F.sum(F.col("t3") - F.col("t2")), F.lit(0))
        .cast("bigint").alias("s3"),
    )
    stages = totals.select(
        F.expr(
            f"stack(3, '{FUNNEL_STAGES[0]}', 1, n1, CAST(0 AS BIGINT), "
            f"'{FUNNEL_STAGES[1]}', 2, n2, s2, "
            f"'{FUNNEL_STAGES[2]}', 3, n3, s3) "
            "AS (stage, stage_idx, n_users, sum_wait_us)"
        )
    )
    return (
        stages.where(F.col("n_users") > 0)
        .select(
            "stage",
            F.col("stage_idx").cast("int").alias("stage_idx"),
            "n_users", "sum_wait_us",
            F.expr("sum_wait_us DIV n_users").alias("avg_wait_us"),
        )
        .orderBy("stage_idx")
    )
