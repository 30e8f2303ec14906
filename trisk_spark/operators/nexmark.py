"""Nexmark queries Q1/Q2/Q3/Q5/Q8/Q11 (SURVEY.md §2B), the reference's
benchmark workload (examples/.../Nexmark/queries/Query{1,2,3,5,8,11}.java),
re-expressed as Catalyst-planned DataFrame programs over the derived
``bid``/``auction``/``person`` views (trisk_spark.sources.nexmark).

Scale notes: Q1/Q2 are narrow map/filter pipelines — whole-stage codegen,
no shuffle. Q3/Q8 are joins where the person side is orders of magnitude
smaller (distinct users) → broadcast-able; we hint broadcast so the plan
holds at 100 TB of auctions. Q5/Q11 are windowed aggregations — one
shuffle on (window, key), partial aggregation map-side.

Window sizes are scaled to the driver's data (events span ~30 days at
~14 rows/hour/sf0.01) — the reference uses seconds because its generators
emit thousands/sec; semantics are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from trisk_spark.catalog import table
from trisk_spark.registry import register
from trisk_spark.sources.nexmark import (
    AUCTION_SQL,
    BID_SQL,
    PERSON_SQL,
    auctions,
    bids,
    persons,
)


def _bids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bids(table(spark, sf_dir, "events"))


# ----------------------------------------------------------------- Q1 --

NEXMARK_Q1_SQL = f"""
WITH bid AS ({BID_SQL})
SELECT
  auction,
  CAST(FLOOR(price * 0.82) AS BIGINT) AS price_eur,
  bidder,
  date_time
FROM bid
"""


@register("nexmark_q1", oracle=NEXMARK_Q1_SQL)
def nexmark_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Currency conversion (map-only): dollar→euro price on every bid.

    Reference: Query1.java:61-70 (`dollarToEuro`, price * 0.82 at :83-85).
    Plan: single WholeStageCodegen project over the scan; no shuffle.
    """
    # price * 0.82 must be DECIMAL arithmetic (exact) on both engines: a
    # Python float 0.82 would make Spark compute in double and floor()
    # one-off at exact-integer boundaries (e.g. 4050*0.82).
    return _bids(spark, sf_dir).select(
        "auction",
        F.floor(F.col("price") * F.expr("CAST(0.82 AS DECIMAL(3,2))"))
        .cast("bigint")
        .alias("price_eur"),
        "bidder",
        "date_time",
    )


# ----------------------------------------------------------------- Q2 --

NEXMARK_Q2_SQL = f"""
WITH bid AS ({BID_SQL})
SELECT auction, price
FROM bid
WHERE auction % 13 = 0 OR auction % 17 = 0
"""


@register("nexmark_q2", oracle=NEXMARK_Q2_SQL)
def nexmark_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selection: emit (auction, price) for auctions matching a modulo set.

    Reference: Query2.java:58-67 (auction % k == 0 for k in
    {1007,1020,2001,2019,2087}; moduli rescaled to our auction id space).
    Plan: filter pushed into the scan, no shuffle.
    """
    b = _bids(spark, sf_dir)
    return b.where((F.col("auction") % 13 == 0) | (F.col("auction") % 17 == 0)).select(
        "auction", "price"
    )


# ----------------------------------------------------------------- Q3 --

NEXMARK_Q3_SQL = f"""
WITH auction AS ({AUCTION_SQL}),
     person AS ({PERSON_SQL})
SELECT p.name, p.city, p.state, a.id AS auction_id
FROM auction a
JOIN person p ON a.seller = p.id
WHERE p.state IN ('OR', 'ID', 'CA') AND a.category = 4
"""


@register("nexmark_q3", oracle=NEXMARK_Q3_SQL)
def nexmark_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-item joins: persons in OR/ID/CA selling in category 4.

    Reference: Query3.java:64-97 (filter at :71-77, join keyed on
    person.id = auction.seller). Batch semantics of the incremental join;
    the emit-once streaming variant is `trisk_spark.streaming.state`.
    Plan: person side is tiny (distinct users) → broadcast hash join, no
    shuffle of the auction stream; both filters pushed down.
    """
    ev = table(spark, sf_dir, "events")
    a = auctions(ev).where(F.col("category") == 4)
    p = persons(ev).where(F.col("state").isin("OR", "ID", "CA"))
    return a.join(F.broadcast(p), a.seller == p.id).select(
        "name", "city", "state", a.id.alias("auction_id")
    )


# ----------------------------------------------------------------- Q5 --

# Sliding window: size 2 days, slide 1 day (reference: 2s/1s at
# Query5.java:84 — scaled to data density). Windows align to the unix
# epoch in both engines (UTC session timezone).
_W = 86400  # slide, seconds
_SIZE = 2 * _W

NEXMARK_Q5_SQL = f"""
WITH bid AS ({BID_SQL}),
wb AS (
  SELECT
    make_timestamp(((epoch_us(date_time) // CAST({_W} AS BIGINT) // 1000000) - o.o)
                   * CAST({_W} AS BIGINT) * 1000000) AS window_start,
    auction
  FROM bid, (VALUES (0), (1)) AS o(o)
),
wc AS (
  SELECT window_start, auction, COUNT(*) AS bid_count
  FROM wb GROUP BY window_start, auction
),
mx AS (
  SELECT window_start, MAX(bid_count) AS max_count FROM wc GROUP BY window_start
)
SELECT wc.window_start, wc.auction, wc.bid_count
FROM wc JOIN mx ON wc.window_start = mx.window_start AND wc.bid_count = mx.max_count
"""


@register("nexmark_q5", oracle=NEXMARK_Q5_SQL)
def nexmark_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot items: per sliding window, the auction(s) with the most bids.

    Reference: Query5.java:76-87 (sliding window count, CountBids
    aggregate at :119-143, then max). Plan: one shuffle for the windowed
    count (map-side partial agg), then a window-function max per window —
    no second shuffle of the full data, only of the counts.
    """
    b = _bids(spark, sf_dir)
    wc = (
        b.groupBy(
            F.window("date_time", f"{_SIZE} seconds", f"{_W} seconds").alias("w"),
            "auction",
        )
        .agg(F.count("*").alias("bid_count"))
        .select(F.col("w.start").alias("window_start"), "auction", "bid_count")
    )
    mx = Window.partitionBy("window_start")
    return (
        wc.withColumn("max_count", F.max("bid_count").over(mx))
        .where(F.col("bid_count") == F.col("max_count"))
        .drop("max_count")
    )


# ----------------------------------------------------------------- Q8 --

NEXMARK_Q8_SQL = f"""
WITH auction AS ({AUCTION_SQL}),
     person AS ({PERSON_SQL})
SELECT DISTINCT
  p.id,
  p.name,
  CAST(date_trunc('day', a.date_time) AS TIMESTAMP) AS window_start
FROM person p
JOIN auction a
  ON p.id = a.seller
 AND CAST(date_trunc('day', a.date_time) AS TIMESTAMP) = CAST(date_trunc('day', p.date_time) AS TIMESTAMP)
"""


@register("nexmark_q8", oracle=NEXMARK_Q8_SQL)
def nexmark_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monitor new users: persons who joined and created an auction in the
    same tumbling window (1 day).

    Reference: Query8.java:102-119 (tumbling-window equi-join on
    person.id = auction.seller; 10s window in Query8Ori.java:165 — scaled).
    Plan: broadcast the person side; distinct adds one shuffle of the
    (tiny) join output only.
    """
    ev = table(spark, sf_dir, "events")
    a = auctions(ev).select(
        "seller", F.date_trunc("day", "date_time").alias("window_start")
    )
    p = persons(ev).select(
        "id", "name", F.date_trunc("day", "date_time").alias("p_window")
    )
    return (
        a.join(
            F.broadcast(p),
            (a.seller == p.id) & (a.window_start == p.p_window),
        )
        .select("id", "name", "window_start")
        .distinct()
    )


# ---------------------------------------------------------------- Q11 --

NEXMARK_Q11_SQL = f"""
WITH bid AS (SELECT * FROM ({BID_SQL}) WHERE date_time IS NOT NULL),
flagged AS (
  SELECT bidder, date_time,
    CASE WHEN lag(date_time) OVER (PARTITION BY bidder ORDER BY date_time)
              IS NULL
         OR date_time - lag(date_time) OVER (PARTITION BY bidder ORDER BY date_time)
              > INTERVAL 1 HOUR
         THEN 1 ELSE 0 END AS new_session
  FROM bid
),
sessions AS (
  SELECT bidder, date_time,
    SUM(new_session) OVER (PARTITION BY bidder ORDER BY date_time
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT bidder,
       MIN(date_time) AS session_start,
       COUNT(*) AS bid_count
FROM sessions
GROUP BY bidder, session_id
"""


@register("nexmark_q11", oracle=NEXMARK_Q11_SQL)
def nexmark_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User sessions: bids per bidder session (gap 1 hour).

    Reference: Query11.java:72-80 (EventTimeSessionWindows gap 10s —
    scaled; the custom 100k-event early-fire trigger at :93-144 is a
    streaming emit policy, not a result-set change — documented gap).
    Plan: native session_window — one shuffle on bidder, sessions merged
    in the state-free batch path.
    """
    # no event time → no session, on both engines
    b = _bids(spark, sf_dir).where(F.col("date_time").isNotNull())
    return (
        b.groupBy(F.session_window("date_time", "1 hour").alias("w"), "bidder")
        .agg(F.count("*").alias("bid_count"))
        .select(
            "bidder",
            F.col("w.start").alias("session_start"),
            "bid_count",
        )
    )
