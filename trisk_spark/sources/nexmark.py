"""Nexmark-shaped views derived deterministically from the ``events``
table (FIXTURES.md §1-3; reference model classes at
examples/.../Nexmark/sources/generator/model/{Bid,Auction,Person}Generator.java).

Each view exists twice, guaranteed-identical:
  * a DataFrame builder (Spark side, used by operators), and
  * a SQL CTE string (DuckDB oracle side, spliced into oracle_sql()).

Derivation rules (pure functions of events columns, so both engines agree
bit-for-bit):

  bid:     auction  = event_id % 251   (prime → ~40 bids/auction @sf0.01)
           bidder   = user_id
           price    = round(value*100) :: bigint  (cents, Order.java:33-35 style)
           date_time= ts
  auction: id=event_id, seller=user_id, category=event_id % 10,
           rows where event_type IN ('view','click')
  person:  one row per user seen in 'signup' events; state from a fixed
           10-way CASE so 30% of persons land in OR/ID/CA
           (Query3.java:74 filters state IN ('OR','ID','CA')).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from trisk_spark.numeric import FINITE_CENTS_SQL, finite_cents_col

_CENTS = FINITE_CENTS_SQL.format(v="value")

# ---------------------------------------------------------------- bid --

BID_SQL = f"""
SELECT
  event_id % 251                   AS auction,
  user_id                          AS bidder,
  {_CENTS} AS price,
  ts                               AS date_time,
  props                            AS extra
FROM events
"""


def bids(events: DataFrame) -> DataFrame:
    # non-finite or out-of-range measurements are NULL prices: the ANSI
    # cast is a hard runtime error on BOTH engines for NaN/Inf AND for
    # finite-but-huge values — one poisoned sensor value must not kill
    # the query (shared guard: trisk_spark.numeric.finite_cents_col)
    return events.select(
        (F.col("event_id") % 251).alias("auction"),
        F.col("user_id").alias("bidder"),
        finite_cents_col(F.col("value")).alias("price"),
        F.col("ts").alias("date_time"),
        F.col("props").alias("extra"),
    )


# ------------------------------------------------------------ auction --

AUCTION_SQL = """
SELECT
  event_id        AS id,
  user_id         AS seller,
  event_id % 10   AS category,
  ts              AS date_time
FROM events
WHERE event_type IN ('view', 'click')
"""


def auctions(events: DataFrame) -> DataFrame:
    return events.where(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("id"),
        F.col("user_id").alias("seller"),
        (F.col("event_id") % 10).alias("category"),
        F.col("ts").alias("date_time"),
    )


# ------------------------------------------------------------- person --

_STATES = ["OR", "ID", "CA", "WA", "NY", "TX", "FL", "AZ", "MA", "GA"]

# non-negative modulus on both engines: a negative user_id makes
# `user_id % 10 + 1` hit index 0, where Spark's element_at ERRORS
# (ANSI: indices start at 1) while a CASE..ELSE quietly picked the
# last state; NULL user_id yields NULL state on both (no ELSE arm)
_STATE_CASE_SQL = (
    "CASE ((user_id % 10) + 10) % 10 "
    + " ".join(f"WHEN {i} THEN '{s}'" for i, s in enumerate(_STATES))
    + " END"
)

PERSON_SQL = f"""
SELECT
  user_id                                   AS id,
  CONCAT('name_', CAST(user_id AS VARCHAR)) AS name,
  CONCAT('city_', CAST(user_id % 20 AS VARCHAR)) AS city,
  {_STATE_CASE_SQL}                         AS state,
  MIN(ts)                                   AS date_time
FROM events
WHERE event_type = 'signup'
GROUP BY user_id
"""


def persons(events: DataFrame) -> DataFrame:
    # pmod keeps the index in [1, 10] for negative ids — mirrors
    # _STATE_CASE_SQL's double-modulus (see comment there)
    state = F.element_at(
        F.array(*[F.lit(s) for s in _STATES]),
        (F.pmod(F.col("user_id"), 10) + 1).cast("int"),
    )
    return (
        events.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("date_time"))
        .select(
            F.col("user_id").alias("id"),
            F.concat(F.lit("name_"), F.col("user_id").cast("string")).alias("name"),
            F.concat(F.lit("city_"), (F.col("user_id") % 20).cast("string")).alias("city"),
            state.alias("state"),
            "date_time",
        )
    )
