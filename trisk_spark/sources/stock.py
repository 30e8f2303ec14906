"""SSE stock-order view derived from ``events`` (FIXTURES.md §4;
reference field layout stock/Order.java:13-21 and
stock/sources/SSERealRateSourceFunctionKV.java:13-20).

Derivation (pure function of events columns — Spark and any oracle
agree):
  order_no        = event_id
  sec_code        = 'SEC' || (user_id % 50)     (partition key, skew-able)
  trade_dir       = 'B' if event_id % 2 = 0 else 'S'
  price_cents     = round(value*100) :: bigint  (Order.java:33-35 stores
                                                 int cents = price*100)
  order_vol       = (event_id % 10 + 1) * 100
  tran_maint_code = 'D' for every 20th order (cancel rows, ~5%,
                    filtered out per StatefulStockExchange.java:37-39)
  seq             = event_id                    (global fold order)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from trisk_spark.numeric import FINITE_CENTS_SQL, finite_cents_col

_CENTS = FINITE_CENTS_SQL.format(v="value")

STOCK_ORDER_SQL = f"""
SELECT
  event_id                                    AS order_no,
  CONCAT('SEC', CAST(user_id % 50 AS VARCHAR)) AS sec_code,
  CASE WHEN event_id % 2 = 0 THEN 'B' ELSE 'S' END AS trade_dir,
  {_CENTS}                                    AS price_cents,
  (event_id % 10 + 1) * 100                   AS order_vol,
  CASE WHEN event_id % 20 = 19 THEN 'D' ELSE 'A' END AS tran_maint_code,
  ts                                          AS event_ts,
  event_id                                    AS seq
FROM events
"""


def stock_orders(events: DataFrame) -> DataFrame:
    return events.select(
        F.col("event_id").alias("order_no"),
        F.concat(F.lit("SEC"), (F.col("user_id") % 50).cast("string")).alias(
            "sec_code"
        ),
        F.when(F.col("event_id") % 2 == 0, "B").otherwise("S").alias("trade_dir"),
        # non-finite/out-of-range -> NULL (shared ANSI-safe guard)
        finite_cents_col(F.col("value")).alias("price_cents"),
        ((F.col("event_id") % 10 + 1) * 100).alias("order_vol"),
        F.when(F.col("event_id") % 20 == 19, "D").otherwise("A").alias(
            "tran_maint_code"
        ),
        F.col("ts").alias("event_ts"),
        F.col("event_id").alias("seq"),
    )
