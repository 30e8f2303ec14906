"""Relational core: joins, aggregations, window functions, rollups over
the driver's TPC-H-ish tables.

The reference has no SQL path (SURVEY.md §2A "explicit absences") — its
relational power is keyBy + windowed/keyed aggregates + windowed joins.
This module (a) exercises those primitives in batch form over real
tables and (b) claims the Spark-native superset (sort/limit/top-k,
rollup, multi-way joins) that the reference lacks.

Float-parity convention (see registry docstring): aggregate double
columns as DECIMAL(18,4) (exact, order-insensitive), then round and cast
back to DOUBLE identically in Spark and DuckDB.

Scale notes: all joins here either broadcast a dimension (nation,
region, supplier, customer at 1/10th lineitem cardinality) or join on
the natural key with AQE handling skew; aggregations are partial+final.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from trisk_spark.catalog import table
from trisk_spark.registry import register


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-insensitive exact sum of a double column: sum as decimal,
    round, cast back to double. Mirrors the SQL oracle expression
    CAST(ROUND(SUM(CAST(x AS DECIMAL(18,4))), s) AS DOUBLE)."""
    return F.round(F.sum(col.cast("decimal(18,4)")), scale).cast("double")


def davg(col: Column, scale: int = 4) -> Column:
    """Deterministic average: exact decimal sum → double division → round."""
    return F.round(
        F.sum(col.cast("decimal(18,4)")).cast("double") / F.count(col), scale
    ).cast("double")


_REVENUE = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))"

# ------------------------------------------------------------ TPC-H Q1 --

TPCH_Q1_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM({_REVENUE}), 2) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS DOUBLE) AS avg_qty,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-01-25 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("tpch_q1", oracle=TPCH_Q1_SQL)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: grouped sums/averages over lineitem.
    Plan: scan with pushed filter + partial agg map-side, single shuffle
    on the 2-value grouping key."""
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2024-01-25 00:00:00").cast("timestamp")
    )
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity")).alias("sum_qty"),
        dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        F.round(F.sum(revenue), 2).cast("double").alias("sum_disc_price"),
        F.round(
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
            / F.count("*"),
            4,
        )
        .cast("double")
        .alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


# ------------------------------------------------------------ TPC-H Q3 --

TPCH_Q3_SQL = f"""
SELECT
  l.l_orderkey AS orderkey,
  CAST(ROUND(SUM({_REVENUE.replace('l_', 'l.l_')}), 2) AS DOUBLE) AS revenue,
  o.o_orderdate AS orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, orderkey
LIMIT 10
"""


@register("tpch_q3", oracle=TPCH_Q3_SQL)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: top-10 highest-revenue BUILDING-segment orders.
    Plan: customer is the small side → broadcast into orders, then join
    lineitem on its natural key; top-k via TakeOrderedAndProject (no full
    sort shuffle)."""
    c = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("l_orderkey").alias("orderkey"), F.col("o_orderdate").alias("orderdate"))
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
        .select("orderkey", "revenue", "orderdate")
        .orderBy(F.desc("revenue"), "orderkey")
        .limit(10)
    )


# ------------------------------------------------------------ TPC-H Q5 --

TPCH_Q5_SQL = f"""
SELECT
  n.n_name AS nation,
  CAST(ROUND(SUM({_REVENUE.replace('l_', 'l.l_')}), 2) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""


@register("tpch_q5", oracle=TPCH_Q5_SQL)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: revenue by nation for one region.
    Plan: region→nation→supplier all broadcast (tiny dims); the only big
    shuffle is lineitem⋈orders on orderkey; final agg on 25 keys."""
    sf = lambda n: table(spark, sf_dir, n)  # noqa: E731
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        sf("lineitem")
        .join(sf("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sf("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(sf("supplier")),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(sf("nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(sf("region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
    )


# ------------------------------------------- keyed aggregates (§2A) --

KEYED_AGG_SQL = """
SELECT
  user_id,
  COUNT(*) AS n_events,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value,
  CAST(MIN(value) AS DOUBLE) AS min_value,
  CAST(MAX(value) AS DOUBLE) AS max_value,
  MAX({'v': value, 'e': event_id}).e AS max_value_event,
  MIN({'v': value, 'e': event_id}).e AS min_value_event
FROM events
GROUP BY user_id
"""


@register("keyed_agg", oracle=KEYED_AGG_SQL)
def keyed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KeyedStream.sum/min/max/minBy/maxBy (KeyedStream.java:731-875;
    used at WordCount.java:72) as one grouped aggregate per user.
    minBy/maxBy are lexicographic struct MIN/MAX so ties on value break
    deterministically by event_id (bare max_by is tie-nondeterministic).
    Plan: partial agg map-side, single shuffle on user_id."""
    ev = table(spark, sf_dir, "events")
    ve = F.struct(F.col("value").alias("v"), F.col("event_id").alias("e"))
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        dsum(F.col("value")).alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.max(ve).getField("e").alias("max_value_event"),
        F.min(ve).getField("e").alias("min_value_event"),
    )


RUNNING_REDUCE_SQL = """
SELECT
  user_id,
  event_id,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4)))
        OVER (PARTITION BY user_id ORDER BY ts
              ROWS UNBOUNDED PRECEDING), 2) AS DOUBLE) AS running_total
FROM events
"""


@register("keyed_running_reduce", oracle=RUNNING_REDUCE_SQL)
def keyed_running_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KeyedStream.reduce (KeyedStream.java:691): the batch image of a
    per-key running reduce is the prefix aggregate in event-time order —
    every intermediate emission the streaming operator would produce.
    Plan: one shuffle + per-partition sort on (user_id, ts)."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum(F.col("value").cast("decimal(18,4)")).over(w), 2)
        .cast("double")
        .alias("running_total"),
    )


# ------------------------------------------------- windowed analytics --

TOP_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
"""


@register("top_orders_per_customer", oracle=TOP_ORDERS_PER_CUSTOMER_SQL)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per customer (top-k per key — absent from
    the reference's DataStream API, claimed as Spark superset).
    Plan: single shuffle on custkey; rank prunes before any join."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


REVENUE_ROLLUP_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(ROUND(SUM({_REVENUE}), 2) AS DOUBLE) AS revenue
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("revenue_rollup", oracle=REVENUE_ROLLUP_SQL)
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup aggregation (grouping sets — absent from the reference,
    Spark superset). Plan: single expand + shuffle."""
    li = table(spark, sf_dir, "lineitem")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(revenue), 2).cast("double").alias("revenue")
    )


# -------------------------------------------------- event-time windows --

TUMBLING_REVENUE_SQL = """
SELECT
  CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
  event_type,
  COUNT(*) AS n,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY CAST(date_trunc('day', ts) AS TIMESTAMP), event_type
"""


@register("tumbling_window_agg", oracle=TUMBLING_REVENUE_SQL)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregate
    (TumblingEventTimeWindows.java:46, used Query8.java:114): daily
    count+sum per event_type. Plan: one shuffle, partial agg map-side."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum(F.col("value")).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )


# ------------------------------------------- semi / anti joins -------
# The reference has NO semi/anti join (SURVEY §2A "Not present" row) —
# Spark superset, pinned here so the capability is tested.

SEMI_JOIN_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_discount > 0.06
  )
GROUP BY o_orderpriority
"""


@register("semi_join_orders", oracle=SEMI_JOIN_SQL)
def semi_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped LEFT SEMI join (EXISTS): priorities of orders
    having at least one deeply-discounted line.

    Plan: the discount filter pushes into the lineitem scan; the semi
    join dedups matches engine-side (no distinct materialization) and
    only orders columns survive; one final single-column shuffle for
    the count."""
    orders = table(spark, sf_dir, "orders")
    disc = table(spark, sf_dir, "lineitem").where(F.col("l_discount") > 0.06)
    return (
        orders.join(disc, orders.o_orderkey == disc.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


CUSTOMERS_NO_ORDERS_SQL = """
SELECT c_nationkey, COUNT(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
"""


@register("customers_without_orders", oracle=CUSTOMERS_NO_ORDERS_SQL)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers that never ordered,
    counted per nation. Anti join streams the probe side; only the
    custkey column of orders is read (column pruning through the anti
    join)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
    )


TPCH_Q6_SQL = """
SELECT CAST(SUM(l_extendedprice * l_discount) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1994-01-01' AND l_shipdate < DATE '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("tpch_q6", oracle=TPCH_Q6_SQL)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting revenue: the canonical pushdown probe —
    every predicate reaches the parquet scan (PushedFilters), only
    3 columns are read, and the single global aggregate needs a
    one-row shuffle. DECIMAL multiply keeps Spark and DuckDB
    bit-identical (both compute exact decimal then cast)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1994-01-01"))
            & (F.col("l_shipdate") < F.lit("1995-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice") * F.col("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )
