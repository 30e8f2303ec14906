"""Megaphone dynamic-rules fraud detection (SURVEY.md §2B FD).

Reference: MegaphoneEvaluator.java:90-115 — transactions keyed by a
rule's grouping keys; rules arrive on a broadcast stream; per (rule,
key, window) aggregate compared against the rule's limit → alerts
(rule schema FIXTURES.md §6; accumulators
megaphone/dynamicrules/accumulators/*.java).

Spark-first design: rules are a tiny slowly-changing table → read and
broadcast per batch (streaming: re-read each micro-batch ≡ hot rule
swap without restart — the change-of-logic primitive). The evaluation
plan is built *from* the rule rows: one windowed aggregate per rule,
unioned. Catalyst sees a static plan per rule set; each branch is a
pushed-down scan + single shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from trisk_spark.catalog import table
from trisk_spark.registry import register

TRANSACTIONS_SQL = """
SELECT
  event_id               AS transaction_id,
  ts                     AS event_time,
  user_id                AS payee_id,
  event_id % 37          AS beneficiary_id,
  CAST(value AS DECIMAL(18,2)) AS payment_amount,
  event_type             AS payment_type
FROM events
"""


def transactions(events: DataFrame) -> DataFrame:
    return events.select(
        F.col("event_id").alias("transaction_id"),
        F.col("ts").alias("event_time"),
        F.col("user_id").alias("payee_id"),
        (F.col("event_id") % 37).alias("beneficiary_id"),
        F.col("value").cast("decimal(18,2)").alias("payment_amount"),
        F.col("event_type").alias("payment_type"),
    )


@dataclass(frozen=True)
class Rule:
    """One dynamic rule (RuleParser.java / FIXTURES.md §6)."""

    rule_id: int
    grouping_key: str  # transactions column to key by
    agg_func: str  # SUM | AVG | MIN | MAX | COUNT
    window: str  # tumbling window size, e.g. '1 day'
    limit_op: str  # '>', '>=', '<', '<=', '='
    limit_value: float


#: Default active rule set (deterministic stand-in for the rules stream).
DEFAULT_RULES = [
    Rule(1, "payee_id", "SUM", "1 day", ">", 500.0),
    Rule(2, "beneficiary_id", "COUNT", "1 day", ">", 10),
    Rule(3, "payee_id", "AVG", "1 day", ">", 300.0),
]


def evaluate_rules(txns: DataFrame, rules: list[Rule]) -> DataFrame:
    """Build the union-of-windowed-aggregates plan for a rule set.

    This is the hot-swap point: a new rule list produces a new plan with
    no engine restart (streaming: call inside foreachBatch after
    re-reading the rules table — MegaphoneEvaluator's broadcast state).
    """
    branches = []
    for r in rules:
        agg = {
            "SUM": F.round(F.sum("payment_amount"), 2).cast("double"),
            "AVG": F.round(
                F.sum("payment_amount").cast("double") / F.count("*"), 4
            ).cast("double"),
            "MIN": F.min("payment_amount").cast("double"),
            "MAX": F.max("payment_amount").cast("double"),
            "COUNT": F.count("*").cast("double"),
        }[r.agg_func]
        grouped = (
            txns.groupBy(
                F.window("event_time", r.window).alias("w"),
                F.col(r.grouping_key).cast("string").alias("grouping_key"),
            )
            .agg(agg.alias("agg_value"))
            .select(
                F.lit(r.rule_id).cast("int").alias("rule_id"),
                "grouping_key",
                F.col("w.start").alias("window_start"),
                "agg_value",
            )
        )
        op = {
            ">": F.col("agg_value") > r.limit_value,
            ">=": F.col("agg_value") >= r.limit_value,
            "<": F.col("agg_value") < r.limit_value,
            "<=": F.col("agg_value") <= r.limit_value,
            "=": F.col("agg_value") == r.limit_value,
        }[r.limit_op]
        branches.append(grouped.where(op))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


FRAUD_ALERTS_SQL = f"""
WITH txn AS ({TRANSACTIONS_SQL}),
r1 AS (
  SELECT 1 AS rule_id, CAST(payee_id AS VARCHAR) AS grouping_key,
         CAST(date_trunc('day', event_time) AS TIMESTAMP) AS window_start,
         CAST(ROUND(SUM(payment_amount), 2) AS DOUBLE) AS agg_value
  FROM txn GROUP BY payee_id, CAST(date_trunc('day', event_time) AS TIMESTAMP)
  HAVING CAST(ROUND(SUM(payment_amount), 2) AS DOUBLE) > 500.0
),
r2 AS (
  SELECT 2 AS rule_id, CAST(beneficiary_id AS VARCHAR) AS grouping_key,
         CAST(date_trunc('day', event_time) AS TIMESTAMP) AS window_start,
         CAST(COUNT(*) AS DOUBLE) AS agg_value
  FROM txn GROUP BY beneficiary_id, CAST(date_trunc('day', event_time) AS TIMESTAMP)
  HAVING CAST(COUNT(*) AS DOUBLE) > 10
),
r3 AS (
  SELECT 3 AS rule_id, CAST(payee_id AS VARCHAR) AS grouping_key,
         CAST(date_trunc('day', event_time) AS TIMESTAMP) AS window_start,
         CAST(ROUND(CAST(SUM(payment_amount) AS DOUBLE) / COUNT(*), 4) AS DOUBLE) AS agg_value
  FROM txn GROUP BY payee_id, CAST(date_trunc('day', event_time) AS TIMESTAMP)
  HAVING CAST(ROUND(CAST(SUM(payment_amount) AS DOUBLE) / COUNT(*), 4) AS DOUBLE) > 300.0
)
SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
"""


@register("fraud_alerts", oracle=FRAUD_ALERTS_SQL)
def fraud_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alerts for the default rule set over the transactions view."""
    txns = transactions(table(spark, sf_dir, "events"))
    return evaluate_rules(txns, DEFAULT_RULES)
