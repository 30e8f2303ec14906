"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in trisk_spark/ (see SURVEY.md §2 for the operator
inventory they cover); this module is a thin adapter over
``trisk_spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from trisk_spark.registry import load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Uses the stock-exchange matchmaker — the reference's flagship
    stateful workload (StatefulStockExchange.java) — exercising the
    derived-view layer, a keyed shuffle, and an Arrow-batched stateful
    operator in one plan.
    """
    q = load_all()["stock_matchmaker"]
    return q.fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; stateful emit-semantics ops
    (oracle=None) are omitted → driver records a rows-only check and
    tests/ hold their replay-fold oracles."""
    return {
        name: qd.oracle for name, qd in load_all().items() if qd.oracle is not None
    }
