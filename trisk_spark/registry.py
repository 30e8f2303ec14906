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


def load_all() -> dict[str, QueryDef]:
    """Import every operator module so all queries self-register.

    Order matters for the correctness driver: cheap, previously-dropped
    modules (multimodal — absent from CORRECTNESS_r01 because the run
    truncated) register BEFORE the expensive dedup/similarity blocks so a
    budget-limited driver run records them first.
    """
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

    return REGISTRY
