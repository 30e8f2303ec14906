"""Physical distribution operators — the reference's keyBy /
partitionCustom / broadcast / shuffle / rebalance / rescale / forward /
global family (DataStream.java:293-502; SURVEY §2A 'Keying /
partitioning').

In Spark these are not logical operators but exchange strategies; this
module pins each one to its Spark-native form so the capability is
explicit and testable:

| Reference                     | Here                                   |
|-------------------------------|----------------------------------------|
| keyBy(selector)               | ``key_by`` → hash repartition on expr  |
| partitionCustom(partitioner)  | ``partition_custom`` → repartition on a user expression (Catalyst owns the hash); ``partition_custom_exact`` → index-exact placement via an identity-partitioned exchange (the full reference contract) |
| broadcast()                   | ``F.broadcast`` join hint              |
| shuffle()/rebalance()         | ``rebalance`` → round-robin repartition|
| rescale()                     | ``rescale`` → coalesce (no shuffle)    |
| global()                      | ``global_one`` → repartition(1)        |
| forward()                     | the default (no exchange)              |

Key groups: the reference hashes keys into 128 key groups
(KeyGroupRangeAssignment.java:31,48); our controlplane/plan.py keeps the
same 128-group model for reconfiguration bookkeeping, and ``key_group``
exposes the assignment as a column for tests and state re-sharding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: The reference's DEFAULT_LOWER_BOUND_MAX_PARALLELISM (1 << 7).
MAX_PARALLELISM = 128


def key_by(df: DataFrame, *cols: str | Column, n: int | None = None) -> DataFrame:
    """keyBy: hash-partition rows so equal keys are co-located.
    ``n=None`` lets AQE/session config pick the partition count."""
    return df.repartition(n, *cols) if n else df.repartition(*cols)


def partition_custom(df: DataFrame, expr: Column, n: int) -> DataFrame:
    """partitionCustom: distribute by an arbitrary user expression.
    Spark hashes the expression's value — the user controls *grouping*
    (which rows travel together) but not the physical partition index;
    index-level placement is the scheduler's job (same stance as
    assignResources in controlplane/managed.py). For index-exact
    placement use ``partition_custom_exact``."""
    return df.repartition(n, expr)


def partition_custom_exact(df: DataFrame, pid: Column, n: int) -> DataFrame:
    """partitionCustom with INDEX-exact semantics (DataStream.java:352:
    the Partitioner returns the physical partition number): ``pid`` must
    evaluate to an int in [0, n); row r lands in partition pid(r),
    byte-for-byte the reference contract.

    This is the one family member that needs the RDD escape hatch —
    DataFrame repartition always interposes Spark's hash. The rows take
    one exchange with an identity partitioner; schema is preserved.
    Use only when the partition INDEX carries meaning (e.g. mirroring
    the reference's key-group→task deal); otherwise ``partition_custom``
    keeps the plan in Catalyst.

    Contract enforcement (matching the reference, which throws when a
    Partitioner returns an index outside the task range): a NULL pid or
    a pid outside [0, n) raises ValueError inside the partition
    function. Without this, RDD.partitionBy's ``% n`` would silently
    wrap out-of-range indexes and NULL would die as an opaque
    ``int(None)`` TypeError deep in the worker."""
    if n <= 0:
        raise ValueError(f"partition_custom_exact: n must be positive, got {n}")
    pid_col = "__trisk_pid"
    tagged = df.withColumn(pid_col, pid.cast("int"))
    schema = df.schema

    def _exact_index(k):
        if k is None:
            raise ValueError(
                "partition_custom_exact: partitioner returned NULL "
                "(reference Partitioner contract: an int in [0, n))"
            )
        k = int(k)
        if not 0 <= k < n:
            raise ValueError(
                f"partition_custom_exact: partition index {k} outside "
                f"[0, {n}) (reference Partitioner contract — refusing "
                "to wrap modulo-n)"
            )
        return k

    shuffled = (
        tagged.rdd.map(lambda r: (r[pid_col], r))
        .partitionBy(n, _exact_index)
        .map(lambda kv: kv[1])
    )
    out = df.sparkSession.createDataFrame(shuffled, tagged.schema)
    return out.drop(pid_col) if schema != tagged.schema else out


def key_group(key: Column) -> Column:
    """The reference's key→key-group assignment shape: a stable hash
    into MAX_PARALLELISM groups (non-negative)."""
    return F.pmod(F.hash(key), F.lit(MAX_PARALLELISM))


def rebalance(df: DataFrame, n: int) -> DataFrame:
    """shuffle()/rebalance(): round-robin redistribute to n partitions —
    breaks skew at the cost of one full exchange."""
    return df.repartition(n)


def rescale(df: DataFrame, n: int) -> DataFrame:
    """rescale(): reduce partition count without a shuffle (each output
    partition absorbs whole input partitions — Spark's coalesce)."""
    return df.coalesce(n)


def global_one(df: DataFrame) -> DataFrame:
    """global(): send everything to a single partition."""
    return df.repartition(1)
