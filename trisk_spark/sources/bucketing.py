"""Bucketed-table writes: shuffle-free co-located joins for tables
that are joined repeatedly on the same key.

The reference keeps keyed state co-partitioned with its stream
(KeyGroupRangeAssignment.java:48 pins each key to a task), so a
keyed join never re-shuffles a stable side. The Spark-native
equivalent for TABLES is bucketing: ``bucketBy(n, key)`` writes each
file pre-hash-partitioned, the catalog remembers the layout, and a
join of two tables bucketed on the join key with the same bucket
count plans with NO Exchange on either side — at 100 TB that is the
difference between re-shuffling a multi-TB fact table on every
pipeline run and shuffling it once at write time.

Bucketed writes need a catalog table (``saveAsTable``), not a bare
parquet path — the bucket spec lives in the metastore. Plan proof in
tests/test_plans.py::test_bucketed_join_has_no_exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 32,
    sort_by: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed catalog table on ``key``.

    ``sortBy`` additionally sorts within each bucket file so a
    downstream sort-merge join skips its sort too (and range scans on
    the key read sequentially). ``n_buckets`` must match across tables
    that will join — Spark only elides the shuffle when both sides
    agree on (key, n_buckets).
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_by is not None:
        w = w.sortBy(sort_by)
    w.saveAsTable(table_name)


def bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact (a plain
    ``read.parquet`` of the files would lose the layout and re-shuffle)."""
    return spark.table(table_name)
