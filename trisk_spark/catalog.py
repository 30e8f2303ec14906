"""Table catalog: load the driver's parquet tables and register views.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``{sf_dir}/{name}.parquet``.

At 100 TB these would be partitioned parquet/Delta directories; the
loading path is identical (``spark.read.parquet`` on a directory) and
all downstream code only sees DataFrames, so nothing else changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to plain TIMESTAMP. The session
    time zone is pinned UTC (session.RUNTIME_CONFS), so naive-as-UTC
    values are preserved bit-for-bit and DuckDB oracle parity holds.
    Casts on top of a scan stay inside the same projection, so column
    pruning / predicate pushdown still reach the parquet reader."""
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one base table. Column pruning + predicate pushdown reach the
    parquet scan because we return the raw reader output (no caching,
    no materialization barrier)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read via nanosAsLong → truncate to micros,
        # matching DuckDB's ns→µs read-time truncation.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return _normalize_timestamps(df)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every base table as a temp view for spark.sql() use."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
