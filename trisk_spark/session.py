"""SparkSession construction and per-session tuning.

Two paths:
  * ``get_spark()`` — build our own session (tests, bench.py).
  * ``prepare(spark)`` — runtime-settable confs applied to a session we
    did not build (the driver passes its own session into
    ``__spark_entry__.entry``/``queries``).

Scale notes (100 TB / 1000 executors): every conf here is also valid on a
real cluster; the only local-mode-specific bits are master and driver
memory. Shuffle partitions default to the core count locally but should
be ~2-3x total cores on a cluster — AQE coalesces the excess, so we set
a generous initial number and let AQE shrink it.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that can be changed on a live session (runtime-settable).
RUNTIME_CONFS: dict[str, str] = {
    # Deterministic timestamp arithmetic: all epoch math assumes UTC so
    # results match the DuckDB oracle (naive timestamps == UTC).
    "spark.sql.session.timeZone": "UTC",
    # AQE re-plans at runtime: coalesces small shuffle partitions,
    # converts SMJ->broadcast when a side turns out small, splits skewed
    # partitions. Essential at 100 TB, harmless locally.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for all pandas UDF / toPandas exchange (10-100x vs pickle).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Session windows / stateful ops need a sane state store locally.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    # events.parquet stores TIMESTAMP(NANOS) which Spark cannot read
    # natively; read as long and convert in catalog.table (DuckDB
    # truncates ns→µs on read, we mirror that exactly).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # The driver's parquet writes timestamps with isAdjustedToUTC=false;
    # Spark 4 infers those as TIMESTAMP_NTZ, which breaks unix_millis()
    # and withWatermark() (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). Read
    # them as plain TIMESTAMP instead — value-preserving because the
    # session time zone is pinned UTC above and the DuckDB oracle also
    # treats naive timestamps as UTC. catalog.table() additionally casts
    # any residual NTZ column for sessions where this conf can't be set.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


_PKG_SHIPPED: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make trisk_spark importable on executor Python workers regardless
    of the driver process's cwd: zip the package and addPyFile it.
    Without this, applyInPandas UDFs that reference module-level
    functions fail to unpickle on workers (ModuleNotFoundError)."""
    key = id(spark)
    if key in _PKG_SHIPPED:
        return
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    base = os.path.join(tempfile.gettempdir(), "trisk_spark_pkg")
    zip_path = shutil.make_archive(base, "zip", os.path.dirname(pkg_dir), "trisk_spark")
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # e.g. Spark Connect session without sparkContext
    _PKG_SHIPPED.add(key)


def prepare(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally-built session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this build; defaults are acceptable
    _ship_package(spark)
    return spark


def get_spark(app_name: str = "trisk-spark") -> SparkSession:
    """Build a tuned local session. Honors SPARK_GRAFT_CPUS (default 32)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", "/tmp/trisk-spark-warehouse")
        # Read-side parallelism: keep file splits small enough that sf0.1
        # parquet still fans out across cores; on a cluster the default
        # 128m is right, so only tests override this.
        .config("spark.sql.files.maxPartitionBytes", "32m")
    )
    spark = builder.getOrCreate()
    return prepare(spark)
