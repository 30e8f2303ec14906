"""Queryable state: external point-reads of a running query's keyed
state.

Reference: KeyedStream.asQueryableState (KeyedStream.java:1005-1072)
exposes ValueState/ReducingState for out-of-band key lookups against
the live job. Spark image: the state-store data source — every
micro-batch commit persists the keyed state; ``statestore`` format
reads it by checkpoint path, so any batch job (or serving layer) can
point-read state without touching the stream. Unlike Flink's RPC
lookup this reads the last *committed* batch — the same staleness
contract as the reference's queryable-state cache.

Scale: state lives in the checkpoint (HDFS/S3/RocksDB); the read is a
partition-parallel scan that prunes to the requested operator/store —
no interaction with, or load on, the running query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_keyed_state(
    spark: SparkSession,
    checkpoint: str,
    *,
    operator_id: int = 0,
    store_name: str = "default",
    batch_id: int | None = None,
) -> DataFrame:
    """Read a query's keyed state as (key struct, value struct,
    partition_id) rows. ``batch_id`` time-travels to an earlier commit
    (default: latest)."""
    r = (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
        .option("storeName", store_name)
    )
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    return r.load(checkpoint)


def lookup_key(
    spark: SparkSession,
    checkpoint: str,
    key_col: str,
    key_value,
    **kw,
) -> DataFrame:
    """Point-read one key — the asQueryableState('name').getKvState(k)
    equivalent: filter pushes into the state scan."""
    df = read_keyed_state(spark, checkpoint, **kw)
    return df.where(F.col(f"key.{key_col}") == F.lit(key_value)).select(
        "key.*", "value.*"
    )
