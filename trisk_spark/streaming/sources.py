"""Streaming sources.

Reference source surface (SURVEY.md §2A Sources):
  * rate-controlled generators (RateControlledSourceFunction.java:27-37,
    BidSourceFunction.java) → `rate` source + deterministic column
    synthesis (`synthesized_bids`);
  * file replay with pacing (SSERealRateSourceFunctionKV.java:29+) →
    file stream over chunked parquet (`replay_stream`) — pacing becomes
    maxFilesPerTrigger;
  * Kafka w/ offsets-on-checkpoint (StatefulStockExchange.java:68-72) →
    `kafka_stream` (config builder; no broker in the test env);
  * socketTextStream → `format("socket")` (builder only).

The replay harness is also the stream≡batch equivalence test rig: a
bounded stream whose union of micro-batches is exactly the batch table.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from trisk_spark.catalog import table


def replay_stream(
    spark: SparkSession,
    sf_dir: str,
    name: str = "events",
    n_chunks: int = 8,
    order_col: str = "ts",
    files_per_trigger: int = 1,
) -> DataFrame:
    """Bounded replay: chunk a batch table into ``n_chunks`` files in
    ``order_col`` order and read them back as a file stream, one file
    per micro-batch — the Spark image of the reference's file-replay
    source (event-time order across batches, like a paced re-play)."""
    src = table(spark, sf_dir, name).orderBy(order_col)
    out_dir = tempfile.mkdtemp(prefix=f"trisk-replay-{name}-")
    # repartitionByRange keeps event-time order across chunk files.
    src.repartitionByRange(n_chunks, F.col(order_col)).write.mode(
        "overwrite"
    ).parquet(out_dir)
    # FileStreamSource picks files oldest-mtime-first; all chunks were
    # just written with ~equal mtimes, so stamp strictly increasing
    # mtimes in range (= event-time) order or the replay would be
    # arbitrarily shuffled and watermarks would drop "late" chunks.
    parts = sorted(
        f for f in os.listdir(out_dir) if f.startswith("part-") and f.endswith(".parquet")
    )
    now = int(os.path.getmtime(out_dir))
    for i, fname in enumerate(parts):
        path = os.path.join(out_dir, fname)
        os.utime(path, times=(now + i * 10, now + i * 10))
    schema = spark.read.parquet(out_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(out_dir)
    )
    # Guard against TIMESTAMP_NTZ inference on the re-read (driver
    # environments differ): withWatermark() requires plain TIMESTAMP.
    # Session TZ is pinned UTC, so the cast is value-preserving.
    from trisk_spark.catalog import _normalize_timestamps

    return _normalize_timestamps(stream)


def synthesized_bids(spark: SparkSession, rows_per_second: int = 10_000) -> DataFrame:
    """Rate-controlled bid generator: the reference's
    BidSourceFunction (rate + warm-up ctor) as a `rate` source with
    deterministic column synthesis — same bid schema as
    sources/nexmark.py so every §2B query runs on it unchanged."""
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    ).load()
    return rate.select(
        (F.col("value") % 251).alias("auction"),
        (F.col("value") % 150).alias("bidder"),
        (F.col("value") * 89 % 49002 + 1).alias("price"),
        F.col("timestamp").alias("date_time"),
        F.lit("").alias("extra"),
    )


def socket_text_stream(spark: SparkSession, host: str, port: int) -> DataFrame:
    """socketTextStream (StreamExecutionEnvironment.java:1312): one
    ``value: string`` column per line. Like the reference, a debugging
    source — not replayable, so no exactly-once (Spark marks the socket
    source unreliable for production the same way)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka source builder (FlinkKafkaConsumer011 equivalent;
    offsets ride Spark's checkpoint exactly like the reference's
    offsets-on-checkpoint). Untestable in this environment — config
    surface only."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def checkpoint_dir(tag: str) -> str:
    """Fresh checkpoint location (exactly-once restart point —
    Query8.java:71-72's enableCheckpointing equivalent)."""
    base = os.environ.get("TRISK_CHECKPOINT_BASE", tempfile.gettempdir())
    return tempfile.mkdtemp(prefix=f"trisk-ckpt-{tag}-", dir=base)
