"""Regression: driver parquet timestamps may arrive as TIMESTAMP_NTZ.

Round 4 broke when the driver's events.parquet started inferring as
TIMESTAMP_NTZ (isAdjustedToUTC=false + Spark 4's inferTimestampNTZ):
``unix_millis`` rejects NTZ and ``withWatermark`` throws
EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE. The fix is layered — session conf
``spark.sql.parquet.inferTimestampNTZ.enabled=false`` plus a generic
NTZ→TIMESTAMP cast in catalog.table() / replay_stream — so a future
driver drift in either direction cannot re-break event-time queries.
These tests force NTZ inference on and assert the normalization holds.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trisk_spark.catalog import _normalize_timestamps, table
from tests.conftest import SF_DIR

NTZ_CONF = "spark.sql.parquet.inferTimestampNTZ.enabled"


@pytest.fixture()
def ntz_inference(spark):
    """Temporarily re-enable NTZ inference (the round-4 driver state)."""
    prev = spark.conf.get(NTZ_CONF)
    spark.conf.set(NTZ_CONF, "true")
    yield
    spark.conf.set(NTZ_CONF, prev)


def test_raw_read_is_ntz_under_inference(spark, ntz_inference):
    # Sanity: the drifted environment is actually reproduced — without
    # normalization the raw reader yields TIMESTAMP_NTZ.
    raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert dict(raw.dtypes)["ts"] == "timestamp_ntz"


def test_catalog_normalizes_ntz_to_timestamp(spark, ntz_inference):
    ev = table(spark, SF_DIR, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # unix_millis (the continuous/purging trigger path) must resolve.
    row = ev.select(F.unix_millis("ts").alias("ms")).agg(
        F.min("ms").alias("lo"), F.max("ms").alias("hi")
    ).first()
    assert row["lo"] is not None and row["hi"] >= row["lo"]


def test_normalization_is_value_preserving(spark, ntz_inference):
    # Under UTC session TZ, NTZ→TIMESTAMP must not shift epoch values:
    # compare against the naive value reinterpreted as UTC in pandas.
    import pandas as pd

    ev = table(spark, SF_DIR, "events")
    got = ev.select(F.unix_millis(F.min("ts")).alias("ms")).first()["ms"]
    pdf = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["ts"])
    want = int(pdf["ts"].min().tz_localize("UTC").timestamp() * 1000)
    assert got == want


def test_watermark_accepts_normalized_stream(spark, ntz_inference):
    from trisk_spark.streaming.sources import replay_stream

    stream = replay_stream(spark, SF_DIR, "events", n_chunks=2)
    assert dict(stream.dtypes)["ts"] == "timestamp"
    # withWatermark raises EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE at plan
    # time if the event-time column is NTZ — building the plan is the test.
    stream.withWatermark("ts", "10 minutes").groupBy(
        F.window("ts", "1 hour")
    ).count()


def test_normalize_helper_passthrough(spark):
    # Non-NTZ frames pass through unchanged (no extra projection).
    df = spark.range(3).withColumn("ts", F.current_timestamp())
    assert _normalize_timestamps(df) is df
