"""Queryable state, streaming count windows, side outputs, late-data
capture — the §2A rows beyond the core streaming suite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trisk_spark.catalog import table
from trisk_spark.operators.multistream import COUNT_WINDOW_N as BATCH_N
from trisk_spark.operators.multistream import count_window as count_window_batch
from trisk_spark.streaming.queryable import lookup_key, read_keyed_state
from trisk_spark.streaming.sinks import side_output_fanout, with_late_data_capture
from trisk_spark.streaming.sources import checkpoint_dir, replay_stream
from trisk_spark.streaming.state import COUNT_WINDOW_N, count_window_stream

SF = "/root/testdata/sf0.001"


def test_count_window_stream_equals_batch(spark):
    assert COUNT_WINDOW_N == BATCH_N  # same trigger size both forms
    stream = replay_stream(spark, SF, "events", n_chunks=6)
    out = count_window_stream(stream.select("user_id", "ts", "event_id", "value"))
    emitted = []

    def collect(bdf, bid):
        emitted.extend(bdf.collect())

    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(collect)
        .option("checkpointLocation", checkpoint_dir("cw"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.user_id, r.win): (r.n, r.total_cents) for r in emitted}
    assert len(got) == len(emitted), "window fired twice"

    want = {
        (r.user_id, r.win): (r.n, int(round(r.total_value * 100)))
        for r in count_window_batch(spark, SF).collect()
    }
    assert got == want
    assert want, "no complete windows in fixture — vacuous"


def test_queryable_state_reads_running_counts(spark):
    stream = replay_stream(spark, SF, "events", n_chunks=2)
    agg = stream.groupBy("event_type").agg(F.count("*").alias("cnt"))
    ckpt = checkpoint_dir("qs")
    q = (
        agg.writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    state = read_keyed_state(spark, ckpt)
    # value struct holds the aggregation BUFFER with internal field
    # names (e.g. `count`), not output aliases — read positionally.
    got = {r["key"]["event_type"]: r["value"][0] for r in state.collect()}
    want = {
        r.event_type: r.cnt
        for r in table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == want

    k = next(iter(want))
    point = lookup_key(spark, ckpt, "event_type", k).collect()
    assert len(point) == 1 and point[0][1] == want[k]


def test_side_output_fanout_routes_and_main(spark):
    stream = replay_stream(spark, SF, "events", n_chunks=2)
    buckets: dict[str, list] = {}

    def sink(tag, bdf, bid):
        buckets.setdefault(tag, []).extend(r.event_id for r in bdf.collect())

    q = side_output_fanout(
        stream,
        {
            "clicks": F.col("event_type") == "click",
            "purchases": F.col("event_type") == "purchase",
        },
        sink,
        checkpoint_dir("fanout"),
    ).trigger(availableNow=True).start()
    q.awaitTermination()

    ev = table(spark, SF, "events")
    by_type = {
        t: sorted(
            r.event_id for r in ev.where(F.col("event_type") == t).collect()
        )
        for t in ("click", "purchase")
    }
    assert sorted(buckets["clicks"]) == by_type["click"]
    assert sorted(buckets["purchases"]) == by_type["purchase"]
    n_total = ev.count()
    assert len(buckets["main"]) == n_total - len(by_type["click"]) - len(
        by_type["purchase"]
    )


def test_late_data_capture_dead_letters_out_of_order_rows(spark):
    # Craft a stream with one late chunk: order events descending so
    # later files carry older timestamps than the watermark.
    ev = table(spark, SF, "events").orderBy(F.desc("ts")).limit(200)
    import tempfile, os, time

    out_dir = tempfile.mkdtemp(prefix="late-src-")
    ev.withColumn("inv", -F.col("event_id")).orderBy(F.desc("ts")).coalesce(
        1
    ).write.mode("overwrite").parquet(out_dir)
    # split manually: chunk1 = newest half, chunk2 = oldest half (late)
    df = spark.read.parquet(out_dir)
    newest = df.orderBy(F.desc("ts")).limit(100)
    oldest = df.orderBy(F.asc("ts")).limit(100)
    src = tempfile.mkdtemp(prefix="late-live-")
    newest.coalesce(1).write.mode("append").parquet(src)
    time.sleep(0.01)
    for f in os.listdir(src):
        if f.startswith("part-"):
            os.utime(os.path.join(src, f), times=(time.time() - 100, time.time() - 100))
    oldest.coalesce(1).write.mode("append").parquet(src)

    late_rows: list = []

    def on_late(bdf, bid):
        late_rows.extend(bdf.collect())

    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = with_late_data_capture(
        stream, "ts", "1 hour", on_late, checkpoint_dir("late")
    ).trigger(availableNow=True).start()
    q.awaitTermination()

    assert late_rows, "no late rows captured — fixture did not produce lateness"
    # every captured row is genuinely > 1h older than the max seen first
    max_ts = newest.agg(F.max("ts")).collect()[0][0]
    import datetime

    for r in late_rows:
        assert r.ts < max_ts - datetime.timedelta(hours=1)


def test_sliding_count_window_stream_equals_batch(spark):
    from trisk_spark.operators.multistream import sliding_count_window
    from trisk_spark.streaming.state import sliding_count_avg_stream

    stream = replay_stream(spark, SF, "events", n_chunks=5)
    out = sliding_count_avg_stream(
        stream.select("user_id", "ts", "event_id", "value")
    )
    emitted = []

    def collect(bdf, bid):
        emitted.extend(bdf.collect())

    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(collect)
        .option("checkpointLocation", checkpoint_dir("slide"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.user_id, r.event_id): r.avg_last_5 for r in emitted}
    assert len(got) == len(emitted), "duplicate per-event emission"

    want = {
        (r.user_id, r.event_id): r.avg_last_5
        for r in sliding_count_window(spark, SF).collect()
    }
    assert got == want


def test_delta_trigger_stream_equals_batch(spark):
    from trisk_spark.operators.multistream import delta_trigger
    from trisk_spark.streaming.state import delta_trigger_stream

    stream = replay_stream(spark, SF, "events", n_chunks=5)
    out = delta_trigger_stream(stream.select("user_id", "ts", "event_id", "value"))
    emitted = []

    def collect(bdf, bid):
        emitted.extend(bdf.collect())

    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(collect)
        .option("checkpointLocation", checkpoint_dir("delta"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.user_id, r.event_id) for r in emitted}
    assert len(got) == len(emitted), "duplicate firing"
    want = {
        (r.user_id, r.event_id) for r in delta_trigger(spark, SF).collect()
    }
    assert got == want


def test_partitioning_operators(spark):
    """Physical-distribution family: co-location, partition counts, and
    key-group stability (SURVEY §2A keying/partitioning rows)."""
    from trisk_spark.operators.partitioning import (
        MAX_PARALLELISM,
        global_one,
        key_by,
        key_group,
        partition_custom,
        rebalance,
        rescale,
    )

    ev = table(spark, SF, "events")

    # keyBy: equal keys land in the same partition
    keyed = key_by(ev, "user_id", n=8)
    assert keyed.rdd.getNumPartitions() == 8
    multi = (
        keyed.select("user_id", F.spark_partition_id().alias("pid"))
        .groupBy("user_id")
        .agg(F.countDistinct("pid").alias("np"))
        .where(F.col("np") > 1)
        .count()
    )
    assert multi == 0, "keyBy split a key across partitions"

    # partitionCustom: user expression controls grouping
    pc = partition_custom(ev, F.col("user_id") % 4, 4)
    assert pc.rdd.getNumPartitions() == 4
    split = (
        pc.select((F.col("user_id") % 4).alias("g"), F.spark_partition_id().alias("pid"))
        .groupBy("g")
        .agg(F.countDistinct("pid").alias("np"))
        .where(F.col("np") > 1)
        .count()
    )
    assert split == 0, "partitionCustom split a group across partitions"

    # rebalance/rescale/global: partition counts
    assert rebalance(ev, 16).rdd.getNumPartitions() == 16
    assert rescale(ev.repartition(8), 2).rdd.getNumPartitions() == 2
    assert global_one(ev).rdd.getNumPartitions() == 1

    # key groups: stable, in range, deterministic across evaluations
    kg = ev.select(key_group(F.col("user_id")).alias("g")).agg(
        F.min("g").alias("lo"), F.max("g").alias("hi")
    ).collect()[0]
    assert 0 <= kg.lo and kg.hi < MAX_PARALLELISM


def test_inactivity_sessions_fire_on_timer(spark, tmp_path):
    """Timers (SURVEY §2A): per-key processing-time timer closes idle
    sessions. A sentinel final batch guarantees every real key's timer
    fires, so conservation must be exact: each user's events are
    counted exactly once across their emitted sessions."""
    import os
    import time

    import duckdb

    from trisk_spark.streaming.state import inactivity_sessions_stream

    con = duckdb.connect()
    want = {
        u: (n, c)
        for u, n, c in con.execute(
            f"""SELECT user_id, COUNT(*),
                   SUM(CAST(ROUND(value * 100) AS BIGINT))
               FROM read_parquet('{SF}/events.parquet') GROUP BY user_id"""
        ).fetchall()
    }
    rows = con.execute(
        f"""SELECT user_id, value FROM read_parquet('{SF}/events.parquet')
            ORDER BY ts, event_id"""
    ).fetchall()

    import pandas as pd_
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "chunks")
    os.makedirs(src)
    n_chunks = 4
    per = (len(rows) + n_chunks - 1) // n_chunks
    t0 = int(time.time())
    for i in range(n_chunks):
        chunk = rows[i * per : (i + 1) * per]
        tbl = pa.Table.from_pandas(
            pd_.DataFrame(chunk, columns=["user_id", "value"]),
            schema=pa.schema([("user_id", pa.int64()), ("value", pa.float64())]),
        )
        p = os.path.join(src, f"chunk-{i}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, times=(t0 + i * 10, t0 + i * 10))
    # sentinel batch: one event for a user id outside the real range —
    # processed last, so every real key is idle and its timer fires
    sent = pa.Table.from_pandas(
        pd_.DataFrame({"user_id": [-1], "value": [0.0]}),
        schema=pa.schema([("user_id", pa.int64()), ("value", pa.float64())]),
    )
    sp = os.path.join(src, "zz-sentinel.parquet")
    pq.write_table(sent, sp)
    os.utime(sp, times=(t0 + n_chunks * 10, t0 + n_chunks * 10))

    stream = (
        spark.readStream.schema("user_id BIGINT, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    emitted = []

    def collect(bdf, bid):
        emitted.extend(bdf.collect())

    # A query with processing-time timers is unbounded by design (it
    # must keep running empty batches so idle keys can fire), so poll
    # until every real user's sessions have closed, then stop.
    q = (
        inactivity_sessions_stream(stream)
        .writeStream.outputMode("append")
        .foreachBatch(collect)
        .option("checkpointLocation", checkpoint_dir("inact"))
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.time() + 240
    while time.time() < deadline:
        closed = {r.user_id for r in emitted}
        closed.discard(-1)
        if closed == set(want):
            break
        if not q.isActive:
            break
        time.sleep(1)
    q.stop()

    got: dict[int, list] = {}
    for r in emitted:
        assert r.closed_by_timeout == "timeout"
        got.setdefault(r.user_id, []).append((r.n_events, r.total_cents))
    got.pop(-1, None)  # sentinel user may or may not have flushed
    assert got, "no timers fired — vacuous"
    for u, sessions in got.items():
        n = sum(s[0] for s in sessions)
        cents = sum(s[1] for s in sessions)
        assert (n, cents) == want[u], f"user {u}: conservation violated"
    assert set(got) == set(want), "some users never closed a session"
