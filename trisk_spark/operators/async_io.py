"""Async I/O operator: AsyncDataStream.orderedWait/unorderedWait
(AsyncDataStream.java:103-169; fn iface AsyncFunction.java:77).

The reference fires one async request per record with a capacity bound
and emits results in arrival or record order. Spark image: an Arrow
batch is the natural async scope — ``mapInPandas`` runs one event loop
per batch, issues all requests concurrently under a semaphore
(capacity), and yields results in record order (orderedWait) — batch
boundaries give the same bounded-in-flight guarantee the reference's
queue does.

Scale: the event loop lives inside the Python worker; concurrency is
per-batch (capacity × partitions in flight cluster-wide). External
calls would be aiohttp/grpc-aio; here the demo service is a
deterministic in-process lookup so the op is oracle-checkable.
"""

from __future__ import annotations

import asyncio
from collections.abc import Awaitable, Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from trisk_spark.catalog import table
from trisk_spark.registry import register

CAPACITY = 64  # max in-flight requests per batch (orderedWait capacity)


def async_ordered_wait(
    df: DataFrame,
    request: Callable[[dict], Awaitable[dict]],
    out_schema: StructType,
    capacity: int = CAPACITY,
) -> DataFrame:
    """Per-record async enrichment, record order preserved."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        async def run_batch(rows: list[dict]) -> list[dict]:
            sem = asyncio.Semaphore(capacity)

            async def one(row: dict) -> dict:
                async with sem:
                    return await request(row)

            return list(await asyncio.gather(*(one(r) for r in rows)))

        for pdf in batches:
            results = asyncio.run(run_batch(pdf.to_dict("records")))
            yield pd.DataFrame(results, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(kernel, out_schema)


# Demo service: deterministic "remote" category lookup. A real
# deployment swaps this for an aiohttp/grpc call; the await point and
# concurrency structure are identical.
_CATEGORIES = {"click": "engagement", "view": "engagement", "purchase": "revenue",
               "signup": "growth", "refund": "revenue"}


async def _fake_lookup(row: dict) -> dict:
    await asyncio.sleep(0)  # yield point — a real call awaits the network here
    return {
        "event_id": row["event_id"],
        "event_type": row["event_type"],
        "category": _CATEGORIES.get(row["event_type"], "other"),
    }


_ENRICH_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("category", StringType()),
    ]
)

ASYNC_ENRICH_SQL = """
SELECT event_id, event_type,
  CASE event_type
    WHEN 'click' THEN 'engagement'
    WHEN 'view' THEN 'engagement'
    WHEN 'purchase' THEN 'revenue'
    WHEN 'signup' THEN 'growth'
    WHEN 'refund' THEN 'revenue'
    ELSE 'other'
  END AS category
FROM events
"""


@register("async_enrich", oracle=ASYNC_ENRICH_SQL)
def async_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Async enrichment of the events stream via orderedWait semantics
    (one concurrent request per record, capacity-bounded, record order
    kept). The demo service is a pure function so DuckDB can oracle the
    result; the asyncio plumbing is the real pattern."""
    ev = table(spark, sf_dir, "events").select("event_id", "event_type")
    return async_ordered_wait(ev, _fake_lookup, _ENRICH_SCHEMA)
