"""Raw-corpus ingest readers: JSONL and CSV → the ``documents`` schema,
with the production guardrails a 100 TB text-corpus load needs.

The reference reads text files line-by-line (readTextFile,
StreamExecutionEnvironment.java:1006); at training-data scale the same
capability means schema-enforced JSONL/CSV ingest where malformed
records are CAPTURED, not dropped or fatal:

  * explicit schema (never inferSchema — a second full pass at 100 TB
    and a silent type lottery);
  * PERMISSIVE mode with ``columnNameOfCorruptRecord``: bad lines land
    in a ``_corrupt_record`` column instead of killing the job or
    silently vanishing (mode=DROPMALFORMED loses data; FAILFAST loses
    the job N hours in);
  * ``split_good_and_bad`` routes them to a dead-letter DataFrame —
    the batch image of streaming/sinks.side_output_fanout.

Both readers are directory-friendly (pass a dir of part files) and
parallelize with the file splits; nothing here shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

CORRUPT_COL = "_corrupt_record"

#: documents table schema (TESTDATA.md) + corrupt-record capture column.
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
        StructField(CORRUPT_COL, StringType()),
    ]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines → documents. One JSON object per line; malformed
    lines surface whole in ``_corrupt_record`` with NULL data columns."""
    return (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    """Header CSV → documents. Quoted fields may contain the delimiter
    and escaped quotes; malformed rows land in ``_corrupt_record``."""
    return (
        spark.read.schema(DOCUMENTS_SCHEMA)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("escape", '"')
        .csv(path)
    )


def split_good_and_bad(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Dead-letter routing: (clean documents rows, corrupt raw lines).
    Clean side drops the capture column so downstream operators see the
    exact documents schema. Spark requires caching a PERMISSIVE read
    before filtering on the corrupt column (SPARK-38963); callers that
    split must treat the returned pair as derived from one materialized
    scan — we cache here and it is the caller's job to unpersist."""
    raw = raw.cache()
    good = raw.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = raw.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad
