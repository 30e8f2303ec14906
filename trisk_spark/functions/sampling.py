"""Deterministic corpus splitting/sampling — the pipeline primitives a
100 TB training-data build needs around the dedup/quality ops: stable
hash-based train/val/test assignment (re-runs and backfills land every
document in the same split, no RNG, no state).

Scale design: split assignment is a pure map-side expression over the
scan (zero shuffle — the only exchange in the rollup variant moves one
row per (source, split)). The hash is md5 over the document id, the
same engine-bitwise-identical idiom the dedup shingles use, so the
DuckDB oracle agrees exactly.

Reference has no sampling surface (SURVEY.md §2A) — this module is
part of the beyond-reference training-data mandate, like
functions/dedup.py and functions/multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from trisk_spark.catalog import table
from trisk_spark.registry import register

#: split thresholds over a 0-99 hash bucket: [0,80) train, [80,90) val,
#: [90,100) test — the standard 80/10/10.
TRAIN_PCT, VAL_PCT = 80, 90

_BUCKET_SQL = (
    "CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) "
    "AS BIGINT) % 100"
)


def _bucket(doc_id: Column) -> Column:
    """0-99 bucket from the first 60 bits of md5(doc_id) — identical
    arithmetic on both engines (same idiom as dedup's word hashes)."""
    return (
        F.conv(F.substring(F.md5(doc_id.cast("string")), 1, 15), 16, 10)
        .cast("bigint") % 100
    )


TRAIN_SPLIT_SQL = f"""
SELECT doc_id,
  CASE WHEN {_BUCKET_SQL} < {TRAIN_PCT} THEN 'train'
       WHEN {_BUCKET_SQL} < {VAL_PCT} THEN 'val'
       ELSE 'test' END AS split
FROM documents
"""


@register("train_split", oracle=TRAIN_SPLIT_SQL)
def train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable 80/10/10 train/val/test assignment per document.

    Plan: map-only — one projection over the scan, no shuffle, no RNG
    (rand() would re-split on every retry/backfill; hashing the id is
    the reproducible-pipeline standard). At 100 TB the split column is
    what a writer would partition output by."""
    docs = table(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"))
    return docs.select(
        "doc_id",
        F.when(b < TRAIN_PCT, F.lit("train"))
        .when(b < VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


SPLIT_ROLLUP_SQL = f"""
WITH s AS (
  SELECT source, n_chars,
    CASE WHEN {_BUCKET_SQL} < {TRAIN_PCT} THEN 'train'
         WHEN {_BUCKET_SQL} < {VAL_PCT} THEN 'val'
         ELSE 'test' END AS split
  FROM documents
)
SELECT source, split, COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM s GROUP BY source, split
"""


@register("split_rollup", oracle=SPLIT_ROLLUP_SQL)
def split_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, split) doc and char counts — the leakage/balance
    audit a split ships with (is every source represented in val/test
    at the expected rate?).

    Plan: the split expression stays map-side; ONE shuffle moves only
    (source, split, partial counts) rows with map-side combine."""
    docs = table(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"))
    split = (
        F.when(b < TRAIN_PCT, F.lit("train"))
        .when(b < VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split")
    )
    return (
        docs.select("source", "n_chars", split)
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )
