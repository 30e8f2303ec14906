"""Word count (SURVEY.md §2B WC/WC2): tokenize → per-word counts.

Reference: flinkapp/WordCount.java:68-72 (stateless flatMap+keyBy+sum),
flinkapp/wordcount/StatefulWordCount.java:50-66,102-135 (ReducingState
running count — streaming variant in trisk_spark.streaming),
flinkapp/wordcount/TwoInputsWordCount.java:50-54,84-93 (connect/co-flatMap
two sources → union then count).

Batch input: the ``documents`` table's ``text`` column (space-separated
words, FIXTURES.md §5). Plan: split+explode stay in whole-stage codegen;
one shuffle for the groupBy with map-side partial aggregation — the
canonical scalable word count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from trisk_spark.catalog import table
from trisk_spark.registry import register

WORDCOUNT_SQL = """
SELECT w AS word, COUNT(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
WHERE w <> ''
GROUP BY w
"""


@register("wordcount", oracle=WORDCOUNT_SQL)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-word counts over all documents (WordCount.java:68-72)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


TWO_INPUT_WORDCOUNT_SQL = """
SELECT w AS word, COUNT(*) AS cnt
FROM (
  SELECT unnest(string_split(text, ' ')) AS w
  FROM (
    SELECT text FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT text FROM documents WHERE doc_id % 2 = 1
  )
)
WHERE w <> ''
GROUP BY w
"""


@register("wordcount_two_input", oracle=TWO_INPUT_WORDCOUNT_SQL)
def wordcount_two_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-source word count: `connect` + CoFlatMap ≡ union of two
    tokenized streams into one shared count
    (TwoInputsWordCount.java:50-54,84-93). Modeled as two disjoint
    document sources unioned before the aggregate."""
    docs = table(spark, sf_dir, "documents")
    src_a = docs.where(F.col("doc_id") % 2 == 0).select("text")
    src_b = docs.where(F.col("doc_id") % 2 == 1).select("text")
    both = src_a.unionByName(src_b)
    return (
        both.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
