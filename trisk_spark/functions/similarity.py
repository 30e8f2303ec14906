"""Similarity search over the ``embeddings`` table (array<float>, 64-d):
brute-force cosine top-k (the exactness baseline) and an LSH-bucketed
approximate variant (the scale path).

Float-parity design: cosine computed on *scaled integers* —
``xi = floor(x * 1e6)`` per element — so dot products and norms are
exact BIGINT sums (order-insensitive, identical in Spark and DuckDB);
only the final ``dot / (|a||b|)`` touches floating point, on identical
inputs. ``floor`` avoids round-half mode differences between engines.

Scale notes: brute-force is O(queries × corpus) — fine for a probe set,
and the inner product is a JVM-side higher-order function (no Python).
The LSH variant buckets by hyperplane sign bits so each query compares
against ~corpus/2^bits; at 100 TB one raises the bit count and stores
bucket-partitioned embeddings so the probe is a partition-pruned scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from trisk_spark.catalog import table
from trisk_spark.registry import register

N_PROBES = 5  # query set: vec_id < N_PROBES
TOP_K = 10
SCALE = 1_000_000

# Scaled-integer vector: floor(x * 1e6) per element.
_SCALED_SQL = "list_transform({col}, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
_DOT_SQL = "list_sum(list_transform(list_zip({a}, {b}), s -> s[1] * s[2]))"


def _scaled(col: Column) -> Column:
    return F.transform(col, lambda x: F.floor(x.cast("double") * SCALE).cast("bigint"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("bigint"), lambda acc, v: acc + v
    )


def _with_norm(df: DataFrame, id_col: str, prefix: str) -> DataFrame:
    sv = _scaled(F.col("embedding"))
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        sv.alias(f"{prefix}_vec"),
    ).withColumn(f"{prefix}_norm", _dot(F.col(f"{prefix}_vec"), F.col(f"{prefix}_vec")))


KNN_BRUTE_SQL = f"""
WITH sc AS (
  SELECT vec_id, {_SCALED_SQL.format(col="embedding")} AS vec FROM embeddings
),
n AS (
  SELECT vec_id, vec, {_DOT_SQL.format(a="vec", b="vec")} AS norm FROM sc
),
q AS (SELECT vec_id AS query_id, vec AS qvec, norm AS qnorm FROM n WHERE vec_id < {N_PROBES}),
pairs AS (
  SELECT q.query_id, n.vec_id AS neighbor_id,
    CAST(ROUND(CAST({_DOT_SQL.format(a="qvec", b="vec")} AS DOUBLE)
         / (SQRT(CAST(qnorm AS DOUBLE)) * SQRT(CAST(norm AS DOUBLE))), 6) AS DOUBLE) AS cosine_sim
  FROM q CROSS JOIN n
  WHERE q.query_id <> n.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine_sim,
    ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cosine_sim DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {TOP_K}
"""


@register("knn_bruteforce", oracle=KNN_BRUTE_SQL)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for a probe set against the whole corpus.
    Plan: probe side broadcast (tiny), corpus scanned once; dot product
    is a codegen'd higher-order function; rank prunes to k per query."""
    emb = table(spark, sf_dir, "embeddings")
    n = _with_norm(emb, "vec_id", "n")
    q = (
        n.where(F.col("n_id") < N_PROBES)
        .select(
            F.col("n_id").alias("query_id"),
            F.col("n_vec").alias("qvec"),
            F.col("n_norm").alias("qnorm"),
        )
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(n)
        .where(F.col("query_id") != F.col("n_id"))
        .select(
            "query_id",
            F.col("n_id").alias("neighbor_id"),
            F.round(
                _dot(F.col("qvec"), F.col("n_vec")).cast("double")
                / (
                    F.sqrt(F.col("qnorm").cast("double"))
                    * F.sqrt(F.col("n_norm").cast("double"))
                ),
                6,
            ).alias("cosine_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
    )


# -------------------------------------------- LSH-bucketed ANN -------

N_SIGN_BITS = 4  # bucket = sign bits of the first 4 dimensions

_BUCKET_SQL = " + ".join(
    f"(CASE WHEN {{col}}[{i + 1}] >= 0 THEN {1 << (N_SIGN_BITS - 1 - i)} ELSE 0 END)"
    for i in range(N_SIGN_BITS)
)


def _bucket(col: Column) -> Column:
    out = F.lit(0)
    for i in range(N_SIGN_BITS):
        out = out + F.when(
            F.element_at(col, i + 1) >= 0, F.lit(1 << (N_SIGN_BITS - 1 - i))
        ).otherwise(0)
    return out


ANN_LSH_SQL = f"""
WITH sc AS (
  SELECT vec_id, {_SCALED_SQL.format(col="embedding")} AS vec,
         {_BUCKET_SQL.format(col="embedding")} AS bucket
  FROM embeddings
),
n AS (
  SELECT vec_id, vec, bucket, {_DOT_SQL.format(a="vec", b="vec")} AS norm FROM sc
),
q AS (SELECT vec_id AS query_id, vec AS qvec, bucket AS qbucket, norm AS qnorm
      FROM n WHERE vec_id < {N_PROBES}),
pairs AS (
  SELECT q.query_id, n.vec_id AS neighbor_id,
    CAST(ROUND(CAST({_DOT_SQL.format(a="qvec", b="vec")} AS DOUBLE)
         / (SQRT(CAST(qnorm AS DOUBLE)) * SQRT(CAST(norm AS DOUBLE))), 6) AS DOUBLE) AS cosine_sim
  FROM q JOIN n ON q.qbucket = n.bucket
  WHERE q.query_id <> n.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine_sim,
    ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cosine_sim DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {TOP_K}
"""


@register("ann_lsh_bucketed", oracle=ANN_LSH_SQL)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: compare only within the query's sign-bit
    bucket (~1/16th of the corpus). Same scoring as knn_bruteforce —
    recall traded for a 2^bits candidate reduction. Plan: equi-join on
    bucket id instead of a cross join; at scale, bucket becomes a
    partition column → partition-pruned probes."""
    emb = table(spark, sf_dir, "embeddings")
    sc = emb.select(
        "vec_id",
        _scaled(F.col("embedding")).alias("vec"),
        _bucket(F.col("embedding")).alias("bucket"),
    )
    n = sc.withColumn("norm", _dot(F.col("vec"), F.col("vec")))
    q = n.where(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("bucket").alias("qbucket"),
        F.col("norm").alias("qnorm"),
    )
    pairs = (
        F.broadcast(q)
        .join(n, F.col("qbucket") == F.col("bucket"))
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _dot(F.col("qvec"), F.col("vec")).cast("double")
                / (
                    F.sqrt(F.col("qnorm").cast("double"))
                    * F.sqrt(F.col("norm").cast("double"))
                ),
                6,
            ).alias("cosine_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
    )
