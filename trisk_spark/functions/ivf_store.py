"""Persisted int8 IVF index: the write-time/store half of the ANN
story that ``ann_ivf_int8`` executes in one plan.

At 100 TB the index is not rebuilt per query — it is WRITTEN once
(quantized codes partitioned by IVF list, centroid model beside them)
and every probe reads ONLY its routed lists' partitions. This module
makes that layout a real, tested path:

  * ``write_index``: one fused quantize+assign kernel pass over the
    corpus (``similarity._quantize_assign_gemm`` — zero shuffle), sunk
    as parquet ``partitionBy("list_id")`` with the K-row centroid
    model as a sibling table. The partition column IS the coarse
    quantizer cell, so the store's directory layout mirrors a FAISS
    IVF inverted-list file per cell.
  * ``probe_index``: routes the probe set against the stored centroid
    model, then reads the index with a STATIC ``list_id IN (...)``
    partition filter — Spark prunes the non-probed directories at
    planning time (pinned: the scan's PartitionFilters carry list_id
    and nothing outside the routed lists is read) — and finishes with
    the SAME int8 candidate + exact re-rank stages as ``ann_ivf_int8``
    (shared helpers), so probe-over-store ≡ the one-plan query
    row-for-row (pytest-pinned).

The routed list ids cross the driver as ≤ N_PROBES × N_PROBE_LISTS
integers — a routing decision, the same driver-held-model class as the
centroid collect; corpus rows never reach the driver.

Reference: the reference has no ANN store (beyond-reference mandate,
SURVEY.md §7 step 7); the layout follows the standard IVF inverted-file
design (partition-per-cell) re-expressed as Spark partitioned parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from trisk_spark.catalog import table
from trisk_spark.functions.similarity import (
    _int8_candidates_and_rerank,
    _int8_centroid_model,
    _quantize_assign_gemm,
    _route_probes_int8,
    _valid_embeddings,
)


def write_index(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Build and persist the int8 IVF index for the corpus at
    ``sf_dir``: ``<path>/index`` holds (vec_id, qvec, qnorm) parquet
    partitioned by list_id; ``<path>/centroids`` holds the K-row
    centroid model. One kernel pass over the corpus; the partitioned
    write shuffles nothing (each task writes its rows into per-list
    directories)."""
    emb = _valid_embeddings(table(spark, sf_dir, "embeddings"))
    cq, cn, cids, cents = _int8_centroid_model(spark, emb)
    assign = _quantize_assign_gemm(spark, emb, cq, cn, cids)
    assign.write.mode("overwrite").partitionBy("list_id").parquet(
        f"{path}/index"
    )
    cents.write.mode("overwrite").parquet(f"{path}/centroids")


def probe_index(spark: SparkSession, sf_dir: str, path: str) -> DataFrame:
    """Top-K search over the PERSISTED index: route the probe set
    (vec_id < N_PROBES from ``sf_dir``) against the stored centroids,
    statically prune the index read to the routed lists, and run the
    shared int8-candidate + exact-re-rank stages. Returns the same
    (query_id, neighbor_id, cosine_sim, rank) frame as
    ``ann_ivf_int8``."""
    emb = _valid_embeddings(table(spark, sf_dir, "embeddings"))
    cents = spark.read.parquet(f"{path}/centroids")
    qlists = _route_probes_int8(emb, cents)
    routed = sorted(
        {r.list_id for r in qlists.select("list_id").distinct().collect()}
    )
    index = spark.read.parquet(f"{path}/index").where(
        F.col("list_id").isin([int(x) for x in routed])
    )
    return _int8_candidates_and_rerank(emb, qlists, index)
