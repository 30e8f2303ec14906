"""The FULL ingest-admission pipeline over the persisted stores — the
one call a 100 TB document firehose runs per wave: quality gate →
text near-dup probe (MinHash dedup store) → semantic near-dup probe
(SRP semantic store) → ADMIT the survivors into BOTH stores so the
next wave dedups against them. The staged funnel report is the
operational record: per document, which gate dropped it (and against
whom) or that it was admitted.

Every stage is an already-gated kernel composed by id-sized
anti-joins — the quality/token floor is the curation manifest's own
expression (``sampling.MANIFEST_MIN_QUALITY`` /
``MANIFEST_MIN_TOKENS`` over ``text.quality_expr``), the probes are
``dedup_store.probe_dedup_store`` (driver-hash-gated through
``dedup_incremental``) and ``semantic_store.probe_semantic_store``
(library-oracle-gated through ``semantic_incremental``), and the
admissions are the append halves whose append ≡ rebuild contracts are
pytest-pinned per store. The composition itself is pinned by
tests/test_admission.py (staged semantics, loop closure across waves,
stream ≡ per-wave images, forced-replay guard) — an end-to-end DuckDB
oracle is deliberately NOT duplicated here: each composed kernel
already carries its own, and the glue is three anti-joins.

Input contract: one (doc_id, source, text, embedding) frame — the
embedding column is the document's parallel embedding (the
``dedup_semantic`` convention: vec_id IS the document id). Documents
whose embedding is NULL/degenerate pass the semantic gate UN-PROBED
(you cannot near-dup-judge what you cannot embed — the gate for those
is the text probe alone) and their vector is simply not admitted to
the semantic store; the embedding-service retry policy is the
caller's.

Reference: the reference has no admission pipeline (beyond-reference
mandate, SURVEY.md §7 step 7); this composes the repo's own stores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from trisk_spark.functions import storefs
from trisk_spark.functions.dedup_store import (
    append_dedup_store,
    probe_dedup_store,
)
from trisk_spark.functions.semantic_store import (
    append_semantic_store,
    probe_semantic_store,
)

#: Funnel stages, in gate order.
STAGES = ("quality", "dup_text", "dup_semantic", "admitted")


def admission_wave(
    spark: SparkSession,
    batch: DataFrame,
    dedup_path: str,
    sem_path: str,
) -> DataFrame:
    """Run one wave through the staged admission funnel and ADMIT the
    survivors into both stores. Returns the funnel report —
    (doc_id, stage, dup_of): stage = 'quality' (failed the manifest
    quality/token floor; dup_of NULL), 'dup_text' (MinHash-store probe
    flagged is_dup; dup_of = the store document), 'dup_semantic'
    (semantic-store probe flagged is_dup on a text-surviving doc;
    dup_of = the store vector), or 'admitted'. The report is
    materialized BEFORE the appends (the ``ingest_wave`` rule: it
    describes the store the wave was judged against, not the store it
    changed). Within-wave duplicates are admitted together this wave
    and collide from the next wave on — the documented batch-boundary
    semantics of every ingest gate here."""
    from trisk_spark.functions.sampling import (
        MANIFEST_MIN_QUALITY,
        MANIFEST_MIN_TOKENS,
    )
    from trisk_spark.functions.text import quality_expr

    base = batch.where(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    ).localCheckpoint()
    ws = F.filter(F.split("text", " "), lambda w: w != "")
    q = base.select(
        "doc_id",
        "text",
        "embedding",
        (
            (F.size(ws) >= MANIFEST_MIN_TOKENS)
            & (
                F.coalesce(quality_expr(F.col("text")), F.lit(0.0))
                >= MANIFEST_MIN_QUALITY
            )
        ).alias("q_ok"),
    )
    s0 = q.where(F.col("q_ok")).localCheckpoint()
    quality_rej = q.where(~F.col("q_ok")).select(
        "doc_id", F.lit("quality").alias("stage"),
        F.lit(None).cast("bigint").alias("dup_of"),
    )

    rep_t = probe_dedup_store(
        spark, s0.select("doc_id", "text"), dedup_path
    ).localCheckpoint()
    flagged_t = rep_t.where(F.col("is_dup")).select("doc_id", "dup_of")
    s1 = s0.join(
        F.broadcast(flagged_t.select("doc_id")), "doc_id", "left_anti"
    ).localCheckpoint()

    rep_s = probe_semantic_store(
        spark,
        s1.select(F.col("doc_id").alias("vec_id"), "embedding"),
        sem_path,
    ).localCheckpoint()
    flagged_s = rep_s.where(F.col("is_dup")).select(
        F.col("vec_id").alias("doc_id"), "dup_of"
    )
    s2 = s1.join(
        F.broadcast(flagged_s.select("doc_id")), "doc_id", "left_anti"
    ).localCheckpoint()

    report = (
        quality_rej
        .unionByName(
            flagged_t.select(
                "doc_id", F.lit("dup_text").alias("stage"), "dup_of"
            )
        )
        .unionByName(
            flagged_s.select(
                "doc_id", F.lit("dup_semantic").alias("stage"), "dup_of"
            )
        )
        .unionByName(
            s2.select(
                "doc_id", F.lit("admitted").alias("stage"),
                F.lit(None).cast("bigint").alias("dup_of"),
            )
        )
        .localCheckpoint()  # judged against the PRE-append stores
    )
    append_dedup_store(spark, s2.select("doc_id", "text"), dedup_path)
    append_semantic_store(
        spark, s2.select(F.col("doc_id").alias("vec_id"), "embedding"), sem_path
    )
    return report


def admission_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    dedup_path: str,
    sem_path: str,
    sink,
):
    """CONTINUOUS admission — ``admission_wave`` per micro-batch, with
    the store-family replay guard: ONE batch-id watermark (persisted
    beside the dedup store, the path that is always written) governs
    the composed admission, written after BOTH appends land; a
    replayed batch ≤ the watermark is skipped entirely. A crash
    between the two appends replays the whole wave — the dedup store's
    documented signature-replay window plus the semantic store's
    vector-replay window, both band-idempotent and both detectable by
    their stats cross-checks. Sink contract as the single-store
    streams: fully materialize inside the call. Returns the
    ``DataStreamWriter`` ready to ``.start()``."""
    storefs.require_rename_fs(dedup_path, "admission_stream")
    storefs.require_rename_fs(sem_path, "admission_stream")

    def fb(batch_df: DataFrame, batch_id: int) -> None:
        wm = storefs.read_ingest_watermark(dedup_path)
        if wm is not None and batch_id <= wm:
            return
        batch_df = batch_df.persist()
        try:
            report = admission_wave(spark, batch_df, dedup_path, sem_path)
            storefs.write_ingest_watermark(dedup_path, batch_id)
            sink(report, batch_id)
        finally:
            batch_df.unpersist()

    return docs_stream.writeStream.outputMode("append").foreachBatch(fb)
