"""Persisted embedding moment store (functions/gram_store.py):
additivity vs the one-shot corpus pass, stream loop + replay guard,
forced-crash replay repair, compaction invariance, fail-loud paths.
The moment table's own oracle parity lives in test_oracle_parity's
library pass (``embedding_gram``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trisk_spark.catalog import table
from trisk_spark.functions import gram_store as G
from trisk_spark.functions.similarity import DIM, embedding_gram_frame
from trisk_spark.streaming.sources import checkpoint_dir

from .conftest import SF_DIR


def _splits(spark):
    emb = table(spark, SF_DIR, "embeddings").where(F.col("vec_id").isNotNull())
    base = emb.where(F.pmod(F.col("vec_id"), F.lit(3)) == 0)
    w1 = emb.where(F.pmod(F.col("vec_id"), F.lit(3)) == 1)
    w2 = emb.where(F.pmod(F.col("vec_id"), F.lit(3)) == 2)
    return emb, base, w1, w2


def _moments(df):
    return sorted((r.i, r.j, r.g) for r in df.collect())


def test_store_folds_to_one_shot_pass(spark, tmp_path):
    """write(base) + append(w1) + append(w2) must fold to EXACTLY the
    one-shot ``embedding_gram_frame`` over the whole corpus — moments
    are additive and the kernel is deterministic, so this is integer
    equality, not approximation."""
    emb, base, w1, w2 = _splits(spark)
    path = str(tmp_path / "store")
    G.write_gram_store(spark, base, path)
    G.append_gram_store(spark, w1, path, wave_id=0)
    G.append_gram_store(spark, w2, path, wave_id=1)
    assert _moments(G.gram_store_moments(spark, path)) == _moments(
        embedding_gram_frame(emb)
    )
    row = G.gram_store_stats(spark, path).collect()[0]
    assert row.n_waves == 3 and row.n_dup_wave_rows == 0
    assert row.n_rows == 3 * (DIM * (DIM + 1) // 2 + DIM + 1)

    # the fitted basis over the store equals the one-shot fit
    import numpy as np

    from trisk_spark.functions.similarity import pca_from_gram_rows

    c_store, v_store, m_store = G.pca_model_over_store(spark, path, k=4)
    c_one, v_one, m_one = pca_from_gram_rows(
        embedding_gram_frame(emb).collect(), k=4
    )
    assert np.allclose(c_store, c_one) and np.allclose(v_store, v_one)
    assert np.allclose(m_store, m_one)

    # empty wave appends nothing
    G.append_gram_store(
        spark,
        spark.createDataFrame([], "vec_id long, embedding array<double>"),
        path,
        wave_id=9,
    )
    row = G.gram_store_stats(spark, path).collect()[0]
    assert row.n_waves == 3


def test_ingest_stream_loop_and_replay_guard(spark, tmp_path):
    import os
    import time as _time

    _emb, base, w1, w2 = _splits(spark)
    path = str(tmp_path / "store")
    G.write_gram_store(spark, base, path)

    waves_dir = str(tmp_path / "waves")
    now = int(_time.time())
    seen: set[str] = set()
    for i, w in enumerate((w1, w2)):
        w.select("vec_id", "embedding").coalesce(1).write.mode(
            "append"
        ).parquet(waves_dir)
        fresh = {
            f for f in os.listdir(waves_dir)
            if f.startswith("part-") and f.endswith(".parquet")
        } - seen
        assert len(fresh) == 1
        for fname in fresh:
            os.utime(os.path.join(waves_dir, fname), times=(now + i, now + i))
        seen |= fresh

    def run(tag, sink):
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(waves_dir)
        )
        q = (
            G.gram_ingest_stream(spark, stream, path, sink)
            .option("checkpointLocation", checkpoint_dir(tag))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    folds: dict[int, int] = {}
    run("gramingest1", lambda m, bid: folds.update({bid: m.count()}))
    assert sorted(folds) == [0, 1]
    assert G.storefs.read_ingest_watermark(path) == 1

    emb, *_ = _splits(spark)
    assert _moments(G.gram_store_moments(spark, path)) == _moments(
        embedding_gram_frame(emb)
    )

    snap = _moments(G.gram_store_moments(spark, path))
    replays = []
    run("gramingest2", lambda m, bid: replays.append(bid))
    assert replays == [], "replayed batches reached the sink"
    assert _moments(G.gram_store_moments(spark, path)) == snap


def test_replayed_append_detect_and_repair(spark, tmp_path):
    """The watermark crash window as CODE, additive-state side: a
    wave's block lands, the watermark write is skipped, the batch
    replays with the SAME wave_id — the silent double-count an
    in-place running sum could never surface. Detection:
    n_dup_wave_rows > 0. Repair: dropDuplicates rewrite → moments ≡ a
    never-crashed twin's."""
    _emb, base, w1, _w2 = _splits(spark)
    path, twin = str(tmp_path / "store"), str(tmp_path / "twin")
    for p in (path, twin):
        G.write_gram_store(spark, base, p)
        G.append_gram_store(spark, w1, p, wave_id=0)
    G.append_gram_store(spark, w1, path, wave_id=0)  # the replay
    row = G.gram_store_stats(spark, path).collect()[0]
    assert row.n_dup_wave_rows > 0, "replayed block undetected"
    # the fold IS double-counted right now — that's the failure mode
    assert _moments(G.gram_store_moments(spark, path)) != _moments(
        G.gram_store_moments(spark, twin)
    )

    G.repair_replayed_append(spark, path)
    row = G.gram_store_stats(spark, path).collect()[0]
    assert row.n_dup_wave_rows == 0
    assert _moments(G.gram_store_moments(spark, path)) == _moments(
        G.gram_store_moments(spark, twin)
    )


def test_compact_preserves_moments_and_cuts_files(spark, tmp_path):
    import glob

    _emb, base, w1, w2 = _splits(spark)
    path = str(tmp_path / "store")
    G.write_gram_store(spark, base, path)
    G.append_gram_store(spark, w1, path, wave_id=0)
    G.append_gram_store(spark, w2, path, wave_id=1)
    before = _moments(G.gram_store_moments(spark, path))

    def nfiles():
        return len(glob.glob(f"{path}/partials/**/*.parquet", recursive=True))

    n_before = nfiles()
    G.compact_gram_store(spark, path)
    assert nfiles() < n_before
    assert _moments(G.gram_store_moments(spark, path)) == before
    row = G.gram_store_stats(spark, path).collect()[0]
    assert row.n_waves == 1 and row.n_dup_wave_rows == 0


def test_object_store_paths_fail_loud(spark):
    with pytest.raises(ValueError, match="atomic-rename"):
        G.compact_gram_store(spark, "s3://bucket/store")
    with pytest.raises(ValueError, match="atomic-rename"):
        G.gram_ingest_stream(spark, None, "s3://bucket/store", None)
    with pytest.raises(ValueError, match="atomic-rename"):
        G.repair_replayed_append(spark, "s3://bucket/store")


def test_outlier_score_stream_equals_batch(spark, tmp_path):
    """Arriving vectors scored per micro-batch against the persisted
    moments must union to the one-call batch image over the SAME
    moments — foreachBatch runs the identical plan, so the equality is
    exact, not approximate."""
    from trisk_spark.functions.similarity import outlier_score_frame

    emb, base, w1, w2 = _splits(spark)
    path = str(tmp_path / "store")
    G.write_gram_store(spark, emb, path)  # moments over the full corpus

    arrivals_dir = str(tmp_path / "arrivals")
    for w in (w1, w2):
        w.select("vec_id", "embedding").coalesce(1).write.mode(
            "append"
        ).parquet(arrivals_dir)

    got = []
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(arrivals_dir)
    )
    q = (
        G.outlier_score_stream(
            spark, stream, path,
            lambda bdf, bid: got.extend(map(tuple, bdf.collect())),
        )
        .option("checkpointLocation", checkpoint_dir("gramscore"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = G.gram_store_moments(spark, path).collect()
    want = sorted(
        map(
            tuple,
            outlier_score_frame(
                w1.unionByName(w2).select("vec_id", "embedding"), rows
            ).collect(),
        )
    )
    assert sorted(got) == want and len(want) > 0
