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


# ------------------------------------------------ takedown (r15) -----


def test_delete_equals_rebuild_on_moment_table(spark, tmp_path):
    """delete(victims) must fold to EXACTLY the one-shot pass over the
    corpus WITHOUT the victims — the store family's delete ≡ rebuild
    contract on its fourth member (the r14 VERDICT gap): moments are
    additive exact BIGINTs, so the negated tombstone block cancels the
    victims' contributions term-for-term."""
    emb, base, w1, w2 = _splits(spark)
    path = str(tmp_path / "store")
    G.write_gram_store(spark, base, path)
    G.append_gram_store(spark, w1, path, wave_id=0)
    G.append_gram_store(spark, w2, path, wave_id=1)
    victims = emb.where(F.col("vec_id") % 7 == 1)
    assert victims.limit(1).count() > 0
    G.delete_from_gram_store(spark, victims, path)
    assert _moments(G.gram_store_moments(spark, path)) == _moments(
        embedding_gram_frame(emb.where(~(F.col("vec_id") % 7 == 1)))
    )
    row = G.gram_store_stats(spark, path).collect()[0]
    assert row.n_dup_wave_rows == 0
    # the tombstone landed below every ingest id and the base block
    assert row.n_waves == 4


def test_delete_crash_resume_before_append(spark, tmp_path, monkeypatch):
    """Crash after the intent commit but before the tombstone block
    lands: resume appends from the recorded block — the victims'
    vectors are NOT needed again (the composed takedown may already
    have erased them from every row store)."""
    import glob
    import os

    emb, base, w1, _w2 = _splits(spark)
    path = str(tmp_path / "store")
    G.write_gram_store(spark, base, path)
    G.append_gram_store(spark, w1, path, wave_id=0)
    victims = emb.where(F.col("vec_id") % 9 == 1)
    want = _moments(
        embedding_gram_frame(
            base.union(w1).where(~(F.col("vec_id") % 9 == 1))
        )
    )

    real = G._run_recorded_delete
    monkeypatch.setattr(
        G, "_run_recorded_delete",
        lambda *a: (_ for _ in ()).throw(RuntimeError("injected")),
    )
    with pytest.raises(RuntimeError, match="injected"):
        G.delete_from_gram_store(spark, victims, path)
    monkeypatch.setattr(G, "_run_recorded_delete", real)
    assert os.path.exists(f"{path}/_delete_intent")
    assert G.resume_pending_delete(spark, path)
    assert _moments(G.gram_store_moments(spark, path)) == want
    assert glob.glob(f"{path}/_delete_intent*") == []


def test_delete_crash_resume_after_append_no_double_subtract(
    spark, tmp_path, monkeypatch
):
    """Crash after the tombstone block landed but before the intent
    dropped: resume must see the landed wave_id and NOT subtract
    again (the aggregate store's double-count hazard)."""
    import glob
    import shutil as _shutil

    emb, base, w1, _w2 = _splits(spark)
    path = str(tmp_path / "store")
    G.write_gram_store(spark, base, path)
    G.append_gram_store(spark, w1, path, wave_id=0)
    victims = emb.where(F.col("vec_id") % 9 == 1)
    want = _moments(
        embedding_gram_frame(
            base.union(w1).where(~(F.col("vec_id") % 9 == 1))
        )
    )

    real_rmtree = _shutil.rmtree

    def flaky(p, *a, **kw):
        if str(p).endswith("_delete_intent"):
            raise RuntimeError("injected pre-drop")
        return real_rmtree(p, *a, **kw)

    monkeypatch.setattr("shutil.rmtree", flaky)
    with pytest.raises(RuntimeError, match="injected"):
        G.delete_from_gram_store(spark, victims, path)
    monkeypatch.setattr("shutil.rmtree", real_rmtree)
    # block landed, intent still there
    assert _moments(G.gram_store_moments(spark, path)) == want
    assert G.resume_pending_delete(spark, path)
    assert _moments(G.gram_store_moments(spark, path)) == want  # once
    assert glob.glob(f"{path}/_delete_intent*") == []
    row = G.gram_store_stats(spark, path).collect()[0]
    assert row.n_dup_wave_rows == 0


def test_takedown_flips_outlier_verdict(spark, tmp_path):
    """The r14 VERDICT's fixture: a vector flagged ONLY because of the
    victims' moments scores clean after the takedown. Construction
    (exact on the scale grid — every value binary-representable):
    30 cluster vectors jittered ±1/64 per dim (balanced, so the
    per-dim variance is exactly u²) plus 90 victims at the exact
    center, which SHRINK the variance to u²/4; a cluster member then
    scores z² = 4 per dim = 256 ≥ the 2·DIM = 128 threshold (flagged)
    against the victim-laden moments, and exactly 1 per dim = 64
    (clean) once ``delete_from_gram_store`` subtracts the victims'
    moments."""
    from trisk_spark.functions.similarity import outlier_score_frame

    u = 1.0 / 64.0  # binary-exact; scaled = 15625
    cluster = [
        (i, [0.5 + u * (1.0 if (i + k) % 2 == 0 else -1.0)
             for k in range(DIM)])
        for i in range(30)
    ]
    victims = [(1000 + i, [0.5] * DIM) for i in range(90)]
    emb = spark.createDataFrame(
        cluster + victims, "vec_id long, embedding array<double>"
    )
    victim_emb = spark.createDataFrame(
        victims, "vec_id long, embedding array<double>"
    )
    probe = spark.createDataFrame(
        cluster[:1], "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "store")
    G.write_gram_store(spark, emb, path)

    before = outlier_score_frame(
        probe, G.gram_store_moments(spark, path).collect()
    ).collect()[0]
    assert before.is_outlier and before.dist2 == 4.0 * DIM

    G.delete_from_gram_store(spark, victim_emb, path)
    after = outlier_score_frame(
        probe, G.gram_store_moments(spark, path).collect()
    ).collect()[0]
    assert not after.is_outlier and after.dist2 == 1.0 * DIM


@pytest.mark.slow
def test_takedown_wave_subtracts_gram_and_rerun_converges(
    spark, tmp_path, monkeypatch
):
    """takedown_wave with a maintained gram_path: victims' moments are
    subtracted alongside the row-store deletes; a crash BETWEEN the
    gram delete and the dedup delete re-runs WITHOUT double-subtracting
    (the deterministic victim-set tombstone — the window a
    sem-membership gate would get wrong); and a full-wave re-run after
    success also converges."""
    from trisk_spark.functions.admission import takedown_wave
    from trisk_spark.functions.dedup_store import write_dedup_store
    from trisk_spark.functions.semantic_store import write_semantic_store

    def vec(i):
        v = [0.001 * ((i + k) % 5) for k in range(DIM)]
        v[i % DIM] = 0.8
        return [float(x) for x in v]

    ids = list(range(25))
    docs = spark.createDataFrame(
        [(i, f"document body {i} with words w{i} x{i}") for i in ids],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, vec(i)) for i in ids], "vec_id long, embedding array<double>"
    )
    dpath, spath, gpath = (
        str(tmp_path / "d"), str(tmp_path / "s"), str(tmp_path / "g")
    )
    write_dedup_store(spark, docs, dpath)
    write_semantic_store(spark, emb, spath)
    G.write_gram_store(spark, emb, gpath)

    victims = [3, 7, 11]
    want = _moments(
        embedding_gram_frame(emb.where(~F.col("vec_id").isin(victims)))
    )
    # crash BETWEEN the gram delete and the dedup delete: the gram
    # subtraction has landed, the row stores are untouched
    import trisk_spark.functions.dedup_store as ds

    real_dedup_delete = ds.delete_from_dedup_store
    monkeypatch.setattr(
        ds, "delete_from_dedup_store",
        lambda *a: (_ for _ in ()).throw(RuntimeError("injected")),
    )
    with pytest.raises(RuntimeError, match="injected"):
        takedown_wave(
            spark, victims, dpath, spath, gram_path=gpath, victim_emb=emb
        )
    monkeypatch.setattr(ds, "delete_from_dedup_store", real_dedup_delete)
    assert _moments(G.gram_store_moments(spark, gpath)) == want
    # re-driving the whole wave must NOT subtract again (the same id
    # set maps to the same landed tombstone)
    takedown_wave(
        spark, victims, dpath, spath, gram_path=gpath, victim_emb=emb
    )
    assert _moments(G.gram_store_moments(spark, gpath)) == want
    # and a third, fully-successful re-run still converges
    takedown_wave(
        spark, victims, dpath, spath, gram_path=gpath, victim_emb=emb
    )
    assert _moments(G.gram_store_moments(spark, gpath)) == want
    # fail-loud contract: gram_path without victim_emb
    with pytest.raises(ValueError, match="victim_emb"):
        takedown_wave(spark, [1], dpath, spath, gram_path=gpath)


def test_delete_explicit_wave_id_must_be_tombstone_range(spark, tmp_path):
    emb, base, _w1, _w2 = _splits(spark)
    path = str(tmp_path / "store")
    G.write_gram_store(spark, base, path)
    with pytest.raises(ValueError, match="below"):
        G.delete_from_gram_store(spark, emb.limit(2), path, wave_id=0)
    # a legal explicit tombstone works and is replayable-once
    G.delete_from_gram_store(spark, emb.limit(0), path, wave_id=-5)


# ---------------- r16: compaction × delete replay accounting ----------


def test_compact_preserves_tombstones_and_replay_guard(spark, tmp_path):
    """r15 ADVICE (high), direction (b): compaction must PRESERVE
    landed tombstone blocks (wave_id < BASE_WAVE_ID) instead of
    folding them into the base — they are the durable replay guard,
    so a re-driven same-id-set delete AFTER a compaction must still
    find its tombstone landed and no-op instead of double-subtracting."""
    emb, base, w1, w2 = _splits(spark)
    path = str(tmp_path / "store")
    G.write_gram_store(spark, base, path)
    G.append_gram_store(spark, w1, path, wave_id=0)
    G.append_gram_store(spark, w2, path, wave_id=1)
    victims = emb.where(F.col("vec_id") % 7 == 1)
    want = _moments(
        embedding_gram_frame(emb.where(~(F.col("vec_id") % 7 == 1)))
    )
    G.delete_from_gram_store(spark, victims, path)
    assert _moments(G.gram_store_moments(spark, path)) == want

    G.compact_gram_store(spark, path)
    # moment table invariant AND the tombstone block survived verbatim
    assert _moments(G.gram_store_moments(spark, path)) == want
    waves = sorted(
        r.wave_id
        for r in spark.read.parquet(f"{path}/partials")
        .select("wave_id").distinct().collect()
    )
    assert len(waves) == 2 and waves[0] < G.BASE_WAVE_ID == waves[1]

    # the replay guard across compaction: the identical delete call
    # (same default tombstone) must no-op, not subtract again
    G.delete_from_gram_store(spark, victims, path)
    assert _moments(G.gram_store_moments(spark, path)) == want

    # double compaction stays idempotent on both counts
    G.compact_gram_store(spark, path)
    assert _moments(G.gram_store_moments(spark, path)) == want
    row = G.gram_store_stats(spark, path).collect()[0]
    assert row.n_waves == 2 and row.n_dup_wave_rows == 0


def test_compact_consumes_pending_delete_intent_first(
    spark, tmp_path, monkeypatch
):
    """r15 ADVICE (high), direction (a): a compaction entered while a
    ``_delete_intent`` is pending (crash after the tombstone append,
    before the intent drop) must CONSUME the intent first — otherwise
    the fold erases the landed tombstone row and the later
    ``resume_pending_delete`` re-appends the negated block (double
    subtraction)."""
    import glob
    import shutil as _shutil

    emb, base, w1, _w2 = _splits(spark)
    path = str(tmp_path / "store")
    G.write_gram_store(spark, base, path)
    G.append_gram_store(spark, w1, path, wave_id=0)
    victims = emb.where(F.col("vec_id") % 9 == 1)
    want = _moments(
        embedding_gram_frame(
            base.union(w1).where(~(F.col("vec_id") % 9 == 1))
        )
    )

    # forced crash: tombstone lands, intent drop fails
    real_rmtree = _shutil.rmtree

    def flaky(p, *a, **kw):
        if str(p).endswith("_delete_intent"):
            raise RuntimeError("injected pre-drop")
        return real_rmtree(p, *a, **kw)

    monkeypatch.setattr("shutil.rmtree", flaky)
    with pytest.raises(RuntimeError, match="injected"):
        G.delete_from_gram_store(spark, victims, path)
    monkeypatch.setattr("shutil.rmtree", real_rmtree)
    assert glob.glob(f"{path}/_delete_intent") != []

    # compaction with the intent pending: consumes it, keeps the
    # moments exact, leaves no intent behind
    G.compact_gram_store(spark, path)
    assert _moments(G.gram_store_moments(spark, path)) == want
    assert glob.glob(f"{path}/_delete_intent*") == []
    # and a standalone resume afterwards finds nothing to do
    assert not G.resume_pending_delete(spark, path)
    assert _moments(G.gram_store_moments(spark, path)) == want


def test_tombstone_wave_id_derivation(spark, tmp_path):
    """seq=1 must reproduce the r15 default (bare-CSV digest) so
    pre-sequence landed tombstones still guard replays; higher seqs
    must differ; every derivation sits below BASE_WAVE_ID."""
    emb, base, _w1, _w2 = _splits(spark)
    ids = [3, 7, 11]
    t1 = G.tombstone_wave_id(ids, 1)
    t2 = G.tombstone_wave_id(ids, 2)
    assert t1 != t2 and t1 < G.BASE_WAVE_ID and t2 < G.BASE_WAVE_ID
    # unordered/duplicated input normalizes to the same id
    assert G.tombstone_wave_id([11, 3, 7, 3], 1) == t1

    # seq=1 ≡ the default path delete_from_gram_store derives itself
    path = str(tmp_path / "store")
    G.write_gram_store(spark, base, path)
    vic_ids = sorted(
        int(r.vec_id) for r in base.select("vec_id").limit(3).collect()
    )
    vic = emb.where(F.col("vec_id").isin(vic_ids))
    G.delete_from_gram_store(spark, vic, path)
    landed = {
        r.wave_id
        for r in spark.read.parquet(f"{path}/partials")
        .select("wave_id").distinct().collect()
    }
    assert G.tombstone_wave_id(vic_ids, 1) in landed


@pytest.mark.slow
def test_takedown_wave_readmit_then_retakedown_converges(spark, tmp_path):
    """The r15 VERDICT next-round #6 'Done' criterion: victims taken
    down, RE-ADMITTED, then taken down AGAIN through the plain
    ``takedown_wave`` API — no explicit wave_id anywhere — must
    converge to the rebuild-without-victims image: the durable
    takedown-sequence counter derives a fresh tombstone for the
    second wave, and the dedup-membership gate scopes the
    subtraction to what is actually re-admitted."""
    from trisk_spark.functions.admission import takedown_wave
    from trisk_spark.functions.dedup_store import (
        append_dedup_store,
        write_dedup_store,
    )
    from trisk_spark.functions.semantic_store import (
        append_semantic_store,
        write_semantic_store,
    )

    def vec(i):
        v = [0.001 * ((i + k) % 5) for k in range(DIM)]
        v[i % DIM] = 0.8
        return [float(x) for x in v]

    ids = list(range(25))
    docs = spark.createDataFrame(
        [(i, f"document body {i} with words w{i} x{i}") for i in ids],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, vec(i)) for i in ids], "vec_id long, embedding array<double>"
    )
    dpath, spath, gpath = (
        str(tmp_path / "d"), str(tmp_path / "s"), str(tmp_path / "g")
    )
    write_dedup_store(spark, docs, dpath)
    write_semantic_store(spark, emb, spath)
    G.write_gram_store(spark, emb, gpath)

    victims = [3, 7, 11]
    want = _moments(
        embedding_gram_frame(emb.where(~F.col("vec_id").isin(victims)))
    )
    takedown_wave(
        spark, victims, dpath, spath, gram_path=gpath, victim_emb=emb
    )
    assert _moments(G.gram_store_moments(spark, gpath)) == want

    # RE-ADMIT the victims into every store (the documented
    # re-admittable semantics), moments return to the full corpus
    vdocs = docs.where(F.col("doc_id").isin(victims))
    vemb = emb.where(F.col("vec_id").isin(victims))
    append_dedup_store(spark, vdocs, dpath)
    append_semantic_store(spark, vemb, spath)
    G.append_gram_store(spark, vemb, gpath, wave_id=99)
    assert _moments(G.gram_store_moments(spark, gpath)) == _moments(
        embedding_gram_frame(emb)
    )

    # SECOND takedown of the SAME id set — no explicit wave_id
    takedown_wave(
        spark, victims, dpath, spath, gram_path=gpath, victim_emb=emb
    )
    assert _moments(G.gram_store_moments(spark, gpath)) == want

    # and a spurious THIRD run (nothing re-admitted) subtracts
    # nothing: the membership gate finds no victim admitted
    takedown_wave(
        spark, victims, dpath, spath, gram_path=gpath, victim_emb=emb
    )
    assert _moments(G.gram_store_moments(spark, gpath)) == want
    row = G.gram_store_stats(spark, gpath).collect()[0]
    assert row.n_dup_wave_rows == 0


@pytest.mark.slow
def test_takedown_wave_pending_different_ids_fails_loud(
    spark, tmp_path, monkeypatch
):
    """A pending takedown-wave intent for a DIFFERENT id set must
    refuse a new wave (silently interleaving would hand the second
    wave the first's crashed sequence slot); re-driving the ORIGINAL
    id set to completion clears the way."""
    import trisk_spark.functions.dedup_store as ds
    from trisk_spark.functions.admission import takedown_wave
    from trisk_spark.functions.dedup_store import write_dedup_store
    from trisk_spark.functions.semantic_store import write_semantic_store

    def vec(i):
        v = [0.001 * ((i + k) % 5) for k in range(DIM)]
        v[i % DIM] = 0.8
        return [float(x) for x in v]

    ids = list(range(12))
    docs = spark.createDataFrame(
        [(i, f"document body {i} with words w{i} x{i}") for i in ids],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, vec(i)) for i in ids], "vec_id long, embedding array<double>"
    )
    dpath, spath, gpath = (
        str(tmp_path / "d"), str(tmp_path / "s"), str(tmp_path / "g")
    )
    write_dedup_store(spark, docs, dpath)
    write_semantic_store(spark, emb, spath)
    G.write_gram_store(spark, emb, gpath)

    real = ds.delete_from_dedup_store
    monkeypatch.setattr(
        ds, "delete_from_dedup_store",
        lambda *a: (_ for _ in ()).throw(RuntimeError("injected")),
    )
    with pytest.raises(RuntimeError, match="injected"):
        takedown_wave(
            spark, [2, 4], dpath, spath, gram_path=gpath, victim_emb=emb
        )
    monkeypatch.setattr(ds, "delete_from_dedup_store", real)

    with pytest.raises(RuntimeError, match="DIFFERENT victim id set"):
        takedown_wave(
            spark, [5, 6], dpath, spath, gram_path=gpath, victim_emb=emb
        )
    # re-driving the pending wave completes and unblocks the next one
    takedown_wave(
        spark, [2, 4], dpath, spath, gram_path=gpath, victim_emb=emb
    )
    takedown_wave(
        spark, [5, 6], dpath, spath, gram_path=gpath, victim_emb=emb
    )
    want = _moments(
        embedding_gram_frame(emb.where(~F.col("vec_id").isin([2, 4, 5, 6])))
    )
    assert _moments(G.gram_store_moments(spark, gpath)) == want


@pytest.mark.slow
def test_takedown_wave_pre_sequence_migration_guard(spark, tmp_path):
    """r16 review finding: on a store migrated from the pre-sequence
    (r15) era, seq=1's tombstone aliases the legacy bare-CSV digest —
    so a landed legacy tombstone with no sequence counter must FAIL
    LOUD (the crashed-re-drive and completed-then-re-admitted
    histories are indistinguishable from store state) instead of
    silently skipping the re-admitted victims' subtraction; after the
    operator's ``ack_pre_sequence_takedown`` the wave allocates a
    fresh sequence and subtracts."""
    from trisk_spark.functions.admission import (
        ack_pre_sequence_takedown,
        takedown_wave,
    )
    from trisk_spark.functions.dedup_store import (
        append_dedup_store,
        delete_from_dedup_store,
        write_dedup_store,
    )
    from trisk_spark.functions.semantic_store import (
        append_semantic_store,
        delete_from_semantic_store,
        write_semantic_store,
    )

    def vec(i):
        v = [0.001 * ((i + k) % 5) for k in range(DIM)]
        v[i % DIM] = 0.8
        return [float(x) for x in v]

    ids = list(range(20))
    docs = spark.createDataFrame(
        [(i, f"document body {i} with words w{i} x{i}") for i in ids],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, vec(i)) for i in ids], "vec_id long, embedding array<double>"
    )
    dpath, spath, gpath = (
        str(tmp_path / "d"), str(tmp_path / "s"), str(tmp_path / "g")
    )
    write_dedup_store(spark, docs, dpath)
    write_semantic_store(spark, emb, spath)
    G.write_gram_store(spark, emb, gpath)

    victims = [2, 9]
    want = _moments(
        embedding_gram_frame(emb.where(~F.col("vec_id").isin(victims)))
    )
    # the r15-era flow: per-store deletes, NO wave sequencing
    G.delete_from_gram_store(
        spark, emb.where(F.col("vec_id").isin(victims)), gpath
    )
    delete_from_dedup_store(spark, victims, dpath)
    delete_from_semantic_store(spark, victims, spath)
    assert _moments(G.gram_store_moments(spark, gpath)) == want

    # re-admit, then the first POST-upgrade wave: must refuse, not
    # silently no-op the subtraction
    vdocs = docs.where(F.col("doc_id").isin(victims))
    vemb = emb.where(F.col("vec_id").isin(victims))
    append_dedup_store(spark, vdocs, dpath)
    append_semantic_store(spark, vemb, spath)
    G.append_gram_store(spark, vemb, gpath, wave_id=50)
    with pytest.raises(RuntimeError, match="PRE-SEQUENCE"):
        takedown_wave(
            spark, victims, dpath, spath, gram_path=gpath, victim_emb=emb
        )
    # nothing mutated by the refused wave
    assert _moments(G.gram_store_moments(spark, gpath)) == _moments(
        embedding_gram_frame(emb)
    )

    # operator ack (completed-takedown history) -> the wave subtracts
    # under a fresh sequence and converges to the rebuild image
    ack_pre_sequence_takedown(gpath)
    takedown_wave(
        spark, victims, dpath, spath, gram_path=gpath, victim_emb=emb
    )
    assert _moments(G.gram_store_moments(spark, gpath)) == want
    # spurious re-run: membership gate finds nothing admitted
    takedown_wave(
        spark, victims, dpath, spath, gram_path=gpath, victim_emb=emb
    )
    assert _moments(G.gram_store_moments(spark, gpath)) == want


@pytest.mark.slow
def test_migration_guard_survives_unrelated_waves(spark, tmp_path):
    """r16 second-review finding: the pre-sequence guard must key on
    the per-id-set completion LEDGER, not on 'counter == 0' — a
    crashed r15-era takedown of set A re-driven AFTER an unrelated
    post-upgrade wave of set B bumped the counter must still fail
    loud instead of double-subtracting A under a fresh salted
    tombstone. Also pins: ack never LOWERS an existing counter."""
    from trisk_spark.functions import storefs
    from trisk_spark.functions.admission import (
        ack_pre_sequence_takedown,
        takedown_wave,
    )
    from trisk_spark.functions.dedup_store import write_dedup_store
    from trisk_spark.functions.semantic_store import write_semantic_store

    def vec(i):
        v = [0.001 * ((i + k) % 5) for k in range(DIM)]
        v[i % DIM] = 0.8
        return [float(x) for x in v]

    ids = list(range(20))
    docs = spark.createDataFrame(
        [(i, f"document body {i} with words w{i} x{i}") for i in ids],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, vec(i)) for i in ids], "vec_id long, embedding array<double>"
    )
    dpath, spath, gpath = (
        str(tmp_path / "d"), str(tmp_path / "s"), str(tmp_path / "g")
    )
    write_dedup_store(spark, docs, dpath)
    write_semantic_store(spark, emb, spath)
    G.write_gram_store(spark, emb, gpath)

    set_a = [2, 9]
    # the r15-era CRASHED wave of A: gram tombstone landed (bare
    # digest), row-store deletes never ran, no sequence metadata
    G.delete_from_gram_store(
        spark, emb.where(F.col("vec_id").isin(set_a)), gpath
    )
    after_a = _moments(G.gram_store_moments(spark, gpath))

    # an unrelated post-upgrade wave of B completes and bumps the
    # counter + ledger
    takedown_wave(
        spark, [5, 6], dpath, spath, gram_path=gpath, victim_emb=emb
    )
    assert storefs.read_small_text(gpath, "_takedown_seq").strip() == "1"

    # re-driving the crashed legacy wave of A must STILL fail loud
    with pytest.raises(RuntimeError, match="PRE-SEQUENCE"):
        takedown_wave(
            spark, set_a, dpath, spath, gram_path=gpath, victim_emb=emb
        )
    # nothing subtracted twice by the refused wave
    want_b = _moments(
        embedding_gram_frame(emb.where(~F.col("vec_id").isin(set_a + [5, 6])))
    )
    assert _moments(G.gram_store_moments(spark, gpath)) == want_b

    # ack on a store with a live counter never lowers it
    storefs.write_small_text(gpath, "_takedown_seq", "3")
    ack_pre_sequence_takedown(gpath)
    assert storefs.read_small_text(gpath, "_takedown_seq").strip() == "3"
    del after_a


def test_takedown_wave_rejects_uncovering_victim_emb(spark, tmp_path):
    """r16 second-review finding: when the membership gate proves
    victims are admitted AND the semantic store holds their vectors,
    a victim_emb that cannot cover them must FAIL LOUD before any
    store mutates — silently subtracting an empty block while the row
    deletes proceed would orphan the moments forever. Victims
    admitted WITHOUT a vector are legitimately not required."""
    from trisk_spark.functions.admission import takedown_wave
    from trisk_spark.functions.dedup_store import write_dedup_store
    from trisk_spark.functions.semantic_store import write_semantic_store

    def vec(i):
        v = [0.001 * ((i + k) % 5) for k in range(DIM)]
        v[i % DIM] = 0.8
        return [float(x) for x in v]

    ids = list(range(15))
    docs = spark.createDataFrame(
        [(i, f"document body {i} with words w{i} x{i}") for i in ids],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, vec(i)) for i in ids], "vec_id long, embedding array<double>"
    )
    dpath, spath, gpath = (
        str(tmp_path / "d"), str(tmp_path / "s"), str(tmp_path / "g")
    )
    write_dedup_store(spark, docs, dpath)
    write_semantic_store(spark, emb, spath)
    G.write_gram_store(spark, emb, gpath)

    full = _moments(G.gram_store_moments(spark, gpath))
    # victim_emb that omits victim 4's rows entirely
    partial = emb.where(F.col("vec_id") != 4)
    with pytest.raises(ValueError, match="missing embedding rows"):
        takedown_wave(
            spark, [3, 4], dpath, spath, gram_path=gpath, victim_emb=partial
        )
    # the refused wave mutated nothing AND stranded no wave marker
    # (r17 second review: a validation failure must not wedge
    # admission behind a marker)
    from trisk_spark.functions import storefs as _sfs

    assert _sfs.read_small_text(dpath, "_takedown_wave_ids") is None
    assert _moments(G.gram_store_moments(spark, gpath)) == full
    # the same wave with covering rows converges
    takedown_wave(
        spark, [3, 4], dpath, spath, gram_path=gpath, victim_emb=emb
    )
    assert _moments(G.gram_store_moments(spark, gpath)) == _moments(
        embedding_gram_frame(emb.where(~F.col("vec_id").isin([3, 4])))
    )


@pytest.mark.slow
def test_migration_guard_catches_subset_derived_legacy_tombstone(
    spark, tmp_path
):
    """r16 ADVICE (medium): the r15-era flow digested its bare
    tombstone over victim_emb's distinct non-null vec_ids — a SUBSET
    of the victim id set when some victims were admitted without an
    embedding. A post-upgrade wave over the FULL id set must still
    recognize that landed subset tombstone and fail loud (not
    allocate seq=1 under a different digest and double-subtract the
    embedded victims on a crashed pre-upgrade re-drive); after the
    operator ack it subtracts under a fresh sequence and converges."""
    from trisk_spark.functions.admission import (
        ack_pre_sequence_takedown,
        takedown_wave,
    )
    from trisk_spark.functions.dedup_store import (
        append_dedup_store,
        delete_from_dedup_store,
        write_dedup_store,
    )
    from trisk_spark.functions.semantic_store import (
        append_semantic_store,
        delete_from_semantic_store,
        write_semantic_store,
    )

    def vec(i):
        v = [0.001 * ((i + k) % 5) for k in range(DIM)]
        v[i % DIM] = 0.8
        return [float(x) for x in v]

    ids = list(range(12))
    emb_ids = [i for i in ids if i != 7]  # victim 7 never embedded
    docs = spark.createDataFrame(
        [(i, f"document body {i} with words w{i} x{i}") for i in ids],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, vec(i)) for i in emb_ids],
        "vec_id long, embedding array<double>",
    )
    dpath, spath, gpath = (
        str(tmp_path / "d"), str(tmp_path / "s"), str(tmp_path / "g")
    )
    write_dedup_store(spark, docs, dpath)
    write_semantic_store(spark, emb, spath)
    G.write_gram_store(spark, emb, gpath)

    victims = [2, 7]  # 7 has no embedding -> subset digest = {2}
    # the r15-era flow: the gram tombstone lands digested over the
    # EMBEDDED subset (delete_from_gram_store's wave_id=None path)
    G.delete_from_gram_store(
        spark, emb.where(F.col("vec_id").isin(victims)), gpath
    )
    delete_from_dedup_store(spark, victims, dpath)
    delete_from_semantic_store(spark, victims, spath)
    want_gone = _moments(
        embedding_gram_frame(emb.where(~F.col("vec_id").isin(victims)))
    )
    assert _moments(G.gram_store_moments(spark, gpath)) == want_gone

    # re-admit, then the first POST-upgrade wave over the FULL id set:
    # must refuse — the subset-derived bare tombstone is landed with
    # no ledger entry and no ack
    vdocs = docs.where(F.col("doc_id").isin(victims))
    vemb = emb.where(F.col("vec_id").isin(victims))
    append_dedup_store(spark, vdocs, dpath)
    append_semantic_store(spark, vemb, spath)
    G.append_gram_store(spark, vemb, gpath, wave_id=50)
    with pytest.raises(RuntimeError, match="PRE-SEQUENCE"):
        takedown_wave(
            spark, victims, dpath, spath, gram_path=gpath, victim_emb=emb
        )
    # nothing mutated by the refused wave
    assert _moments(G.gram_store_moments(spark, gpath)) == _moments(
        embedding_gram_frame(emb)
    )

    # operator ack -> fresh sequence, subtraction converges
    ack_pre_sequence_takedown(gpath)
    takedown_wave(
        spark, victims, dpath, spath, gram_path=gpath, victim_emb=emb
    )
    assert _moments(G.gram_store_moments(spark, gpath)) == want_gone


def test_ack_refuses_pending_wave_intent(spark, tmp_path):
    """r16 ADVICE (low): acking the pre-sequence migration while a
    POST-upgrade wave intent is pending is operationally ambiguous —
    the ack must fail loud and direct the operator to re-drive that
    wave first; after the intent clears, the ack lands."""
    from trisk_spark.functions import storefs
    from trisk_spark.functions.admission import ack_pre_sequence_takedown

    def vec(i):
        v = [0.001 * ((i + k) % 5) for k in range(DIM)]
        v[i % DIM] = 0.8
        return [float(x) for x in v]

    emb = spark.createDataFrame(
        [(i, vec(i)) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    gpath = str(tmp_path / "g")
    G.write_gram_store(spark, emb, gpath)
    storefs.write_small_text(gpath, "_takedown_wave_intent", "deadbeef 1")
    with pytest.raises(RuntimeError, match="intent .* is pending"):
        ack_pre_sequence_takedown(gpath)
    assert storefs.read_small_text(gpath, "_pre_sequence_ack") is None
    import os

    os.remove(f"{storefs.strip_file_scheme(gpath)}/_takedown_wave_intent")
    ack_pre_sequence_takedown(gpath)
    assert storefs.read_small_text(gpath, "_pre_sequence_ack") is not None


def test_append_gram_refuses_pending_takedown_markers(
    spark, tmp_path, monkeypatch
):
    """The moment-store side of the r16-queued admission guard:
    appending while a takedown is mid-crash (a pending _delete_intent
    OR a pending _takedown_wave_intent) must fail loud — the re-drive
    and the append would disagree about the re-admitted vectors'
    moments. After the takedown finishes, the append lands."""
    from trisk_spark.functions import storefs

    def vec(i):
        v = [0.001 * ((i + k) % 5) for k in range(DIM)]
        v[i % DIM] = 0.8
        return [float(x) for x in v]

    emb = spark.createDataFrame(
        [(i, vec(i)) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    gpath = str(tmp_path / "g")
    G.write_gram_store(spark, emb, gpath)

    # crash a gram delete AFTER its intent rename, BEFORE the append
    real = G._run_recorded_delete
    monkeypatch.setattr(
        G, "_run_recorded_delete",
        lambda *a: (_ for _ in ()).throw(RuntimeError("injected")),
    )
    with pytest.raises(RuntimeError, match="injected"):
        G.delete_from_gram_store(
            spark, emb.where(F.col("vec_id").isin([2])), gpath
        )
    monkeypatch.setattr(G, "_run_recorded_delete", real)
    wave = spark.createDataFrame(
        [(100, vec(100))], "vec_id long, embedding array<double>"
    )
    with pytest.raises(RuntimeError, match="_delete_intent"):
        G.append_gram_store(spark, wave, gpath, wave_id=7)
    assert G.resume_pending_delete(spark, gpath)

    # a pending WAVE intent (composed takedown mid-crash) blocks too
    storefs.write_small_text(gpath, "_takedown_wave_intent", "cafe 2")
    with pytest.raises(RuntimeError, match="_takedown_wave_intent"):
        G.append_gram_store(spark, wave, gpath, wave_id=7)
    import os

    os.remove(f"{storefs.strip_file_scheme(gpath)}/_takedown_wave_intent")
    G.append_gram_store(spark, wave, gpath, wave_id=7)
    want = _moments(
        embedding_gram_frame(
            emb.where(F.col("vec_id") != 2).unionByName(wave)
        )
    )
    assert _moments(G.gram_store_moments(spark, gpath)) == want


@pytest.mark.slow
def test_migration_guard_catches_membership_gated_legacy_tombstone(
    spark, tmp_path
):
    """r17 review: the mid-r15 (f9ef826) takedown additionally gated
    victim_emb on the SEMANTIC store's membership before the gram
    delete, so a victim embedded in the gram store but never stored
    by the semantic store (the documented zero-norm/degenerate class)
    landed a tombstone digested over a THIRD subset. A post-upgrade
    wave must recognize it and fail loud instead of double-subtracting
    the member victims under a fresh seq=1 digest."""
    from trisk_spark.functions.admission import (
        ack_pre_sequence_takedown,
        takedown_wave,
    )
    from trisk_spark.functions.dedup_store import (
        append_dedup_store,
        delete_from_dedup_store,
        write_dedup_store,
    )
    from trisk_spark.functions.semantic_store import (
        append_semantic_store,
        delete_from_semantic_store,
        write_semantic_store,
    )

    def vec(i):
        v = [0.001 * ((i + k) % 5) for k in range(DIM)]
        v[i % DIM] = 0.8
        return [float(x) for x in v]

    ids = list(range(12))
    docs = spark.createDataFrame(
        [(i, f"document body {i} with words w{i} x{i}") for i in ids],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, vec(i)) for i in ids], "vec_id long, embedding array<double>"
    )
    dpath, spath, gpath = (
        str(tmp_path / "d"), str(tmp_path / "s"), str(tmp_path / "g")
    )
    write_dedup_store(spark, docs, dpath)
    # victim 2 is in the GRAM store but NOT the semantic store (the
    # admitted-without-stored-vector class the f9ef826 caveat names)
    write_semantic_store(spark, emb.where(F.col("vec_id") != 2), spath)
    G.write_gram_store(spark, emb, gpath)

    victims = [2, 9]
    # the f9ef826-era flow: gram delete over victim_emb ∩ sem
    # membership = {9} only, then the row-store deletes; crash AFTER
    # the gram tombstone landed = stop here (row stores keep victims)
    G.delete_from_gram_store(
        spark, emb.where(F.col("vec_id").isin([9])), gpath
    )
    after_crash = _moments(G.gram_store_moments(spark, gpath))

    # re-driven on current code with the FULL id set: must fail loud —
    # the landed tombstone is digested over the membership subset {9},
    # which neither the full-set nor the embedded-subset candidate
    # matches
    with pytest.raises(RuntimeError, match="PRE-SEQUENCE"):
        takedown_wave(
            spark, victims, dpath, spath, gram_path=gpath, victim_emb=emb
        )
    # nothing double-subtracted by the refused wave
    assert _moments(G.gram_store_moments(spark, gpath)) == after_crash

    # the REFUSED wave must not strand the wave-level marker (r17
    # second review: a pure validation failure used to wedge all
    # admission behind a marker no re-drive could clear cleanly)
    from trisk_spark.functions import storefs

    assert storefs.read_small_text(dpath, "_takedown_wave_ids") is None

    # operator path: finish the legacy wave's row deletes, ack, move on
    delete_from_dedup_store(spark, victims, dpath)
    delete_from_semantic_store(spark, victims, spath)
    ack_pre_sequence_takedown(gpath)
    # re-admit and take down again: subtracts under a fresh sequence.
    # victim 2's moments were NEVER subtracted by the legacy wave (the
    # era's documented caveat), so the store converges to: full corpus
    # − 9's original moments − the re-admitted pair's moments.
    append_dedup_store(
        spark, docs.where(F.col("doc_id").isin(victims)), dpath
    )
    append_semantic_store(
        spark, emb.where(F.col("vec_id").isin(victims)), spath
    )
    G.append_gram_store(
        spark, emb.where(F.col("vec_id").isin(victims)), gpath, wave_id=50
    )
    takedown_wave(
        spark, victims, dpath, spath, gram_path=gpath, victim_emb=emb
    )
    # the final fold: base − {9}(legacy wave) + {2,9}(the re-admit
    # append) − {2,9}(the new sequenced wave) = base − {9}
    want = {}
    for r in embedding_gram_frame(emb).collect():
        want[(r.i, r.j)] = r.g
    for r in embedding_gram_frame(
        emb.where(F.col("vec_id") == 9)
    ).collect():
        want[(r.i, r.j)] -= r.g
    got = {
        (i, j): g
        for (i, j, g) in _moments(G.gram_store_moments(spark, gpath))
    }
    assert got == want
