"""ivf_drift_report: conservation/model-shape properties on the real
corpus, and synthetic drifted / undrifted waves pinning the hot flag
and the KL direction. Cross-engine value parity at sf0.001 lives in
test_oracle_parity's library pass."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from trisk_spark.catalog import table
from trisk_spark.functions.similarity import (
    DRIFT_ARRIVING_MOD,
    N_CENTROIDS,
    _valid_embeddings,
    ivf_drift_report,
)

from .conftest import SF_DIR

DIM = 64


def test_counts_conserve_and_model_shape(spark):
    rows = ivf_drift_report(spark, SF_DIR).collect()
    assert len(rows) == N_CENTROIDS  # one row per model list, always
    emb = _valid_embeddings(table(spark, SF_DIR, "embeddings")).where(
        # the assignment's qnorm > 0 gate == scale > 0: drop all-zero
        F.array_max(F.transform("embedding", lambda x: F.abs(x))) > 0
    )
    n_total = emb.count()
    n_arriving = emb.where(
        F.pmod(F.col("vec_id"), F.lit(DRIFT_ARRIVING_MOD)) == 0
    ).count()
    assert sum(r.n_resident for r in rows) == n_total - n_arriving
    assert sum(r.n_arriving for r in rows) == n_arriving
    # smoothed KL(arriving || resident) >= 0 up to per-term rounding
    assert sum(r.kl_contrib for r in rows) >= -1e-4


def _write_emb(tmp_path, vec_ids, directions, hot_direction=None):
    """Synthetic corpus: vector i points at unit direction d_i; ids
    divisible by DRIFT_ARRIVING_MOD are the arriving wave."""

    def vec(d, jitter):
        v = [0.001 * ((jitter + k) % 3) for k in range(DIM)]
        v[d] = 0.9
        return [float(x) for x in v]

    emb = pa.table(
        {
            "vec_id": vec_ids,
            "embedding": [vec(d, i) for i, d in zip(vec_ids, directions)],
            "label": [0] * len(vec_ids),
        }
    )
    pq.write_table(emb, tmp_path / "embeddings.parquet")
    return str(tmp_path)


def test_flooded_wave_is_hot(spark, tmp_path):
    """Arriving wave all pointing at one direction: the resident lists
    are direction-balanced, so the flooded direction's list must flag
    hot and dominate the KL."""
    ids = list(range(200))
    dirs = [
        0 if i % DRIFT_ARRIVING_MOD == 0 else (i % 8) + 1 for i in ids
    ]
    sf = _write_emb(tmp_path, ids, dirs)
    rows = ivf_drift_report(spark, sf).collect()
    hot = [r for r in rows if r.is_hot]
    assert hot, rows
    top = max(rows, key=lambda r: r.kl_contrib)
    assert top.is_hot and top.n_arriving == sum(r.n_arriving for r in rows)
    assert sum(r.kl_contrib for r in rows) > 0.1


def test_matched_wave_is_calm(spark, tmp_path):
    """Arriving wave distributed like the residents: no hot lists and
    a near-zero KL — the gate must not cry wolf on a healthy stream."""
    ids = list(range(200))
    dirs = [(i // DRIFT_ARRIVING_MOD) % 8 for i in ids]  # 4:1 everywhere
    sf = _write_emb(tmp_path, ids, dirs)
    rows = ivf_drift_report(spark, sf).collect()
    assert not [r for r in rows if r.is_hot]
    assert abs(sum(r.kl_contrib for r in rows)) < 0.05


def test_deterministic_across_runs(spark):
    a = {tuple(r) for r in ivf_drift_report(spark, SF_DIR).collect()}
    b = {tuple(r) for r in ivf_drift_report(spark, SF_DIR).collect()}
    assert a == b and a


def test_empty_arriving_side_is_clean_zero_report(spark):
    """na = 0 (an empty streaming micro-batch in drift_report_stream)
    must yield kl_contrib EXACTLY 0 on every list and no hot flags —
    not the Infinity/NaN the raw ·/(100·na·K) shares would produce
    (r14 ADVICE low item)."""
    import math

    from trisk_spark.functions.similarity import drift_from_counts

    k_m = 4
    spine = spark.createDataFrame(
        [(i,) for i in range(k_m)], "list_id bigint"
    )
    counts = spark.createDataFrame(
        [(0, 10, 0), (1, 5, 0), (2, 0, 0)],
        "list_id bigint, n_resident bigint, n_arriving bigint",
    )
    rows = drift_from_counts(spine, counts, k_m).collect()
    assert len(rows) == k_m
    for r in rows:
        assert r.kl_contrib == 0.0 and math.isfinite(r.kl_contrib)
        assert not r.is_hot
        assert r.n_arriving == 0


def test_drift_stream_equals_batch_image(spark, tmp_path):
    """The deployment twin: an IVF store written over the existing
    slice + the arriving slice streamed through drift_report_stream
    must reproduce ivf_drift_report's one-plan image row-for-row (same
    model rule, same assignment kernel, same shared formulas)."""
    from trisk_spark.catalog import table
    from trisk_spark.functions.ivf_store import (
        drift_report_stream,
        write_index,
    )
    from trisk_spark.streaming.sources import checkpoint_dir

    emb = table(spark, SF_DIR, "embeddings")
    exsf = tmp_path / "exsf"
    exsf.mkdir()
    emb.where(
        F.pmod(F.col("vec_id"), F.lit(DRIFT_ARRIVING_MOD)) != 0
    ).coalesce(1).write.parquet(str(exsf / "embeddings.parquet"))
    ivf_path = str(tmp_path / "ivf")
    write_index(spark, str(exsf), ivf_path)

    probes_dir = str(tmp_path / "arriving")
    emb.where(
        F.pmod(F.col("vec_id"), F.lit(DRIFT_ARRIVING_MOD)) == 0
    ).coalesce(1).write.parquet(probes_dir)

    got: dict[int, set] = {}

    def sink(bdf, bid):
        got[bid] = {tuple(r) for r in bdf.collect()}

    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>, label long"
    ).parquet(probes_dir)
    q = (
        drift_report_stream(spark, stream, ivf_path, sink)
        .option("checkpointLocation", checkpoint_dir("driftstream"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    want = {tuple(r) for r in ivf_drift_report(spark, SF_DIR).collect()}
    assert got == {0: want}
