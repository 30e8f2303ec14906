"""IVF-PQ: recall vs exact, plan shape, encode structure, degenerate
corpora (DuckDB parity for both registered queries lives in
test_oracle_parity; hostile-corpus parity in test_parity_edges)."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq_
import pytest

from trisk_spark.functions import pq as pqm
from trisk_spark.registry import load_all

from .conftest import SF_DIR, assert_matches_oracle


def _topk(spark, reg, name, sf=SF_DIR):
    out: dict[int, set[int]] = {}
    for r in reg[name].fn(spark, sf).collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_ann_ivf_pq_recall_vs_exact(spark):
    # the 8-byte code index must earn its 32× compression: the ADC
    # candidate cut + exact re-rank should hold recall@10 within a
    # small margin of the int8 index (the IVF probe miss, not the PQ
    # approximation, should dominate — at sf0.001 all three index
    # variants measure identical 0.54), and never below a floor
    # knn_bruteforce retired to library-only in r15 — fetch its QueryDef
    # from the library surface (same fn/oracle contract)
    from trisk_spark.registry import load_library

    reg = {**load_all(), **load_library()}
    exact = _topk(spark, reg, "knn_bruteforce")
    ivf8 = _topk(spark, reg, "ann_ivf_int8")
    ivfpq = _topk(spark, reg, "ann_ivf_pq")
    assert set(ivfpq) == set(exact), "a probe lost all its results"

    def recall(approx):
        hits = sum(len(approx.get(q, set()) & nb) for q, nb in exact.items())
        return hits / sum(len(nb) for nb in exact.values())

    r8, rpq = recall(ivf8), recall(ivfpq)
    assert rpq >= r8 - 0.15, (rpq, r8)
    assert rpq >= 0.3, rpq


def test_ann_ivf_pq_plan_shape(spark):
    # identical scale shape to ann_ivf_int8: index build is the fused
    # kernel over the scan (zero shuffle), every join broadcast (no
    # SortMergeJoin), and the ONLY hash-partition shuffles are the two
    # candidate-sized query_id window ranks; the third Exchange is the
    # SinglePartition collapse of the 64-row routing relation
    import re

    from .test_plans import no_auto_broadcast, static_plan

    with no_auto_broadcast(spark):
        plan = static_plan(spark, "ann_ivf_pq")
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert plan.count("hashpartitioning(query_id") == 2, plan
    assert len(re.findall(r"^\(\d+\) Exchange$", plan, re.M)) <= 3, plan


def test_pq_encode_structure(spark):
    # every valid vector encodes to exactly PQ_M codes, each within
    # [0, PQ_KSUB) — and the encode is total over the valid corpus
    # (same row universe as the int8 quantizer's qnorm>0 gate)
    rows = load_all()["pq_encode"].fn(spark, SF_DIR).collect()
    by_vec: dict[int, dict[int, int]] = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, {})[r.subspace] = r.code
    assert len(by_vec) > 0
    for vid, codes in by_vec.items():
        assert sorted(codes) == list(range(pqm.PQ_M)), (vid, codes)
        assert all(0 <= c < pqm.PQ_KSUB for c in codes.values()), (vid, codes)


def test_pq_identical_corpus_single_code_and_full_clique(spark, tmp_path):
    # a corpus of identical vectors: every row must take codeword 0 in
    # every subspace (the one distinct codeword, ties to the smallest
    # id), ADC cosine is exactly 1, and the search returns each
    # probe's TOP_K smallest-id neighbors at cosine 1 — both engines
    n = 60
    vec = [0.25] * 64
    tab = pa.table(
        {
            "vec_id": pa.array(list(range(n)), pa.int64()),
            "embedding": pa.array([vec] * n, pa.list_(pa.float32())),
            "label": pa.array([0] * n, pa.int32()),
        }
    )
    pq_.write_table(tab, tmp_path / "embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    reg = load_all()
    enc = reg["pq_encode"].fn(spark, str(tmp_path)).collect()
    assert len(enc) == n * pqm.PQ_M
    assert all(r.code == 0 for r in enc)
    sdf = reg["ann_ivf_pq"].fn(spark, str(tmp_path))
    got = {(r.query_id, r.rank, r.neighbor_id, r.cosine_sim)
           for r in sdf.collect()}
    from trisk_spark.functions.similarity import N_PROBES, TOP_K

    want = {
        (q, k + 1, [i for i in range(n) if i != q][k], 1.0)
        for q in range(N_PROBES)
        for k in range(TOP_K)
    }
    assert got == want
    assert_matches_oracle(
        reg["ann_ivf_pq"].fn(spark, str(tmp_path)), con,
        reg["ann_ivf_pq"].oracle,
    )


def test_pq_codebook_shape_degrades_on_tiny_corpus():
    # fewer than PQ_KSUB valid rows: the codebook keeps LIMIT
    # semantics (ksub = corpus size), mirroring the oracle's
    import numpy as np

    cq = np.arange(5 * 64, dtype=np.int64).reshape(5, 64)
    cb = pqm._pq_codebook(cq)
    assert cb.shape == (pqm.PQ_M, 5, pqm.PQ_DSUB)
    # subspace s, codeword w is row w's s-th subvector
    assert (cb[2][3] == cq[3, 2 * pqm.PQ_DSUB:3 * pqm.PQ_DSUB]).all()


def test_adc_equals_full_int8_dot_on_reconstructions(spark):
    # ADC's lookup-table sum must equal the plain dot of the probe
    # against the RECONSTRUCTED vector (concatenated codewords) — the
    # defining identity of product quantization, checked on real data
    import numpy as np

    from trisk_spark.functions.similarity import (
        _int8_centroid_model,
        _valid_embeddings,
    )
    from trisk_spark.catalog import table

    emb = _valid_embeddings(table(spark, SF_DIR, "embeddings"))
    cq, cn, cids, cents = _int8_centroid_model(spark, emb)
    cb = pqm._pq_codebook(cq)
    codes, recon = pqm._pq_encode_np(cq, cb)  # encode the model rows
    for i in range(cq.shape[0]):
        rec = np.concatenate([cb[s][codes[i, s]] for s in range(pqm.PQ_M)])
        assert (rec * rec).sum() == recon[i]
        p = cq[(i + 1) % cq.shape[0]]
        lut = sum(
            int(cb[s][codes[i, s]] @ p[s * pqm.PQ_DSUB:(s + 1) * pqm.PQ_DSUB])
            for s in range(pqm.PQ_M)
        )
        assert lut == int(rec @ p)
    # the first PQ_KSUB rows ARE the codewords: they encode to
    # themselves with zero reconstruction error
    for w in range(min(pqm.PQ_KSUB, cq.shape[0])):
        assert (codes[w] == w).all()


def test_pq_store_adc_probe_equals_direct_query(spark, tmp_path):
    # the persisted-index ADC probe must reproduce the one-plan
    # ann_ivf_pq row-for-row: same routing, same codebook (rebuilt
    # from the stored centroid model), same ADC cut, same exact
    # re-rank
    from trisk_spark.functions import ivf_store

    path = str(tmp_path / "ivf")
    ivf_store.write_index(spark, SF_DIR, path)
    got = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.cosine_sim)
        for r in ivf_store.probe_index_adc(spark, SF_DIR, path).collect()
    )
    want = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.cosine_sim)
        for r in load_all()["ann_ivf_pq"].fn(spark, SF_DIR).collect()
    )
    assert got == want and len(got) > 0


def test_pq_store_adc_scan_is_partition_and_column_pruned(spark, tmp_path):
    # the ADC probe's index scan must be pruned BOTH ways: routed
    # list_id partitions only (PartitionFilters), and — the point of
    # PQ — the 64-element qvec column must NOT be read (ReadSchema
    # carries codes/recon_norm, 8 bytes of payload per row)
    import re

    from trisk_spark.functions import ivf_store
    from trisk_spark.functions.similarity import N_PROBE_LISTS, N_PROBES

    path = str(tmp_path / "ivf")
    ivf_store.write_index(spark, SF_DIR, path)
    probe = ivf_store.probe_index_adc(spark, SF_DIR, path)
    plan = probe._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    m = re.search(
        r"PartitionFilters: \[list_id#\d+ (?:INSET|IN \(?)([\d, ]+)", plan
    )
    assert m, f"index scan lost its list_id partition filter:\n{plan}"
    assert len(m.group(1).split(",")) <= N_PROBES * N_PROBE_LISTS
    scans = [
        s for s in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        if "codes" in s
    ]
    assert scans, f"no index scan found in plan:\n{plan}"
    for s in scans:
        assert "qvec" not in s and "qnorm" not in s, (
            f"ADC probe reads the int8 vectors it exists to avoid: {s}"
        )


def test_cluster_cap_sample_oracle_parity_and_semantics(spark):
    # registered + driver-gated since r10: full DuckDB
    # oracle parity at SF_DIR, plus the defining properties — no
    # cluster exceeds the cap, ranks are 1..n within cluster, kept
    # rows are a subset of the valid corpus
    from trisk_spark.functions.sampling import (
        CLUSTER_CAP,
        cluster_cap_sample,
        cluster_cap_sql,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    sdf = cluster_cap_sample(spark, SF_DIR)
    assert_matches_oracle(sdf, con, cluster_cap_sql())
    rows = sdf.collect()
    per = {}
    for r in rows:
        per.setdefault(r.list_id, []).append(r.rank)
    assert per and all(
        sorted(v) == list(range(1, len(v) + 1)) and len(v) <= CLUSTER_CAP
        for v in per.values()
    )
    # the cap binds on this corpus (otherwise the test is vacuous)
    assert any(len(v) == CLUSTER_CAP for v in per.values())


def test_cluster_cap_sample_plan_single_shuffle(spark):
    # assignment is the broadcast-model kernel over the scan; the ONLY
    # exchange is the list_id hash partitioning for the rank window
    import re

    from trisk_spark.functions.sampling import cluster_cap_sample
    from .test_plans import no_auto_broadcast

    with no_auto_broadcast(spark):
        plan = cluster_cap_sample(spark, SF_DIR)._jdf.queryExecution(
        ).explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("hashpartitioning(list_id") == 1, plan
    assert len(re.findall(r"^\(\d+\) Exchange$", plan, re.M)) == 1, plan


def test_pq_train_reduces_reconstruction_error_and_is_deterministic(spark):
    # Lloyd refinement must strictly help on real data: total integer
    # reconstruction error after two updates <= the seeded codebook's
    # (strict < on this corpus — pinned so the iteration isn't a
    # no-op), and the whole procedure is deterministic (no RNG)
    cb1, errs1 = pqm.pq_train(spark, SF_DIR, iters=3)
    cb2, errs2 = pqm.pq_train(spark, SF_DIR, iters=3)
    assert errs1 == errs2
    assert (cb1 == cb2).all()
    assert errs1[2] <= errs1[1] <= errs1[0], errs1
    assert errs1[2] < errs1[0], "refinement was a no-op on this corpus"


def test_ann_search_pq_refined_codebook_end_to_end(spark):
    # the refined codebook drops into the same search plan: default
    # codebook reproduces the registered query exactly; the refined
    # one still returns a complete exact-re-ranked top-k per probe
    from trisk_spark.functions.similarity import N_PROBES, TOP_K

    base = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.cosine_sim)
        for r in pqm.ann_search_pq(spark, SF_DIR).collect()
    )
    reg = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.cosine_sim)
        for r in load_all()["ann_ivf_pq"].fn(spark, SF_DIR).collect()
    )
    assert base == reg

    cb, _ = pqm.pq_train(spark, SF_DIR, iters=1)
    rows = pqm.ann_search_pq(spark, SF_DIR, codebook=cb).collect()
    per = {}
    for r in rows:
        per.setdefault(r.query_id, set()).add(r.rank)
    assert len(per) == N_PROBES
    assert all(ranks == set(range(1, TOP_K + 1)) for ranks in per.values())



def test_index_stats_parity_and_skew_detection(spark, tmp_path):
    # health stats over the written store match DuckDB over the same
    # parquet; a degenerate one-cluster corpus maxes the imbalance
    from trisk_spark.functions import ivf_store

    path = str(tmp_path / "ivf")
    ivf_store.write_index(spark, SF_DIR, path)
    con = duckdb.connect()
    got = ivf_store.index_stats(spark, path)
    oracle = f"""
      WITH per AS (
        SELECT list_id, COUNT(*) AS n
        FROM read_parquet('{path}/index/*/*.parquet', hive_partitioning=1)
        GROUP BY list_id
      )
      SELECT CAST(COUNT(*) AS BIGINT) AS n_lists,
             CAST(SUM(n) AS BIGINT) AS n_vectors,
             CAST(MIN(n) AS BIGINT) AS min_list,
             CAST(MAX(n) AS BIGINT) AS max_list,
             CAST(ROUND(AVG(n), 6) AS DOUBLE) AS avg_list,
             CAST(ROUND(MAX(n) / (SUM(n) / CAST(COUNT(*) AS DOUBLE)), 6)
                  AS DOUBLE) AS imbalance
      FROM per
    """
    assert_matches_oracle(got, con, oracle)
    row = got.collect()[0]
    assert row.n_lists >= 2 and row.imbalance >= 1.0


def test_pq_ksub_above_16_production_shape(spark, monkeypatch):
    # the production parameter (ksub up to 256, a full byte per code)
    # must be a parameter change, not a plan change: widen the codebook
    # past 16 and the kernels, identities, and the full search pipeline
    # must hold unchanged (r9 VERDICT next-round #4)
    import numpy as np

    from trisk_spark.catalog import table
    from trisk_spark.functions.similarity import (
        N_PROBES,
        TOP_K,
        _int8_centroid_model,
        _valid_embeddings,
    )

    monkeypatch.setattr(pqm, "PQ_KSUB", 32)
    emb = _valid_embeddings(table(spark, SF_DIR, "embeddings"))
    cq, cn, cids, cents = _int8_centroid_model(spark, emb)
    cb = pqm._pq_codebook(cq)
    assert cb.shape == (pqm.PQ_M, 32, pqm.PQ_DSUB)

    codes, recon = pqm._pq_encode_np(cq, cb)
    assert int(codes.max()) >= 16, "the widened codebook half is unused"
    # codeword rows reconstruct themselves exactly (zero error), and
    # every assignment is a true argmin vs brute force
    for w in range(32):
        rec = np.concatenate(
            [cb[s][codes[w, s]] for s in range(pqm.PQ_M)]
        )
        assert (rec == cq[w]).all()
    for i in range(cq.shape[0]):
        for s in range(pqm.PQ_M):
            sub = cq[i, s * pqm.PQ_DSUB:(s + 1) * pqm.PQ_DSUB]
            d = ((cb[s] - sub) ** 2).sum(axis=1)
            assert d[codes[i, s]] == d.min()

    # the full ADC search pipeline accepts the wider codebook
    rows = pqm.ann_search_pq(spark, SF_DIR, codebook=cb).collect()
    per: dict[int, set[int]] = {}
    for r in rows:
        per.setdefault(r.query_id, set()).add(r.rank)
    assert len(per) == N_PROBES
    assert all(v == set(range(1, TOP_K + 1)) for v in per.values())


def test_pq_train_lloyd_refine_shares_registered_path(spark):
    # pq_encode_trained must BE pq_train's codebook applied by the
    # shared fused kernel: re-derive it library-side and compare codes
    import numpy as np

    from trisk_spark.catalog import table
    from trisk_spark.functions.similarity import _valid_embeddings

    cb, errs = pqm.pq_train(spark, SF_DIR, iters=pqm.PQ_TRAIN_ITERS)
    emb = _valid_embeddings(table(spark, SF_DIR, "embeddings"))
    cq, cn, cids, cents, seed = pqm._pq_model(spark, emb)
    assert not (cb == seed).all(), "training was a no-op on this corpus"
    enc = pqm._quantize_assign_pq_gemm(spark, emb, cq, cn, cids, cb)
    lib = sorted(
        (r.vec_id, s, int(c))
        for r in enc.collect()
        for s, c in enumerate(r.codes)
    )
    reg = sorted(
        (r.vec_id, r.subspace, r.code)
        for r in load_all()["pq_encode_trained"].fn(spark, SF_DIR).collect()
    )
    assert lib == reg and len(lib) > 0


def test_plan_store_composes_identical_plans(spark, tmp_path):
    # the persisted curation artifacts (manifest + cluster ranks) must
    # compose the SAME training_plan / pack_plan row-for-row as the
    # one-plan registered queries — the ivf_store probe≡query contract
    # applied to the curation pipeline
    from trisk_spark.functions.sampling import (
        pack_plan_over_store,
        training_plan_over_store,
        write_plan_store,
    )

    path = str(tmp_path / "plan")
    write_plan_store(spark, SF_DIR, path)
    reg = load_all()
    for name, over in (
        ("training_plan", training_plan_over_store),
        ("pack_plan", pack_plan_over_store),
    ):
        got = sorted(map(tuple, over(spark, path).collect()))
        want = sorted(map(tuple, reg[name].fn(spark, SF_DIR).collect()))
        assert got == want and len(got) > 0, name


def test_plan_store_reads_are_pruned(spark, tmp_path):
    # the store earns its keep structurally: the epoch-factor stats
    # pass reads ONLY the split=train manifest partitions
    # (PartitionFilters), and the cluster-ranks read column-prunes to
    # (vec_id, rank) — list_id never leaves the parquet footer
    import re

    from trisk_spark.functions.sampling import (
        training_plan_over_store,
        write_plan_store,
    )

    path = str(tmp_path / "plan")
    write_plan_store(spark, SF_DIR, path)
    df = training_plan_over_store(spark, path)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert re.search(r"PartitionFilters: \[[^\]]*split[^\]]* = train", plan), (
        f"stats pass lost its split partition filter:\n{plan}"
    )
    rank_scans = [
        s for s in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        if "rank" in s
    ]
    assert rank_scans, f"no cluster_ranks scan found:\n{plan}"
    for s in rank_scans:
        assert "list_id" not in s, (
            f"cluster_ranks read is not column-pruned: {s}"
        )


def test_pq_encode_is_trained_encode_at_zero_iters(spark):
    """COMPOSED_SITTER_WITNESS pin (r13 flip): ``pq_encode`` is wholly
    composed by ``pq_encode_trained`` — the seed IS iteration 0. Both
    share _pq_model's deterministic seed codebook and the fused
    _quantize_assign_pq_gemm encode; training with iters=0 must
    reproduce the seed encode row-for-row, so the trained query's
    driver hash gates the seed query's whole kernel."""
    reg = load_all()
    seed = sorted(map(tuple, reg["pq_encode"].fn(spark, SF_DIR).collect()))
    zero = sorted(
        map(tuple, pqm.pq_encode_trained(spark, SF_DIR, iters=0).collect())
    )
    assert seed == zero and len(seed) > 0
