"""Iterated IVF refinement: convergence semantics of the eps early
exit and the plan shape of the per-step kernel (DuckDB parity for the
fixed-T registered query lives in test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trisk_spark.functions import similarity as sim

from .conftest import SF_DIR


def _rows(df):
    return sorted(
        (r.list_id, r.n_members, r.centroid_cos) for r in df.collect()
    )


def test_eps_early_exit_stops_after_first_step(spark):
    # cosine movement is bounded by 2, so eps=3 converges immediately:
    # the loop must stop after the FIRST assignment and report exactly
    # the one-step image (iters param can't rescue a broken early exit)
    one = _rows(sim.ivf_refine_iterative(spark, SF_DIR, iters=1))
    eager = _rows(sim.ivf_refine_iterative(spark, SF_DIR, iters=5, eps=3.0))
    assert eager == one


def test_fixed_t_equals_library_default(spark):
    # the registered query is the library call at iters=REFINE_ITERS
    reg = _rows(sim.ivf_refine_iters(spark, SF_DIR))
    lib = _rows(sim.ivf_refine_iterative(spark, SF_DIR, iters=sim.REFINE_ITERS))
    assert reg == lib
    assert len(reg) > 0


def test_iteration_changes_assignments_then_converges(spark):
    # the fixture corpus must actually exercise the loop: step 2 moves
    # at least one vector relative to step 1 (otherwise the unrolled
    # oracle is vacuously equal to one step), and a tight-but-reachable
    # eps terminates before the iteration cap
    one = _rows(sim.ivf_refine_iterative(spark, SF_DIR, iters=1))
    two = _rows(sim.ivf_refine_iterative(spark, SF_DIR, iters=2))
    assert one != two, "fixture corpus: Lloyd step 2 is a no-op"
    capped = _rows(sim.ivf_refine_iterative(spark, SF_DIR, iters=50, eps=0.2))
    assert len(capped) > 0  # terminated (eps or cap) and produced lists


def test_ivf_refine_iters_plan_is_stepwise_bounded(spark):
    # the Lloyd loop materializes INSIDE the registered fn under the
    # AQE-off/model-fan conf window (r18 — the label-loop job-floor
    # discipline the r17 components fast path set; 19 scheduled jobs
    # for 3 steps dropped to the per-step materializations), so the
    # returned frame must be a bounded K-row local scan: zero Window,
    # zero Exchange, no corpus lineage left to replay. The per-step
    # bounded shape (two partial-agg Exchanges, map-side combine,
    # broadcast centroids) stays plan-pinned through one-step
    # ivf_refine (test_plans.test_ivf_refine_is_bounded_partial_agg),
    # which executes the SAME _assign_gemm/_list_means helpers the
    # loop body runs.
    import re

    from trisk_spark.functions import similarity as sim

    from .test_plans import static_plan

    plan = static_plan(spark, "ivf_refine_iters")
    assert len(re.findall(r"^\(\d+\) Window$", plan, re.M)) == 0, plan
    assert len(re.findall(r"^\(\d+\) Exchange$", plan, re.M)) == 0, plan
    assert "ExistingRDD" in plan, plan
    # the materialized result is genuinely bounded: ≤ K rows
    n_rows = sim.ivf_refine_iters(spark, SF_DIR).count()
    assert 0 < n_rows <= sim.N_CENTROIDS


def test_ann_ivf_int8_recall_vs_exact(spark):
    # the int8-indexed search must earn its 4× compression: recall@10
    # against the exact brute-force top-10 within a small margin of the
    # float IVF's own recall (the IVF probe miss, not the quantization,
    # should dominate), and never below an absolute floor
    from trisk_spark.registry import load_all, load_library

    # knn_bruteforce retired to library-only in r15 — same fn contract
    reg = {**load_all(), **load_library()}

    def topk(name):
        out: dict[int, set[int]] = {}
        for r in reg[name].fn(spark, SF_DIR).collect():
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    exact = topk("knn_bruteforce")
    ivf = topk("ann_ivf")
    ivf8 = topk("ann_ivf_int8")
    assert set(ivf8) == set(exact), "a probe lost all its results"

    def recall(approx):
        hits = sum(len(approx.get(q, set()) & nb) for q, nb in exact.items())
        return hits / sum(len(nb) for nb in exact.values())

    r_ivf, r_ivf8 = recall(ivf), recall(ivf8)
    assert r_ivf8 >= r_ivf - 0.15, (r_ivf8, r_ivf)
    assert r_ivf8 >= 0.3, r_ivf8


def test_ann_ivf_int8_plan_shape(spark):
    # index-side work must stay map-side: no SortMergeJoin anywhere
    # (probe routing, candidate join, and both re-rank joins are
    # broadcast), and the ONLY hash-partition shuffles are the two
    # candidate-sized window ranks (the corpus itself never shuffles —
    # assignment is the broadcast-model GEMM kernel over the scan)
    import re

    from .test_plans import no_auto_broadcast, static_plan

    with no_auto_broadcast(spark):
        plan = static_plan(spark, "ann_ivf_int8")
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan
    # 2 hash-partition shuffles (candidate + final rank windows, both
    # keyed on query_id → candidate-sized); the only other Exchange is
    # the SinglePartition collapse of the 64-row LOCAL centroid
    # relation into the routing array
    assert plan.count("hashpartitioning(query_id") == 2, plan
    # hash/single-partition exchanges only: the narrow-scan round-robin
    # spread feeding the assignment GEMM (catalog.spread_narrow_scan —
    # bounded, absent on a real multi-split corpus) is not a keyed
    # corpus shuffle and is excluded from the pin
    keyed = [
        m
        for m in re.findall(
            r"^\(\d+\) Exchange\n(?:[^\n]*\n)*?Arguments: (\w+)", plan, re.M
        )
        if m.lower() != "roundrobinpartitioning"
    ]
    assert len(keyed) <= 3, plan


def test_gemm_overflow_guard_fires_loudly(spark):
    # the int64 GEMM kernels must REFUSE an overflowing corpus instead
    # of silently wrapping (Spark 4's ANSI bigint fold would throw;
    # DuckDB promotes to HUGEINT — a numpy wrap would be a silent wrong
    # answer diverging from both; ADVICE r7)
    import pytest

    from trisk_spark.functions.similarity import _assign_gemm, _check_dot_bound

    _check_dot_bound(10**6, 10**6, 64)  # this corpus's class: fine
    with pytest.raises(OverflowError):
        _check_dot_bound(2**31, 2**31, 64)

    big = int(2**33)  # dim * big * big = 2^68 >> 2^63
    # norms are placeholders (the guard fires before they matter) —
    # the true squared norm would itself exceed int64
    n = spark.createDataFrame(
        [(i, [big] * 4, 1) for i in range(6)],
        "vec_id long, vec array<long>, norm long",
    )
    cents = spark.createDataFrame(
        [(i, [big] * 4, 1) for i in range(2)],
        "c_id long, c_vec array<long>, c_norm long",
    )
    with pytest.raises(Exception, match="GEMM dot bound"):
        _assign_gemm(spark, n, cents).collect()


def test_ivf_store_probe_equals_direct_query(spark, tmp_path):
    # the persisted-index probe must reproduce the one-plan query
    # row-for-row: same routing, same candidates, same exact re-rank
    from trisk_spark.functions import ivf_store
    from trisk_spark.registry import load_all

    path = str(tmp_path / "ivf")
    ivf_store.write_index(spark, SF_DIR, path)
    got = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.cosine_sim)
        for r in ivf_store.probe_index(spark, SF_DIR, path).collect()
    )
    want = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.cosine_sim)
        for r in load_all()["ann_ivf_int8"].fn(spark, SF_DIR).collect()
    )
    assert got == want and len(got) > 0


def test_ivf_store_probe_scan_is_partition_pruned(spark, tmp_path):
    # the probe must read ONLY the routed lists' partitions — the
    # whole point of the list_id-partitioned layout: the index scan
    # carries a list_id partition filter, and the pruned scan touches
    # at most N_PROBES × N_PROBE_LISTS of the written partitions
    import re

    from trisk_spark.functions import ivf_store
    from trisk_spark.functions.similarity import N_PROBE_LISTS, N_PROBES

    path = str(tmp_path / "ivf")
    ivf_store.write_index(spark, SF_DIR, path)
    n_lists_written = (
        spark.read.parquet(f"{path}/index").select("list_id").distinct().count()
    )
    probe = ivf_store.probe_index(spark, SF_DIR, path)
    plan = probe._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    m = re.search(
        r"PartitionFilters: \[list_id#\d+ (?:INSET|IN \(?)([\d, ]+)", plan
    )
    assert m, f"index scan lost its list_id partition filter:\n{plan}"
    n_probed = len(m.group(1).split(","))
    assert n_probed <= N_PROBES * N_PROBE_LISTS
    assert n_probed < n_lists_written, (
        "pruning is vacuous: the probe reads every written list"
    )


def test_ts_sax_recall_and_bucketed_plan(spark):
    # the SAX variant must (a) find a meaningful share of the brute
    # top-5 while scoring only same-word windows, and (b) plan the
    # probe-candidate meet as an EQUI-join on the word, never a cross
    # join
    from trisk_spark.registry import load_all

    from .test_plans import no_auto_broadcast, static_plan

    reg = load_all()

    def topk(name):
        out: dict[int, set] = {}
        for r in reg[name].fn(spark, SF_DIR).collect():
            out.setdefault(r.probe_user, set()).add((r.match_user, r.match_seq))
        return out

    exact = topk("ts_subsequence_match")
    sax = topk("ts_subsequence_sax")
    hits = sum(len(sax.get(q, set()) & nb) for q, nb in exact.items())
    recall = hits / sum(len(nb) for nb in exact.values())
    assert recall >= 0.25, recall  # bucket pruning trades recall for ~256x
    assert sax, "no SAX matches at all — vacuous buckets"

    with no_auto_broadcast(spark):
        plan = static_plan(spark, "ts_subsequence_sax")
    assert "BroadcastNestedLoopJoin" not in plan, plan  # no cross join
    assert "BroadcastHashJoin" in plan, plan            # word equi-join
    assert "SortMergeJoin" not in plan, plan


def test_sax_store_probe_equals_direct_query(spark, tmp_path):
    # the persisted-window-index probe must reproduce the one-plan SAX
    # query row-for-row: same probe derivation, same bucket candidates
    # (parquet round-trips the int64 windows and double stats exactly),
    # same exact-distance scoring and rank
    from trisk_spark.functions import sax_store
    from trisk_spark.registry import load_all

    path = str(tmp_path / "sax")
    sax_store.write_windows(spark, SF_DIR, path)
    got = sorted(
        (r.probe_user, r.rank, r.match_user, r.match_seq, r.dist2)
        for r in sax_store.probe_store(spark, SF_DIR, path).collect()
    )
    want = sorted(
        (r.probe_user, r.rank, r.match_user, r.match_seq, r.dist2)
        for r in load_all()["ts_subsequence_sax"].fn(spark, SF_DIR).collect()
    )
    assert got == want and len(got) > 0


def test_sax_store_probe_scan_is_partition_pruned(spark, tmp_path):
    # the probe must read ONLY its words' partitions — the structural
    # 100 TB claim (probes read ~1/256th of the stored windows per
    # distinct probe word): the windows scan carries a word partition
    # filter bounded by the probe count, strictly under the written
    # word count
    import re

    from trisk_spark.functions import sax_store
    from trisk_spark.functions.timeseries import N_TS_PROBES

    path = str(tmp_path / "sax")
    sax_store.write_windows(spark, SF_DIR, path)
    n_words_written = (
        spark.read.parquet(f"{path}/windows").select("word").distinct().count()
    )
    probe = sax_store.probe_store(spark, SF_DIR, path)
    plan = probe._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    m = re.search(
        r"PartitionFilters: \[word#\d+ (?:INSET|IN \(?)([\d, ]+)", plan
    )
    assert m, f"windows scan lost its word partition filter:\n{plan}"
    n_probed = len(m.group(1).split(","))
    assert n_probed <= N_TS_PROBES
    assert n_probed < n_words_written, (
        "pruning is vacuous: the probe reads every written word"
    )


def test_stream_probe_collects_are_ceiling_guarded(spark):
    # r9 VERDICT #5: the per-batch probe collects in the store probe
    # paths must fail LOUD past their row ceiling (a flooded probe
    # topic must not become driver memory / an over-broadcast plan),
    # and the check itself must be bounded (folded into an existing
    # bounded collect, never a full materialization of the flood)
    import pytest

    from trisk_spark.functions import ivf_store, sax_store

    df = spark.range(10).select(
        F.col("id").alias("probe_user"), F.lit(1).alias("x")
    )
    # under the cap: passes through with every row intact
    assert len(sax_store._collect_probe_rows(df, 10)) == 10
    with pytest.raises(ValueError, match="probe micro-batch exceeds 9"):
        sax_store._collect_probe_rows(df, 9)

    # ivf guard folded into the routing collect (r11 VERDICT #3): a
    # qlists-shaped frame of 10 probes x N_PROBE_LISTS routing rows
    n = 10 * sim.N_PROBE_LISTS
    qlists = spark.range(n).select(
        F.col("id").alias("query_id"), (F.col("id") % 3).alias("list_id")
    )
    # at the cap: fine, and the routed set comes back sorted
    assert ivf_store._routed_lists_checked(qlists, 10) == [0, 1, 2]
    with pytest.raises(ValueError, match="probe batch exceeds 9"):
        ivf_store._routed_lists_checked(qlists, 9)


def test_sax_store_stats_parity_and_skew_detection(spark, tmp_path):
    # the SAX store's health stats mirror ivf_store.index_stats:
    # DuckDB parity over the written partitioned parquet, and the
    # imbalance detector reads ≥ 1 with at least two words on this
    # corpus (otherwise the word-pruning story is vacuous here)
    import duckdb

    from trisk_spark.functions import sax_store

    from .conftest import assert_matches_oracle

    path = str(tmp_path / "sax")
    sax_store.write_windows(spark, SF_DIR, path)
    con = duckdb.connect()
    oracle = f"""
      WITH per AS (
        SELECT word, COUNT(*) AS n
        FROM read_parquet('{path}/windows/*/*.parquet', hive_partitioning=1)
        GROUP BY word
      )
      SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(n) AS BIGINT) AS n_windows,
             CAST(MIN(n) AS BIGINT) AS min_word,
             CAST(MAX(n) AS BIGINT) AS max_word,
             CAST(ROUND(AVG(n), 6) AS DOUBLE) AS avg_word,
             CAST(ROUND(MAX(n) / (SUM(n) / CAST(COUNT(*) AS DOUBLE)), 6)
                  AS DOUBLE) AS imbalance
      FROM per
    """
    got = sax_store.store_stats(spark, path)
    assert_matches_oracle(got, con, oracle)
    row = got.collect()[0]
    assert row.n_words >= 2 and row.imbalance >= 1.0


def test_recall_frame_identity_and_store_probe(spark, tmp_path):
    # recall of a result against itself is 1.0 for every probe (the
    # estimator is sane), and the generic helper measures the
    # persisted-store probe path too (probe_index ≡ ann_ivf_int8 is
    # separately pinned, so its recall must equal the direct one)
    from trisk_spark.functions import ivf_store
    from trisk_spark.functions.similarity import (
        N_PROBES,
        ann_ivf_int8,
        knn_bruteforce,
        recall_frame,
    )

    brute = knn_bruteforce(spark, SF_DIR)
    ident = recall_frame(brute, brute).collect()
    assert len(ident) == N_PROBES
    assert all(r.recall == 1.0 and r.n_hits == r.n_true for r in ident)

    path = str(tmp_path / "ivf")
    ivf_store.write_index(spark, SF_DIR, path)
    via_store = {
        r.query_id: (r.n_hits, r.recall)
        for r in recall_frame(
            brute, ivf_store.probe_index(spark, SF_DIR, path)
        ).collect()
    }
    direct = {
        r.query_id: (r.n_hits, r.recall)
        for r in recall_frame(brute, ann_ivf_int8(spark, SF_DIR)).collect()
    }
    assert via_store == direct and len(direct) == N_PROBES


def test_ivf_append_equals_rebuild_under_same_model(spark, tmp_path):
    """append_index: probing the appended store must equal probing an
    index REBUILT over old ∪ new — exact equality when the wave's
    vec_ids sit above the model-seeding ids (the stored model and the
    rebuild's model coincide), which isolates the append path itself.
    A probe whose true neighbor arrived in the wave must find it."""
    from trisk_spark.catalog import table
    from trisk_spark.functions import ivf_store
    from trisk_spark.functions.similarity import _valid_embeddings

    emb = _valid_embeddings(table(spark, SF_DIR, "embeddings"))
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    cut = int(max_id) - 20  # the last 21 ids form the arriving wave
    existing = emb.where(F.col("vec_id") <= cut)
    wave_src = emb.where(F.col("vec_id") > cut)
    assert wave_src.count() > 0

    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    ivf_store.write_index(spark, SF_DIR, inc)  # build over... existing only:
    # rebuild both stores from explicit frames via the same writer path
    import shutil

    shutil.rmtree(inc)
    # write_index takes sf_dir; build the two stores by writing the
    # full corpus index (model seeds from the SMALLEST ids — identical
    # for both) and deriving the "existing" store as full minus wave
    ivf_store.write_index(spark, SF_DIR, full)
    cents = spark.read.parquet(f"{full}/centroids")
    idx_existing = spark.read.parquet(f"{full}/index").where(
        F.col("list_id").isNotNull() & (F.col("vec_id") <= cut)
    )
    cents.write.parquet(f"{inc}/centroids")
    idx_existing.write.partitionBy("list_id").parquet(f"{inc}/index")

    ivf_store.append_index(spark, wave_src.select("vec_id", "embedding"), inc)

    def snap(path):
        return sorted(
            (r.query_id, r.rank, r.neighbor_id, r.cosine_sim)
            for r in ivf_store.probe_index(spark, SF_DIR, path).collect()
        )

    assert snap(inc) == snap(full)

    # an arriving vector is findable: probe the wave's own first
    # vector against the appended store — its exact-cosine top-1 may
    # be anywhere, but the result set must be non-empty and contain
    # only valid neighbors (smoke that routed reads include the new
    # files)
    one = wave_src.orderBy("vec_id").limit(1)
    got = ivf_store.probe_frame(spark, one, emb, inc).collect()
    assert got and all(r.neighbor_id is not None for r in got)


def test_ann_lsh_bucket_is_srp_sign_band_kernel(spark):
    """COMPOSED_SITTER_WITNESS pin (r13 flip): ``ann_lsh_bucketed``'s
    bucket kernel is the sign-of-coordinate banding kernel
    ``cosine_near_dup_lsh`` drives through its driver hash
    (srp_band_val) — same sign bits, bit order reversed, width 4: for
    every embedding, _bucket(v) == rev4(srp_band_val(v, 0) & 0b1111).
    The probe shape around it (broadcast query side, bucket equi-join,
    row_number top-k) is ``ann_ivf``'s probe kernel with sign-bucket
    routing instead of centroid routing — ann_ivf's driver hash gates
    that half."""
    from trisk_spark.catalog import table

    emb = sim._valid_embeddings(table(spark, SF_DIR, "embeddings"))
    rows = emb.select(
        sim._bucket(F.col("embedding")).alias("b"),
        (sim.srp_band_val(F.col("embedding"), 0) % 16).alias("s"),
    ).collect()
    assert len(rows) > 0

    def rev4(x):
        return sum(((x >> i) & 1) << (3 - i) for i in range(4))

    assert all(r.b == rev4(r.s) for r in rows)


# ------------------- embedding covariance / PCA (r14) -----------------


def test_pca_basis_properties_and_projection_replay(spark):
    """The driver-side eigh half of the PCA family (the gram table's
    oracle parity lives in test_oracle_parity's library pass):
    orthonormal basis, descending non-negative eigenvalues (up to eigh
    noise), deterministic sign convention, and the distributed
    projection must equal a pure-numpy replay on the same fitted
    model. Variance accounting pins the covariance assembly: total
    eigenvalue mass of a FULL basis equals the covariance trace."""
    import numpy as np

    from trisk_spark.catalog import table

    k = 8
    comps, vals, mu = sim.pca_model(spark, SF_DIR, k=k)
    assert comps.shape == (k, sim.DIM) and vals.shape == (k,)
    assert np.allclose(comps @ comps.T, np.eye(k), atol=1e-9)
    assert all(vals[i] >= vals[i + 1] - 1e-12 for i in range(k - 1))
    assert vals[-1] >= -1e-9
    for c in comps:
        assert c[int(np.argmax(np.abs(c)))] >= 0  # sign convention

    # full-basis eigenvalue mass == covariance trace (exact-moment
    # assembly check, independent of eigenvector order)
    rows = sim.embedding_gram(spark, SF_DIR).collect()
    comps_full, vals_full, _ = sim.pca_from_gram_rows(rows, k=sim.DIM)
    n = next(int(r["g"]) for r in rows if r["i"] == -1 and r["j"] == -1)
    s = float(sim.SCALE)
    diag = {
        r["i"]: float(r["g"]) for r in rows
        if r["i"] == r["j"] and r["i"] >= 0
    }
    trace = sum(
        diag[i] / (n * s * s) - (
            next(
                float(r["g"]) for r in rows
                if r["i"] == i and r["j"] == sim.GRAM_SUM_J
            ) / (n * s)
        ) ** 2
        for i in range(sim.DIM)
    )
    assert abs(vals_full.sum() - trace) < 1e-9

    emb = table(spark, SF_DIR, "embeddings")
    proj = {
        r.vec_id: np.array(r.proj)
        for r in sim.pca_project_frame(emb, comps, mu).collect()
    }
    sample = sim._valid_embeddings(emb).limit(64).collect()
    X = np.array([r.embedding for r in sample])
    want = (X - mu) @ comps.T
    for row_i, r in enumerate(sample):
        assert np.allclose(proj[r.vec_id], want[row_i], atol=1e-12)


def test_pca_reconstruction_error_decreases_with_k(spark):
    """More retained components can only shrink the mean squared
    reconstruction error — the monotonicity that makes the basis a
    usable whitening preflight (pick k where the tail flattens)."""
    import numpy as np

    from trisk_spark.catalog import table

    rows = sim.embedding_gram(spark, SF_DIR).collect()
    emb = table(spark, SF_DIR, "embeddings")
    sample = sim._valid_embeddings(emb).limit(128).collect()
    X = np.array([r.embedding for r in sample])
    errs = []
    for k in (2, 8, 32, sim.DIM):
        comps, _vals, mu = sim.pca_from_gram_rows(rows, k=k)
        rec = (X - mu) @ comps.T @ comps + mu
        errs.append(float(((X - rec) ** 2).mean()))
    assert all(errs[i] >= errs[i + 1] - 1e-12 for i in range(len(errs) - 1))
    assert errs[-1] < 1e-18  # full basis reconstructs exactly


def test_pca_gram_empty_and_hostile_vectors(spark):
    """NULL / ragged / NULL-element vectors are excluded by the shared
    validity gate before the moment pass (count row proves it), and an
    all-invalid corpus fails loud at fit time."""
    import pytest

    emb = spark.createDataFrame(
        [
            (1, [0.5] * sim.DIM),
            (2, None),
            (3, [0.1] * 7),
            (4, [None] + [0.2] * (sim.DIM - 1)),
            (5, [-0.5] * sim.DIM),
        ],
        f"vec_id long, embedding array<double>",
    )
    rows = sim.embedding_gram_frame(emb).collect()
    n = next(int(r["g"]) for r in rows if r["i"] == -1 and r["j"] == -1)
    assert n == 2
    # sums cancel exactly on the scaled grid: 0.5 and -0.5 per dim
    assert all(
        int(r["g"]) == 0
        for r in rows
        if r["j"] == sim.GRAM_SUM_J and r["i"] >= 0
    )

    bad = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="no valid embeddings"):
        sim.pca_from_gram_rows(sim.embedding_gram_frame(bad).collect())


def test_embedding_outliers_flags_planted_vector(spark):
    """A crafted corpus with one far-out vector: the planted row must
    be the ONLY flag, its dist2 must dwarf the inliers', and a
    zero-variance dimension must contribute exactly 0 (the CASE guard)
    — all on the exact-moment arithmetic the corpus oracle
    value-hashes in test_oracle_parity's library pass."""
    import numpy as np

    rng = [(0.1 * ((i * 7) % 5 - 2)) for i in range(sim.DIM)]
    rows = []
    for vid in range(40):
        v = [rng[i] * (1.0 + 0.01 * ((vid + i) % 7)) for i in range(sim.DIM)]
        v[0] = 0.25  # dim 0 constant across the corpus → zero variance
        rows.append((vid, v))
    planted = [x * 40.0 for x in rng]
    planted[0] = 0.25  # keep the constant dim constant
    rows.append((999, planted))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in sim.embedding_outliers_frame(emb).collect()}
    assert len(out) == 41
    flagged = {v for v, r in out.items() if r.is_outlier}
    assert flagged == {999}
    inlier_max = max(r.dist2 for v, r in out.items() if v != 999)
    assert out[999].dist2 > 10 * inlier_max

    # zero-variance dim contributes 0: a corpus where EVERY dim is
    # constant yields dist2 == 0 for every vector
    const = spark.createDataFrame(
        [(i, [0.5] * sim.DIM) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    res = sim.embedding_outliers_frame(const).collect()
    assert all(r.dist2 == 0.0 and not r.is_outlier for r in res)

    # empty/invalid corpus → empty frame, not an error
    bad = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<double>"
    )
    assert sim.embedding_outliers_frame(bad).count() == 0


def test_margin_mining_suppresses_hub(spark, tmp_path):
    """The ratio-margin criterion's defining property (Artetxe &
    Schwenk): a HUB — close to everything on the opposite side — wins
    the raw-cosine ranking but loses on margin, because its own dense
    neighborhood inflates the denominator. Fixture: side A shares a
    common direction c; side B holds the hub h = c (cos 0.8 to every
    A vector) and a true match t whose similarity is specific to probe
    0 (cos 0.66 to it, ~0.24 to the rest). Raw top-1 for probe 0 is h;
    margin top-1 must be t, accepted. The DuckDB oracle must agree on
    this fixture corpus too."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .conftest import assert_matches_oracle

    def vec(parts):
        v = [0.0] * sim.DIM
        for d, x in parts:
            v[d] = x
        return v

    rows = [(0, vec([(1, 0.8), (2, 0.6)]))]            # probe x
    rows += [
        (2 + 2 * j, vec([(1, 0.8), (10 + j, 0.6)]))    # A fillers
        for j in range(5)
    ]
    rows += [
        (1, vec([(1, 1.0)])),                          # hub h = c
        (3, vec([(1, 0.3), (2, 0.7), (40, 0.65)])),    # true match t
        (5, vec([(50, 1.0)])),
        (7, vec([(51, 1.0)])),
        (9, vec([(52, 1.0)])),
    ]
    pq.write_table(
        pa.table({
            "vec_id": [r[0] for r in rows],
            "embedding": [r[1] for r in rows],
            "label": [0] * len(rows),
        }),
        tmp_path / "embeddings.parquet",
    )
    sf = str(tmp_path)

    # raw-cosine top-1 for probe 0 is the hub...
    from pyspark.sql import functions as F

    emb = sim._valid_embeddings(
        spark.read.parquet(f"{sf}/embeddings.parquet")
    )
    n = sim._with_norm(emb, "vec_id", "n").where(F.col("n_norm") > 0)
    raw = sim._gemm_topk(
        spark,
        n.where(F.col("n_id") == 0),
        n.where(F.pmod(F.col("n_id"), F.lit(2)) == 1),
        1,
    ).collect()
    assert raw[0].neighbor_id == 1  # the hub wins on raw cosine

    # ...but the margin ranking flips to the true match
    out = {r.query_id: r for r in sim.margin_pair_mining(spark, sf).collect()}
    assert out[0].match_id == 3 and out[0].accepted
    assert out[0].margin > 1.06
    # the A fillers legitimately keep the hub (it IS their best match)
    assert all(out[2 + 2 * j].match_id == 1 for j in range(5))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet')"
    )
    assert_matches_oracle(
        sim.margin_pair_mining(spark, sf), con, sim.MARGIN_PAIR_SQL
    )
