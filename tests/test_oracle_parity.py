"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 (fast) — the same comparison the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from trisk_spark.registry import load_all

from .conftest import SF_DIR, assert_matches_oracle

QUERIES = load_all()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle)
NO_ORACLE = sorted(n for n, q in QUERIES.items() if not q.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_matches_duckdb(spark, duck, name):
    qd = QUERIES[name]
    sdf = qd.fn(spark, SF_DIR)
    assert_matches_oracle(sdf, duck(SF_DIR), qd.oracle)


def test_repeated_shingles_nonvacuous(spark, tmp_path):
    """The sf* corpora happen to contain zero docs with repeated
    5-grams, so ngram_counts / repetition_ratio parity there can't
    distinguish occurrence counts from document frequency. This fixture
    corpus has real repetition: parity must hold AND the metrics must be
    visibly non-zero (a vacuous oracle fails here)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    looping = " ".join(["spam ham eggs foo bar"] * 8)  # 5-gram loop x8
    docs = {
        "doc_id": [1, 2, 3],
        "text": [
            looping,
            "the quick brown fox jumps over the lazy dog today",
            looping + " trailing unique words here now",
        ],
        "lang": ["en"] * 3,
        "source": ["fixture"] * 3,
        "n_chars": [len(looping), 49, len(looping) + 32],
    }
    pq.write_table(pa.table(docs), tmp_path / "documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    for name in ("ngram_counts", "repetition_ratio"):
        qd = QUERIES[name]
        assert_matches_oracle(qd.fn(spark, str(tmp_path)), con, qd.oracle)
    rep = {
        r["doc_id"]: r["repetition_ratio"]
        for r in QUERIES["repetition_ratio"].fn(spark, str(tmp_path)).collect()
    }
    assert rep[1] > 0.8 and rep[3] > 0.5 and rep[2] == 0.0
    top = QUERIES["ngram_counts"].fn(spark, str(tmp_path)).first()
    assert top["cnt"] > 1  # occurrence count, not document frequency


@pytest.mark.parametrize("name", NO_ORACLE)
def test_runs_and_stable_schema(spark, name):
    """Oracle-less (stateful emit-semantics) queries: must run and
    produce a stable schema; value-level checks live in test_stateful."""
    qd = QUERIES[name]
    sdf = qd.fn(spark, SF_DIR)
    assert sdf.columns
    sdf.collect()  # must execute without error


LIBRARY = None  # built lazily: load_library imports the op modules


def _library():
    global LIBRARY
    if LIBRARY is None:
        from trisk_spark.registry import load_library

        LIBRARY = load_library()
    return LIBRARY


LIBRARY_NAMES = sorted(
    [
        # awaiting seats (the registry R15/R16 queue;
        # cross_split_leakage + line_dedup graduated to seats in r14)
        "budget_trim", "training_plan_budget", "shuffle_shards",
        "perplexity_buckets",
        "contamination_report", "ngram_novelty",
        # retired from the registered surface (tpch_q10 r13; tpch_q7 +
        # tpch_q14 r14; tpch_q3 + knn_bruteforce r15; revenue_rollup +
        # customers_without_orders r16 — kernels gated by registered
        # siblings); the full oracles still run here
        # (margin_pair_mining + weighted_sample graduated to @register
        # seats in r17 — the executed R17 seat trade)
        "tpch_q10", "tpch_q7", "tpch_q14", "tpch_q3", "knn_bruteforce",
        "revenue_rollup", "customers_without_orders",
        # r17-retired (the R17 seat trade): kernels driver-hash-gated
        # by dedup_minhash_lsh / cross_split_leakage and
        # source_quality_rollup respectively; full oracles keep
        # running here
        "minhash_jaccard_estimate", "gopher_rules",
        # r15-new: source×source near-dup overlap matrix (pair kernel
        # + rollup + exact pair-density under one hash)
        "source_overlap_matrix",
        # r14-new: the exact second-moment table behind PCA whitening
        # (map-side Arrow GEMM partials into a constant 2,145-key
        # shuffle; all-BIGINT values)
        "embedding_gram",
        # r14-new: the standardized-distance outlier gate over the
        # same exact moments
        "embedding_outliers",
        # r14-new: per-list routing-drift gate for the frozen IVF
        # model (arriving vs resident, smoothed KL, integer hot flag)
        "ivf_drift_report",
        # r14-new: the hybrid probe served from BOTH persisted indexes
        # (BM25 postings store + int8 IVF store + RRF fusion)
        "hybrid_store_probe",
        # r14-new: the takedown verb under value-hash evidence (probe
        # of a post-delete store vs the victims-excluded derivation),
        # on both band stores
        "dedup_takedown",
        "semantic_takedown",
        # r16-new: phrase + ordered-proximity retrieval (positional
        # lexical semantics over in-row token arrays, all-integer)
        "phrase_search",
        # r17-new: the same semantics served from the persisted
        # positional postings store (oracle = PHRASE_SEARCH_SQL
        # verbatim — exact index, probe ≡ batch kernel row for row),
        # and its takedown verb under the victims-excluded derivation
        "phrase_incremental", "phrase_takedown",
        # r16-new: leakage-safe cluster-atomic train split (no near-dup
        # pair straddles a split boundary, by construction)
        "cluster_split",
        # r16-new: per-source quality calibration on the integer ppm
        # grid (within-source rank vs global-median verdict + flips)
        "quality_calibrate",
        # r17-new: matrix-profile discovery (self-join mining, no
        # probe) — the closest non-overlapping same-series window
        # pair, the farthest-nearest-neighbor window, and motif's
        # SAX-bucketed scale path
        "ts_motif", "ts_discord", "ts_motif_sax", "ts_acf",
        # r17-new: strict first-touch conversion funnel (ordered
        # view → click → purchase, exact integer-µs waits) and cohort
        # retention (first-active-day cohorts, day-1/day-7 returns)
        "event_funnel", "user_retention",
    ]
)


def test_library_parametrize_is_exhaustive():
    # the literal list exists so collection stays Spark-free; it must
    # track load_library() exactly or an op silently loses its gate
    assert set(LIBRARY_NAMES) == set(_library())


@pytest.mark.parametrize("name", LIBRARY_NAMES)
def test_library_matches_duckdb(spark, duck, name):
    """The library surface (full oracles, awaiting driver seats — the
    registry's R13 PLAN; four ops graduated to seats in r12) gets the
    same every-round gate as the registered window: exact DuckDB parity
    at sf0.001. A library op whose oracle drifts fails here, not at
    registration time."""
    qd = _library()[name]
    assert qd.oracle, name
    assert_matches_oracle(qd.fn(spark, SF_DIR), duck(SF_DIR), qd.oracle)


def test_library_and_registry_are_disjoint():
    lib = _library()
    overlap = set(lib) & set(QUERIES)
    assert not overlap, f"library ops already registered: {sorted(overlap)}"
