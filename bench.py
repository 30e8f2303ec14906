#!/usr/bin/env python3
"""Benchmark: run headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is materialized through the noop sink so every output column
is computed (a bare count() would let Catalyst prune the projections
we're trying to measure).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trisk_spark.registry import load_all
from trisk_spark.session import get_spark

#: Representative mix: scans, broadcast joins, shuffles, windows,
#: window functions, Arrow-batched stateful, dedup/similarity.
HEADLINE = [
    "nexmark_q1",
    "nexmark_q2",
    "nexmark_q5",
    "nexmark_q8",
    "nexmark_q11",
    "tpch_q1",
    # tpch_q3 retired to library-only in r15 (kernels covered by
    # q5/q18/top_orders_per_customer; full oracle still runs every
    # round in test_oracle_parity's library pass) — dropped from the
    # bench with its registry seat; its baseline entry stays for the
    # record, as tpch_q10's did in r13
    "tpch_q5",
    # tpch_q10 retired to library-only in r13 (kernels covered by
    # q3/q5/q7/q18; full oracle still runs every round in
    # test_oracle_parity's library pass) — dropped from the bench with
    # its registry seat; its baseline entry stays for the record
    "tpch_q18",
    "keyed_agg",
    "time_evictor_window",
    "wordcount",
    "stock_matchmaker",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_simhash",
    "dedup_substring",
    "ngram_jaccard",
    # knn_bruteforce retired to library-only in r15 (exact-GEMM kernel
    # covered by cosine_near_dup_exact/knn_label_vote; ann_recall still
    # drives it verbatim inside its own benched time) — dropped with
    # its seat; baseline entry stays for the record
    "ann_ivf",
    "cosine_near_dup_lsh",
    "interval_join",
    "asof_join",
    "count_window",
    "media_frame_sample",
    "fraud_alerts",
    "pii_redact",
    "url_normalize",
    "sequence_pack",
    "length_percentiles",
    "doc_chunk",
    "source_cap_sample",
    "ivf_refine",
    "curation_manifest",
    "bpe_token_estimate",
    "media_decode_checksum",
    "ivf_refine_iters",
    "bigram_lm_score",
    "keyword_extract",
    "embed_quantize_int8",
    "ann_ivf_int8",
    "source_mix_sample",
    "ts_subsequence_match",
    "ts_subsequence_sax",
    # r9-new headline queries (baselines keyed from BENCH_r09 per the
    # new-op policy):
    "dedup_semantic",
    "curation_manifest_semantic",
    "ann_ivf_pq",
    # r10-new headline queries (baselines key from BENCH_r10 per the
    # new-op policy):
    "cluster_cap_sample",
    "source_upsample",
    "pq_encode_trained",
    "bpe_segment",
    "training_plan",
    "pack_plan",
    # r11-new headline query (baseline keyed from BENCH_r11 per the
    # new-op policy). training_plan_over_store is deliberately NOT
    # benched headline: its cost is write_plan_store (a once-per-corpus
    # build, measured in PERF_NOTES) + a composition tail already
    # covered by training_plan; timing the store rebuild per run would
    # measure the artifact write, not a query.
    "curation_funnel",
    # r12-new registrations (baselines key from BENCH_r12 per the
    # new-op policy — first driver bench):
    "bm25_top_docs",
    "dsir_weights",
    "canonical_by_quality",
    "source_divergence",
    # r13-new registrations (baselines key from BENCH_r13 per the
    # new-op policy — first driver bench). dedup_incremental's time is
    # honest end-to-end store economics: one write_dedup_store build
    # over the 80% "existing" slice + the pruned probe of the 20% wave
    # (the build is memoized per (session, corpus), so the probe-only
    # steady state is the smaller number in PERF_NOTES).
    "dedup_incremental",
    "ann_recall",
    # minhash_jaccard_estimate retired to library-only in r17 (kernels
    # covered by dedup_minhash_lsh + cross_split_leakage; full oracle
    # still runs every round in test_oracle_parity's library pass) —
    # dropped from the bench with its registry seat; its baseline
    # entry stays for the record, as tpch_q10's did in r13
    "embedding_health",
    # gopher_rules retired to library-only in r17 likewise (map-only
    # doc-stats class covered by source_quality_rollup)
    # r14-new registrations (the R14 seat trade; baselines keyed from
    # BENCH_r14 in r15 per the new-op policy):
    "cross_split_leakage",
    "line_dedup",
    # r15-new registrations (the R15 seat trade; baselines key from
    # BENCH_r15 per the new-op policy — first driver bench). Their
    # times are honest end-to-end store economics like
    # dedup_incremental's: semantic_incremental = one
    # write_semantic_store build over the existing slice + the pruned
    # probe of the arriving wave; admission_report = the composed
    # funnel over BOTH memoized corpus stores (dedup store already
    # built by dedup_incremental above, semantic store by
    # semantic_incremental — the probe-only steady state is the
    # smaller number in PERF_NOTES).
    "semantic_incremental",
    "admission_report",
    # r16-new registrations (the R16 seat trade; baselines key from
    # BENCH_r16 per the new-op policy — first driver bench).
    # bm25_incremental's time is honest end-to-end store economics
    # like dedup_incremental's: one write_bm25_store build over the
    # existing slice + append of the arriving slice + the pruned
    # probe (build memoized per (session, corpus) — the probe-only
    # steady state is the smaller number in PERF_NOTES).
    # hybrid_retrieval derives keywords → BM25 → exact knn → RRF
    # fusion from the raw tables in one plan (no store build).
    "bm25_incremental",
    "hybrid_retrieval",
    # r17-new registrations (the R17 seat trade; baselines key from
    # BENCH_r17 per the new-op policy — first driver bench).
    # margin_pair_mining runs two broadcast-GEMM corpus scans (probes
    # vs side B, candidates vs side A) plus candidate-sized joins;
    # weighted_sample is one map-only key derivation + a global top-M
    # via TakeOrderedAndProject.
    "margin_pair_mining",
    "weighted_sample",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("trisk-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = load_all()

    # Warm up the JVM + parquet footers once (not timed): tiny query.
    queries["tpch_q1"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        queries[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # Per-query ratios vs the recorded round-1 numbers (BASELINE_QUERIES
    # .json) so regressions are attributable to a query, not a total.
    base_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_QUERIES.json"
    )
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        if base.get("sf") == out["sf"]:
            out["vs_recorded"] = {
                n: round(t / base["queries"][n], 2)
                for n, t in timings.items()
                if base["queries"].get(n)
            }
    line = json.dumps(out)
    # Persist the full JSON FIRST — a consumer that closes stdout
    # early (e.g. `bench.py | head -1`) SIGPIPEs the later prints, and
    # the snapshot must survive that (an r11 session committed a stale
    # snapshot exactly this way).
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_LOCAL_LATEST.json",
            ),
            "w",
        ) as f:
            f.write(line + "\n")
    except OSError:
        pass  # read-only checkout: stdout still carries the result
    print(line)
    # The driver's output capture keeps only the last ~2000 chars and
    # the full per-query line is longer — it has been head-truncated
    # mid-key before (BENCH_r08/r10 "parsed: null"). Print a COMPACT
    # summary as the LAST line so the tail capture always holds one
    # whole parseable JSON object; the full per-query numbers live in
    # the committed BENCH_LOCAL_LATEST.json (identical run).
    compact = dict(out)
    compact.pop("queries", None)
    compact.pop("vs_recorded", None)
    compact["n_queries"] = len(timings)
    compact["full"] = "BENCH_LOCAL_LATEST.json"
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
