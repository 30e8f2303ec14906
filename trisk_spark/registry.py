"""Query registry: name → (Spark query fn, DuckDB oracle SQL).

Every operator implemented from SURVEY.md §2 registers here; the driver
contract (``__spark_entry__.py``) exposes this dict. Each query fn takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle is ANSI SQL that
DuckDB runs against the same parquet tables (views pre-registered by the
driver: region nation customer supplier part orders lineitem events
documents embeddings).

Oracle parity rules (enforced by tests/test_oracle_parity.py):
  * column names identical on both sides (driver sorts columns by name
    before value-hashing);
  * float aggregates computed on DECIMAL then rounded + cast to DOUBLE so
    summation order cannot flip the hash;
  * no nondeterministic ordering-dependent values.

Queries whose semantics SQL cannot express (emit-once streaming joins,
order-book matching) register ``oracle=None`` → driver runs a weaker
rows-only check; their real verification is a pure-Python replay-fold
oracle in tests/.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from trisk_spark.session import prepare


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str, *a, **kw) -> DataFrame:
            prepare(spark)
            return fn(spark, sf_dir, *a, **kw)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = QueryDef(name, wrapped, oracle, fn.__doc__ or "")
        return wrapped

    return deco


# The correctness driver records a bounded number of entries per run
# (CORRECTNESS_r01 held exactly 50 of 54 registered queries, cut at a
# module boundary), so REGISTRATION ORDER IS COVERAGE PRIORITY: every
# query that is the sole evidence for a SURVEY §2A/§2B row or an
# LLM-pipeline operator must precede the redundant relational-superset
# extras below. Queries listed here are deliberately LAST — each one's
# capability is already evidenced by an earlier query or a plan test,
# and ALL queries regardless of position stay oracle-gated by
# tests/test_oracle_parity.py.
# ROTATION POLICY (window = 50, so len(registry) - 50 queries sit out
# each round): membership alternates round-by-round so that (a) no
# oracle-bearing query's last driver-green row is ever more than one
# round old when it rotates back, and (b) every query sitting out has
# an in-window witness for each of its SURVEY §2 rows. ALL queries
# regardless of position stay oracle-gated by
# tests/test_oracle_parity.py every round.
#
# r16 window: EXECUTES THE WRITTEN R16 PLAN (r15 VERDICT "next round"
# #1, arithmetic pre-checked last round). The r15 sitters rotate back
# in (policy (a)) MINUS two retired to library-only status via the
# sanctioned seat-freeing mechanism (the tpch_q7/q10/q14 + r15
# tpch_q3/knn_bruteforce precedent):
#   revenue_rollup RETIRED to library-only (load_library below): its
#       decimal scan-agg kernel is driver-hash-gated by tpch_q1 every
#       other round (plus decimal_accumulators, same phase); the
#       ROLLUP grouping-sets form keeps its full oracle library-gated
#       every round in test_oracle_parity.
#   customers_without_orders RETIRED likewise: the left-anti kernel
#       is hash-gated by the curation-manifest family's anti-join
#       staging (curation_manifest_semantic every other round;
#       admission_report carries the same anti-join class).
# So 47 - 2 retired = 45 returning. Must-stays unchanged:
# stock_matchmaker (no oracle, no hash-gated witness -> never sits),
# media_decode_checksum (the no-oracle sitter's witness, enforced by
# test_registry), fraud_alerts (sole BroadcastState / FD megaphone
# evidence -- no kernel-class sibling, never sits). TWO new
# registrations take the freed seats, in-window their first round per
# the new-op policy: bm25_incremental (LEAD -- the persisted BM25
# store's only possible independent hash row; its oracle is the
# whole-corpus BM25_TOP_DOCS_SQL verbatim, so ONE value-hash covers
# write -> append -> route -> pruned probe -> exact-rational scoring,
# and append == rebuild is part of what the hash asserts) +
# hybrid_retrieval (the RRF fusion + probe-keyword kernels have no
# registered sibling; its oracle re-derives keywords -> BM25 -> knn
# -> fusion from the raw tables under one hash). Both carried full
# DuckDB oracles through every round's library parity pass since r14.
# Seat arithmetic: 45 returning + 3 always-in + 2 new = 50.
# CAPACITY after this round: 106 registered (106 - 2 retired + 2 new)
# = 3 always-in + 8 permanent composed sitters + 1 no-oracle sitter +
# 94 alternating over 47 seats/round -- still exactly saturated
# (policy (a) holds), so every future registration needs a matching
# flip or retirement from the PHASE THAT RETURNS that round.
# The two r15-new seats (semantic_incremental, admission_report) sit
# r16 on in-window witnesses noted on their rows below -- every
# witness is in the r16 window (checked).
# R17 PLAN, FINAL (arithmetic-checked; r15 VERDICT next-round #5):
# the r17 returning phase is THIS list below (it sits r16).
# Sanctioned R17 moves from it: retire minhash_jaccard_estimate
# (signature-agreement estimator, kernels gated by dedup_minhash_lsh's
# signature+band kernels + cross_split_leakage's composed pair chain
# -- both hash-gated every other round) and retire gopher_rules
# (map-only doc-stats class, gated by source_quality_rollup) -> TWO
# r17 seats -> register margin_pair_mining (r15-new LEAD: the
# ratio-margin fusion + dual-kNN composition has no registered
# sibling; its oracle spans both directions + neighborhood averages +
# fusion under one hash) + weighted_sample (r15-new: exactly-M
# Efraimidis-Spirakis without-replacement selection -- no registered
# sibling; the Bernoulli mix family only hits rates in expectation).
# Alternates if the verdict prefers: embedding_gram,
# hybrid_store_probe, ivf_drift_report, embedding_outliers. Pool
# stays 94 - 2 + 2 = 94 (saturated); retired rows keep their library
# oracles as always.
# R18 SKETCH (arithmetic-check + finalize in r17): the r18 returning
# phase is THE R16 WINDOW (it sits r17, returns r18). Sanctioned R18
# moves from it: retire tpch_q6 (filter + scan-agg, kernels gated by
# nexmark_q2 (filter pushdown) + tpch_q1 (decimal scan agg)) and
# retire ngram_counts (explode/shingle count, gated by wordcount +
# ngram_jaccard) -> TWO r18 seats -> register embedding_gram (the
# exact second-moment table behind PCA whitening: all-BIGINT moments,
# constant 2,145-key shuffle -- the gram/moment store's only possible
# independent hash row now that its delete verb exists) +
# hybrid_store_probe (hybrid more-like-this SERVED FROM BOTH
# PERSISTED INDEXES -- BM25 postings store + int8 IVF store + the
# shared RRF fusion; the deployment twin of the r16-seated
# hybrid_retrieval). Alternates: ivf_drift_report,
# embedding_outliers, source_overlap_matrix, plus the r16-new library
# ops phrase_search (positional lexical retrieval -- no registered
# sibling for phrase/proximity semantics) and quality_calibrate
# (per-source rank calibration). Pool stays 94 - 2 + 2 = 94
# (saturated).
# R17 BUILD CANDIDATE (sketched r16, deliberately NOT rushed into
# this round): the persisted POSITIONAL postings store -- the
# standing-workload path phrase_search's docstring promises: (term,
# doc_id, positions array<int>) bucketed by md5(term) % 64 exactly
# like the bm25 store, probe = driver-routed pruned read + 3-way
# per-phrase join + position-set lambdas (n_exact = positions
# intersected under shifts, n_prox = the exists-formulation, which
# equals the in-row greedy semantics), full store verb set via the
# existing storefs staged-partition protocol (positions are uncapped
# per-doc facts like bm25 postings, so delete = filter-per-touched-
# bucket with durable staging -- bm25_store._run_recorded_delete's
# exact shape minus doclens/stats), and a phrase_incremental library
# op whose oracle is PHRASE_SEARCH_SQL verbatim (exact index =>
# write -> append -> route -> pruned probe must equal the one-plan
# batch kernel row for row, the bm25_incremental precedent).
# Sitting out r16 -- every alternating row hash-green in r15
# (CORRECTNESS_r15), witness noted ("(in)" = in the r16 window):
DEPRIORITIZED = [
    # ---- r15-green rows sitting one round ----
    "nexmark_q1",              # map: props_rollup (in, scalar map exprs)
    "nexmark_q2",              # filter: tpch_q6 (in, filter + agg)
    "nexmark_q3",              # SQL join image: tpch_q5 (in, multi-join) + q3_emit_once_join (in)
    "nexmark_q8",              # windowed equi-join: interval_join (in, time-bounded join)
    "tpch_q1",                 # decimal scan agg: decimal_accumulators (in, BigDecimal accumulators over the same scan)
    "keyed_agg",               # keyed folds: keyed_running_reduce + minby_maxby (in)
    "tumbling_window_agg",     # window aggs: nexmark_q5 (in, sliding) + count_window (in)
    "tpch_q18",                # window rank + join: top_orders_per_customer (in)
    "all_window_agg",          # non-keyed window: nexmark_q5 + count_window (in, same S2A window family) + hostile-events parity (test_parity_edges)
    "wordcount",               # flatMap + count: ngram_counts (in, explode/shingle count)
    "wordcount_two_input",     # connect/CoFlatMap: q3_emit_once_join (in, CoProcess class) + hostile-docs parity (test_parity_edges)
    "cogroup_apply",           # coGroup: q3_emit_once_join (in, two-input keyed apply) + hostile-events parity (test_parity_edges)
    "sliding_count_window",    # count/sliding windows: count_window + nexmark_q5 (in)
    "delta_evictor_window",    # evictors: time_evictor_window (in)
    "continuous_trigger",      # triggers: delta_trigger (in)
    "purging_trigger",         # triggers: delta_trigger (in)
    "asof_join",               # tagged-union asof: interval_join (in, time-bounded family) + test_asof_stream_equals_batch pytest
    "async_enrich",            # AsyncDataStream: interval_join (in, ordered enrich image) + hostile-events parity (test_parity_edges)
    "token_count",             # tokenizer: doc_chunk + bpe_token_estimate + bpe_segment (in, shared tokenizer)
    "quality_score",           # doc stats: length_percentiles + source_quality_rollup (in)
    "lang_id",                 # source_quality_rollup (in) composes it
    "doc_fingerprint",         # rolling hash: dedup_substring (in, same class)
    "dedup_exact",             # md5 groupBy: dedup_minhash_lsh (in) + pack_plan (in, composes exact dedup via the manifest chain)
    "dedup_bag",               # token-level near-dup: dedup_simhash (in)
    "ngram_jaccard",           # shingle kernel: ngram_counts + dedup_minhash_lsh (in) + cross_split_leakage (in, pair chain)
    "dedup_clusters",          # components: pack_plan (in, composes the transitive closure) + dedup_minhash_lsh (in, pair kernel)
    "decontaminate_flags",     # semi-join kernel: semi_join_orders (in) + cross_split_leakage (in, split-keyed pair semi-join)
    "minhash_jaccard_estimate",  # signature-agreement estimator: dedup_minhash_lsh (in, same signature+band kernels) + cross_split_leakage (in, composes the same pair chain)
    "repetition_ratio",        # source_quality_rollup (in) composes it
    "pii_redact",              # scalar regexes: props_rollup (in, scalar/string fns)
    "url_normalize",           # scalar string fns: props_rollup (in)
    "gopher_rules",            # map-only doc-stats class: source_quality_rollup (in)
    "media_metadata",          # multimodal map-side: media_byte_features (in)
    "media_frame_sample",      # multimodal map-side: media_byte_features (in)
    "dedup_incremental",       # persisted-store probe: dedup_minhash_lsh (in, same signature+band kernels the store persists) + canonical_by_quality (in, the same struct-MAX argmax its probe verdict uses)
    "dedup_semantic",          # pack_plan (in) COMPOSES its whole chain via the manifest; cosine_near_dup_lsh (in, SRP pairs)
    "ivf_refine",              # Lloyd step kernel: ann_ivf + ivf_refine_iters (in)
    "embedding_health",        # in-row norm fold: embed_quantize_int8 (in, same kernel)
    "ann_recall",              # recall gate: ann_ivf_int8 (in, the approximate side it drives verbatim) + cosine_near_dup_exact (in, the exact-GEMM class of its brute side)
    "ann_ivf_pq",              # ADC search: ann_ivf_int8 (in, composes routing + rerank) + pq_encode_trained (in, encode kernel)
    "source_cap_sample",       # md5 rank-cap: split_rollup (in) + source_mix_sample (in, md5-order family) + pack_plan (in, the cap via the plan chain)
    "curation_manifest_semantic",  # pack_plan (in) COMPOSES it wholesale via training_plan's chain
    "training_plan_over_store",    # pack_plan (in, IDENTICAL _drop_cap_losers + _epoch_plan tail over the same chain; store == recompute equality-pinned in test_pq)
    "curation_funnel",         # pack_plan (in, composes the manifest chain its stages count) + hostile-corpus parity (test_parity_edges)
    "ts_subsequence_sax",      # ts family: ts_subsequence_match (in, same z-norm + exact-int distance arithmetic)
    # ---- r15-seated rows, first sit (witnesses per the r15 plan) ----
    "semantic_incremental",    # persisted SRP store probe: cosine_near_dup_lsh (in, same SRP banding + in-bucket cosine kernel) + canonical_by_quality (in, the same struct-MAX argmax its probe verdict uses)
    "admission_report",        # composed funnel: dedup_minhash_lsh (in, the dedup probe kernel) + cosine_near_dup_lsh (in, the semantic probe kernel) + source_quality_rollup (in, the composed quality gate) + semi_join_orders (in, the anti-join staging class)
    # ---- permanent sitters (composed class -- witness = composer) ----
    "sequence_pack",           # COMPOSED_SITTER_WITNESS: pack_plan
    "train_split",             # COMPOSED_SITTER_WITNESS: training_plan_over_store
    "curation_manifest",       # COMPOSED_SITTER_WITNESS: curation_manifest_semantic + curation_funnel
    "source_upsample",         # COMPOSED_SITTER_WITNESS: training_plan_over_store
    "training_plan",           # COMPOSED_SITTER_WITNESS: training_plan_over_store (identical oracle)
    "cluster_cap_sample",      # COMPOSED_SITTER_WITNESS: training_plan_over_store + source_cap_sample
    "ann_lsh_bucketed",        # COMPOSED_SITTER_WITNESS: cosine_near_dup_lsh + ann_ivf (r13 flip -- kernel pins above)
    "pq_encode",               # COMPOSED_SITTER_WITNESS: pq_encode_trained (r13 flip -- iters=0 equality pin)
    # ---- permanent sitter (no-oracle class) ----
    "media_decode_resize",     # NO_ORACLE_SITTER_WITNESS: media_decode_checksum (in)
]

# Permanent composed sitters: each key is wholly composed by its
# witness queries (same kernels, shared helpers — see the class note
# above); the witnesses must themselves be registered, oracle-bearing,
# and NOT sitters of any permanent class (no circular witnessing) —
# enforced by tests/test_registry.py. Their own full oracles still run
# every round in test_oracle_parity.
COMPOSED_SITTER_WITNESS: dict[str, tuple[str, ...]] = {
    "sequence_pack": ("pack_plan",),
    "train_split": ("training_plan_over_store",),
    "curation_manifest": ("curation_manifest_semantic", "curation_funnel"),
    "source_upsample": ("training_plan_over_store",),
    "training_plan": ("training_plan_over_store",),
    "cluster_cap_sample": ("training_plan_over_store", "source_cap_sample"),
    # r13 flips — kernel identity machine-pinned:
    # test_similarity_iter::test_ann_lsh_bucket_is_srp_sign_band_kernel
    # and test_pq::test_pq_encode_is_trained_encode_at_zero_iters
    "ann_lsh_bucketed": ("cosine_near_dup_lsh", "ann_ivf"),
    "pq_encode": ("pq_encode_trained",),
}

# A no-oracle query may sit out ONLY with a named in-window witness
# that drives the same kernel through a hash-gated oracle.
# media_decode_checksum IS media_decode_resize plus md5(pixels) — the
# whole decode→resize path flows through its DuckDB value-hash gate,
# while the pixel-exact pytest replay stays on the parent.
NO_ORACLE_SITTER_WITNESS = {"media_decode_resize": "media_decode_checksum"}


def load_all() -> dict[str, QueryDef]:
    """Import every operator module so all queries self-register, then
    order the registry: §2-row-bearing queries first (cheap,
    previously-truncated multimodal before the expensive
    dedup/similarity blocks), DEPRIORITIZED extras last."""
    import trisk_spark.operators.nexmark  # noqa: F401
    import trisk_spark.operators.relational  # noqa: F401
    import trisk_spark.operators.wordcount  # noqa: F401
    import trisk_spark.operators.stateful  # noqa: F401
    import trisk_spark.operators.fraud  # noqa: F401
    import trisk_spark.operators.multistream  # noqa: F401
    import trisk_spark.operators.async_io  # noqa: F401
    import trisk_spark.functions.text  # noqa: F401
    import trisk_spark.functions.multimodal  # noqa: F401
    import trisk_spark.functions.bpe  # noqa: F401
    import trisk_spark.functions.admission  # noqa: F401
    import trisk_spark.functions.dedup  # noqa: F401
    import trisk_spark.functions.dedup_store  # noqa: F401
    import trisk_spark.functions.bm25_store  # noqa: F401
    import trisk_spark.functions.retrieval  # noqa: F401
    import trisk_spark.functions.semantic_store  # noqa: F401
    import trisk_spark.functions.similarity  # noqa: F401
    import trisk_spark.functions.pq  # noqa: F401
    import trisk_spark.functions.sampling  # noqa: F401
    import trisk_spark.functions.timeseries  # noqa: F401

    tail = set(DEPRIORITIZED)
    ordered = {n: q for n, q in REGISTRY.items() if n not in tail}
    ordered.update({n: REGISTRY[n] for n in DEPRIORITIZED if n in REGISTRY})
    return ordered


def load_library() -> dict[str, QueryDef]:
    """The LIBRARY surface: ops with full DuckDB oracles but no
    driver-window seat (the R17 PLAN above; bm25_incremental and
    hybrid_retrieval graduated to ``@register`` seats in r16,
    semantic_incremental and admission_report in r15,
    cross_split_leakage and line_dedup in r14,
    dedup_incremental/ann_recall/minhash_jaccard_estimate/
    embedding_health/gopher_rules in r13,
    bm25_top_docs/dsir_weights/canonical_by_quality/source_divergence
    in r12). Also holds rows RETIRED from the registered surface
    (tpch_q10 in r13; tpch_q7 and tpch_q14 in r14; tpch_q3 and
    knn_bruteforce in r15; revenue_rollup and customers_without_orders
    in r16) whose kernels are
    driver-hash-gated by siblings: retirement only moves the evidence
    channel, never removes the oracle. Shaped exactly like
    ``load_all()`` entries — same (spark, sf_dir) → DataFrame
    contract, same prepare() wrapping, oracle attached — so
    registering one is moving it into a ``@register`` decorator and a
    seat. NOT exposed through ``__spark_entry__.queries()``; gated
    every round by tests/test_oracle_parity.py's library pass
    instead."""
    from trisk_spark.functions import (
        dedup,
        dedup_store,
        retrieval,
        sampling,
        semantic_store,
        similarity,
        text,
    )
    from trisk_spark.operators import relational

    entries: dict[str, tuple] = {
        "budget_trim": (sampling.budget_trim, sampling.BUDGET_TRIM_SQL),
        "training_plan_budget": (
            sampling.training_plan_budget,
            sampling.training_plan_budget_sql(),
        ),
        "shuffle_shards": (sampling.shuffle_shards, sampling.SHUFFLE_SHARDS_SQL),
        "perplexity_buckets": (
            sampling.perplexity_buckets,
            sampling.ppl_buckets_sql(),
        ),
        "contamination_report": (
            dedup.contamination_report,
            dedup._contamination_report_sql(),
        ),
        "ngram_novelty": (dedup.ngram_novelty, dedup.NGRAM_NOVELTY_SQL),
        "tpch_q10": (relational.tpch_q10, relational.TPCH_Q10_SQL),
        # r14-retired (the R14 seat trade): kernels driver-hash-gated
        # by tpch_q5/q18; full oracles keep running here.
        "tpch_q7": (relational.tpch_q7, relational.TPCH_Q7_SQL),
        "tpch_q14": (relational.tpch_q14, relational.TPCH_Q14_SQL),
        # r15-retired (the R15 seat trade): filtered multi-join
        # decimal agg ⊂ tpch_q5, broadcast-dim top-k ⊂ tpch_q18 /
        # top_orders_per_customer; full oracle keeps running here.
        "tpch_q3": (relational.tpch_q3, relational.TPCH_Q3_SQL),
        # r15-retired likewise: exact blocked-GEMM top-k ⊂
        # cosine_near_dup_exact + knn_label_vote; ann_recall drives it
        # verbatim as its brute side.
        "knn_bruteforce": (
            similarity.knn_bruteforce,
            similarity.KNN_BRUTE_SQL,
        ),
        # r15-new: margin-based cross-corpus pair mining (the Artetxe
        # & Schwenk ratio-margin criterion behind CCMatrix/LASER-style
        # parallel-data pipelines) — both kNN directions through the
        # shared _gemm_topk kernel, neighborhood averages, and the
        # margin fusion + accept decision under ONE value-hash.
        "margin_pair_mining": (
            similarity.margin_pair_mining,
            similarity.MARGIN_PAIR_SQL,
        ),
        # r15-new: exactly-M quality-weighted sampling without
        # replacement (Efraimidis-Spirakis keys over the shared
        # quality formula; the Bernoulli mix samplers hit a rate in
        # expectation — this hits an exact budget, weight-proportional,
        # via TakeOrderedAndProject).
        "weighted_sample": (
            sampling.weighted_sample,
            sampling.WEIGHTED_SAMPLE_SQL,
        ),
        # r15-new: the source×source near-dup overlap matrix — the
        # mixture-design preflight ("how much of source A duplicates
        # source B"): the capped banded pair kernel + source rollup +
        # exact-integer pair-density under ONE value-hash.
        "source_overlap_matrix": (
            dedup.source_overlap_matrix,
            dedup.SOURCE_OVERLAP_SQL,
        ),
        # r16-retired (the R16 seat trade): decimal scan-agg kernel
        # driver-hash-gated by tpch_q1 / decimal_accumulators; the
        # ROLLUP grouping-sets full oracle keeps running here.
        "revenue_rollup": (
            relational.revenue_rollup,
            relational.REVENUE_ROLLUP_SQL,
        ),
        # r16-retired likewise: left-anti kernel hash-gated by the
        # curation-manifest family's anti-join staging; full oracle
        # keeps running here.
        "customers_without_orders": (
            relational.customers_without_orders,
            relational.CUSTOMERS_NO_ORDERS_SQL,
        ),
        # r14-new: the exact second-moment table behind PCA whitening —
        # the corpus-sized half of the dimensionality-reduction
        # preflight (driver-side eigh + map-only projection are
        # pytest-gated; eigenvector sign/order is not a cross-engine
        # contract, the pq/bpe precedent). Every value an exact BIGINT.
        "embedding_gram": (
            similarity.embedding_gram,
            similarity.EMB_GRAM_SQL,
        ),
        # r14-new: the outlier gate over the same exact moments —
        # per-vector standardized squared distance, every per-term
        # contribution an identical IEEE sequence on both engines
        # (integer numerators; the house ROUND→DECIMAL→SUM close).
        "embedding_outliers": (
            similarity.embedding_outliers,
            similarity.EMB_OUTLIERS_SQL,
        ),
        # r14-new: the routing-drift gate for the frozen IVF model —
        # per-list resident vs arriving membership, smoothed KL
        # contribution, exact-integer hot flag (the re-train trigger
        # ivf_store's append path defers to; ann_recall gates quality
        # from the probe side, this gates balance from ingest).
        "ivf_drift_report": (
            similarity.ivf_drift_report,
            similarity.IVF_DRIFT_SQL,
        ),
        # r14-new: hybrid more-like-this SERVED FROM THE PERSISTED
        # INDEXES — BM25 postings store (bucket-pruned) + int8 IVF
        # store (routed partition read) + the shared RRF fusion under
        # one value-hash; the deployment twin of hybrid_retrieval.
        "hybrid_store_probe": (
            retrieval.hybrid_store_probe,
            retrieval.HYBRID_STORE_SQL,
        ),
        # r14-new: the takedown verb under independent value-hash
        # evidence — build the existing-slice store, DELETE the
        # deterministic victim slice through the real intent-logged
        # path, probe the arriving slice; the oracle derives the same
        # answer from the corpus with the victims excluded, so it
        # matches iff delete ≡ rebuild holds on the probed artifacts.
        "dedup_takedown": (
            dedup_store.dedup_takedown,
            dedup_store.DEDUP_TAKEDOWN_SQL,
        ),
        # r14-new: the semantic store's takedown verb under the same
        # value-hash evidence (victims-excluded derivation).
        "semantic_takedown": (
            semantic_store.semantic_takedown,
            semantic_store.SEMANTIC_TAKEDOWN_SQL,
        ),
        # r16-new: phrase + ordered-proximity retrieval — the
        # POSITIONAL half of the lexical family (BM25 is bag-of-words;
        # this is Lucene PhraseQuery / sloppy-phrase semantics): exact
        # consecutive-trigram counts + greedy ordered-window counts,
        # both exact BIGINTs, probes derived from the corpus itself,
        # ranking under ONE value-hash. Map-only corpus scan with
        # in-row array lambdas — zero corpus shuffle.
        "phrase_search": (text.phrase_search, text.PHRASE_SEARCH_SQL),
        # r16-new: leakage-safe cluster-atomic train split — every doc
        # hashed by its near-dup cluster's CANONICAL id so no near-dup
        # pair straddles a split (train_split is doc-level md5 and
        # leaks ~19% of pairs; cross_split_leakage MEASURES that,
        # this REMOVES it by construction). Oracle composes the pair
        # kernel + transitive closure + both split CASEs.
        "cluster_split": (sampling.cluster_split, sampling.CLUSTER_SPLIT_SQL),
        # r16-new: per-source quality calibration — each document's
        # exact within-source standing vs the global-median verdict,
        # with the flip set (the docs a threshold choice is actually
        # deciding about). Entirely on the integer ppm grid: FLOOR
        # quantization (tie-free, unlike ROUND whose half-way cases
        # split Spark HALF_UP from DuckDB half-even — measured at
        # sf0.1 before this design), integer rank tests, dyadic-exact
        # BIGINT median.
        "quality_calibrate": (
            text.quality_calibrate,
            text.QUALITY_CALIBRATE_SQL,
        ),
    }

    def wrap(fn):
        def wrapped(spark: SparkSession, sf_dir: str, *a, **kw) -> DataFrame:
            prepare(spark)
            return fn(spark, sf_dir, *a, **kw)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        return wrapped

    return {
        n: QueryDef(n, wrap(fn), sql, fn.__doc__ or "")
        for n, (fn, sql) in entries.items()
    }
