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
# r8 window: the 31 oracle-bearing r7 sitters rotate back in (policy
# (a): nobody's last driver-green row goes older than one round);
# media_decode_resize (no-oracle) keeps sitting on its hash-gated
# checksum witness. Must-stays: embed_quantize_int8 (red in r7 — the
# representation fix needs its first driver-green row), stock_matchmaker
# (no oracle, no hash-gated witness → never sits), and the five r8-new
# queries (ann_ivf_int8, source_mix_sample, ts_subsequence_match,
# ts_subsequence_sax: new sole evidence, must be in-window; the fifth
# new surface, ivf_store, is library+pytest — probe≡ann_ivf_int8
# pinned). Sitting out r8 — every one hash-green in r7
# (CORRECTNESS_r07), witness noted:
DEPRIORITIZED = [
    "nexmark_q1",              # §2B Q1 map: nexmark_q5 (in, bid parse) + props_rollup (scalar fns, in)
    "nexmark_q2",              # §2B Q2 filter: tpch_q6 (in, filter agg)
    "nexmark_q3",              # §2B Q3 SQL image: q3_emit_once_join (in, the Q3 emit semantics)
    "nexmark_q8",              # §2B Q8 windowed equi-join: interval_join (in, time-bounded join)
    "tpch_q1",                 # scan agg: revenue_rollup + decimal_accumulators (in)
    "tpch_q3",                 # multi-join agg: tpch_q5, tpch_q7 (in)
    "tpch_q10",                # multi-join agg: tpch_q5, tpch_q7 (in)
    "tpch_q18",                # join + having: top_orders_per_customer (in, window rank + join)
    "keyed_agg",               # sum/min/max/minBy/maxBy: minby_maxby (in)
    "tumbling_window_agg",     # tumbling windows: all_window_agg + nexmark_q5 (in)
    "wordcount",               # §2B WC: wordcount_two_input (in; same tokenize+count, superset)
    "sliding_count_window",    # count windows + evictor: count_window (in) + nexmark_q5 (sliding, in)
    "delta_evictor_window",    # evictors: time_evictor_window + delta_trigger (in)
    "continuous_trigger",      # triggers: delta_trigger (in) + streaming twins (state.py)
    "purging_trigger",         # triggers: delta_trigger (in) + purging stream twin (queries.py)
    "token_count",             # tokenizer: bpe_token_estimate + doc_chunk (in; shared tokenizer)
    "quality_score",           # quality expr: source_quality_rollup (in, composes it)
    "lang_id",                 # lang expr: source_quality_rollup (in, composes it)
    "doc_fingerprint",         # rolling hash: dedup_substring (in; winnowed k-gram hashing, same rolling-hash class)
    "dedup_exact",             # hash dedup: curation_manifest (in, composes exact dedup)
    "dedup_bag",               # token-bag dedup: dedup_simhash (in, token-level near-dup)
    "ngram_jaccard",           # shingle similarity: dedup_minhash_lsh (in-window anchor) + ngram_counts (in)
    "decontaminate_flags",     # semi-join kernel: semi_join_orders (in)
    "repetition_ratio",        # repetition expr: source_quality_rollup (in, composes it)
    "pii_redact",              # PII regexes: curation_manifest (in, composes pii_scrub)
    "url_normalize",           # scalar regex canonicalization: props_rollup (in, scalar/string fns)
    "media_metadata",          # multimodal map-side: media_byte_features (in)
    "media_frame_sample",      # multimodal map-side: media_byte_features (in)
    "ann_lsh_bucketed",        # SRP-LSH: cosine_near_dup_lsh (in)
    "ivf_refine",              # one Lloyd step: ann_ivf (in) + ivf_refine_iters (in-window anchor)
    "train_split",             # md5-bucket split: split_rollup (in, same kernel)
    "source_cap_sample",       # md5-order rank cap: split_rollup (in, md5-deterministic sampling family)
    "media_decode_resize",     # NO_ORACLE_SITTER_WITNESS: media_decode_checksum (in)
    # three more r7-green sitters so the r8-new source_mix_sample,
    # ts_subsequence_match, and ts_subsequence_sax get driver rows
    # (window stays 50):
    "cogroup_apply",           # two-input Arrow batch: wordcount_two_input (in) + oracle pytest
    "knn_bruteforce",          # exact-cosine kernel: knn_label_vote (in) EMBEDS its full pipeline+oracle; cosine_near_dup_exact (in, same kernel)
    "dedup_clusters",          # iterate() row: ivf_refine_iters (in, same driver-loop localCheckpoint iteration); dedup_minhash_lsh (in) generates its input pairs; label-prop pytest
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
    import trisk_spark.functions.dedup  # noqa: F401
    import trisk_spark.functions.similarity  # noqa: F401
    import trisk_spark.functions.sampling  # noqa: F401
    import trisk_spark.functions.timeseries  # noqa: F401

    tail = set(DEPRIORITIZED)
    ordered = {n: q for n, q in REGISTRY.items() if n not in tail}
    ordered.update({n: REGISTRY[n] for n in DEPRIORITIZED if n in REGISTRY})
    return ordered
