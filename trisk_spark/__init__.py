"""trisk_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference stream-processing system
(sane-lab/Trisk, a Flink-1.10 fork with a live-reconfiguration control
plane; see SURVEY.md).

Design: everything is expressed through the DataFrame/SQL API so Catalyst
plans it (predicate pushdown, column pruning, broadcast joins, AQE);
custom stateful semantics (order-book matching, emit-once joins) are
Arrow-batched `applyInPandas`/`transformWithStateInPandas` operators;
streaming runs the same expressions under Structured Streaming.

Layout:
  session    — SparkSession tuning for local[32] now, 1000-executor later
  catalog    — parquet table loading + temp-view registration
  sources    — derived event-stream views (bid/auction/person/orders…)
  operators  — relational + Nexmark + stateful operators (SURVEY §2A/§2B)
  functions  — text analysis, dedup, similarity (training-data pipeline)
  streaming  — Structured Streaming wrappers + stateful streaming ops
  plans      — control plane: Trisk-style reconfiguration equivalents
  registry   — name → (query fn, oracle SQL) used by __spark_entry__.py
"""

__version__ = "0.1.0"
