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


@pytest.mark.parametrize("name", NO_ORACLE)
def test_runs_and_stable_schema(spark, name):
    """Oracle-less (stateful emit-semantics) queries: must run and
    produce a stable schema; value-level checks live in test_stateful."""
    qd = QUERIES[name]
    sdf = qd.fn(spark, SF_DIR)
    assert sdf.columns
    sdf.collect()  # must execute without error
