"""Output-type parity sweep: the correctness driver's value-hash is
type-CLASS-sensitive (r1 `decimal_accumulators`, r2 `media_metadata`
both failed with bit-identical values), so every oracle-bearing query's
Spark schema must land in the same type class as its DuckDB oracle.

Empirically calibrated against driver history:
  * int width does NOT matter (tpch_q7 emits Spark INT vs DuckDB BIGINT
    for l_year and was hash-green in CORRECTNESS_r01);
  * DECIMAL/HUGEINT vs INT *does* matter — DuckDB's SUM(BIGINT) returns
    HUGEINT (arrow decimal128), which hash-mismatches Spark's BIGINT
    even when values are equal. Oracles must CAST such sums to BIGINT.

Schema-only: Spark analysis + DuckDB DESCRIBE — nothing executes.
"""

from __future__ import annotations

import pytest

from trisk_spark.registry import load_all

from .conftest import SF_DIR

QUERIES = load_all()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle)

_SPARK_CLASS = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "string",
    "timestamp": "timestamp", "timestamp_ntz": "timestamp",
    "date": "date", "boolean": "bool", "binary": "binary",
}


def spark_class(simple: str) -> str:
    if simple.startswith("decimal"):
        return "decimal"
    if simple.startswith("array<") and simple.endswith(">"):
        return f"array<{spark_class(simple[6:-1])}>"
    return _SPARK_CLASS.get(simple, simple)


def duck_class(t: str) -> str:
    t = t.upper()
    if t.startswith("DECIMAL") or t == "HUGEINT" or t == "UHUGEINT":
        return "decimal"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t == "VARCHAR":
        return "string"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "DATE":
        return "date"
    if t == "BOOLEAN":
        return "bool"
    if t == "BLOB":
        return "binary"
    if t.endswith("[]"):
        return f"array<{duck_class(t[:-2])}>"
    return t


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_output_type_classes_match(spark, duck, name):
    qd = QUERIES[name]
    stypes = {
        f.name: spark_class(f.dataType.simpleString())
        for f in qd.fn(spark, SF_DIR).schema.fields
    }
    rows = duck(SF_DIR).execute(f"DESCRIBE {qd.oracle}").fetchall()
    dtypes = {r[0]: duck_class(r[1]) for r in rows}
    assert set(stypes) == set(dtypes), (
        f"column sets differ: spark={sorted(stypes)} duck={sorted(dtypes)}"
    )
    mismatches = {
        c: (stypes[c], dtypes[c]) for c in stypes if stypes[c] != dtypes[c]
    }
    assert not mismatches, (
        f"type-class mismatches (driver hash would fail): {mismatches}"
    )
