"""Physical-type parity between Spark results and DuckDB oracles.

The external driver's value-hash is *type-sensitive*: round 1 proved that
a DuckDB ``SUM(<integer>)`` widening to HUGEINT (int128) hash-fails
against Spark's BIGINT even with bit-identical values, because the hash
encodes the physical representation (VERDICT.md headline #2). The
value-level parity test (test_oracle_parity.py) deliberately normalizes
scalar flavors, so it cannot catch this class. This test can: it
compares *plan-time* schemas — ``df.schema`` on the Spark side and the
relation's bound types on the DuckDB side — normalized to coarse
categories, and additionally rejects any HUGEINT oracle column outright.

Mostly plan-time: batch queries only build a DataFrame (no jobs).
The exceptions are the stream_* entries and snapshot-writing ops
(dedup_incremental_new; the ANN index builders ivf_kmeans_assign /
ann_ivf_topk / ann_ivfpq_topk on their first call per session), whose
query functions execute a full availableNow drain / table write at
*build* time — those names run real (small, sf0.01) jobs inside this
sweep.
"""

from __future__ import annotations

import pytest

from mapreduce_wordcounter_spark.registry import all_oracles, all_queries
from tests.conftest import SF_ORACLE

_ORACLES = all_oracles()
_QUERIES = all_queries()


def _norm_duck(t: object) -> str:
    s = str(t).upper()
    if s == "HUGEINT":
        return "HUGEINT"  # never acceptable: type-sensitive driver hash
    if s in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT", "UINTEGER"):
        return "int"
    if s in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if s.startswith("DECIMAL"):
        return "decimal"
    if s == "VARCHAR":
        return "str"
    if s == "DATE":
        return "date"
    if s.startswith("TIMESTAMP"):
        return "ts"
    if s == "BOOLEAN":
        return "bool"
    if s.startswith(("STRUCT", "MAP")):
        return "nested"
    if s.endswith("[]") or s.startswith("LIST"):
        return "list"
    if s == "BLOB":
        return "bin"
    return s


def _norm_spark(dt: object) -> str:
    s = dt.simpleString()  # type: ignore[attr-defined]
    if s in ("bigint", "int", "smallint", "tinyint"):
        return "int"
    if s in ("double", "float"):
        return "float"
    if s.startswith("decimal"):
        return "decimal"
    if s == "string":
        return "str"
    if s == "date":
        return "date"
    if s.startswith("timestamp"):
        return "ts"
    if s == "boolean":
        return "bool"
    if s.startswith(("struct", "map")):
        return "nested"
    if s.startswith("array"):
        return "list"
    if s == "binary":
        return "bin"
    return s


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_type_parity(name, spark, duck):
    df = _QUERIES[name](spark, SF_ORACLE)
    spark_types = {f.name: _norm_spark(f.dataType) for f in df.schema.fields}

    rel = duck.sql(_ORACLES[name])
    duck_types = dict(zip(rel.columns, (_norm_duck(t) for t in rel.types)))

    huge = [c for c, t in duck_types.items() if t == "HUGEINT"]
    assert not huge, (
        f"{name}: oracle columns {huge} are HUGEINT — wrap in "
        f"CAST(... AS BIGINT); the driver's value-hash is type-sensitive"
    )
    assert set(spark_types) == set(duck_types), (
        f"{name}: columns {sorted(spark_types)} != {sorted(duck_types)}"
    )
    diff = {
        c: (spark_types[c], duck_types[c])
        for c in spark_types
        if spark_types[c] != duck_types[c]
    }
    assert not diff, f"{name}: type mismatches (spark, duck): {diff}"
