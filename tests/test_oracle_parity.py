"""Differential tests mirroring the driver's DuckDB-oracle harness
(SURVEY.md §5.2 layer 2): for every query registered with an oracle,
run the Spark DataFrame and the DuckDB SQL at sf=0.01 and require
identical row count, column names, and (order-insensitively) values.

Stricter than the driver on floats: we require exact equality after the
query's own rounding, because we design every oracle-checked query to
round nondeterministic float aggregates explicitly.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from mapreduce_wordcounter_spark.registry import all_oracles, all_queries
from tests.conftest import SF_ORACLE

_ORACLES = all_oracles()
_QUERIES = all_queries()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Canonicalize cells so numpy/pyarrow scalar flavors compare equal.
    def cell(v):
        if v is None:
            return None
        if isinstance(v, float) and math.isnan(v):
            return None
        # List-valued cells are REJECTED, bit-faithful to the driver's
        # canonicalizer (pandas factorize dies on unhashable list cells
        # — CORRECTNESS_r10 embedding_quantize_int8). The pre-r11
        # version tuple-ized them, which let an un-driver-hashable
        # query pass local parity; tests/test_plan_hygiene.py bans the
        # schema shape at plan time, this guards the runtime path.
        if (hasattr(v, "tolist") and getattr(v, "ndim", 0) >= 1) or isinstance(
            v, (list, tuple)
        ):
            raise TypeError(
                f"list-valued result cell {v!r}: the external driver cannot "
                f"hash complex cells — serve exploded rows or a string "
                f"serialization (see test_plan_hygiene.py::"
                f"test_no_complex_output_columns)"
            )
        if hasattr(v, "item"):
            v = v.item()
        if isinstance(v, bytes):
            return v.hex()
        return v

    out = df.map(cell)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_parity(name, spark, duck):
    spark_pdf = _QUERIES[name](spark, SF_ORACLE).toPandas()
    duck_pdf = duck.execute(_ORACLES[name]).fetchdf()

    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    s, d = _canon(spark_pdf), _canon(duck_pdf)

    def eq(a, b):
        if a is None and b is None:
            return True
        if isinstance(a, float) and isinstance(b, float) and math.isnan(a) and math.isnan(b):
            return True
        return a == b

    for col in s.columns:
        sv, dv = list(s[col]), list(d[col])
        mism = [(i, a, b) for i, (a, b) in enumerate(zip(sv, dv)) if not eq(a, b)]
        assert not mism, f"{name}.{col}: {len(mism)} mismatches, first 5: {mism[:5]}"
