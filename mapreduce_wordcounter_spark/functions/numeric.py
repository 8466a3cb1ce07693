"""Cross-engine-deterministic numeric aggregation helpers.

Floating-point SUM/AVG are order-dependent, and Spark and DuckDB visit
rows in different orders — so a naive ``sum(double)`` can differ in the
last ulps and break the driver's value-hash. Decimal intermediates do
not fully fix this either: Spark converts double→decimal through the
shortest string representation (``BigDecimal.valueOf``) while DuckDB
rounds the binary value, and the two diverge near scale boundaries
(~1e-6 probability per row — observed at sf0.01).

The robust construction: quantize each summand with pure IEEE double
ops — ``floor(x * 1e6 + 0.5)`` — which are bit-identical on any IEEE
engine, then sum exactly as BIGINT. Order-independent, engine-exact.

Headroom: |x| * 1e6 * rows must stay under 2^63 ≈ 9.2e18 — fine up to
~1e12 in total quantized mass, i.e. every test scale here. At true
100 TB scale swap the BIGINT for a DECIMAL(38,6) accumulator (Spark's
decimal sum is exact and overflow-checked; cross-engine hash parity is
a test-harness requirement, not a production one).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 1_000_000


def quantize(col: Column) -> Column:
    """Deterministically quantize a double to integer micro-units."""
    return F.floor(col * SCALE + F.lit(0.5)).cast("long")


def dsum(col: Column, alias: str) -> Column:
    """Order- and engine-independent double sum."""
    return (F.sum(quantize(col)).cast("double") / SCALE).alias(alias)


def davg(col: Column, alias: str) -> Column:
    """Order- and engine-independent double mean."""
    return (F.sum(quantize(col)).cast("double") / SCALE / F.count(col)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """DuckDB oracle fragment matching :func:`dsum`."""
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / 1000000.0 AS {alias}"
    )


def sql_davg(expr: str, alias: str) -> str:
    """DuckDB oracle fragment matching :func:`davg`."""
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / 1000000.0 / COUNT({expr}) AS {alias}"
    )
