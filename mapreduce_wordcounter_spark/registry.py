"""Query registry.

Every operator the engine implements registers itself here as a
``(spark, sf_dir) -> DataFrame`` callable, optionally paired with an
ANSI-SQL oracle string that DuckDB can run over the same parquet tables
(the driver's correctness harness — see __spark_entry__.py). Operators
whose semantics are not SQL-expressible (LSH, streaming state) register
without an oracle and get the driver's weaker rows-only check plus our
own pytest invariants (SURVEY.md §5.2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query callable, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    """Import every operator module (side effect: registration) and
    return the full query dict."""
    # Imports deferred so `import mapreduce_wordcounter_spark` stays cheap.
    from mapreduce_wordcounter_spark.functions import udaf, udtf  # noqa: F401
    from mapreduce_wordcounter_spark.operators import (  # noqa: F401
        dedup,
        multimodal,
        relational,
        similarity,
        temporal,
        text,
        wordcount,
    )
    from mapreduce_wordcounter_spark.streaming import stateful, windows  # noqa: F401

    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    all_queries()
    return dict(ORACLE)
