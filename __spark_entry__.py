"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``mapreduce_wordcounter_spark`` — the engine package.
``entry`` runs the flagship reference query (word count, SURVEY.md §2.3)
at sf0.001; ``queries``/``oracle_sql`` expose every implemented operator
for the driver's DuckDB differential harness.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_wordcounter_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from mapreduce_wordcounter_spark.operators.wordcount import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §7."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible ops → driver's rows-only check)."""
    return registry.all_oracles()
