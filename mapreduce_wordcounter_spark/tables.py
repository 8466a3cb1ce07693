"""Table access helpers for the driver-generated parquet corpus.

Tables (TESTDATA.md): TPC-H-ish ``region nation customer supplier part
orders lineitem`` plus ``events`` (stream-shaped), ``documents`` (the
word-count corpus analog of the reference's text files,
reference main.go:61-66) and ``embeddings``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan for one table. Column pruning + predicate pushdown
    happen automatically once callers ``select``/``filter`` (Catalyst).

    ``events.ts`` has shipped in two physical encodings across corpus
    generations, so the loader adapts to whichever it finds:

    - TIMESTAMP(NANOS): Spark's vectorized reader rejects it — read as
      raw int64 nanos and convert with integer arithmetic (``div``, not
      ``/``: epoch-nanos ≈ 1.7e18 exceeds a double's 2^53 integer
      range, so float division corrupts the low digits). Truncation
      (not rounding) to µs matches DuckDB.
    - TIMESTAMP(MICROS), no tz: Spark reads TIMESTAMP_NTZ natively —
      cast to session-tz TIMESTAMP (sessions pin UTC, so wall-clock and
      unix_micros are unchanged) so every downstream window/as-of query
      sees one stable type either way.
    """
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes)["ts"] == "bigint":
            return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


_ROWS_CACHE: dict[tuple[str, str, str], int] = {}


def table_rows(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Row count of a base table, cached per (session, sf_dir, table) —
    CATALOG-STATISTICS semantics: the count is a parquet-footer
    metadata read (no data pages) and base tables are immutable for a
    session, so strategy probes (e.g. orders_rfm_segments' size-
    adaptive NTILE) read it like an optimizer reads table stats
    instead of re-running a count job per query build. A production
    deployment gets this number from the catalog/manifest for free;
    the cache is that catalog."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    n = _ROWS_CACHE.get(key)
    if n is None:
        n = load_table(spark, sf_dir, name).count()
        _ROWS_CACHE[key] = n
    return n


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so SQL-form queries can run."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
