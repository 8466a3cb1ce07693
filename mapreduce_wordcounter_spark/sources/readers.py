"""Input connectors (SURVEY.md §2 O1/O3/O15).

The reference's entire source surface is "positional CLI args naming
raw text files, scanned in 1 MiB chunks, with unopenable/corrupt files
warned and skipped" (reference main.go:61-66, 127-139, 128-131,
157-160). Spark-first equivalents:

- ``read_text_corpus``: the direct analog — a text ``FileScan`` over a
  path list, one row per line, with the originating file recoverable
  via ``input_file_name()`` (the reference's per-file grain) and
  corrupt/missing members tolerated via ``ignoreCorruptFiles`` /
  ``ignoreMissingFiles`` (the reference's warn-and-skip, O15b/c).
- typed CSV / JSON / parquet readers with **explicit schemas** — the
  reference has none (schemaless text), but every extension table is
  schema-first; inference is banned on the 100 TB path because it
  costs an extra full scan and type-drifts between runs.

Scale posture: Spark splits large files at ``maxPartitionBytes``
boundaries (the fix for the reference's file-granularity skew,
SURVEY.md §4.3 item 2); a 100 TB corpus of small files instead needs
coalesced file groups — both are scan-planner concerns the DataFrame
API already owns. Gzip/zstd text is unsplittable: one task per file,
so at scale the corpus should be stored uncompressed-chunked or zstd
with frame-level splitting (parquet preferred).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_text_corpus(
    spark: SparkSession,
    paths: Sequence[str],
    *,
    tolerate_corrupt: bool = True,
    whole_file: bool = False,
) -> DataFrame:
    """Scan a bag of text files → ``(path, text)`` rows.

    ``whole_file=False`` (default): one row per line — the shape the
    flagship tokenizer wants; a token can never straddle a split point
    because Spark's text source splits on line boundaries (structurally
    immune to the reference's chunk-boundary token-splitting bug,
    main.go:137-153 / SURVEY.md §4.3 item 3).

    ``whole_file=True``: one row per file (``wholetext``) — the
    reference's per-file processing grain (main.go:125), at the cost of
    unsplittable per-file tasks; only for small-file corpora.

    Empty ``paths`` raises ``ValueError`` like the reference's empty-args
    exit (main.go:61-64) rather than returning an empty frame silently.
    """
    if not paths:
        raise ValueError("no input files given")
    reader = spark.read
    if tolerate_corrupt:
        reader = reader.option("ignoreCorruptFiles", "true").option(
            "ignoreMissingFiles", "true"
        )
    df = reader.text(list(paths), wholetext=whole_file)
    return df.select(
        F.input_file_name().alias("path"), F.col("value").alias("text")
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    header: bool = True,
    strict: bool = True,
) -> DataFrame:
    """CSV with a mandatory explicit schema.

    ``strict=True`` → FAILFAST (malformed row kills the job: the right
    default for curated tables). ``strict=False`` → PERMISSIVE with a
    ``_corrupt_record`` column, the quarantine pattern for raw-crawl
    ingestion — the scalable version of the reference's warn-and-keep-
    partial semantics (main.go:157-167).
    """
    reader = spark.read.option("header", str(header).lower())
    if strict:
        reader = reader.option("mode", "FAILFAST")
    else:
        schema = T.StructType(
            [*schema.fields, T.StructField("_corrupt_record", T.StringType())]
        )
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        )
    return reader.schema(schema).csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    strict: bool = True,
) -> DataFrame:
    """JSON-lines with a mandatory explicit schema (same strictness
    contract as :func:`read_csv`)."""
    reader = spark.read
    if strict:
        reader = reader.option("mode", "FAILFAST")
    else:
        schema = T.StructType(
            [*schema.fields, T.StructField("_corrupt_record", T.StringType())]
        )
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        )
    return reader.schema(schema).json(path)


def read_parquet(
    spark: SparkSession,
    path: str,
    *,
    expected_schema: T.StructType | None = None,
) -> DataFrame:
    """Parquet scan; optionally assert the footer schema matches
    ``expected_schema`` by name+type (catches silent upstream drift
    before a 1000-executor job burns hours on it)."""
    df = spark.read.parquet(path)
    if expected_schema is not None:
        got = {f.name: f.dataType for f in df.schema.fields}
        want = {f.name: f.dataType for f in expected_schema.fields}
        if got != want:
            raise TypeError(f"schema drift at {path}: {got} != {want}")
    return df


def read_orc(
    spark: SparkSession,
    path: str,
    *,
    expected_schema: T.StructType | None = None,
) -> DataFrame:
    """ORC scan (Spark-native columnar alternative to parquet — common
    in Hive-lineage warehouses); same drift guard as read_parquet.
    ORC scans support the same predicate pushdown / column pruning,
    asserted in tests/test_sources.py. DuckDB cannot read ORC, so the
    round-trip test oracles against the parquet-sourced original
    rather than a SQL string."""
    df = spark.read.orc(path)
    if expected_schema is not None:
        got = {f.name: f.dataType for f in df.schema.fields}
        want = {f.name: f.dataType for f in expected_schema.fields}
        if got != want:
            raise TypeError(f"schema drift at {path}: {got} != {want}")
    return df
