"""Output connectors (SURVEY.md §2 O12).

The reference's only sink is an unordered stdout table, disabled at its
own call site because serializing the full result through one printer
re-serialized the whole pipeline (reference main.go:72,174-181;
README's Amdahl discussion). The engine-side rule that generalizes:
**never funnel an unbounded result through the driver** — write
distributed, aggregate first, or cap with a limit.

Sinks here are the three that matter for a training-data pipeline:

- partitioned parquet (the lake layout: partition pruning for free on
  the partition keys — coarse, low-cardinality columns only; a
  high-cardinality partition key melts the namenode/listing path);
- bucketed tables (pre-shuffled layout: repeated joins/aggs on the
  bucket key skip their exchange entirely — the durable fix for the
  reference's single-global-map merge bottleneck, main.go:191-193);
- single-file CSV/JSON exports for the driver-sized result sets
  (explicitly the small-data path: ``coalesce(1)`` serializes the
  write, which is the point — results, not datasets).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    *,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Hive-style partitioned parquet. ``maxRecordsPerFile`` bounds the
    worst file so one hot partition (Zipf keys) can't produce a
    multi-GB straggler file."""
    writer = df.write.mode(mode).partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    n_buckets: int,
    *,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed + optionally sorted table (managed, or external when
    ``path`` is given). A join or groupBy on the bucket key between two
    tables bucketed the same way runs with zero exchanges (verified by
    tests/test_sources.py plan assertions). At 100 TB this converts the
    nightly fact⋈fact join from the cluster's largest shuffle into a
    local zipper."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def export_single_csv(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """One-file CSV export for driver-sized results (reports, oracle
    dumps). Deliberately serial — do not point this at a dataset."""
    df.coalesce(1).write.mode(mode).option("header", "true").csv(path)


def export_single_json(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """One-file JSON-lines export; same small-data contract as
    :func:`export_single_csv`."""
    df.coalesce(1).write.mode(mode).json(path)
