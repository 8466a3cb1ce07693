"""Unit tests for tables.spread_narrow_scan and its size helpers —
the r12 verdict's latent scale bugs (directory-getsize, byte-suffix
parse) plus the r13 data-bounded width contract."""

from __future__ import annotations

import os

from mapreduce_wordcounter_spark.tables import (
    _dataset_bytes,
    _parse_bytes,
    load_table,
    spread_narrow_scan,
    table_rows,
)
from tests.conftest import SF_ORACLE


def test_parse_bytes_bare_and_suffixed():
    assert _parse_bytes("134217728") == 134217728
    assert _parse_bytes(134217728) == 134217728
    assert _parse_bytes("128m") == 128 << 20
    assert _parse_bytes("128MB") == 128 << 20
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("512k") == 512 << 10
    # unparsable → default, never a crash (r12 raised ValueError here)
    assert _parse_bytes("oops", default=7) == 7
    assert _parse_bytes("", default=7) == 7


def test_dataset_bytes_file_and_directory(tmp_path):
    f = tmp_path / "one.parquet"
    f.write_bytes(b"x" * 100)
    assert _dataset_bytes(str(f)) == 100
    # directory layout (the realistic 100 TB shape): sum of the data
    # files, commit markers and hidden files excluded — NOT the inode
    # size the r12 code returned.
    d = tmp_path / "tbl.parquet"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"a" * 300)
    (d / "part-1.parquet").write_bytes(b"b" * 200)
    (d / "_SUCCESS").write_bytes(b"")
    (d / ".hidden").write_bytes(b"z" * 999)
    assert _dataset_bytes(str(d)) == 500
    assert _dataset_bytes(str(tmp_path / "missing.parquet")) is None


def test_spread_width_is_data_bounded(spark):
    rows = table_rows(spark, SF_ORACLE, "documents")  # 500 at sf0.01
    df = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    out = spread_narrow_scan(
        spark, df, SF_ORACLE, "documents", key="doc_id", rows_per_task=160
    )
    expect = min(
        spark.sparkContext.defaultParallelism, -(-rows // 160)
    )
    assert out.rdd.getNumPartitions() == expect
    # rows_per_task >= rows → width 1 → structural no-op (same plan)
    same = spread_narrow_scan(
        spark, df, SF_ORACLE, "documents", key="doc_id", rows_per_task=10**9
    )
    assert same is df


def test_spread_suffixed_maxpb_conf_no_crash(spark):
    prior = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
    try:
        df = load_table(spark, SF_ORACLE, "documents")
        spread_narrow_scan(spark, df, SF_ORACLE, "documents")
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prior)


def test_spread_keyed_reuses_groupby_exchange(spark):
    """hash(doc_id) spread + groupBy(doc_id) must plan exactly ONE
    shuffle exchange — the keyed spread IS the aggregate's exchange
    moved below the map work."""
    from pyspark.sql import functions as F

    df = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    out = (
        spread_narrow_scan(
            spark, df, SF_ORACLE, "documents", key="doc_id", rows_per_task=160
        )
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1, plan
