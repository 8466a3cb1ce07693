"""The persistent index catalog (sources/index_catalog.py, VERDICT r8
#4): at-rest index artifacts keyed on source fingerprint + params —
not the session — with a manifest recording build provenance and a
staleness contract against versioned sources.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mapreduce_wordcounter_spark.sources import index_catalog as ic
from mapreduce_wordcounter_spark.sources.versioned import VersionedTable


@pytest.fixture()
def catalog_root(tmp_path, monkeypatch):
    root = tmp_path / "idxcat"
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(root))
    return str(root)


def _tiny_table(spark, path):
    spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).coalesce(1).write.mode("overwrite").parquet(path)


def test_lookup_miss_then_publish_then_hit(catalog_root, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "a.parquet"), "wb") as fh:
        fh.write(b"x" * 10)
    fp = ic.parquet_fingerprint(src)
    assert ic.lookup("t", src, None, fp) is None
    data = ic.allocate("t", src, None)
    os.makedirs(os.path.join(data, "rel"), exist_ok=True)
    ic.publish("t", src, None, fp, data, build_version=3)
    assert ic.lookup("t", src, None, fp) == data
    # fingerprint mismatch -> miss (stale index never served)
    assert ic.lookup("t", src, None, "other") is None
    # params are part of the identity
    assert ic.lookup("t", src, {"k": 2}, fp) is None
    m = ic.manifest("t", src, None)
    assert m["build_version"] == 3


def test_fingerprint_tracks_source_changes(tmp_path):
    src = str(tmp_path / "s.parquet")
    with open(src, "wb") as fh:
        fh.write(b"abc")
    fp1 = ic.parquet_fingerprint(src)
    assert fp1 == ic.parquet_fingerprint(src)  # stat-stable
    os.utime(src, (1, 1))
    assert ic.parquet_fingerprint(src) != fp1  # mtime change invalidates
    missing = ic.parquet_fingerprint(str(tmp_path / "nope.parquet"))
    assert missing != fp1


def test_fingerprint_memoized_one_walk_per_source(tmp_path):
    """Serve-tier cost contract (VERDICT r9 #5): repeated fingerprint
    lookups over an UNCHANGED source run the recursive O(files) walk
    ONCE per process — later calls are an O(1) root-stat probe — while
    any root-visible change (new part file, utime) re-walks and flips
    the fingerprint."""
    src = str(tmp_path / "corpus")
    os.makedirs(src)
    for i in range(5):
        with open(os.path.join(src, f"part-{i}.parquet"), "wb") as fh:
            fh.write(b"x" * (i + 1))
    before = ic._FP_WALKS
    fp1 = ic.parquet_fingerprint(src)
    assert ic._FP_WALKS == before + 1
    for _ in range(10):
        assert ic.parquet_fingerprint(src) == fp1
    assert ic._FP_WALKS == before + 1  # memo hit: no further walks
    # a new file at the root bumps the dir mtime: probe flips, one
    # fresh walk, new fingerprint
    with open(os.path.join(src, "part-9.parquet"), "wb") as fh:
        fh.write(b"y")
    fp2 = ic.parquet_fingerprint(src)
    assert fp2 != fp1
    assert ic._FP_WALKS == before + 2
    assert ic.parquet_fingerprint(src) == fp2
    assert ic._FP_WALKS == before + 2


def test_fingerprint_detects_partitioned_append(tmp_path):
    """ADVICE r10 (low): appending part files INTO existing hive
    partition subdirectories (a normal partitioned append) changes
    neither the root dir's mtime nor size when _SUCCESS is rewritten
    in place — the root-only probe served a stale fingerprint and the
    staleness check called a mutated source fresh for the rest of the
    process. The probe now stats first-level children too
    (O(#partitions), not O(files))."""
    src = str(tmp_path / "part_corpus")
    sub = os.path.join(src, "lang=en")
    os.makedirs(sub)
    with open(os.path.join(sub, "part-0.parquet"), "wb") as fh:
        fh.write(b"x" * 8)
    with open(os.path.join(src, "_SUCCESS"), "wb") as fh:
        fh.write(b"")
    fp1 = ic.parquet_fingerprint(src)
    assert ic.parquet_fingerprint(src) == fp1  # memo hit, stable
    root_stat = os.stat(src)
    # partitioned append: new file in the EXISTING subdir only;
    # _SUCCESS rewritten in place; root mtime pinned back as if the
    # writer never touched the root
    with open(os.path.join(sub, "part-1.parquet"), "wb") as fh:
        fh.write(b"y" * 8)
    with open(os.path.join(src, "_SUCCESS"), "wb") as fh:
        fh.write(b"")
    os.utime(src, ns=(root_stat.st_atime_ns, root_stat.st_mtime_ns))
    assert ic.parquet_fingerprint(src) != fp1  # subdir stat flips probe


def test_table_index_builds_once_and_across_sessions(
    spark, catalog_root, tmp_path
):
    """Cross-session reuse: the catalog key carries NO session
    identity — a second (new) SparkSession resolves the artifact
    without calling build again."""
    src = str(tmp_path / "t.parquet")
    _tiny_table(spark, src)
    calls = []

    def build(data):
        calls.append(data)
        spark.read.parquet(src).write.parquet(data + "/rel")

    out1 = ic.table_index(spark, "tix", [src], {"p": 1}, build, ["rel"])
    assert len(calls) == 1 and out1["rel"].count() == 20
    # a DIFFERENT session object (fresh session state over the same
    # catalog root) must hit, not rebuild
    spark2 = spark.newSession()
    out2 = ic.table_index(spark2, "tix", [src], {"p": 1}, build, ["rel"])
    assert len(calls) == 1
    assert out2["rel"].count() == 20
    # source rewrite -> fingerprint change -> rebuild
    _tiny_table(spark, src)
    ic.table_index(spark, "tix", [src], {"p": 1}, build, ["rel"])
    assert len(calls) == 2


def test_versioned_staleness_flips_rebuild(spark, catalog_root, tmp_path):
    """An index built at table version b goes stale as the table
    commits past it; the decision flips at the threshold — read from
    the manifest, never by recomputing anything."""
    vt = VersionedTable(str(tmp_path / "vt"))
    vt.create(
        spark.range(10).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
    )
    src = vt.path
    data = ic.allocate("comp", src, None)
    os.makedirs(os.path.join(data, "labels"), exist_ok=True)
    ic.publish(
        "comp", src, None, ic.versioned_fingerprint(0), data,
        build_version=0,
    )
    for _ in range(3):  # v1..v3
        vt.append(spark.createDataFrame([(100, 1.0)], "k bigint, v double"))
    cur = vt.latest_version()
    assert cur == 3
    d = ic.versioned_rebuild_decision("comp", src, None, cur, max_staleness=4)
    assert d["staleness"] == 3 and d["rebuild"] is False
    vt.append(spark.createDataFrame([(101, 1.0)], "k bigint, v double"))
    d = ic.versioned_rebuild_decision(
        "comp", src, None, vt.latest_version(), max_staleness=4
    )
    assert d["staleness"] == 4 and d["rebuild"] is True
    # no published index at all -> rebuild unconditionally
    d = ic.versioned_rebuild_decision("never", src, None, 0)
    assert d["rebuild"] is True and d["staleness"] is None


def test_crash_safe_publish(catalog_root, tmp_path):
    """A builder that died after writing data but before the manifest
    leaves no published index — the next lookup misses and rebuilds."""
    src = str(tmp_path / "x.parquet")
    with open(src, "wb") as fh:
        fh.write(b"z")
    fp = ic.parquet_fingerprint(src)
    data = ic.allocate("t2", src, None)
    os.makedirs(os.path.join(data, "rel"), exist_ok=True)
    # no publish -> miss
    assert ic.lookup("t2", src, None, fp) is None
