"""REAL-concurrency protocol tests for sources/versioned.py.

tests/test_versioned.py proves the conflict path by wrapping _publish
(a simulated racer); these tests race ACTUAL concurrent writers from
threads — Spark's scheduler accepts jobs from multiple threads, and
the O_EXCL manifest publish is the only coordination point, which is
exactly the claim worth stressing: no commit is lost, no version is
double-assigned, and every retained row is readable exactly once.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from mapreduce_wordcounter_spark.sources.versioned import VersionedTable


def test_concurrent_appends_lose_nothing(spark, tmp_path):
    """Two writers, five appends each, racing on the same table: all
    ten commits must land (eleven versions with the create), and the
    final snapshot must contain every appended key exactly once —
    the lost-update absence the O_EXCL retry loop exists to provide."""
    vt = VersionedTable(str(tmp_path / "t"))
    vt.create(
        spark.createDataFrame([(0, -1)], "writer bigint, seq bigint")
    )
    errors: list[Exception] = []

    def writer(wid: int) -> None:
        try:
            for seq in range(5):
                vt.append(
                    spark.createDataFrame(
                        [(wid, seq)], "writer bigint, seq bigint"
                    )
                )
        except Exception as e:  # surface in the main thread
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in (1, 2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert vt.versions() == list(range(11))
    rows = sorted(
        (r["writer"], r["seq"]) for r in vt.read(spark).collect()
    )
    assert rows == sorted(
        [(0, -1)] + [(w, s) for w in (1, 2) for s in range(5)]
    )
    # Every intermediate snapshot is still a consistent prefix: row
    # count grows by exactly one per version.
    for v in vt.versions():
        assert vt.read(spark, v).count() == v + 1


def test_optimize_racing_appends_preserves_rows(spark, tmp_path):
    """An OPTIMIZE (read-modify-write rewrite) racing a stream of
    appends must never drop a committed row: on every conflict the
    rewrite re-runs against the winner, so the final snapshot holds
    the union of all appended keys regardless of interleaving."""
    vt = VersionedTable(str(tmp_path / "t2"))
    vt.create(spark.range(10).select(F.col("id").alias("k")))
    errors: list[Exception] = []

    def appender() -> None:
        try:
            for i in range(4):
                vt.append(
                    spark.createDataFrame([(100 + i,)], "k bigint")
                )
        except Exception as e:
            errors.append(e)

    def optimizer() -> None:
        try:
            for _ in range(2):
                vt.optimize(spark, cluster_by=["k"], n_files=2)
        except Exception as e:
            errors.append(e)

    ts = [
        threading.Thread(target=appender),
        threading.Thread(target=optimizer),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors
    got = sorted(r["k"] for r in vt.read(spark).collect())
    assert got == sorted(list(range(10)) + [100, 101, 102, 103])
    # 1 create + 4 appends + 2 optimizes, no double-assigned versions.
    assert vt.versions() == list(range(7))


def test_create_race_exactly_one_winner(spark, tmp_path):
    """Racing v0 creates: exactly one wins, the loser gets the
    VersionConflictError (create does not retry — an existing table
    is a caller bug, not a race to resolve)."""
    from mapreduce_wordcounter_spark.sources.versioned import (
        VersionConflictError,
    )

    vt = VersionedTable(str(tmp_path / "t3"))
    outcomes: list[str] = []
    lock = threading.Lock()

    def creator(tag: str) -> None:
        try:
            vt.create(spark.createDataFrame([(tag,)], "who string"))
            with lock:
                outcomes.append("won")
        except VersionConflictError:
            with lock:
                outcomes.append("conflict")

    ts = [threading.Thread(target=creator, args=(t,)) for t in ("a", "b")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(outcomes) == ["conflict", "won"]
    assert vt.versions() == [0]
    assert vt.read(spark).count() == 1


def _merge_keys(spark, vt, pairs, n_writes: list):
    """MERGE the (key, value) pairs in, counting plan executions via
    _write_data_files calls on this handle."""
    src = spark.createDataFrame(pairs, "s_k bigint, nv double")
    orig = vt._write_data_files

    def counting(df, schema=None):
        n_writes.append(1)
        return orig(df, schema)

    vt._write_data_files = counting
    try:
        return vt.merge_into(
            spark, src, key="k", source_key="s_k",
            update_set={"v": F.col("nv")},
            insert_exprs={"k": F.col("s_k"), "v": F.col("nv")},
        )
    finally:
        vt._write_data_files = orig


def test_disjoint_merges_rebase_without_replan(spark, tmp_path):
    """Two MERGEs on DISJOINT key ranges racing on the same table:
    the loser detects the winner's delta touched none of its files
    and none of its keys, re-parents its staged output (op metadata
    records rebased_from) — BOTH merges run their plan exactly once.

    The race is deterministic: writer A stages its files, then the
    hook lands writer B's full merge before A publishes."""
    path = str(tmp_path / "dj")
    vt_a = VersionedTable(path)
    vt_b = VersionedTable(path)
    df = (
        spark.range(100)
        .select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        .repartitionByRange(4, "k")
    )
    vt_a.create(df)  # 4 range-clustered files
    writes_a: list = []
    writes_b: list = []
    orig = vt_a._write_data_files

    def hook(dfx, schema=None):
        files = orig(dfx, schema)
        if not writes_b:  # land B exactly once, between A's write & publish
            _merge_keys(spark, vt_b, [(97, 970.0)], writes_b)
        writes_a.append(1)
        return files

    vt_a._write_data_files = hook
    try:
        v = vt_a.merge_into(
            spark,
            spark.createDataFrame([(2, 20.0)], "s_k bigint, nv double"),
            key="k", source_key="s_k",
            update_set={"v": F.col("nv")},
            insert_exprs={"k": F.col("s_k"), "v": F.col("nv")},
        )
    finally:
        vt_a._write_data_files = orig
    assert len(writes_a) == 1, "loser re-ran its plan despite disjoint keys"
    assert len(writes_b) == 1
    assert v == 2
    snap = vt_a.snapshot(2)
    assert snap["operation"] == "merge" and snap.get("rebased_from") == 0
    got = {r["k"]: r["v"] for r in vt_a.read(spark).collect()}
    assert got[2] == 20.0 and got[97] == 970.0  # neither update lost
    assert len(got) == 100


def test_overlapping_merges_still_replan(spark, tmp_path):
    """Two MERGEs touching the SAME key: the rebase must refuse (the
    winner's added file carries the loser's key) and the loser re-runs
    its full plan against the winner — the lost-update rule intact."""
    path = str(tmp_path / "ov")
    vt_a = VersionedTable(path)
    vt_b = VersionedTable(path)
    df = (
        spark.range(100)
        .select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        .repartitionByRange(4, "k")
    )
    vt_a.create(df)
    writes_a: list = []
    writes_b: list = []
    orig = vt_a._write_data_files
    state = {"raced": False}

    def hook(dfx, schema=None):
        files = orig(dfx, schema)
        if not state["raced"]:
            state["raced"] = True
            _merge_keys(spark, vt_b, [(5, 500.0)], writes_b)
        writes_a.append(1)
        return files

    vt_a._write_data_files = hook
    try:
        vt_a.merge_into(
            spark,
            spark.createDataFrame([(5, 555.0)], "s_k bigint, nv double"),
            key="k", source_key="s_k",
            update_set={"v": F.col("nv")},
            insert_exprs={"k": F.col("s_k"), "v": F.col("nv")},
        )
    finally:
        vt_a._write_data_files = orig
    assert len(writes_a) == 2, "overlapping merge must re-plan, not rebase"
    # last writer's plan re-ran against the winner: final value is A's
    got = {r["k"]: r["v"] for r in vt_a.read(spark).collect()}
    assert got[5] == 555.0
    assert len(got) == 100
    assert "rebased_from" not in vt_a.snapshot()


def test_disjoint_delete_keys_rebases(spark, tmp_path):
    """DELETE-by-keys gets the same admission: a delete racing a
    disjoint-range merge re-parents instead of re-scanning."""
    path = str(tmp_path / "dd")
    vt_a = VersionedTable(path)
    vt_b = VersionedTable(path)
    df = (
        spark.range(100)
        .select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        .repartitionByRange(4, "k")
    )
    vt_a.create(df)
    writes_a: list = []
    writes_b: list = []
    orig = vt_a._write_data_files
    state = {"raced": False}

    def hook(dfx, schema=None):
        files = orig(dfx, schema)
        if not state["raced"]:
            state["raced"] = True
            _merge_keys(spark, vt_b, [(98, 980.0)], writes_b)
        writes_a.append(1)
        return files

    vt_a._write_data_files = hook
    try:
        vt_a.delete_keys(
            spark,
            spark.createDataFrame([(3,), (7,)], "dk bigint"),
            key="k", source_key="dk",
        )
    finally:
        vt_a._write_data_files = orig
    assert len(writes_a) == 1, "disjoint delete re-ran its plan"
    got = {r["k"]: r["v"] for r in vt_a.read(spark).collect()}
    assert 3 not in got and 7 not in got and got[98] == 980.0
    assert len(got) == 98
    assert vt_a.snapshot().get("rebased_from") == 0


def test_mor_deletes_racing_appends(spark, tmp_path):
    """MoR deletes and appends race on the same table: every commit
    lands, DV tombstones apply only to the rows that existed when the
    delete's scan ran (optimistic snapshot semantics), and no appended
    row is lost. The DV commit retries like every read-modify-write."""
    vt = VersionedTable(str(tmp_path / "t"), partition_by=["p"])
    vt.create(
        spark.range(40).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).cast("string").alias("p"),
        )
    )
    errors: list[Exception] = []

    def deleter() -> None:
        try:
            for i in range(4):
                vt.delete_where_mor(spark, F.col("k") == i * 10)
        except Exception as e:
            errors.append(e)

    def appender() -> None:
        try:
            for i in range(4):
                vt.append(
                    spark.createDataFrame([(1000 + i, "1")], "k bigint, p string")
                )
        except Exception as e:
            errors.append(e)

    t1 = threading.Thread(target=deleter)
    t2 = threading.Thread(target=appender)
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errors
    got = vt.read(spark)
    assert got.filter("k in (0, 10, 20, 30)").count() == 0
    assert got.filter("k >= 1000").count() == 4
    assert got.count() == 40 - 4 + 4
    assert vt.latest_version() == 8  # create + 4 deletes + 4 appends


def test_delete_partitions_racing_append(spark, tmp_path):
    """DROP PARTITION racing an append into a DIFFERENT partition:
    both commits land; the append's rows survive because the delete's
    retry re-reads the winner's file list before classifying files."""
    vt = VersionedTable(str(tmp_path / "t"), partition_by=["p"])
    vt.create(
        spark.range(20).select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("p"),
        )
    )
    errors: list[Exception] = []

    def dropper() -> None:
        try:
            vt.delete_partitions(spark, {"p": ["a"]})
        except Exception as e:
            errors.append(e)

    def appender() -> None:
        try:
            for i in range(3):
                vt.append(
                    spark.createDataFrame([(100 + i, "b")], "k bigint, p string")
                )
        except Exception as e:
            errors.append(e)

    t1 = threading.Thread(target=dropper)
    t2 = threading.Thread(target=appender)
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errors
    got = vt.read(spark)
    assert got.filter("p = 'a'").count() == 0
    assert got.filter("k >= 100").count() == 3
    assert got.count() == 10 + 3


def test_branch_and_main_writers_race(spark, tmp_path):
    """Refs under REAL concurrency (round 12): one writer appends to
    main while another stacks appends on branch 'stage'. Invariants:
    every commit of both writers lands (no lost updates on either
    lineage), version slots are globally unique, the main lineage
    contains exactly the main rows (staged rows never leak), and the
    branch chain contains main's fork-point rows plus every staged
    row committed before its fork — here the branch forks from
    whatever main head its first commit observed, so the branch total
    is its own 4 commits plus that observed prefix."""
    vt = VersionedTable(str(tmp_path / "br"))
    vt.create(
        spark.createDataFrame([("main", -1)], "lane string, seq bigint")
    )
    errors: list[Exception] = []

    def main_writer() -> None:
        try:
            for seq in range(4):
                vt.append(
                    spark.createDataFrame(
                        [("main", seq)], "lane string, seq bigint"
                    )
                )
        except Exception as e:
            errors.append(e)

    def branch_writer() -> None:
        try:
            for seq in range(4):
                vt.append(
                    spark.createDataFrame(
                        [("stage", seq)], "lane string, seq bigint"
                    ),
                    branch="stage",
                )
        except Exception as e:
            errors.append(e)

    threads = [
        threading.Thread(target=main_writer),
        threading.Thread(target=branch_writer),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    # 9 commits total (create + 4 + 4), all slots unique and present
    assert len(vt.versions()) == 9
    assert len(set(vt.versions())) == 9
    # main lineage serves exactly the 5 main rows — staged rows never leak
    main_rows = sorted(
        (r["lane"], r["seq"]) for r in vt.read(spark).collect()
    )
    assert main_rows == [("main", s) for s in range(-1, 4)]
    assert vt.latest_version() == max(
        v for v in vt.versions()
        if "branch" not in vt._load_manifest(v)
    )
    # branch chain: all 4 staged rows, plus the main prefix its fork
    # point had seen; stacked staged commits chain through parents
    b_rows = [
        (r["lane"], r["seq"])
        for r in vt.read_ref(spark, "stage").collect()
    ]
    stage_rows = sorted(x for x in b_rows if x[0] == "stage")
    assert stage_rows == [("stage", s) for s in range(4)]
    main_prefix = sorted(x[1] for x in b_rows if x[0] == "main")
    assert main_prefix == list(range(-1, len(main_prefix) - 1))
    # publishing after main moved past the fork must refuse, never
    # silently drop main commits
    head = vt.latest_version()
    fork_walk = vt.ref_version("stage")
    seen = set()
    v = fork_walk
    while v is not None:
        seen.add(v)
        v = vt._load_manifest(v).get("parent")
    if head in seen:
        assert vt.fast_forward("stage") == fork_walk
    else:
        with pytest.raises(Exception, match="not an ancestor"):
            vt.fast_forward("stage")


def test_same_branch_writers_race(spark, tmp_path):
    """Two writers stacking on the SAME branch: same-lineage racers
    compute the same slot and collide on O_EXCL publish — after both
    drain, the branch chain holds all eight staged rows exactly once
    and main never moved."""
    vt = VersionedTable(str(tmp_path / "sb"))
    vt.create(spark.createDataFrame([(0, -1)], "writer bigint, seq bigint"))
    errors: list[Exception] = []

    def writer(wid: int) -> None:
        try:
            for seq in range(4):
                vt.append(
                    spark.createDataFrame(
                        [(wid, seq)], "writer bigint, seq bigint"
                    ),
                    branch="stage",
                )
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in (1, 2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert vt.latest_version() == 0  # main untouched
    rows = sorted(
        (r["writer"], r["seq"])
        for r in vt.read_ref(spark, "stage").collect()
    )
    assert rows == sorted(
        [(0, -1)] + [(w, s) for w in (1, 2) for s in range(4)]
    )
    # after publish, main serves the full staged chain
    vt.fast_forward("stage")
    assert vt.read(spark).count() == 9
