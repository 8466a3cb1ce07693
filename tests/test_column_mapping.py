"""Column mapping for versioned tables (sources/versioned.py): RENAME
and DROP as metadata-only commits over stable physical names — the
published Delta column-mapping recipe. The properties pinned here are
the protocol's contract: renames never move data, time travel serves
each snapshot under ITS OWN names, dropped data can never resurface
under a re-added column, and every transactional op (merge, delete,
optimize, CDC, pruning) keeps working through the mapping."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mapreduce_wordcounter_spark.sources.versioned import (
    VersionConflictError,
    VersionedTable,
)


def _mk(spark, tmp_path, n=40, files=4, **kw):
    vt = VersionedTable(str(tmp_path / "cm"), **kw)
    df = (
        spark.range(n)
        .select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        .repartitionByRange(files, "k")
    )
    vt.create(df)
    return vt


def test_rename_is_metadata_only_and_time_travels(spark, tmp_path):
    vt = _mk(spark, tmp_path)
    files_before = vt.snapshot(0)["files"]
    v1 = vt.rename_column("v", "price")
    assert v1 == 1
    # metadata only: identical file list, nothing rewritten
    assert vt.snapshot(1)["files"] == files_before
    # latest serves the new name with the same values
    latest = vt.read(spark)
    assert latest.columns == ["k", "price"]
    assert {r["k"]: r["price"] for r in latest.collect()}[7] == 7.0
    # the pre-rename snapshot still serves the OLD name
    old = vt.read(spark, 0)
    assert old.columns == ["k", "v"]
    assert {r["k"]: r["v"] for r in old.collect()}[7] == 7.0
    # and a fresh handle (no cache) agrees both ways
    fresh = VersionedTable(vt.path)
    assert fresh.read(spark, 1).columns == ["k", "price"]
    assert fresh.read(spark, 0).columns == ["k", "v"]


def test_rename_then_merge_delete_optimize_append(spark, tmp_path):
    """Every transactional op keeps working through the mapping, and
    data written before/after the rename lines up (stable physical
    names)."""
    vt = _mk(spark, tmp_path)
    vt.rename_column("v", "price")
    # append post-rename: logical 'price' lands in the physical 'v'
    vt.append(
        spark.createDataFrame([(100, 100.0)], "k bigint, price double")
    )
    src = spark.createDataFrame([(3, 999.0), (200, 200.0)], "s_k bigint, np double")
    vt.merge_into(
        spark, src, key="k", source_key="s_k",
        update_set={"price": F.col("np")},
        insert_exprs={"k": F.col("s_k"), "price": F.col("np")},
    )
    vt.delete_where(spark, F.col("k") == 5)
    vt.optimize(spark, ["k"], n_files=2)
    out = {r["k"]: r["price"] for r in vt.read(spark).collect()}
    assert out[3] == 999.0 and out[100] == 100.0 and out[200] == 200.0
    assert 5 not in out
    assert out[7] == 7.0  # pre-rename data under the new name
    assert len(out) == 41  # 40 - 1 deleted + 2 appended/inserted
    # physical files still store the ORIGINAL column name
    import pyarrow.parquet as pq

    snap = vt.snapshot()
    names = pq.ParquetFile(
        os.path.join(vt.path, snap["files"][0])
    ).schema_arrow.names
    assert "v" in names and "price" not in names


def test_drop_column_tombstone_and_no_resurface(spark, tmp_path):
    """DROP hides the column from the dropping snapshot onward while
    older snapshots still serve it; re-adding the same logical name
    allocates a FRESH physical column, so the dropped data surfaces as
    NULL for old rows — never the retired values."""
    vt = _mk(spark, tmp_path, n=10, files=1)
    vt.rename_column("v", "tmp")  # v1: initialize mapping
    vt.drop_column("tmp")  # v2: tombstone
    assert vt.read(spark).columns == ["k"]
    assert vt.read(spark, 1).columns == ["k", "tmp"]  # pre-drop serves it
    assert vt.read(spark, 0).columns == ["k", "v"]
    # re-add logical 'v': must NOT resurface v0's physical 'v' data
    vt.append(spark.createDataFrame([(50, 5.5)], "k bigint, v double"))
    rows = {r["k"]: r["v"] for r in vt.read(spark).collect()}
    assert rows[50] == 5.5
    assert rows[3] is None  # old row: retired physical data stays buried
    schema = vt.snapshot()["schema"]
    ent = {c["name"]: c for c in schema["cols"]}
    assert ent["v"]["phys"] != "v"  # fresh physical name
    assert "v" in schema["phys_used"]  # original stays retired


def test_rename_survives_checkpoint_and_vacuum(spark, tmp_path):
    """The mapping rides checkpoints: after vacuum expires the rename
    commit itself, a fresh handle resolving from the floor checkpoint
    still serves the renamed column."""
    vt = VersionedTable(str(tmp_path / "ck"), checkpoint_interval=2)
    vt.create(spark.createDataFrame([(0, 0.0)], "k bigint, v double"))
    vt.rename_column("v", "price")  # v1
    vt.append(spark.createDataFrame([(1, 1.0)], "k bigint, price double"))  # v2 (checkpoint)
    vt.append(spark.createDataFrame([(2, 2.0)], "k bigint, price double"))  # v3
    vt.vacuum(retain_last=2)  # expires v0, v1 (the rename commit)
    fresh = VersionedTable(str(tmp_path / "ck"), checkpoint_interval=2)
    df = fresh.read(spark, 3)
    assert df.columns == ["k", "price"]
    assert df.count() == 3


def test_rollback_past_rename_restores_old_schema(spark, tmp_path):
    vt = _mk(spark, tmp_path, n=10, files=1)
    vt.rename_column("v", "price")  # v1
    vt.rollback(0)  # v2: files AND mapping of v0
    assert vt.read(spark).columns == ["k", "v"]
    # history intact: the renamed snapshot still reads under its name
    assert vt.read(spark, 1).columns == ["k", "price"]
    fresh = VersionedTable(vt.path)
    assert fresh.read(spark, 2).columns == ["k", "v"]


def test_cdc_across_rename_boundary(spark, tmp_path):
    """The change feed spans a rename: both sides line up on the
    stable physical column, the feed speaks v_to's logical names, and
    only genuinely-changed keys appear (a rename alone changes no
    values)."""
    vt = _mk(spark, tmp_path)
    vt.rename_column("v", "price")  # v1
    src = spark.createDataFrame([(3, 999.0)], "s_k bigint, np double")
    vt.merge_into(
        spark, src, key="k", source_key="s_k",
        update_set={"price": F.col("np")},
        insert_exprs={"k": F.col("s_k"), "price": F.col("np")},
    )  # v2
    feed = vt.read_changes(spark, "k", 0, 2).collect()
    assert len(feed) == 1
    r = feed[0]
    assert (r["k"], r["change_type"]) == (3, "update")
    assert r["old_price"] == 3.0 and r["new_price"] == 999.0
    # pure-rename window: empty feed (metadata-only, no row changed)
    assert vt.read_changes(spark, "k", 0, 1).count() == 0


def test_pruning_survives_rename_of_stats_column_alias(spark, tmp_path):
    """stats_col names the PHYSICAL column: pruned reads and the
    metadata-first merge probe keep pruning after the logical rename
    (physical stats keys never re-key)."""
    vt = VersionedTable(str(tmp_path / "pr"), stats_col="k")
    df = (
        spark.range(100)
        .select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        .repartitionByRange(4, "k")
    )
    vt.create(df)
    vt.rename_column("k", "key_id")
    snap = vt.snapshot()
    assert snap["stats"]  # stats intact across the rename
    pruned = vt.read_pruned(spark, 10, 20)
    assert pruned.columns == ["key_id", "v"]
    got = sorted(
        r["key_id"]
        for r in pruned.filter(
            (F.col("key_id") >= 10) & (F.col("key_id") <= 20)
        ).collect()
    )
    assert got == list(range(10, 21))


def test_rename_drop_validation_errors(spark, tmp_path):
    vt = _mk(spark, tmp_path, n=10, files=1, stats_col="k")
    with pytest.raises(ValueError, match="no such column"):
        vt.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        vt.rename_column("v", "k")
    with pytest.raises(ValueError, match="stats"):
        vt.drop_column("k")
    vt.drop_column("v")
    with pytest.raises(ValueError, match="last column"):
        vt.drop_column("k")


def test_concurrent_schema_change_fails_append(spark, tmp_path):
    """An append racing a rename must NOT commit files staged under
    the old physical mapping assumptions — the metadata conflict
    surfaces as VersionConflictError (Delta's conflict matrix)."""
    vt = _mk(spark, tmp_path, n=10, files=1)
    vt.rename_column("v", "price")  # mapping active
    racer = VersionedTable(vt.path)
    orig = vt._write_data_files

    def hook(df, schema=None):
        files = orig(df, schema)
        racer.rename_column("price", "amount")  # lands mid-append
        return files

    vt._write_data_files = hook
    with pytest.raises(VersionConflictError, match="schema change"):
        vt.append(
            spark.createDataFrame([(99, 9.0)], "k bigint, price double")
        )
    # table state is the racer's commit, untouched by the failed append
    assert vt.read(spark).columns == ["k", "amount"]
    assert vt.read(spark).count() == 10


def test_schema_downgrade_survives_checkpoint_resolution(spark, tmp_path):
    """A rollback past the mapping's creation records an EXPLICIT
    schema downgrade; later commits that merely inherit must not
    resurrect the checkpoint's stale mapping during delta-chain
    resolution (the schema tracks THROUGH the chain, not from the
    base's value)."""
    vt = VersionedTable(str(tmp_path / "dg"), checkpoint_interval=2)
    vt.create(spark.createDataFrame([(0, 0.0)], "k bigint, v double"))
    vt.rename_column("v", "price")  # v1: mapping active
    vt.append(
        spark.createDataFrame([(1, 1.0)], "k bigint, price double")
    )  # v2: checkpoint carries the mapping
    import os as _os

    assert _os.path.exists(vt._checkpoint_path(2))
    vt.rollback(0)  # v3: explicit downgrade to the unmapped v0
    vt.append(spark.createDataFrame([(2, 2.0)], "k bigint, v double"))  # v4
    fresh = VersionedTable(str(tmp_path / "dg"), checkpoint_interval=2)
    df = fresh.read(spark, 4)  # resolves v4 <- v3 <- checkpoint@v2
    assert df.columns == ["k", "v"]
    assert df.count() == 2
    # and the mapped snapshot still time-travels under its own name
    assert fresh.read(spark, 2).columns == ["k", "price"]
