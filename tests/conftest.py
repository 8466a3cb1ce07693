"""Shared pytest fixtures: one SparkSession and one DuckDB connection
per test session, mirroring the driver's harness setup."""

from __future__ import annotations

import os
import tempfile

import duckdb
import pytest

from mapreduce_wordcounter_spark import TABLES, get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

# Isolate the persistent index catalog per test run (unless the caller
# pinned one): the catalog deliberately survives sessions, so a code
# change to an index BUILDER with unchanged params would otherwise
# serve a stale artifact built by a previous pytest run and turn a
# real regression into a confusing parity flake. Cross-RUN reuse is
# pinned explicitly in tests/test_index_catalog.py with its own root.
os.environ.setdefault(
    "SPARK_GRAFT_INDEX_DIR",
    tempfile.mkdtemp(prefix="mrwc_idxcat_pytest_"),
)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("pytest")
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    yield con
    con.close()
