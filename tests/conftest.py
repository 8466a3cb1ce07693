"""Shared pytest fixtures: one SparkSession and one DuckDB connection
per test session, mirroring the driver's harness setup."""

from __future__ import annotations

import duckdb
import pytest

from mapreduce_wordcounter_spark import TABLES, get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


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
