from __future__ import annotations

import os

import duckdb
import pytest

from ripcurrent_spark.io import TABLES
from ripcurrent_spark.session import get_spark

SF_SMOKE = os.environ.get("RIPC_TEST_SF", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("RIPC_ORACLE_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ripcurrent_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    yield con
    con.close()
