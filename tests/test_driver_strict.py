"""Strict driver-canonicalizer gate: every oracle query must match
DuckDB not just in values but in pandas REPRESENTATION (dtypes, no
Decimal objects, naive timestamps, no array cells) — the round-1 reds
were all representation-only drift the lenient gate let through."""

from __future__ import annotations

import pytest

from ripcurrent_spark.queries import all_queries
from tests.conftest import SF_ORACLE
from tests.parity import assert_no_array_columns, assert_parity_strict

QUERIES = all_queries()
ORACLE_NAMES = sorted(n for n, q in QUERIES.items() if q.oracle)
ROWS_ONLY_NAMES = sorted(n for n, q in QUERIES.items() if not q.oracle)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_driver_strict_parity(spark, ddb, name):
    q = QUERIES[name]
    assert_parity_strict(q.spark(spark, SF_ORACLE), ddb.sql(q.oracle), name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_no_array_output(spark, name):
    assert_no_array_columns(QUERIES[name].spark(spark, SF_ORACLE), name)
