"""Registry-wide cache-hygiene sweep (VERDICT r7 #2).

Every registry query must leave ZERO cached frames behind once the
caller invokes the cachereg release seam. Queries that never persist
pass trivially; queries whose returned lineage reads a persisted frame
must register it with cachereg.track — this sweep is what keeps the
r6/r7 leak class (one cached frame per call in a long-lived session)
from recurring as new queries land.

The r7 per-query tests (tests/test_round7_ops.py) additionally pin
that rfm/pq/kmeans leak nothing even WITHOUT the release seam — their
persists are internal-only and must unpersist before returning.
"""

from __future__ import annotations

import pytest

from ripcurrent_spark.operators import cachereg
from ripcurrent_spark.queries import all_queries
from tests.conftest import SF_SMOKE

_REG = all_queries()


def _n_cached(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


@pytest.mark.parametrize("name", sorted(_REG))
def test_query_releases_all_cached_frames(spark, name):
    spark.catalog.clearCache()
    cachereg._TRACKED.clear()
    before = _n_cached(spark)
    _REG[name].spark(spark, SF_SMOKE).count()
    cachereg.release_tracked()
    after = _n_cached(spark)
    assert after == before, (
        f"{name} left {after - before} cached frame(s) that the "
        "cachereg release seam does not cover"
    )


def test_release_tracked_is_idempotent(spark):
    cachereg._TRACKED.clear()
    df = cachereg.track(spark.range(10).persist())
    df.count()
    assert cachereg.release_tracked() == 1
    assert cachereg.release_tracked() == 0
    # Released frames recompute from lineage — still usable.
    assert df.count() == 10
