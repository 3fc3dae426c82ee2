"""Skew-resilient (salted) equi-join.

A hot join key sends all its rows to one reducer; AQE's skew-join
split handles this at runtime for sort-merge joins, but salting is the
explicit, planner-independent lever (and the only one for aggregations
over pair-RDD-style patterns): the fact side gets a deterministic salt
in [0, n), the (small) dim side is replicated n times, and the join
key becomes (key, salt) — a hot key now spreads over n reducers at the
cost of n-times the dim rows (cheap when dim is small; for dim tables
big enough to hurt, prefer AQE or bucketing).

Salt is derived from a row-unique column via the portable hash, NOT
from randomness or partition id — retries, re-partitioning, and the
DuckDB oracle all see identical assignments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ripcurrent_spark.functions.hashing import h32


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    fact_row_key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on fact_key = dim_key with the fact
    side spread over ``n_salt`` sub-keys. ``fact_row_key`` must be a
    row-unique (or near-unique) fact column that seeds the salt.
    Result equals the plain equi-join (oracle-checkable).

    Only ``inner`` and ``left`` joins are supported: with ``right`` or
    ``full``, each UNMATCHED dim row is replicated ``n_salt`` times
    (one per salt value) and would surface ``n_salt`` duplicates."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            f"right/full would emit each unmatched dim row n_salt times"
        )
    salt = h32(F.col(fact_row_key).cast("string"), seed="salt") % n_salt
    f = fact.withColumn("__salt", salt.cast("int"))
    d = dim.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
    joined = f.join(
        d, (F.col(fact_key) == F.col(dim_key)) & (f["__salt"] == d["__salt"]), how
    )
    return joined.drop("__salt")
