"""Query registry: every operator exposed through ``__spark_entry__``.

Each entry pairs a Spark DataFrame builder with (when SQL-expressible)
an ANSI-SQL oracle string DuckDB can run on the same parquet tables.
Parity discipline (so the driver's value-hash matches):

- Money/measure math casts to DECIMAL before aggregation — exact
  arithmetic on both engines; emit DOUBLE only at the end (identical
  operands => identical IEEE doubles).
- Every computed column is aliased identically on both sides.
- LIMIT/top-k always rides a total (tie-broken) ORDER BY.
- Regexes restricted to the RE2 ∩ java.util.regex common subset
  (no lookaround, no backrefs).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None = None
    headline: bool = False  # include in bench.py's headline set
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    doc: str = "",
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, headline=headline, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Import side-effect modules once, lazily, to populate REGISTRY.
    from ripcurrent_spark.queries import (  # noqa: F401
        ann,
        cdc,
        dedup,
        masking,
        multimodal,
        pipeline,
        relational,
        relational_ext,
        text,
    )

    return REGISTRY
