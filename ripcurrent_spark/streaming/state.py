"""Explicit-schema reads for per-batch partials state dirs.

The streaming maintainers (DSIR model, word-frequency table, and any
future mergeable-partials twin) land one partition per trigger via
dynamic partition overwrite. Two EMPTY states are routine and must
not break the snapshot read (ADVICE r10 #4):

- the state dir does not exist yet (no trigger has fired, or every
  trigger so far was skipped as empty);
- a trigger wrote an empty frame — dynamic overwrite of an empty
  DataFrame emits only ``_SUCCESS``, no data files, and a
  schema-INFERRING ``spark.read.parquet`` then raises "unable to
  infer schema" until a non-empty trigger lands.

Both resolve the same way: the partials schema is FIXED per
maintainer, so read with it explicitly and return an empty frame of
that schema when the dir holds no data files.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame


def read_state(spark, state_dir: str | Path, schema: str) -> DataFrame:
    """Read a partials dir with its fixed ``schema`` (DDL string,
    partition columns included — their dir-name values are cast to
    the declared types); an absent or data-file-free dir yields an
    empty frame of the same schema instead of an inference error."""
    p = Path(str(state_dir))
    if not p.is_dir() or not any(p.rglob("*.parquet")):
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(str(p))
