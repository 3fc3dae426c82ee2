"""Local mirror of the driver's DuckDB-oracle comparison: row count,
sorted-column schema, order-insensitive exact value equality."""

from __future__ import annotations

import math
from datetime import datetime, timezone
from decimal import Decimal

import numpy as np


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return v
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return None if math.isnan(f) else f
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, np.datetime64):
        return v.astype("datetime64[us]").astype(datetime)
    if isinstance(v, np.ndarray):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def canon(pdf):
    """Sorted-column, sorted-row list of normalized tuples."""
    cols = sorted(pdf.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return cols, rows


def assert_parity(spark_df, ddb_rel, name: str):
    spdf = spark_df.toPandas()
    opdf = ddb_rel.df()
    scols, srows = canon(spdf)
    ocols, orows = canon(opdf)
    assert scols == ocols, f"{name}: schema mismatch spark={scols} oracle={ocols}"
    assert len(srows) == len(orows), f"{name}: rowcount spark={len(srows)} oracle={len(orows)}"
    for i, (a, b) in enumerate(zip(srows, orows)):
        assert a == b, f"{name}: row {i} differs\n spark={a}\noracle={b}"
