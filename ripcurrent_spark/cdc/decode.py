"""Debezium logical-type decoding.

The reference converts wire integers to ISO strings via
DateTimeConversionUtil.java: epoch-days -> date (``integerToDate``),
microseconds-of-day -> time (``numberToTime``), epoch-millis ->
datetime (``numberToDateTime``); binary arrives base64
(Main.java:144) and decimals arrive as strings (Main.java:143).

Deviation (documented): Java's ``LocalTime/LocalDateTime.toString()``
elides ``:00`` seconds; we always emit full ``HH:mm:ss`` — a stable
superset format (the reference's output for any value with nonzero
seconds is identical).

All decoders are Column expressions (codegen, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def epoch_days_to_date(col: Column | str) -> Column:
    """io.debezium.time.Date: int32 days since 1970-01-01 -> DATE."""
    return F.date_add(F.lit("1970-01-01").cast("date"), _c(col).cast("int"))


def epoch_days_to_date_sql(expr: str) -> str:
    return f"DATE '1970-01-01' + CAST({expr} AS INT)"


def micros_of_day_to_time(col: Column | str) -> Column:
    """io.debezium.time.MicroTime: int64 microseconds-of-day -> 'HH:mm:ss'."""
    secs = (_c(col).cast("long") / F.lit(1_000_000)).cast("long")
    return F.format_string(
        "%02d:%02d:%02d",
        (secs / 3600).cast("int"),
        ((secs % 3600) / 60).cast("int"),
        (secs % 60).cast("int"),
    )


def micros_of_day_to_time_sql(expr: str) -> str:
    secs = f"CAST({expr} AS BIGINT) // 1000000"
    return (
        f"printf('%02d:%02d:%02d', {secs} // 3600, "
        f"({secs} % 3600) // 60, {secs} % 60)"
    )


def epoch_ms_to_datetime(col: Column | str) -> Column:
    """io.debezium.time.Timestamp: int64 epoch millis -> ISO-8601
    'yyyy-MM-ddTHH:mm:ss' (UTC, second precision — the reference
    truncates to seconds too: DateTimeConversionUtil.java:33-36)."""
    secs = (_c(col).cast("long") / F.lit(1000)).cast("long")
    return F.date_format(F.timestamp_seconds(secs), "yyyy-MM-dd'T'HH:mm:ss")


def epoch_ms_to_datetime_sql(expr: str) -> str:
    return f"strftime(make_timestamp((CAST({expr} AS BIGINT) // 1000) * 1000000), '%Y-%m-%dT%H:%M:%S')"


def base64_to_binary(col: Column | str) -> Column:
    """binary.handling.mode=base64 (Main.java:144)."""
    return F.unbase64(_c(col))


def base64_of_string(col: Column | str) -> Column:
    return F.base64(F.encode(_c(col), "UTF-8"))


def base64_of_string_sql(expr: str) -> str:
    return f"to_base64(CAST({expr} AS BLOB))"


def decimal_string_to_decimal(col: Column | str, typ: str = "decimal(12,2)") -> Column:
    """decimal.handling.mode=string (Main.java:143)."""
    return _c(col).cast(typ)
