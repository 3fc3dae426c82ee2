"""Masking / FieldShield-style transform functions.

Re-expresses the reference's rule expressions (iriLibrary.rules:
``decode_hex(${FIELDNAME})``, ``encode_hex(${FIELDNAME})``,
``toupper(${FIELDNAME})``, SET/pseudonym rules — RulesLibrary.java:44-49,
applied as derived ``ALTERED_<col>`` fields in Main.java:447-521) as
pure Spark Column expressions: JVM whole-stage codegen, zero Python in
the row path, linear single-scan at any scale.

Each function has a ``*_sql`` twin emitting the equivalent DuckDB SQL
so oracle strings are generated from the same definition (value-level
parity, dialect-level divergence).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ripcurrent_spark.functions.hashing import h32, h32_sql


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --- encode/decode (FieldEncodingRule / FieldEncodingRule2) -----------

def encode_hex(col: Column | str) -> Column:
    return F.lower(F.hex(F.encode(_c(col), "UTF-8")))


def encode_hex_sql(expr: str) -> str:
    return f"lower(hex({expr}))"


def decode_hex(col: Column | str) -> Column:
    return F.decode(F.unhex(_c(col)), "UTF-8")


def decode_hex_sql(expr: str) -> str:
    # DuckDB: unhex -> BLOB, decode(blob) -> VARCHAR.
    return f"decode(unhex({expr}))"


# --- string rules (FieldStringRule) -----------------------------------

def toupper(col: Column | str) -> Column:
    return F.upper(_c(col))


def toupper_sql(expr: str) -> str:
    return f"upper({expr})"


def tolower(col: Column | str) -> Column:
    return F.lower(_c(col))


def tolower_sql(expr: str) -> str:
    return f"lower({expr})"


# --- hash masking ------------------------------------------------------

def hash_md5(col: Column | str) -> Column:
    return F.md5(_c(col))


def hash_md5_sql(expr: str) -> str:
    return f"md5({expr})"


def hash_sha256(col: Column | str) -> Column:
    return F.sha2(_c(col), 256)


def hash_sha256_sql(expr: str) -> str:
    return f"sha256({expr})"


# --- pseudonymization (FieldPseudonymRule: replacement drawn from a
# --- set file; deterministic variant = hash-indexed pick) --------------

def pseudonym(col: Column | str, values: list[str], seed: str = "pseudo") -> Column:
    idx = (h32(_c(col), seed) % F.lit(len(values))).cast("int")
    return F.element_at(F.array(*[F.lit(v) for v in values]), idx + 1)


def pseudonym_sql(expr: str, values: list[str], seed: str = "pseudo") -> str:
    arr = "[" + ", ".join(f"'{v}'" for v in values) + "]"
    return f"({arr})[CAST({h32_sql(expr, seed)} % {len(values)} AS INT) + 1]"


# --- partial redaction --------------------------------------------------

def redact_keep_last(col: Column | str, keep: int = 4, fill: str = "*") -> Column:
    c = _c(col)
    return F.concat(
        F.repeat(F.lit(fill), F.greatest(F.length(c) - keep, F.lit(0))),
        F.substring(c, -keep, keep),
    )


def redact_keep_last_sql(expr: str, keep: int = 4, fill: str = "*") -> str:
    return (
        f"concat(repeat('{fill}', greatest(length({expr}) - {keep}, 0)), "
        f"right({expr}, {keep}))"
    )


def redact_digits(col: Column | str, repl: str = "#") -> Column:
    return F.regexp_replace(_c(col), "[0-9]", repl)


def redact_digits_sql(expr: str, repl: str = "#") -> str:
    return f"regexp_replace({expr}, '[0-9]', '{repl}', 'g')"


# --- numeric / date blur (FieldBlurRule) -------------------------------
# Deterministic "noise": integer in [-amp, amp] derived from the value's
# own string form, so the same input always blurs identically (and the
# DuckDB oracle reproduces it bit-for-bit).

def _noise(str_col: Column, amp: int, seed: str) -> Column:
    return (h32(str_col, seed) % F.lit(2 * amp + 1)) - F.lit(amp)


def _noise_sql(expr: str, amp: int, seed: str) -> str:
    return f"({h32_sql(expr, seed)} % {2 * amp + 1} - {amp})"


def blur_number(col: Column | str, amp: int = 50, seed: str = "blur") -> Column:
    """value + hash-noise; input cast to DECIMAL(12,2) for exactness."""
    d = _c(col).cast("decimal(12,2)")
    return (d + _noise(d.cast("string"), amp, seed)).cast("decimal(14,2)")


def blur_number_sql(expr: str, amp: int = 50, seed: str = "blur") -> str:
    d = f"CAST({expr} AS DECIMAL(12,2))"
    s = f"CAST({d} AS VARCHAR)"
    return f"CAST({d} + {_noise_sql(s, amp, seed)} AS DECIMAL(14,2))"


def blur_date(col: Column | str, amp_days: int = 7, seed: str = "dblur") -> Column:
    c = _c(col)
    days = _noise(c.cast("string"), amp_days, seed)
    return c + F.make_interval(days=days.cast("int"))


def blur_date_sql(expr: str, amp_days: int = 7, seed: str = "dblur") -> str:
    s = f"CAST({expr} AS VARCHAR)"
    return f"{expr} + INTERVAL (CAST({_noise_sql(s, amp_days, seed)} AS INT)) DAY"


# --- format-preserving encryption (stub) -------------------------------
# No crypto library in the image: this is a deterministic, reversible-
# in-principle digit permutation (pos-seeded additive shift mod 10),
# format-preserving on digits, identity elsewhere. Marked a stub in
# SURVEY §2; swap for FF1/FF3 when a crypto dependency is allowed.

def fpe_digits(col: Column | str, key: str = "k1") -> Column:
    c = _c(col)
    chars = F.split(c, "")
    shifted = F.transform(
        chars,
        lambda ch, i: F.when(
            ch.rlike("^[0-9]$"),
            ((ch.cast("int") + h32(F.concat(F.lit(key), i.cast("string"))) % 10) % 10).cast("string"),
        ).otherwise(ch),
    )
    return F.array_join(shifted, "")


def fpe_alnum(col: Column | str, key: str = "k1") -> Column:
    """Alphanumeric format-preserving shift: digits rotate mod 10,
    letters rotate mod 26 WITHIN their case class, everything else is
    untouched — length, layout, charset class all preserved. Shift is
    position-keyed by the portable hash (deterministic, engine-stable);
    swap for FF1/FF3 in production with the same per-position contract."""
    c = _c(col)
    chars = F.split(c, "")

    def _shift(ch: Column, i: Column) -> Column:
        s = h32(F.concat(F.lit(key), i.cast("string")))
        a = F.ascii(ch)
        return (
            F.when(ch.rlike("^[0-9]$"), ((ch.cast("int") + s % 10) % 10).cast("string"))
            .when(ch.rlike("^[a-z]$"), F.chr(F.lit(97) + (a - 97 + s % 26) % 26))
            .when(ch.rlike("^[A-Z]$"), F.chr(F.lit(65) + (a - 65 + s % 26) % 26))
            .otherwise(ch)
        )

    return F.array_join(F.transform(chars, _shift), "")


def fpe_digits_decode(col: Column | str, key: str = "k1") -> Column:
    """Inverse of :func:`fpe_digits` — subtract the same position-keyed
    shift mod 10. Masking stays reversible for authorized re-identify
    flows (the decode_hex counterpart for the FPE rule)."""
    c = _c(col)
    chars = F.split(c, "")
    shifted = F.transform(
        chars,
        lambda ch, i: F.when(
            ch.rlike("^[0-9]$"),
            (
                (ch.cast("int") - h32(F.concat(F.lit(key), i.cast("string"))) % 10 + 10) % 10
            ).cast("string"),
        ).otherwise(ch),
    )
    return F.array_join(shifted, "")
