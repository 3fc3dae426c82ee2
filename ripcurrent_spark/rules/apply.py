"""Compile rule expressions to Spark Columns and apply them.

The reference rewrites each classified field into a derived
``ALTERED_<col>`` output (Main.java:464-467: ``/FIELD=(ALTERED_X=
expr(X), ODEF="X")``), leaving unclassified fields untouched. Here a
rule compiles to a Column expression once per plan — JVM codegen, no
per-row scripting.

Expression grammar: the reference's ``func(${FIELDNAME})`` templates
(iriLibrary.rules:230-251) plus engine extensions taking the same
shape: ``hash_sha256(${FIELDNAME})``, ``blur(${FIELDNAME}, 50)``,
``blur_date(${FIELDNAME}, 7)``, ``redact_keep_last(${FIELDNAME}, 4)``,
``redact_digits(${FIELDNAME})``, ``fpe_digits(${FIELDNAME})``,
``pseudonym(${FIELDNAME}, <set-name>)``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ripcurrent_spark.classify.library import ColumnClassification
from ripcurrent_spark.functions import masking as M
from ripcurrent_spark.rules.model import Rule, RulesLibrary

_FUNCS = {
    "encode_hex": lambda c, *a: M.encode_hex(c),
    "decode_hex": lambda c, *a: M.decode_hex(c),
    "toupper": lambda c, *a: M.toupper(c),
    "tolower": lambda c, *a: M.tolower(c),
    "hash_md5": lambda c, *a: M.hash_md5(c),
    "hash_sha256": lambda c, *a: M.hash_sha256(c),
    "blur": lambda c, *a: M.blur_number(c, amp=int(a[0]) if a else 50),
    "blur_date": lambda c, *a: M.blur_date(c, amp_days=int(a[0]) if a else 7),
    "redact_keep_last": lambda c, *a: M.redact_keep_last(c, keep=int(a[0]) if a else 4),
    "redact_digits": lambda c, *a: M.redact_digits(c),
    "fpe_digits": lambda c, *a: M.fpe_digits(c, key=a[0] if a else "k1"),
}

_EXPR_RE = re.compile(r"^\s*(\w+)\s*\(\s*\$\{FIELDNAME\}\s*(?:,\s*([^)]*))?\)\s*$")


def compile_rule(rule: Rule, column: str, library: RulesLibrary | None = None) -> Column:
    """Rule + source column -> masked Column expression."""
    if rule.type.lower() == "set":
        # Set rule: deterministic pseudonym drawn from the named set
        # (reference: SET=<file> field attribute, Main.java:463-464).
        values = _resolve_set(rule.rule, library)
        return M.pseudonym(F.col(column), values)
    m = _EXPR_RE.match(rule.rule)
    if not m:
        raise ValueError(f"Unsupported rule expression: {rule.rule!r}")
    fn, argstr = m.group(1), m.group(2)
    args = [a.strip() for a in argstr.split(",")] if argstr else []
    if fn == "pseudonym":
        return M.pseudonym(F.col(column), _resolve_set(args[0] if args else "", library))
    if fn not in _FUNCS:
        raise ValueError(f"Unknown rule function {fn!r} in {rule.rule!r}")
    return _FUNCS[fn](F.col(column), *args)


def _resolve_set(name: str, library: RulesLibrary | None) -> list[str]:
    if library and name in library.sets:
        return library.sets[name]
    # Fall back: treat as a file path (the reference's set files).
    try:
        with open(name) as f:
            return [ln.rstrip("\n") for ln in f]
    except OSError as e:
        raise ValueError(f"Set {name!r} not found in library or on disk") from e


def apply_rules(
    df: DataFrame,
    classifications: list[ColumnClassification],
    library: RulesLibrary,
    prefix: str = "ALTERED_",
) -> DataFrame:
    """Produce the masked replica: classified columns become
    ``ALTERED_<col>`` (masked), unclassified columns pass through.
    Column order is preserved (reference keeps source positions)."""
    by_col = {cc.column: cc for cc in classifications if cc.rule_name}
    out = []
    for c in df.columns:
        cc = by_col.get(c)
        rule = library.get(cc.rule_name) if cc else None
        if cc and rule:
            out.append(compile_rule(rule, c, library).alias(f"{prefix}{c}"))
        else:
            out.append(F.col(c))
    return df.select(*out)
