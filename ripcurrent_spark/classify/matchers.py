"""Matchers: decide whether a column belongs to a data class.

Reference semantics (full-match, not substring — java.util.regex
``Matcher.matches()`` in NameMatcher.java:24-27 / PatternMatcher.java:
22-25; exact equality against a dictionary in SetMatcher.java:27-39).

Spark-first deviation: the reference classifies from a SINGLE row (the
first change event per table, Main.java:351-365). On a table we have
the whole distribution, so data matchers score the MATCH FRACTION over
all rows in one aggregate pass and a threshold decides — strictly more
robust, same first-match-wins resolution.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


def _anchored(pattern: str) -> str:
    """Full-match semantics for engines whose rlike is a search."""
    return f"^(?:{pattern})$"


@dataclass(frozen=True)
class NameMatcher:
    """Regex full-match on the COLUMN NAME (driver-side: names are
    metadata, never data — no scan needed)."""

    pattern: str

    def matches(self, column_name: str) -> bool:
        if not self.pattern:
            return False
        return re.fullmatch(self.pattern, column_name) is not None


@dataclass(frozen=True)
class PatternMatcher:
    """Regex full-match on VALUES; emits a Spark boolean Column so all
    patterns for all columns evaluate in one scan."""

    pattern: str

    def matches_col(self, c: Column) -> Column:
        return c.cast("string").rlike(_anchored(self.pattern))

    def sql(self, expr: str) -> str:
        return f"regexp_full_match(CAST({expr} AS VARCHAR), '{self.pattern}')"


@dataclass(frozen=True)
class SetMatcher:
    """Dictionary membership (the reference's set-file lookup). The set
    is a literal in the plan (broadcast to executors); at 100 TB a huge
    dictionary would become a broadcast join instead."""

    entries: tuple[str, ...]

    def matches_col(self, c: Column) -> Column:
        return c.cast("string").isin(*self.entries)

    def sql(self, expr: str) -> str:
        lits = ", ".join("'" + e.replace("'", "''") + "'" for e in self.entries)
        return f"CAST({expr} AS VARCHAR) IN ({lits})"
