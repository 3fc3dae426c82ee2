"""Data-class library + single-pass column classifier.

Reference: DataClassLibrary.java builds {rule -> (nameMatcher,
dataMatcher)}; Main.java:351-365 walks every column of the first event
and assigns the FIRST class whose data matcher hits the value OR whose
name matcher hits the column name.

Deviations (Spark-first, documented):
- The reference iterates a java.util.HashMap, so "first" is
  nondeterministic there; we define library order = declaration order.
- Data matchers score a match fraction over ALL rows (one aggregate
  scan for every (class, column) pair simultaneously — scales as a
  single O(data) pass regardless of class count) with a threshold,
  instead of testing one row.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ripcurrent_spark.classify.matchers import NameMatcher, PatternMatcher, SetMatcher


@dataclass(frozen=True)
class DataClass:
    name: str
    name_matcher: NameMatcher | None = None
    data_matcher: PatternMatcher | SetMatcher | None = None
    rule_name: str | None = None  # default rule (resolved via RulesLibrary)
    description: str = ""


@dataclass
class DataClassLibrary:
    classes: list[DataClass] = field(default_factory=list)

    def add(self, dc: DataClass) -> "DataClassLibrary":
        self.classes.append(dc)
        return self


@dataclass(frozen=True)
class ColumnClassification:
    column: str
    data_class: str
    rule_name: str | None
    match_fraction: float  # fraction of rows the data matcher hit (0 if name-matched only)
    name_matched: bool


def classify_columns(
    df: DataFrame,
    library: DataClassLibrary,
    threshold: float = 0.8,
) -> list[ColumnClassification]:
    """Classify every column of ``df`` against ``library``.

    One aggregate job computes ALL (class, column) match fractions
    simultaneously; name matches are resolved driver-side (metadata).
    First matching class in library order wins per column
    (Main.java:360 ``break``).
    """
    cols = df.columns
    aggs = []
    keys: list[tuple[str, str]] = []  # (class, column) aligned with aggs
    for dc in library.classes:
        if dc.data_matcher is None:
            continue
        for c in cols:
            cond = dc.data_matcher.matches_col(F.col(c))
            aggs.append(F.avg(F.when(cond, 1.0).otherwise(0.0)).alias(f"{dc.name}__{c}"))
            keys.append((dc.name, c))
    fractions: dict[tuple[str, str], float] = {}
    if aggs:
        row = df.agg(*aggs).collect()[0]
        fractions = {k: (row[i] or 0.0) for i, k in enumerate(keys)}

    out: list[ColumnClassification] = []
    for c in cols:
        for dc in library.classes:
            frac = fractions.get((dc.name, c), 0.0)
            name_hit = dc.name_matcher.matches(c) if dc.name_matcher else False
            if name_hit or frac >= threshold:
                out.append(
                    ColumnClassification(
                        column=c,
                        data_class=dc.name,
                        rule_name=dc.rule_name,
                        match_fraction=frac,
                        name_matched=name_hit,
                    )
                )
                break
    return out
