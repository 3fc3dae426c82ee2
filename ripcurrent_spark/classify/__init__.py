"""Data classification engine (reference: DataClassLibrary.java,
NameMatcher.java, PatternMatcher.java, SetMatcher.java,
Main.java:351-365)."""

from ripcurrent_spark.classify.library import (
    ColumnClassification,
    DataClass,
    DataClassLibrary,
    classify_columns,
)
from ripcurrent_spark.classify.matchers import NameMatcher, PatternMatcher, SetMatcher

__all__ = [
    "ColumnClassification",
    "DataClass",
    "DataClassLibrary",
    "NameMatcher",
    "PatternMatcher",
    "SetMatcher",
    "classify_columns",
]
