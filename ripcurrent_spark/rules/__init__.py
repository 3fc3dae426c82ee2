"""Masking rules engine (reference: RulesLibrary.java, Rule.java; rule
application into ALTERED_<col> fields: Main.java:447-521)."""

from ripcurrent_spark.rules.model import Rule, RulesLibrary
from ripcurrent_spark.rules.apply import apply_rules, compile_rule

__all__ = ["Rule", "RulesLibrary", "apply_rules", "compile_rule"]
