"""IRI workbench XML library ingestion.

Parses the reference's on-disk formats:
- ``*.rules``    (rules:RuleLibrary)    — RulesLibrary.java:28-60:
  <rules name=...><properties fieldRulePropertyType="EXPRESSION|SET"
  value=.../>; SET values strip quotes and a trailing " SELECT=ANY".
- ``*.dataclass`` (dataclass:DataClassLibrary) — DataClassLibrary.java:
  29-77: <dataClasses name=... nameMatcher=...><defaultRule href=
  "lib.rules#RuleName"/><matchers [type="FILE"] details=.../>;
  classes without a resolvable default rule are skipped, FILE matchers
  whose set file is missing are skipped with a warning.
"""

from __future__ import annotations

import logging
import xml.etree.ElementTree as ET
from pathlib import Path

from ripcurrent_spark.classify.library import DataClass, DataClassLibrary
from ripcurrent_spark.classify.matchers import NameMatcher, PatternMatcher, SetMatcher
from ripcurrent_spark.rules.model import Rule

LOG = logging.getLogger(__name__)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def load_rules_xml(path: str | Path) -> dict[str, Rule]:
    """Parse a .rules library -> {rule name: Rule}."""
    rules: dict[str, Rule] = {}
    root = ET.parse(str(path)).getroot()
    for el in root.iter():
        if _local(el.tag) != "rules":
            continue
        name = el.get("name")
        if not name:
            continue
        for prop in el:
            if _local(prop.tag) != "properties":
                continue
            ptype = prop.get("fieldRulePropertyType")
            value = prop.get("value", "")
            if ptype == "EXPRESSION":
                rules[name] = Rule(type="Expression", rule=value)
            elif ptype == "SET":
                # RulesLibrary.java:48 strips quotes + " SELECT=ANY".
                rules[name] = Rule(
                    type="Set",
                    rule=value.replace("&quot;", "").replace('"', "").replace(" SELECT=ANY", ""),
                )
    return rules


def load_dataclass_xml(
    path: str | Path,
    rules: dict[str, Rule],
    set_search_dirs: list[str | Path] | None = None,
) -> DataClassLibrary:
    """Parse a .dataclass library against an already-loaded rules map.

    ``set_search_dirs``: where to look for set files whose recorded
    absolute path (often a Windows path in shipped libraries) does not
    exist — the basename is searched there before skipping the matcher.
    """
    lib = DataClassLibrary()
    root = ET.parse(str(path)).getroot()
    for el in root.iter():
        if _local(el.tag) != "dataClasses":
            continue
        name = el.get("name") or ""
        name_matcher = el.get("nameMatcher") or ""
        default_rule = None
        rule_name = None
        for child in el:
            if _local(child.tag) == "defaultRule":
                href = child.get("href", "")
                rule_name = href.split("#")[-1] if "#" in href else None
        if rule_name is None or rule_name not in rules:
            # DataClassLibrary.java:46-51 - skip classes w/o resolvable rule.
            continue
        default_rule = rules[rule_name]
        for child in el:
            if _local(child.tag) != "matchers":
                continue
            details = child.get("details", "")
            if child.get("type") == "FILE":
                entries = _read_set_file(details, set_search_dirs or [])
                if entries is None:
                    LOG.warning("Set file '%s' does not exist...", details)
                    continue
                matcher: PatternMatcher | SetMatcher = SetMatcher(tuple(entries))
            else:
                matcher = PatternMatcher(details)
            lib.add(
                DataClass(
                    name=name,
                    name_matcher=NameMatcher(name_matcher) if name_matcher else None,
                    data_matcher=matcher,
                    rule_name=rule_name,
                    description=el.get("description", ""),
                )
            )
    return lib


def _read_set_file(details: str, search_dirs: list[str | Path]) -> list[str] | None:
    p = Path(details)
    # Shipped libraries record Windows paths (C:\IRI\...\names.set); on
    # POSIX, Path.name doesn't split backslashes, so derive the basename
    # separator-agnostically for the search-dir fallback.
    basename = details.replace("\\", "/").rsplit("/", 1)[-1]
    candidates = [p] + [Path(d) / basename for d in search_dirs]
    for cand in candidates:
        try:
            if cand.is_file():
                return [ln.rstrip("\n") for ln in cand.read_text().splitlines()]
        except OSError:
            continue
    return None
