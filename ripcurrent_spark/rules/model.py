"""Rule model (reference: Rule.java — a (type, expression) pair;
types observed in iriLibrary.rules: "Expression" for
``func(${FIELDNAME})`` templates, "Set" for set-file paths)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Rule:
    type: str  # "Expression" | "Set"
    rule: str  # expression template or set-file path / set name


@dataclass
class RulesLibrary:
    rules: dict[str, Rule] = field(default_factory=dict)
    # Named value sets for Set/pseudonym rules (the engine-resident
    # form of the reference's set FILES; at scale these broadcast).
    sets: dict[str, list[str]] = field(default_factory=dict)

    def add(self, name: str, rule: Rule) -> "RulesLibrary":
        self.rules[name] = rule
        return self

    def get(self, name: str) -> Rule | None:
        return self.rules.get(name)
