"""CDC engine: Debezium-style change-event envelopes, logical-type
decoding, and apply semantics (reference: Main.java's embedded-engine
event loop re-expressed as declarative plans)."""

from ripcurrent_spark.cdc.envelope import (
    ENVELOPE_SCHEMA,
    KEY_SCHEMA,
    build_envelope_json,
    parse_envelope,
)
from ripcurrent_spark.cdc.apply import (
    changelog_counts,
    latest_snapshot,
    scd2_history,
)

__all__ = [
    "ENVELOPE_SCHEMA",
    "KEY_SCHEMA",
    "build_envelope_json",
    "parse_envelope",
    "latest_snapshot",
    "scd2_history",
    "changelog_counts",
]
