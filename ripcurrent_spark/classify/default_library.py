"""Default classification + rules library for the driver's TPC-H-ish
tables — the engine-resident analog of the reference's shipped
``iriLibrary.dataclass`` / ``iriLibrary.rules`` pair (classes bound to
name/pattern/set matchers, each with a default masking rule).

Everything here is deterministic so the DuckDB oracle reproduces the
masked output bit-for-bit.
"""

from __future__ import annotations

from ripcurrent_spark.classify.library import DataClass, DataClassLibrary
from ripcurrent_spark.classify.matchers import NameMatcher, PatternMatcher, SetMatcher
from ripcurrent_spark.rules.model import Rule, RulesLibrary

# Pseudonym pools (the reference draws from set FILES; these are the
# engine-resident equivalents — broadcastable literals).
PSEUDO_NAMES: list[str] = [
    "ALEX MORGAN", "SAM RIVERA", "JORDAN LEE", "CASEY KIM", "TAYLOR BROOKS",
    "ROBIN HAYES", "DREW PARKER", "JAMIE FOX", "QUINN BLAKE", "AVERY STONE",
    "RILEY JAMES", "CAMERON DAY", "MORGAN WELLS", "SKYLER REED", "EMERSON COLE",
    "FINLEY HART", "ROWAN ELLIS", "SAGE MONROE", "PHOENIX LANE", "DAKOTA PIERCE",
]

MKT_SEGMENTS: list[str] = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]

EMAIL_PATTERN = r"[\w._%+-]+@[\w.-]+\.[A-Za-z]{2,4}"  # iriLibrary.dataclass EMAIL matcher shape


def default_rules() -> RulesLibrary:
    lib = RulesLibrary()
    lib.sets["names"] = PSEUDO_NAMES
    lib.sets["segments"] = MKT_SEGMENTS
    lib.add("FieldEncodingRule", Rule("Expression", "encode_hex(${FIELDNAME})"))
    lib.add("FieldDecodingRule", Rule("Expression", "decode_hex(${FIELDNAME})"))
    lib.add("FieldStringRule", Rule("Expression", "toupper(${FIELDNAME})"))
    lib.add("FieldHashRule", Rule("Expression", "hash_sha256(${FIELDNAME})"))
    lib.add("FieldPseudonymRule", Rule("Expression", "pseudonym(${FIELDNAME}, names)"))
    lib.add("FieldSetRule", Rule("Expression", "pseudonym(${FIELDNAME}, segments)"))
    lib.add("FieldBlurRule", Rule("Expression", "blur(${FIELDNAME}, 50)"))
    lib.add("FieldDateBlurRule", Rule("Expression", "blur_date(${FIELDNAME}, 7)"))
    lib.add("FieldRedactRule", Rule("Expression", "redact_keep_last(${FIELDNAME}, 4)"))
    lib.add("FieldFpeRule", Rule("Expression", "fpe_digits(${FIELDNAME})"))
    return lib


def default_classes() -> DataClassLibrary:
    return (
        DataClassLibrary()
        .add(
            DataClass(
                name="PERSON_NAME",
                name_matcher=NameMatcher(r"(?i).*_name"),
                data_matcher=PatternMatcher(r"(Customer|Supplier)#[0-9]{9}"),
                rule_name="FieldPseudonymRule",
                description="Entity names (reference FIRST_NAME/LAST_NAME analog)",
            )
        )
        .add(
            DataClass(
                name="EMAIL",
                name_matcher=NameMatcher(r"(?i).*email.*"),
                data_matcher=PatternMatcher(EMAIL_PATTERN),
                rule_name="FieldEncodingRule",
                description="iriLibrary.dataclass EMAIL analog",
            )
        )
        .add(
            DataClass(
                name="MKT_SEGMENT",
                name_matcher=None,
                data_matcher=SetMatcher(tuple(MKT_SEGMENTS)),
                rule_name="FieldSetRule",
                description="Set-file dictionary class (TADIG-CODE analog)",
            )
        )
        .add(
            DataClass(
                name="ACCOUNT_BALANCE",
                name_matcher=NameMatcher(r"(?i).*acctbal"),
                data_matcher=None,
                rule_name="FieldBlurRule",
                description="Numeric PII blurred (PIN_US FieldBlurRule analog)",
            )
        )
    )
