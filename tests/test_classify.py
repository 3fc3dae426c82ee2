"""Classification engine tests: matcher semantics, first-match-wins,
IRI XML library ingestion (fixtures re-create the reference's file
formats — iriLibrary.dataclass / iriLibrary.rules shapes)."""

from __future__ import annotations

import textwrap

from ripcurrent_spark.classify import (
    DataClass,
    DataClassLibrary,
    NameMatcher,
    PatternMatcher,
    SetMatcher,
    classify_columns,
)
from ripcurrent_spark.classify.xml_io import load_dataclass_xml, load_rules_xml
from ripcurrent_spark.rules.apply import apply_rules, compile_rule
from ripcurrent_spark.rules.model import Rule, RulesLibrary


def test_name_matcher_full_match_semantics():
    m = NameMatcher("EMAIL")
    assert m.matches("EMAIL")
    assert not m.matches("USER_EMAIL")  # matches(), not find() — full match
    assert NameMatcher(".*EMAIL").matches("USER_EMAIL")
    assert not NameMatcher("").matches("ANY")


def test_pattern_matcher_is_full_match(spark):
    df = spark.createDataFrame([("a@b.com",), ("x a@b.com y",)], "v string")
    m = PatternMatcher(r"[\w._%+-]+@[\w.-]+\.[A-Za-z]{2,4}")
    got = [r[0] for r in df.select(m.matches_col(df.v)).collect()]
    assert got == [True, False]  # embedded match must NOT count


def test_classify_first_match_wins(spark):
    df = spark.createDataFrame([("AUTOMOBILE",)], "seg string")
    lib = (
        DataClassLibrary()
        .add(DataClass("FIRST", data_matcher=SetMatcher(("AUTOMOBILE",)), rule_name="r1"))
        .add(DataClass("SECOND", data_matcher=SetMatcher(("AUTOMOBILE",)), rule_name="r2"))
    )
    out = classify_columns(df, lib)
    assert len(out) == 1 and out[0].data_class == "FIRST"


def test_classify_name_or_data(spark):
    df = spark.createDataFrame([(1, "nobody")], "user_email int, other string")
    lib = DataClassLibrary().add(
        DataClass(
            "EMAIL",
            name_matcher=NameMatcher(r"(?i).*email.*"),
            data_matcher=PatternMatcher(r"x+"),
            rule_name="enc",
        )
    )
    out = classify_columns(df, lib)
    assert [(c.column, c.name_matched) for c in out] == [("user_email", True)]


def test_threshold_fraction(spark):
    rows = [("AUTOMOBILE",)] * 7 + [("junk",)] * 3
    df = spark.createDataFrame(rows, "seg string")
    lib = DataClassLibrary().add(
        DataClass("SEG", data_matcher=SetMatcher(("AUTOMOBILE",)), rule_name="r")
    )
    assert classify_columns(df, lib, threshold=0.8) == []
    hit = classify_columns(df, lib, threshold=0.6)
    assert len(hit) == 1 and abs(hit[0].match_fraction - 0.7) < 1e-9


RULES_XML = textwrap.dedent("""\
    <?xml version="1.0" encoding="ASCII"?>
    <rules:RuleLibrary xmi:version="2.0" xmlns:xmi="http://www.omg.org/XMI" xmlns:rules="http://rules/1.0">
      <rules xsi:type="rules:FieldRule" name="FieldEncodingRule" editor="encodeFunctionWizard" xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance">
        <properties fieldRulePropertyType="EXPRESSION" value="encode_hex(${FIELDNAME})"/>
        <properties fieldRulePropertyType="NAME" value="ENC_HEX_${FIELDNAME}"/>
      </rules>
      <rules xsi:type="rules:FieldRule" name="FieldSetRule" editor="setFileWizard" xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance">
        <properties fieldRulePropertyType="SET" value="&quot;{setfile}&quot; SELECT=ANY"/>
        <properties fieldRulePropertyType="NAME" value="SET_${FIELDNAME}"/>
      </rules>
    </rules:RuleLibrary>
""")

DATACLASS_XML = textwrap.dedent("""\
    <?xml version="1.0" encoding="ASCII"?>
    <dataclass:DataClassLibrary xmi:version="2.0" xmlns:xmi="http://www.omg.org/XMI" xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" xmlns:dataclass="http://dataclass/1.0">
      <dataClasses xsi:type="dataclass:DataClass" name="EMAIL" description="Class for email" nameMatcher="EMAIL">
        <defaultRule href="lib.rules#FieldEncodingRule"/>
        <matchers details="\\b[\\w._%+-]+@[\\w.-]+\\.[A-Za-z]{2,4}\\b"/>
      </dataClasses>
      <dataClasses xsi:type="dataclass:DataClass" name="SEGMENT" description="" nameMatcher="">
        <defaultRule href="lib.rules#FieldSetRule"/>
        <matchers type="FILE" details="{setfile}"/>
      </dataClasses>
      <dataClasses xsi:type="dataclass:DataClass" name="NO_RULE" description="" nameMatcher="X">
        <matchers details=".*"/>
      </dataClasses>
    </dataclass:DataClassLibrary>
""")


def test_xml_library_ingestion(tmp_path):
    setfile = tmp_path / "segments.set"
    setfile.write_text("AUTOMOBILE\nBUILDING\n")
    rules_path = tmp_path / "lib.rules"
    rules_path.write_text(RULES_XML.replace("{setfile}", str(setfile)))
    dc_path = tmp_path / "lib.dataclass"
    dc_path.write_text(DATACLASS_XML.replace("{setfile}", str(setfile)))

    rules = load_rules_xml(rules_path)
    assert rules["FieldEncodingRule"] == Rule("Expression", "encode_hex(${FIELDNAME})")
    # SET value: quotes stripped + " SELECT=ANY" suffix removed
    assert rules["FieldSetRule"] == Rule("Set", str(setfile))

    lib = load_dataclass_xml(dc_path, rules)
    names = [c.name for c in lib.classes]
    assert names == ["EMAIL", "SEGMENT"]  # NO_RULE skipped (no defaultRule)
    assert isinstance(lib.classes[0].data_matcher, PatternMatcher)
    assert isinstance(lib.classes[1].data_matcher, SetMatcher)
    assert lib.classes[1].data_matcher.entries == ("AUTOMOBILE", "BUILDING")


def test_xml_set_file_missing_skips(tmp_path):
    setfile = tmp_path / "segments.set"
    setfile.write_text("A\n")
    rules_path = tmp_path / "lib.rules"
    rules_path.write_text(RULES_XML.replace("{setfile}", str(setfile)))
    dc_path = tmp_path / "lib.dataclass"
    dc_path.write_text(DATACLASS_XML.replace("{setfile}", str(tmp_path / "missing.set")))
    lib = load_dataclass_xml(dc_path, load_rules_xml(rules_path))
    assert [c.name for c in lib.classes] == ["EMAIL"]


def test_compile_set_rule_from_file(spark, tmp_path):
    setfile = tmp_path / "pseudo.set"
    setfile.write_text("AAA\nBBB\nCCC\n")
    df = spark.createDataFrame([("alice",), ("bob",), ("alice",)], "name string")
    col = compile_rule(Rule("Set", str(setfile)), "name", RulesLibrary())
    vals = [r[0] for r in df.select(col).collect()]
    assert all(v in {"AAA", "BBB", "CCC"} for v in vals)
    assert vals[0] == vals[2]  # deterministic per input value


def test_apply_rules_emits_altered_columns(spark):
    from ripcurrent_spark.classify.library import ColumnClassification

    df = spark.createDataFrame([("bob", 5)], "name string, n int")
    rules = RulesLibrary().add("up", Rule("Expression", "toupper(${FIELDNAME})"))
    cc = [ColumnClassification("name", "PERSON_NAME", "up", 1.0, True)]
    out = apply_rules(df, cc, rules)
    assert out.columns == ["ALTERED_name", "n"]
    assert out.collect()[0].ALTERED_name == "BOB"


# --- the ACTUAL reference library files (read-only, content-as-data) ---

REF_RULES = "/root/reference/iriLibrary.rules"
REF_DATACLASS = "/root/reference/iriLibrary.dataclass"


def test_reference_rules_file_parses():
    """Pin the on-disk format against the real shipped library
    (RulesLibrary.java:28-60 reads exactly this file)."""
    rules = load_rules_xml(REF_RULES)
    assert set(rules) == {
        "FieldEncodingRule",
        "FieldEncodingRule2",
        "FieldStringRule",
        "FieldSetRule",
        "FieldPseudonymRule",
        "FieldPseudonymRule2",
    }
    assert rules["FieldEncodingRule"] == Rule("Expression", "decode_hex(${FIELDNAME})")
    assert rules["FieldEncodingRule2"] == Rule("Expression", "encode_hex(${FIELDNAME})")
    assert rules["FieldStringRule"] == Rule("Expression", "toupper(${FIELDNAME})")
    # SET values: quotes stripped, " SELECT=ANY" suffix removed
    assert rules["FieldSetRule"] == Rule("Set", "C:/IRI/cosort105/sets/tadig-codes.set")
    assert rules["FieldPseudonymRule"].type == "Set"


def test_reference_dataclass_file_parses(tmp_path):
    """The real .dataclass library: classes without a resolvable
    default rule are skipped (DataClassLibrary.java:46-51 — PIN_US
    references a FieldBlurRule the rules file doesn't define;
    POSTAL_CODE_US/TADIG-CODE/Timestamp carry no defaultRule at all),
    and FILE matchers resolve by basename via set_search_dirs when the
    recorded Windows path doesn't exist."""
    rules = load_rules_xml(REF_RULES)

    # Without set dirs: only EMAIL survives (regex matcher + resolvable rule).
    lib = load_dataclass_xml(REF_DATACLASS, rules)
    assert [c.name for c in lib.classes] == ["EMAIL"]
    email = lib.classes[0]
    assert email.rule_name == "FieldEncodingRule"
    assert isinstance(email.data_matcher, PatternMatcher)
    assert email.data_matcher.pattern == r"\b[\w._%+-]+@[\w.-]+\.[A-Za-z]{2,4}\b"

    # With set dirs holding the basenames the library records:
    (tmp_path / "names_first.set").write_text("ALICE\nBOB\n")
    (tmp_path / "names_last.set").write_text("SMITH\nJONES\n")
    lib2 = load_dataclass_xml(REF_DATACLASS, rules, set_search_dirs=[tmp_path])
    names = [c.name for c in lib2.classes]
    assert names == ["FIRST_NAME", "LAST_NAME", "EMAIL"]
    first = lib2.classes[0]
    assert first.rule_name == "FieldPseudonymRule"
    assert isinstance(first.data_matcher, SetMatcher)
    assert first.data_matcher.entries == ("ALICE", "BOB")
    # first-match-wins ordering preserved from file order (Main.java:351-365)
