"""Classification + masking queries (the reference's core behavior:
classify columns, apply default rules, emit ALTERED_<col> fields —
Main.java:351-365, 447-521).

Oracle strings are built from the same ``*_sql`` emitters the Column
builders mirror, so Spark/DuckDB can only diverge at the value level
if the underlying engines' md5/string/decimal semantics diverge
(they don't — that's the point of the portable hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ripcurrent_spark.classify.default_library import (
    MKT_SEGMENTS,
    PSEUDO_NAMES,
    default_classes,
    default_rules,
)
from ripcurrent_spark.classify.library import classify_columns
from ripcurrent_spark.functions import masking as M
from ripcurrent_spark.io import load
from ripcurrent_spark.queries import register
from ripcurrent_spark.rules.apply import apply_rules

_SEGS_SQL = ", ".join(f"'{s}'" for s in MKT_SEGMENTS)


@register(
    "classify_customer_columns",
    oracle=f"""
SELECT 'c_name' AS column_name, 'PERSON_NAME' AS data_class,
       'FieldPseudonymRule' AS rule_name,
       round(avg(CASE WHEN regexp_full_match(CAST(c_name AS VARCHAR),
                 '(Customer|Supplier)#[0-9]{{9}}') THEN 1.0 ELSE 0.0 END), 6) AS match_fraction,
       TRUE AS name_matched
FROM customer
UNION ALL
SELECT 'c_mktsegment', 'MKT_SEGMENT', 'FieldSetRule',
       round(avg(CASE WHEN CAST(c_mktsegment AS VARCHAR) IN ({_SEGS_SQL})
                 THEN 1.0 ELSE 0.0 END), 6),
       FALSE
FROM customer
UNION ALL
SELECT 'c_acctbal', 'ACCOUNT_BALANCE', 'FieldBlurRule', 0.0, TRUE
""",
)
def classify_customer_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column classification of `customer`: every
    (class, column) match fraction in ONE aggregate scan, name matches
    from metadata, first-match-wins (Main.java:351-365)."""
    df = load(spark, sf_dir, "customer")
    decisions = classify_columns(df, default_classes(), threshold=0.8)
    schema = T.StructType(
        [
            T.StructField("column_name", T.StringType()),
            T.StructField("data_class", T.StringType()),
            T.StructField("rule_name", T.StringType()),
            T.StructField("match_fraction", T.DoubleType()),
            T.StructField("name_matched", T.BooleanType()),
        ]
    )
    rows = [
        (d.column, d.data_class, d.rule_name, round(d.match_fraction, 6), d.name_matched)
        for d in decisions
    ]
    return spark.createDataFrame(rows, schema)


@register(
    "masked_replica_customer",
    headline=True,
    oracle=f"""
SELECT c_custkey,
       {M.pseudonym_sql('c_name', PSEUDO_NAMES)} AS ALTERED_c_name,
       c_nationkey,
       CAST({M.blur_number_sql('c_acctbal', 50)} AS DOUBLE) AS ALTERED_c_acctbal,
       {M.pseudonym_sql('c_mktsegment', MKT_SEGMENTS)} AS ALTERED_c_mktsegment
FROM customer
""",
)
def masked_replica_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship end-to-end: classify `customer`, apply each class's
    default rule, emit the masked replica with ALTERED_<col> derived
    fields (the reference's generated-target behavior)."""
    df = load(spark, sf_dir, "customer")
    decisions = classify_columns(df, default_classes(), threshold=0.8)
    masked = apply_rules(df, decisions, default_rules())
    return masked.withColumn("ALTERED_c_acctbal", F.col("ALTERED_c_acctbal").cast("double"))


@register(
    "mask_hex_roundtrip",
    oracle=f"""
SELECT c_custkey,
       {M.encode_hex_sql('c_name')} AS enc,
       {M.decode_hex_sql(M.encode_hex_sql('c_name'))} AS dec
FROM customer
""",
)
def mask_hex_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """encode_hex / decode_hex expression rules (iriLibrary.rules
    FieldEncodingRule/FieldEncodingRule2)."""
    c = load(spark, sf_dir, "customer")
    enc = M.encode_hex("c_name")
    return c.select("c_custkey", enc.alias("enc"), M.decode_hex(enc).alias("dec"))


@register(
    "mask_string_rules",
    oracle=f"""
SELECT c_custkey,
       {M.toupper_sql('c_mktsegment')} AS seg_upper,
       {M.tolower_sql('c_name')} AS name_lower
FROM customer
""",
)
def mask_string_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """toupper/tolower string rules (iriLibrary.rules FieldStringRule)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        M.toupper("c_mktsegment").alias("seg_upper"),
        M.tolower("c_name").alias("name_lower"),
    )


@register(
    "mask_hash_name",
    oracle=f"""
SELECT c_custkey,
       {M.hash_md5_sql('c_name')} AS name_md5,
       {M.hash_sha256_sql('c_name')} AS name_sha256
FROM customer
""",
)
def mask_hash_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash masking (md5 / sha-256) — irreversible tokenization."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        M.hash_md5("c_name").alias("name_md5"),
        M.hash_sha256("c_name").alias("name_sha256"),
    )


@register(
    "mask_pseudonym_name",
    oracle=f"""
SELECT c_custkey, {M.pseudonym_sql('c_name', PSEUDO_NAMES)} AS pseudo_name
FROM customer
""",
)
def mask_pseudonym_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudonymization from a value set (reference
    FieldPseudonymRule + set file)."""
    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", M.pseudonym("c_name", PSEUDO_NAMES).alias("pseudo_name"))


@register(
    "mask_partial_redact",
    oracle=f"""
SELECT c_custkey,
       {M.redact_keep_last_sql('c_name', 4)} AS name_redacted,
       {M.redact_digits_sql('c_name')} AS name_nodigits
FROM customer
""",
)
def mask_partial_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial redaction: keep-last-N and digit masking."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        M.redact_keep_last("c_name", 4).alias("name_redacted"),
        M.redact_digits("c_name").alias("name_nodigits"),
    )


@register(
    "mask_blur_acctbal",
    oracle=f"""
SELECT c_custkey,
       CAST({M.blur_number_sql('c_acctbal', 50)} AS DOUBLE) AS acctbal_blur
FROM customer
""",
)
def mask_blur_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric blur: deterministic hash noise in [-50, 50] (reference
    FieldBlurRule analog), exact DECIMAL arithmetic."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        M.blur_number("c_acctbal", 50).cast("double").alias("acctbal_blur"),
    )


@register(
    "mask_blur_orderdate",
    oracle=f"""
SELECT o_orderkey,
       {M.blur_date_sql('o_orderdate', 7)} AS orderdate_blur
FROM orders
""",
)
def mask_blur_orderdate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date blur: +/- up to 7 days of deterministic hash noise."""
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", M.blur_date("o_orderdate", 7).alias("orderdate_blur"))


_FPE_SQL = """
array_to_string(list_transform(range(1, length(c_name)+1), i ->
  CASE WHEN substr(c_name, i, 1) >= '0' AND substr(c_name, i, 1) <= '9'
       THEN CAST((CAST(substr(c_name, i, 1) AS INT)
                  + CAST('0x' || substr(md5('k1' || CAST(i - 1 AS VARCHAR)), 1, 8) AS BIGINT) % 10)
                 % 10 AS VARCHAR)
       ELSE substr(c_name, i, 1) END), '')
"""


@register(
    "mask_fpe_digits",
    oracle=f"""
SELECT c_custkey, {_FPE_SQL} AS name_fpe
FROM customer
""",
)
def mask_fpe_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-preserving digit shift (deterministic FPE stand-in — no
    crypto lib in image): digit at position i rotates by a
    position-keyed portable hash; non-digits untouched, so layout,
    length, and charset are preserved. A production deployment swaps
    in FF1/FF3 with the same per-position contract."""
    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", M.fpe_digits("c_name").alias("name_fpe"))


_FPE_ALNUM_SQL = """
array_to_string(list_transform(range(1, length(c_name)+1), i ->
  CASE
    WHEN substr(c_name, i, 1) BETWEEN '0' AND '9'
      THEN CAST((CAST(substr(c_name, i, 1) AS INT)
                 + CAST('0x' || substr(md5('k1' || CAST(i - 1 AS VARCHAR)), 1, 8) AS BIGINT) % 10)
                % 10 AS VARCHAR)
    WHEN substr(c_name, i, 1) BETWEEN 'a' AND 'z'
      THEN chr(97 + CAST((ascii(substr(c_name, i, 1)) - 97
                 + CAST('0x' || substr(md5('k1' || CAST(i - 1 AS VARCHAR)), 1, 8) AS BIGINT) % 26)
                % 26 AS INT))
    WHEN substr(c_name, i, 1) BETWEEN 'A' AND 'Z'
      THEN chr(65 + CAST((ascii(substr(c_name, i, 1)) - 65
                 + CAST('0x' || substr(md5('k1' || CAST(i - 1 AS VARCHAR)), 1, 8) AS BIGINT) % 26)
                % 26 AS INT))
    ELSE substr(c_name, i, 1) END), '')
"""


@register(
    "mask_fpe_alnum",
    oracle=f"""
SELECT c_custkey, {_FPE_ALNUM_SQL} AS name_fpe
FROM customer
""",
)
def mask_fpe_alnum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alphanumeric FPE: digits and letters rotate within their char
    class by a position-keyed shift — masked values keep the exact
    visual format of the source (case, punctuation, layout)."""
    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", M.fpe_alnum("c_name").alias("name_fpe"))


@register(
    "masked_replica_supplier",
    oracle=f"""
SELECT s_suppkey,
       {M.pseudonym_sql('s_name', PSEUDO_NAMES)} AS ALTERED_s_name,
       s_nationkey,
       CAST({M.blur_number_sql('s_acctbal', 50)} AS DOUBLE) AS ALTERED_s_acctbal
FROM supplier
""",
)
def masked_replica_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME classify->rules->mask flow as the customer flagship,
    on a different table with zero per-table code: the class library's
    name/data matchers pick up s_name (entity-name pattern) and
    s_acctbal (balance name matcher) on their own — the reference's
    any-table replication property."""
    df = load(spark, sf_dir, "supplier")
    decisions = classify_columns(df, default_classes(), threshold=0.8)
    masked = apply_rules(df, decisions, default_rules())
    return masked.withColumn("ALTERED_s_acctbal", F.col("ALTERED_s_acctbal").cast("double"))


# ------------------------------------------------- Luhn card detection
# Credit-card PANs are a checksum-defined data class (the kind of
# detector a pattern matcher alone cannot express — regex finds digit
# runs, Luhn separates real card numbers from arbitrary digits).
# The driver tables carry no card-shaped text, so candidate PANs are
# synthesized deterministically per customer from the portable hash;
# ~1 in 10 passes Luhn, and exactly those get masked keep-last-4.
_CARD_LEN = 16


def _card_sql() -> str:
    from ripcurrent_spark.functions.hashing import h32_sql

    a = f"lpad(CAST({h32_sql('c_name', 'card-a')} AS VARCHAR), 10, '0')"
    b = f"lpad(CAST({h32_sql('c_name', 'card-b')} AS VARCHAR), 10, '0')"
    return f"substr(concat({a}, {b}), 1, {_CARD_LEN})"


def _luhn_sum_sql(card: str) -> str:
    terms = []
    for j in range(_CARD_LEN):
        d = f"CAST(substr(reverse({card}), {j + 1}, 1) AS INT)"
        if j % 2 == 0:
            terms.append(f"({d})")
        else:
            terms.append(
                f"(CASE WHEN 2 * {d} > 9 THEN 2 * {d} - 9 ELSE 2 * {d} END)"
            )
    return " + ".join(terms)


@register(
    "mask_luhn_cards",
    oracle=f"""
WITH cards AS (SELECT c_custkey, {_card_sql()} AS card FROM customer),
scored AS (
  SELECT c_custkey, card,
         CASE WHEN ({_luhn_sum_sql('card')}) % 10 = 0 THEN 1 ELSE 0 END AS luhn_valid
  FROM cards
)
SELECT c_custkey, card, CAST(luhn_valid AS INT) AS luhn_valid,
       CASE WHEN luhn_valid = 1
            THEN concat(repeat('*', {_CARD_LEN - 4}), substr(card, {_CARD_LEN - 3}, 4))
            ELSE card END AS card_masked
FROM scored
""",
)
def mask_luhn_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum-based PAN detection + masking: Luhn-validate a
    16-digit candidate per customer and redact valid card numbers to
    their last 4 digits (FieldShield's CC data class is checksum-
    gated, not regex-only).

    The Luhn fold is UNROLLED over the fixed 16 positions as a pure
    Column expression — integer arithmetic, no UDF, no explode, zero
    shuffle; both engines evaluate the identical 16-term sum, so
    validity bits match exactly. At scale this is a scan-side
    predicate like every other masking rule.
    """
    from ripcurrent_spark.functions.hashing import h32

    c = load(spark, sf_dir, "customer")
    a = F.lpad(h32("c_name", seed="card-a").cast("string"), 10, "0")
    b = F.lpad(h32("c_name", seed="card-b").cast("string"), 10, "0")
    card = F.substring(F.concat(a, b), 1, _CARD_LEN)
    rev = F.reverse(card)
    total = F.lit(0)
    for j in range(_CARD_LEN):
        d = F.substring(rev, j + 1, 1).cast("int")
        term = d if j % 2 == 0 else F.when(2 * d > 9, 2 * d - 9).otherwise(2 * d)
        total = total + term
    valid = F.when(total % 10 == 0, 1).otherwise(0)
    frame = c.select(
        "c_custkey", card.alias("card"), valid.cast("int").alias("luhn_valid")
    )
    return frame.select(
        "c_custkey",
        "card",
        "luhn_valid",
        F.when(
            F.col("luhn_valid") == 1,
            F.concat(
                F.lit("*" * (_CARD_LEN - 4)),
                F.substring("card", _CARD_LEN - 3, 4),
            ),
        )
        .otherwise(F.col("card"))
        .alias("card_masked"),
    )


@register(
    "mask_referential_integrity",
    oracle=f"""
WITH un AS (
  SELECT n.n_name, COUNT(*) AS n_joined
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
),
mc AS (
  SELECT {M.hash_md5_sql("CAST(c_custkey AS VARCHAR)")} AS ck, c_nationkey
  FROM customer
),
mo AS (
  SELECT {M.hash_md5_sql("CAST(o_custkey AS VARCHAR)")} AS ok FROM orders
),
mk AS (
  SELECT n.n_name, COUNT(*) AS n_joined_masked
  FROM mc JOIN mo ON mc.ck = mo.ok
  JOIN nation n ON mc.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
)
SELECT un.n_name, un.n_joined, mk.n_joined_masked,
       un.n_joined = mk.n_joined_masked AS intact
FROM un JOIN mk ON un.n_name = mk.n_name
""",
)
def mask_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential integrity under key pseudonymization — the
    property a masked replica must keep for downstream joins to keep
    working (the reference masks each table independently; consistent
    deterministic masking is what makes the masked tables still join).
    Per nation: customer-orders join counts on the REAL key vs on the
    md5-pseudonymized key on both sides — equal iff the mask is
    deterministic and injective on the key domain. Shape: two
    equi-joins with broadcast nation; the masked join shuffles on the
    digest exactly like the real one shuffles on the key."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf_dir, "orders").select("o_custkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    un = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_joined"))
    )
    mc = c.select(
        M.hash_md5(F.col("c_custkey").cast("string")).alias("ck"), "c_nationkey"
    )
    mo = o.select(M.hash_md5(F.col("o_custkey").cast("string")).alias("ok"))
    mk = (
        mc.join(mo, mc.ck == mo.ok)
        .join(F.broadcast(n), mc.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("mk_name"))
        .agg(F.count(F.lit(1)).alias("n_joined_masked"))
    )
    return un.join(mk, un.n_name == mk.mk_name).select(
        "n_name",
        "n_joined",
        "n_joined_masked",
        (F.col("n_joined") == F.col("n_joined_masked")).alias("intact"),
    )
