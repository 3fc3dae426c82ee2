"""CDC queries: envelope parse, logical-type decode, apply semantics
(snapshot / SCD2), changelog audit — the reference's event loop
(Main.java:159-318) as declarative plans over a deterministic
changelog (cdc/synth.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ripcurrent_spark.cdc import decode as D
from ripcurrent_spark.cdc.apply import changelog_counts, latest_snapshot, scd2_history
from ripcurrent_spark.cdc.envelope import build_envelope_json, parse_envelope
from ripcurrent_spark.cdc.synth import CHANGELOG_CTE, synth_changelog
from ripcurrent_spark.functions.hashing import h32, h32_sql
from ripcurrent_spark.io import load
from ripcurrent_spark.queries import register


@register(
    "cdc_parse_envelope",
    headline=True,
    oracle=f"""
WITH {CHANGELOG_CTE.strip()}
SELECT op, ts_ms, 'orders' AS table_name, 'o_orderkey' AS key_field,
       CAST(o_orderkey AS VARCHAR) AS key_value,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o_custkey AS BIGINT) AS o_custkey,
       o_orderstatus,
       CAST(totalprice AS DOUBLE) AS totalprice
FROM changelog
WHERE op <> 'd'
UNION ALL
SELECT c.op, c.ts_ms, 'orders', 'o_orderkey',
       CAST(c.o_orderkey AS VARCHAR),
       CAST(c.o_orderkey AS BIGINT),
       CAST(i.o_custkey AS BIGINT), i.o_orderstatus,
       CAST(i.totalprice AS DOUBLE)
FROM changelog c JOIN changelog i
  ON i.o_orderkey = c.o_orderkey AND i.op = 'c'
WHERE c.op = 'd'
""",
)
def cdc_parse_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip: changelog -> Debezium JSON (key + value) ->
    parse_envelope -> flattened typed columns. Deletes carry the
    BEFORE image (Main.java:171-178); here before = the insert
    payload. The before-image comes from synth_changelog's
    ``with_before`` branch columns — ONE scan, no
    changelog-to-insert self-join (the oracle still joins, because
    SQL over the changelog CTE has no other way to see the insert
    image; the Spark side never re-shuffles for it)."""
    log = synth_changelog(spark, sf_dir, with_before=True)
    payload = F.map_from_arrays(
        F.array(F.lit("o_orderkey"), F.lit("o_custkey"), F.lit("o_orderstatus"), F.lit("totalprice")),
        F.array(
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            F.col("totalprice").cast("string"),
        ),
    )
    events = build_envelope_json(
        log,
        op=F.col("op"),
        ts_ms=F.col("ts_ms"),
        table="orders",
        key_col="o_orderkey",
        before=F.col("_before"),
        after=F.when(F.col("op") != "d", payload),
    )
    parsed = parse_envelope(events)
    rp = F.col("row_payload")
    return parsed.select(
        "op",
        "ts_ms",
        F.col("table").alias("table_name"),
        "key_field",
        "key_value",
        rp["o_orderkey"].cast("bigint").alias("o_orderkey"),
        rp["o_custkey"].cast("bigint").alias("o_custkey"),
        rp["o_orderstatus"].alias("o_orderstatus"),
        rp["totalprice"].cast("double").alias("totalprice"),
    )


@register(
    "cdc_decode_types",
    oracle=f"""
SELECT o_orderkey,
       CAST({D.epoch_days_to_date_sql("datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))")} AS VARCHAR) AS dec_date,
       {D.micros_of_day_to_time_sql("(o_orderkey * 40000000) % 86400000000")} AS dec_time,
       {D.epoch_ms_to_datetime_sql("epoch_ms(o_orderdate) + (o_orderkey % 86400) * 1000")} AS dec_datetime,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS dec_decimal_str,
       CAST(CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS DECIMAL(12,2)) AS DOUBLE) AS dec_decimal,
       {D.base64_of_string_sql('o_orderstatus')} AS enc_base64
FROM orders
""",
)
def cdc_decode_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium logical-type decode (DateTimeConversionUtil.java:21-37,
    Main.java:143-144, 196-232): epoch-days date, micros-of-day time,
    epoch-ms datetime, decimal-as-string, base64 binary. Wire values
    are derived deterministically from `orders`."""
    o = load(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    micro_time = (F.col("o_orderkey") * 40_000_000) % 86_400_000_000
    ms = F.unix_millis(F.col("o_orderdate").cast("timestamp")) + (F.col("o_orderkey") % 86400) * 1000
    dec_str = F.col("o_totalprice").cast("decimal(12,2)").cast("string")
    return o.select(
        "o_orderkey",
        D.epoch_days_to_date(days).cast("string").alias("dec_date"),
        D.micros_of_day_to_time(micro_time).alias("dec_time"),
        D.epoch_ms_to_datetime(ms).alias("dec_datetime"),
        dec_str.alias("dec_decimal_str"),
        # emit DOUBLE: Spark DECIMAL reaches pandas as Decimal objects
        # while DuckDB DECIMAL lands as float64 — value-equal but
        # hash-different under the driver canonicalizer. The string twin
        # dec_decimal_str pins exactness.
        D.decimal_string_to_decimal(dec_str).cast("double").alias("dec_decimal"),
        D.base64_of_string("o_orderstatus").alias("enc_base64"),
    )


@register(
    "cdc_latest_snapshot",
    headline=True,
    oracle=f"""
WITH {CHANGELOG_CTE.strip()}
SELECT op, seq, ts_ms, o_orderkey, o_custkey, o_orderstatus,
       CAST(totalprice AS DOUBLE) AS totalprice
FROM changelog
QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY ts_ms DESC, seq DESC) = 1
   AND op <> 'd'
""",
)
def cdc_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply -> current snapshot: latest event per key wins
    (ts, seq order), deleted keys dropped. One shuffle on the key —
    the declarative equivalent of the reference's routed
    append/UPDATE/DELETE jobs (Main.java:456-498)."""
    log = synth_changelog(spark, sf_dir)
    snap = latest_snapshot(log, key_cols=["o_orderkey"], order_cols=["ts_ms", "seq"])
    return snap.withColumn("totalprice", F.col("totalprice").cast("double"))


@register(
    "cdc_latest_snapshot_salted",
    oracle=f"""
WITH {CHANGELOG_CTE.strip()}
SELECT op, seq, ts_ms, o_orderkey, o_custkey, o_orderstatus,
       CAST(totalprice AS DOUBLE) AS totalprice
FROM changelog
QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY ts_ms DESC, seq DESC) = 1
   AND op <> 'd'
""",
)
def cdc_latest_snapshot_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-hardened CDC apply: same snapshot semantics (and the SAME
    oracle) as cdc_latest_snapshot, computed as a two-phase salted
    max-by aggregation instead of one window-by-key — the shape for
    hot-key-update workloads where one key's updates dominate a real
    CDC stream (AQE splits skewed partitions, not one key's row
    group). Phase 1 reduces per (key, salt-of-order-cols) with
    map-side partial aggregation; phase 2 reduces the <= n_salts
    candidates per key. See cdc/apply.py::latest_snapshot_salted."""
    from ripcurrent_spark.cdc.apply import latest_snapshot_salted

    log = synth_changelog(spark, sf_dir)
    snap = latest_snapshot_salted(
        log, key_cols=["o_orderkey"], order_cols=["ts_ms", "seq"]
    )
    return snap.select(
        "op", "seq", "ts_ms", "o_orderkey", "o_custkey", "o_orderstatus",
        F.col("totalprice").cast("double").alias("totalprice"),
    )


@register(
    "cdc_scd2_history",
    oracle=f"""
WITH {CHANGELOG_CTE.strip()}
SELECT o_orderkey, op, seq,
       CAST(totalprice AS DOUBLE) AS totalprice,
       valid_from, valid_to, is_current
FROM (
  SELECT *, ts_ms AS valid_from,
         LEAD(ts_ms) OVER (PARTITION BY o_orderkey ORDER BY ts_ms, seq) AS valid_to,
         LEAD(ts_ms) OVER (PARTITION BY o_orderkey ORDER BY ts_ms, seq) IS NULL AS is_current
  FROM changelog
)
WHERE op <> 'd'
""",
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply -> SCD2 history: every version carries its validity
    interval; deletes close intervals without emitting rows."""
    log = synth_changelog(spark, sf_dir)
    hist = scd2_history(log, key_cols=["o_orderkey"], order_cols=["ts_ms", "seq"])
    return hist.select(
        "o_orderkey",
        "op",
        "seq",
        F.col("totalprice").cast("double").alias("totalprice"),
        "valid_from",
        "valid_to",
        "is_current",
    )


@register(
    "cdc_changelog_counts",
    oracle=f"""
WITH {CHANGELOG_CTE.strip()}
SELECT op, COUNT(*) AS n_events, MIN(ts_ms) AS min_ts_ms, MAX(ts_ms) AS max_ts_ms
FROM changelog GROUP BY op
""",
)
def cdc_changelog_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replication audit: per-op event counts + ts range (the
    reference logs per-script row flow; this is the set-level view)."""
    return changelog_counts(synth_changelog(spark, sf_dir))


@register(
    "cdc_snapshot_diff",
    oracle="""
WITH src AS (
  SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(12,2)) AS bal
  FROM customer
),
dst AS (
  -- replica drift, synthesized deterministically: every 97th key lost,
  -- every 31st key's balance corrupted by +1
  SELECT c_custkey, c_name,
         CASE WHEN c_custkey % 31 = 0 THEN CAST(c_acctbal AS DECIMAL(12,2)) + 1
              ELSE CAST(c_acctbal AS DECIMAL(12,2)) END AS bal
  FROM customer WHERE c_custkey % 97 <> 0
)
SELECT COALESCE(src.c_custkey, dst.c_custkey) AS key,
       CASE WHEN dst.c_custkey IS NULL THEN 'missing_in_replica'
            WHEN src.c_custkey IS NULL THEN 'extra_in_replica'
            ELSE 'value_mismatch' END AS diff_kind,
       CAST(src.bal AS DOUBLE) AS src_bal,
       CAST(dst.bal AS DOUBLE) AS dst_bal
FROM src FULL OUTER JOIN dst ON src.c_custkey = dst.c_custkey
WHERE dst.c_custkey IS NULL OR src.c_custkey IS NULL
   OR src.bal <> dst.bal OR src.c_name <> dst.c_name
ORDER BY key
""",
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replication drift detection: full-outer diff of source vs
    replica, classifying missing / extra / value-mismatch rows — the
    verification the reference's replicate-then-mask contract implies
    but never checks. One co-partitioned shuffle join; at 100 TB both
    sides bucket on the key and the diff is exchange-free.

    The replica is synthesized from the source with deterministic
    drift (every 97th key dropped, every 31st balance off by one) so
    the oracle sees identical inputs."""
    c = load(spark, sf_dir, "customer")
    bal = F.col("c_acctbal").cast("decimal(12,2)")
    src = c.select("c_custkey", "c_name", bal.alias("bal"))
    dst = (
        c.filter(F.col("c_custkey") % 97 != 0)
        .select(
            "c_custkey",
            "c_name",
            F.when(F.col("c_custkey") % 31 == 0, bal + 1).otherwise(bal).alias("bal"),
        )
    )
    s = src.alias("s")
    d = dst.alias("d")
    joined = s.join(d, F.col("s.c_custkey") == F.col("d.c_custkey"), "full_outer")
    missing = F.col("d.c_custkey").isNull()
    extra = F.col("s.c_custkey").isNull()
    kind = (
        F.when(missing, "missing_in_replica")
        .when(extra, "extra_in_replica")
        .otherwise("value_mismatch")
    )
    return (
        joined.filter(
            missing
            | extra
            | (F.col("s.bal") != F.col("d.bal"))
            | (F.col("s.c_name") != F.col("d.c_name"))
        )
        .select(
            F.coalesce(F.col("s.c_custkey"), F.col("d.c_custkey")).alias("key"),
            kind.alias("diff_kind"),
            F.col("s.bal").cast("double").alias("src_bal"),
            F.col("d.bal").cast("double").alias("dst_bal"),
        )
        .orderBy("key")
    )


@register(
    "cdc_replication_audit",
    oracle=f"""
SELECT COUNT(*) AS n_rows,
       CAST(CAST(SUM({h32_sql("concat_ws('|', CAST(c_custkey AS VARCHAR), c_name, CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR), c_mktsegment)")}) AS DECIMAL(38,0)) AS VARCHAR) AS content_checksum,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal_total
FROM customer
""",
)
def cdc_replication_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table audit: row count + additive content
    checksum (sum of per-row portable hashes over canonicalized
    fields) + control total. Running it on source and replica and
    comparing the three numbers verifies replication without moving
    either table — a single scan each side, no join, no sort."""
    c = load(spark, sf_dir, "customer")
    canon = F.concat_ws(
        "|",
        F.col("c_custkey").cast("string"),
        F.col("c_name"),
        F.col("c_acctbal").cast("decimal(12,2)").cast("string"),
        F.col("c_mktsegment"),
    )
    # The checksum accumulates in DECIMAL(38,0) and is emitted as a
    # decimal STRING on both engines: BIGINT would overflow at ~2^31
    # rows x 2^32 per-row hashes (100 TB territory) and DOUBLE loses
    # integer precision above 2^53, so neither is audit-grade. String
    # output is also the only representation both pandas canonicalizers
    # agree on exactly (DuckDB HUGEINT otherwise lands as float64).
    return c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(h32(canon).cast("decimal(38,0)")).cast("string").alias("content_checksum"),
        F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double").alias("bal_total"),
    )


# ---------------------------------------------------------- time travel
# Snapshot-as-of: replay the changelog only up to a cutoff instant and
# apply latest-per-key — the time-travel read a replication target
# needs for audits ("what did the table look like on June 1?") and the
# batch twin of resuming a consumer from an offset. Cutoff is fixed at
# 1995-06-01T00:00:00Z.
ASOF_MS = 801_964_800_000


@register(
    "cdc_snapshot_asof",
    oracle=f"""
WITH {CHANGELOG_CTE.strip()}
SELECT op, seq, ts_ms, o_orderkey, o_custkey, o_orderstatus,
       CAST(totalprice AS DOUBLE) AS totalprice
FROM changelog
WHERE ts_ms <= {ASOF_MS}
QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY ts_ms DESC, seq DESC) = 1
   AND op <> 'd'
""",
)
def cdc_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel snapshot: apply only events with ts_ms <= cutoff,
    then latest-per-key with deletes dropped — identical plan shape to
    cdc_latest_snapshot with the cutoff PUSHED INTO THE SCAN (the
    predicate sits below the window shuffle, so a month-old snapshot
    over a year of changelog reads and shuffles only the prefix).
    On a changelog partitioned by event time (date=... dirs) the same
    filter prunes whole partitions; the streaming sinks' `_batch_id=`
    layout prunes when batch ids map to time ranges (monotone
    ingestion), via a batch-id manifest otherwise."""
    log = synth_changelog(spark, sf_dir).filter(F.col("ts_ms") <= ASOF_MS)
    snap = latest_snapshot(log, key_cols=["o_orderkey"], order_cols=["ts_ms", "seq"])
    return snap.withColumn("totalprice", F.col("totalprice").cast("double"))


ASOF_T2_MS = 833_587_200_000  # 1996-06-01T00:00:00Z


@register(
    "cdc_snapshot_delta",
    oracle=f"""
WITH {CHANGELOG_CTE.strip()},
s1 AS (
  SELECT o_orderkey, totalprice, op FROM changelog WHERE ts_ms <= {ASOF_MS}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY ts_ms DESC, seq DESC) = 1
),
s2 AS (
  SELECT o_orderkey, totalprice, op FROM changelog WHERE ts_ms <= {ASOF_T2_MS}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY ts_ms DESC, seq DESC) = 1
),
a AS (SELECT o_orderkey, totalprice FROM s1 WHERE op <> 'd'),
b AS (SELECT o_orderkey, totalprice FROM s2 WHERE op <> 'd')
SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
       CASE WHEN a.o_orderkey IS NULL THEN 'added'
            WHEN b.o_orderkey IS NULL THEN 'removed'
            ELSE 'modified' END AS change,
       CAST(a.totalprice AS DOUBLE) AS price_t1,
       CAST(b.totalprice AS DOUBLE) AS price_t2
FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
   OR a.totalprice <> b.totalprice
""",
)
def cdc_snapshot_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What changed between two instants: latest-per-key snapshots at
    T1 (1995-06-01) and T2 (1996-06-01) full-outer joined and
    classified added / removed / modified — the incremental-consumer
    view a downstream sync pulls instead of a full snapshot.

    Plan: both cutoffs push below their window shuffles; on a
    time-partitioned changelog layout the two reads prune to their
    time ranges (monotone `_batch_id=` dirs prune the same way via a
    batch-to-time manifest), and the full-outer join shuffles once on
    the key both snapshots already hash by."""
    log = synth_changelog(spark, sf_dir)

    def snap(cutoff: int) -> DataFrame:
        s = latest_snapshot(
            log.filter(F.col("ts_ms") <= cutoff),
            key_cols=["o_orderkey"],
            order_cols=["ts_ms", "seq"],
        )
        return s.select("o_orderkey", F.col("totalprice").cast("double").alias("price"))

    a = snap(ASOF_MS).withColumnRenamed("price", "price_t1")
    b = snap(ASOF_T2_MS).withColumnRenamed("price", "price_t2")
    j = a.withColumnRenamed("o_orderkey", "k1").join(
        b.withColumnRenamed("o_orderkey", "k2"),
        F.col("k1") == F.col("k2"),
        "full_outer",
    )
    change = (
        F.when(F.col("k1").isNull(), "added")
        .when(F.col("k2").isNull(), "removed")
        .otherwise("modified")
    )
    return (
        j.filter(
            F.col("k1").isNull()
            | F.col("k2").isNull()
            | (F.col("price_t1") != F.col("price_t2"))
        )
        .select(
            F.coalesce("k1", "k2").alias("o_orderkey"),
            change.alias("change"),
            "price_t1",
            "price_t2",
        )
    )
