"""Core relational operators, exercised TPC-H-style on the driver
tables.

These are the analytic substrate the CDC/masking engine replicates
into (the reference's SortCL targets are downstream of exactly these
scan/join/agg/sort shapes — see /root/reference/src/main/java/
Main.java:447-521 for the generated jobs). Plans are declarative so
Catalyst does pushdown/pruning/broadcast; money math uses DECIMAL for
oracle-exact results (cast to DOUBLE only at the end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ripcurrent_spark.functions.timeutil import epoch_expr
from ripcurrent_spark.io import load
from ripcurrent_spark.operators.hints import bcast
from ripcurrent_spark.queries import register


def _dec(col: str, typ: str = "decimal(12,2)") -> F.Column:
    return F.col(col).cast(typ)


@register(
    "q1_pricing_summary",
    headline=True,
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
                * (CAST(1 AS DECIMAL(8,4)) + CAST(l_tax AS DECIMAL(8,4)))), 2) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + 8-agg hash aggregate."""
    l = load(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(8,4)")
    disc = _dec("l_discount", "decimal(8,4)")
    tax = _dec("l_tax", "decimal(8,4)")
    price = _dec("l_extendedprice")
    qty = _dec("l_quantity")
    n = F.count(F.lit(1))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast(l.schema["l_shipdate"].dataType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.round(F.sum(price * (one - disc)), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(price * (one - disc) * (one + tax)), 2).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / n).alias("avg_qty"),
            (F.sum(price).cast("double") / n).alias("avg_price"),
            (F.sum(disc).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@register(
    "q6_forecast_revenue",
    headline=True,
    oracle="""
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * CAST(l_discount AS DECIMAL(8,4))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight filter (pushed to parquet) + single agg."""
    l = load(spark, sf_dir, "lineitem")
    ts = l.schema["l_shipdate"].dataType
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast(ts))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast(ts))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(_dec("l_extendedprice") * _dec("l_discount", "decimal(8,4)")), 2).cast("double").alias("revenue"))
    )


@register(
    "q3_shipping_priority",
    headline=True,
    oracle="""
SELECT l_orderkey,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))), 2) AS DOUBLE) AS revenue,
       o_orderdate
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join (dim side broadcast) + agg + top-k."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    ts = o.schema["o_orderdate"].dataType
    o = o.filter(F.col("o_orderdate") < F.lit("1997-03-15 00:00:00").cast(ts))
    l = l.filter(F.col("l_shipdate") > F.lit("1997-03-15 00:00:00").cast(ts))
    one = F.lit(1).cast("decimal(8,4)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(bcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(_dec("l_extendedprice") * (one - _dec("l_discount", "decimal(8,4)"))), 2).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier",
    headline=True,
    oracle="""
SELECT n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))), 2) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join, dims broadcast, local-supplier predicate."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    ts = o.schema["o_orderdate"].dataType
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast(ts))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast(ts))
    )
    one = F.lit(1).cast("decimal(8,4)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(bcast(c), o.o_custkey == c.c_custkey)
        .join(bcast(s), (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(bcast(n), s.s_nationkey == n.n_nationkey)
        .join(bcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_dec("l_extendedprice") * (one - _dec("l_discount", "decimal(8,4)"))), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "q_top3_orders_per_cust",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t
WHERE rn <= 3
""",
)
def q_top3_orders_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via window row_number (single shuffle on the key)."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "q_running_revenue",
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
            OVER (PARTITION BY l_suppkey
                  ORDER BY l_shipdate, l_orderkey, l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev
FROM lineitem
WHERE l_suppkey <= 10
""",
)
def q_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per key: exact decimal window sum, tie-broken order."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 10)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return l.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(_dec("l_extendedprice")).over(w).cast("double").alias("running_rev"),
    )


@register(
    "q_rollup_sales",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q_rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregate (ROLLUP): subtotals + grand total."""
    l = load(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_pivot_returns",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O'
                THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_open,
       CAST(SUM(CASE WHEN l_linestatus = 'F'
                THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_final
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_pivot_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregate) — linestatus columns per flag."""
    l = load(spark, sf_dir, "lineitem")
    piv = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(_dec("l_quantity")).cast("double"))
    )
    return piv.select(
        "l_returnflag",
        F.col("O").alias("qty_open"),
        F.col("F").alias("qty_final"),
    )


@register(
    "q_semi_big_spenders",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
""",
)
def q_semi_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with a big order."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "q_anti_inactive_custs",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def q_anti_inactive_custs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "q_distinct_counts",
    oracle="""
SELECT COUNT(DISTINCT o_custkey) AS n_custs,
       COUNT(DISTINCT o_orderpriority) AS n_priorities,
       COUNT(*) AS n_orders
FROM orders
""",
)
def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand+two-phase under AQE)."""
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register("q_approx_stats", doc="Sketch aggregates (HLL distinct, approx quantiles) — implementations differ from DuckDB's sketches, so rows-only check.")
def q_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct + quantiles: the 100-TB-friendly forms.
    Scalar output columns (no arrays — the driver's pandas
    canonicalizer can't sort list cells even in rows-only mode)."""
    l = load(spark, sf_dir, "lineitem")
    return l.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("p50"),
        F.percentile_approx("l_extendedprice", 0.95).alias("p95"),
        F.percentile_approx("l_extendedprice", 0.99).alias("p99"),
    )


@register(
    "q_sessionize_events",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
  FROM flagged
)
SELECT user_id, session_no,
       MIN(ts) AS session_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM sess
GROUP BY user_id, session_no
""",
)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: lag + cumulative flag sum, one shuffle."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    ts_type = e.schema["ts"].dataType.simpleString()
    gap = epoch_expr(F.col("ts"), ts_type) - epoch_expr(F.lag("ts").over(w), ts_type)
    flagged = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0),
    )
    sess = flagged.withColumn("session_no", F.sum("new_session").over(run))
    return sess.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_dec("value")).cast("double").alias("total_value"),
    )


@register(
    "q_time_bucket_events",
    oracle="""
SELECT time_bucket(INTERVAL '5 minutes', ts) AS bucket,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY bucket, event_type
""",
)
def q_time_bucket_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window time aggregate (batch twin of the streaming agg)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").start.alias("bucket"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
    )


@register(
    "q_asof_join",
    oracle="""
WITH tagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN event_type = 'click' THEN ts END AS click_ts,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase
  FROM events
  WHERE event_type IN ('click', 'purchase')
),
filled AS (
  SELECT user_id, ts, event_id, value, is_purchase,
         LAST_VALUE(click_ts IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
  FROM tagged
)
SELECT event_id, user_id, ts, value, last_click_ts
FROM filled WHERE is_purchase = 1
""",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: purchases matched to the latest prior click.

    Union + ignore-nulls window fill — linear, one shuffle, no range
    explosion; the scalable alternative to per-group merge_asof.
    """
    e = load(spark, sf_dir, "events").filter(F.col("event_type").isin("click", "purchase"))
    tagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_purchase"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    filled = tagged.withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
    return filled.filter(F.col("is_purchase") == 1).select(
        "event_id", "user_id", "ts", "value", "last_click_ts"
    )
