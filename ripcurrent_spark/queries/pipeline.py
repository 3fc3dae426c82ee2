"""Training-data pipeline queries: deterministic sampling / splits,
bounded range join (click attribution), hierarchical time rollup.

All oracle-checked: the sampling decisions ride the portable md5 hash
(functions/hashing.py) so DuckDB computes bit-identical assignments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ripcurrent_spark.functions.hashing import h32_sql
from ripcurrent_spark.functions.timeutil import epoch_seconds
from ripcurrent_spark.io import load
from ripcurrent_spark.operators.intervals import range_join_backward
from ripcurrent_spark.operators.sampling import (
    hash_sample,
    hash_pct_sql,
    split_label,
    split_label_sql,
    stratified_sample,
    stratified_sample_sql,
)
from ripcurrent_spark.queries import register


def _dec(col: str, typ: str = "decimal(12,2)") -> F.Column:
    return F.col(col).cast(typ)


@register(
    "sample_hash_docs",
    oracle=f"""
SELECT doc_id, lang, source
FROM documents
WHERE {hash_pct_sql('doc_id')} < 10
""",
)
def sample_hash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample of documents: pure scan predicate
    (no RNG, no shuffle), stable under repartitioning/retries."""
    d = load(spark, sf_dir, "documents")
    return d.filter(hash_sample("doc_id", 10)).select("doc_id", "lang", "source")


@register(
    "split_train_val_test",
    oracle=f"""
SELECT {split_label_sql('doc_id')} AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY split
ORDER BY split
""",
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test split — disjoint + exhaustive by
    construction (one hash bucket per doc), audited by size."""
    d = load(spark, sf_dir, "documents")
    return (
        d.withColumn("split", split_label("doc_id"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("split")
    )


_STRAT_RATES = {"en": 80, "de": 20, "fr": 20, "es": 20}


@register(
    "sample_stratified_by_lang",
    oracle=f"""
SELECT lang, COUNT(*) AS n_kept
FROM documents
WHERE {stratified_sample_sql('doc_id', 'lang', _STRAT_RATES)}
GROUP BY lang
ORDER BY lang
""",
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sampling rates (the deterministic `sampleBy`):
    keep 80% of English, 20% of other languages."""
    d = load(spark, sf_dir, "documents")
    return (
        d.filter(stratified_sample("doc_id", "lang", _STRAT_RATES))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .orderBy("lang")
    )


@register(
    "q_range_join_click_purchase",
    oracle="""
SELECT p.event_id AS purchase_id, c.event_id AS click_id,
       date_diff('second', c.ts, p.ts) AS gap_s
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 30 MINUTE
""",
)
def q_range_join_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click attribution: every (purchase, click-within-previous-30min)
    pair per user, via the bucketed range join (equi-join on
    (user, time-bucket) with fanout 2 — no nested-loop range scan)."""
    e = load(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    pairs = range_join_backward(p, c, key="user_id", left_ts="p_ts", right_ts="c_ts", window_sec=1800)
    gap = epoch_seconds(pairs, "p_ts") - epoch_seconds(pairs, "c_ts")
    return pairs.select("purchase_id", "click_id", gap.alias("gap_s"))


@register(
    "q_hour_day_rollup",
    oracle="""
SELECT 'hour' AS resolution, date_trunc('hour', ts) AS bucket, event_type,
       COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events GROUP BY bucket, event_type
UNION ALL
SELECT 'day' AS resolution, date_trunc('day', ts) AS bucket, event_type,
       COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events GROUP BY bucket, event_type
""",
)
def q_hour_day_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: hourly aggregate from
    raw, daily REUSES the hourly result (re-aggregating partials, never
    rescanning raw — at 100 TB the raw scan happens exactly once and
    each coarser tier shrinks geometrically). Exact because count/sum
    are decomposable over DECIMAL partials."""
    e = load(spark, sf_dir, "events")
    # persist: both output tiers reference the hourly aggregate; without
    # a barrier the union would re-scan raw events per tier (in a
    # production hypertable the hourly tier is a stored table).
    from ripcurrent_spark.operators import cachereg

    hourly = cachereg.track(
        e.groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(_dec("value")).alias("tv"))
        .persist()
    )
    daily = (
        hourly.groupBy(F.date_trunc("day", "bucket").alias("bucket"), "event_type")
        .agg(F.sum("n").alias("n"), F.sum("tv").alias("tv"))
    )
    out_cols = ["resolution", "bucket", "event_type", "n", "tv"]
    both = (
        hourly.withColumn("resolution", F.lit("hour")).select(*out_cols)
        .unionByName(daily.withColumn("resolution", F.lit("day")).select(*out_cols))
    )
    return both.select(
        "resolution", "bucket", "event_type", "n", F.col("tv").cast("double").alias("total_value")
    )


@register(
    "q_exact_quantiles",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.25) AS p25,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.95) AS p95,
       CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
       CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`, verified bit-identical). The exact form is
    the small-group path — per-group `percentile` buffers the whole
    group in one aggregation buffer, so at 100 TB use
    q_quantile_sketch_groups (mergeable per-group bottom-k sample,
    identical output columns plus the exact envelope); this query
    doubles as its error reference.
    Quantiles emitted as scalar columns — array-typed output columns
    crash the driver's pandas canonicalizer (unhashable list)."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.25D)").alias("p25"),
            F.expr("percentile(l_extendedprice, 0.5D)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.95D)").alias("p95"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
        .orderBy("l_returnflag")
    )


_QS_K = 4096


def _qs_samp_sql() -> str:
    from ripcurrent_spark.operators.sketches import grouped_bottomk_sql

    return grouped_bottomk_sql(
        "l",
        ["l_returnflag"],
        h32_sql("concat(CAST(l_orderkey AS VARCHAR), ':', CAST(l_linenumber AS VARCHAR))", seed="qs"),
        ["l_orderkey", "l_linenumber"],
        _QS_K,
    )


@register(
    "q_quantile_sketch_groups",
    oracle=f"""
WITH l AS (
  SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS price,
         l_orderkey, l_linenumber
  FROM lineitem
),
samp AS ({_qs_samp_sql()}),
est AS (
  SELECT l_returnflag,
         quantile_cont(price, 0.25) AS est_p25,
         quantile_cont(price, 0.5) AS est_p50,
         quantile_cont(price, 0.95) AS est_p95
  FROM samp GROUP BY l_returnflag
),
ex AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n_rows,
         quantile_cont(price, 0.25) AS exact_p25,
         quantile_cont(price, 0.5) AS exact_p50,
         quantile_cont(price, 0.95) AS exact_p95
  FROM l GROUP BY l_returnflag
)
SELECT ex.l_returnflag, ex.n_rows, {_QS_K} AS k,
       est.est_p25, est.est_p50, est.est_p95,
       ex.exact_p25, ex.exact_p50, ex.exact_p95
FROM ex JOIN est USING (l_returnflag)
ORDER BY ex.l_returnflag
""",
)
def q_quantile_sketch_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantile ESTIMATES from a mergeable per-group
    bottom-k (KMV) sample — the 100 TB path for q_exact_quantiles,
    with the exact values riding along as the small-sf error envelope
    (the q_hll_distinct_users / q_bottomk_sample_quantiles pattern).

    Scale posture (operators/sketches.py rationale): the sample is a
    sharded two-phase per-group window — parallelism groups x shards,
    each task sorting 1/shards of its group externally — so no task
    ever buffers a full group the way exact per-group ``percentile``
    does (3 return-flag groups at 100 TB = ~30 TB per aggregation
    buffer). Priorities are the portable md5 hash, so DuckDB draws
    the IDENTICAL sample and the driver value-hash checks the
    ESTIMATES themselves, not just the envelope. k=4096 per group
    puts the estimates within ~1% of exact at sf0.01."""
    from ripcurrent_spark.functions.hashing import h32
    from ripcurrent_spark.operators.sketches import grouped_bottomk

    l = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").cast("double").alias("price"),
        "l_orderkey",
        "l_linenumber",
    )
    pri = h32(
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit(":"),
            F.col("l_linenumber").cast("string"),
        ),
        seed="qs",
    )
    samp = grouped_bottomk(
        l, ["l_returnflag"], pri, ["l_orderkey", "l_linenumber"], _QS_K
    )
    est = samp.groupBy("l_returnflag").agg(
        F.expr("percentile(price, 0.25D)").alias("est_p25"),
        F.expr("percentile(price, 0.5D)").alias("est_p50"),
        F.expr("percentile(price, 0.95D)").alias("est_p95"),
    )
    ex = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr("percentile(price, 0.25D)").alias("exact_p25"),
        F.expr("percentile(price, 0.5D)").alias("exact_p50"),
        F.expr("percentile(price, 0.95D)").alias("exact_p95"),
    )
    return (
        ex.join(F.broadcast(est), "l_returnflag")
        .select(
            "l_returnflag",
            "n_rows",
            F.lit(_QS_K).alias("k"),
            "est_p25",
            "est_p50",
            "est_p95",
            "exact_p25",
            "exact_p50",
            "exact_p95",
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_top_terms",
    oracle="""
WITH toks AS (
  SELECT unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS term
  FROM documents
),
counts AS (
  SELECT term, COUNT(*) AS n FROM toks WHERE length(term) > 3 GROUP BY term
)
SELECT term, n, rank FROM (
  SELECT term, n, ROW_NUMBER() OVER (ORDER BY n DESC, term) AS rank FROM counts
) WHERE rank <= 20
""",
)
def q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequencies, exact top-20: explode -> two-phase
    count (map-side partials shrink the shuffle to distinct terms) ->
    mergeable top-k. The term aggregate is VOCABULARY-sized (billions
    of terms on a web corpus), so the top-20 is orderBy().limit() —
    TakeOrderedAndProject, a per-partition partial top-k whose merge
    sees only k rows per partition — never a row_number() window that
    funnels the whole vocabulary through one task. Ranks are then
    assigned over the 20 survivors (bounded input, no single-partition
    exchange of an unbounded frame)."""
    d = load(spark, sf_dir, "documents")
    from ripcurrent_spark.operators.dedup import tokens

    counts = (
        d.select(F.explode(tokens("text")).alias("term"))
        .filter(F.length("term") > 3)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    topk = counts.orderBy(F.desc("n"), "term").limit(20)
    w = W.orderBy(F.desc("n"), "term")
    return topk.withColumn("rank", F.row_number().over(w))


@register(
    "pipeline_corpus_curation",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, n_chars,
         trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
  FROM documents
),
q AS (
  SELECT * FROM t
  WHERE len(string_split(norm, ' ')) >= 10 AND n_chars <= 20000
),
keep AS (SELECT MIN(doc_id) AS keep_id FROM q GROUP BY md5(norm))
SELECT {split_label_sql('doc_id')} AS split, lang,
       COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM q
WHERE doc_id IN (SELECT keep_id FROM keep)
GROUP BY split, lang
ORDER BY split, lang
""",
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation: quality gate (>=10 tokens, <=20k chars) ->
    exact dedup (normalized-content hash, keep min doc_id) ->
    deterministic train/val/test split -> per-(split, lang) audit.
    Single scan + one dedup shuffle + one count shuffle; every stage
    is the operator tested standalone elsewhere."""
    d = load(spark, sf_dir, "documents")
    from ripcurrent_spark.operators.dedup import norm_text

    t = d.select("doc_id", "lang", "n_chars", norm_text("text").alias("norm"))
    q = t.filter((F.size(F.split(F.col("norm"), " ")) >= 10) & (F.col("n_chars") <= 20000))
    keep = q.groupBy(F.md5("norm").alias("h")).agg(F.min("doc_id").alias("keep_id"))
    return (
        q.join(keep, q.doc_id == keep.keep_id, "left_semi")
        .withColumn("split", split_label("doc_id"))
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("split", "lang")
    )


@register(
    "q_salted_brand_revenue",
    oracle="""
SELECT p_brand,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
""",
)
def q_salted_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join demo: lineitem x part spread over 8 salt sub-keys
    (a hot part key lands on 8 reducers instead of one). The result is
    identical to the plain join — the oracle IS the plain join."""
    from ripcurrent_spark.operators.skew import salted_join

    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    one = F.lit(1).cast("decimal(8,4)")
    rev = _dec("l_extendedprice") * (one - F.col("l_discount").cast("decimal(8,4)"))
    j = salted_join(l, p, "l_partkey", "p_partkey", fact_row_key="l_orderkey", n_salt=8)
    return (
        j.groupBy("p_brand")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy("p_brand")
    )


@register(
    "q_outlier_orders",
    oracle="""
WITH stats AS (
  SELECT o_orderpriority AS pr,
         COUNT(*) AS n,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS s,
         SUM(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(o_totalprice AS DECIMAL(12,2))) AS ss
  FROM orders GROUP BY 1
)
SELECT o_orderkey, o_orderpriority,
       round((o_totalprice - CAST(s AS DOUBLE) / n)
             / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1)),
             6) AS zscore
FROM orders JOIN stats ON o_orderpriority = pr
WHERE abs((o_totalprice - CAST(s AS DOUBLE) / n)
          / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1))) > 1.6
ORDER BY o_orderkey
""",
)
def q_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outliers (|z| > 1.6 within order priority).

    The moments are EXACT decimal sums (sum, sum-of-squares) — float
    summation order never enters — and only the final mean/variance
    arithmetic runs in double, in the same operation order as the
    oracle, so results hash-match. Group stats are a broadcast join
    back onto the fact rows: one scan + one tiny aggregate."""
    o = load(spark, sf_dir, "orders")
    tp = _dec("o_totalprice")
    stats = o.groupBy(F.col("o_orderpriority").alias("pr")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(tp).alias("s"),
        F.sum(tp * tp).alias("ss"),
    )
    n = F.col("n")
    s = F.col("s").cast("double")
    ss = F.col("ss").cast("double")
    mean = s / n
    var = (ss - s * s / n) / (n - 1)
    z = (F.col("o_totalprice") - mean) / F.sqrt(var)
    return (
        o.join(F.broadcast(stats), o.o_orderpriority == F.col("pr"))
        .filter(F.abs(z) > 1.6)
        .select("o_orderkey", "o_orderpriority", F.round(z, 6).alias("zscore"))
        .orderBy("o_orderkey")
    )


@register(
    "q_json_props_stats",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
WHERE props IS NOT NULL
GROUP BY event_type
ORDER BY event_type
""",
)
def q_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: JSON path extraction inside
    the scan projection (get_json_object is codegen'd; at scale,
    frequently-used paths move to from_json + a struct column)."""
    e = load(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("sum_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "q_funnel_conversion",
    oracle="""
WITH stage AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
       CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
       CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click
                THEN 1 ELSE 0 END) AS BIGINT) AS full_funnel
FROM stage
""",
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): first-touch
    timestamps per stage in ONE conditional aggregate pass (no
    self-joins — the n-stage funnel stays a single shuffle at any
    scale), then ordering predicates between stages."""
    e = load(spark, sf_dir, "events")

    def first_ts(t: str) -> F.Column:
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    stage = e.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    full = clicked & (F.col("t_purchase") > F.col("t_click"))
    return stage.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(viewed.cast("long")).alias("viewed"),
        F.sum(clicked.cast("long")).alias("clicked_after_view"),
        F.sum(full.cast("long")).alias("full_funnel"),
    )


@register(
    "q_sliding_window_events",
    oracle="""
WITH w AS (
  SELECT event_type, value, ts,
         -- make_timestamp(µs) yields a NAIVE timestamp: to_timestamp()
         -- returns TIMESTAMPTZ and the driver canonicalizer flags the
         -- tz-aware dtype against Spark's naive window start.
         unnest([
           make_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) * 1000000),
           make_timestamp((CAST(floor(epoch(ts) / 300) * 300 - 300 AS BIGINT)) * 1000000)
         ]) AS win_start
  FROM events
)
SELECT win_start, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM w
WHERE ts >= win_start AND ts < win_start + INTERVAL 10 MINUTE
GROUP BY win_start, event_type
""",
)
def q_sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) window aggregate: 10-minute windows every 5
    minutes — each event lands in exactly window_len/slide windows
    (constant fanout, like the range join's bucketing). Batch twin of
    the streaming hopping-window aggregation."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "10 minutes", "5 minutes").start.alias("win_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
    )


@register(
    "q_group_regression",
    oracle="""
WITH pts AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) - 1704067200 AS x,
         CAST(value AS DECIMAL(12,2)) AS y
  FROM events
),
stats AS (
  SELECT user_id, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM pts GROUP BY user_id HAVING COUNT(*) >= 3
)
SELECT user_id, n,
       round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 9)
         AS slope_per_sec
FROM stats
ORDER BY user_id
""",
)
def q_group_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares trend (value over time per user) from
    EXACT sufficient statistics: the four sums accumulate in
    BIGINT/DECIMAL (no float order-dependence), and only the final
    slope formula runs in double, in oracle-identical order. The
    distributed-statistics pattern: any per-group model whose
    sufficient statistics are sums fits in one aggregate pass."""
    e = load(spark, sf_dir, "events")
    x = F.col("ts").cast("timestamp").cast("long") - F.lit(1704067200)
    y = _dec("value")
    pts = e.select("user_id", x.alias("x"), y.alias("y"))
    stats = (
        pts.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
        .filter(F.col("n") >= 3)
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return stats.select(
        "user_id", "n", F.round(slope, 9).alias("slope_per_sec")
    ).orderBy("user_id")


@register(
    "sample_weighted_by_length",
    oracle=f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE {hash_pct_sql('doc_id', salt='wsample')} < least(80, n_chars // 50)
ORDER BY doc_id
""",
)
def sample_weighted_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling: inclusion probability proportional to
    document length (capped at 80%) — the token-budget subsampler that
    prefers long documents. Pure integer arithmetic on the portable
    hash (no pow/log, whose libm rounding differs across engines), so
    the draw is reproducible AND oracle-exact; still a bare scan
    predicate: no shuffle, stable under repartitioning."""
    from ripcurrent_spark.operators.sampling import hash_pct

    d = load(spark, sf_dir, "documents")
    pct_cap = F.least(F.lit(80), (F.col("n_chars") / 50).cast("long"))
    return (
        d.filter(hash_pct("doc_id", salt="wsample") < pct_cap)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "q_hourly_spikes",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS bucket, event_type, COUNT(*) AS n
  FROM events GROUP BY bucket, event_type
),
with_prev AS (
  SELECT bucket, event_type, n,
         LAG(n) OVER (PARTITION BY event_type ORDER BY bucket) AS prev_n
  FROM hourly
)
SELECT bucket, event_type, n, prev_n,
       round(CAST(n AS DOUBLE) / prev_n, 6) AS ratio
FROM with_prev
WHERE prev_n IS NOT NULL AND n * 10 > prev_n * 13
ORDER BY bucket, event_type
""",
)
def q_hourly_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-over-hour spike detection: aggregate once, lag over the
    (tiny) hourly series per type, flag >1.3x jumps. The spike
    threshold is cross-multiplied (n*10 > prev*13) so the FILTER stays
    in exact integers; only the reported ratio is float."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("event_type").orderBy("bucket")
    wp = hourly.withColumn("prev_n", F.lag("n").over(w))
    return (
        wp.filter(F.col("prev_n").isNotNull() & (F.col("n") * 10 > F.col("prev_n") * 13))
        .select(
            "bucket", "event_type", "n", "prev_n",
            F.round(F.col("n").cast("double") / F.col("prev_n"), 6).alias("ratio"),
        )
        .orderBy("bucket", "event_type")
    )


@register(
    "q_touch_attribution",
    oracle="""
WITH w AS (
  SELECT event_id, user_id, ts, event_type, value,
         LAST_VALUE(CASE WHEN event_type IN ('click', 'view') THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch,
         LAST_VALUE(CASE WHEN event_type IN ('click', 'view') THEN ts END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_ts
  FROM events
)
SELECT last_touch AS channel,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS attributed_value,
       CAST(sum(CASE WHEN epoch_ms(ts) - epoch_ms(touch_ts) <= 3600000
                THEN 1 ELSE 0 END) AS BIGINT) AS n_within_hour
FROM w
WHERE event_type = 'purchase' AND last_touch IS NOT NULL
GROUP BY last_touch
ORDER BY last_touch
""",
)
def q_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent PRECEDING click/view (classic marketing attribution — the
    as-of-join family expressed as one window). One shuffle on
    user_id; the IGNORE NULLS running last over a ROWS frame carries
    the latest touch to every later event in the partition, so no
    self-join and no per-purchase scan. Exact-decimal value sums."""
    e = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touch_type = F.last(
        F.when(F.col("event_type").isin("click", "view"), F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    touch_ts = F.last(
        F.when(F.col("event_type").isin("click", "view"), F.col("ts")),
        ignorenulls=True,
    ).over(w)
    attributed = (
        e.select("event_id", "user_id", "ts", "event_type", "value")
        .withColumn("last_touch", touch_type)
        .withColumn("touch_ts", touch_ts)
        .filter((F.col("event_type") == "purchase") & F.col("last_touch").isNotNull())
    )
    from ripcurrent_spark.functions.timeutil import epoch_expr

    ts_dtype = e.schema["ts"].dataType.simpleString()
    within = (
        epoch_expr(F.col("ts"), ts_dtype, "MILLISECOND")
        - epoch_expr(F.col("touch_ts"), ts_dtype, "MILLISECOND")
    ) <= 3_600_000
    return (
        attributed.groupBy(F.col("last_touch").alias("channel"))
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("attributed_value"),
            F.sum(F.when(within, 1).otherwise(0)).cast("long").alias("n_within_hour"),
        )
        .orderBy("channel")
    )


@register(
    "q_cumulative_users",
    oracle="""
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d FROM events GROUP BY user_id
),
per_day AS (
  SELECT d, count(*) AS new_users FROM first_seen GROUP BY d
)
SELECT CAST(d AS VARCHAR) AS day,
       CAST(new_users AS BIGINT) AS new_users,
       CAST(SUM(new_users) OVER (ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM per_day
ORDER BY d
""",
)
def q_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day. Windows can't COUNT(DISTINCT),
    so the standard rewrite: collapse to each user's FIRST day (one
    groupBy), count arrivals per day, then a running sum over the tiny
    per-day frame — the distinct-to-first-seen trick that turns an
    unsupported windowed distinct into two hash aggregates + a window
    over days, never over raw events."""
    e = load(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d")
    )
    per_day = first_seen.groupBy("d").agg(F.count("*").alias("new_users"))
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        per_day.select(
            F.col("d").cast("string").alias("day"),
            F.col("new_users").cast("long").alias("new_users"),
            F.sum("new_users").over(w).cast("long").alias("cum_users"),
        )
        .orderBy("day")
    )


@register(
    "q_retention_cohorts",
    oracle="""
WITH f AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
),
act AS (
  SELECT DISTINCT e.user_id,
         date_trunc('week', f.cohort_day) AS cohort_week,
         CAST(datediff('week', date_trunc('week', f.cohort_day),
                       date_trunc('week', CAST(e.ts AS DATE))) AS BIGINT) AS week_offset
  FROM events e JOIN f ON e.user_id = f.user_id
)
SELECT CAST(cohort_week AS VARCHAR) AS cohort_week, week_offset,
       CAST(count(*) AS BIGINT) AS n_active
FROM act
WHERE week_offset BETWEEN 0 AND 4
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
""",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, activity
    counted per week offset 0..4 — the triangle every growth dashboard
    draws. Two shuffles (first-seen groupBy; distinct (user, offset)
    which folds into the final count): the cohort map joins back
    broadcast when users fit, shuffle-hash otherwise."""
    e = load(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("cohort_day"))
    cohort_week = F.date_trunc("week", F.col("cohort_day")).cast("date")
    act = (
        e.join(f, "user_id")
        .select(
            "user_id",
            cohort_week.alias("cohort_week"),
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts").cast("date")).cast("date"),
                    cohort_week,
                )
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        act.filter(F.col("week_offset").between(0, 4))
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("long").alias("n_active"))
        .select(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            "week_offset",
            "n_active",
        )
        .orderBy("cohort_week", "week_offset")
    )


_WR_K = 100


@register(
    "sample_weighted_reservoir",
    oracle=f"""
WITH d AS (
  SELECT doc_id, lang, n_chars,
         CAST(greatest(n_chars, 1) AS DOUBLE) AS w,
         ({h32_sql('CAST(doc_id AS VARCHAR)', seed='resv')} + 1)
           / 4294967296.0 AS u
  FROM documents
),
keyed AS (SELECT doc_id, lang, n_chars, -ln(u) / w AS pri FROM d),
samp AS (SELECT doc_id, lang, n_chars FROM keyed ORDER BY pri, doc_id LIMIT {_WR_K})
SELECT * FROM samp ORDER BY doc_id
""",
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k weighted sampling WITHOUT replacement (the
    Efraimidis-Spirakis exponential-clock scheme): each doc draws a
    deterministic uniform u from the portable hash and keeps priority
    -ln(u)/w with w = n_chars — the k smallest priorities are a
    weighted sample where each draw wins with probability w_i/sum(w)
    (min of exponential clocks), i.e. long documents are
    proportionally preferred but ANY doc can win. Complements
    sample_weighted_by_length (Bernoulli inclusion, random size) with
    a fixed-size draw, and bottom-k-by-priority is mergeable, so the
    engine executes it as per-partition partial top-k
    (TakeOrderedAndProject) — no global sort, no RNG, stable under
    repartitioning and retries.

    Cross-engine determinism: u is an exact dyadic rational from the
    shared md5 hash and IEEE division is correctly rounded everywhere,
    but ln is libm (JVM Math.log and DuckDB's ln may differ in the
    last ulp). Distinct documents' priorities are random and never
    within one ulp of each other, so the SELECTED SET is stable; the
    raw priority is deliberately NOT emitted (a last-ulp difference in
    an output column would fail the value hash without changing the
    sample)."""
    from ripcurrent_spark.functions.hashing import h32

    d = load(spark, sf_dir, "documents")
    w = F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    u = (h32(F.col("doc_id").cast("string"), seed="resv") + 1) / F.lit(4294967296.0)
    keyed = d.select(
        "doc_id", "lang", "n_chars", (-F.log(u) / w).alias("pri")
    )
    return (
        keyed.orderBy("pri", "doc_id")
        .limit(_WR_K)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "q_incremental_agg_merge",
    oracle="""
SELECT o_custkey,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend,
       MAX(o_orderdate) AS last_order
FROM orders
GROUP BY o_custkey
""",
)
def q_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance, batch form: a PRIOR
    aggregate state (orders with o_orderkey % 10 <> 0 stand in for
    yesterday's materialized view) merged with a NEW batch's partial
    aggregate (% 10 = 0) — count/sum add, max folds — and the result
    must equal the from-scratch aggregate, which IS the oracle. The
    production shape for keeping a 100 TB rollup fresh: per refresh
    you scan only the new batch plus the node-sized prior state (one
    outer join on the group key), never the full history. COUNT/SUM
    merge exactly in DECIMAL; MAX is idempotent under the fold; the
    streaming twin (foreachBatch HLL/agg maintenance) lives in
    streaming/aggregates.py."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )

    def _partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("spend_dec"),
            F.max("o_orderdate").alias("last_order"),
        )

    prior = _partial(o.filter(F.col("o_orderkey") % 10 != 0))
    batch = _partial(o.filter(F.col("o_orderkey") % 10 == 0))
    p = prior.select(
        "o_custkey",
        F.col("n_orders").alias("n_p"),
        F.col("spend_dec").alias("s_p"),
        F.col("last_order").alias("l_p"),
    )
    b = batch.select(
        "o_custkey",
        F.col("n_orders").alias("n_b"),
        F.col("spend_dec").alias("s_b"),
        F.col("last_order").alias("l_b"),
    )
    zero = F.lit(0).cast("decimal(12,2)")
    merged = p.join(b, "o_custkey", "full_outer").select(
        "o_custkey",
        (F.coalesce("n_p", F.lit(0)) + F.coalesce("n_b", F.lit(0))).alias(
            "n_orders"
        ),
        (F.coalesce(F.col("s_p"), zero) + F.coalesce(F.col("s_b"), zero)).alias(
            "spend_dec"
        ),
        F.greatest(
            F.coalesce(F.col("l_p"), F.col("l_b")),
            F.coalesce(F.col("l_b"), F.col("l_p")),
        ).alias("last_order"),
    )
    return merged.select(
        "o_custkey",
        "n_orders",
        F.col("spend_dec").cast("double").alias("total_spend"),
        "last_order",
    )


_BASKET_TOP = 100  # hottest parts admitted to pair generation


@register(
    "q_basket_rules",
    oracle=f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
hot AS (
  SELECT l_partkey AS pk, COUNT(*) AS n_orders FROM li GROUP BY l_partkey
  QUALIFY ROW_NUMBER() OVER (ORDER BY n_orders DESC, pk) <= {_BASKET_TOP}
),
hli AS (
  SELECT li.l_orderkey, li.l_partkey FROM li JOIN hot ON li.l_partkey = hot.pk
),
n_orders_total AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS pair_n
  FROM hli a JOIN hli b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY part_a, part_b
)
SELECT p.part_a, p.part_b, p.pair_n,
       ha.n_orders AS n_a, hb.n_orders AS n_b,
       round(CAST(p.pair_n AS DOUBLE) / t.n, 6) AS support,
       round(CAST(p.pair_n AS DOUBLE) / ha.n_orders, 6) AS confidence,
       round(CAST(p.pair_n AS DOUBLE) * t.n
             / (CAST(ha.n_orders AS DOUBLE) * hb.n_orders), 6) AS lift
FROM pairs p
JOIN hot ha ON p.part_a = ha.pk
JOIN hot hb ON p.part_b = hb.pk
CROSS JOIN n_orders_total t
""",
)
def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (support / confidence / lift)
    for co-purchased part pairs, restricted to the 100 hottest parts
    BEFORE pair generation — the prune-then-pair discipline: the
    quadratic step only ever sees a broadcast-bounded item set, so at
    100 TB the cost is the distinct (order, part) scan plus a
    broadcast semi-prune, never an all-pairs explosion. Statistics
    are exact integer counts; support / confidence / lift are IEEE
    divisions in identical order, rounded on both engines."""
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    from pyspark.sql import Window as W

    # Mergeable exact top-100: TakeOrderedAndProject over the part
    # aggregate (which scales with SF — ~20 B parts at sf100k), not a
    # global row_number window that would sort every part in one task.
    hot = (
        li.groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "pk")
        .limit(_BASKET_TOP)
    )
    hli = li.join(
        F.broadcast(hot.select("pk")), li.l_partkey == F.col("pk")
    ).select("l_orderkey", "l_partkey")
    total = li.select(
        F.countDistinct("l_orderkey").alias("n")
    )
    a = hli.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = hli.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("pair_n"))
    )
    ha = hot.select(F.col("pk").alias("part_a"), F.col("n_orders").alias("n_a"))
    hb = hot.select(F.col("pk").alias("part_b"), F.col("n_orders").alias("n_b"))
    out = (
        pairs.join(F.broadcast(ha), "part_a")
        .join(F.broadcast(hb), "part_b")
        .crossJoin(F.broadcast(total))
    )
    pn = F.col("pair_n").cast("double")
    return out.select(
        "part_a",
        "part_b",
        "pair_n",
        "n_a",
        "n_b",
        F.round(pn / F.col("n"), 6).alias("support"),
        F.round(pn / F.col("n_a"), 6).alias("confidence"),
        F.round(
            pn * F.col("n") / (F.col("n_a").cast("double") * F.col("n_b")), 6
        ).alias("lift"),
    )


@register(
    "q_incremental_join_merge",
    oracle="""
SELECT n.n_name,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def q_incremental_join_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-VIEW maintenance: a per-nation revenue view
    over orders ⋈ customer ⋈ nation kept fresh by the delta rule for
    an append-only fact with static dims — Δ(O ⋈ C ⋈ N) = ΔO ⋈ C ⋈ N.
    The PRIOR view state (orders with o_orderkey % 10 <> 0 stand in
    for yesterday's materialized view — nation-sized, tiny) merges
    with the NEW batch's enriched partial aggregate by one full-outer
    join on the view key; counts and DECIMAL sums add. The result
    must equal the from-scratch three-way join aggregate, which IS
    the oracle. This is the join sibling of q_incremental_agg_merge:
    per refresh you join and aggregate ONLY the new batch (plus the
    view state), never re-scan the fact history — the shape that
    keeps a 100 TB star-schema rollup fresh. Customer is joined
    through the size-gated broadcast (a scaling table — shuffle-hash
    at cluster scale); nation is a fixed dim."""
    from ripcurrent_spark.operators.hints import bcast

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    def _view(odf: DataFrame) -> DataFrame:
        return (
            odf.join(bcast(c), odf.o_custkey == c.c_custkey)
            .join(bcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("rev_dec"),
            )
        )

    prior = _view(o.filter(F.col("o_orderkey") % 10 != 0)).select(
        "n_name", F.col("n_orders").alias("n_p"), F.col("rev_dec").alias("r_p")
    )
    delta = _view(o.filter(F.col("o_orderkey") % 10 == 0)).select(
        "n_name", F.col("n_orders").alias("n_b"), F.col("rev_dec").alias("r_b")
    )
    zero = F.lit(0).cast("decimal(12,2)")
    return prior.join(delta, "n_name", "full_outer").select(
        "n_name",
        (F.coalesce("n_p", F.lit(0)) + F.coalesce("n_b", F.lit(0))).alias("n_orders"),
        (F.coalesce(F.col("r_p"), zero) + F.coalesce(F.col("r_b"), zero))
        .cast("double")
        .alias("revenue"),
    )


@register(
    "q_asof_nearest",
    oracle="""
WITH cand AS (
  SELECT p.event_id AS purchase_id, c.event_id AS click_id,
         date_diff('second', c.ts, p.ts) AS gap_s,
         abs(date_diff('second', c.ts, p.ts)) AS ag,
         CAST(floor(epoch(c.ts)) AS BIGINT) AS c_ep
  FROM events p JOIN events c
    ON p.user_id = c.user_id
   AND p.event_type = 'purchase' AND c.event_type = 'click'
   AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts + INTERVAL 30 MINUTE
)
SELECT purchase_id, click_id, gap_s FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY purchase_id
                               ORDER BY ag, c_ep, click_id) AS rn
  FROM cand
) WHERE rn = 1
""",
)
def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of join (pandas merge_asof
    direction='nearest' semantics): each purchase matches its CLOSEST
    click within +/-30 min, ties to the earlier click — sensor
    fusion / attribution when causality can run either way. The
    symmetric bucketed range join (fanout-3 equi-join on
    (user, time-bucket), operators/intervals.range_join_within) bounds
    candidates; the per-purchase winner is ONE aggregate — the
    deterministic lexicographic min of (|gap|, click time, click id)
    as a struct — so no per-purchase window, and the whole query is
    two shuffles (candidate join, winner groupBy). Gaps are exact
    integer seconds on both engines."""
    from ripcurrent_spark.operators.intervals import range_join_within

    e = load(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    pairs = range_join_within(
        p, c, key="user_id", left_ts="p_ts", right_ts="c_ts", window_sec=1800
    )
    gap = epoch_seconds(pairs, "p_ts") - epoch_seconds(pairs, "c_ts")
    cand = pairs.select(
        "purchase_id",
        "click_id",
        gap.alias("gap_s"),
        F.abs(gap).alias("_ag"),
        epoch_seconds(pairs, "c_ts").alias("_cep"),
    )
    best = cand.groupBy("purchase_id").agg(
        F.min(F.struct("_ag", "_cep", "click_id", "gap_s")).alias("_w")
    )
    return best.select(
        "purchase_id", F.col("_w.click_id").alias("click_id"), F.col("_w.gap_s").alias("gap_s")
    )


# -------------------------- temperature-scaled source mixing (r8)
_TMIX_ALPHA_INV = 2  # T = 2 -> alpha = 1/T = 0.5 (sqrt: IEEE-exact on both engines)
_TMIX_TARGET = 0.25  # sample a quarter of the corpus, rebalanced


@register(
    "sample_temperature_sources",
    oracle=f"""
WITH cnt AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
tot AS (SELECT SUM(n_docs) AS n_total FROM cnt),
w AS (
  SELECT source, n_docs,
         CAST(round(sqrt(CAST(n_docs AS DOUBLE) / n_total), 9)
              AS DECIMAL(20,9)) AS w9
  FROM cnt, tot
),
z AS (SELECT SUM(w9) AS z FROM w),
stats AS (
  SELECT w.source, w.n_docs,
         CAST(w.w9 AS DOUBLE) / CAST(z.z AS DOUBLE) AS q,
         least(1.0, (CAST(w.w9 AS DOUBLE) / CAST(z.z AS DOUBLE))
                    * ({_TMIX_TARGET} * t.n_total) / w.n_docs) AS r
  FROM w, z, tot t
),
thr AS (
  SELECT source, n_docs, q, r,
         CAST(floor(r * 4294967296) AS BIGINT) AS h_thr
  FROM stats
),
sampled AS (
  SELECT d.source, COUNT(*) AS n_sampled
  FROM documents d JOIN thr ON d.source = thr.source
  WHERE {h32_sql("CAST(doc_id AS VARCHAR)", seed="tmix")} < thr.h_thr
  GROUP BY d.source
)
SELECT thr.source, CAST(thr.n_docs AS BIGINT) AS n_docs,
       round(thr.q, 6) AS mix_weight,
       round(thr.r, 6) AS accept_rate,
       CAST(COALESCE(sampled.n_sampled, 0) AS BIGINT) AS n_sampled
FROM thr LEFT JOIN sampled ON thr.source = sampled.source
""",
)
def sample_temperature_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled SOURCE mixing — the multilingual-pretraining
    sampler (XLM-R / mT5 shape): source s with corpus share p_s is
    sampled proportionally to p_s^(1/T), T={_TMIX_ALPHA_INV}, which
    UPWEIGHTS rare sources and damps dominant ones; per-source accept
    rate r_s = q_s * target_size / n_s, capped at 1 (sampling is
    without replacement, so a rare source saturates at full inclusion
    instead of oversampling). The accept decision is the repo's
    deterministic hash predicate (h32(doc_id) < floor(r_s * 2^32)) —
    no RNG, stable under repartitioning/retries, and the oracle
    recomputes the identical assignment.

    Cross-engine exactness: p_s is one IEEE division; alpha = 1/2 so
    the power is sqrt (correctly rounded on every IEEE platform —
    the reason T is fixed at 2 here; a general alpha would go through
    libm pow, whose last ulp differs across engines); the
    normalization sum runs over round(w,9) DECIMALs (order-free),
    and everything after is IEEE ops in identical order, so the
    thresholds — and therefore every per-doc accept — are
    bit-identical.

    Scale: two corpus scans (the per-source count, then the accept
    filter with the source-count-sized stats frame broadcast onto the
    scan) + aggregates over ~#sources rows. No data-scaled shuffle:
    the accept is a map-side hash compare."""
    from ripcurrent_spark.functions.hashing import h32

    d = load(spark, sf_dir, "documents")
    cnt = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = cnt.agg(F.sum("n_docs").alias("n_total"))
    w = cnt.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_total",
        F.round(F.sqrt(F.col("n_docs").cast("double") / F.col("n_total")), 9)
        .cast("decimal(20,9)")
        .alias("w9"),
    )
    z = w.agg(F.sum("w9").alias("z"))
    q = F.col("w9").cast("double") / F.col("z").cast("double")
    r = F.least(
        F.lit(1.0),
        q * (F.lit(_TMIX_TARGET) * F.col("n_total")) / F.col("n_docs"),
    )
    thr = w.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        q.alias("q"),
        r.alias("r"),
        F.floor(r * F.lit(4294967296.0)).cast("long").alias("h_thr"),
    )
    sampled = (
        d.select("doc_id", "source")
        .join(F.broadcast(thr.select("source", "h_thr")), "source")
        .filter(h32(F.col("doc_id").cast("string"), seed="tmix") < F.col("h_thr"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return (
        thr.join(sampled, "source", "left")
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round("q", 6).alias("mix_weight"),
            F.round("r", 6).alias("accept_rate"),
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
        )
    )


# T=3 fixed-point scale: w = icbrt(n_docs * 10^27) = floor(10^9 * cbrt(n_docs)).
_TMIX3_K = "1000000000000000000000000000"  # 10^27 (> int64, ships as DECIMAL/HUGEINT text)

# DuckDB twin of the exact integer cube root: libm estimate, then a
# +-2 integer correction that makes the result independent of cbrt's
# last-ulp behavior (see sample_temperature_t3 docstring).
_ICBRT_SQL = f"""
CASE WHEN (_k0+2)*(_k0+2)*(_k0+2) <= _m THEN _k0+2
     WHEN (_k0+1)*(_k0+1)*(_k0+1) <= _m THEN _k0+1
     WHEN _k0*_k0*_k0 <= _m THEN _k0
     WHEN (_k0-1)*(_k0-1)*(_k0-1) <= _m THEN _k0-1
     ELSE _k0-2 END
"""


@register(
    "sample_temperature_t3",
    oracle=f"""
WITH cnt AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
tot AS (SELECT SUM(n_docs) AS n_total FROM cnt),
mw AS (
  SELECT source, n_docs,
         CAST(n_docs AS HUGEINT) * {_TMIX3_K}::HUGEINT AS _m
  FROM cnt
),
kw AS (
  SELECT source, n_docs, _m,
         CAST(floor(cbrt(CAST(_m AS DOUBLE))) AS HUGEINT) AS _k0
  FROM mw
),
w AS (
  SELECT source, n_docs, CAST(({_ICBRT_SQL}) AS BIGINT) AS w3
  FROM kw
),
z AS (SELECT SUM(w3) AS z FROM w),
stats AS (
  SELECT w.source, w.n_docs,
         CAST(w.w3 AS DOUBLE) / CAST(z.z AS DOUBLE) AS q,
         least(1.0, (CAST(w.w3 AS DOUBLE) / CAST(z.z AS DOUBLE))
                    * ({_TMIX_TARGET} * t.n_total) / w.n_docs) AS r
  FROM w, z, tot t
),
thr AS (
  SELECT source, n_docs, q, r,
         CAST(floor(r * 4294967296) AS BIGINT) AS h_thr
  FROM stats
),
sampled AS (
  SELECT d.source, COUNT(*) AS n_sampled
  FROM documents d JOIN thr ON d.source = thr.source
  WHERE {h32_sql("CAST(doc_id AS VARCHAR)", seed="tmix3")} < thr.h_thr
  GROUP BY d.source
)
SELECT thr.source, CAST(thr.n_docs AS BIGINT) AS n_docs,
       round(thr.q, 6) AS mix_weight,
       round(thr.r, 6) AS accept_rate,
       CAST(COALESCE(sampled.n_sampled, 0) AS BIGINT) AS n_sampled
FROM thr LEFT JOIN sampled ON thr.source = sampled.source
""",
)
def sample_temperature_t3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing at T=3 — the ODD-temperature
    companion to sample_temperature_sources (T=2), proving arbitrary
    temperatures stay ORACLE-EXACT in-plan (VERDICT r8 #5). T=2 got
    exactness for free because sqrt is correctly rounded everywhere;
    a general p^(1/T) goes through libm pow/cbrt whose last ulp
    differs across engines. Two moves close that gap:

    1. **Normalization cancels n_total**: q_s = cbrt(p_s)/sum cbrt(p_j)
       = cbrt(n_s)/sum cbrt(n_j), so the weight needs no division at
       all — only the cube root of an integer.
    2. **Exact integer cube root**: w_s = floor(cbrt(n_s * 10^27))
       (= floor(10^9 * cbrt(n_s)), a 10-significant-digit fixed-point
       weight). The libm cbrt over the DOUBLE image of n_s*10^27 is
       only an ESTIMATE (off by <= 1 after floor: double conversion
       loses 2^-53 relative, cbrt <= 1 ulp on both JVM and C libm —
       combined absolute error ~2e-4 on a <= 4.7e11 result); a +-2
       integer-cube comparison window then snaps BOTH engines to the
       one true floor, making w_s engine-independent by construction.
       Integer cubes run in DECIMAL(38,0)/HUGEINT — (k+2)^3 <= 1.1e35
       fits both.

    Everything downstream mirrors the T=2 query: z = sum w (exact
    integer), q = w/z (one IEEE division), accept rate
    r = min(1, q * target * n_total / n) in identical operation
    order, per-doc accept = deterministic h32(doc_id) < floor(r*2^32)
    (seed 'tmix3') — no RNG, map-side compare, no data-scaled
    shuffle. For temperatures beyond 2 and 3 the same discipline
    generalizes (floor(n^(d/T) * 10^k) with an integer-power
    correction window); the control-plane variant
    (operators/sampling.temperature_mix_plan) stays the any-REAL-T
    escape hatch."""
    from ripcurrent_spark.functions.hashing import h32

    d = load(spark, sf_dir, "documents")
    cnt = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = cnt.agg(F.sum("n_docs").alias("n_total"))
    m = (
        F.col("n_docs").cast("decimal(10,0)")
        * F.expr(f"CAST({_TMIX3_K} AS DECIMAL(28,0))")
    ).alias("_m")
    kw = cnt.select("source", "n_docs", m).select(
        "source",
        "n_docs",
        "_m",
        F.floor(F.cbrt(F.col("_m").cast("double"))).cast("long").alias("_k0"),
    )
    # exact icbrt: largest c in [k0-2, k0+2] with c^3 <= m
    def _cube_le(c):
        cd = c.cast("decimal(13,0)")
        return (cd * cd * cd) <= F.col("_m")

    k0 = F.col("_k0")
    w3 = (
        F.when(_cube_le(k0 + 2), k0 + 2)
        .when(_cube_le(k0 + 1), k0 + 1)
        .when(_cube_le(k0), k0)
        .when(_cube_le(k0 - 1), k0 - 1)
        .otherwise(k0 - 2)
    )
    w = kw.select("source", "n_docs", w3.cast("long").alias("w3"))
    z = w.agg(F.sum("w3").alias("z"))
    q = F.col("w3").cast("double") / F.col("z").cast("double")
    r = F.least(
        F.lit(1.0),
        q * (F.lit(_TMIX_TARGET) * F.col("n_total")) / F.col("n_docs"),
    )
    thr = w.crossJoin(F.broadcast(z)).crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        q.alias("q"),
        r.alias("r"),
        F.floor(r * F.lit(4294967296.0)).cast("long").alias("h_thr"),
    )
    sampled = (
        d.select("doc_id", "source")
        .join(F.broadcast(thr.select("source", "h_thr")), "source")
        .filter(h32(F.col("doc_id").cast("string"), seed="tmix3") < F.col("h_thr"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return (
        thr.join(sampled, "source", "left")
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round("q", 6).alias("mix_weight"),
            F.round("r", 6).alias("accept_rate"),
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
        )
    )
