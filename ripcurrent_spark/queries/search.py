"""Retrieval + robust-statistics operators: BM25 relevance scoring,
character-entropy quality signal, a mergeable Bloom-filter membership
sketch, and median/MAD robust outlier detection.

These extend the training-data-pipeline surface (corpus search,
quality filtering, fast membership tests, robust anomaly cuts) with
the same discipline as the rest of the registry: exact DuckDB oracles,
deterministic arithmetic (identical operand ORDER on both engines so
IEEE doubles match bit-for-bit), no Python in the hot path.

Scale posture (100 TB):
- BM25: corpus stats (N, df, Σdl) collapse to ONE row broadcast back;
  per-doc scoring is a scan-side expression — one small agg + one
  scan, no joins on the big side.
- Char entropy: zero-shuffle scan expression (fixed-alphabet counts
  via length-difference, folded in alphabet order).
- Bloom: per-partition partial agg collapses to <= 32 words/partition;
  the groupBy IS the sketch merge (same shape as the count-min
  sketch). Probes join against 32 broadcast rows.
- MAD: exact percentile needs per-group sort; at 100 TB swap
  percentile -> approx_percentile per group (same plan shape), or
  pre-bucket values (the histogram operator) and interpolate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ripcurrent_spark.functions.hashing import h32, h32_sql
from ripcurrent_spark.io import load
from ripcurrent_spark.operators.dedup import tokens, tokens_sql
from ripcurrent_spark.queries import register

# ------------------------------------------------------------------ BM25
# Counting/stats/scoring live in operators/retrieval.py (r11), shared
# VERBATIM with the streaming corpus-stats maintainer
# (streaming/docstats.py) so streamed-stats scores equal this batch
# path exactly.
from ripcurrent_spark.operators.retrieval import B, K1  # noqa: E402

QUERY_TERMS = ("spark", "join", "stream")


# Shared by text_bm25_search and search_rrf_fusion (which re-ranks
# this exact top-100).
_BM25_CTES = f"""t AS (
  SELECT doc_id,
         len({tokens_sql('text')}) AS dl,
         len(list_filter({tokens_sql('text')}, x -> x = '{QUERY_TERMS[0]}')) AS tf0,
         len(list_filter({tokens_sql('text')}, x -> x = '{QUERY_TERMS[1]}')) AS tf1,
         len(list_filter({tokens_sql('text')}, x -> x = '{QUERY_TERMS[2]}')) AS tf2
  FROM documents
),
s AS (
  SELECT count(*) AS n,
         sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
         sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
         sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2,
         sum(dl) AS sumdl
  FROM t
),
scored AS (
  SELECT doc_id, dl, tf0, tf1, tf2,
         round(
           ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0)
             * (tf0 * ({K1} + 1.0))
             / (tf0 + {K1} * (1.0 - {B} + {B} * dl / (CAST(sumdl AS DOUBLE) / n)))
         + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0)
             * (tf1 * ({K1} + 1.0))
             / (tf1 + {K1} * (1.0 - {B} + {B} * dl / (CAST(sumdl AS DOUBLE) / n)))
         + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0)
             * (tf2 * ({K1} + 1.0))
             / (tf2 + {K1} * (1.0 - {B} + {B} * dl / (CAST(sumdl AS DOUBLE) / n)))
         , 6) AS bm25
  FROM t, s
)"""


@register(
    "text_bm25_search",
    oracle=f"""
WITH {_BM25_CTES}
SELECT doc_id, CAST(dl AS BIGINT) AS dl,
       CAST(tf0 + tf1 + tf2 AS BIGINT) AS tf_total, bm25
FROM scored WHERE bm25 > 0
ORDER BY bm25 DESC, doc_id LIMIT 100
""",
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25(k1=1.2, b=0.75) of a fixed 3-term query over `documents`.

    Corpus stats (N, per-term df, Σdl) reduce to one row that is
    broadcast back onto the scan (crossJoin of a 1-row frame); the
    summation over query terms is written out in fixed term order so
    the IEEE result matches the oracle bit-for-bit. Counting
    (vectorized Arrow pass — per-doc term counts are INTEGERS, so
    vectorizing them cannot touch float parity), the stats row, and
    the scoring fold are the shared operators/retrieval.py functions
    — the SAME code the streaming corpus-stats maintainer
    (streaming/docstats.py) runs, so scoring against a streamed stats
    snapshot equals this batch run exactly.
    """
    from ripcurrent_spark.operators import retrieval as RT

    d = load(spark, sf_dir, "documents")
    t = RT.term_counts(
        d.select("doc_id", tokens("text").alias("toks")), QUERY_TERMS
    )
    stats = RT.corpus_stats(t, len(QUERY_TERMS))
    return RT.bm25_topk(t, stats, len(QUERY_TERMS), k=100)


# ------------------------------------------------------------- TF-IDF
_TFIDF_TOPK = 3


@register(
    "text_tfidf_topk",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({tokens_sql('text')}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM toks WHERE term <> '' GROUP BY doc_id, term
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         round(t.tf * ln((n.n + 1.0) / (d.df + 1.0)), 6) AS tfidf
  FROM tf t JOIN df d ON t.term = d.term, n
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, tfidf
FROM scored
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) <= {_TFIDF_TOPK}
ORDER BY doc_id, tfidf DESC, term
""",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 terms by TF-IDF (idf = ln((N+1)/(df+1))) —
    the keyword-extraction half of retrieval next to BM25's scoring
    half.

    One explode + (doc, term) groupBy builds term frequencies; document
    frequencies re-aggregate that result (no second corpus scan) and
    join back on term. The synthetic corpus has a bounded vocabulary so
    the df side is broadcast; at web-corpus vocabulary sizes the same
    plan runs as a shuffle join on term with the key-skew profiler
    deciding when to salt hot terms.
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens("text")).alias("term")).filter(
        F.col("term") != ""
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.count()  # single scalar; avoids a 1-row crossJoin in the plan
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        F.col("tf").cast("long").alias("tf"),
        F.col("df").cast("long").alias("df"),
        F.round(
            F.col("tf") * F.log((F.lit(float(n)) + 1.0) / (F.col("df") + 1.0)), 6
        ).alias("tfidf"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TFIDF_TOPK)
        .drop("rn")
        .orderBy("doc_id", F.desc("tfidf"), "term")
    )


# ------------------------------------------------------ character entropy
_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 "


def _norm_sql(expr: str) -> str:
    return f"trim(regexp_replace(lower({expr}), '[^a-z0-9]+', ' ', 'g'))"


def _entropy_terms_sql() -> str:
    # Σ c*ln(c) over the fixed alphabet, in alphabet order (deterministic
    # operand order => bit-identical doubles on both engines).
    parts = []
    for ch in _ALPHABET:
        lit = "' '" if ch == " " else f"'{ch}'"
        cnt = f"(length(t) - length(replace(t, {lit}, '')))"
        parts.append(f"(CASE WHEN {cnt} > 0 THEN {cnt} * ln({cnt}) ELSE 0.0 END)")
    return " + ".join(parts)


@register(
    "text_char_entropy",
    oracle=f"""
WITH t AS (SELECT doc_id, {_norm_sql('text')} AS t FROM documents)
SELECT doc_id,
       CAST(length(t) AS BIGINT) AS n_chars_norm,
       round(CASE WHEN length(t) = 0 THEN 0.0
             ELSE (ln(length(t)) - ({_entropy_terms_sql()}) / length(t)) / ln(2.0)
             END, 6) AS entropy_bits
FROM t
""",
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon character entropy (bits/char) of the normalized text —
    a cheap perplexity proxy for corpus quality cuts (gibberish and
    boilerplate sit at the tails).

    Zero-shuffle: per-character counts come from length differences
    against a FIXED 37-symbol alphabet (no explode/groupBy), and
    H = ln(n) - (Σ c·ln c)/n is folded in alphabet order.
    """
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " ")).alias("t"),
    )
    n = F.length("t")
    terms: Column = F.lit(0.0)
    for ch in _ALPHABET:
        cnt = n - F.length(F.replace(F.col("t"), F.lit(ch), F.lit("")))
        terms = terms + F.when(cnt > 0, cnt * F.log(cnt.cast("double"))).otherwise(0.0)
    entropy = F.when(n == 0, 0.0).otherwise(
        (F.log(n.cast("double")) - terms / n) / F.lit(float(__import__("math").log(2.0)))
    )
    return t.select(
        "doc_id",
        n.cast("long").alias("n_chars_norm"),
        F.round(entropy, 6).alias("entropy_bits"),
    )


# ------------------------------------------------------------ Bloom filter
_BLOOM_BITS = 1024
_BLOOM_WORD = 32  # bits per word: masks stay well under 2^63
_BLOOM_K = 3
_PROBES = (
    "Customer#000000001",
    "Customer#000000002",
    "Customer#000000007",
    "no-such-customer-a",
    "no-such-customer-b",
    "no-such-customer-c",
)


def _bloom_build_sql() -> str:
    """32 (word_idx, word_bits) rows for rich customers (acctbal>9000)."""
    pos = lambda j: f"({h32_sql('c_name', f'bloom{j}')} % {_BLOOM_BITS})"  # noqa: E731
    unions = " UNION ALL ".join(
        f"SELECT {pos(j)} // {_BLOOM_WORD} AS word_idx, "
        f"CAST(1 AS BIGINT) << ({pos(j)} % {_BLOOM_WORD}) AS mask "
        f"FROM customer WHERE c_acctbal > 9000"
        for j in range(_BLOOM_K)
    )
    return f"SELECT word_idx, bit_or(mask) AS word_bits FROM ({unions}) GROUP BY word_idx"


@register(
    "q_bloom_membership",
    oracle=f"""
WITH words AS ({_bloom_build_sql()}),
probes AS (
  SELECT * FROM (VALUES {", ".join(f"('{p}')" for p in _PROBES)}) v(probe_key)
),
probe_bits AS (
  SELECT p.probe_key, j.j,
         (CAST('0x' || substr(md5(concat('bloom' || j.j || ':', p.probe_key)), 1, 8) AS BIGINT)
           % {_BLOOM_BITS}) AS pos
  FROM probes p, (SELECT * FROM range({_BLOOM_K}) t(j)) j
),
hits AS (
  SELECT pb.probe_key,
         min(CASE WHEN coalesce(w.word_bits, 0) & (CAST(1 AS BIGINT) << (pb.pos % {_BLOOM_WORD})) != 0
             THEN 1 ELSE 0 END) AS all_set
  FROM probe_bits pb LEFT JOIN words w ON w.word_idx = pb.pos // {_BLOOM_WORD}
  GROUP BY pb.probe_key
),
truth AS (
  SELECT p.probe_key,
         CASE WHEN EXISTS (SELECT 1 FROM customer c
                           WHERE c.c_name = p.probe_key AND c.c_acctbal > 9000)
              THEN 1 ELSE 0 END AS actual
  FROM probes p
)
SELECT h.probe_key, CAST(h.all_set AS INT) AS bloom_hit, CAST(t.actual AS INT) AS actual,
       (SELECT CAST(sum(bit_count(word_bits)) AS BIGINT) FROM words) AS n_set_bits
FROM hits h JOIN truth t ON h.probe_key = t.probe_key
ORDER BY h.probe_key
""",
)
def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable Bloom-filter membership sketch over a selective key set
    (customers with acctbal > 9000), then probe 6 fixed keys.

    Build: each key emits k=3 (word_idx, bit-mask) pairs; partial
    bit_or collapses every partition to <= 32 cells, and the final
    groupBy(word_idx).bit_or IS the sketch merge — the same mergeable-
    sketch shape as the count-min operator, so two corpora's filters
    union by OR-ing 32 words. Probes check all k positions against the
    32 broadcast words. md5-derived positions make build and probe
    bit-identical on both engines (no false-positive drift).
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    builds = []
    for j in range(_BLOOM_K):
        pos = h32("c_name", seed=f"bloom{j}") % _BLOOM_BITS
        # mask = 1 << (pos % 32); pow is exact for exponents <= 31 and
        # avoids shiftleft's literal-only shift argument.
        builds.append(
            c.select(
                (pos / _BLOOM_WORD).cast("long").alias("word_idx"),
                F.pow(F.lit(2.0), (pos % _BLOOM_WORD).cast("double")).cast("long").alias("mask"),
            )
        )
    all_bits = builds[0]
    for b in builds[1:]:
        all_bits = all_bits.unionAll(b)
    words = all_bits.groupBy("word_idx").agg(F.bit_or("mask").alias("word_bits"))

    probes = spark.createDataFrame([(p,) for p in _PROBES], "probe_key string")
    js = spark.range(_BLOOM_K).select(F.col("id").cast("int").alias("j"))
    probe_bits = probes.crossJoin(js).select(
        "probe_key",
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("bloom"), F.col("j"), F.lit(":"), F.col("probe_key"))), 1, 8),
                16,
                10,
            ).cast("long")
            % _BLOOM_BITS
        ).alias("pos"),
    )
    hits = (
        probe_bits.join(
            F.broadcast(words),
            (F.col("pos") / _BLOOM_WORD).cast("long") == F.col("word_idx"),
            "left",
        )
        .select(
            "probe_key",
            F.when(
                F.coalesce(F.col("word_bits"), F.lit(0)).bitwiseAND(
                    F.pow(F.lit(2.0), (F.col("pos") % _BLOOM_WORD).cast("double")).cast("long")
                )
                != 0,
                1,
            )
            .otherwise(0)
            .alias("set_j"),
        )
        .groupBy("probe_key")
        .agg(F.min("set_j").alias("all_set"))
    )
    truth = probes.join(
        c.select(F.col("c_name").alias("probe_key")).distinct(), "probe_key", "left_semi"
    ).withColumn("actual", F.lit(1))
    truth = probes.join(truth, "probe_key", "left").select(
        "probe_key", F.coalesce("actual", F.lit(0)).alias("actual")
    )
    n_set = words.agg(F.sum(F.bit_count("word_bits")).cast("long").alias("n_set_bits"))
    return (
        hits.join(truth, "probe_key")
        .crossJoin(F.broadcast(n_set))
        .select(
            "probe_key",
            F.col("all_set").cast("int").alias("bloom_hit"),
            F.col("actual").cast("int").alias("actual"),
            "n_set_bits",
        )
        .orderBy("probe_key")
    )


# ----------------------------------------------------------- median / MAD
_MAD_K = 4096


def _mad_samp_sql() -> str:
    from ripcurrent_spark.operators.sketches import grouped_bottomk_sql

    return grouped_bottomk_sql(
        "c",
        ["c_mktsegment"],
        h32_sql("CAST(c_custkey AS VARCHAR)", seed="mad"),
        ["c_custkey"],
        _MAD_K,
    )


@register(
    "q_mad_outliers",
    oracle=f"""
WITH c AS (
  SELECT c_mktsegment, CAST(c_acctbal AS DOUBLE) AS bal, c_custkey FROM customer
),
samp AS ({_mad_samp_sql()}),
med AS (
  SELECT c_mktsegment, quantile_cont(bal, 0.5) AS med FROM samp GROUP BY c_mktsegment
),
mad AS (
  SELECT s.c_mktsegment, any_value(m.med) AS med,
         quantile_cont(abs(s.bal - m.med), 0.5) AS mad
  FROM samp s JOIN med m USING (c_mktsegment) GROUP BY s.c_mktsegment
)
SELECT c.c_mktsegment, m.med, m.mad,
       CAST(sum(CASE WHEN abs(c.bal - m.med) > 3 * 1.4826 * m.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(count(*) AS BIGINT) AS n_rows
FROM c JOIN mad m USING (c_mktsegment)
GROUP BY c.c_mktsegment, m.med, m.mad
ORDER BY c.c_mktsegment
""",
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier counts via median/MAD (3-sigma
    equivalent: |x - med| > 3 * 1.4826 * MAD).

    100 TB-safe (r5): pre-r5 this ran TWO exact per-group percentile
    passes — 5 market segments means 1/5 of the customer column per
    aggregation buffer, an executor OOM at scale. Both medians now
    come from ONE mergeable per-group bottom-k (KMV) sample
    (operators/sketches.py: sharded two-phase window, parallelism
    groups x shards, no full-group buffer): a uniform sample of the
    group is also a uniform sample of its |x - med| deviations, so
    the same k rows estimate med AND mad. The full scan then only
    counts outliers against the broadcast 5-row stats. The sample is
    drawn by the portable md5 priority, so the DuckDB oracle draws
    the IDENTICAL sample and the value-hash checks the estimates
    themselves (percentile == quantile_cont bit-identical, proven by
    q_exact_quantiles); n_outliers/n_rows stay exact over the full
    scan with a bit-identical threshold.
    """
    from ripcurrent_spark.functions.hashing import h32
    from ripcurrent_spark.operators.sketches import grouped_bottomk

    cust = load(spark, sf_dir, "customer").select(
        "c_mktsegment", F.col("c_acctbal").cast("double").alias("bal"), "c_custkey"
    )
    samp = grouped_bottomk(
        cust,
        ["c_mktsegment"],
        h32(F.col("c_custkey").cast("string"), seed="mad"),
        ["c_custkey"],
        _MAD_K,
    )
    med = samp.groupBy("c_mktsegment").agg(
        F.percentile("bal", F.lit(0.5)).alias("med")
    )
    mad = (
        samp.join(F.broadcast(med), "c_mktsegment")
        .groupBy("c_mktsegment")
        .agg(
            F.first("med").alias("med"),
            F.percentile(F.abs(F.col("bal") - F.col("med")), F.lit(0.5)).alias("mad"),
        )
    )
    return (
        cust.join(F.broadcast(mad), "c_mktsegment")
        .groupBy("c_mktsegment", "med", "mad")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("bal") - F.col("med")) > 3 * 1.4826 * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .select(
            # no rounding: the interpolated medians are bit-identical
            # doubles on both engines, and round(x, 2) is NOT (Spark
            # rounds the decimal rendering, DuckDB the binary value —
            # they disagree on .885-style midpoints).
            "c_mktsegment",
            "med",
            "mad",
            "n_outliers",
            "n_rows",
        )
        .orderBy("c_mktsegment")
    )


# ----------------------------------------------------------- phrase search
_PHRASE = ("spark", "join")


@register(
    "text_phrase_search",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {tokens_sql('text')} AS t FROM documents
),
post AS (
  SELECT doc_id, unnest(t) AS term, unnest(range(len(t))) AS pos
  FROM toks
),
a AS (SELECT doc_id, pos FROM post WHERE term = '{_PHRASE[0]}'),
b AS (SELECT doc_id, pos FROM post WHERE term = '{_PHRASE[1]}')
SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(min(a.pos) AS BIGINT) AS first_pos
FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
GROUP BY a.doc_id
ORDER BY a.doc_id
""",
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ('spark join') over a POSITIONAL inverted
    index: posexplode builds (doc, pos, term) postings, the phrase is
    an equi-join of the two term posting lists on (doc, adjacent pos).

    This is the index-shaped plan a 100 TB corpus wants: postings for
    the two query terms are FILTERED OUT OF THE SCAN (predicate on
    term — a tiny fraction of the corpus), and the adjacency check is
    an equi-join on (doc_id, pos), never a scan of full documents.
    With a materialized postings table the same plan is two index
    lookups + a merge join; hot stop-words cap like LSH band keys.
    """
    d = load(spark, sf_dir, "documents")
    post = d.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "term")
    )
    a = post.filter(F.col("term") == _PHRASE[0]).select(
        "doc_id", F.col("pos").alias("pos_a")
    )
    b = post.filter(F.col("term") == _PHRASE[1]).select(
        "doc_id", F.col("pos").alias("pos_b")
    )
    return (
        a.join(b, (a.doc_id == b.doc_id) & (F.col("pos_b") == F.col("pos_a") + 1))
        .drop(b.doc_id)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.min("pos_a").cast("long").alias("first_pos"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------- hybrid retrieval (RRF)
from ripcurrent_spark.operators.similarity import unit_sql as _unit_sql  # noqa: E402

_RRF_K = 60  # the standard reciprocal-rank-fusion constant
_RRF_TOP = 100


@register(
    "search_rrf_fusion",
    oracle=f"""
WITH {_BM25_CTES},
top AS (
  SELECT doc_id, bm25 FROM scored WHERE bm25 > 0
  ORDER BY bm25 DESC, doc_id LIMIT {_RRF_TOP}
),
bm AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS bm25_rank
  FROM top
),
v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
),
u AS (SELECT vec_id, {{unit}} AS emb FROM v),
q AS (SELECT * FROM u WHERE vec_id = 0),
cs AS (
  SELECT c.vec_id AS doc_id,
         list_sum(list_transform(range(1, len(q.emb)+1), i -> q.emb[i] * c.emb[i]))
           AS cos_raw
  FROM q JOIN u c ON c.vec_id <> q.vec_id
),
cr AS (
  SELECT doc_id, cos_rank FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY cos_raw DESC, doc_id) AS cos_rank
    FROM cs
  ) WHERE cos_rank <= {_RRF_TOP}
),
f AS (
  SELECT COALESCE(bm.doc_id, cr.doc_id) AS doc_id,
         bm.bm25_rank, cr.cos_rank,
         COALESCE(1.0 / ({_RRF_K} + bm.bm25_rank), 0.0)
       + COALESCE(1.0 / ({_RRF_K} + cr.cos_rank), 0.0) AS rrf
  FROM bm FULL JOIN cr ON bm.doc_id = cr.doc_id
)
SELECT doc_id,
       CAST(bm25_rank AS BIGINT) AS bm25_rank,
       CAST(cos_rank AS BIGINT) AS cos_rank,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT)
         AS fused_rank,
       round(rrf, 6) AS rrf_score
FROM f
""".replace("{unit}", _unit_sql("emb")),
)
def search_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID retrieval via reciprocal-rank fusion (Cormack et al.
    2009, the standard k={_RRF_K} form): fuse a LEXICAL ranker (the
    BM25 top-{_RRF_TOP} over the fixed 3-term query) with a VECTOR
    ranker (exact cosine top-{_RRF_TOP} against query vector
    vec_id=0) into one ranking — score(d) = sum over rankers of
    1/(k + rank_r(d)), missing-from-a-ranker contributing 0. RRF is
    what production search stacks actually run between the two
    retrievers and the reranker: it needs no score calibration
    (ranks only), so a BM25 logit and a cosine live on the same
    scale by construction.

    Scale: each ranker is its own already-proven shape (BM25 = one
    broadcast stats row onto a map-only scan + TakeOrdered;
    brute-force cosine = Arrow matmul with per-batch local top-k) —
    fusion itself touches two {_RRF_TOP}-row frames: one broadcast
    full-outer join and a {_RRF_TOP * 2}-row window. Determinism:
    ranks are integers from (score DESC, id) orderings, the
    reciprocal terms are IEEE divisions of exact integers summed in
    fixed ranker order, so the fused ranking is bit-stable across
    engines without any score calibration."""
    from pyspark.sql import Window as W

    from ripcurrent_spark.operators import similarity as SIM

    bm = text_bm25_search(spark, sf_dir)
    wb = W.orderBy(F.desc("bm25"), "doc_id")
    bmr = bm.select("doc_id", "bm25").withColumn(
        "bm25_rank", F.row_number().over(wb)
    ).select("doc_id", "bm25_rank")

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", SIM.as_double("embedding").alias("emb")
    )
    q = e.filter(F.col("vec_id") == 0)
    cosr = SIM.brute_force_topk_np(q, e, k=_RRF_TOP).select(
        F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("cos_rank")
    )

    f = bmr.join(cosr, "doc_id", "full_outer")
    rrf = F.coalesce(F.lit(1.0) / (_RRF_K + F.col("bm25_rank")), F.lit(0.0)) + F.coalesce(
        F.lit(1.0) / (_RRF_K + F.col("cos_rank")), F.lit(0.0)
    )
    wf = W.orderBy(F.desc("rrf"), "doc_id")
    return (
        f.withColumn("rrf", rrf)
        .select(
            "doc_id",
            F.col("bm25_rank").cast("long").alias("bm25_rank"),
            F.col("cos_rank").cast("long").alias("cos_rank"),
            F.row_number().over(wf).cast("long").alias("fused_rank"),
            F.round("rrf", 6).alias("rrf_score"),
        )
    )
