"""Text-analysis queries over `documents`: language ID, quality
scoring, token counts, fingerprints. Single-scan Column pipelines."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ripcurrent_spark.io import load
from ripcurrent_spark.operators import text as TX
from ripcurrent_spark.operators.dedup import norm_text, norm_text_sql, tokens, tokens_sql
from ripcurrent_spark.queries import register

_TOKS = tokens_sql("text")
_HITS_SQL = {lang: TX.stopword_hits_sql("toks", lang) for lang in TX.LANGS}


@register(
    "text_lang_id",
    oracle=f"""
WITH t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents)
SELECT doc_id, lang AS labeled_lang,
       {TX.predict_lang_sql(_HITS_SQL)} AS predicted_lang,
       {_HITS_SQL['en']} AS en_hits,
       {_HITS_SQL['de']} AS de_hits
FROM t
""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-dictionary language ID (n-gram heuristic): most hits
    wins, alphabetical tie-break."""
    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", F.col("lang").alias("labeled_lang"), tokens("text").alias("toks"))
    hits = {lang: TX.stopword_hits(F.col("toks"), lang) for lang in TX.LANGS}
    return t.select(
        "doc_id",
        "labeled_lang",
        TX.predict_lang(hits).alias("predicted_lang"),
        hits["en"].alias("en_hits"),
        hits["de"].alias("de_hits"),
    )


@register(
    "text_quality_score",
    oracle=f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
SELECT doc_id,
       length(text) AS n_chars,
       len(toks) AS n_tokens,
       {TX.punct_ratio_sql('text')} AS punct_ratio,
       round(CAST({_HITS_SQL['en']} AS DOUBLE) / greatest(len(toks), 1), 6) AS stopword_ratio,
       round(0.4 * least(CAST(len(toks) AS DOUBLE) / 100, 1.0)
           + 0.3 * (1 - {TX.punct_ratio_sql('text')})
           + 0.3 * (CAST({_HITS_SQL['en']} AS DOUBLE) / greatest(len(toks), 1)), 6) AS quality_score
FROM t
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality heuristics: length, punctuation ratio,
    stopword ratio, combined score (double math, identical op order
    on both engines)."""
    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", "text", tokens("text").alias("toks"))
    n_tokens = F.size("toks")
    en_hits = TX.stopword_hits(F.col("toks"), "en")
    pr = TX.punct_ratio("text")
    stop_ratio = F.round(en_hits.cast("double") / F.greatest(n_tokens, F.lit(1)), 6)
    score = F.round(
        0.4 * F.least(n_tokens.cast("double") / 100, F.lit(1.0))
        + 0.3 * (1 - pr)
        + 0.3 * (en_hits.cast("double") / F.greatest(n_tokens, F.lit(1))),
        6,
    )
    return t.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        pr.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


@register(
    "text_token_counts",
    oracle=f"""
SELECT doc_id,
       len({_TOKS}) AS n_ws_tokens,
       length(regexp_extract_all(text, '{TX.BPE_PATTERN}')) AS n_bpe_tokens
FROM documents
""",
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens
    (letter runs / digits / symbols)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(tokens("text")).alias("n_ws_tokens"),
        F.regexp_count("text", F.lit(TX.BPE_PATTERN)).alias("n_bpe_tokens"),
    )


@register(
    "text_fingerprint",
    oracle=f"""
SELECT doc_id,
       md5({norm_text_sql('text')}) AS content_md5,
       {TX.bag_fingerprint_sql('text')} AS bag_fp
FROM documents
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: exact content md5 + order-insensitive
    token-bag hash."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(norm_text("text")).alias("content_md5"),
        TX.bag_fingerprint("text").alias("bag_fp"),
    )


_CHUNK, _STRIDE = 50, 40  # tokens per chunk / stride (overlap 10)


@register(
    "text_chunk_documents",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
chunks AS (
  SELECT doc_id,
         unnest(range(0, greatest(len(toks) - {_CHUNK - _STRIDE}, 1), {_STRIDE})) AS start_tok,
         toks
  FROM t
)
SELECT doc_id,
       CAST(start_tok / {_STRIDE} AS BIGINT) AS chunk_no,
       array_to_string(list_slice(toks, start_tok + 1, start_tok + {_CHUNK}), ' ') AS chunk_text,
       least(len(toks) - start_tok, {_CHUNK}) AS n_tokens
FROM chunks
""",
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: 50-token chunks, stride 40 (overlap
    10) — the context-window prep step. Tokens are projected once;
    chunk starts are a generated sequence exploded into rows (pure
    codegen; at scale this is a narrow op — no shuffle)."""
    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", tokens("text").alias("toks"))
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("toks") - (_CHUNK - _STRIDE) - 1, F.lit(0)),
        F.lit(_STRIDE),
    )
    ch = t.select("doc_id", "toks", F.explode(starts).alias("start_tok"))
    return ch.select(
        "doc_id",
        (F.col("start_tok") / _STRIDE).cast("long").alias("chunk_no"),
        F.concat_ws(" ", F.slice("toks", F.col("start_tok") + 1, _CHUNK)).alias("chunk_text"),
        F.least(F.size("toks") - F.col("start_tok"), F.lit(_CHUNK)).alias("n_tokens"),
    )


# RE2-and-Java-safe scrubbing patterns (no lookaround).
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_URL_RE = "https?://[^ ]+"
_DIGITS_RE = "[0-9][0-9 .-]{6,}[0-9]"


@register(
    "text_scrub_pii",
    oracle=f"""
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(text,
         '{_URL_RE}', '<URL>', 'g'),
         '{_EMAIL_RE}', '<EMAIL>', 'g'),
         '{_DIGITS_RE}', '<NUMBER>', 'g') AS scrubbed,
       length(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
       length(regexp_extract_all(text, '{_URL_RE}')) AS n_urls
FROM documents
""",
)
def text_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-corpus scrubbing: URLs, emails, long digit runs ->
    placeholder tokens, plus per-doc detection counts. Single scan,
    codegen regexes (patterns stay in the RE2/Java common subset).
    The masking-engine twin for free text: same transform discipline
    as the column-level rules, applied inside the value."""
    d = load(spark, sf_dir, "documents")
    scrub = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _URL_RE, "<URL>"),
            _EMAIL_RE,
            "<EMAIL>",
        ),
        _DIGITS_RE,
        "<NUMBER>",
    )
    return d.select(
        "doc_id",
        scrub.alias("scrubbed"),
        F.regexp_count("text", F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count("text", F.lit(_URL_RE)).alias("n_urls"),
    )
