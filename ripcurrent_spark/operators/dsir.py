"""DSIR importance-weighting primitives (Xie et al. 2023, "Data
Selection for Language Models via Importance Resampling"), shared by
the batch query (queries/curation.curation_dsir_weights) and the
streaming incremental maintainer (streaming/dsir.py) — the
injectable-engine discipline the streaming dedup twins use: ONE
bucket-hash / model / scoring implementation, so streamed state folds
to exactly the batch answer.

Scale: the feature space is {DSIR_B} hashed word-bigram buckets (the
hashing trick — model size FIXED at any corpus size); per-doc bucket
counts are built in one fused Arrow pass (bigram -> memoized md5
bucket -> per-doc bincount; the exploded zip/concat alternative
measured 19 s vs ~4 s at sf1). Both smoothed log-probabilities round
to 9 decimals into DECIMAL(20,9), so every downstream sum is exact
and order-free under any shuffle (the charlm libm discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ripcurrent_spark.operators.hints import bcast

DSIR_B = 512  # hashed-ngram feature buckets (bounded model, any corpus)

_DB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("b", T.LongType()),
        T.StructField("c", T.LongType()),
    ]
)


def bucket_counts(d: DataFrame) -> DataFrame:
    """(doc_id, lang, b, c): per-doc hashed-bigram bucket counts from
    a (doc_id, lang, toks) frame, one fused Arrow pass. The bucket id
    is the portable h32('dsir:' + bigram) % {DSIR_B} integer, so the
    DuckDB oracle's unnest mirror is value-identical."""
    import pandas as pd

    def _fold(batches):
        import hashlib

        memo: dict[str, int] = {}

        def hb(g: str) -> int:
            v = memo.get(g)
            if v is None:
                v = memo[g] = (
                    int(hashlib.md5(f"dsir:{g}".encode()).hexdigest()[:8], 16)
                    % DSIR_B
                )
            return v

        for pdf in batches:
            ids, langs, bs, cs = [], [], [], []
            for doc_id, lang, toks in zip(pdf["doc_id"], pdf["lang"], pdf["toks"]):
                ts = list(toks) if toks is not None else []
                if len(ts) < 2:
                    continue
                counts: dict[int, int] = {}
                for i in range(len(ts) - 1):
                    b = hb(ts[i] + " " + ts[i + 1])
                    counts[b] = counts.get(b, 0) + 1
                for b, c in counts.items():
                    ids.append(doc_id)
                    langs.append(lang)
                    bs.append(b)
                    cs.append(c)
            if ids:
                yield pd.DataFrame({"doc_id": ids, "lang": langs, "b": bs, "c": cs})

    return d.repartition("doc_id").mapInPandas(_fold, schema=_DB_SCHEMA)


def log_weight_model(raw: DataFrame, tgt: DataFrame) -> DataFrame:
    """(b, w): per-bucket DECIMAL(20,9) log importance weight from
    the raw (b, cr) and target (b, ct) count aggregates —
    ln p_target(b) - ln p_raw(b) with add-one smoothing on both
    bag-of-buckets models. Each smoothed probability is an IEEE
    division of exact integers and each ln rounds to 9 decimals into
    DECIMAL, so the subtraction (and every count-weighted sum
    downstream) is exact decimal arithmetic."""
    tr = raw.agg(F.sum("cr").alias("tr"))
    tt = tgt.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("tt"))
    lnp = lambda num, den: F.round(F.log(num / den), 9).cast("decimal(20,9)")  # noqa: E731
    return (
        raw.join(tgt, "b", "left")
        .crossJoin(bcast(tr))
        .crossJoin(bcast(tt))
        .select(
            "b",
            (
                lnp(F.coalesce("ct", F.lit(0)) + 1, F.col("tt") + DSIR_B)
                - lnp(F.col("cr") + 1, F.col("tr") + DSIR_B)
            ).alias("w"),
        )
    )


def score_counts(db: DataFrame, lw: DataFrame) -> DataFrame:
    """(doc_id, n_grams, log_weight, target_like): per-doc importance
    score — one partial-agged groupBy of the (doc, bucket) frame
    against the broadcast {DSIR_B}-row weight model."""
    sc = (
        db.join(bcast(lw), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_grams"),
            F.sum(F.col("c").cast("decimal(12,0)") * F.col("w")).alias("s"),
        )
    )
    return sc.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.round(F.col("s").cast("double"), 6).alias("log_weight"),
        (F.col("s") > 0).alias("target_like"),
    )
