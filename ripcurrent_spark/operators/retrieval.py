"""BM25 term counting and scoring, shared VERBATIM by the batch query
(queries/search.text_bm25_search) and the streaming corpus-statistics
maintainer (streaming/docstats.py) — the operators/dsir.py /
operators/charlm.py sharing discipline: because counting, the stats
row, and the scoring expression are these exact functions in both
paths, scoring a corpus against STREAMED statistics equals the batch
run bit-for-bit.

The BM25 state is (a) the document-frequency table — vocabulary-
scaled by Heaps' law, never corpus-scaled — and (b) one totals row
(n_docs, sum_dl). Both are mergeable counts, so the streaming twin is
per-batch partials under ``_batch_id`` + tiny sums.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def term_counts(d: DataFrame, terms: tuple[str, ...]) -> DataFrame:
    """(doc_id, dl, tf0..tf{k-1}) from a (doc_id, toks) frame — one
    vectorized Arrow pass (the interpreted size(filter(...)) pipeline
    cost three lambda traversals per doc and dominated the query's
    sf1 wall before r6). NULL token lists count as empty."""
    import pandas as pd
    from pyspark.sql import types as T

    count_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("dl", T.IntegerType())]
        + [T.StructField(f"tf{i}", T.IntegerType()) for i in range(len(terms))]
    )

    def _count(batches):
        for pdf in batches:
            tl = [t if t is not None else [] for t in pdf["toks"]]
            out = {"doc_id": pdf["doc_id"], "dl": [len(t) for t in tl]}
            for i, term in enumerate(terms):
                out[f"tf{i}"] = [sum(1 for x in t if x == term) for t in tl]
            yield pd.DataFrame(out)

    return d.mapInPandas(_count, schema=count_schema)


def corpus_stats(t: DataFrame, n_terms: int) -> DataFrame:
    """The 1-row (n, df0..df{k-1}, sumdl) statistics frame from a
    term-counts frame — what the streaming snapshot reproduces from
    its per-batch partials."""
    return t.agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
            for i in range(n_terms)
        ],
        F.sum("dl").alias("sumdl"),
    )


def bm25_topk(t: DataFrame, stats: DataFrame, n_terms: int, k: int = 100) -> DataFrame:
    """(doc_id, dl, tf_total, bm25) top-``k`` by BM25(k1={K1}, b={B})
    from a term-counts frame and a 1-row stats frame (broadcast back
    onto the scan). The summation over query terms runs in fixed term
    order, so the IEEE result is bit-identical wherever the same
    (dl, tf_i, stats) meet — the batch/streamed equality law."""
    scored = t.crossJoin(F.broadcast(stats))
    avgdl = F.col("sumdl").cast("double") / F.col("n")

    def term_score(i: int) -> Column:
        tf = F.col(f"tf{i}")
        idf = F.log(
            (F.col("n") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5) + 1.0
        )
        return idf * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * F.col("dl") / avgdl))

    # Fixed-order fold (term 0 first, left to right) — Python's sum()
    # would start from int 0 and change the operand order; keep the
    # explicit chain.
    expr = term_score(0)
    for i in range(1, n_terms):
        expr = expr + term_score(i)
    bm25 = F.round(expr, 6)
    tf_total = F.col("tf0")
    for i in range(1, n_terms):
        tf_total = tf_total + F.col(f"tf{i}")
    return (
        scored.withColumn("bm25", bm25)
        .filter(F.col("bm25") > 0)
        .select(
            "doc_id",
            F.col("dl").cast("long").alias("dl"),
            tf_total.cast("long").alias("tf_total"),
            "bm25",
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(k)
    )
