"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB engine needs:
- brute-force cosine top-k: broadcast the (small) query set against
  the corpus — exact, linear in corpus size, no corpus shuffle;
- LSH (random signed projections): corpus bucketed by sign-bit
  signature, search within buckets — the corpus x corpus scale path.

Double-precision sequential reductions (aggregate over zip_with) so
the DuckDB oracle (list_sum over list_transform, same order) matches
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ripcurrent_spark.functions.hashing import h32


def as_double(emb: Column | str) -> Column:
    e = F.col(emb) if isinstance(emb, str) else emb
    return F.transform(e, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_sql(a: str, b: str) -> str:
    d = f"list_sum(list_transform(range(1, len({a})+1), i -> {a}[i] * {b}[i]))"
    na = f"sqrt(list_sum(list_transform(range(1, len({a})+1), i -> {a}[i] * {a}[i])))"
    nb = f"sqrt(list_sum(list_transform(range(1, len({b})+1), i -> {b}[i] * {b}[i])))"
    return f"({d} / ({na} * {nb}))"


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "emb",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors for each query vector. The query side is
    broadcast (queries << corpus); ranking shuffles once on query id."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("c_emb"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_raw", cosine(F.col("q_emb"), F.col("c_emb")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_raw"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_raw", 6).alias("cosine"))
    )


def lsh_signature(emb: Column, n_bits: int = 8, seed: str = "hp") -> Column:
    """Signed-random-projection signature: bit j = (w_j . emb > 0)
    with deterministic +/-1 weights w_j[d] = sign(h32(f'{seed}{j}:{d}')).
    Buckets nearby directions together; deterministic across engines."""
    acc = F.lit(0)
    for j in range(n_bits):
        # Weighted projection: sum_d sign(h32(seed,j,d)) * emb[d].
        proj = F.aggregate(
            F.zip_with(emb, _signs(emb, j, seed), lambda x, s: x * s),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        acc = acc + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return acc


def _signs(emb: Column, j: int, seed: str) -> Column:
    return F.transform(
        emb,
        lambda _, i: F.when(h32(F.concat(F.lit(f"{seed}{j}:"), i.cast("string"))) % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0)),
    )


def lsh_bucketed_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "emb",
    n_bits: int = 8,
    k: int = 5,
) -> DataFrame:
    """Approximate all-pairs top-k: exact cosine ranking WITHIN each
    LSH bucket. The bucket groupBy is the only shuffle; bucket count
    (2^n_bits) is tuned so buckets fit executor memory at scale."""
    sig = df.select(
        F.col(id_col).alias("vid"),
        F.col(emb_col).alias("emb"),
        lsh_signature(F.col(emb_col), n_bits).alias("bucket"),
    )
    a = sig.select(F.col("vid").alias("query_id"), F.col("emb").alias("q_emb"), "bucket")
    b = sig.select(F.col("vid").alias("neighbor_id"), F.col("emb").alias("c_emb"), "bucket")
    scored = (
        a.join(b, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_raw", cosine(F.col("q_emb"), F.col("c_emb")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_raw"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "bucket", "neighbor_id", "rank", F.round("cos_raw", 6).alias("cosine"))
    )
