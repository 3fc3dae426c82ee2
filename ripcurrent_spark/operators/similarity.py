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


def unit_rows_np(m):
    """Row-normalize a numpy matrix, mapping zero-norm rows to zero
    vectors instead of NaN: a NaN score row would sort differently per
    engine (np.lexsort puts NaN keys last; DuckDB ranks NaN greatest),
    so zero vectors score 0.0 against everything — below any
    threshold, deterministically."""
    import numpy as np

    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0.0, 1.0, n)


def unit(a: Column) -> Column:
    """L2-normalize once per ROW — cosine against unit vectors is a
    plain dot product, so the per-PAIR work drops from (dot + 2 norms)
    to dot alone."""
    # norm evaluated once per row via array_repeat (a bare reference
    # inside the transform lambda would re-evaluate it per element).
    rep = F.array_repeat(norm(a), F.size(a))
    return F.zip_with(a, rep, lambda x, n: x / n)


def unit_sql(a: str) -> str:
    n = f"sqrt(list_sum(list_transform(range(1, len({a})+1), i -> {a}[i] * {a}[i])))"
    return f"list_transform({a}, x -> x / {n})"


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "emb",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors for each query vector. The query side is
    broadcast (queries << corpus); ranking shuffles once on query id.
    Both sides are pre-normalized so each pair costs one dot product."""
    q = queries.select(F.col(id_col).alias("query_id"), unit(F.col(emb_col)).alias("q_emb"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), unit(F.col(emb_col)).alias("c_emb"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_raw", dot(F.col("q_emb"), F.col("c_emb")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_raw"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_raw", 6).alias("cosine"))
    )


# Candidate margin for the argpartition pre-select in _row_topk_np: a
# tie class must span more than this many near-top scores before the
# exact full-sort fallback fires for that row.
_TOPK_MARGIN = 32


def _row_topk_np(st, kk, np):
    """Per-row top-``kk`` column indices of ``st`` (rows = queries,
    columns = id-ascending corpus batch), ordered by (value DESC,
    column ASC) — EXACT under ties, identical selection to a full
    stable argsort of every row.

    O(n_cols) argpartition preselects kk + _TOPK_MARGIN candidates per
    row (measured ~6x faster than the full-row stable argsort at the
    10k-row Arrow batch size — guide §1.2, per-task work); candidates
    are re-sorted by column index first (column order == id order), so
    the stable score sort reproduces (score DESC, id ASC). A per-row
    boundary check catches the one case argpartition cannot decide —
    a tie class straddling the partition edge — and falls back to the
    full stable argsort for exactly those rows (a -inf kk-th value is
    safe by construction: every element outside the partition is also
    -inf, and -inf rows are dropped by the callers' finite filter).
    NaN scores land outside the partition and fail the boundary check,
    so NaN rows take the fallback and keep full-argsort semantics.

    Returns (top, ts): (n_rows, kk) index and value arrays."""
    n_rows, n_cols = st.shape
    if kk >= n_cols or n_cols <= kk + _TOPK_MARGIN + 1:
        o = np.argsort(-st, axis=1, kind="stable")[:, :kk]
        return o, np.take_along_axis(st, o, axis=1)
    m = kk + _TOPK_MARGIN
    part = np.argpartition(-st, m, axis=1)[:, : m + 1]
    boundary = np.take_along_axis(st, part[:, m : m + 1], axis=1)[:, 0]
    cand = np.sort(part[:, :m], axis=1)
    cs = np.take_along_axis(st, cand, axis=1)
    o = np.argsort(-cs, axis=1, kind="stable")[:, :kk]
    top = np.take_along_axis(cand, o, axis=1)
    ts = np.take_along_axis(cs, o, axis=1)
    unsafe = ~((ts[:, kk - 1] > boundary) | np.isneginf(ts[:, kk - 1]))
    if unsafe.any():
        rows = np.nonzero(unsafe)[0]
        of = np.argsort(-st[rows], axis=1, kind="stable")[:, :kk]
        top[rows] = of
        ts[rows] = np.take_along_axis(st[rows], of, axis=1)
    return top, ts


def brute_force_topk_np(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "emb",
    k: int = 10,
) -> DataFrame:
    """Vectorized brute-force top-k: the query set (small by contract)
    is collected and closed over as a float64 numpy matrix; the corpus
    streams through mapInPandas in Arrow batches scored by one matmul
    each, emitting only each batch's local top-k per query; a final
    window pass reduces local winners to global top-k.

    ~50-100x faster than the per-element higher-order-function dot
    (lambdas don't codegen), while cosine values still match the
    sequential-sum oracle to well past the 6 decimals we emit."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    qrows = queries.select(F.col(id_col), F.col(emb_col)).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qm = np.array([r[1] for r in qrows], dtype=np.float64)
    qm = unit_rows_np(qm)

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cos_raw", T.DoubleType()),
        ]
    )

    def _score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cids = pdf[id_col].to_numpy(dtype=np.int64)
            # Pre-sort the batch by id so ONE stable argsort of the
            # whole (batch x nq) score matrix reproduces the exact
            # (cos DESC, neighbor_id ASC) order per query — equal
            # scores keep row order = ascending id. This replaces the
            # per-query Python loop of mask/nonzero/lexsort (nq
            # interpreted passes per batch, the dominant cost of the
            # exact searches at sf1 — guide §4.2: hand whole batches
            # to vectorized kernels); selected candidates and their
            # scores are bit-identical either way.
            order0 = np.argsort(cids, kind="stable")
            cids = cids[order0]
            cm = np.array(list(pdf[emb_col]), dtype=np.float64)[order0]
            cm = unit_rows_np(cm)
            # Same matmul as always (cm @ qm.T) so every score is
            # bit-identical; the transpose-copy just makes each
            # query's scores row-contiguous for the row-wise top-k
            # (the axis-0 sort of the C-ordered matrix was
            # cache-hostile — measured 1.7x slower than the
            # transposed row sort before argpartition even enters).
            st = np.ascontiguousarray((cm @ qm.T).T)  # (nq, batch)
            # Top k+1 per query row (the +1 absorbs the one possible
            # self-row, dropped below).
            kk = min(k + 1, st.shape[1])
            top, tsc = _row_topk_np(st, kk, np)  # (nq, kk)
            tid = cids[top]
            keep = tid != qids[:, None]  # drop self-pairs
            # Per query: first k survivors, emitted in one frame.
            qcol = np.broadcast_to(qids[:, None], tid.shape)
            rnk = np.cumsum(keep, axis=1)
            sel = keep & (rnk <= k)
            yield pd.DataFrame(
                {
                    "query_id": qcol[sel],
                    "neighbor_id": tid[sel],
                    "cos_raw": tsc[sel],
                }
            )

    local = corpus.select(id_col, emb_col).mapInPandas(_score, schema=out_schema)
    w = W.partitionBy("query_id").orderBy(F.desc("cos_raw"), "neighbor_id")
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_raw", 6).alias("cosine"))
    )


def hard_negative_topk_np(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    emb_col: str = "emb",
    k: int = 5,
) -> DataFrame:
    """Label-mismatch top-k (hard-negative mining) in ONE corpus pass.

    The query set (small by contract) is collected with ids AND labels
    and closed over as a float64 matrix; the corpus streams through
    mapInPandas in Arrow batches, each scored against ALL queries by a
    single matmul. The label-mismatch predicate is a numpy mask per
    (batch, query) — the corpus row's label travels WITH the score, so
    no id->label join (and no corpus-sized broadcast) is ever needed,
    and the plan is CONSTANT in label count: one scan, one map stage,
    one final top-k window on query_id. Contrast the per-label-branch
    shape (one filtered scan per distinct label, unioned): that plan
    grows O(labels) and serializes job submission at thousands of
    labels.

    Returns an empty typed frame when the query slice is empty (no
    rows -> no negatives, not an IndexError)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("query_label", T.IntegerType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("negative_label", T.IntegerType()),
            T.StructField("cos_raw", T.DoubleType()),
        ]
    )
    ranked_cols = [
        "query_id",
        "query_label",
        F.col("neighbor_id").alias("negative_id"),
        "negative_label",
        "rank",
        F.round("cos_raw", 6).alias("cosine"),
    ]

    qrows = queries.select(id_col, label_col, emb_col).collect()
    if not qrows:
        empty = T.StructType(
            [
                T.StructField("query_id", T.LongType()),
                T.StructField("query_label", T.IntegerType()),
                T.StructField("negative_id", T.LongType()),
                T.StructField("negative_label", T.IntegerType()),
                T.StructField("rank", T.IntegerType()),
                T.StructField("cosine", T.DoubleType()),
            ]
        )
        return queries.sparkSession.createDataFrame([], empty)
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qlabs = np.array([r[1] for r in qrows], dtype=np.int64)
    qm = unit_rows_np(np.array([r[2] for r in qrows], dtype=np.float64))

    def _score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cids = pdf[id_col].to_numpy(dtype=np.int64)
            # id-sorted batch + one stable argsort of the whole score
            # matrix = exact (cos DESC, id ASC) per query, replacing
            # the per-query Python mask/nonzero/lexsort loop (guide
            # §4.2) — same candidates, same values. Ineligible pairs
            # (same label, or self) score -inf, which no real cosine
            # of unit vectors can reach, so they sort strictly last
            # and are dropped by the finite filter.
            order0 = np.argsort(cids, kind="stable")
            cids = cids[order0]
            clabs = pdf[label_col].to_numpy(dtype=np.int64)[order0]
            cm = unit_rows_np(np.array(list(pdf[emb_col]), dtype=np.float64)[order0])
            # Same matmul (cm @ qm.T) as always — bit-identical
            # scores; the transpose-copy makes each query's scores
            # row-contiguous for the row-wise argpartition top-k
            # (_row_topk_np).
            st = np.ascontiguousarray((cm @ qm.T).T)  # (nq, batch)
            valid = (qlabs[:, None] != clabs[None, :]) & (
                qids[:, None] != cids[None, :]
            )
            masked = np.where(valid, st, -np.inf)
            kk = min(k, masked.shape[1])
            top, tsc = _row_topk_np(masked, kk, np)  # (nq, kk)
            sel = np.isfinite(tsc)
            tid = cids[top]
            tlab = clabs[top]
            qcol = np.broadcast_to(qids[:, None], tid.shape)
            qlab = np.broadcast_to(qlabs[:, None], tid.shape)
            yield pd.DataFrame(
                {
                    "query_id": qcol[sel],
                    "query_label": qlab[sel].astype(np.int32),
                    "neighbor_id": tid[sel],
                    "negative_label": tlab[sel].astype(np.int32),
                    "cos_raw": tsc[sel],
                }
            )

    local = corpus.select(id_col, label_col, emb_col).mapInPandas(_score, schema=out_schema)
    w = W.partitionBy("query_id").orderBy(F.desc("cos_raw"), "neighbor_id")
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*ranked_cols)
    )


def lsh_weights(n_bits: int, dim: int, seed: str = "hp") -> list[list[float]]:
    """Deterministic +/-1 projection weights, computed DRIVER-SIDE:
    w_j[d] = sign(md5(f'{seed}{j}:{d}')) — the same portable hash the
    engines share, but evaluated once per (bit, dim) as a Python
    constant instead of 8 x dim md5 calls PER ROW (which also kept the
    signature out of any SQL mirror)."""
    import hashlib

    def sgn(j: int, d: int) -> float:
        h = int(hashlib.md5(f"{seed}{j}:{d}".encode()).hexdigest()[:8], 16)
        return 1.0 if h % 2 == 0 else -1.0

    return [[sgn(j, d) for d in range(dim)] for j in range(n_bits)]


def lsh_signature(emb: Column, n_bits: int = 8, dim: int = 64, seed: str = "hp") -> Column:
    """Signed-random-projection signature: bit j = (w_j . emb > 0).
    Buckets nearby directions together; pure arithmetic at runtime
    (weights are literal arrays), bit-identical across engines.

    Raises at runtime if ``size(emb) != dim``: a shorter/longer vector
    would NULL-pad through zip_with, silently zero every projection,
    and collapse all rows into bucket 0 (LSH degrades to one O(n^2)
    bucket with no error — and the SQL mirror fails identically, so
    the oracle can't catch it)."""
    acc = F.lit(0)
    for j, w in enumerate(lsh_weights(n_bits, dim, seed)):
        wl = F.array(*[F.lit(x) for x in w])
        proj = F.aggregate(
            F.zip_with(emb, wl, lambda x, s: x * s), F.lit(0.0), lambda a, x: a + x
        )
        acc = acc + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return F.when(F.size(emb) == dim, acc).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"lsh_signature: embedding length "),
                F.size(emb).cast("string"),
                F.lit(f" != dim={dim}; signature would collapse to bucket 0"),
            )
        ).cast("int")
    )


def lsh_signature_sql(emb_expr: str, n_bits: int = 8, dim: int = 64, seed: str = "hp") -> str:
    """DuckDB mirror of :func:`lsh_signature` (same literal weights,
    same sequential-sum order)."""
    terms = []
    for j, w in enumerate(lsh_weights(n_bits, dim, seed)):
        wl = "[" + ", ".join(str(x) for x in w) + "]"
        proj = f"list_sum(list_transform(range(1, {dim}+1), i -> {emb_expr}[i] * ({wl})[i]))"
        terms.append(f"CASE WHEN {proj} > 0 THEN {1 << j} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def lsh_bucketed_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "emb",
    n_bits: int = 8,
    k: int = 5,
    dim: int = 64,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Approximate all-pairs top-k: exact cosine ranking WITHIN each
    LSH bucket. The bucket groupBy is the only shuffle; bucket count
    (2^n_bits) is tuned so buckets fit executor memory at scale.

    ``bucket_cap`` bounds the INDEXED side of each bucket to a
    deterministic subset (first C members by portable hash of id) —
    the standard LSH defense against dense regions: clustered corpora
    collapse whole clusters into one signature (observed at sf1:
    12k/50k vectors in one of 256 buckets -> a ~150M-pair self-join
    and a spilled single-task top-k window). With the cap, per-bucket
    work is n_b * min(n_b, C), i.e. corpus-linear; every vector still
    QUERIES its bucket, only the candidate list is subsampled
    (bounded recall dilution inside dense regions, where near
    neighbors are abundant anyway)."""
    sig = df.select(
        F.col(id_col).alias("vid"),
        F.col(emb_col).alias("emb"),
        lsh_signature(F.col(emb_col), n_bits, dim).alias("bucket"),
    )
    a = sig.select(F.col("vid").alias("query_id"), F.col("emb").alias("q_emb"), "bucket")
    b = sig.select(F.col("vid").alias("neighbor_id"), F.col("emb").alias("c_emb"), "bucket")
    if bucket_cap is not None:
        # Dense buckets: score each bucket as a numpy block (one
        # chunked matmul per group) — a query belongs to exactly one
        # bucket, so in-bucket top-k IS global top-k and no window
        # pass is needed. The per-pair HOF cosine (interpreted — no
        # codegen for lambdas) took >300 s at 50k vectors even with
        # the candidate cap; the matmul takes seconds.
        import hashlib

        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        out_schema = T.StructType(
            [
                T.StructField("query_id", T.LongType()),
                T.StructField("bucket", T.IntegerType()),
                T.StructField("neighbor_id", T.LongType()),
                T.StructField("rank", T.IntegerType()),
                T.StructField("cosine", T.DoubleType()),
            ]
        )

        def _caphash(i: int) -> int:
            return int(
                hashlib.md5(f"lshcap:{i}".encode()).hexdigest()[:8], 16
            )

        def _block(pdf: "pd.DataFrame") -> "pd.DataFrame":
            ids = pdf["vid"].to_numpy(dtype=np.int64)
            m = np.array(list(pdf["emb"]), dtype=np.float64)
            m = unit_rows_np(m)
            bucket = int(pdf["bucket"].iloc[0])
            # indexed side: first `bucket_cap` members by portable hash
            order = np.lexsort((ids, np.array([_caphash(i) for i in ids])))
            idx = np.sort(order[:bucket_cap])
            cid, cm = ids[idx], m[idx]
            qo, no, ro, co = [], [], [], []
            chunk = 2048
            for s in range(0, len(ids), chunk):
                scores = m[s : s + chunk] @ cm.T
                for i in range(scores.shape[0]):
                    qid = ids[s + i]
                    srow = scores[i]
                    mask = cid != qid
                    cand = np.nonzero(mask)[0]
                    if not len(cand):
                        continue
                    top = cand[np.lexsort((cid[cand], -srow[cand]))[:k]]
                    qo.extend([qid] * len(top))
                    no.extend(cid[top])
                    ro.extend(range(1, len(top) + 1))
                    co.extend(np.round(srow[top], 6))
            return pd.DataFrame(
                {
                    "query_id": qo,
                    "bucket": bucket,
                    "neighbor_id": no,
                    "rank": ro,
                    "cosine": co,
                }
            )

        return sig.groupBy("bucket").applyInPandas(_block, schema=out_schema)
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


def nearest_centroid_np(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "emb",
    cid_col: str = "cid",
    cemb_col: str = "cemb",
) -> DataFrame:
    """Vectorized coarse quantizer: assign every corpus vector to its
    nearest centroid by dot product (ties -> lowest cid). The centroid
    matrix (small by contract — ~sqrt(N)) ships in the mapInPandas
    closure sorted by cid; each Arrow batch is ONE matmul, the same
    broadcast-small-side shape as brute_force_topk_np.

    Replaces the expression-tree crossJoin + row_number argmin, which
    evaluates a 64-term higher-order-function dot per (vector,
    centroid) pair interpreted (lambdas don't codegen) — the sf1 sweep
    showed 50k x 2000 pairs blowing the 300 s budget; the matmul does
    the same 6.4 GFLOP in seconds. np.argmax returns the FIRST maximal
    index, which on the cid-sorted matrix reproduces ORDER BY dot
    DESC, cid exactly."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    crows = sorted(centroids.select(cid_col, cemb_col).collect(), key=lambda r: r[0])
    cids = np.array([r[0] for r in crows], dtype=np.int64)
    cm = np.array([r[1] for r in crows], dtype=np.float64)

    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("emb", T.ArrayType(T.DoubleType())),
            T.StructField("cid", T.LongType()),
        ]
    )

    def _assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.array(list(pdf[emb_col]), dtype=np.float64)
            best = np.argmax(vm @ cm.T, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "emb": list(pdf[emb_col]),
                    "cid": cids[best],
                }
            )

    return corpus.select(id_col, emb_col).mapInPandas(_assign, schema=out_schema)


def nearest_centroids_np(
    corpus: DataFrame,
    centroids: DataFrame,
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "emb",
    cid_col: str = "cid",
    cemb_col: str = "cemb",
) -> DataFrame:
    """Top-``k`` nearest centroids by dot product per corpus vector —
    the multiprobe generalization of :func:`nearest_centroid_np`
    (r11): (vec_id, emb, cid, probe_rank) with probe_rank 1..k
    ordered by (dot DESC, cid ASC). One matmul per Arrow batch
    against the cid-sorted centroid matrix; a stable argsort of the
    negated dots reproduces the SQL ORDER BY exactly (equal dots keep
    original column order = ascending cid). Probing all ~sqrt(N)
    centroids per query vector is the standard IVF query cost; the
    expression-tree crossJoin alternative pays the same pairs through
    an interpreted 64-term HOF lambda — the ~100x cliff the sf1 sweep
    measured twice (coarse quantizer r4, LSH scorer r5)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    crows = sorted(centroids.select(cid_col, cemb_col).collect(), key=lambda r: r[0])
    cids = np.array([r[0] for r in crows], dtype=np.int64)
    cm = np.array([r[1] for r in crows], dtype=np.float64)
    k = min(k, len(cids))

    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("emb", T.ArrayType(T.DoubleType())),
            T.StructField("cid", T.LongType()),
            T.StructField("probe_rank", T.IntegerType()),
        ]
    )

    def _assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.array(list(pdf[emb_col]), dtype=np.float64)
            top = np.argsort(-(vm @ cm.T), axis=1, kind="stable")[:, :k]
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            embs = list(pdf[emb_col])
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(ids, k),
                    "emb": [e for e in embs for _ in range(k)],
                    "cid": cids[top].ravel(),
                    "probe_rank": np.tile(np.arange(1, k + 1), len(ids)),
                }
            )

    return corpus.select(id_col, emb_col).mapInPandas(_assign, schema=out_schema)


def capped_shard_union(
    v: DataFrame,
    id_col: str,
    group_col: str,
    emb_col: str,
    cap: int,
    shards: int,
    cap_seed: str,
    shard_seed: str,
) -> DataFrame:
    """The shared frame behind the capped-index cosine scorers
    (dedup_embedding_cosine per-label, dedup_semdedup per-cell): a
    UNION of every row tagged ``is_idx=false`` in its own
    hash-assigned ``shard``, plus a deterministic <= ``cap``-member
    per-group candidate INDEX (first members by portable h32 of the
    id — mirrored in the oracles) tagged ``is_idx=true`` and
    replicated to every shard. Grouping the result by
    (group, shard) gives each Arrow block one shard of queries plus
    the whole (bounded) index, so per-group work is n * min(n, cap)
    and parallelism is groups x shards; past the cap the failure mode
    is bounded recall, never quadratic work."""
    rnk = v.select(
        id_col, group_col, h32(F.col(id_col).cast("string"), seed=cap_seed).alias("_h")
    )
    w = W.partitionBy(group_col).orderBy("_h", id_col)
    idx_ids = (
        rnk.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= cap)
        .select(id_col)
    )
    idx = v.join(F.broadcast(idx_ids), id_col)
    shard = F.pmod(
        h32(F.col(id_col).cast("string"), seed=shard_seed), F.lit(shards)
    ).cast("int")
    qside = v.select(
        id_col, group_col, emb_col, shard.alias("shard"), F.lit(False).alias("is_idx")
    )
    iside = idx.select(
        id_col,
        group_col,
        emb_col,
        F.explode(F.sequence(F.lit(0), F.lit(shards - 1))).alias("shard"),
        F.lit(True).alias("is_idx"),
    )
    return qside.unionByName(iside)
