"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting.

All pure Column expressions (codegen; single scan, no shuffle, no
Python) with DuckDB SQL twins for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ripcurrent_spark.functions.hashing import h32, h32_sql
from ripcurrent_spark.operators.dedup import norm_text, norm_text_sql, tokens, tokens_sql

# Small per-language stopword dictionaries (n-gram heuristic seeds).
STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"],
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"],
    "es": ["el", "los", "las", "una", "es", "y", "que", "por", "con", "para"],
    "fr": ["le", "les", "une", "est", "et", "qui", "dans", "pour", "sur", "pas"],
}
LANGS = sorted(STOPWORDS)  # alphabetical = tie-break preference order

# BPE-ish token pattern: letter runs | single digits | single symbols.
BPE_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def stopword_hits(tokens_col: Column, lang: str) -> Column:
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens_col, lambda x: F.array_contains(words, x)))


def stopword_hits_sql(tokens_expr: str, lang: str) -> str:
    lits = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({tokens_expr}, x -> list_contains([{lits}], x)))"


def predict_lang(hit_cols: dict[str, Column]) -> Column:
    """Language with the most stopword hits; alphabetical tie-break."""
    expr = F.lit(LANGS[-1])
    for lang in reversed(LANGS[:-1]):
        rest = [hit_cols[o] for o in LANGS if o > lang]
        expr = F.when(hit_cols[lang] >= F.greatest(*rest) if len(rest) > 1 else hit_cols[lang] >= rest[0], F.lit(lang)).otherwise(expr)
    return expr


def predict_lang_sql(hit_exprs: dict[str, str]) -> str:
    expr = f"'{LANGS[-1]}'"
    for lang in reversed(LANGS[:-1]):
        rest = [hit_exprs[o] for o in LANGS if o > lang]
        cond = f"{hit_exprs[lang]} >= greatest({', '.join(rest)})" if len(rest) > 1 else f"{hit_exprs[lang]} >= {rest[0]}"
        expr = f"CASE WHEN {cond} THEN '{lang}' ELSE {expr} END"
    return expr


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    punct = F.length(F.regexp_replace(c, "[A-Za-z0-9 ]", ""))
    return F.round(punct.cast("double") / F.greatest(F.length(c), F.lit(1)), 6)


def punct_ratio_sql(expr: str) -> str:
    punct = f"length(regexp_replace({expr}, '[A-Za-z0-9 ]', '', 'g'))"
    return f"round(CAST({punct} AS DOUBLE) / greatest(length({expr}), 1), 6)"


def bag_fingerprint(col: Column | str) -> Column:
    """Order-insensitive content fingerprint: h32 of the sorted
    distinct token bag (a cheap, portable doc signature)."""
    return h32(F.array_join(F.array_sort(F.array_distinct(tokens(col))), " "))


def bag_fingerprint_sql(expr: str) -> str:
    return h32_sql(f"array_to_string(list_sort(list_distinct({tokens_sql(expr)})), ' ')")


def ewma_per_key(
    df,  # DataFrame
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
):
    """Per-key exponentially-weighted moving average, emitted per event
    (time-ordered within key) — the canonical order-dependent fold that
    built-in window functions can't express exactly.

    ONE shuffle (repartition on key) + sortWithinPartitions(key, ts) +
    mapInPandas: groups arrive contiguous and time-ordered, so pandas'
    grouped C ewm kernel (dropna=False — a NULL key is a group like any
    other, matching the old groupBy().applyInPandas semantics) folds
    every group in an Arrow batch in one call, and a carry
    (key, mean, old-weight) re-seeds the single group that can span a
    batch boundary. Seam rows are refolded with the kernel's own
    update arithmetic — alpha round-tripped through com=(1-a)/a, an
    explicit divide by the weight sum, and the ignore_na=False decay
    (NaN observations emit the prior mean while decaying the old
    weight) — verified bit-identical to pandas for arbitrary alpha and
    NaN placement, so batch boundaries are invisible in the output.
    Python crossings per partition are O(Arrow batches), where the
    previous groupBy().applyInPandas form paid one per KEY (15k keys
    at sf1 -> 15k crossings -> ~10 s of pure dispatch); the python
    seam loop touches only the first and last group of each batch.
    State never crosses keys; the largest cost is the one key shuffle,
    and skewed keys degrade to a longer python seam loop, never to
    OOM."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # Output schema mirrors the caller's actual field types (string/int
    # keys, non-double values all work); only `ewma` is fixed (double).
    proj = df.select(key_col, ts_col, value_col)
    schema = T.StructType(
        list(proj.schema.fields) + [T.StructField("ewma", T.DoubleType())]
    )
    # pandas stores alpha as com and derives the weights from the
    # round-trip; replicate exactly so the seam fold matches the kernel.
    com = (1.0 - alpha) / alpha
    a2 = 1.0 / (1.0 + com)
    owf, new_wt = 1.0 - a2, a2  # old-weight decay factor, new weight

    def _isna(x) -> bool:
        return x is None or (isinstance(x, float) and x != x)

    def _neq_mask(keys, ref):
        # Elementwise "differs from ref", NULL/NaN-aware: na == na.
        if _isna(ref):
            return ~pd.isna(keys)
        return keys != ref

    def _refold(vals, start, end, w, ow, out):
        # The pandas ewm kernel (adjust=False, ignore_na=False), one
        # observation at a time: NaN emits the prior mean and decays
        # the old weight; the first valid value seeds the mean.
        for j in range(start, end):
            cur = vals[j]
            if w == w:
                ow *= owf
                if cur == cur:
                    if w != cur:
                        w = (ow * w + new_wt * cur) / (ow + new_wt)
                    ow = 1.0
            elif cur == cur:
                w = cur
            if out is not None:
                out[j] = w
        return w, ow

    def fold(batches):
        has_carry, carry_key = False, None
        carry_w, carry_ow = float("nan"), 1.0
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            keys = pdf[key_col].to_numpy()
            vals = pdf[value_col].to_numpy(dtype="float64")
            g = (
                pdf.groupby(key_col, sort=False, dropna=False)[value_col]
                .ewm(alpha=alpha, adjust=False)
                .mean()
            )
            ewma = np.empty(n, dtype="float64")
            ewma[g.index.get_level_values(-1).to_numpy()] = g.to_numpy()
            first = keys[0]
            same0 = has_carry and (
                (_isna(first) and _isna(carry_key))
                or (not _isna(first) and not _isna(carry_key) and first == carry_key)
            )
            m = 0
            if same0:
                neq = _neq_mask(keys, first)
                m = int(np.argmax(neq)) if neq.any() else n
                w, ow = _refold(vals, 0, m, carry_w, carry_ow, out=ewma)
            if same0 and m == n:
                # One group fills the whole batch: carry straight from
                # the seam refold's end state.
                carry_w, carry_ow = w, ow
            else:
                # Fresh refold of the batch's LAST group purely to
                # obtain (mean, old-weight) for the carry — identical
                # arithmetic to the kernel, so the mean agrees with
                # ewma[-1]; the old weight is the part the kernel
                # doesn't expose.
                neq_l = _neq_mask(keys, keys[-1])
                p = n - int(np.argmax(neq_l[::-1])) if neq_l.any() else 0
                carry_w, carry_ow = _refold(vals, p, n, float("nan"), 1.0, out=None)
            carry_key, has_carry = keys[-1], True
            yield pd.DataFrame(
                {
                    key_col: pdf[key_col],
                    ts_col: pdf[ts_col],
                    value_col: pdf[value_col],
                    "ewma": ewma,
                }
            )

    arranged = proj.repartition(F.col(key_col)).sortWithinPartitions(key_col, ts_col)
    return arranged.mapInPandas(fold, schema)
