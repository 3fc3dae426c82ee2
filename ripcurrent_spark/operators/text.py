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


def vocab_in_hits(toks_ref: str, vocab) -> Column:
    """Tokens-with-multiplicity covered by a tokenizer VOCABULARY:
    `size(filter(toks, x -> x IN (...)))` built as ONE generated-SQL
    expression (VERDICT r7 #1 — production-vocabulary posture).

    Why this exact form and not the two tempting alternatives:
    - `array_contains(lit_array, x)` is a LINEAR scan per token —
      ~10^5 string compares per token at a real 50k-100k-entry
      tokenizer vocabulary.
    - `x.isin(vocab)` builds the same IN expression but pays one py4j
      round-trip per literal: measured 29.1 s of pure DRIVER time at
      50k entries (the plan-construction lesson from
      operators/ranking.py). One `F.expr` parse of the generated
      IN-list is 1.6 s for the identical plan.
    Catalyst's OptimizeIn then folds the IN to a hashed `InSet` — one
    O(1) set probe per token, ONE expression node regardless of
    vocabulary size (plan-pinned in tests/test_round8_ops.py), and
    the stage stays map-only: no shuffle at any corpus size —
    measured: a 50,000-entry vocabulary over the sf1 corpus in 7.4 s
    on local[32] (tools/measure_vocab_scale.py). The
    vocabulary itself is a bounded trained artifact (like the BPE
    merge table), never data-scaled.

    `toks_ref` must be a NAMED column (project `tokens()` first) —
    the expression is parsed from SQL text, so it cannot close over a
    derived Column object.

    Because the literals travel through Spark's SQL parser, every
    parser-significant byte must be escaped — backslash FIRST (Spark's
    default string-literal mode treats it as an escape; a vocab entry
    like ``\\n`` would otherwise be silently re-interpreted as a
    newline and its membership count go wrong), then the quote. An
    empty vocabulary short-circuits to 0 hits: ``x IN ()`` is a parse
    error, not an empty set."""
    if not vocab:
        return F.lit(0)
    inlist = ", ".join(
        "'" + w.replace("\\", "\\\\").replace("'", "\\'") + "'" for w in vocab
    )
    return F.expr(f"size(filter({toks_ref}, x -> x IN ({inlist})))")


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


# --- BPE merge application (injectable tokenizer seam) -----------------
#
# The token stream crosses the Arrow boundary as ONE sentinel-wrapped
# string per document: chr(2) tok chr(3) per token ("\x02a\x03\x02b\x03"),
# empty string for a zero-token document. A tokenizer engine is any
# callable pd.Series -> pd.Series over that wrapped form (the multimodal
# codec-seam pattern, multimodal/columns.py: the PLUMBING — schema,
# Arrow batching, sentinel contract — is fixed; the engine swaps). Two
# engines ship:
#
# - bpe_chained_replace: k vectorized pandas str.replace passes (one C
#   scan per RULE over the whole batch). Exactly mirrors the DuckDB
#   oracle's chained REPLACE CTEs, so it is the value-checkable
#   default — but O(k * corpus): unusable wall-clock at a real
#   50k-entry merge table even though the plan stays one MapInPandas.
# - bpe_ranked_merge: the real tokenizer algorithm (GPT-2 encoder
#   shape) — per document, repeatedly merge the LOWEST-RANK adjacent
#   pair present until none matches. Cost per doc is
#   O(n_tokens * merges_applied), INDEPENDENT of merge-table size:
#   a 10x bigger vocabulary costs nothing unless it actually fires.
#
# The two engines are equivalent on any WELL-FORMED merge table (every
# rule's operand tokens are base tokens or outputs of EARLIER rules,
# no two rules producing the same output string — real BPE tables
# satisfy both by construction): applying rule i everywhere can only
# create adjacencies involving its output token, which by
# well-formedness only LATER rules reference, so priority order and
# table order coincide. Pinned by a hypothesis law over generated
# well-formed tables in tests/test_round8_ops.py.

BPE_OUT_SCHEMA = (
    "doc_id long, n_tokens_before long, n_tokens_after long, "
    "n_merges_applied long, bpe_text string"
)


def bpe_chained_replace(merges):
    """Oracle-parity engine: one left-to-right non-overlapping replace
    per rule IS greedy BPE for that rule (a merge cannot create a new
    adjacency of itself), applied in table order."""

    def _tok(s):
        for a, b in merges:
            s = s.str.replace(
                f"\x02{a}\x03\x02{b}\x03", f"\x02{a}_{b}\x03", regex=False
            )
        return s

    return _tok


def bpe_ranked_merge(merges):
    """Vocabulary-scale engine: per-doc priority merging. Merge-table
    size only affects the dict build (once, in the closure); per-doc
    work scales with merges that actually fire."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def _encode(txt: str) -> str:
        if not txt:
            return txt
        toks = txt[1:-1].split("\x03\x02")
        while len(toks) > 1:
            cand = [
                (ranks[p], p)
                for p in set(zip(toks, toks[1:]))
                if p in ranks
            ]
            if not cand:
                break
            _, (a, b) = min(cand)
            ab = a + "_" + b
            merged, i, n = [], 0, len(toks)
            while i < n:
                if i < n - 1 and toks[i] == a and toks[i + 1] == b:
                    merged.append(ab)
                    i += 2
                else:
                    merged.append(toks[i])
                    i += 1
            toks = merged
        return "\x02" + "\x03\x02".join(toks) + "\x03"

    def _tok(s):
        return s.map(_encode)

    return _tok


def apply_bpe(docs, merges, tokenizer=None, id_col: str = "doc_id", text_col: str = "text"):
    """Apply a trained BPE merge table to a corpus: tokenize JVM-side
    (one codegen projection — normalize + split + sentinel-join, no
    Python), then ONE mapInPandas runs the tokenizer engine per Arrow
    batch. The merge table lives in the closure — its own form of
    broadcast — so the PLAN carries a single MapInPandas node
    regardless of vocabulary size (plan-pinned); k chained
    expression-level replaces would build a k-deep Column tree
    (janino blowup at real vocab sizes). Map-only: no shuffle at any
    scale. A document whose NORMALIZED text is empty has zero tokens
    and reports zero counts (ADVICE r7 — the sentinel wrap of an
    empty token list used to count one phantom token).

    ``tokenizer`` is the seam: any wrapped-string pd.Series ->
    pd.Series callable (see module comment); defaults to the
    oracle-parity chained-replace engine. Production vocabularies use
    ``bpe_ranked_merge(merges)`` — measured: a 10,016-entry table over
    the sf1 corpus in 2.9 s on local[32] (the 16-rule chained oracle
    engine: 1.7 s; tools/measure_vocab_scale.py)."""
    import pandas as pd

    tok = tokenizer or bpe_chained_replace(merges)
    empty = F.length("_nt") == 0
    base = docs.select(
        F.col(id_col).alias("doc_id"), norm_text(text_col).alias("_nt")
    ).select(
        "doc_id",
        F.when(empty, F.lit(0))
        .otherwise(F.size(F.split("_nt", " ")))
        .cast("long")
        .alias("n_tokens_before"),
        F.when(empty, F.lit("")).otherwise(
            F.concat(
                F.lit("\x02"),
                F.array_join(F.split("_nt", " "), "\x03\x02"),
                F.lit("\x03"),
            )
        ).alias("_s"),
    )

    def _run(batches):
        for pdf in batches:
            s = tok(pdf["_s"])
            n_after = s.str.count("\x02").astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens_before": pdf["n_tokens_before"],
                    "n_tokens_after": n_after,
                    "n_merges_applied": pdf["n_tokens_before"] - n_after,
                    "bpe_text": s.str.replace(
                        "\x03\x02", " ", regex=False
                    ).str.strip("\x02\x03"),
                }
            )

    return base.mapInPandas(_run, BPE_OUT_SCHEMA)


_BPE_CUT_EVERY = 8


def bpe_train(
    words,
    n_merges: int,
    word_col: str = "word",
    count_col: str = "n",
    round_secs: list | None = None,
):
    """Classic character-level BPE TRAINING (Sennrich et al. 2016)
    over a (word, count) frame — the merge-selection loop between
    text_bpe_pair_counts (the statistics) and apply_bpe (the
    inference pass). Returns ``n_merges`` rows
    ``{"round", "left_tok", "right_tok", "merged", "n"}`` in merge
    order (fewer if the pair space dries up).

    Why this scales: the corpus is collapsed to the word-frequency
    table BEFORE this is called (corpus-linear, once), so every merge
    round runs at VOCABULARY size, not corpus size — Heaps' law makes
    that millions of rows at 100 TB, not billions. Per round: one
    explode of adjacent symbol pairs weighted by word count, a
    partial-agged groupBy, and a 1-row TakeOrdered argmax (count
    desc, pair asc tie-break) collected control-plane-style (the PCA
    power-iteration discipline — R one-row collects, never a
    data-scaled frame). The merge applies as one non-overlapping
    string replace over the word table (the original paper's
    symbol-string representation) with TWO-space separators and
    single-space match boundaries: with single-space separators,
    consecutive occurrences (' a b a b ') SHARE the boundary space,
    so replace-all consumes it and silently skips every second merge
    site (greedy semantics break; the same pair re-wins later
    rounds). Two-space separators make adjacent matches
    character-disjoint — each match consumes one of the two boundary
    spaces, the leftover space plus the replacement's own edge space
    restores the invariant, and left-to-right replace-all IS
    canonical greedy BPE. Merged symbols concatenate, staying
    alphanumeric, so the shared tokenizer keeps parsing the symbol
    string (whitespace runs collapse). Deterministic end to end:
    integer counts, lexicographic tie-breaks, no RNG — the DuckDB
    oracle unrolls the same rounds as CTEs and value-checks every
    selected merge.

    Lineage is CUT with an eager localCheckpoint every
    ``_BPE_CUT_EVERY`` (= 8) merge rounds, the connected_components
    discipline (VERDICT r10 #2): without the cut, round k's pair
    explode recomputes the k-1 chained ``replace`` expressions over
    the persisted base — O(n_merges^2) total string work and an
    n_merges-deep plan, nothing at the registered 6 rounds but the
    exact plan-growth hazard the components loop measured at
    1.8 -> 272 s/round. Between cuts the plan carries at most 8
    replaces; the superseded cut's blocks are freed as each new cut
    lands, and the final cut is freed before return (the trainer
    returns plain merge rows, never a frame). ``round_secs`` (optional
    list) receives per-round wall seconds — the observability seam the
    flat-time test uses."""
    import time as _time

    from ripcurrent_spark.operators import cachereg
    from ripcurrent_spark.operators.dedup import (
        _release_local_checkpoint,
        ngrams_of_tokens,
    )

    w = cachereg.track(
        words.select(
            F.concat(
                F.lit(" "),
                F.rtrim(F.regexp_replace(F.col(word_col), "(.)", "$1  ")),
                F.lit(" "),
            ).alias("sym"),
            F.col(count_col).cast("long").alias("n"),
        ).persist()
    )
    out: list[dict] = []
    last_cut = None  # the live localCheckpoint whose blocks we own
    for rnd in range(1, n_merges + 1):
        t0 = _time.monotonic()
        t = w.select(tokens("sym").alias("toks"), "n")
        pairs = t.select(
            F.explode(
                ngrams_of_tokens(F.col("toks"), n=2, distinct=False)
            ).alias("pair"),
            "n",
        )
        best = (
            pairs.groupBy("pair")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), "pair")
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, cnt = best[0]["pair"], int(best[0]["cnt"])
        left, right = pair.split(" ")
        merged = left + right
        out.append(
            {
                "round": rnd,
                "left_tok": left,
                "right_tok": right,
                "merged": merged,
                "n": cnt,
            }
        )
        w = w.select(
            F.replace(
                F.col("sym"), F.lit(f" {left}  {right} "), F.lit(f" {merged} ")
            ).alias("sym"),
            "n",
        )
        if rnd % _BPE_CUT_EVERY == 0:
            cut = w.localCheckpoint()  # eager: materialize + truncate plan
            if last_cut is not None:
                _release_local_checkpoint(last_cut)
            last_cut = cut
            w = cut
        if round_secs is not None:
            round_secs.append(_time.monotonic() - t0)
    if last_cut is not None:
        # Nothing returned references the symbol table — free it now.
        _release_local_checkpoint(last_cut)
    return out
