#!/usr/bin/env python
"""Measured production-vocabulary run for the tokenizer-audit pair
(VERDICT r7 #1 'done' criterion): at sf1,

- text_vocab_coverage's operator with a 50,000-entry vocabulary
  (InSet probe — the registered query's 20-word table is the oracle
  fixture, the InSet plan shape is identical at any size), and
- text_bpe_apply's operator with a 10,016-entry merge table through
  the RANKED engine (per-doc priority merging — cost independent of
  table size) vs the chained-replace oracle engine at its toy size.

Bound stated up front: each production-size run must land under 60 s
wall at sf1 on local[32] (the whole sf1 sweep's worst single query is
~21 s; these are map-only single scans). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import time

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", str(ROOT / ".scratch" / "sf1"))
BOUND_SEC = 60.0


def main() -> None:
    from pyspark.sql import functions as F

    from ripcurrent_spark.io import load
    from ripcurrent_spark.operators import text as TX
    from ripcurrent_spark.operators.dedup import tokens
    from ripcurrent_spark.queries.text import _BPE_MERGES, _VOCAB
    from ripcurrent_spark.session import get_spark

    spark = get_spark(app_name="vocab_scale")
    d = load(spark, SF, "documents")
    d.count()  # warm scan
    spark.range(8).mapInPandas(lambda it: it, schema="id long").count()

    out: dict[str, float | int | str] = {"sf": SF, "bound_sec": BOUND_SEC}

    # --- vocabulary coverage at 50k entries (InSet) -------------------
    vocab = list(_VOCAB) + [f"vw{i}" for i in range(50_000 - len(_VOCAB))]
    t = d.select("doc_id", tokens("text").alias("toks"))
    t0 = time.perf_counter()
    hits = TX.vocab_in_hits("toks", vocab)
    n = F.size("toks")
    t.select(
        "doc_id", n.alias("n_tokens"), hits.alias("n_in_vocab")
    ).agg(F.sum("n_in_vocab")).collect()
    out["vocab_coverage_50k_sec"] = round(time.perf_counter() - t0, 2)
    out["vocab_entries"] = len(vocab)

    # --- BPE apply: ranked engine at 10k merges ------------------------
    merges = list(_BPE_MERGES) + [(f"mw{i}a", f"mw{i}b") for i in range(10_000)]
    t0 = time.perf_counter()
    TX.apply_bpe(d, merges, tokenizer=TX.bpe_ranked_merge(merges)).agg(
        F.sum("n_merges_applied")
    ).collect()
    out["bpe_ranked_10k_sec"] = round(time.perf_counter() - t0, 2)
    out["bpe_merge_entries"] = len(merges)

    # --- reference point: oracle engine at its toy size ----------------
    t0 = time.perf_counter()
    TX.apply_bpe(d, list(_BPE_MERGES)).agg(F.sum("n_merges_applied")).collect()
    out["bpe_chained_16_sec"] = round(time.perf_counter() - t0, 2)

    out["within_bound"] = bool(
        out["vocab_coverage_50k_sec"] <= BOUND_SEC
        and out["bpe_ranked_10k_sec"] <= BOUND_SEC
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
