"""Release seam for persisted frames whose cache must outlive the
query call (VERDICT r7 #2).

Several registry queries persist an intermediate frame that BOTH some
internal consumer and the RETURNED frame's lineage read (a self-join's
two sides, a frequency aggregate plus its join-back, an iterative
fixpoint's final state). They cannot unpersist before returning — the
caller's first action would recompute the expensive subtree — so
without a seam each call leaks one cached frame into a long-lived
session (bench.py and tools/sf_sweep.py clear cache per slot and never
notice; a library consumer accumulates).

The seam: queries register such frames with :func:`track` and the
caller releases them with :func:`release_tracked` once done with the
returned frame (or keeps using ``spark.catalog.clearCache()``, which
subsumes it).

Recomputability is NOT part of the contract. Most tracked handles are
plain ``persist()`` frames — unpersist drops the cache, the lineage
stays valid, later actions just recompute. But CHECKPOINT-backed
handles (connected_components and everything derived from it:
dedup_keep_best, dedup_apply_consensus, mm_phash_keep_one) have no
lineage behind their storage: after release, any action on those
returned frames fails with missing-checkpoint-block errors instead of
recomputing. The one safe discipline for both kinds: call
``release_tracked()`` only once every consumer of every returned
frame is finished — never mid-use.

tests/test_cache_hygiene.py sweeps EVERY registry query: run, release,
assert zero cached frames remain — so the leak class cannot recur when
new queries land.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted frame for :func:`release_tracked`
    and return it unchanged."""
    _TRACKED.append(df)
    return df


def release_tracked(blocking: bool = True) -> int:
    """Unpersist every tracked frame (newest first) and return how
    many were released. Idempotent: frames whose cache was already
    dropped (clearCache, session restart) unpersist as a no-op. A
    persist()-backed frame released here recomputes from lineage if
    used again; a CHECKPOINT-backed frame does NOT (see the module
    docstring) — release only after all consumers are done."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking=blocking)
        except Exception:  # noqa: BLE001 - release path: a dead session
            pass  # (stopped JVM) must not mask the caller's own errors
        n += 1
    return n
