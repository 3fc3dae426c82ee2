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


def scoped():
    """Context manager releasing ONLY the frames tracked inside the
    scope — for callers that run a tracked-frame-producing operator
    inside a longer-lived session that OWNS OTHER tracked handles
    (ADVICE r9: streaming foreachBatch calling connected_components
    must not drain checkpoint-backed handles held by concurrent batch
    consumers, which the global release_tracked() would permanently
    break — checkpoint storage does not recompute). On exit every
    frame appended after entry is released, newest first; frames
    tracked before entry are untouched.

    Single-writer discipline: the registry is a plain list, so a
    DIFFERENT thread tracking frames while a scope is open would see
    its frames released by the scope's exit. Same-thread nesting is
    fine (inner scopes release their own suffix first)."""
    from contextlib import contextmanager

    @contextmanager
    def _scope():
        mark = len(_TRACKED)
        try:
            yield
        finally:
            _release_from(mark)

    return _scope()


def _release_from(mark: int, blocking: bool = True) -> int:
    n = 0
    while len(_TRACKED) > mark:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking=blocking)
        except Exception:  # noqa: BLE001 - release path: a dead session
            pass
        n += 1
    return n


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
