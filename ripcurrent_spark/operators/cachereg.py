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

Thread safety (ADVICE r10 #1): the registry is shared session state
and its motivating concurrent case is real — foreachBatch runs on the
stream-execution thread while batch consumers track frames on other
threads. Mutations are lock-guarded, every entry records the tracking
thread and a global sequence number, and :func:`scoped` releases
exactly the entries ITS OWN thread tracked inside the scope —
a concurrent thread's track() during an open scope is untouched (the
old length-suffix release would have unpersisted the foreign handle
and leaked the scope's own).

tests/test_cache_hygiene.py sweeps EVERY registry query: run, release,
assert zero cached frames remain — so the leak class cannot recur when
new queries land.
"""

from __future__ import annotations

import threading
from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_SEQ = 0
# (frame, seq, tracking thread ident) — seq is globally monotonic so a
# scope can name "entries after my entry point" without list indices.
_TRACKED: list[tuple[DataFrame, int, int]] = []


def tracked_frames() -> list[DataFrame]:
    """Snapshot of the tracked frames, oldest first (tests/debugging)."""
    with _LOCK:
        return [e[0] for e in _TRACKED]


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted frame for :func:`release_tracked`
    and return it unchanged."""
    global _SEQ
    with _LOCK:
        _SEQ += 1
        _TRACKED.append((df, _SEQ, threading.get_ident()))
    return df


def scoped():
    """Context manager releasing ONLY the frames THIS thread tracked
    inside the scope — for callers that run a tracked-frame-producing
    operator inside a longer-lived session that OWNS OTHER tracked
    handles (ADVICE r9: streaming foreachBatch calling
    connected_components must not drain checkpoint-backed handles held
    by concurrent batch consumers, which the global release_tracked()
    would permanently break — checkpoint storage does not recompute).

    On exit, entries with (thread == mine, seq > my entry mark) are
    removed and released newest-first; everything else — frames tracked
    before entry AND frames a concurrent thread tracked while the scope
    was open (ADVICE r10) — stays registered for its own owner's
    release. Same-thread nesting is fine (inner scopes release their
    own tail first)."""
    from contextlib import contextmanager

    @contextmanager
    def _scope():
        ident = threading.get_ident()
        with _LOCK:
            mark = _SEQ
        try:
            yield
        finally:
            with _LOCK:
                mine = [e for e in _TRACKED if e[2] == ident and e[1] > mark]
                for e in mine:
                    _TRACKED.remove(e)
            _unpersist_all(mine)

    return _scope()


def _unpersist_all(entries, blocking: bool = True) -> int:
    """Release entries newest-first, outside the registry lock (the
    JVM call can block)."""
    n = 0
    for df, _, _ in sorted(entries, key=lambda e: -e[1]):
        try:
            df.unpersist(blocking=blocking)
        except Exception:  # noqa: BLE001 - release path: a dead session
            pass  # (stopped JVM) must not mask the caller's own errors
        n += 1
    return n


def release_tracked(blocking: bool = True) -> int:
    """Unpersist every tracked frame (newest first, all threads) and
    return how many were released. Idempotent: frames whose cache was
    already dropped (clearCache, session restart) unpersist as a
    no-op. A persist()-backed frame released here recomputes from
    lineage if used again; a CHECKPOINT-backed frame does NOT (see the
    module docstring) — release only after all consumers are done."""
    with _LOCK:
        entries = list(_TRACKED)
        _TRACKED.clear()
    return _unpersist_all(entries, blocking)
