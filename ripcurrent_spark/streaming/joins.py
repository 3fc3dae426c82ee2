"""Stream-stream interval joins: inner, LEFT, RIGHT and FULL OUTER.

The inner form is the streaming twin of the batch bucketed range join
(operators/intervals.py): both sides watermarked, equi-key plus a
time-range condition, state evicted once the watermark passes a row's
match window. The OUTER forms add the semantic the inner join cannot
express: a row whose window closes unmatched is emitted exactly once
with null other-side columns — but only after the watermark proves no
match can still arrive, so results are late-data-correct, not
trigger-timing-dependent. All four forms are proven equal to the
batch join on the same predicate (tests/test_streaming_joins.py),
and an unmatched row whose window has NOT yet closed stays in state,
never half-emitted.

Scale posture: state per side is bounded by (watermark + interval
width) of traffic; the join is hash-partitioned on the key like its
batch twin, so a 1000-executor cluster shards state by key. Skewed
hot keys are the same lever as batch (salt the key into the
condition); no state grows with total history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _interval_cond(key, ts, lower, upper):
    """The one join condition both forms share: same-key, right ts in
    [left ts + lower, left ts + upper] — boundary semantics live HERE
    so the streamed result can never silently diverge from its batch
    reference."""
    lk, rk = key
    lt, rt = ts
    return (
        (F.col(lk) == F.col(rk))
        & (F.col(rt) >= F.col(lt) + F.expr(f"INTERVAL {lower}"))
        & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {upper}"))
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: tuple[str, str],
    ts: tuple[str, str],
    lower: str = "0 seconds",
    upper: str = "30 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join two STREAMING frames on ``key`` where the right event's
    timestamp falls within [left_ts + lower, left_ts + upper].

    ``how`` in {'inner', 'left_outer', 'right_outer', 'full_outer'}:
    the outer forms emit unmatched rows (null other-side columns)
    once the watermark passes the end of their match window — the
    point after which a match is provably impossible. Column names
    must be disjoint across the two sides (streaming joins cannot
    alias after the fact)."""
    lw = left.withWatermark(ts[0], watermark)
    rw = right.withWatermark(ts[1], watermark)
    return lw.join(rw, _interval_cond(key, ts, lower, upper), how)


def interval_join_batch(
    left: DataFrame,
    right: DataFrame,
    key: tuple[str, str],
    ts: tuple[str, str],
    lower: str = "0 seconds",
    upper: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """The batch reference semantics for :func:`interval_join_streams`
    (what the streamed result must converge to once every watermark
    has passed)."""
    return left.join(right, _interval_cond(key, ts, lower, upper), how)
