"""Sweep every registry query once at a given SF dir and record wall
times + failures.

Purpose: catch scale cliffs (skew blowups, executor memory, codegen
stalls, quadratic candidate generation) that sf0.01/sf0.1 hide. The
driver gates correctness at sf0.01 and bench runs sf0.1; this sweep is
the sf1.0 smoke that every operator still EXECUTES and finishes in
sane time at 10x bench scale (data from tools/gen_testdata.py).

Writes one JSON artifact: per-query {wall_sec, rows, error}, sorted
slowest-first, plus totals. Row *values* are not asserted (the
generator is not the driver's); count>=0 plus no exception is the
pass bar here.

Usage:
  python tools/sf_sweep.py --sf-dir /root/repo/.scratch/sf1 \
      --out SF1_SWEEP.json [--only name1,name2] [--timeout 600]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", default="SF1_SWEEP.json")
    ap.add_argument("--only", default="")
    ap.add_argument("--per-query-timeout", type=int, default=900)
    args = ap.parse_args()

    from ripcurrent_spark.operators.sigstore import named_artifacts
    from ripcurrent_spark.queries import all_queries
    from ripcurrent_spark.session import get_spark

    spark = get_spark(app_name="sf_sweep")
    qs = all_queries()
    # Artifact BUILDS are first-class sweep entries (VERDICT r6 #5):
    # the query slots below read warm artifacts (the steady-state
    # production shape), so each one-time build is evicted and timed
    # under its own name instead of hiding in a prose footnote.
    arts = named_artifacts(spark, args.sf_dir)
    runnable = list(arts) + list(qs)
    names = [n.strip() for n in args.only.split(",") if n.strip()] or runnable

    # Warm the session before the first timed slot: JVM JIT, codegen,
    # Arrow python workers, and the parquet reader path otherwise land
    # entirely on whichever query happens to run first (the full-sweep
    # artifact showed the first registry query 4x its --only time).
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(str(Path(args.sf_dir) / "nation.parquet"))
    warm.groupBy("n_regionkey").count().collect()
    import pandas as _pd  # noqa: F401

    warm.mapInPandas(lambda it: it, warm.schema).count()

    import threading

    results: dict[str, dict] = {}
    t_all = time.perf_counter()
    for i, name in enumerate(names):
        if name in arts:
            reader, digest_dir = arts[name]
            # Evict so the timed slot pays the FULL cold build + land.
            import shutil

            shutil.rmtree(digest_dir(), ignore_errors=True)
            runner = lambda reader=reader: reader().count()
        else:
            runner = lambda q=qs[name]: q.spark(spark, args.sf_dir).count()
        # Intra-query persist() must not carry over (same hygiene as
        # bench.py): a query's cached frames resident across the rest
        # of the sweep both flatter later siblings that re-derive the
        # same frames and evict/spill their own caches — each slot
        # measures the query COLD, from its own scans.
        spark.catalog.clearCache()
        from ripcurrent_spark.operators.cachereg import release_tracked

        release_tracked(blocking=False)  # drop seam handles, not just blocks
        t0 = time.perf_counter()
        # Enforce the per-query budget: a timer cancels the query's
        # job group so one scale cliff can't eat the whole sweep.
        sc = spark.sparkContext
        sc.setJobGroup(f"sweep-{name}", name, interruptOnCancel=True)
        timer = threading.Timer(
            args.per_query_timeout, lambda: sc.cancelJobGroup(f"sweep-{name}")
        )
        timer.start()
        try:
            n_rows = runner()
            err = None
        except Exception as e:  # noqa: BLE001 - record, keep sweeping
            n_rows = None
            kind = type(e).__name__
            if time.perf_counter() - t0 >= args.per_query_timeout:
                kind = f"TIMEOUT>{args.per_query_timeout}s/{kind}"
            err = f"{kind}: {str(e)[:400]}"
        finally:
            timer.cancel()
            sc.setJobGroup("", "")
        wall = round(time.perf_counter() - t0, 3)
        results[name] = {"wall_sec": wall, "rows": n_rows, "error": err}
        status = "ERR " if err else "ok  "
        print(f"[{i+1}/{len(names)}] {status}{name}: {wall}s rows={n_rows}", flush=True)
        if err:
            print(f"      {err}", flush=True)
        # Checkpoint after every query so a killed sweep keeps its
        # partial results (the artifact rewrite below is the final word).
        Path(args.out + ".partial").write_text(json.dumps(results, indent=1))

    total = round(time.perf_counter() - t_all, 1)
    ordered = dict(
        sorted(results.items(), key=lambda kv: -(kv[1]["wall_sec"]))
    )
    artifact = {
        "sf_dir": args.sf_dir,
        "n_queries": len(names),
        "n_errors": sum(1 for r in results.values() if r["error"]),
        "total_wall_sec": total,
        "queries_slowest_first": ordered,
    }
    Path(args.out).write_text(json.dumps(artifact, indent=1))
    print(f"\nwrote {args.out}: {len(names)} queries, "
          f"{artifact['n_errors']} errors, {total}s total")
    return 1 if artifact["n_errors"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
