"""Min-merge two or more sf_sweep artifacts into one.

Ambient load only ever ADDS time on this VM (the repo's measured
5-10x noisy-neighbor episodes), so the per-query MIN across spaced
same-code runs is the best available estimate of the code's cost.
Only merge runs of the SAME code on the SAME fixture — a changed
fixture (e.g. the r9 vocabulary regeneration) invalidates every
earlier number for data-dependent entries.

Usage: python tools/merge_sweeps.py OUT in1.json in2.json [...] \
       [--note "measurement note"]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("--note", default="")
    args = ap.parse_args()

    runs = [json.load(open(p)) for p in args.inputs]
    base = runs[0]
    merged: dict[str, dict] = {}
    for r in runs:
        for name, row in r["queries_slowest_first"].items():
            cur = merged.get(name)
            if row["error"] is not None:
                if cur is None:
                    merged[name] = dict(row)
                continue
            if cur is None or cur["error"] is not None or row["wall_sec"] < cur["wall_sec"]:
                merged[name] = dict(row)
    ordered = dict(sorted(merged.items(), key=lambda kv: -(kv[1]["wall_sec"])))
    # ADVICE r9: the min-merged sum is a MODELED total no single run
    # achieved — record each run's observed total and the best one
    # alongside it so the artifact distinguishes modeled from
    # observed wall time.
    run_totals = [
        round(sum(v["wall_sec"] for v in r["queries_slowest_first"].values()), 1)
        for r in runs
    ]
    out = {
        "sf_dir": base["sf_dir"],
        "n_queries": len(ordered),
        "n_errors": sum(1 for v in ordered.values() if v["error"] is not None),
        "total_wall_sec": round(sum(v["wall_sec"] for v in ordered.values()), 1),
        "total_wall_sec_model": "per-query MIN across runs (no single run achieved this)",
        "observed_run_totals_sec": run_totals,
        "best_observed_total_sec": min(run_totals),
        "measurement": args.note
        or f"cold-slot model (clearCache per slot); per-query MIN across {len(runs)} same-code sweeps",
        "queries_slowest_first": ordered,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(
        f"wrote {args.out}: {out['n_queries']} queries, "
        f"{out['n_errors']} errors, {out['total_wall_sec']}s total (min-merged)"
    )


if __name__ == "__main__":
    main()
