"""Print the physical plan of any registry query — the plan-audit
loop (`.explain("formatted")` and iterate) as a one-liner.

Usage:
  python tools/explain_query.py q3_shipping_priority [--sf-dir DIR]
  python tools/explain_query.py --list
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name", nargs="?")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--mode", default="formatted",
                    choices=["simple", "extended", "formatted", "cost", "codegen"])
    args = ap.parse_args()

    from ripcurrent_spark.queries import all_queries

    qs = all_queries()
    if args.list or not args.name:
        for n, q in qs.items():
            print(f"{n:40s} {'oracle' if q.oracle else 'rows-only'}")
        return 0
    if args.name not in qs:
        print(f"unknown query {args.name!r}; --list shows all", file=sys.stderr)
        return 1

    from ripcurrent_spark.session import get_spark

    spark = get_spark(app_name="explain")
    qs[args.name].spark(spark, args.sf_dir).explain(args.mode)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
