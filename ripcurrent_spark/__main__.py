"""``python -m ripcurrent_spark --config conf/config.properties``.

The reference runs as a standalone app (Main.java:83: load config,
parse libraries, start the engine, run until signaled); this is the
same deliverable over Spark Structured Streaming."""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m ripcurrent_spark",
        description="Config-driven CDC replicate+mask pipeline (Spark).",
    )
    ap.add_argument("--config", required=True, help="properties file path")
    ap.add_argument(
        "--once",
        action="store_true",
        help="process available input, then exit (default: run until signaled)",
    )
    args = ap.parse_args(argv)

    from ripcurrent_spark.app import run_app
    from ripcurrent_spark.session import get_spark

    spark = get_spark(app_name="ripcurrent_spark")
    handle = run_app(spark, args.config, once=args.once)
    print(
        f"ripcurrent_spark: {len(handle.plans)} table pipeline(s) "
        f"{'drained' if args.once else 'stopped'}; "
        f"schema changes -> {handle.schema_change_log}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
