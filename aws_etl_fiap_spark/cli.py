"""CLI entry point (reference S10/S11): the Glue job's ``getResolvedOptions``
parameterization (b3_transform.py:204-220 reads JOB_NAME/S3 paths from job
args) as a plain argparse program over ``plans.pipeline.run_pipeline``.

Usage:
    python -m aws_etl_fiap_spark.cli --warehouse /path/wh --keys AAA4,BBB3
"""

from __future__ import annotations

import argparse
import json
from collections.abc import Sequence


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="aws-etl-fiap-spark")
    ap.add_argument("--warehouse", required=True, help="output root (raw/ + refined/)")
    ap.add_argument("--keys", required=True, help="comma-separated instrument keys")
    ap.add_argument("--database", default="b3_data", help="catalog database name")
    ap.add_argument("--cpus", type=int, default=None, help="local[N] cores")
    return ap


def main(argv: Sequence[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from aws_etl_fiap_spark.plans.pipeline import run_pipeline
    from aws_etl_fiap_spark.session import get_spark

    spark = get_spark(
        app_name="aws_etl_fiap_spark-cli",
        master=f"local[{args.cpus}]" if args.cpus else None,
    )
    result = run_pipeline(
        spark, args.warehouse, args.keys.split(","), database=args.database
    )
    print(json.dumps({"raw_rows": result.raw_count, "refined_rows": result.refined_count}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
