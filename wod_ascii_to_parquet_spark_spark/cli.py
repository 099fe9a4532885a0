"""CLI mirroring the reference's picocli surface (``Sparkler.java:33-74``).

Flags map 1:1 where meaningful on a local/posix filesystem; S3
bucket/region/credential plumbing (``Sparkler.java:79-87``) is out of scope
for the local harness and would be s3a configs on the session.

Usage:
    python -m wod_ascii_to_parquet_spark_spark.cli \
        --source /root/reference/src/test/resources/wod \
        --output /tmp/wod_out -d CTD -d XBT -p OBS
"""

from __future__ import annotations

import argparse
import json
import sys

from .plans.convert import DEFAULT_DATASETS, DEFAULT_LEVELS, convert
from .session import get_spark


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="wod-ascii-to-parquet-spark",
        description="Convert WOD ASCII casts to geohash-partitioned parquet.",
    )
    p.add_argument("--source", required=True, help="input root: <src>/<DS>/<LEVEL>/*.gz")
    p.add_argument("--output", required=True, help="output root (yearly/ + error/)")
    p.add_argument(
        "-d", "--dataset", action="append", default=None,
        help=f"dataset code(s); default {','.join(DEFAULT_DATASETS)}",
    )
    p.add_argument(
        "-p", "--processing-level", action="append", default=None,
        help="processing level(s); default OBS",
    )
    p.add_argument(
        "-s", "--subset", action="append", default=None,
        help="explicit file name(s) to process instead of all *.gz",
    )
    p.add_argument("-o", "--overwrite", action="store_true")
    p.add_argument("--max-concurrent", type=int, default=4)
    p.add_argument("--master", default=None, help="spark master (default local[ncpu])")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = get_spark(app_name="wod-convert", master=args.master)
    result = convert(
        spark,
        source=args.source,
        output=args.output,
        datasets=tuple(args.dataset or DEFAULT_DATASETS),
        levels=tuple(args.processing_level or DEFAULT_LEVELS),
        subset=tuple(args.subset or ()),
        overwrite=args.overwrite,
        max_concurrent=args.max_concurrent,
    )
    print(
        json.dumps(
            {
                "converted": result.converted,
                "skipped": result.skipped,
                "failed": result.failed,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
