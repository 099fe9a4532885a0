"""Ops CLI for manifest-log tables (`sources/lakehouse.py::LogTable`):

    python -m wod_ascii_to_parquet_spark_spark.table_cli history  <dir>
    python -m wod_ascii_to_parquet_spark_spark.table_cli show     <dir> [--version N]
    python -m wod_ascii_to_parquet_spark_spark.table_cli optimize <dir> [--target-files N]
    python -m wod_ascii_to_parquet_spark_spark.table_cli vacuum   <dir> [--keep N] [--min-age-hours H]

The maintenance surface a scheduled job or an operator at a terminal
needs — the `DESCRIBE HISTORY` / `OPTIMIZE` / `VACUUM` triple of the
native formats, against the jar-free tables this engine writes. Output
is one JSON document per invocation (machine-consumable, like bench.py).
"""

from __future__ import annotations

import argparse
import json

from .registry import cached_frames
from .session import get_spark
from .sources.lakehouse import LogTable


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="logtable")
    sub = p.add_subparsers(dest="cmd", required=True)

    hist = sub.add_parser("history", help="list snapshots (version, mode, files, meta)")
    hist.add_argument("table_dir")

    show = sub.add_parser("show", help="row count + schema of a snapshot")
    show.add_argument("table_dir")
    show.add_argument("--version", type=int, default=None)

    opt = sub.add_parser("optimize", help="compact the current snapshot")
    opt.add_argument("table_dir")
    opt.add_argument("--target-files", type=int, default=1)

    vac = sub.add_parser("vacuum", help="reclaim unreferenced data files")
    vac.add_argument("table_dir")
    vac.add_argument("--keep", type=int, default=1, help="versions to retain")
    vac.add_argument(
        "--min-age-hours",
        type=float,
        default=1.0,
        help="never delete files younger than this (in-flight-writer guard)",
    )

    for s in (hist, show, opt, vac):
        s.add_argument("--master", default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = get_spark(app_name="logtable-cli", master=args.master)
    t = LogTable(spark, args.table_dir)
    # cached_frames: get_spark() reuses one session across in-process
    # invocations (a scheduled-ops loop calling main() N times is the
    # documented long-lived shape), so any persist() a table op does must
    # not accumulate one CacheManager entry per invocation.
    with cached_frames():
        return _dispatch(args, t)


def _dispatch(args, t: LogTable) -> int:
    if args.cmd == "history":
        out = [
            {
                "version": v,
                "mode": (m := t.manifest(v))["mode"],
                "n_files": len(t.resolve_files(m)[0]),
                "parent": m["parent"],
                "meta": m.get("meta", {}),
            }
            for v in t.versions()
        ]
        print(json.dumps({"table": t.dir, "history": out}))
    elif args.cmd == "show":
        # Resolve the snapshot ONCE: rows, version, and schema must all
        # come from the same manifest — resolving three times (read(None)
        # + latest_version() + manifest(None)) can straddle a concurrent
        # commit and print a chimera of two snapshots.
        version = (
            args.version if args.version is not None else t.latest_version()
        )
        doc = t.manifest(version)
        print(
            json.dumps(
                {
                    "table": t.dir,
                    "version": version,
                    "rows": t.read(version=version).count(),
                    "schema": doc.get("schema", {}),
                }
            )
        )
    elif args.cmd == "optimize":
        v = t.optimize(target_files=args.target_files)
        print(
            json.dumps(
                {
                    "table": t.dir,
                    "new_version": v,
                    "n_files": len(t.manifest(v)["files"]),
                }
            )
        )
    elif args.cmd == "vacuum":
        deleted = t.vacuum(
            keep_versions=args.keep,
            min_age_seconds=args.min_age_hours * 3600.0,
        )
        print(
            json.dumps(
                {
                    "table": t.dir,
                    "deleted_files": len(deleted),
                    "kept_versions": t.versions(),
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
