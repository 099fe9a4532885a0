"""Ops CLI for manifest-log tables (`sources/lakehouse.py::LogTable`):

    python -m wod_ascii_to_parquet_spark_spark.table_cli history  <dir>
    python -m wod_ascii_to_parquet_spark_spark.table_cli show     <dir> [--version N]
    python -m wod_ascii_to_parquet_spark_spark.table_cli optimize <dir> [--target-files N]
    python -m wod_ascii_to_parquet_spark_spark.table_cli vacuum   <dir> [--keep N] [--min-age-hours H]
    python -m wod_ascii_to_parquet_spark_spark.table_cli delete-where <dir> --predicate 'k >= 10'
    python -m wod_ascii_to_parquet_spark_spark.table_cli update-where <dir> --predicate 'k >= 10' --set 'v=upper(v)'
    python -m wod_ascii_to_parquet_spark_spark.table_cli vacuum-index <table> --kind {minhash,ann} [--dry-run]
    python -m wod_ascii_to_parquet_spark_spark.table_cli verify-index <table> --kind {minhash,ann} [--strict]
    python -m wod_ascii_to_parquet_spark_spark.table_cli delete-index <table> --kind {minhash,ann} --ids 1,2,3
    python -m wod_ascii_to_parquet_spark_spark.table_cli drift-index <table>
    python -m wod_ascii_to_parquet_spark_spark.table_cli requantize-index <table> --vectors <parquet> [--attr-cols ...]
    python -m wod_ascii_to_parquet_spark_spark.table_cli locks    <table>

The maintenance surface a scheduled job or an operator at a terminal
needs — the `DESCRIBE HISTORY` / `OPTIMIZE` / `VACUUM` triple of the
native formats, against the jar-free tables this engine writes, plus
`vacuum-index` for the persisted dedup/ANN index lifecycle
(`plans/minhash_index.py` / `plans/ann_index.py`, VERDICT r10 #5):
`--dry-run` prints the per-side build_id generations a vacuum would
drop and the file counts it would compact, without touching the index.
`locks` lists the index's maintenance-lock fence state (r13: the
append/vacuum collision is refused via advisory filesystem locks —
see `plans/ann_index._maintenance_lock`); a refused `vacuum-index`
exits 3 with the named conflict as JSON so a scheduler can
distinguish "retry later" from real failure. Output is one JSON
document per invocation (machine-consumable, like bench.py).
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

    dw = sub.add_parser(
        "delete-where",
        help="copy-on-write DELETE on a LogTable: rewrite only the files "
        "containing matching rows (untouched files carry by reference); "
        "the pre-delete snapshot stays time-travelable until vacuum",
    )
    dw.add_argument("table_dir", help="LogTable directory")
    dw.add_argument(
        "--predicate",
        required=True,
        help="SQL predicate; rows where it is TRUE are deleted "
        "(NULL keeps the row — three-valued logic)",
    )

    uw = sub.add_parser(
        "update-where",
        help="copy-on-write UPDATE … SET on a LogTable: rewrite only the "
        "files containing matching rows; all SET expressions evaluate "
        "against the pre-update row (simultaneous assignment)",
    )
    uw.add_argument("table_dir", help="LogTable directory")
    uw.add_argument(
        "--predicate",
        required=True,
        help="SQL predicate; rows where it is TRUE are updated "
        "(NULL leaves the row unchanged — three-valued logic)",
    )
    uw.add_argument(
        "--set",
        required=True,
        action="append",
        metavar="COL=EXPR",
        help="assignment 'column=sql_expression'; repeatable — all "
        "assignments see the PRE-update row",
    )

    vidx = sub.add_parser(
        "vacuum-index",
        help="compact a persisted minhash/ANN index and drop superseded "
        "build generations (catalog table, not a LogTable dir)",
    )
    vidx.add_argument("table", help="catalog table name of the index")
    vidx.add_argument("--kind", choices=("minhash", "ann"), required=True)
    vidx.add_argument(
        "--dry-run",
        action="store_true",
        help="print the generations a vacuum would drop; change nothing",
    )

    vfy = sub.add_parser(
        "verify-index",
        help="integrity report for a persisted minhash/ANN index "
        "(torn/double appends, stranded build generations) — read-only. "
        "Exit 1 on corruption ('consistent' false). NOTE the kind "
        "asymmetry: minhash counts stranded generations as vacuum-able "
        "debt, not corruption (probe results are unaffected — candidates "
        "are deduped and verified against exact shingles), so its "
        "'consistent' excludes them; ANN counts them as corruption "
        "(stale codes score garbage ADC distances). Use --strict to "
        "alert on stranded generations for BOTH kinds.",
    )
    vfy.add_argument("table", help="catalog table name of the index")
    vfy.add_argument("--kind", choices=("minhash", "ann"), required=True)
    vfy.add_argument(
        "--strict",
        action="store_true",
        help="exit nonzero unless consistent AND current-generation-only "
        "— lets a scheduler alert on the state vacuum heals without "
        "parsing JSON (ADVICE r11: minhash stranded generations "
        "otherwise exit 0)",
    )

    didx = sub.add_parser(
        "delete-index",
        help="tombstone ids out of a persisted minhash/ANN index (the "
        "takedown path): O(|id set|) sidecar append, masked at every "
        "probe, physically reclaimed by the next vacuum-index. Exit 3 "
        "(retry later) if a vacuum holds the maintenance fence.",
    )
    didx.add_argument("table", help="catalog table name of the index")
    didx.add_argument("--kind", choices=("minhash", "ann"), required=True)
    didx.add_argument(
        "--ids",
        required=True,
        help="comma-separated vec_ids (ann) / doc_ids (minhash) to delete",
    )

    drf = sub.add_parser(
        "drift-index",
        help="quantizer drift report for a persisted ANN index "
        "(read-only): cell-population imbalance_factor / top_cell_share "
        "/ empty cells — the scheduled retrain trigger for the frozen-"
        "quantizer append path (see plans/ann_index.requantize_ann_index)",
    )
    drf.add_argument("table", help="catalog table name of the ANN index")

    rqz = sub.add_parser(
        "requantize-index",
        help="retrain a persisted ANN index's quantizer on the CURRENT "
        "corpus (md5-spread seeds) and rebuild — the action drift-index "
        "triggers; preserves deletions and attribute columns. Exit 3 "
        "(retry later) if a mutator holds the maintenance fence.",
    )
    rqz.add_argument("table", help="catalog table name of the ANN index")
    rqz.add_argument(
        "--vectors",
        required=True,
        help="parquet path of the live corpus vectors",
    )
    rqz.add_argument("--id-col", default="vec_id")
    rqz.add_argument("--emb-col", default="embedding")
    rqz.add_argument(
        "--n-cells",
        type=int,
        default=None,
        help="override the ceil(sqrt(N)) cell-count rule",
    )
    rqz.add_argument(
        "--attr-cols",
        default=None,
        help="comma-separated attribute columns to re-store alongside "
        "the codes (required if the index stores attributes)",
    )

    lck = sub.add_parser(
        "locks",
        help="list an index's maintenance-lock fence state (read-only): "
        "each advisory lock file with holder pid/host and age — the "
        "append/vacuum collision guard of plans/ann_index",
    )
    lck.add_argument("table", help="catalog table name of the index")

    for s in (hist, show, opt, vac, dw, uw, vidx, vfy, didx, drf, rqz, lck):
        s.add_argument("--master", default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = get_spark(app_name="logtable-cli", master=args.master)
    if args.cmd == "vacuum-index":
        with cached_frames():
            return _vacuum_index(spark, args)
    if args.cmd == "verify-index":
        with cached_frames():
            return _verify_index(spark, args)
    if args.cmd == "delete-index":
        with cached_frames():
            return _delete_index(spark, args)
    if args.cmd == "drift-index":
        from .plans.ann_index import quantizer_drift_report

        with cached_frames():
            print(json.dumps(quantizer_drift_report(spark, args.table)))
        return 0
    if args.cmd == "requantize-index":
        with cached_frames():
            return _requantize_index(spark, args)
    if args.cmd == "locks":
        return _index_locks(spark, args)
    t = LogTable(spark, args.table_dir)
    # cached_frames: get_spark() reuses one session across in-process
    # invocations (a scheduled-ops loop calling main() N times is the
    # documented long-lived shape), so any persist() a table op does must
    # not accumulate one CacheManager entry per invocation.
    with cached_frames():
        return _dispatch(args, t)


def _vacuum_index(spark, args) -> int:
    """Dispatch `vacuum-index`: the persisted-index maintenance lifecycle
    (VERDICT r10 #5), operationally reachable instead of only as
    registered queries. Dry run = generation report, no writes."""
    if args.kind == "minhash":
        from .plans.minhash_index import (
            vacuum_minhash_index,
            vacuum_minhash_index_dry_run,
        )

        run, dry = vacuum_minhash_index, vacuum_minhash_index_dry_run
    else:
        from .plans.ann_index import (
            vacuum_ann_index,
            vacuum_ann_index_dry_run,
        )

        run, dry = vacuum_ann_index, vacuum_ann_index_dry_run
    from .plans.ann_index import IndexMaintenanceConflict

    try:
        if args.dry_run:
            print(
                json.dumps(
                    dict(dry(spark, args.table), kind=args.kind, dry_run=True)
                )
            )
        else:
            print(
                json.dumps(
                    {
                        "table": args.table,
                        "kind": args.kind,
                        "stats": run(spark, args.table),
                    }
                )
            )
    except IndexMaintenanceConflict as e:
        # exit 3 = "retry later", distinct from real failure: a
        # scheduled vacuum colliding with a live appender is expected
        # operational weather, not an error to page on
        print(json.dumps({"table": args.table, "refused": str(e)}))
        return 3
    return 0


def _delete_index(spark, args) -> int:
    """Dispatch `delete-index`: the takedown path, operationally
    reachable (a compliance runbook shells out; it doesn't import
    plans/*). Ids are parsed as integers; the tombstone append is
    O(|ids|) and the next scheduled vacuum-index reclaims physically."""
    from .plans.ann_index import IndexMaintenanceConflict

    try:
        ids = [int(x) for x in args.ids.split(",") if x.strip()]
    except ValueError:
        print(json.dumps({"table": args.table, "error": "non-integer id in --ids"}))
        return 2
    if not ids:
        print(json.dumps({"table": args.table, "error": "--ids is empty"}))
        return 2
    id_col = "doc_id" if args.kind == "minhash" else "vec_id"
    frame = spark.createDataFrame([(i,) for i in ids], f"{id_col} bigint")
    try:
        if args.kind == "minhash":
            from .plans.minhash_index import delete_from_minhash_index

            n = delete_from_minhash_index(spark, frame, table=args.table)
        else:
            from .plans.ann_index import delete_from_ann_index

            n = delete_from_ann_index(spark, frame, table=args.table)
    except IndexMaintenanceConflict as e:
        print(json.dumps({"table": args.table, "refused": str(e)}))
        return 3
    print(
        json.dumps(
            {"table": args.table, "kind": args.kind, "tombstoned": n}
        )
    )
    return 0


def _requantize_index(spark, args) -> int:
    """Dispatch `requantize-index`: the maintenance action the
    drift-index report triggers, runnable from a scheduler. Prints the
    before/after drift reports so the run itself is the evidence the
    retrain paid."""
    from pyspark.sql import functions as F

    from .plans.ann_index import (
        IndexMaintenanceConflict,
        requantize_ann_index,
    )

    vectors = spark.read.parquet(args.vectors).select(
        F.col(args.id_col).alias("vec_id"),
        F.col(args.emb_col).cast("array<double>").alias("emb"),
    )
    attributes = None
    if args.attr_cols:
        cols = [c.strip() for c in args.attr_cols.split(",") if c.strip()]
        attributes = spark.read.parquet(args.vectors).select(
            F.col(args.id_col).alias("vec_id"), *cols
        )
    try:
        report = requantize_ann_index(
            spark,
            vectors,
            table=args.table,
            n_cells=args.n_cells,
            attributes=attributes,
        )
    except IndexMaintenanceConflict as e:
        print(json.dumps({"table": args.table, "refused": str(e)}))
        return 3
    print(json.dumps(report))
    return 0


def _index_locks(spark, args) -> int:
    """Dispatch `locks`: read-only view of the advisory maintenance-lock
    fence — which appends/vacuums currently hold the index, with holder
    liveness an operator can act on (a dead same-host holder is cleaned
    automatically at the next acquire; a live one means wait)."""
    import os as _os
    import socket
    import time as _time

    from .plans.ann_index import _locks_dir

    d = _locks_dir(spark, args.table)
    fs = d.getFileSystem(spark._jsc.hadoopConfiguration())
    locks = []
    if fs.exists(d):
        now_ms = _time.time() * 1000.0
        for st in fs.listStatus(d):
            name = st.getPath().getName()
            row = {
                "lock": name,
                "age_sec": round((now_ms - st.getModificationTime()) / 1000.0, 1),
            }
            try:
                stream = fs.open(st.getPath())
                try:
                    info = json.loads(bytes(stream.readNBytes(256)).decode())
                finally:
                    stream.close()
                row.update(info)
                if info.get("host") == socket.gethostname():
                    try:
                        _os.kill(int(info["pid"]), 0)
                        row["holder_alive"] = True
                    except ProcessLookupError:
                        row["holder_alive"] = False
                    except Exception:
                        row["holder_alive"] = True
            except Exception:
                row["unreadable"] = True
            locks.append(row)
    print(json.dumps({"table": args.table, "locks": locks}))
    return 0


def _verify_index(spark, args) -> int:
    """Dispatch `verify-index`: the deterministic integrity report
    (torn/double appends, duplicate rows, stranded generations) —
    read-only; exit code 1 when corruption is detected so a scheduled
    health check can alert on it."""
    if args.kind == "minhash":
        from .plans.minhash_index import verify_minhash_index as verify
    else:
        from .plans.ann_index import verify_ann_index as verify
    rep = dict(verify(spark, args.table), table=args.table, kind=args.kind)
    print(json.dumps(rep))
    ok = rep["consistent"]
    if getattr(args, "strict", False):
        # --strict folds vacuum-able debt into the exit code: minhash
        # deliberately keeps stranded generations out of 'consistent'
        # (they cannot change probe results), so a scheduler keying on
        # the exit code alone would miss the state vacuum heals.
        ok = ok and rep["current_generation_only"]
    return 0 if ok else 1


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
    elif args.cmd == "delete-where":
        from .sources.lakehouse import CommitConflict, StagingReclaimed

        try:
            rep = t.delete_where(args.predicate)
        except (CommitConflict, StagingReclaimed) as e:
            # exit 3 = retry later, the same contract as every other
            # maintenance verb: a takedown losing a commit race to a
            # concurrent writer is operational weather, not failure
            print(json.dumps({"table": t.dir, "refused": str(e)}))
            return 3
        print(json.dumps({"table": t.dir, **rep}))
    elif args.cmd == "update-where":
        from .sources.lakehouse import CommitConflict, StagingReclaimed

        set_exprs: dict[str, str] = {}
        for item in args.set:
            col, sep, expr = item.partition("=")
            if not sep or not col.strip() or not expr.strip():
                print(
                    json.dumps(
                        {"table": t.dir, "error": f"bad --set {item!r}; "
                         "expected COL=EXPR"}
                    )
                )
                return 2
            if col.strip() in set_exprs:
                print(
                    json.dumps(
                        {"table": t.dir, "error": f"duplicate --set column "
                         f"{col.strip()!r}"}
                    )
                )
                return 2
            set_exprs[col.strip()] = expr.strip()
        try:
            rep = t.update_where(args.predicate, set_exprs)
        except (CommitConflict, StagingReclaimed) as e:
            # exit 3 = retry later (same contract as delete-where)
            print(json.dumps({"table": t.dir, "refused": str(e)}))
            return 3
        print(json.dumps({"table": t.dir, **rep}))
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
