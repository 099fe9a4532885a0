"""CLI surface test (in-process: get_spark reuses the test session)."""

from __future__ import annotations

import json

from wod_ascii_to_parquet_spark_spark.cli import build_parser, main

WOD = "/root/reference/src/test/resources/wod"


def test_cli_help_lists_reference_flags():
    helptext = build_parser().format_help()
    for flag in ["--source", "--output", "--dataset", "--processing-level",
                 "--subset", "--overwrite", "--max-concurrent"]:
        assert flag in helptext


def test_cli_convert_subset(spark, tmp_path, capsys):
    out = str(tmp_path / "out")
    rc = main([
        "--source", WOD, "--output", out,
        "-d", "CTD", "-p", "OBS", "-p", "STD",
    ])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(payload["converted"]) == 2  # OBS + STD CTD fixtures
    assert not payload["failed"]
    # second run: everything skips (idempotent)
    rc = main(["--source", WOD, "--output", out, "-d", "CTD", "-p", "OBS", "-p", "STD"])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(payload["skipped"]) == 2 and not payload["converted"]
