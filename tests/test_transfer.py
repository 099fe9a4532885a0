"""Transfer utilities (the reference's OsPool tool family): HTTP download
with retry/resume/atomic publish, and directory upload through the Hadoop
FileSystem preserving relative layout. All tests run against a local
``http.server`` / ``file://`` destinations — no network, no bucket.
"""

from __future__ import annotations

import http.server
import os
import threading

import pytest

from wod_ascii_to_parquet_spark_spark.sources.transfer import (
    http_download,
    main,
    upload_dir,
)

PAYLOAD = os.urandom(256 * 1024) + b"tail-marker"
PAYLOAD2 = os.urandom(128 * 1024) + b"second-version"
SHORT_PAYLOAD = os.urandom(1024) + b"shrunk-version"


class _Handler(http.server.BaseHTTPRequestHandler):
    """Range/If-Range/HEAD-aware handler with controllable failure modes:
    mid-stream connection drops, object swap between attempts (changed
    remote), overstated Content-Length (forces a short-body retry with a
    complete ``.part``), and If-Range-oblivious servers."""

    fail_first_n = 0  # class-level: drop connection on the first N requests
    seen = 0
    payload = PAYLOAD
    etag: str | None = '"v1"'
    swap_after_fail: tuple[bytes, str | None] | None = None
    ignore_if_range = False  # server that never implements If-Range
    overstate_first_length = 0  # extra bytes claimed on request #1
    range_headers: list[tuple[str | None, str | None]] = []

    @classmethod
    def reset(cls):
        cls.fail_first_n = 0
        cls.seen = 0
        cls.payload = PAYLOAD
        cls.etag = '"v1"'
        cls.swap_after_fail = None
        cls.ignore_if_range = False
        cls.overstate_first_length = 0
        cls.range_headers = []

    def log_message(self, *a):  # noqa: D102 - silence
        pass

    def _send_common(self, status: int, length: int):
        self.send_response(status)
        self.send_header("Content-Length", str(length))
        if type(self).etag:
            self.send_header("ETag", type(self).etag)
        self.end_headers()

    def do_HEAD(self):  # noqa: N802 - stdlib naming
        self._send_common(200, len(type(self).payload))

    def do_GET(self):  # noqa: N802 - stdlib naming
        cls = type(self)
        cls.seen += 1
        if self.path == "/missing":
            self.send_error(404)
            return
        rng = self.headers.get("Range")
        if_range = self.headers.get("If-Range")
        cls.range_headers.append((rng, if_range))
        start = 0
        if rng and rng.startswith("bytes="):
            start = int(rng.split("=")[1].rstrip("-"))
        if (
            start
            and not cls.ignore_if_range
            and if_range is not None
            and if_range != cls.etag
        ):
            start = 0  # validator mismatch → serve the full current body
        if start >= len(cls.payload):
            self._send_common(416, 0)
            return
        body = cls.payload[start:]
        claimed = len(body) + (
            cls.overstate_first_length if cls.seen == 1 else 0
        )
        self._send_common(206 if start else 200, claimed)
        if cls.fail_first_n and cls.seen <= cls.fail_first_n:
            # send half the remaining body, then drop the connection
            self.wfile.write(body[: max(1, len(body) // 2)])
            self.wfile.flush()
            self.connection.close()
            if cls.swap_after_fail is not None:
                cls.payload, cls.etag = cls.swap_after_fail
            return
        self.wfile.write(body)


@pytest.fixture()
def server():
    _Handler.reset()
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_download_success_and_atomic_publish(server, tmp_path):
    dest = str(tmp_path / "nested" / "dir" / "file.bin")
    code = http_download(f"{server}/file.bin", dest)
    assert code == 200
    assert open(dest, "rb").read() == PAYLOAD
    assert not os.path.exists(dest + ".part")


def test_download_resumes_after_midstream_failure(server, tmp_path):
    _Handler.fail_first_n = 1
    dest = str(tmp_path / "file.bin")
    code = http_download(f"{server}/file.bin", dest)
    assert code == 200
    assert open(dest, "rb").read() == PAYLOAD  # resumed bytes align exactly
    assert _Handler.seen >= 2  # first attempt failed mid-stream


def test_resume_sends_if_range_validator(server, tmp_path):
    """Every resume request must carry the first response's ETag as
    If-Range, so a changed object can never be spliced silently."""
    _Handler.fail_first_n = 1
    dest = str(tmp_path / "file.bin")
    assert http_download(f"{server}/file.bin", dest) == 200
    resumes = [(r, v) for r, v in _Handler.range_headers if r]
    assert resumes and all(v == '"v1"' for _, v in resumes)


def test_changed_object_restarts_not_splices(server, tmp_path):
    """Object replaced between attempts (new ETag): the If-Range mismatch
    makes the server answer 200 full-body, and the client must restart —
    the result is exactly the NEW object, never a v1/v2 splice."""
    _Handler.fail_first_n = 1
    _Handler.swap_after_fail = (PAYLOAD2, '"v2"')
    dest = str(tmp_path / "file.bin")
    assert http_download(f"{server}/file.bin", dest) == 200
    assert open(dest, "rb").read() == PAYLOAD2


def test_no_validator_disables_resume(server, tmp_path):
    """A server offering no ETag/Last-Modified cannot prove the object is
    unchanged — retries must restart from zero (no Range header ever)."""
    _Handler.etag = None
    _Handler.fail_first_n = 1
    dest = str(tmp_path / "file.bin")
    assert http_download(f"{server}/file.bin", dest) == 200
    assert open(dest, "rb").read() == PAYLOAD
    assert all(rng is None for rng, _ in _Handler.range_headers)


def test_416_publishes_only_verified_complete_part(server, tmp_path):
    """Overstated Content-Length forces a short-body retry while the .part
    already holds the complete object; the resume hits 416 and the part is
    published only after its size matches a HEAD Content-Length."""
    _Handler.overstate_first_length = 10
    dest = str(tmp_path / "file.bin")
    assert http_download(f"{server}/file.bin", dest) == 200
    assert open(dest, "rb").read() == PAYLOAD
    assert not os.path.exists(dest + ".part")


def test_416_with_shrunken_object_restarts(server, tmp_path):
    """Remote object shrank below the resume offset behind an If-Range-
    oblivious server: the 416 handler must NOT publish the oversized .part
    (HEAD length mismatch) — it restarts and lands the new object."""
    _Handler.fail_first_n = 1
    _Handler.swap_after_fail = (SHORT_PAYLOAD, '"v1"')  # same ETag kept
    _Handler.ignore_if_range = True
    dest = str(tmp_path / "file.bin")
    assert http_download(f"{server}/file.bin", dest) == 200
    assert open(dest, "rb").read() == SHORT_PAYLOAD


def test_416_mismatch_on_final_attempt_returns_code(server, tmp_path):
    """A 416 size-mismatch with no retries left is still a DEFINITE server
    answer: return the code (no file), never raise through the CLI."""
    _Handler.fail_first_n = 1
    _Handler.swap_after_fail = (SHORT_PAYLOAD, '"v1"')
    _Handler.ignore_if_range = True
    dest = str(tmp_path / "file.bin")
    # retries=1: attempt 0 fails mid-stream, attempt 1 hits 416-mismatch
    code = http_download(f"{server}/file.bin", dest, retries=1, backoff=0.01)
    assert code == 416
    assert not os.path.exists(dest)
    assert not os.path.exists(dest + ".part")


def test_download_404_reports_code_and_writes_nothing(server, tmp_path):
    dest = str(tmp_path / "file.bin")
    code = http_download(f"{server}/missing", dest)
    assert code == 404
    assert not os.path.exists(dest)
    assert not os.path.exists(dest + ".part")


def test_download_gives_up_after_retries(server, tmp_path):
    _Handler.fail_first_n = 99
    dest = str(tmp_path / "file.bin")
    with pytest.raises(RuntimeError, match="attempts"):
        http_download(f"{server}/file.bin", dest, retries=2, backoff=0.01)
    assert not os.path.exists(dest)


def test_cli_download(server, tmp_path, capsys):
    dest = str(tmp_path / "cli.bin")
    rc = main(["http-download", "-url", f"{server}/file.bin", "-o", dest])
    assert rc == 0
    assert capsys.readouterr().out.strip() == "200"
    assert open(dest, "rb").read() == PAYLOAD


class _IndexHandler(http.server.BaseHTTPRequestHandler):
    """Minimal autoindex tree mirroring the NCEI YEARLY layout."""

    TREE = {
        "/YEARLY/": ["XBT/", "CTD/", "SUR/", "robots.txt"],
        "/YEARLY/XBT/": ["OBS/", "STD/"],
        "/YEARLY/XBT/OBS/": ["XBTO1967.gz", "XBTO1968.gz", "XBTO1967.gz"],
        "/YEARLY/XBT/STD/": ["XBTS1967.gz"],  # non-OBS: excluded
        "/YEARLY/CTD/": ["OBS/"],
        "/YEARLY/CTD/OBS/": ["CTDO1971.gz", "README.txt"],
        "/YEARLY/SUR/": ["OBS/"],
        "/YEARLY/SUR/OBS/": ["SURF_ALL.gz"],
    }

    def log_message(self, *a):  # noqa: D102 - silence
        pass

    def do_GET(self):  # noqa: N802 - stdlib naming
        entries = self.TREE.get(self.path)
        if entries is None:
            self.send_error(404)
            return
        links = "".join(
            f'<a href="{e}">{e}</a>\n' for e in entries
        ) + '<a href="../">Parent</a><a href="?C=N;O=D">sort</a>'
        body = f"<html><body>{links}</body></html>".encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def index_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _IndexHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/YEARLY/"
    srv.shutdown()


def test_build_list_crawls_obs_tree(index_server, tmp_path):
    """build-list mirror: only */OBS/*.gz survive, SUR maps to ALL,SUR,
    duplicates collapse in first-seen order, non-OBS levels and non-.gz
    files are excluded (build-list.sh:16-32 semantics)."""
    from wod_ascii_to_parquet_spark_spark.sources.transfer import build_list

    out = str(tmp_path / "list.txt")
    lines = build_list(index_server, out_file=out)
    assert lines == ["1967,XBT", "1968,XBT", "1971,CTD", "ALL,SUR"]
    assert open(out).read().splitlines() == lines


def test_cli_build_list(index_server, tmp_path, capsys):
    out = str(tmp_path / "list.txt")
    rc = main(["build-list", "-url", index_server, "-o", out])
    assert rc == 0
    assert capsys.readouterr().out.strip() == "4"
    assert len(open(out).read().splitlines()) == 4


def test_upload_dir_preserves_layout(spark, tmp_path):
    src = tmp_path / "src"
    (src / "a" / "b").mkdir(parents=True)
    (src / "root.txt").write_bytes(b"r")
    (src / "a" / "one.txt").write_bytes(b"1")
    (src / "a" / "b" / "two.txt").write_bytes(b"22")
    dest = tmp_path / "dest"
    uploaded = upload_dir(spark, str(src), f"file://{dest}")
    assert sorted(u.rsplit("/dest/", 1)[1] for u in uploaded) == [
        "a/b/two.txt",
        "a/one.txt",
        "root.txt",
    ]
    assert (dest / "a" / "b" / "two.txt").read_bytes() == b"22"
    assert (dest / "root.txt").read_bytes() == b"r"
