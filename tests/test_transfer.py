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


class _Handler(http.server.BaseHTTPRequestHandler):
    """Range-aware handler with a controllable mid-stream failure."""

    fail_first_n = 0  # class-level: drop connection on the first N requests
    seen = 0

    def log_message(self, *a):  # noqa: D102 - silence
        pass

    def do_GET(self):  # noqa: N802 - stdlib naming
        cls = type(self)
        cls.seen += 1
        if self.path == "/missing":
            self.send_error(404)
            return
        rng = self.headers.get("Range")
        start = 0
        if rng and rng.startswith("bytes="):
            start = int(rng.split("=")[1].rstrip("-"))
        body = PAYLOAD[start:]
        if cls.fail_first_n and cls.seen <= cls.fail_first_n:
            # send half the remaining body, then drop the connection
            self.send_response(206 if start else 200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body[: max(1, len(body) // 2)])
            self.wfile.flush()
            self.connection.close()
            return
        self.send_response(206 if start else 200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def server():
    _Handler.fail_first_n = 0
    _Handler.seen = 0
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
