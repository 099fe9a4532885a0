"""Full conversion against a MOCK REMOTE OBJECT STORE — the mirror of the
reference's ``SparklerExecutorTest.java:78-170`` (testSimple / testPrefix /
testPrefixSUR), which runs the executor against an in-memory S3 mock.

No S3 mock server ships in this environment (no moto/minio, no hadoop-aws
jars), so the stand-in is Hadoop's built-in ``viewfs://`` — a genuinely
NON-LOCAL scheme (``local_os_path`` returns None for it) resolved entirely
through the Hadoop FileSystem API, exactly like s3a would be. Every remote
branch the s3a deployment exercises runs for real here:

- source discovery + paged listing through ``FsClient`` on remote URIs,
- executor reads (gunzip) and the partitioned parquet write + ``_SUCCESS``
  commit through the Hadoop connector,
- the remote GeoParquet footer attach via the byte API (sibling-temp +
  delete + rename crash protocol, incl. its recovery pre-pass),
- skip/resume and sidecar healing keyed on remote marker objects.

Each test mounts fresh viewfs authorities so no FileSystem-cache state
leaks between tests.
"""

from __future__ import annotations

import json
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wod_ascii_to_parquet_spark_spark.plans.convert import FileTask, convert, convert_file
from wod_ascii_to_parquet_spark_spark.plans.geo_metadata import (
    _REMOTE_TMP_SUFFIX,
    SIDECAR_NAME,
    attach_geo_footer,
)
from wod_ascii_to_parquet_spark_spark.sources.filesystem import (
    FsClient,
    local_os_path,
)

WOD = "/root/reference/src/test/resources/wod"


@pytest.fixture()
def mock_store(spark, tmp_path):
    """A fresh ``viewfs://<authority>/store`` URI backed by a temp dir —
    one 'bucket' per test, like the reference's per-test s3 buckets."""
    authority = f"m{uuid.uuid4().hex[:12]}"
    backing = tmp_path / "backing"
    backing.mkdir()
    spark._jsc.hadoopConfiguration().set(
        f"fs.viewfs.mounttable.{authority}.link./store", f"file://{backing}"
    )
    base = f"viewfs://{authority}/store"
    assert local_os_path(base) is None  # must exercise the REMOTE branches
    return base


def _upload(fs: FsClient, local: str, remote: str) -> None:
    """putObject equivalent (SparklerExecutorTest uploads fixtures to the
    mock bucket the same way)."""
    with open(local, "rb") as fh:
        fs.write_bytes(remote, fh.read())


def test_simple_mirror(spark, mock_store):
    """testSimple (SparklerExecutorTest.java:78-113): three fixtures in a
    source bucket, two datasets × two levels, output bucket gains the
    three ``_SUCCESS``-marked yearly datasets."""
    fs = FsClient(spark)
    src, out = mock_store + "/wod-ascii", mock_store + "/wod-parquet"
    for rel in ("APB/OBS/APBO1997.gz", "CTD/OBS/CTDO1971.gz", "CTD/STD/CTDS1967.gz"):
        _upload(fs, f"{WOD}/{rel}", f"{src}/{rel}")
    assert fs.file_sizes(out) == {}  # output bucket starts empty

    result = convert(
        spark,
        source=src,
        output=out,
        datasets=("APB", "CTD"),
        levels=("OBS", "STD"),
        max_concurrent=2,
    )
    assert not result.failed
    keys = set(fs.file_sizes(out))
    for marker in (
        "yearly/CTD/STD/CTDS1967.parquet/_SUCCESS",
        "yearly/CTD/OBS/CTDO1971.parquet/_SUCCESS",
        "yearly/APB/OBS/APBO1997.parquet/_SUCCESS",
    ):
        assert f"{out}/{marker}" in keys, marker

    # the REMOTE footer-attach branch ran: a data file read back through
    # the byte API carries the geo footer, and Spark reads the dataset
    apb = f"{out}/yearly/APB/OBS/APBO1997.parquet"
    data_files = [p for p in fs.file_sizes(apb) if p.endswith(".parquet")]
    assert data_files
    md = pq.read_metadata(pa.BufferReader(fs.read_bytes(data_files[0])))
    assert json.loads(md.metadata[b"geo"])["primary_column"] == "geometry"
    assert spark.read.parquet(apb).count() > 0

    # skip/resume on the remote store: a second run converts nothing
    again = convert(
        spark,
        source=src,
        output=out,
        datasets=("APB", "CTD"),
        levels=("OBS", "STD"),
        max_concurrent=2,
    )
    assert not again.failed and not again.converted
    assert len(again.skipped) == 3

    # sidecar heal: dropping the publish marker re-runs attach + sidecar
    fs.delete(f"{apb}/{SIDECAR_NAME}")
    healed = convert(
        spark, source=src, output=out, datasets=("APB",), levels=("OBS",)
    )
    assert healed.skipped and fs.exists(f"{apb}/{SIDECAR_NAME}")


def test_prefix_and_sur_rename_mirror(spark, mock_store):
    """testPrefix + testPrefixSUR (SparklerExecutorTest.java:115-170):
    source and output share one bucket under distinct prefixes, and the
    SURF_ALL input publishes as SUR_ALL (DatasetYearTrain.java:39-40)."""
    fs = FsClient(spark)
    src = mock_store + "/test-bucket/wod-ascii"
    out = mock_store + "/test-bucket/wod-parquet"
    _upload(fs, f"{WOD}/APB/OBS/APBO1997.gz", f"{src}/APB/OBS/APBO1997.gz")
    _upload(fs, f"{WOD}/CTD/OBS/CTDO1971.gz", f"{src}/CTD/OBS/CTDO1971.gz")
    _upload(fs, f"{WOD}/SUR/OBS/SURF_ALL.gz", f"{src}/SUR/OBS/SURF_ALL.gz")

    result = convert(
        spark, source=src, output=out, datasets=("APB", "SUR"), levels=("OBS",)
    )
    assert not result.failed
    keys = set(fs.file_sizes(mock_store + "/test-bucket"))
    assert (
        f"{out}/yearly/APB/OBS/APBO1997.parquet/_SUCCESS" in keys
    )
    # SUR rename happened on the remote store
    assert f"{out}/yearly/SUR/OBS/SUR_ALL.parquet/_SUCCESS" in keys
    assert not any("SURF_ALL.parquet" in k for k in keys)
    # the CTD fixture was outside the dataset filter: untouched
    assert not any("/yearly/CTD/" in k for k in keys)


def test_remote_attach_crash_heal_on_store(spark, mock_store):
    """The remote attach's crash protocol on a real Hadoop scheme: an
    orphaned sibling temp (crash between delete and rename) is promoted
    by the recovery pre-pass; a temp alongside its base is dropped."""
    fs = FsClient(spark)
    out = mock_store + "/heal/XBTO1967.parquet"
    task = FileTask("XBT", "OBS", f"{WOD}/XBT/OBS/XBTO1967.gz", "", "")
    # build a real output remotely first (small path: one file)
    local_task = FileTask(
        "XBT", "OBS", f"{WOD}/XBT/OBS/XBTO1967.gz",
        mock_store + "/heal-root", mock_store + "/heal-root",
    )
    assert convert_file(spark, local_task) == "converted"
    base_dir = local_task.output_path
    data_files = sorted(
        p for p in fs.file_sizes(base_dir) if p.endswith(".parquet")
    )
    victim = data_files[0]
    original = fs.read_bytes(victim)

    # crash shape 1: temp exists, base deleted → pre-pass must PROMOTE
    fs.write_bytes(victim + _REMOTE_TMP_SUFFIX, original)
    fs.delete(victim)
    n = attach_geo_footer(fs, base_dir)
    assert n == len(data_files)
    assert fs.exists(victim) and not fs.exists(victim + _REMOTE_TMP_SUFFIX)
    md = pq.read_metadata(pa.BufferReader(fs.read_bytes(victim)))
    assert b"geo" in md.metadata

    # crash shape 2: stale temp alongside a live base → pre-pass DROPS it
    fs.write_bytes(victim + _REMOTE_TMP_SUFFIX, b"torn half-write")
    attach_geo_footer(fs, base_dir)
    assert not fs.exists(victim + _REMOTE_TMP_SUFFIX)
    assert spark.read.parquet(base_dir).count() > 0


class _CountingFs:
    """FsClient proxy recording per-file BYTE traffic through the driver —
    the distributed attach must do none (listing + temp healing only)."""

    def __init__(self, inner):
        self._inner = inner
        self.byte_calls: list[tuple[str, str]] = []

    def file_sizes(self, *a, **k):
        return self._inner.file_sizes(*a, **k)

    def read_bytes(self, path, *a):
        self.byte_calls.append(("read", path))
        return self._inner.read_bytes(path, *a)

    def write_bytes(self, path, data):
        self.byte_calls.append(("write", path))
        return self._inner.write_bytes(path, data)

    def delete(self, path):
        return self._inner.delete(path)

    def rename(self, src, dst):
        return self._inner.rename(src, dst)


def test_remote_attach_runs_as_spark_job(spark, mock_store):
    """The remote footer attach with a live session is a SPARK JOB: the
    driver issues one listing RPC and zero per-file byte RPCs — executors
    resolve the store themselves (viewfs mount map shipped as data) and
    do all read/rewrite/rename I/O. This is the 100 TB shape: per-file
    work scales with executors, not with driver py4j round-trips."""
    fs = FsClient(spark)
    task = FileTask(
        "XBT", "OBS", f"{WOD}/XBT/OBS/XBTO1967.gz",
        mock_store + "/dist-root", mock_store + "/dist-root",
    )
    assert convert_file(spark, task) == "converted"
    base_dir = task.output_path
    data_files = [
        p for p in fs.file_sizes(base_dir) if p.endswith(".parquet")
    ]
    assert data_files
    # convert_file already attached (distributed); verify every file is
    # stamped, then re-run the attach through a counting proxy: the
    # Spark-job arm must touch ZERO file bytes via the driver client
    # (the idempotency re-check happens executor-side too).
    for p in data_files:
        md = pq.read_metadata(pa.BufferReader(fs.read_bytes(p)))
        assert b"geo" in md.metadata, p
    counting = _CountingFs(fs)
    n = attach_geo_footer(counting, base_dir, spark=spark)
    assert n == len(data_files)
    assert counting.byte_calls == []
    assert spark.read.parquet(base_dir).count() > 0


def test_conditional_create_probe_degrades_on_mock_store(spark, mock_store):
    """create_exclusive on a remote scheme first attempts the Hadoop
    conditional-create builder (HADOOP-19256). viewfs/local connectors
    reject the mandatory key — the probe must (a) degrade cleanly to the
    plain-create arm (winner/loser semantics intact, winner's bytes
    never truncated by the loser) and (b) cache the rejection per
    filesystem URI so later commits skip the doomed builder attempt."""
    from wod_ascii_to_parquet_spark_spark.sources.filesystem import (
        ConditionalCreateUnsupported,
    )

    fs = FsClient(spark)
    target = mock_store + "/tbl/_log/v0.json"
    fs.mkdirs(mock_store + "/tbl/_log")
    assert fs.create_exclusive(target, b"winner") is True
    assert fs._cond_create_support == {
        uri: False for uri in fs._cond_create_support
    } and fs._cond_create_support  # probed exactly this store: rejected
    assert fs.create_exclusive(target, b"loser") is False
    assert fs.read_bytes(target) == b"winner"
    with pytest.raises(ConditionalCreateUnsupported):
        fs._conditional_create(mock_store + "/tbl/_log/v1.json", b"x")


def test_pyarrow_store_rewrite(tmp_path):
    """_PyArrowStore (the production s3/gs executor arm) exercised over a
    pyarrow-resolvable base URI: byte round-trip, rename, and the full
    _rewrite_with_geo protocol — superseding footer appended in memory,
    original data pages byte-identical, idempotent on re-run."""
    import pandas as pd

    from wod_ascii_to_parquet_spark_spark.plans.geo_metadata import (
        _PyArrowStore,
        _rewrite_with_geo,
        geo_footer_dict,
    )

    base = f"file://{tmp_path}"
    store = _PyArrowStore(base)
    store.write_bytes(f"{base}/a.bin", b"hello")
    assert store.read_bytes(f"{base}/a.bin") == b"hello"
    store.rename(f"{base}/a.bin", f"{base}/b.bin")
    assert store.read_bytes(f"{base}/b.bin") == b"hello"
    store.delete(f"{base}/b.bin")

    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame({"x": [1, 2, 3]})),
        tmp_path / "d.parquet",
    )
    original = (tmp_path / "d.parquet").read_bytes()
    geo = json.dumps(geo_footer_dict()).encode()
    _rewrite_with_geo(store, f"{base}/d.parquet", geo)
    stamped = (tmp_path / "d.parquet").read_bytes()
    assert stamped[: len(original)] == original  # pages + old footer intact
    md = pq.read_metadata(tmp_path / "d.parquet")
    assert md.metadata[b"geo"] == geo
    assert pq.read_table(tmp_path / "d.parquet").column("x").to_pylist() == [1, 2, 3]
    _rewrite_with_geo(store, f"{base}/d.parquet", geo)  # idempotent
    assert (tmp_path / "d.parquet").read_bytes() == stamped

    # pickling ships only the URI (executors re-resolve lazily)
    import pickle

    clone = pickle.loads(pickle.dumps(store))
    assert clone.read_bytes(f"{base}/d.parquet") == stamped
