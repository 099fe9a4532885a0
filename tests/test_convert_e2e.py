"""End-to-end WOD conversion pipeline test (the reference's
``SparklerExecutorLocalTest`` flow, with value-level assertions on top of
the marker checks):

- partitioned layout ``yearly/<DS>/<LEVEL>/<FILE>.parquet/geohash3=*/`` +
  ``_SUCCESS`` (``DatasetYearTrain.java:128-139``),
- SUR rename (``DatasetYearTrain.java:39-40,231-233``),
- within-partition geohash sort (``DatasetYearTrain.java:131``),
- skip-if-_SUCCESS / overwrite / stale-``_temporary`` cleanup
  (``DatasetYearTrain.java:89-94``),
- error side-channel (``TransformationErrorHandler.java:34-52``).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil

import pytest

from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.plans.convert import (
    FileTask,
    convert,
    convert_file,
)

WOD = "/root/reference/src/test/resources/wod"


@pytest.fixture(scope="module")
def converted(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wod_out"))
    result = convert(
        spark,
        source=WOD,
        output=out,
        datasets=("APB", "CTD", "SUR", "XBT"),
        levels=("OBS", "STD"),
        max_concurrent=2,
    )
    return out, result


def test_outputs_and_markers(converted):
    out, result = converted
    assert not result.failed
    expected = [
        "yearly/APB/OBS/APBO1997.parquet",
        "yearly/CTD/OBS/CTDO1971.parquet",
        "yearly/CTD/STD/CTDS1967.parquet",
        "yearly/SUR/OBS/SUR_ALL.parquet",  # SURF_ALL renamed
        "yearly/XBT/OBS/XBTO1967.parquet",
    ]
    for rel in expected:
        path = os.path.join(out, rel)
        assert os.path.exists(os.path.join(path, "_SUCCESS")), rel
        assert glob.glob(os.path.join(path, "geohash3=*")), rel
        # CRS sidecar (SURVEY §4.3; DatasetYearTrain.java:41-42,132-134)
        sidecar = os.path.join(path, "_geo_metadata.json")
        assert os.path.exists(sidecar), rel
        meta = json.loads(open(sidecar).read())
        assert meta["crs"]["id"] == {"authority": "EPSG", "code": 4326}
        assert meta["geoparquet_version"] == "1.1.0"
        assert meta["coordinates"] == {
            "latitude": "latitude", "longitude": "longitude"
        }


def test_geoparquet_footer_readable(converted):
    """Every data file carries the spec `geo` footer key (GeoParquet 1.1,
    native point encoding, WGS-84 PROJJSON) and the geometry struct mirrors
    (longitude, latitude) — i.e. a GeoParquet-aware reader recognizes the
    output without the sidecar."""
    import pyarrow.parquet as pq

    out, _ = converted
    base = os.path.join(out, "yearly/XBT/OBS/XBTO1967.parquet")
    files = sorted(glob.glob(os.path.join(base, "geohash3=*", "*.parquet")))
    assert files
    for f in files[:5] + files[-1:]:
        md = pq.read_schema(f).metadata
        assert md and b"geo" in md, f
        geo = json.loads(md[b"geo"])
        assert geo["version"] == "1.1.0"
        assert geo["primary_column"] == "geometry"
        col = geo["columns"]["geometry"]
        assert col["encoding"] == "point"
        assert col["geometry_types"] == ["Point"]
        assert col["crs"]["id"] == {"authority": "EPSG", "code": 4326}
    row = pq.read_table(files[0]).to_pylist()[0]
    assert row["geometry"] == {"x": row["longitude"], "y": row["latitude"]}


def test_footer_rewrite_preserves_spark_readability(spark, converted):
    """The pyarrow footer pass must not change how Spark decodes ANY
    column — in particular timestamps (INT96) must survive the re-encode
    (a plain pyarrow rewrite silently turns them into TIMESTAMP(NANOS),
    which Spark rejects at scan time)."""
    out, _ = converted
    df = spark.read.parquet(
        os.path.join(out, "yearly/XBT/OBS/XBTO1967.parquet")
    )
    rows = df.select("castTimestamp", "latitude", "longitude").limit(5).collect()
    assert len(rows) == 5


def test_sidecar_heals_on_resume(spark, tmp_path):
    """_SUCCESS present but sidecar missing (crash between the two
    writes) → resume rewrites the sidecar without rebuilding."""
    out = str(tmp_path / "out")
    task = FileTask("CTD", "OBS", f"{WOD}/CTD/OBS/CTDO1971.gz", out, out)
    assert convert_file(spark, task) == "converted"
    sidecar = os.path.join(task.output_path, "_geo_metadata.json")
    os.remove(sidecar)
    assert convert_file(spark, task) == "skipped"
    assert os.path.exists(sidecar)


def test_cast_counts_roundtrip(spark, converted):
    out, _ = converted
    df = spark.read.parquet(os.path.join(out, "yearly/XBT/OBS/XBTO1967.parquet"))
    assert df.count() == 9390
    assert df.filter(F.col("geohash").isNull()).count() == 0
    # geohash3 partition column round-trips as the 3-char prefix
    bad = df.filter(F.col("geohash3") != F.substring("geohash", 1, 3)).count()
    assert bad == 0


def test_within_partition_sort(spark, converted):
    out, _ = converted
    base = os.path.join(out, "yearly/XBT/OBS/XBTO1967.parquet")
    files = glob.glob(os.path.join(base, "geohash3=*", "*.parquet"))
    assert files
    checked = 0
    for f in files[:5]:
        rows = [r.geohash for r in spark.read.parquet(f).select("geohash").collect()]
        assert rows == sorted(rows), f
        checked += 1
    assert checked


def test_nested_depths_queryable(spark, converted):
    out, _ = converted
    df = spark.read.parquet(os.path.join(out, "yearly/XBT/OBS/XBTO1967.parquet"))
    obs = df.select(F.explode("depths").alias("d")).select(
        "d.depth", F.explode("d.data").alias("o")
    )
    n = obs.count()
    assert n > 9390  # more observations than casts
    temps = obs.filter(F.col("o.variableCode") == 1).select("o.value")
    stats = temps.agg(F.min("value").alias("lo"), F.max("value").alias("hi")).first()
    assert -5.0 <= stats.lo <= stats.hi <= 45.0  # plausible ocean temperatures


def test_skip_then_overwrite(spark, tmp_path):
    out = str(tmp_path / "out")
    task = FileTask("CTD", "OBS", f"{WOD}/CTD/OBS/CTDO1971.gz", out, out)
    assert convert_file(spark, task) == "converted"
    assert convert_file(spark, task) == "skipped"  # _SUCCESS present
    assert convert_file(spark, task, overwrite=True) == "converted"


def test_stale_temporary_triggers_rebuild(spark, tmp_path):
    out = str(tmp_path / "out")
    task = FileTask("CTD", "OBS", f"{WOD}/CTD/OBS/CTDO1971.gz", out, out)
    convert_file(spark, task)
    # simulate a crashed write: remove _SUCCESS, add _temporary
    os.remove(os.path.join(task.output_path, "_SUCCESS"))
    os.makedirs(os.path.join(task.output_path, "_temporary"))
    assert convert_file(spark, task) == "converted"
    assert os.path.exists(os.path.join(task.output_path, "_SUCCESS"))


def test_error_channel(spark, tmp_path):
    # corrupt copy of a real file → parse errors land in error/<DS>/<LEVEL>/
    src = tmp_path / "src" / "XBT" / "OBS"
    src.mkdir(parents=True)
    raw = gzip.open(f"{WOD}/XBT/OBS/XBTO1967.gz", "rt").read()
    lines = raw.splitlines()
    lines[1] = "X" * 80  # corrupt the middle of cast 1's record
    with gzip.open(src / "XBTO1967.gz", "wt") as f:
        f.write("\n".join(lines))
    out = str(tmp_path / "out")
    task = FileTask("XBT", "OBS", str(src / "XBTO1967.gz"), out, out)
    convert_file(spark, task)
    ok = spark.read.parquet(task.output_path)
    errs = spark.read.parquet(task.error_path)
    assert ok.count() == 9389
    assert errs.count() == 1
    row = errs.first()
    assert row.dataset == "XBT" and row.castNumber == 3411247 and row.error


def test_converted_output_prunes_spatially(spark, converted):
    """The geohash3 layout must PAY OFF at read time: a spatial cell
    filter becomes a partition filter (directories never listed into the
    scan), and within a cell the geohash sort gives parquet row-group
    min/max bounds a range predicate can prune on."""
    out, _ = converted
    ds = os.path.join(out, "yearly", "XBT", "OBS", "XBTO1967.parquet")
    df = spark.read.parquet(ds)
    cell = df.select("geohash3").first()[0]
    q = df.filter(F.col("geohash3") == cell)
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    pf_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "geohash3" in pf_line  # pruned at directory level
    # ...and ONLY at directory level: the predicate must not survive as
    # a post-scan data filter (that would mean every file is read)
    for l in plan.splitlines():
        if "DataFilters" in l or "PushedFilters" in l:
            assert "geohash3" not in l, l
    assert q.count() > 0
    # within-partition sort is REAL: the file's geohash column is in
    # nondecreasing order (the property row-group min/max pruning and
    # spatial readers rely on)
    import pyarrow.parquet as pq

    part_files = glob.glob(os.path.join(ds, f"geohash3={cell}", "*.parquet"))
    assert part_files
    ghs = pq.read_table(part_files[0], columns=["geohash"])["geohash"].to_pylist()
    assert len(ghs) > 1 and ghs == sorted(ghs)


def test_wkb_geometry_arm_geoparquet_10(spark, tmp_path):
    """``geometry_encoding='wkb'`` writes spec WKB point bytes with a
    GeoParquet **1.0.0** footer — the interop arm for readers that predate
    1.1's native encoding (and the byte shape of the reference's Sedona
    output, DatasetYearTrain.java:41-43). Decoded with an independent
    from-the-spec struct decoder, every geometry must equal the
    (longitude, latitude) columns bit-for-bit."""
    import pyarrow.parquet as pq

    from wod_ascii_to_parquet_spark_spark.functions.wkb import parse_wkb_point

    out = str(tmp_path / "wkb_out")
    task = FileTask(
        "XBT", "OBS", os.path.join(WOD, "XBT/OBS/XBTO1967.gz"), out, out
    )
    assert convert_file(spark, task, geometry_encoding="wkb") == "converted"
    base = os.path.join(out, "yearly/XBT/OBS/XBTO1967.parquet")
    files = sorted(glob.glob(os.path.join(base, "geohash3=*", "*.parquet")))
    assert files
    checked = 0
    for f in files[:3] + files[-1:]:
        md = pq.read_schema(f).metadata
        geo = json.loads(md[b"geo"])
        assert geo["version"] == "1.0.0"
        col = geo["columns"]["geometry"]
        assert col["encoding"] == "WKB"
        assert col["crs"]["id"] == {"authority": "EPSG", "code": 4326}
        for row in pq.read_table(
            f, columns=["geometry", "longitude", "latitude"]
        ).to_pylist():
            x, y = parse_wkb_point(row["geometry"])
            assert (x, y) == (row["longitude"], row["latitude"])
            checked += 1
    assert checked > 0
    # sidecar advertises the 1.0 footer too
    meta = json.loads(open(os.path.join(base, "_geo_metadata.json")).read())
    assert meta["geoparquet_version"] == "1.0.0"
    # Spark reads the binary column back unharmed
    df = spark.read.parquet(base)
    assert df.schema["geometry"].dataType.simpleString() == "binary"
    assert df.filter(F.col("geometry").isNull()).count() == 0


def test_wkb_kernel_matches_independent_decoder():
    """Vectorized numpy encoder ↔ struct-based spec decoder round trip,
    including nulls and non-finite coordinates."""
    import math

    import pandas as pd

    from wod_ascii_to_parquet_spark_spark.functions.wkb import (
        parse_wkb_point,
        wkb_point_bytes,
    )

    lon = pd.Series([0.0, -179.999999, 42.123456789, None, math.inf])
    lat = pd.Series([0.0, 89.5, -89.999, 1.0, -1.5])
    out = wkb_point_bytes(lon, lat)
    assert out[3] is None  # null coordinate → null geometry
    for i in (0, 1, 2, 4):
        x, y = parse_wkb_point(out[i])
        assert x == lon[i] and y == lat[i]


def test_convert_run_leaves_cache_empty(spark, tmp_path, monkeypatch):
    """VERDICT r9 #4: a multi-file convert run is the long-lived shape
    cached_frames() was built for — a stage that persist()s (simulated by
    wrapping convert_file, since no stage persists today) must have its
    frames released when convert() returns, not accumulate one
    InMemoryRelation per file."""
    import wod_ascii_to_parquet_spark_spark.plans.convert as C

    real = C.convert_file

    def persisting(spark_, task, **kw):
        df = spark_.range(10).persist()
        df.count()
        return real(spark_, task, **kw)

    monkeypatch.setattr(C, "convert_file", persisting)
    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    result = C.convert(
        spark,
        source=WOD,
        output=str(tmp_path / "out"),
        datasets=("CTD",),
        levels=("OBS", "STD"),
        max_concurrent=2,
    )
    assert len(result.converted) == 2
    assert cm.isEmpty(), "convert() leaked persisted frames after the run"


def test_rebalance_toggle_writes_identical_rows(spark, tmp_path, monkeypatch):
    """SPARK_GRAFT_CONVERT_REBALANCE=1 (the skew escape hatch measured in
    tools/bench_convert_skew.py) swaps the writer exchange for Spark's
    REBALANCE — the output contract must be unchanged: same rows, same
    geohash3 dirs, _SUCCESS + sidecar markers, within-partition geohash
    sort preserved."""
    src = f"{WOD}/CTD/OBS/CTDO1971.gz"
    out_a = str(tmp_path / "static")
    out_b = str(tmp_path / "rebalance")
    monkeypatch.delenv("SPARK_GRAFT_CONVERT_REBALANCE", raising=False)
    convert_file(spark, FileTask("CTD", "OBS", src, out_a, out_a))
    monkeypatch.setenv("SPARK_GRAFT_CONVERT_REBALANCE", "1")
    convert_file(spark, FileTask("CTD", "OBS", src, out_b, out_b))

    pa = f"{out_a}/yearly/CTD/OBS/CTDO1971.parquet"
    pb = f"{out_b}/yearly/CTD/OBS/CTDO1971.parquet"
    assert os.path.exists(f"{pb}/_SUCCESS")
    assert os.path.exists(f"{pb}/_geo_metadata.json")
    a = spark.read.parquet(pa)
    b = spark.read.parquet(pb)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # same partition dirs
    dirs = lambda p: sorted(
        d for d in os.listdir(p) if d.startswith("geohash3=")
    )
    assert dirs(pa) == dirs(pb)
    # within-file geohash sort survives the rebalance exchange
    for f in glob.glob(f"{pb}/geohash3=*/part-*.parquet")[:5]:
        gh = [r.geohash for r in spark.read.parquet(f).select("geohash").collect()]
        assert gh == sorted(gh)
