"""GeoParquet footer metadata + dataset-level sidecar.

The reference writes GeoParquet through Sedona with a WGS-84 PROJJSON CRS
baked into the parquet footer (``DatasetYearTrain.java:41-42`` defines the
PROJJSON; ``:132-134`` passes ``geoparquet.version``/``geoparquet.crs`` to
the writer). The Sedona-free equivalent here is two-layered:

- **Real GeoParquet footers** (:func:`attach_geo_footer`): at publish time
  every data file gets the spec's ``geo`` key-value footer entry attached
  via pyarrow. The geometry column is the ``struct<x, y>`` the convert
  pipeline adds, declared with GeoParquet 1.1's native ``point`` encoding
  — expressible in pure Catalyst (``F.struct(lon, lat)``), unlike WKB,
  which would need a byte-assembling UDF in the write path. GeoParquet-
  aware readers (GDAL ≥ 3.8, GeoPandas) recognize the output directly.
- A ``_geo_metadata.json`` sidecar carrying the same information at the
  dataset level (SURVEY §4.3) — kept because it is readable without a
  parquet parser and doubles as the publish-completion marker for the
  footer attach (see ``plans/convert.py``).

The CRS is the standard EPSG 4326 definition published at proj.org.
"""

from __future__ import annotations

import json

#: 1.1.0 (not the reference's 1.0.0): 1.1 adds the native ``point``
#: encoding for struct<x,y> columns; 1.0 allows WKB only.
GEOPARQUET_VERSION = "1.1.0"  # cf. DatasetYearTrain.java:43

#: WGS 84 (EPSG:4326) PROJJSON — proj.org schema v0.7, the same CRS the
#: reference embeds (DatasetYearTrain.java:41-42).
WGS84_PROJJSON: dict = {
    "$schema": "https://proj.org/schemas/v0.7/projjson.schema.json",
    "type": "GeographicCRS",
    "name": "WGS 84",
    "datum_ensemble": {
        "name": "World Geodetic System 1984 ensemble",
        "members": [
            {"name": "World Geodetic System 1984 (Transit)",
             "id": {"authority": "EPSG", "code": 1166}},
            {"name": "World Geodetic System 1984 (G730)",
             "id": {"authority": "EPSG", "code": 1152}},
            {"name": "World Geodetic System 1984 (G873)",
             "id": {"authority": "EPSG", "code": 1153}},
            {"name": "World Geodetic System 1984 (G1150)",
             "id": {"authority": "EPSG", "code": 1154}},
            {"name": "World Geodetic System 1984 (G1674)",
             "id": {"authority": "EPSG", "code": 1155}},
            {"name": "World Geodetic System 1984 (G1762)",
             "id": {"authority": "EPSG", "code": 1156}},
            {"name": "World Geodetic System 1984 (G2139)",
             "id": {"authority": "EPSG", "code": 1309}},
        ],
        "ellipsoid": {
            "name": "WGS 84",
            "semi_major_axis": 6378137,
            "inverse_flattening": 298.257223563,
        },
        "accuracy": "2.0",
        "id": {"authority": "EPSG", "code": 6326},
    },
    "coordinate_system": {
        "subtype": "ellipsoidal",
        "axis": [
            {"name": "Geodetic latitude", "abbreviation": "Lat",
             "direction": "north", "unit": "degree"},
            {"name": "Geodetic longitude", "abbreviation": "Lon",
             "direction": "east", "unit": "degree"},
        ],
    },
    "scope": "Horizontal component of 3D system.",
    "area": "World.",
    "bbox": {
        "south_latitude": -90,
        "west_longitude": -180,
        "north_latitude": 90,
        "east_longitude": 180,
    },
    "id": {"authority": "EPSG", "code": 4326},
}

SIDECAR_NAME = "_geo_metadata.json"

GEOMETRY_COLUMN = "geometry"


def geo_footer_dict() -> dict:
    """The GeoParquet ``geo`` footer entry (spec v1.1.0): primary geometry
    column with native ``point`` encoding (struct fields x=longitude,
    y=latitude) and the WGS-84 PROJJSON CRS — the footer the reference has
    Sedona write (DatasetYearTrain.java:132-134)."""
    return {
        "version": GEOPARQUET_VERSION,
        "primary_column": GEOMETRY_COLUMN,
        "columns": {
            GEOMETRY_COLUMN: {
                "encoding": "point",
                "geometry_types": ["Point"],
                "crs": WGS84_PROJJSON,
            }
        },
    }


def attach_geo_footer(fs, out_dir: str, max_workers: int = 16, spark=None) -> int:
    """Attach the ``geo`` key to every data file footer under ``out_dir``;
    returns the number of files rewritten.

    Each file is read and rewritten through pyarrow IN MEMORY via the
    FsClient byte API, so the attach works on any Hadoop-visible scheme
    (local, hdfs, s3a) — per-partition convert outputs are row-group-sized
    by construction. Idempotent: re-attaching the same key is a no-op
    change, so crash-healing can simply run it again (the sidecar, written
    AFTER this step, is the completion marker — see convert_file).

    Scale shape: this is one extra read+encode+write of the freshly
    written output, embarrassingly parallel per FILE — here a thread pool
    inside the per-file job; on a 1000-executor cluster the same function
    is the body of a ``foreach`` over the file listing. The JVM parquet
    writer cannot attach custom footer keys mid-write, so the post-pass is
    the price of real GeoParquet without Sedona on the classpath.

    I/O path, fastest first:

    1. **Spark job over the file listing** (local paths + a live session):
       ``parallelize(paths).foreachPartition(rewrite)`` — each Python
       WORKER PROCESS rewrites its slice with pyarrow directly on OS
       paths. This is the 100 TB shape verbatim (the listing is the RDD;
       executors rewrite the files they can see) and locally it sidesteps
       both the py4j gateway and the driver GIL — the gateway byte API
       measured 4× the whole conversion, a driver thread pool still ~3.7 s
       of GIL-serialized pyarrow calls for ~1,700 per-geohash files, the
       Spark job ~an order less.
    2. Driver thread pool on OS paths (local, no session handed in).
    3. FsClient byte API (remote schemes — works anywhere Hadoop sees).

    Crash safety on every path: local writes go to a temp file +
    ``os.replace``; remote writes go to a sibling temp object that is
    renamed into place, with a recovery pre-pass that promotes or drops
    leftover temps — so a crash at any point never leaves a torn data
    file and re-running the attach always heals.

    Remote-branch cost note: crash-safety makes it 3 gateway-serialized
    py4j calls per file (write temp / delete / rename) instead of 1 —
    the thread pool cannot parallelize the single py4j gateway, so for
    LARGE remote file counts this path should be replaced by the same
    Spark-job shape as the local branch, with executors resolving the
    filesystem via ``pyarrow.fs.FileSystem.from_uri`` (no py4j on
    executors); kept driver-side here because no remote scheme exists in
    this environment to validate that path against."""
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow as pa
    import pyarrow.parquet as pq

    geo = json.dumps(geo_footer_dict()).encode()

    def rewrite(table, write_sink) -> None:
        meta = dict(table.schema.metadata or {})
        meta[b"geo"] = geo
        pq.write_table(
            table.replace_schema_metadata(meta),
            write_sink,
            compression="snappy",
            # Preserve Spark's INT96 timestamp encoding: a plain re-encode
            # turns INT96 → TIMESTAMP(NANOS)/INT64, which Spark then
            # refuses to read back as timestamp (regression-tested in
            # test_convert_e2e.py::test_geoparquet_footer_readable).
            use_deprecated_int96_timestamps=True,
        )

    local_root = _local_path(out_dir)
    if local_root is not None:
        import os

        paths = sorted(
            os.path.join(dirpath, f)
            for dirpath, _, files in os.walk(local_root)
            for f in files
            if f.endswith(".parquet")
        )
        if spark is not None and paths:
            geo_bytes = geo

            def _rewrite_slice(it):
                import os as _os

                import pyarrow.parquet as _pq

                for path in it:
                    t = _pq.read_table(path, use_threads=False)
                    meta = dict(t.schema.metadata or {})
                    meta[b"geo"] = geo_bytes
                    tmp = path + "._geo_tmp"
                    _pq.write_table(
                        t.replace_schema_metadata(meta),
                        tmp,
                        compression="snappy",
                        use_deprecated_int96_timestamps=True,
                    )
                    _os.replace(tmp, path)
                    _drop_stale_crc(path)

            n = max(1, min(len(paths), spark.sparkContext.defaultParallelism))
            spark.sparkContext.parallelize(paths, n).foreachPartition(
                _rewrite_slice
            )
            return len(paths)

        def one(path: str) -> None:
            tmp = path + "._geo_tmp"
            rewrite(pq.read_table(path), tmp)
            os.replace(tmp, path)
            _drop_stale_crc(path)

    else:
        # Recovery pre-pass: a prior attach that crashed between the
        # delete and the rename leaves the finished temp object without
        # its base file — promote it; a temp WITH a live base is torn or
        # stale — drop it. After this pass every listed .parquet file is
        # a complete data file, so re-running the attach (the convert_file
        # heal path) is safe on any crash point.
        listing = fs.file_sizes(out_dir)
        for p in sorted(listing):
            if p.endswith(_REMOTE_TMP_SUFFIX):
                base = p[: -len(_REMOTE_TMP_SUFFIX)]
                if base in listing:
                    fs.delete(p)
                else:
                    fs.rename(p, base)
                    listing[base] = listing.pop(p)
        paths = sorted(p for p in listing if p.endswith(".parquet"))

        def one(path: str) -> None:
            table = pq.read_table(pa.BufferReader(fs.read_bytes(path)))
            sink = pa.BufferOutputStream()
            rewrite(table, sink)
            # Never rewrite the data file in place: a crash mid-write
            # would tear it and the heal re-run would then fail reading
            # it. Write a sibling temp object, drop the original, rename
            # the temp into place; every intermediate state is healed by
            # the pre-pass above.
            tmp = path + _REMOTE_TMP_SUFFIX
            fs.write_bytes(tmp, sink.getvalue().to_pybytes())
            fs.delete(path)
            fs.rename(tmp, path)

    if paths:
        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            list(pool.map(one, paths))
    else:
        import logging

        logging.getLogger(__name__).warning(
            "attach_geo_footer: no .parquet files under %s — nothing "
            "rewritten (dataset publishes without GeoParquet footers)",
            out_dir,
        )
    return len(paths)


#: Suffix for the crash-safe sibling object used on remote schemes. Not
#: ``.parquet``-suffixed, so a leftover temp never shows up as data.
_REMOTE_TMP_SUFFIX = "._geo_tmp"


def _local_path(path: str) -> str | None:
    """OS path for ``path`` if local, else None — shared helper (treating
    the single-slash ``file:/tmp`` form as a relative OS path made
    ``os.walk`` find nothing and the footer pass silently rewrite 0
    files, hence the URI handling there)."""
    from ..sources.filesystem import local_os_path

    return local_os_path(path)


def _drop_stale_crc(path: str) -> None:
    """Remove the Hadoop ChecksumFileSystem sidecar for a file rewritten
    BEHIND Hadoop's back (direct OS I/O): the JVM writer left a
    ``.<name>.crc`` next to each part file, and a stale one makes every
    later Hadoop read fail with ChecksumException. Reading without a crc
    sidecar is fine (verification is simply skipped)."""
    import os

    d, name = os.path.split(path)
    crc = os.path.join(d, f".{name}.crc")
    if os.path.exists(crc):
        os.remove(crc)


def geo_sidecar_bytes() -> bytes:
    """Serialized sidecar content (static — independent of the data, so
    (re)writing it is idempotent and safe at any point in the commit
    sequence)."""
    return json.dumps(
        {
            "geoparquet_version": GEOPARQUET_VERSION,
            "crs": WGS84_PROJJSON,
            "geo_footer": geo_footer_dict(),
            "coordinates": {"latitude": "latitude", "longitude": "longitude"},
            "covering": {"geohash": "geohash", "partition": "geohash3"},
        },
        indent=2,
    ).encode()
