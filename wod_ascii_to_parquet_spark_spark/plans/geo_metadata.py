"""Dataset-level geospatial metadata sidecar.

The reference writes GeoParquet through Sedona with a WGS-84 PROJJSON CRS
baked into the parquet footer (``DatasetYearTrain.java:41-42`` defines the
PROJJSON; ``:132-134`` passes ``geoparquet.version``/``geoparquet.crs`` to
the writer). Without Sedona, the Spark-first equivalent is a
``_geo_metadata.json`` sidecar next to each output dataset carrying the
same information: GeoParquet version, the CRS, and the lon/lat column
mapping + geohash covering (SURVEY §4.3). Readers that need real
GeoParquet can re-encode from these columns; the CRS is the standard EPSG
4326 definition published at proj.org.
"""

from __future__ import annotations

import json

GEOPARQUET_VERSION = "1.0.0"  # DatasetYearTrain.java:43

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


def geo_sidecar_bytes() -> bytes:
    """Serialized sidecar content (static — independent of the data, so
    (re)writing it is idempotent and safe at any point in the commit
    sequence)."""
    return json.dumps(
        {
            "geoparquet_version": GEOPARQUET_VERSION,
            "crs": WGS84_PROJJSON,
            "coordinates": {"latitude": "latitude", "longitude": "longitude"},
            "covering": {"geohash": "geohash", "partition": "geohash3"},
        },
        indent=2,
    ).encode()
