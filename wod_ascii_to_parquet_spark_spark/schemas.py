"""Explicit schemas (nothing inferred at runtime).

The reference compiles its cast schema into a Java bean
(``Encoders.bean(Cast.class)``, ``DatasetYearTrain.java:214``) and hand-builds
the error schema (``CastError.java:16-22``). Here both are explicit
``StructType`` constants; the cast shape follows SURVEY.md §1.2 (primary
header + attribute/variable/PI/biology lists + per-depth measurements).
"""

from __future__ import annotations

from pyspark.sql import types as T

CODE_VALUE = T.StructType(
    [
        T.StructField("code", T.IntegerType()),
        T.StructField("value", T.DoubleType()),
    ]
)

DEPTH_DATUM = T.StructType(
    [
        T.StructField("variableCode", T.IntegerType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("qcFlag", T.IntegerType()),
        T.StructField("originatorsFlag", T.IntegerType()),
    ]
)

DEPTH = T.StructType(
    [
        T.StructField("depth", T.DoubleType()),
        T.StructField("depthErrorFlag", T.IntegerType()),
        T.StructField("originatorsFlag", T.IntegerType()),
        T.StructField("data", T.ArrayType(DEPTH_DATUM)),
    ]
)

VARIABLE = T.StructType(
    [
        T.StructField("code", T.IntegerType()),
        T.StructField("qcFlag", T.IntegerType()),
        T.StructField("metadata", T.ArrayType(CODE_VALUE)),
    ]
)

PI = T.StructType(
    [
        T.StructField("variable", T.IntegerType()),
        T.StructField("pi", T.IntegerType()),
    ]
)

#: One parsed WOD cast (SURVEY.md §1.2). geohash/geohash3 are appended by the
#: convert plan (functions/geohash.py), not by the parser.
CAST = T.StructType(
    [
        T.StructField("dataset", T.StringType(), False),
        T.StructField("castNumber", T.IntegerType(), False),
        T.StructField("cruiseNumber", T.IntegerType()),
        T.StructField("country", T.StringType()),
        T.StructField("originatorsCruise", T.StringType()),
        T.StructField("originatorsStationCode", T.StringType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("month", T.IntegerType()),
        T.StructField("day", T.IntegerType()),
        T.StructField("time", T.DoubleType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("profileType", T.IntegerType()),
        T.StructField("attributes", T.ArrayType(CODE_VALUE)),
        T.StructField("biologicalAttributes", T.ArrayType(CODE_VALUE)),
        T.StructField("taxonomicDatasets", T.ArrayType(T.ArrayType(CODE_VALUE))),
        T.StructField("principalInvestigators", T.ArrayType(PI)),
        T.StructField("variables", T.ArrayType(VARIABLE)),
        T.StructField("depths", T.ArrayType(DEPTH)),
    ]
)

#: Error side-channel row — same three columns as the reference
#: (``CastError.java:16-22``): dataset + castNumber NOT NULL, error text.
CAST_ERROR = T.StructType(
    [
        T.StructField("dataset", T.StringType(), False),
        T.StructField("castNumber", T.IntegerType(), False),
        T.StructField("error", T.StringType()),
    ]
)

#: Tagged-union output of the distributed parse: exactly one of ok/err set.
PARSED = T.StructType(
    [
        T.StructField("ok", CAST),
        T.StructField("err", CAST_ERROR),
    ]
)
