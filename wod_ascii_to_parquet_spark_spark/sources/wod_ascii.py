"""Distributed WOD ASCII source (SURVEY §2.1 S1 / §2.11 udtf_parse_casts).

The reference iterates casts with ``CastFileReader`` on the DRIVER thread and
ships batches to Spark through a BlockingQueue
(``DatasetYearTrain.java:141-209``) — the single biggest non-idiomatic
bottleneck in its design. Here the parse is a distributed flatMap over whole
files:

- ``spark.read.format("binaryFile")`` yields one row per ``.gz`` object.
  Gzip is unsplittable, so one-task-per-file is the maximum READ
  parallelism — but not the maximum PARSE parallelism: the file task only
  gunzips and frames cast records (cheap), then a round-robin exchange of
  record strings scatters the expensive field decode across every core
  (``wod_scan(scatter=True)``, the default).
- The decode walks cast records with the pure-Python decoder
  (``wod_format.py``), emitting a tagged union (ok-cast | error-row) —
  the split replaces the reference's 1-parquet-write-per-bad-record error
  handler (``TransformationErrorHandler.java:34-39``) with a single
  channel filter.

100 TB note: scatter decouples decode width from file count, so one giant
yearly file parses at cluster width; for files too big to hold decompressed
in one task the right fix remains upstream re-compression to a splittable
codec. The per-file generator keeps O(record) memory so multi-GB casts
files stream through a 3g executor (the reference's cluster-mode executor
size, ``src/spark/job.sh:11-14``).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import PARSED
from .wod_format import (
    RawCast,
    WodFormatError,
    _Cursor,
    iter_casts,
    parse_cast,
    split_records,
)


def _dataset_of(path: str) -> str:
    """Dataset code from the reference layout ``<...>/<DS>/<LEVEL>/<FILE>``."""
    parts = path.rstrip("/").split("/")
    return parts[-3] if len(parts) >= 3 else "UNKNOWN"


def _cast_row(c: RawCast) -> tuple:
    return (
        c.dataset,
        c.castNumber,
        c.cruiseNumber,
        c.country,
        c.originatorsCruise,
        c.originatorsStationCode,
        c.year,
        c.month,
        c.day,
        c.time,
        c.latitude,
        c.longitude,
        c.profileType,
        c.attributes,
        c.biologicalAttributes,
        c.taxonomicDatasets,
        c.principalInvestigators,
        c.variables,
        c.depths,
    )


def parse_file_content(path: str, content: bytes, dataset: str | None = None) -> Iterator[tuple]:
    """Gunzip (if needed) + decode one file's casts → tagged-union tuples."""
    ds = dataset or _dataset_of(path)
    if path.endswith(".gz"):
        reader = io.TextIOWrapper(
            gzip.GzipFile(fileobj=io.BytesIO(content)), errors="replace"
        )
    else:
        reader = io.TextIOWrapper(io.BytesIO(content), errors="replace")
    text = reader.read()
    for cast, err in iter_casts(text, ds):
        if cast is not None:
            yield (_cast_row(cast), None)
        else:
            yield (None, err)


def _cast_dict(c: RawCast) -> dict:
    return {
        "dataset": c.dataset,
        "castNumber": c.castNumber,
        "cruiseNumber": c.cruiseNumber,
        "country": c.country,
        "originatorsCruise": c.originatorsCruise,
        "originatorsStationCode": c.originatorsStationCode,
        "year": c.year,
        "month": c.month,
        "day": c.day,
        "time": c.time,
        "latitude": c.latitude,
        "longitude": c.longitude,
        "profileType": c.profileType,
        "attributes": [{"code": a, "value": v} for a, v in c.attributes],
        "biologicalAttributes": [
            {"code": a, "value": v} for a, v in c.biologicalAttributes
        ],
        "taxonomicDatasets": [
            [{"code": a, "value": v} for a, v in ts] for ts in c.taxonomicDatasets
        ],
        "principalInvestigators": [
            {"variable": a, "pi": p} for a, p in c.principalInvestigators
        ],
        "variables": [
            {
                "code": vc,
                "qcFlag": qc,
                "metadata": [{"code": mc, "value": mv} for mc, mv in meta],
            }
            for vc, qc, meta in c.variables
        ],
        "depths": [
            {
                "depth": d,
                "depthErrorFlag": de,
                "originatorsFlag": do,
                "data": [
                    {
                        "variableCode": dv,
                        "value": val,
                        "qcFlag": q,
                        "originatorsFlag": o,
                    }
                    for dv, val, q, o in data
                ],
            }
            for d, de, do, data in c.depths
        ],
    }


#: casts per emitted Arrow batch — bounds executor memory for huge files.
_ARROW_BATCH_ROWS = 4096


def _decompress(path: str, content: bytes) -> str:
    if path.endswith(".gz"):
        return io.TextIOWrapper(
            gzip.GzipFile(fileobj=io.BytesIO(content)), errors="replace"
        ).read()
    return content.decode(errors="replace")


def wod_scan(
    spark: SparkSession,
    paths: list[str] | str,
    dataset: str | None = None,
    scatter: bool = True,
) -> DataFrame:
    """Parse WOD ASCII file(s) into the tagged-union DataFrame (schema
    ``schemas.PARSED``: ``ok`` cast struct | ``err`` error struct).

    Executor-side the decode emits Arrow RecordBatches directly
    (``mapInArrow``): building the nested arrays in pyarrow skips the
    pickle → JVM row-verification path entirely (~2× faster end-to-end
    than the RDD formulation for the XBT fixture). Batches are capped at
    ``_ARROW_BATCH_ROWS`` casts so multi-GB files stream with bounded
    memory. Consumers split the channels with ``ok_casts`` / ``errors``.

    ``scatter=True`` (default) splits the work into two stages: the
    per-file task only gunzips and FRAMES cast records (the cheap part —
    record boundaries come from each record's declared byte count, ~5% of
    decode cost), then a round-robin exchange of raw record strings feeds
    the expensive field decode on EVERY core. Gzip being unsplittable caps
    the per-file READ at one task, but it does not have to cap the parse:
    a single huge yearly file decodes at cluster width instead of one
    core, and skewed file sizes balance themselves through the exchange.
    The shuffled payload is the decompressed text itself — the same bytes
    the one-task formulation holds in memory anyway. ``scatter=False``
    keeps the single-stage in-task decode (no exchange; right when there
    are many small files and the shuffle would cost more than it
    balances).
    """
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(PARSED)
    ok_type = arrow_schema.field("ok").type
    err_type = arrow_schema.field("err").type
    files = spark.read.format("binaryFile").load(paths).select("path", "content")

    if not scatter:

        def decode(batches):
            def flush(oks, errs):
                return pa.RecordBatch.from_arrays(
                    [pa.array(oks, type=ok_type), pa.array(errs, type=err_type)],
                    schema=arrow_schema,
                )

            for batch in batches:
                paths_col = batch.column(0)
                content_col = batch.column(1)
                for i in range(batch.num_rows):
                    path = paths_col[i].as_py()
                    content = content_col[i].as_py()
                    ds = dataset or _dataset_of(path)
                    oks: list = []
                    errs: list = []
                    text = _decompress(path, content)
                    for cast, err in iter_casts(text, ds):
                        if cast is not None:
                            oks.append(_cast_dict(cast))
                            errs.append(None)
                        else:
                            oks.append(None)
                            errs.append(
                                {
                                    "dataset": err[0],
                                    "castNumber": err[1],
                                    "error": err[2],
                                }
                            )
                        if len(oks) >= _ARROW_BATCH_ROWS:
                            yield flush(oks, errs)
                            oks, errs = [], []
                    if oks:
                        yield flush(oks, errs)

        return files.mapInArrow(decode, PARSED)

    framed_schema = pa.schema(
        [("ds", pa.string()), ("rec", pa.string()), ("ferr", pa.string())]
    )

    def frame(batches):
        def flush(dss, recs, ferrs):
            return pa.RecordBatch.from_arrays(
                [
                    pa.array(dss, type=pa.string()),
                    pa.array(recs, type=pa.string()),
                    pa.array(ferrs, type=pa.string()),
                ],
                schema=framed_schema,
            )

        for batch in batches:
            paths_col = batch.column(0)
            content_col = batch.column(1)
            for i in range(batch.num_rows):
                path = paths_col[i].as_py()
                content = content_col[i].as_py()
                ds = dataset or _dataset_of(path)
                text = _decompress(path, content)
                dss: list = []
                recs: list = []
                ferrs: list = []
                try:
                    for rec in split_records(text):
                        dss.append(ds)
                        recs.append(rec)
                        ferrs.append(None)
                        if len(recs) >= _ARROW_BATCH_ROWS:
                            yield flush(dss, recs, ferrs)
                            dss, recs, ferrs = [], [], []
                except WodFormatError as e:
                    # Same stream-level contract as iter_casts: records
                    # before the framing failure survive; one error row
                    # marks the failure and the rest of the file is lost.
                    dss.append(ds)
                    recs.append(None)
                    ferrs.append(f"unrecoverable stream error: {e}")
                if recs:
                    yield flush(dss, recs, ferrs)

    def decode_records(batches):
        def flush(oks, errs):
            return pa.RecordBatch.from_arrays(
                [pa.array(oks, type=ok_type), pa.array(errs, type=err_type)],
                schema=arrow_schema,
            )

        oks: list = []
        errs: list = []
        for batch in batches:
            ds_col = batch.column(0)
            rec_col = batch.column(1)
            ferr_col = batch.column(2)
            for i in range(batch.num_rows):
                ds = ds_col[i].as_py()
                rec = rec_col[i].as_py()
                if rec is None:
                    oks.append(None)
                    errs.append(
                        {
                            "dataset": ds,
                            "castNumber": -1,
                            "error": ferr_col[i].as_py(),
                        }
                    )
                else:
                    try:
                        oks.append(_cast_dict(parse_cast(rec, ds)))
                        errs.append(None)
                    except WodFormatError as e:
                        cast_number = -1
                        try:
                            cur = _Cursor(rec)
                            cur.take(1)
                            cur.wod_int()
                            cast_number = cur.wod_int() or -1
                        except WodFormatError:
                            pass
                        oks.append(None)
                        errs.append(
                            {
                                "dataset": ds,
                                "castNumber": cast_number,
                                "error": str(e),
                            }
                        )
                if len(oks) >= _ARROW_BATCH_ROWS:
                    yield flush(oks, errs)
                    oks, errs = [], []
        if oks:
            yield flush(oks, errs)

    framed = files.mapInArrow(frame, "ds string, rec string, ferr string")
    return framed.repartition(
        spark.sparkContext.defaultParallelism
    ).mapInArrow(decode_records, PARSED)


def wod_scan_rdd(
    spark: SparkSession, paths: list[str] | str, dataset: str | None = None
) -> DataFrame:
    """RDD-flatMap formulation of the same source (kept for comparison and
    as a fallback where Arrow is unavailable)."""
    files = spark.read.format("binaryFile").load(paths)
    rdd = files.select("path", "content").rdd.flatMap(
        lambda row: parse_file_content(row.path, bytes(row.content), dataset)
    )
    # verifySchema=False: the parser emits schema-exact tuples; per-row
    # verification of deeply nested rows costs more than the parse itself.
    return spark.createDataFrame(rdd, PARSED, verifySchema=False)


def ok_casts(parsed: DataFrame) -> DataFrame:
    return parsed.filter(F.col("ok").isNotNull()).select("ok.*")


def errors(parsed: DataFrame) -> DataFrame:
    return parsed.filter(F.col("err").isNotNull()).select("err.*")
