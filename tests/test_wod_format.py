"""Unit tests for the pure-Python WOD decoder against the reference's bundled
fixtures (read-only). Mirrors the reference's golden-input test strategy
(``SparklerExecutorLocalTest.java``) but asserts values, not just markers.
"""

from __future__ import annotations

import glob
import gzip

import pytest

from wod_ascii_to_parquet_spark_spark.sources.wod_format import (
    WodFormatError,
    iter_casts,
    parse_cast,
    split_records,
)

FIXTURES = sorted(glob.glob("/root/reference/src/test/resources/wod/*/*/*.gz"))

EXPECTED_COUNTS = {
    "APBO1997.gz": 1,
    "CTDO1971.gz": 1,
    "CTDS1967.gz": 1,
    "DRBO2000.gz": 12611,
    "SURF_ALL.gz": 12611,
    "XBTO1967.gz": 9390,
}


def _read(path: str) -> str:
    return gzip.open(path, "rt", errors="replace").read()


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.split("/wod/")[-1])
def test_all_fixture_casts_parse(path):
    ds = path.split("/")[-3]
    n_ok = n_err = 0
    for cast, err in iter_casts(_read(path), ds):
        if cast is not None:
            n_ok += 1
            assert cast.dataset == ds
            assert cast.castNumber > 0
            if cast.latitude is not None:
                assert -90.0 <= cast.latitude <= 90.0
            if cast.longitude is not None:
                assert -180.0 <= cast.longitude <= 180.0
            assert 1900 <= (cast.year or 1950) <= 2030
        else:
            n_err += 1
    assert n_err == 0
    assert n_ok == EXPECTED_COUNTS[path.split("/")[-1]]


def test_known_first_xbt_cast():
    text = _read("/root/reference/src/test/resources/wod/XBT/OBS/XBTO1967.gz")
    rec = next(split_records(text))
    c = parse_cast(rec, "XBT")
    assert c.castNumber == 3411247
    assert c.country == "US"
    assert c.cruiseNumber == 40766
    assert (c.year, c.month, c.day) == (1967, 1, 1)
    assert c.time == pytest.approx(0.4)
    assert c.latitude == pytest.approx(31.33)
    assert c.longitude == pytest.approx(-140.58)
    assert len(c.depths) == 15
    assert [v[0] for v in c.variables] == [1]  # temperature profile
    # depths are recorded shallow→deep
    ds = [d[0] for d in c.depths if d[0] is not None]
    assert ds == sorted(ds)
    # every level carries a temperature observation
    assert all(len(d[3]) == 1 for d in c.depths)


def test_depth_monotonicity_sampled():
    text = _read("/root/reference/src/test/resources/wod/XBT/OBS/XBTO1967.gz")
    checked = 0
    for rec in split_records(text):
        c = parse_cast(rec, "XBT")
        ds = [d[0] for d in c.depths if d[0] is not None]
        assert ds == sorted(ds), f"cast {c.castNumber} depths not monotonic"
        checked += 1
        if checked >= 500:
            break


def test_corrupt_record_goes_to_error_channel():
    text = _read("/root/reference/src/test/resources/wod/XBT/OBS/XBTO1967.gz")
    rec = next(split_records(text))
    corrupted = rec[:40] + "XX" + rec[42:]
    results = list(iter_casts(corrupted, "XBT"))
    assert len(results) == 1
    cast, err = results[0]
    assert cast is None
    assert err[0] == "XBT"
    assert err[2]


def test_truncated_record_raises_in_channel():
    text = _read("/root/reference/src/test/resources/wod/XBT/OBS/XBTO1967.gz")
    rec = next(split_records(text))
    with pytest.raises(WodFormatError):
        parse_cast(rec[:100], "XBT")


def test_stream_error_yields_error_row():
    results = list(iter_casts("garbage not a cast", "XBT"))
    assert len(results) == 1
    assert results[0][0] is None


def test_dataset_inference_from_path():
    """parse_file_content without dataset= infers DS from the reference
    layout <...>/<DS>/<LEVEL>/<FILE> — regression: passing a dirname made
    the fallback return the directory ABOVE the dataset code."""
    import pathlib

    from wod_ascii_to_parquet_spark_spark.sources.wod_ascii import (
        _dataset_of,
        parse_file_content,
    )

    path = "/root/reference/src/test/resources/wod/CTD/OBS/CTDO1971.gz"
    assert _dataset_of(path) == "CTD"
    content = pathlib.Path(path).read_bytes()
    rows = list(parse_file_content(path, content))
    assert rows and all(err is None for _, err in rows)
    assert {cast[0] for cast, _ in rows} == {"CTD"}  # cast[0] = dataset col
