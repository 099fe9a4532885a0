"""Property-based round-trip fuzzing of the WOD decoder.

A test-only WOD *encoder* generates random casts, renders them in the WOD
native variable-length encoding (including 80-char line framing), and the
production decoder must recover every field exactly. This covers encode
paths the six fixtures never exercise (missing values everywhere, extreme
precisions, empty profiles, multi-variable metadata) — the reference ships
no property tests at all (SURVEY §5).
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from wod_ascii_to_parquet_spark_spark.sources.wod_format import (
    LINE_WIDTH,
    iter_casts,
    parse_cast,
    split_records,
)


# --- encoder (test-only) ---------------------------------------------------


def enc_int(v: int | None) -> str:
    if v is None:
        return "-"
    s = str(v)
    assert 1 <= len(s) <= 9
    return f"{len(s)}{s}"


def enc_float(v: float | None, prec: int) -> str:
    if v is None:
        return "-"
    raw = str(int(round(v * 10**prec)))
    total = len(raw)
    sig = len(raw.lstrip("-").lstrip("0")) or 1
    assert total <= 9 and prec <= 9
    return f"{sig}{total}{prec}{raw}"


def dec_of(v: float | None, prec: int) -> float | None:
    """The value the decoder should recover (quantized to prec)."""
    if v is None:
        return None
    return int(round(v * 10**prec)) / 10**prec


def encode_cast(c: dict) -> str:
    body = []
    body.append(enc_int(c["castNumber"]))
    body.append(c["country"])
    body.append(enc_int(c["cruise"]))
    body.append(f"{c['year']:4d}")
    body.append(f"{c['month']:2d}" if c["month"] is not None else "  ")
    body.append(f"{c['day']:2d}" if c["day"] is not None else "  ")
    body.append(enc_float(c["time"], 2))
    body.append(enc_float(c["lat"], 4))
    body.append(enc_float(c["lon"], 4))
    body.append(enc_int(len(c["depths"])))
    body.append(str(c["profileType"]))
    body.append(f"{len(c['variables']):2d}")
    for code, qc, meta in c["variables"]:
        body.append(enc_int(code))
        body.append(str(qc))
        body.append(enc_int(len(meta)) if meta else "0")
        for mcode, mval in meta:
            body.append(enc_int(mcode))
            body.append(enc_float(mval, 2))
    body.append("-")  # no character data
    # secondary header block
    if c["attributes"]:
        sec = [enc_int(len(c["attributes"]))]
        for acode, aval in c["attributes"]:
            sec.append(enc_int(acode))
            sec.append(enc_float(aval, 3))
        sec_str = "".join(sec)
        body.append(enc_int(len(sec_str)))
        body.append(sec_str)
    else:
        body.append("-")
    body.append("-")  # no biology block
    for depth, data in c["depths"]:
        body.append(enc_float(depth, 1))
        if depth is not None:
            body.append("00")  # depth err + originator flags
        for (vcode, _qc, _meta), val in zip(c["variables"], data):
            body.append(enc_float(val, 3))
            if val is not None:
                body.append("00")
    payload = "".join(body)
    # total byte count includes itself and the version byte: solve fixpoint
    count = len(payload) + 2  # 'C' + count-field placeholder grows
    for _ in range(3):
        count_field = enc_int(count)
        count = len(payload) + 1 + len(count_field)
    record = "C" + enc_int(count) + payload
    assert len(record) == count, (len(record), count)
    # frame into 80-char lines, last line padded
    lines = [record[i : i + LINE_WIDTH] for i in range(0, len(record), LINE_WIDTH)]
    lines[-1] = lines[-1].ljust(LINE_WIDTH)
    return "\n".join(lines)


# --- strategies ------------------------------------------------------------

small_float = st.floats(
    min_value=-999.0, max_value=999.0, allow_nan=False, allow_infinity=False
)
opt_val = st.one_of(st.none(), small_float)

variable = st.tuples(
    st.integers(1, 99),
    st.integers(0, 9),
    st.lists(st.tuples(st.integers(1, 99), small_float), max_size=3),
)


@st.composite
def cast_strategy(draw):
    variables = draw(st.lists(variable, min_size=0, max_size=4))
    n_depths = draw(st.integers(0, 12))
    depths = []
    for _ in range(n_depths):
        depth = draw(st.one_of(st.none(), st.floats(0, 9999.9).map(lambda x: x)))
        data = [draw(opt_val) for _ in variables]
        depths.append((depth, data))
    return {
        "castNumber": draw(st.integers(1, 99_999_999)),
        "country": draw(st.sampled_from(["US", "GB", "JP", "  "])),
        "cruise": draw(st.one_of(st.none(), st.integers(1, 999_999))),
        "year": draw(st.integers(1900, 2025)),
        "month": draw(st.one_of(st.none(), st.integers(1, 12))),
        "day": draw(st.one_of(st.none(), st.integers(1, 31))),
        "time": draw(st.one_of(st.none(), st.floats(0, 23.99))),
        "lat": draw(st.one_of(st.none(), st.floats(-90, 90))),
        "lon": draw(st.one_of(st.none(), st.floats(-180, 180))),
        "profileType": draw(st.integers(0, 1)),
        "variables": variables,
        "attributes": draw(
            st.lists(st.tuples(st.integers(1, 99), small_float), max_size=3)
        ),
        "depths": depths,
    }


@settings(max_examples=150, deadline=None)
@given(cast_strategy())
def test_roundtrip_single_cast(c):
    text = encode_cast(c)
    parsed = parse_cast(next(split_records(text)), "FUZZ")
    assert parsed.castNumber == c["castNumber"]
    assert parsed.country == c["country"]
    assert parsed.cruiseNumber == c["cruise"]
    assert parsed.year == c["year"]
    assert parsed.month == c["month"]
    assert parsed.day == c["day"]
    for got, want, prec in [
        (parsed.time, c["time"], 2),
        (parsed.latitude, c["lat"], 4),
        (parsed.longitude, c["lon"], 4),
    ]:
        expected = dec_of(want, prec)
        if expected is None:
            assert got is None
        else:
            assert got is not None and math.isclose(got, expected, abs_tol=1e-9)
    assert parsed.profileType == c["profileType"]
    assert [(v[0], v[1]) for v in parsed.variables] == [
        (v[0], v[1]) for v in c["variables"]
    ]
    for (pv, cv) in zip(parsed.variables, c["variables"]):
        assert len(pv[2]) == len(cv[2])
        for (mcode, mval), (ecode, eval_) in zip(pv[2], cv[2]):
            assert mcode == ecode
            assert math.isclose(mval, dec_of(eval_, 2), abs_tol=1e-9)
    assert len(parsed.attributes) == len(c["attributes"])
    assert len(parsed.depths) == len(c["depths"])
    for (pdepth, _pde, _pdo, pdata), (edepth, edata) in zip(
        parsed.depths, c["depths"]
    ):
        if edepth is None:
            assert pdepth is None
        else:
            assert math.isclose(pdepth, dec_of(edepth, 1), abs_tol=1e-9)
        expected_vals = [
            (c["variables"][i][0], dec_of(v, 3))
            for i, v in enumerate(edata)
            if v is not None
        ]
        got_vals = [(d[0], d[1]) for d in pdata]
        assert len(got_vals) == len(expected_vals)
        for (gc, gv), (ec, ev) in zip(got_vals, expected_vals):
            assert gc == ec and math.isclose(gv, ev, abs_tol=1e-9)


@settings(max_examples=30, deadline=None)
@given(st.lists(cast_strategy(), min_size=1, max_size=5))
def test_roundtrip_multi_cast_stream(casts):
    text = "\n".join(encode_cast(c) for c in casts)
    results = list(iter_casts(text, "FUZZ"))
    assert len(results) == len(casts)
    assert all(cast is not None for cast, _err in results)
    assert [cast.castNumber for cast, _ in results] == [
        c["castNumber"] for c in casts
    ]
