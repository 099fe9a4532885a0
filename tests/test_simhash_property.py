"""Property tests for the packed-BIGINT simhash kernel (pure Python mirrors
of the generated Spark SQL — no JVM needed, so hypothesis can hammer the
bit arithmetic across the full 64-bit domain including the sign bit).

What is pinned:

- the **pigeonhole recall guarantee** the segment equi-join relies on: two
  fingerprints within Hamming distance ``d`` MUST share at least one of the
  ``d+1`` segments — if this ever failed for some (nbits, d) choice the
  candidate join would silently lose pairs (a recall bug no row-count or
  determinism check would catch);
- the **shift/mask segment extraction** against an independent bit-slice
  formulation, across negative fingerprints (arithmetic shiftright smears
  sign bits; the mask must kill them);
- the **popcount Hamming identity** against the per-bit-difference sum the
  pre-packed array formulation computed.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from wod_ascii_to_parquet_spark_spark.operators.dedup import _segment_starts

I64_MIN, I64_MAX = -(1 << 63), (1 << 63) - 1


def _to_u64(fp: int) -> int:
    return fp & ((1 << 64) - 1)


def _bits_msb_first(fp: int, nbits: int) -> list[int]:
    """bits[i] as packed by simhash_bits: vote bit i sits at fp position
    nbits-1-i (MSB end first)."""
    u = _to_u64(fp)
    return [(u >> (nbits - 1 - i)) & 1 for i in range(nbits)]


def _seg_val(fp: int, nbits: int, start: int, width: int) -> int:
    """The generated Spark expression: shiftright(fp, nbits-start-width)
    & ((1<<width)-1), with Java's ARITHMETIC >> on the signed 64-bit
    value — mirrored here exactly via sign-extended shift then mask."""
    # sign-extend to Python int semantics (Python's >> on negative ints IS
    # arithmetic, like Java's), then mask
    shifted = fp >> (nbits - start - width)
    return shifted & ((1 << width) - 1)


@given(
    fp=st.integers(min_value=I64_MIN, max_value=I64_MAX),
    nbits_dist=st.sampled_from([(64, 3), (32, 8)]),
)
@settings(max_examples=300, deadline=None)
def test_segment_extraction_matches_bit_slice(fp, nbits_dist):
    nbits, d = nbits_dist
    if nbits == 32:
        fp &= (1 << 32) - 1  # 32-bit arm packs into the low 32 bits
    bits = _bits_msb_first(fp, nbits)
    for start, width in _segment_starts(nbits, d + 1):
        expected = 0
        for b in bits[start : start + width]:
            expected = expected * 2 + b
        assert _seg_val(fp, nbits, start, width) == expected


@given(
    fp=st.integers(min_value=I64_MIN, max_value=I64_MAX),
    flip_positions=st.sets(st.integers(min_value=0, max_value=63), max_size=3),
)
@settings(max_examples=300, deadline=None)
def test_pigeonhole_recall_guarantee_64_3(fp, flip_positions):
    """Flip at most d=3 bits: at least one of the 4 segments must be
    IDENTICAL between the original and mutated fingerprint — the recall
    contract of the candidate equi-join."""
    nbits, d = 64, 3
    other = fp
    for p in flip_positions:
        other ^= 1 << p
    other = ((other + (1 << 63)) % (1 << 64)) - (1 << 63)  # back to signed
    segs = _segment_starts(nbits, d + 1)
    matches = [
        _seg_val(fp, nbits, s, w) == _seg_val(other, nbits, s, w)
        for s, w in segs
    ]
    assert any(matches), (hex(fp), sorted(flip_positions), matches)


@given(
    a=st.integers(min_value=I64_MIN, max_value=I64_MAX),
    b=st.integers(min_value=I64_MIN, max_value=I64_MAX),
)
@settings(max_examples=300, deadline=None)
def test_popcount_hamming_equals_bit_difference_sum(a, b):
    """bit_count(a ^ b) == Σ|bits_a[i] - bits_b[i]| — the identity that
    lets the packed verify replace the 64-step array fold."""
    xor = _to_u64(a) ^ _to_u64(b)
    popcount = bin(xor).count("1")
    per_bit = sum(
        abs(x - y)
        for x, y in zip(_bits_msb_first(a, 64), _bits_msb_first(b, 64))
    )
    assert popcount == per_bit
