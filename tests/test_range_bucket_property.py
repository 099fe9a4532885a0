"""Property test for the time-bucketing algebra behind
``join_range_bucketed`` (operators/joins.py): for ANY pair of
microsecond timestamps, the bucketed equi-join + exact refilter must
match exactly the naive interval predicate, and every qualifying pair
must meet in EXACTLY one bucket (no dedup pass required).

The algebra is pure integer arithmetic, so it is tested directly (the
Spark expressions are floor/divide on BIGINTs — bit-identical to Python
ints here); the engine-level equivalence is separately pinned by the
query's DuckDB oracle, which states the naive semantics.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from wod_ascii_to_parquet_spark_spark.operators.joins import _BUCKET_US

# timestamps around a realistic epoch, microsecond precision, including
# exact second/bucket boundaries (multiples are generated explicitly).
_US = st.one_of(
    st.integers(min_value=1_700_000_000_000_000, max_value=1_700_010_000_000_000),
    st.integers(min_value=0, max_value=10_000).map(
        lambda k: 1_700_000_000_000_000 + k * _BUCKET_US  # exact bucket edges
    ),
    st.integers(min_value=0, max_value=10_000_000).map(
        lambda k: 1_700_000_000_000_000 + k * 1_000_000  # exact second edges
    ),
)


def _covering_buckets(a_um: int) -> set[int]:
    # mirrors: sequence(floor(a/W), floor((a + W - 1) / W))
    lo = a_um // _BUCKET_US
    hi = (a_um + _BUCKET_US - 1) // _BUCKET_US
    return set(range(lo, hi + 1))


@settings(max_examples=2000, deadline=None)
@given(a=_US, b=_US)
def test_bucket_match_iff_naive_match(a: int, b: int) -> None:
    naive = a <= b < a + _BUCKET_US
    b_bucket = b // _BUCKET_US
    meets = b_bucket in _covering_buckets(a)
    # completeness: every naive match meets in some covering bucket
    if naive:
        assert meets
    # exactness: the join refilters with the naive predicate, so a met
    # pair is emitted iff naive — and b has exactly ONE bucket, so a
    # qualifying pair can never be emitted twice.
    assert len({b_bucket} & _covering_buckets(a)) <= 1


@settings(max_examples=2000, deadline=None)
@given(a=_US)
def test_window_spans_at_most_two_buckets(a: int) -> None:
    cov = _covering_buckets(a)
    assert 1 <= len(cov) <= 2
    # exactly 1 bucket iff the window starts on a bucket boundary
    assert (len(cov) == 1) == (a % _BUCKET_US == 0)
