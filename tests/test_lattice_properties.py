"""Hypothesis property tests for the dtype-resolution lattice (pure
driver-side logic — no Spark session needed)."""

from __future__ import annotations

from hypothesis import given, strategies as st
from pyspark.sql import types as T

from dvmax_spark.operators.union_ops import resolve_dtype

ATOMS = [
    T.NullType(),
    T.BooleanType(),
    T.ByteType(),
    T.ShortType(),
    T.IntegerType(),
    T.LongType(),
    T.FloatType(),
    T.DoubleType(),
    T.StringType(),
    T.DateType(),
    T.TimestampType(),
]

dtypes = st.sampled_from(ATOMS)


@given(dtypes, dtypes)
def test_commutative(a, b):
    assert resolve_dtype(a, b) == resolve_dtype(b, a)


@given(dtypes)
def test_idempotent(a):
    assert resolve_dtype(a, a) == a


@given(dtypes, dtypes, dtypes)
def test_associative(a, b, c):
    assert resolve_dtype(resolve_dtype(a, b), c) == resolve_dtype(a, resolve_dtype(b, c))


@given(dtypes, dtypes)
def test_absorbs_null_and_string_wins(a, b):
    r = resolve_dtype(a, b)
    if isinstance(a, T.NullType):
        assert r == b
    if isinstance(a, T.StringType) and not isinstance(b, T.NullType):
        assert r == T.StringType()
    # result is never NullType unless both are
    if not (isinstance(a, T.NullType) and isinstance(b, T.NullType)):
        assert not isinstance(r, T.NullType)
