"""Tests for keep_min_by's bounds-checked packed-order fast path (r21).

The contract under test: ``packed_order=True`` NEVER changes results —
on eligible data it swaps the SortAggregate min_by(struct) kernel for a
HashAggregate min(packed bigint); on anything out of range (NULLs, NaN,
fractional or -0.0 doubles, joint range over 63 bits, payload columns
outside keys+order) it falls back to the struct path.
"""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_transform_make_spark.operators.dedup import _packed_min_by, keep_min_by


def _rows(df):
    # NaN != NaN under tuple equality; canonicalize for comparison
    def canon(v):
        return "NaN" if isinstance(v, float) and math.isnan(v) else v

    return sorted(tuple(canon(v) for v in r) for r in df.collect())


def _assert_same(df, keys, order):
    old = keep_min_by(df, keys, order)
    new = keep_min_by(df, keys, order, packed_order=True)
    assert old.schema == new.schema
    assert _rows(old) == _rows(new)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_packed_path_taken_and_identical(spark):
    df = spark.createDataFrame(
        [(1, 10, 2, 5.0), (1, 10, 1, 7.0), (1, 10, 1, 3.0), (2, 20, 9, -4.0)],
        "k1 int, k2 int, a int, b double",
    )
    fast = _packed_min_by(df, ["k1", "k2"], ["a", "b"])
    assert fast is not None
    assert "HashAggregate" in _plan(fast) and "SortAggregate" not in _plan(fast)
    _assert_same(df, ["k1", "k2"], ["a", "b"])
    assert _rows(fast) == [(1, 10, 1, 3.0), (2, 20, 9, -4.0)]


def test_packed_negative_values_ok(spark):
    # negatives are handled by the min-bias, not rejected (the r20
    # unchecked packing silently reordered on them — the check is the fix)
    df = spark.createDataFrame(
        [(1, -5, -50.0), (1, -5, -60.0), (1, -6, 100.0)],
        "k int, a int, b double",
    )
    assert _packed_min_by(df, ["k"], ["a", "b"]) is not None
    _assert_same(df, ["k"], ["a", "b"])


@pytest.mark.parametrize(
    "rows,schema",
    [
        # fractional double -> decode would change bytes
        ([(1, 1, 2.5)], "k int, a int, b double"),
        # NaN -> try_cast NULL -> bad
        ([(1, 1, float("nan"))], "k int, a int, b double"),
        # +-Inf
        ([(1, 1, float("inf"))], "k int, a int, b double"),
        # -0.0 -> decodes +0.0, byte-different output
        ([(1, 1, -0.0)], "k int, a int, b double"),
        # NULL order value: min() skips NULLs, min_by ranks them first
        ([(1, None, 1.0), (1, 2, 2.0)], "k int, a int, b double"),
        ([(1, 2, None), (1, 2, 2.0)], "k int, a int, b double"),
        # joint range over 63 bits (a spans ~2^63 after bias, b needs 1 bit)
        (
            [(1, -(2**62), 0), (1, 2**62, 1)],
            "k int, a long, b long",
        ),
        # b alone needs a >=63-bit split: the 2^63 literal would overflow
        # a Spark long even though a_range is 0
        (
            [(1, 5, -(2**62)), (1, 5, 2**62)],
            "k int, a long, b long",
        ),
    ],
)
def test_fallback_on_unsafe_values(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    assert _packed_min_by(df, ["k"], ["a", "b"]) is None
    # and the public entry point still answers, via the struct path
    _assert_same(df, ["k"], ["a", "b"])


def test_structural_ineligibility(spark):
    df = spark.createDataFrame(
        [(1, 1, 1.0, "payload")], "k int, a int, b double, t string"
    )
    # payload column outside keys+order -> packed cannot reconstruct it
    assert _packed_min_by(df, ["k"], ["a", "b"]) is None
    df2 = spark.createDataFrame([(1, 1, "x")], "k int, a int, b string")
    # non-numeric order col
    assert _packed_min_by(df2, ["k"], ["a", "b"]) is None
    df3 = spark.createDataFrame([(1, 1, 2)], "k int, a int, b int")
    # expression keys (not plain names) stay on the struct path
    assert _packed_min_by(df3, [F.col("k") + 1], ["a", "b"]) is None
    # single order col: packed path is defined for exactly two
    assert _packed_min_by(df3.select("k", "a"), ["k"], ["a"]) is None


def test_bounds_probe_superset(spark):
    probe = spark.createDataFrame(
        [(1, 1, 1.0), (2, 9, 50.0)], "k int, a int, b double"
    )
    df = probe.filter(F.col("k") == 1)
    fast = _packed_min_by(df, ["k"], ["a", "b"], bounds_probe=probe)
    assert fast is not None
    _assert_same(df, ["k"], ["a", "b"])
    # an unsafe probe vetoes packing even if df itself would be in range
    bad_probe = spark.createDataFrame([(1, 1, 2.5)], "k int, a int, b double")
    assert _packed_min_by(df, ["k"], ["a", "b"], bounds_probe=bad_probe) is None


def test_empty_input(spark):
    df = spark.createDataFrame([], "k int, a int, b double")
    assert _packed_min_by(df, ["k"], ["a", "b"]) is None
    assert keep_min_by(df, ["k"], ["a", "b"], packed_order=True).count() == 0


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=-(2**40), max_value=2**40),
            st.one_of(
                st.integers(min_value=-(2**31), max_value=2**31).map(float),
                st.floats(allow_nan=True, allow_infinity=True, width=64),
                st.none(),
            ),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_property_identical_to_struct_path(spark_global, rows):
    # arbitrary data: eligible -> packed, ineligible -> fallback; the
    # observable contract is ONE thing either way: results == struct path
    df = spark_global.createDataFrame(rows, "k int, a long, b double")
    old = keep_min_by(df, ["k"], ["a", "b"])
    new = keep_min_by(df, ["k"], ["a", "b"], packed_order=True)
    assert old.schema == new.schema

    def norm(rows):
        # NaN != NaN under tuple equality; compare on a canonical form
        return sorted(
            (k, a, "NaN" if b is not None and math.isnan(b) else b)
            for (k, a, b) in (tuple(r) for r in rows)
        )

    assert norm(old.collect()) == norm(new.collect())


@pytest.fixture(scope="module")
def spark_global():
    from data_transform_make_spark.session import get_spark

    return get_spark("tests", cpus=4)
