"""functions/money.py — the sign-aware SQL-round money fold (round 14).

Round 13 fixed the pandas half-to-even divergence on positive ties with
``floor(x + 0.5)``; that form is half-UP, which rounds NEGATIVE exact ties
toward +inf where SQL ``round`` (DuckDB, Spark) rounds half away from zero
— the identical silent-divergence shape one sign away (r13 verdict item 1,
r13 ADVICE). The interim r14 candidate ``trunc(y + copysign(0.5, y))`` is
half-away on both signs but DOUBLE-ROUNDS one-ULP near-ties (the ``+ 0.5``
addition itself rounds up) — caught by the r14 self-review before it
shipped; it survives here only in the replaced-folds-diverge history test.
The shipped fold is addition-free: ``rint(y)`` with EXACT ties (detected
by a representable ``|y - trunc(y)| == 0.5`` comparison) bumped away from
zero. These tests pin the shipped fold against DuckDB DOUBLE arithmetic on
both signs (exact ties, near-ties, the 2^52 boundary, a 400-value fuzz),
pin all three folds it replaced as divergent on the values that killed
them, and pin the loud NaN/Inf and int64-range refusals.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from data_transform_make_spark.functions.money import money_round_units

# exact .5 float ties of both signs (0.005 * 100 == 0.5 exactly in
# float64), NEAR-ties one ULP off the tie (the r14 self-review find:
# any `+ 0.5`-based fold double-rounds these), non-tie values, zeros
# (both float zeros), large magnitudes up to the 2^52 tie boundary
TIE_VALS = [
    -2.675, -1.5, -1.005, -0.5, -0.025, -0.015, -0.005,
    -0.0, 0.0,
    0.005, 0.015, 0.025, 0.5, 1.005, 1.5, 2.675,
    12.34, -12.34, 123456.789, -123456.789,
    0.004999999999999999, -0.004999999999999999,
    0.005000000000000001, -0.005000000000000001,
    4503599627370495.5 / 100, -4503599627370495.5 / 100,
]


def _duck_round(vals, scale):
    # CAST to DOUBLE: the oracle columns are parquet doubles — a bare SQL
    # literal would be DECIMAL and round in decimal arithmetic, which is
    # not the comparison the driver performs.
    return [
        duckdb.sql(
            f"SELECT CAST(round(CAST({v!r} AS DOUBLE) * {scale}) AS BIGINT)"
        ).fetchone()[0]
        for v in vals
    ]


@pytest.mark.parametrize("scale", [100, 10000])
def test_fold_matches_duckdb_round_on_both_signs(scale):
    s = pd.Series(TIE_VALS, dtype="float64")
    assert money_round_units(s, scale).tolist() == _duck_round(TIE_VALS, scale)


def test_replaced_folds_diverge_on_the_values_that_killed_them():
    s = pd.Series(TIE_VALS, dtype="float64")
    oracle = _duck_round(TIE_VALS, 100)
    # pandas half-to-even: dies on positive ties (the r13 find)
    assert (s * 100).round().astype("int64").tolist() != oracle
    # r13's floor(x + 0.5) half-UP: dies on negative ties (the r14 fix)
    assert np.floor(s * 100 + 0.5).astype("int64").tolist() != oracle
    # the interim r14 trunc(y + copysign(.5, y)): dies on one-ULP
    # near-ties — the addition itself rounds 0.4999...94 + 0.5 to 1.0
    # (the r14 self-review find)
    y = np.asarray(s, dtype="float64") * 100
    interim = np.trunc(y + np.copysign(0.5, y)).astype("int64").tolist()
    assert interim != oracle


def test_fuzz_against_duckdb_round():
    # deterministic fuzz: random magnitudes plus constructed ULP
    # neighborhoods around ties — every value must match DuckDB round()
    rng = np.random.default_rng(20260815)
    vals = list(rng.uniform(-1e6, 1e6, 200)) + list(
        rng.uniform(-0.02, 0.02, 200)
    )
    for base in (0.005, -0.005, 1.5, -1.5, 2.5, 12345.675):
        b = np.float64(base)
        for v in (b, np.nextafter(b, -np.inf), np.nextafter(b, np.inf)):
            vals.append(float(v))
    s = pd.Series(vals, dtype="float64")
    assert money_round_units(s, 100).tolist() == _duck_round(vals, 100)


def test_negative_ties_specifically():
    # the exact divergence class: floor(-0.5 + 0.5) = 0, SQL says -1
    s = pd.Series([-0.005, -0.015, -0.025], dtype="float64")
    assert money_round_units(s, 100).tolist() == [-1, -2, -3]


def test_preserves_pandas_series_container():
    # a scalar pandas_udf must return a Series, index preserved
    s = pd.Series([1.0, 2.5], index=[7, 9], dtype="float64")
    out = money_round_units(s, 100)
    assert isinstance(out, pd.Series)
    assert out.index.tolist() == [7, 9]
    assert out.dtype == np.int64


def test_ndarray_input_supported():
    out = money_round_units(np.array([-0.005, 0.005]), 100)
    assert isinstance(out, np.ndarray)
    assert out.tolist() == [-1, 1]


@pytest.mark.parametrize("bad", [float("nan"), float("inf"), float("-inf")])
def test_non_finite_refused_loudly(bad):
    with pytest.raises(ValueError, match="non-finite"):
        money_round_units(pd.Series([1.0, bad]), 100)


def test_int64_overflow_refused_loudly():
    # r14 ADVICE: a finite value whose SCALED value leaves int64 would
    # wrap through numpy's out-of-range float->int64 cast — refuse
    # instead. The bound is asymmetric like int64 (r15 self-review):
    # scaled +2^63 is out of range and refused...
    with pytest.raises(ValueError, match="int64"):
        money_round_units(pd.Series([1.0, (2.0**63) / 100]), 100)
    # ...and anything strictly below -2^63 is refused too
    with pytest.raises(ValueError, match="int64"):
        money_round_units(pd.Series([-(2.0**64) / 100]), 100)


def test_int64_boundary_values_still_fold():
    # the largest float64 strictly below 2^63 (spacing 1024 there) must
    # pass the guard and cast exactly, and exactly -2^63 IS a valid int64
    # unit value (the oracle CAST accepts it) — above-2^53 values are
    # documented as beyond cent precision but remain exact integer floats
    below = float(np.nextafter(2.0**63, 0.0))
    out = money_round_units(
        pd.Series([below / 100, -below / 100, -(2.0**63) / 100]), 100
    )
    assert out.tolist() == [int(below), -int(below), -(2**63)]
