"""Column profiling (operators/profile.py): exact path vs hand-computed
reference, approximate single-pass path within HLL++ tolerance."""

import pytest

from data_transform_make_spark.operators.profile import profile_columns


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "a", None),
            (2, "b", 10),
            (3, "a", 10),
            (4, None, 20),
            (5, "c", None),
        ],
        "id long, cat string, num int",
    )


def _by_col(df):
    return {r.col_name: r for r in df.collect()}


def test_exact_profile_hand_computed(frame):
    out = _by_col(profile_columns(frame, ["cat", "num", "id"]))
    assert set(out) == {"cat", "num", "id"}

    cat = out["cat"]
    assert (cat.n_rows, cat.n_nulls, cat.n_distinct) == (5, 1, 3)
    assert (cat.min_val, cat.max_val) == ("a", "c")

    num = out["num"]
    assert (num.n_rows, num.n_nulls, num.n_distinct) == (5, 2, 2)
    # lexicographic on the string cast: "10" < "20"
    assert (num.min_val, num.max_val) == ("10", "20")

    idp = out["id"]
    assert (idp.n_rows, idp.n_nulls, idp.n_distinct) == (5, 0, 5)


def test_exact_all_null_column(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "id long, dead string"
    )
    out = _by_col(profile_columns(df, ["dead"]))
    dead = out["dead"]
    assert (dead.n_rows, dead.n_nulls, dead.n_distinct) == (2, 2, 0)
    assert dead.min_val is None and dead.max_val is None


def test_approx_profile_matches_exact_within_tolerance(spark, sf_dir):
    from data_transform_make_spark.sources.loader import load_table

    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderstatus", "o_orderpriority", "o_custkey"]
    exact = _by_col(profile_columns(orders, cols, exact=True))
    approx = _by_col(profile_columns(orders, cols, exact=False))
    for c in cols:
        e, a = exact[c], approx[c]
        # counts, bounds, nulls are exact in both paths
        assert (a.n_rows, a.n_nulls) == (e.n_rows, e.n_nulls)
        assert (a.min_val, a.max_val) == (e.min_val, e.max_val)
        # HLL++ default rsd is 5%; allow a conservative band
        assert abs(a.n_distinct - e.n_distinct) <= max(2, 0.1 * e.n_distinct)


def test_empty_cols_rejected(frame):
    with pytest.raises(ValueError):
        profile_columns(frame, [])


def test_empty_frame_yields_zero_rows_per_column_both_paths(spark):
    """Contract parity: an empty input still reports every audited column
    with n_rows=0 on BOTH paths."""
    df = spark.createDataFrame([], "id long, cat string")
    for exact in (True, False):
        out = _by_col(profile_columns(df, ["cat", "id"], exact=exact))
        assert set(out) == {"cat", "id"}, f"exact={exact}"
        for c in ("cat", "id"):
            r = out[c]
            assert (r.n_rows, r.n_nulls, r.n_distinct) == (0, 0, 0)
            assert r.min_val is None and r.max_val is None


def test_duplicate_cols_rejected(frame):
    """Round-9 review: a duplicated name merges into ONE report row whose
    counts are silently doubled (both stacked structs share the col_name
    group key)."""
    with pytest.raises(ValueError, match="duplicate"):
        profile_columns(frame, ["status", "status"])
