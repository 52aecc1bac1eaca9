"""Two-phase top-k (operators/windows.py) must be plan-for-plan identical in
results to the single-window form whenever the order is total — including
under skewed groups, duplicate order values with tie-breaks, groups smaller
than k, and any input partitioning."""

import random

from pyspark.sql import functions as F

from data_transform_make_spark.operators.windows import top_k_per_group


def _rows(seed: int, n: int, n_groups: int):
    rng = random.Random(seed)
    return [
        (
            f"g{rng.randrange(n_groups)}",
            rng.randrange(50),  # heavy duplicate order values
            i,  # unique tie-break
        )
        for i in range(n)
    ]


def test_sessionize_negative_gap_rejected(spark):
    """Round-10 review: the inter-event gap is always >= 0 under the
    time-ordered window, so a negative threshold silently fractures
    every row into its own session — refused (gap_seconds=0 stays
    legal: equal-ts events share a session)."""
    import pytest

    from data_transform_make_spark.operators.windows import sessionize

    df = spark.createDataFrame([(1, 100)], "user_id long, ts long")
    with pytest.raises(ValueError, match="gap_seconds"):
        sessionize(df, ["user_id"], "ts", -1)


def test_two_phase_equals_one_phase(spark):
    for seed, n, n_groups, parts in [(1, 500, 3, 7), (2, 300, 40, 2), (3, 80, 5, 16)]:
        df = spark.createDataFrame(
            _rows(seed, n, n_groups), "grp string, val int, uid int"
        ).repartition(parts)
        order = [F.col("val").desc(), F.col("uid")]
        one = top_k_per_group(df, ["grp"], order, 4, two_phase=False)
        two = top_k_per_group(df, ["grp"], order, 4, two_phase=True)
        r1 = sorted(map(tuple, one.collect()))
        r2 = sorted(map(tuple, two.collect()))
        assert r1 == r2, f"seed={seed}: two-phase diverged"


def test_two_phase_groups_smaller_than_k(spark):
    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 2), ("b", 9, 3)], "grp string, val int, uid int"
    ).repartition(5)
    order = [F.col("val").desc(), F.col("uid")]
    out = sorted(
        map(tuple, top_k_per_group(df, ["grp"], order, 10, two_phase=True).collect())
    )
    assert out == [
        ("a", 1, 1, 2),
        ("a", 2, 2, 1),
        ("b", 9, 3, 1),
    ]
