"""SQL-surface queries: recursive CTE hierarchy depth and calendar
gap fill (corpus rc1 / gf1)."""

from data_transform_make_spark.corpus import (
    gf1_calendar_gap_fill,
    rc1_recursive_hierarchy,
)


def test_recursive_depth_matches_closed_form(spark, sf_dir):
    """In the parent = floor(id/2) forest, depth(id) = bit_length(id)
    (root id 1 at depth 1) — the recursion must reproduce the closed
    form for every supplier."""
    rows = rc1_recursive_hierarchy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # ids 0 and 1 are both anchor roots (<= 1) at depth 1
        want = max(int(r.s_suppkey).bit_length(), 1)
        assert r.depth == want, r


def test_gap_fill_is_continuous_and_count_preserving(spark, sf_dir):
    import datetime

    rows = gf1_calendar_gap_fill(spark, sf_dir).collect()
    days = sorted(datetime.date.fromisoformat(r.day) for r in rows)
    # dense axis: every consecutive pair is exactly one day apart
    assert all(
        (b - a).days == 1 for a, b in zip(days, days[1:])
    ), "calendar has gaps"
    # zero-filling must not invent or lose orders
    from data_transform_make_spark.sources.loader import load_table

    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in rows) == n_orders


def test_gap_fill_eager_and_lazy_twins_agree(spark, sf_dir):
    """gf1(eager=False) exists so the EXPLAIN audit sees the composed
    join/broadcast plan instead of a Scan ExistingRDD (the d3/dec1/ll*
    convention). The audited lazy plan and the certified eager plan must
    return IDENTICAL rows, or the audit convention could drift from the
    certified query (verdict, round 6)."""
    eager = sorted(
        (r.day, r.n_orders) for r in gf1_calendar_gap_fill(spark, sf_dir).collect()
    )
    lazy = sorted(
        (r.day, r.n_orders)
        for r in gf1_calendar_gap_fill(spark, sf_dir, eager=False).collect()
    )
    assert eager == lazy
