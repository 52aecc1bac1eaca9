"""Unit tests for the join operators (operators/joins.py) — the as-of
union-window composition's row coherence and the bucketed range join's
mode contract. The j2/j3 oracle twins certify the happy paths at sf0.01;
these pin the edge semantics the fixture doesn't reach."""

import pytest

from data_transform_make_spark.operators.joins import (
    as_of_join,
    bucketed_range_join,
)


def test_as_of_join_matches_latest_row_whole_including_nulls(spark):
    """The matched right row is taken WHOLE (review, round 8): per-column
    carry-forward skipped a NULL field in the latest right row in favor
    of a stale earlier value, and could stitch fields from DIFFERENT
    right rows into one output row."""
    left = spark.createDataFrame(
        [("k1", 3), ("k1", 1)], "key string, lts long"
    )
    right = spark.createDataFrame(
        [("k1", 1, 10, 100), ("k1", 2, None, 200)],
        "key string, rts long, a long, b long",
    )
    out = {
        r.lts: (r.a, r.b)
        for r in as_of_join(
            left, right, ["key"], "lts", "rts", ["a", "b"]
        ).collect()
    }
    # lts=3 matches the rts=2 row AS A ROW: a is its NULL (not the stale
    # 10 from rts=1), b its 200. lts=1 matches rts=1 whole.
    assert out == {3: (None, 200), 1: (10, 100)}


def test_as_of_join_no_match_yields_nulls(spark):
    left = spark.createDataFrame([("k1", 0)], "key string, lts long")
    right = spark.createDataFrame(
        [("k1", 5, 1)], "key string, rts long, a long"
    )
    rows = as_of_join(left, right, ["key"], "lts", "rts", ["a"]).collect()
    assert len(rows) == 1 and rows[0].a is None


def test_as_of_join_equal_ts_right_row_is_visible(spark):
    """The <= convention: a right row AT the left row's timestamp
    matches (right rows sort before left rows at equal ts)."""
    left = spark.createDataFrame([("k1", 5)], "key string, lts long")
    right = spark.createDataFrame(
        [("k1", 5, 7)], "key string, rts long, a long"
    )
    rows = as_of_join(left, right, ["key"], "lts", "rts", ["a"]).collect()
    assert rows[0].a == 7


def test_as_of_join_matches_python_reference_randomized(spark):
    """Randomized cross-check against a direct Python as-of reference:
    for each left row, the latest right row with rts <= lts in its key,
    taken WHOLE (NULL fields included). Equal-(key, ts) right rows are
    NOT filtered out (round 9): the tie CONTRACT says the greatest row
    by field-wise value-struct comparison wins (NULL fields smallest),
    so the reference ranks by (rts, struct-order) and must agree."""
    import random

    rng = random.Random(8)
    keys = ["a", "b", "c"]
    left = [
        (rng.choice(keys), rng.randrange(100), i) for i in range(60)
    ]
    # ts drawn from a small range over 40 rows on 3 keys guarantees
    # duplicate (key, ts) pairs; small value domains + None exercise the
    # struct comparison including its NULLS-smallest rule
    right = [
        (
            rng.choice(keys),
            rng.randrange(100),
            rng.choice([None, rng.randrange(10)]),
            rng.randrange(10),
        )
        for _ in range(40)
    ]
    assert len({(r[0], r[1]) for r in right}) < len(right), (
        "fixture must contain equal-(key, ts) right rows to exercise the "
        "tie contract"
    )

    def struct_key(r):
        # Spark struct ordering: field by field, NULL smallest
        return tuple((v is not None, v) for v in (r[2], r[3]))

    def expect(k, lts):
        cands = [r for r in right if r[0] == k and r[1] <= lts]
        if not cands:
            return (None, None)
        best = max(cands, key=lambda r: (r[1], struct_key(r)))
        return (best[2], best[3])

    ldf = spark.createDataFrame(left, "key string, lts long, lid long")
    rdf = spark.createDataFrame(
        right, "key string, rts long, a long, b long"
    )
    out = as_of_join(ldf, rdf, ["key"], "lts", "rts", ["a", "b"])
    got = {r.lid: (r.a, r.b) for r in out.collect()}
    want = {lid: expect(k, lts) for (k, lts, lid) in left}
    assert got == want

    # partition invariance — the point of the tie CONTRACT: the winner
    # must not depend on how either side happens to be partitioned
    for lp, rp in ((1, 7), (7, 1), (5, 5)):
        out_p = as_of_join(
            ldf.repartition(lp), rdf.repartition(rp, "rts"),
            ["key"], "lts", "rts", ["a", "b"],
        )
        assert {r.lid: (r.a, r.b) for r in out_p.collect()} == want, (lp, rp)


def test_as_of_join_explicit_tiebreaker_randomized_reference(spark):
    """Randomized cross-check of the EXPLICIT-tiebreaker mode under the
    round-10 residual-tie totality contract: winner = max by
    (rts, tiebreaker, value-struct) — the tiebreaker takes precedence,
    the value struct totalizes rows sharing (key, ts, tiebreaker).
    Duplicate (key, ts, seq) rows are planted on purpose; the result
    must match the Python reference under every partitioning."""
    import random

    rng = random.Random(17)
    keys = ["a", "b"]
    left = [(rng.choice(keys), rng.randrange(40), i) for i in range(40)]
    # seq drawn from {0,1,2} over 30 rows on 2 keys with ts in a small
    # range guarantees duplicate (key, ts, seq) triples with differing
    # value columns — the exact residual-tie case the contract totalizes
    right = [
        (
            rng.choice(keys),
            rng.randrange(40),
            rng.randrange(3),
            rng.choice([None, rng.randrange(5)]),
        )
        for _ in range(30)
    ]
    assert len({(r[0], r[1], r[2]) for r in right}) < len(right), (
        "fixture must contain duplicate (key, ts, tiebreaker) rows"
    )

    def expect(k, lts):
        cands = [r for r in right if r[0] == k and r[1] <= lts]
        if not cands:
            return None
        # tiebreaker first, then the value struct (NULL smallest)
        best = max(
            cands, key=lambda r: (r[1], r[2], (r[3] is not None, r[3]))
        )
        return best[3]

    ldf = spark.createDataFrame(left, "key string, lts long, lid long")
    rdf = spark.createDataFrame(right, "key string, rts long, seq long, a long")
    for lp, rp in ((1, 1), (1, 7), (7, 1), (5, 5)):
        out = as_of_join(
            ldf.repartition(lp), rdf.repartition(rp),
            ["key"], "lts", "rts", ["a"], tiebreaker="seq",
        )
        got = {r.lid: r.a for r in out.collect()}
        want = {lid: expect(k, lts) for (k, lts, lid) in left}
        assert got == want, (lp, rp)


def test_as_of_join_explicit_tiebreaker_overrides_struct_order(spark):
    """With tiebreaker=<col>, the equal-ts winner is the MAX of that
    column even when struct order would pick the other row."""
    left = spark.createDataFrame([("k1", 5)], "key string, lts long")
    right = spark.createDataFrame(
        [("k1", 5, 99, 1), ("k1", 5, 1, 2)],
        "key string, rts long, a long, seq long",
    )
    rows = as_of_join(
        left, right, ["key"], "lts", "rts", ["a"], tiebreaker="seq"
    ).collect()
    # struct order on ["a"] alone would pick a=99; seq=2 wins instead
    assert rows[0].a == 1


def test_as_of_join_explicit_tiebreaker_residual_tie_is_total(spark):
    """ADVICE r9: two right rows sharing (key, ts, tiebreaker) but
    differing in value columns must still have a plan-independent
    winner — the value struct rides as the final tie-break component,
    so the greatest struct wins; and the explicit key keeps precedence
    over the struct."""
    left = spark.createDataFrame([("k1", 5)], "key string, lts long")
    right = spark.createDataFrame(
        [("k1", 5, 1, 10), ("k1", 5, 1, 99), ("k1", 5, 0, 500)],
        "key string, rts long, seq long, a long",
    )
    for lp, rp in ((1, 1), (1, 3), (3, 1), (3, 3)):
        rows = as_of_join(
            left.repartition(lp), right.repartition(rp),
            ["key"], "lts", "rts", ["a"], tiebreaker="seq",
        ).collect()
        # seq=1 beats seq=0 even though a=500 is the greatest struct;
        # within seq=1, a=99 beats a=10 (struct as final component)
        assert rows[0].a == 99, (lp, rp)


def test_as_of_join_refuses_unorderable_default_tiebreak(spark):
    """MapType value columns make the whole-struct tie-break key
    unorderable — refused loudly instead of a plan-dependent winner."""
    left = spark.createDataFrame([("k1", 5)], "key string, lts long")
    right = spark.createDataFrame(
        [("k1", 1, {"x": 1})], "key string, rts long, m map<string,long>"
    )
    with pytest.raises(ValueError, match="MapType"):
        as_of_join(left, right, ["key"], "lts", "rts", ["m"])
    # an explicit orderable tiebreaker unlocks the same schema
    rows = as_of_join(
        left, right, ["key"], "lts", "rts", ["m"], tiebreaker="rts"
    ).collect()
    assert rows[0].m == {"x": 1}


def test_as_of_join_non_identifier_value_column_names(spark):
    """ADVICE r8: the null-struct type is built programmatically, so
    right value columns whose names are not plain identifiers (space,
    hyphen, colon) survive — the old DDL-string cast broke parsing."""
    left = spark.createDataFrame([("k1", 5)], "key string, lts long")
    right = spark.createDataFrame(
        [("k1", 1, 10, 20)], ["key", "rts", "a b", "c-d:e"]
    )
    rows = as_of_join(
        left, right, ["key"], "lts", "rts", ["a b", "c-d:e"]
    ).collect()
    assert (rows[0]["a b"], rows[0]["c-d:e"]) == (10, 20)


def test_bucketed_range_join_refuses_outer_modes(spark):
    """The exact range predicate is a post-join filter — outer modes
    would silently drop unmatched preserved-side rows, so they are
    refused loudly (review, round 8)."""
    left = spark.createDataFrame([(1.0,)], "p double")
    right = spark.createDataFrame([(0.0, 2.0)], "lo double, hi double")
    with pytest.raises(ValueError, match="inner-only"):
        bucketed_range_join(left, right, "p", "lo", "hi", 1.0, how="left")


def test_bucketed_range_join_rejects_nonpositive_width(spark):
    left = spark.createDataFrame([(1.0,)], "p double")
    right = spark.createDataFrame([(0.0, 2.0)], "lo double, hi double")
    with pytest.raises(ValueError, match="bucket_width"):
        bucketed_range_join(left, right, "p", "lo", "hi", 0.0)


def test_bucketed_range_join_inner_matches_exact_predicate(spark):
    left = spark.createDataFrame(
        [(1, 0.5), (2, 7.5), (3, 99.0)], "id long, p double"
    )
    right = spark.createDataFrame(
        [(0.0, 1.0, "a"), (7.0, 8.0, "b"), (7.4, 7.6, "c")],
        "lo double, hi double, tag string",
    )
    got = sorted(
        (r.id, r.tag)
        for r in bucketed_range_join(left, right, "p", "lo", "hi", 1.0).collect()
    )
    assert got == [(1, "a"), (2, "b"), (2, "c")]
