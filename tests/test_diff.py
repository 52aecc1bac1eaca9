"""Snapshot diff (operators/diff.py): four-way classification, NULL
content, multi-column content keys."""

import pytest

from data_transform_make_spark.operators.diff import (
    snapshot_diff,
    snapshot_diff_summary,
)


def test_four_way_classification(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "c2"), (4, "d")], "id long, text string"
    )
    out = {r.id: r.status for r in snapshot_diff(old, new, "id", ["text"]).collect()}
    assert out == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}

    summary = {
        r.status: r.n
        for r in snapshot_diff_summary(old, new, "id", ["text"]).collect()
    }
    assert summary == {"removed": 1, "unchanged": 1, "changed": 1, "added": 1}


def test_null_content_hashes_stably(spark):
    old = spark.createDataFrame([(1, None), (2, None)], "id long, text string")
    new = spark.createDataFrame([(1, None), (2, "x")], "id long, text string")
    out = {r.id: r.status for r in snapshot_diff(old, new, "id", ["text"]).collect()}
    assert out == {1: "unchanged", 2: "changed"}


def test_multi_column_content_and_separator(spark):
    # ("ab", "c") vs ("a", "bc"): naive concat would collide; the unit
    # separator keeps the column boundary in the hash
    old = spark.createDataFrame([(1, "ab", "c")], "id long, a string, b string")
    new = spark.createDataFrame([(1, "a", "bc")], "id long, a string, b string")
    out = {r.id: r.status for r in snapshot_diff(old, new, "id", ["a", "b"]).collect()}
    assert out == {1: "changed"}


def test_empty_content_cols_rejected(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError):
        snapshot_diff(df, df, "id", [])


def test_null_shift_and_null_vs_empty_are_changed(spark):
    """Per-column injective encoding: a value moving between columns, or
    NULL becoming '', must classify as changed (raw concat_ws would
    conflate both)."""
    old = spark.createDataFrame(
        [(1, "x", None), (2, None, None)], "id long, a string, b string"
    )
    new = spark.createDataFrame(
        [(1, None, "x"), (2, "", None)], "id long, a string, b string"
    )
    out = {r.id: r.status for r in snapshot_diff(old, new, "id", ["a", "b"]).collect()}
    assert out == {1: "changed", 2: "changed"}


def test_separator_bytes_in_values_cannot_realign_columns(spark):
    """Fixed-width per-column digests: values containing would-be
    separator/control bytes cannot shift content across column
    boundaries (('a\\x1f\\x01b', 'c') vs ('a', 'b\\x1f\\x01c') is a real
    change)."""
    old = spark.createDataFrame(
        [(1, "a\x1f\x01b", "c")], "id long, x string, y string"
    )
    new = spark.createDataFrame(
        [(1, "a", "b\x1f\x01c")], "id long, x string, y string"
    )
    out = {r.id: r.status for r in snapshot_diff(old, new, "id", ["x", "y"]).collect()}
    assert out == {1: "changed"}


def test_snapshot_diff_matches_set_reference_property(spark):
    """Hypothesis: the four-way classification equals a direct dict-based
    reference over random snapshot pairs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    val = st.one_of(st.none(), st.sampled_from(["", "a", "b", "a\x1fb"]))
    snap = st.dictionaries(st.integers(0, 6), val, max_size=6)

    def ref(old, new):
        out = {}
        for i in set(old) | set(new):
            if i not in old:
                out[i] = "added"
            elif i not in new:
                out[i] = "removed"
            elif old[i] != new[i]:
                out[i] = "changed"
            else:
                out[i] = "unchanged"
        return out

    @settings(max_examples=15, deadline=None)
    @given(snap, snap)
    def check(old, new):
        if not old and not new:
            return
        mk = lambda d: spark.createDataFrame(  # noqa: E731
            list(d.items()) or [(None, None)], "id long, text string"
        ).filter("id IS NOT NULL")
        got = {
            r.id: r.status
            for r in snapshot_diff(mk(old), mk(new), "id", ["text"]).collect()
        }
        assert got == ref(old, new)

    check()


def test_snapshot_diff_array_columns_injective_encoding(spark):
    """Round-9 review: cast("string") renders array<string> without
    element quoting, so ["1, 2"] and ["1", "2"] printed identically —
    one digest, a CHANGED record silently classified unchanged. Nested
    types now encode via to_json (escaped, injective)."""
    from data_transform_make_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, ["1, 2"]), (2, ["a"])], "id long, tags array<string>"
    )
    new = spark.createDataFrame(
        [(1, ["1", "2"]), (2, ["a"])], "id long, tags array<string>"
    )
    got = {r.id: r.status for r in snapshot_diff(old, new, "id", ["tags"]).collect()}
    assert got == {1: "changed", 2: "unchanged"}


def test_snapshot_diff_binary_columns_hash_raw_bytes(spark):
    """Binary content digests its raw bytes (a string cast is lossy on
    non-UTF-8 payloads — two different blobs could mangle to the same
    replacement-charred text)."""
    from data_transform_make_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, bytearray(b"\xff\xfe")), (2, bytearray(b"same"))],
        "id long, blob binary",
    )
    new = spark.createDataFrame(
        [(1, bytearray(b"\xfd\xfc")), (2, bytearray(b"same"))],
        "id long, blob binary",
    )
    got = {r.id: r.status for r in snapshot_diff(old, new, "id", ["blob"]).collect()}
    assert got == {1: "changed", 2: "unchanged"}
