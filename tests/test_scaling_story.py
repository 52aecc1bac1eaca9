"""Plan-shape pins for the round-13 scaling dispositions (SCALE.md).

The r13 layout probe (tools/r13_evidence.py) closed the last ×3+
whole-engine growth cells as scan-layout artifacts, and the ledger's
standing story says the number that would actually indicate a defect in
those cells is a NEW SHUFFLE in their plans (or, for d1, a second one).
These tests make that story mechanical: the map-only cells must stay
exchange-free, and d1 must keep exactly its single fingerprint
exchange — a regression that adds an exchange fails here before it can
masquerade as "the documented layout artifact" in a ratio table.

Counted on the PHYSICAL plan string (executedPlan; initial AQE plan is
fine — exchange count is decided before runtime re-planning, and
counting the formatted AQE string would double-count reused scans, the
EXPLAIN_AUDIT caveat).
"""

from data_transform_make_spark import corpus


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    # count Exchange operators; ReusedExchange references an existing one
    return plan.count("Exchange") - plan.count("ReusedExchange")


def test_ta1_tc1_are_map_only(spark, sf_dir):
    """The projection-ending text ops carry no shuffle: their 10x-data
    cells are per-core-linear map work by design (SCALE.md r13), and
    that claim is only safe while the plans stay exchange-free."""
    for name in ("ta1_text_stats", "tc1_line_cleaning"):
        df = corpus.queries()[name](spark, sf_dir)
        assert _exchanges(df) == 0, (
            f"{name} grew a shuffle — the 'layout artifact, linear "
            "per-core' story in SCALE.md r13 no longer applies; "
            "re-disposition the cell"
        )


def test_d1_has_exactly_the_fingerprint_exchange(spark, sf_dir):
    """d1 = keep_min_by on the md5 fingerprint: ONE exchange, keyed on
    the 128-bit digest, fed by a map-side-combined partial aggregate.
    The r13 A/B rejected adding a _spread exchange (2.7x at sf0.1,
    nothing at sf1.0); this pin also catches the reverse regression —
    an accidental second exchange sneaking in."""
    df = corpus.queries()["d1_exact_dedup"](spark, sf_dir)
    assert _exchanges(df) == 1, (
        "d1's plan no longer has exactly one exchange — the r13 "
        "disposition (SCALE.md) was measured against the single "
        "fingerprint-shuffle shape"
    )
