"""Driver certification-window invariants (corpus._DRIVER_WINDOW).

The external driver oracle-checks the FIRST 50 keys of queries() in dict
order; the window list controls that order explicitly (rotated per round so
every registered query accumulates a driver CORRECTNESS row). These checks
keep the list honest: exactly 50 names, every name resolves to a registered
query, no duplicates, rotation loses no query, and the core anchors stay
in-window every round.
"""

from data_transform_make_spark import corpus

CORE_ANCHORS = {
    "p1_status_gate",
    "p4_first_wins_dedup",
    "i1_ingest_dead_letter",
    "j1_lookup_join",
    "a1_a2_order_counter_deltas",
    "q1_pricing_summary",
    "st1_stream_window_agg",
}


def test_window_is_exactly_50_registered_keys():
    win = corpus._DRIVER_WINDOW
    assert len(win) == 50
    assert len(set(win)) == 50
    missing = [k for k in win if k not in corpus._QUERIES]
    assert not missing, f"window names not registered: {missing}"


def test_queries_dict_leads_with_window():
    keys = list(corpus.queries().keys())
    assert keys[:50] == list(corpus._DRIVER_WINDOW)


def test_rotation_preserves_every_registered_query():
    assert set(corpus.queries().keys()) == set(corpus._QUERIES.keys())
    assert set(corpus.oracle_sql().keys()) == set(corpus._ORACLES.keys())


def test_core_anchors_in_window():
    assert CORE_ANCHORS <= set(corpus._DRIVER_WINDOW)


def test_every_oracle_key_has_a_query():
    assert set(corpus._ORACLES) <= set(corpus._QUERIES)
