"""The r17 mover-scan tool's parsing contract (pure-python, no Spark).

tools/r17_evidence.py `movers` is the instrument the r18+ bench
protocol leans on: every >15 % cell of the driver's BENCH_r{N}.json
(warm/cold/forced) vs the prior round needs a disposition, and the
driver's files usually carry `parsed: null` with the cells embedded in
a front-truncated `tail` string. A silent parse regression would make
the scan vacuous (0 movers because 0 cells read) — exactly the failure
this file pins.
"""

import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import r17_evidence  # noqa: E402


def _write(tmp_path, name, obj):
    p = tmp_path / name
    p.write_text(json.dumps(obj))
    return str(p)


def test_movers_flags_only_above_threshold(tmp_path):
    prev = {
        "queries": {"q1_pricing_summary": 1.0, "d1_exact_dedup": 2.0},
        "queries_cold": {"q1_pricing_summary": 3.0},
    }
    cur = {
        "queries": {"q1_pricing_summary": 1.10, "d1_exact_dedup": 2.5},
        "queries_cold": {"q1_pricing_summary": 2.4},
    }
    out = r17_evidence.movers(
        _write(tmp_path, "cur.json", cur), _write(tmp_path, "prev.json", prev)
    )
    flagged = {(f["column"], f["query"]): f["ratio"] for f in out}
    # 1.10/1.0 = +10% -> not flagged; 2.5/2.0 = +25% and 2.4/3.0 = -20% -> flagged
    assert ("queries", "q1_pricing_summary") not in flagged
    assert flagged[("queries", "d1_exact_dedup")] == 1.25
    assert flagged[("queries_cold", "q1_pricing_summary")] == 0.8


def test_movers_recovers_driver_format_tail(tmp_path):
    # the driver file shape: parsed null, cells in a FRONT-TRUNCATED
    # tail ("value" and the cut-off first key must not become cells;
    # "sf" after the forced section must be skipped too)
    tail = (
        'dedup": 0.288, "d2_ngram_jaccard": 2.0}, '
        '"queries_cold": {"d2_ngram_jaccard": 4.0}, '
        '"queries_forced": {"par1_paragraph_dedup": 1.0}, "sf": 0.1}'
    )
    prev = {"n": 16, "rc": 0, "tail": tail, "parsed": None}
    cur = {
        "queries": {"dedup": 9.9, "d2_ngram_jaccard": 2.5, "value": 9.9},
        "queries_cold": {"d2_ngram_jaccard": 4.0, "sf": 9.9},
        "queries_forced": {"par1_paragraph_dedup": 0.5},
    }
    out = r17_evidence.movers(
        _write(tmp_path, "cur.json", cur), _write(tmp_path, "prev.json", prev)
    )
    keys = {(f["column"], f["query"]) for f in out}
    assert keys == {
        ("queries", "d2_ngram_jaccard"),          # 2.5/2.0 = +25%
        ("queries_forced", "par1_paragraph_dedup")  # 0.5/1.0 = -50%
    }
    # the truncated "dedup" fragment never pairs with a real key
    assert ("queries", "dedup") not in keys


def test_movers_uses_parsed_payload_when_present(tmp_path):
    prev = {"parsed": {"queries": {"q1_pricing_summary": 1.0}}, "tail": ""}
    cur = {"queries": {"q1_pricing_summary": 2.0}}
    out = r17_evidence.movers(
        _write(tmp_path, "cur.json", cur), _write(tmp_path, "prev.json", prev)
    )
    assert [(f["column"], f["query"], f["ratio"]) for f in out] == [
        ("queries", "q1_pricing_summary", 2.0)
    ]
