"""The r18 coldspread probe's driver-file parsing contract (pure python).

tools/r18_evidence.py `coldspread` dispositions driver-bench cold movers
by comparing fresh-session spreads against the PUBLISHED driver values —
so misreading the published values silently corrupts the disposition
(the same hazard class the r17 movers-scan tests pin). These tests pin
`_published_cold` against both driver-file shapes: a parsed payload and
a front-truncated tail, including scientific-notation cells.
"""

import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import r18_evidence  # noqa: E402


def _with_repo(tmp_path, monkeypatch, name, obj):
    (tmp_path / name).write_text(json.dumps(obj))
    monkeypatch.setattr(r18_evidence, "REPO", str(tmp_path))


def test_published_cold_reads_parsed_payload(tmp_path, monkeypatch):
    _with_repo(
        tmp_path, monkeypatch, "BENCH_rX.json",
        {"parsed": {"queries_cold": {"pc1_percentiles": 0.327,
                                     "j1_lookup_join": 0.552,
                                     "other_cell": 9.9}}},
    )
    assert r18_evidence._published_cold("rX") == {
        "pc1_percentiles": 0.327, "j1_lookup_join": 0.552
    }


def test_published_cold_recovers_truncated_tail(tmp_path, monkeypatch):
    # driver shape: parsed null, cold cells inside a front-truncated
    # tail; a same-named warm cell BEFORE the cold marker and a forced
    # section AFTER it must both be ignored
    tail = (
        'summary": 1.0, "pc1_percentiles": 0.111, "j1_lookup_join": 0.222}, '
        '"queries_cold": {"pc1_percentiles": 0.386, "j1_lookup_join": 6.37e-01}, '
        '"queries_forced": {"pc1_percentiles": 9.9}, "sf": 0.1}'
    )
    _with_repo(tmp_path, monkeypatch, "BENCH_rY.json", {"parsed": None, "tail": tail})
    got = r18_evidence._published_cold("rY")
    # exponent-aware: 6.37e-01 reads as 0.637, not 6.37 (the pre-r18
    # regex class read the mantissa only — a x10 misread here)
    assert got == {"pc1_percentiles": 0.386, "j1_lookup_join": 0.637}


def test_published_cold_exits_loudly_on_missing_marker(tmp_path, monkeypatch):
    # ADVICE r18: truncation past the cold marker must name the marker,
    # not die with a bare IndexError deep in the split
    _with_repo(tmp_path, monkeypatch, "BENCH_rZ.json",
               {"parsed": None, "tail": '"queries_forced": {}, "sf": 0.1}'})
    try:
        r18_evidence._published_cold("rZ")
    except SystemExit as e:
        assert "queries_cold" in str(e) and "rZ" in str(e)
    else:
        raise AssertionError("expected SystemExit on missing marker")


def test_published_cold_exits_loudly_on_missing_cell(tmp_path, monkeypatch):
    tail = ('"queries_cold": {"pc1_percentiles": 0.386}, '
            '"queries_forced": {}, "sf": 0.1}')
    _with_repo(tmp_path, monkeypatch, "BENCH_rW.json",
               {"parsed": None, "tail": tail})
    try:
        r18_evidence._published_cold("rW")
    except SystemExit as e:
        assert "j1_lookup_join" in str(e)
    else:
        raise AssertionError("expected SystemExit on missing cell")


def test_main_rejects_unknown_subcommand_and_zero_sessions():
    # ADVICE r18: a typo ('benchstea') must exit immediately, never
    # silently launch the ~20-minute multi-session probe; n_sessions=0
    # must be rejected up front, not crash later on min() of []
    import subprocess
    tool = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "r18_evidence.py",
    )
    r = subprocess.run([sys.executable, tool, "benchstea"],
                       capture_output=True, text=True)
    assert r.returncode != 0 and "unknown subcommand" in r.stderr
    r = subprocess.run([sys.executable, tool, "coldspread", "0"],
                       capture_output=True, text=True)
    assert r.returncode != 0 and "n_sessions" in r.stderr
