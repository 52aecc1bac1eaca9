"""The r19 spread/passwind probes' parsing contracts (pure python).

tools/r19_evidence.py `spread` dispositions the six r18 driver-bench
movers against fresh-session spreads, and `passwind` is the
uniform-vs-burst read of the driver's r18 pass pair — both lean on
recovering PUBLISHED cells from driver BENCH files, so a misread
silently corrupts the disposition (the hazard class the r17/r18
evidence-tool tests pin). These tests pin the recovery guards and the
passwind arithmetic on synthetic files of both driver shapes.
"""

import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import r19_evidence  # noqa: E402


def _with_repo(tmp_path, monkeypatch, files):
    for name, obj in files.items():
        (tmp_path / name).write_text(json.dumps(obj))
    monkeypatch.setattr(r19_evidence, "REPO", str(tmp_path))


def _full_payload(scale=1.0):
    return {
        "queries": {"ll3_training_corpus_capped": 2.8 * scale,
                    "a1_a2_order_counter_deltas": 1.0 * scale},
        "queries_cold": {"a1_a2_order_counter_deltas": 1.8 * scale,
                         "a4_a6_status_transitions": 0.8 * scale,
                         "d3_minhash_lsh": 2.3 * scale,
                         "pc1_percentiles": 0.4 * scale},
        "queries_forced": {"par1_paragraph_dedup": 0.6 * scale},
        "pass_totals": [27.0 * scale, 34.0 * scale],
    }


def test_published_reads_every_mover_column(tmp_path, monkeypatch):
    _with_repo(tmp_path, monkeypatch,
               {"BENCH_rX.json": {"parsed": _full_payload()}})
    got = r19_evidence._published("rX")
    assert got[("queries", "ll3_training_corpus_capped")] == 2.8
    assert got[("queries_forced", "par1_paragraph_dedup")] == 0.6
    assert len(got) == len(r19_evidence.MOVERS)


def test_published_exits_loudly_on_missing_cell(tmp_path, monkeypatch):
    payload = _full_payload()
    del payload["queries_forced"]["par1_paragraph_dedup"]
    _with_repo(tmp_path, monkeypatch,
               {"BENCH_rY.json": {"parsed": payload}})
    try:
        r19_evidence._published("rY")
    except SystemExit as e:
        assert "par1_paragraph_dedup" in str(e) and "rY" in str(e)
    else:
        raise AssertionError("expected SystemExit on missing cell")


def test_pass_totals_recovers_from_truncated_tail(tmp_path):
    p = tmp_path / "bench.json"
    p.write_text(json.dumps({
        "parsed": None,
        "tail": '_dedup": 0.8}, "pass_totals": [27.245, 34.102], "sf": 0.1}',
    }))
    assert r19_evidence._pass_totals(str(p)) == [27.245, 34.102]


def test_pass_totals_exits_loudly_when_truncated_away(tmp_path):
    p = tmp_path / "bench.json"
    p.write_text(json.dumps({"parsed": None, "tail": '"sf": 0.1}'}))
    try:
        r19_evidence._pass_totals(str(p))
    except SystemExit as e:
        assert "pass_totals" in str(e)
    else:
        raise AssertionError("expected SystemExit on missing pass_totals")


def test_passwind_flags_movers_and_gap_growth(tmp_path, capsys):
    prev = tmp_path / "prev.json"
    cur = tmp_path / "cur.json"
    prev.write_text(json.dumps(_full_payload()))
    payload = _full_payload()
    # one genuine mover (+30%) and a grown cold-warm gap on a1_a2
    payload["queries_cold"]["a1_a2_order_counter_deltas"] = 2.34
    cur.write_text(json.dumps(payload))
    r19_evidence.passwind(str(cur), str(prev))
    out = capsys.readouterr().out
    assert "pass_totals" in out
    assert "a1_a2_order_counter_deltas: 1.8 -> 2.34 (×1.3)" in out
    # gap arithmetic: prev 1.8-1.0=0.8, cur 2.34-1.0=1.34 -> grew >0.3
    assert "prev gap 0.8 s -> cur gap 1.34 s" in out
    assert "1 grew >0.3 s" in out


def test_main_rejects_unknown_subcommand_and_zero_sessions():
    import subprocess
    tool = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "r19_evidence.py",
    )
    r = subprocess.run([sys.executable, tool, "spred"],
                       capture_output=True, text=True)
    assert r.returncode != 0 and "unknown subcommand" in r.stderr
    r = subprocess.run([sys.executable, tool, "spread", "0"],
                       capture_output=True, text=True)
    assert r.returncode != 0 and "n_sessions" in r.stderr
