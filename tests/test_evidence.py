"""The consolidated evidence tool's own surface (pure python).

tools/evidence.py is the single home of the standing instruments
(calib/movers/benchsteal/spread/passwind — r18 verdict item 5); the
rN_evidence.py files are thin shims over it. The shim-facing parsing
contracts stay pinned where they were written
(tests/test_r17_evidence.py, test_r18_evidence.py,
test_r19_evidence.py — all still green against the shims, which is
the consolidation's acceptance test); THIS file pins only what is new
in the consolidation: the widened parsed-payload adoption, the shared
published-cells guard, the CLI dispatch, and that the shims really
are re-exports of the same objects.
"""

import json
import os
import subprocess
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import evidence  # noqa: E402
import r17_evidence  # noqa: E402
import r18_evidence  # noqa: E402
import r19_evidence  # noqa: E402


def test_shims_reexport_the_same_objects():
    assert r17_evidence.movers is evidence.movers
    assert r17_evidence.benchsteal is evidence.benchsteal
    assert r17_evidence._steal_summary is evidence._steal_summary
    assert r17_evidence.bench_cells is evidence.bench_cells
    assert r19_evidence.passwind is evidence.passwind
    assert r19_evidence.MOVERS is evidence.SPREAD_CELLS
    assert r18_evidence.REPO == evidence.REPO == r19_evidence.REPO


def test_bench_cells_adopts_cold_only_parsed_payload(tmp_path):
    # the r18 coldspread shape: a driver file whose parsed payload
    # carries ONLY the cold column must be adopted (the pre-r19
    # bench_cells required "queries" and would have fallen through to
    # an empty tail); a parsed dict with NO cell column still must
    # not shadow the tail (the ADVICE-r17 guard, pinned in
    # tests/test_r17_evidence.py against the shim)
    p = tmp_path / "b.json"
    p.write_text(json.dumps(
        {"parsed": {"queries_cold": {"pc1_percentiles": 0.3}}, "tail": ""}
    ))
    assert evidence.bench_cells(str(p)) == {
        ("queries_cold", "pc1_percentiles"): 0.3
    }


def test_published_cells_names_missing_cell_and_label(tmp_path):
    p = tmp_path / "b.json"
    p.write_text(json.dumps({"queries": {"q1_pricing_summary": 1.0}}))
    try:
        evidence.published_cells(
            str(p), [("queries_forced", "par1_paragraph_dedup")],
            label="BENCH_rQ.json",
        )
    except SystemExit as e:
        msg = str(e)
        assert "queries_forced" in msg
        assert "par1_paragraph_dedup" in msg
        assert "BENCH_rQ.json" in msg
    else:
        raise AssertionError("expected SystemExit on missing cell")


def test_cli_rejects_unknown_subcommand_and_bad_args():
    tool = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "evidence.py",
    )
    r = subprocess.run([sys.executable, tool, "benchstea"],
                       capture_output=True, text=True)
    assert r.returncode != 0 and "unknown subcommand" in r.stderr
    r = subprocess.run([sys.executable, tool, "spread", "0"],
                       capture_output=True, text=True)
    assert r.returncode != 0 and "n_sessions" in r.stderr
    r = subprocess.run([sys.executable, tool, "movers", "one-arg-only"],
                       capture_output=True, text=True)
    assert r.returncode != 0 and "usage" in r.stderr


def test_bench_cells_vacuous_payload_falls_back_to_tail(tmp_path, capsys):
    # ADVICE r19: a hybrid file with vacuous top-level column keys
    # (present but zero numeric cells) plus cells in the tail must not
    # read as a silent 0-cell scan — fall through to tail recovery
    # with a warning
    p = tmp_path / "b.json"
    p.write_text(json.dumps({
        "queries": {}, "queries_cold": None,
        "tail": '"a_b": 1.0, "queries_cold" "a_b": 2.5, '
                '"queries_forced" "a_b": 3.0',
    }))
    got = evidence.bench_cells(str(p))
    assert got == {
        ("queries", "a_b"): 1.0,
        ("queries_cold", "a_b"): 2.5,
        ("queries_forced", "a_b"): 3.0,
    }
    assert "falling back to" in capsys.readouterr().err
    # a direct payload WITH cells still short-circuits (no warning)
    p.write_text(json.dumps({
        "queries": {"a_b": 0.7}, "tail": '"queries_cold" "a_b": 9.9',
    }))
    assert evidence.bench_cells(str(p)) == {("queries", "a_b"): 0.7}
    assert capsys.readouterr().err == ""


def test_spread_missing_session_cell_exits_loudly(monkeypatch, capsys):
    # ADVICE r19: a pass payload missing a configured cell must exit
    # naming the session/column/query, not die with a bare KeyError
    fake = json.dumps({"queries": {"other_q": 1.0}})

    class _Done:
        returncode = 0
        stdout = "BENCH_PASS_RESULT:" + fake + "\n"
        stderr = ""

    monkeypatch.setattr(evidence.subprocess, "run",
                        lambda *a, **k: _Done())
    try:
        evidence.probe_spread(
            1, cells=[("queries", "ll3_training_corpus_capped")],
            rounds=("r18",),
        )
    except SystemExit as e:
        msg = str(e)
        assert "session 0" in msg
        assert "queries/ll3_training_corpus_capped" in msg
    else:
        raise AssertionError("expected SystemExit on missing cell")
    # the configuration line printed before the sessions started
    assert "SPREAD config: 1 session(s), published rounds r18" in \
        capsys.readouterr().out


def test_spread_cli_args(tmp_path):
    # ADVICE r19: cells/rounds reachable from the CLI, bad specs loud
    tool = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "evidence.py",
    )
    r = subprocess.run(
        [sys.executable, tool, "spread", "1", "--cells=nope:q1_x"],
        capture_output=True, text=True)
    assert r.returncode != 0 and "bad --cells entry" in r.stderr
    r = subprocess.run(
        [sys.executable, tool, "spread", "--cells=queries:"],
        capture_output=True, text=True)
    assert r.returncode != 0 and "bad --cells entry" in r.stderr
    r = subprocess.run([sys.executable, tool, "spread", "--rounds="],
                       capture_output=True, text=True)
    assert r.returncode != 0 and "at least one round" in r.stderr
    r = subprocess.run([sys.executable, tool, "spread", "sixish"],
                       capture_output=True, text=True)
    assert r.returncode != 0 and "unrecognized argument" in r.stderr
    # a good --cells/--rounds pair reaches probe_spread and fails
    # only at the published-cell lookup for the nonexistent round
    # (proving the args parsed and were threaded through)
    r = subprocess.run(
        [sys.executable, tool, "spread", "1",
         "--cells=queries:q1_pricing_summary", "--rounds=r999"],
        capture_output=True, text=True)
    assert r.returncode != 0
    assert "BENCH_r999.json" in r.stderr or "r999" in r.stderr


def test_r17_shim_movers_arity_guard():
    # ADVICE r19: the shim must print usage on missing paths, same as
    # the consolidated CLI, instead of a bare IndexError
    tool = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "r17_evidence.py",
    )
    r = subprocess.run([sys.executable, tool, "movers"],
                       capture_output=True, text=True)
    assert r.returncode != 0
    assert "usage" in r.stderr and "IndexError" not in r.stderr


def test_coldspread_shim_survives_truncated_warm_cells(monkeypatch, capsys):
    # regression (r19 self-review): the r18 coldspread compared COLD
    # cells to published driver values and tracked WARM cells as
    # session-only context — but warm cells are front-truncated out
    # of the real BENCH_r16/r17 files, so a consolidation that
    # demanded published values for every tracked cell turned the
    # historical command line into a hard SystemExit. Fake the bench
    # session; the published lookups run against the REAL driver
    # files in the repo.
    fake = json.dumps({
        "queries": {"pc1_percentiles": 0.2, "j1_lookup_join": 0.5},
        "queries_cold": {"pc1_percentiles": 0.33, "j1_lookup_join": 0.6},
        "queries_forced": {},
    })

    class _Done:
        returncode = 0
        stdout = "BENCH_PASS_RESULT:" + fake + "\n"
        stderr = ""

    monkeypatch.setattr(evidence.subprocess, "run",
                        lambda *a, **k: _Done())
    r18_evidence.probe_coldspread(1)
    out = capsys.readouterr().out
    # cold cells: compared against the published r16/r17 values
    assert "pc1_percentiles [queries_cold]" in out
    assert "r16=0.327 r17=0.386" in out
    # warm cells: reported spread-only, no published comparison
    assert "pc1_percentiles [queries]" in out
    assert "context cell — spread only" in out
