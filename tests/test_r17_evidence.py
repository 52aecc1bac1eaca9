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


def test_movers_parsed_without_queries_falls_back_to_tail(tmp_path):
    # ADVICE r17: a parsed dict that exists but lacks "queries" must
    # NOT shadow the tail fallback (the old unconditional substitution
    # produced a vacuous 0-cell scan)
    prev = {
        "parsed": {"rc": 0},  # dict, but no cells
        "tail": '{"queries": {"q1_pricing_summary": 1.0}, '
                '"queries_cold": {"q1_pricing_summary": 3.0}, '
                '"queries_forced": {"q1_pricing_summary": 5.0}, "sf": 0.1}',
    }
    cur = {
        "queries": {"q1_pricing_summary": 2.0},
        "queries_cold": {"q1_pricing_summary": 3.0},
        "queries_forced": {"q1_pricing_summary": 5.0},
    }
    out = r17_evidence.movers(
        _write(tmp_path, "cur.json", cur), _write(tmp_path, "prev.json", prev)
    )
    assert [(f["column"], f["query"], f["ratio"]) for f in out] == [
        ("queries", "q1_pricing_summary", 2.0)
    ]


def test_movers_tail_recovers_scientific_notation(tmp_path):
    # ADVICE r17: 8e-05 must read as 8e-05, not "8" — a ~1e5x misread
    # would flag a phantom mover (or mask a real one)
    tail = (
        '{"queries": {"q1_pricing_summary": 8e-05}, '
        '"queries_cold": {"q1_pricing_summary": 1.5E+00}, '
        '"queries_forced": {"q1_pricing_summary": 2.0}, "sf": 0.1}'
    )
    prev = {"parsed": None, "tail": tail}
    cur = {
        "queries": {"q1_pricing_summary": 8e-05},   # identical -> not a mover
        "queries_cold": {"q1_pricing_summary": 1.5},  # identical
        "queries_forced": {"q1_pricing_summary": 3.0},  # +50% -> mover
    }
    out = r17_evidence.movers(
        _write(tmp_path, "cur.json", cur), _write(tmp_path, "prev.json", prev)
    )
    assert [(f["column"], f["query"], f["ratio"]) for f in out] == [
        ("queries_forced", "q1_pricing_summary", 1.5)
    ]


def test_movers_warns_when_truncation_eats_section_marker(tmp_path, capsys):
    # ADVICE r17: a tail cut past the '"queries_cold"' marker must not
    # silently fold the cold cells into the warm column (cross-column
    # ratios) — under front-only truncation the leading cells are COLD
    tail = (
        'jaccard": 4.0, "d1_exact_dedup": 2.0}, '
        '"queries_forced": {"par1_paragraph_dedup": 1.0}, "sf": 0.1}'
    )
    prev = {"parsed": None, "tail": tail}
    cur = {
        # old behavior folded the leading COLD cells into "queries":
        # d1 would then read 4.0/2.0 = a fake x2 warm mover
        "queries": {"d1_exact_dedup": 4.0},
        "queries_cold": {"d1_exact_dedup": 2.0},  # in-column: identical
        "queries_forced": {"par1_paragraph_dedup": 2.0},
    }
    out = r17_evidence.movers(
        _write(tmp_path, "cur.json", cur), _write(tmp_path, "prev.json", prev)
    )
    err = capsys.readouterr().err
    assert "WARNING" in err and "queries_cold" in err
    # the truncated 'jaccard' fragment never regexes to a key (no
    # opening quote survives the cut) and drops out; d1 lands in the
    # COLD column where it is flat, so only the forced mover remains
    assert [(f["column"], f["query"], f["ratio"]) for f in out] == [
        ("queries_forced", "par1_paragraph_dedup", 2.0)
    ]


def test_movers_warns_when_both_markers_eaten(tmp_path, capsys):
    tail = '_dedup": 1.0, "par1_paragraph_dedup": 1.0}, "sf": 0.1}'
    prev = {"parsed": None, "tail": tail}
    cur = {"queries": {}, "queries_forced": {"par1_paragraph_dedup": 2.0}}
    out = r17_evidence.movers(
        _write(tmp_path, "cur.json", cur), _write(tmp_path, "prev.json", prev)
    )
    assert "WARNING" in capsys.readouterr().err
    assert [(f["column"], f["query"], f["ratio"]) for f in out] == [
        ("queries_forced", "par1_paragraph_dedup", 2.0)
    ]


def test_steal_summary_weights_residual_bin_by_duration(tmp_path):
    # ADVICE r17: the residual partial bin must contribute its share of
    # the draw, not a full 10-s vote. Two full bins (1000 jiffies) at
    # 0% steal + a 1-s residual (100 jiffies) at 21% steal -> 1.0%
    # weighted, not (0+0+21)/3 = 7.0% unweighted.
    bins = [(0.0, 80.0, 1000), (0.0, 80.0, 1000), (21.0, 50.0, 100)]
    s = r17_evidence._steal_summary(bins)
    assert s["steal_mean_pct"] == 1.0
    assert s["steal_max_pct"] == 21.0
    assert s["bins_10s"] == 3


def test_benchsteal_survives_large_child_output(tmp_path, capsys):
    # ADVICE r17 pipe-deadlock regression: a child writing far past the
    # ~64 KiB OS pipe buffer must not hang benchsteal. 1 MiB of output
    # through the old stdout=PIPE-without-drain shape deadlocks; the
    # temp-file redirect completes immediately.
    script = tmp_path / "fat_bench.py"
    script.write_text(
        "import sys\n"
        "sys.stdout.write('x' * (1 << 20) + '\\n')\n"
        "sys.stdout.write('{\"metric\": \"fake\"}\\n')\n"
    )
    r17_evidence.benchsteal(script=str(script))
    out = capsys.readouterr().out
    assert out.count("x") >= (1 << 20)
    summary = json.loads(out.rstrip().rsplit("\n", 1)[-1])
    assert set(summary) == {
        "steal_mean_pct", "steal_max_pct", "user_mean_pct", "bins_10s"
    }


def test_steal_summary_max_ignores_quantization_noise_residual():
    # ADVICE r18: a residual of a few jiffies quantizes steal% so
    # coarsely that one stolen tick reads as a spike — the max must
    # skip bins under ~1 s of weight (<10% of the largest bin). The
    # exactly-1-s residual in the test above (100 of 1000 jiffies)
    # still qualifies; this 5-jiffy one must not.
    bins = [(0.0, 80.0, 1000), (2.0, 80.0, 1000), (50.0, 50.0, 5)]
    s = r17_evidence._steal_summary(bins)
    assert s["steal_max_pct"] == 2.0
    assert s["bins_10s"] == 3
