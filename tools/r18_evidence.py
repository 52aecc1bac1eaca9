"""Round-18 evidence probes, re-runnable (the r10-r17 evidence-tool
pattern): every disposition the round records in SCALE.md is backed by a
probe the judge can re-execute.

  coldspread — dispositions the two r17 DRIVER-bench upward cold movers
               (BENCH_r17.json vs BENCH_r16.json, confirmed by the fixed
               `tools/r17_evidence.py movers` scan this round:
               pc1_percentiles cold 0.327->0.386 ×1.18, j1_lookup_join
               cold 0.552->0.637 ×1.15; both warm cells flat, both
               bodies untouched since long before r16 — r17 verdict
               item 2). Bodies being identical across the rounds, any
               movement is environmental BY CONSTRUCTION; what the
               protocol demands is the measured session-to-session
               spread showing the two published values sit inside
               natural cold variation. Method: N fresh `bench.py --pass`
               subprocesses — the EXACT code path and in-session context
               (full headline sequence, same warmup) that produced the
               driver file's cold column — each reporting its
               queries_cold cells for the movers; the summary prints
               each spread next to the published r16/r17 driver values.
               Timing probe: run it ALONE (the standing bench
               discipline).

Run: python tools/r18_evidence.py [coldspread] [n_sessions]
(coldspread ~3 min per session, default 6 sessions).
"""

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MOVERS = ["pc1_percentiles", "j1_lookup_join"]

# exponent-aware cell value (same contract as tools/r17_evidence.py
# _CELL_RE — a cold cell serialized as 8e-05 must not read as "8")
_VAL = r"([0-9.]+(?:[eE][+-]?[0-9]+)?)"


def _published_cold(rnd: str) -> dict:
    with open(os.path.join(REPO, f"BENCH_{rnd}.json")) as f:
        bench = json.load(f)
    parsed = bench.get("parsed")
    if isinstance(parsed, dict) and "queries_cold" in parsed:
        return {m: parsed["queries_cold"][m] for m in MOVERS}
    # driver-format file: parsed null, cells in the front-truncated
    # tail after the '"queries_cold"' marker. Guard every recovery
    # step with a loud, named failure: a missing marker or cell means
    # the truncation ate the published values this probe dispositions
    # against, and a bare IndexError would hide WHICH (ADVICE r18).
    tail = bench.get("tail") or ""
    if '"queries_cold"' not in tail:
        raise SystemExit(
            f"coldspread: BENCH_{rnd}.json tail lacks the "
            '"queries_cold" marker (front-truncation ate the cold '
            "section) — published cold cells unrecoverable"
        )
    cold_part = tail.split('"queries_cold"', 1)[1]
    cold_part = cold_part.split('"queries_forced"', 1)[0]
    out = {}
    for m in MOVERS:
        hit = re.search(rf'"{m}": {_VAL}', cold_part)
        if hit is None:
            raise SystemExit(
                f"coldspread: BENCH_{rnd}.json cold section has no "
                f'"{m}" cell — cannot disposition against a missing '
                "published value"
            )
        out[m] = float(hit.group(1))
    return out


def probe_coldspread(n_sessions: int = 6) -> None:
    published = {rnd: _published_cold(rnd) for rnd in ("r16", "r17")}
    cold: dict = {m: [] for m in MOVERS}
    warm: dict = {m: [] for m in MOVERS}
    for i in range(n_sessions):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--pass"],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        lines = [
            l
            for l in out.stdout.splitlines()
            if l.startswith("BENCH_PASS_RESULT:")
        ]
        if out.returncode != 0 or not lines:
            sys.stderr.write(out.stderr[-2000:])
            raise SystemExit(f"coldspread: pass {i} failed rc={out.returncode}")
        res = json.loads(lines[-1][len("BENCH_PASS_RESULT:"):])
        for m in MOVERS:
            cold[m].append(res["queries_cold"][m])
            warm[m].append(res["queries"][m])
        print(
            f"COLDSPREAD session {i}: "
            + " ".join(
                f"{m} cold={res['queries_cold'][m]} warm={res['queries'][m]}"
                for m in MOVERS
            )
        )
    for m in MOVERS:
        lo, hi = min(cold[m]), max(cold[m])
        r16, r17 = published["r16"][m], published["r17"][m]
        inside = lo <= r16 <= hi and lo <= r17 <= hi
        # the strict-inside check can miss by luck of the draw on a
        # fat-tailed cold distribution; the ×-spread is the context
        print(
            f"COLDSPREAD {m}: {n_sessions}-session cold spread "
            f"[{lo}, {hi}] (×{round(hi / lo, 2)} natural variation), "
            f"warm spread [{min(warm[m])}, {max(warm[m])}]; "
            f"published driver cold r16={r16} r17={r17} — "
            f"both inside the observed spread: {inside}"
        )


if __name__ == "__main__":
    # validate the subcommand word — a typo must not silently launch
    # the ~20-minute multi-session probe (ADVICE r18; mirrors the
    # r17_evidence.py unknown-subcommand rejection)
    args = sys.argv[1:]
    words = [a for a in args if not a.isdigit()]
    if words and words != ["coldspread"]:
        raise SystemExit(
            f"unknown subcommand {words[0]!r} (expected 'coldspread')"
        )
    n = next((int(a) for a in args if a.isdigit()), 6)
    if n < 1:
        raise SystemExit(f"n_sessions must be >= 1, got {n}")
    probe_coldspread(n)
