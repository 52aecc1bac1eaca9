"""Round-19 evidence probes — a thin shim over tools/evidence.py (the
r18 verdict item 5 consolidation landed this round, so the r19
instruments were BORN consolidated: `spread` and `passwind` live in
tools/evidence.py and this file keeps the round's ledger command
lines reproducible).

  spread   — dispositions the SIX r18 driver-bench movers (warm ll3
             ×1.18, cold a1_a2 ×1.21 / a4_a6 ×1.17 / d3 ×1.15 /
             pc1 ×0.83, forced par1 ×1.30 — the first FORCED-column
             mover on record). All six bodies untouched since long
             before r17, so any movement is environmental BY
             CONSTRUCTION; N fresh `bench.py --pass` sessions measure
             the same-code spread the published values are read
             against. Timing probe: run it ALONE.

  passwind — pure-parsing uniform-vs-burst read of the driver's r18
             pass pair (pass-2 34.102 s, the windiest driver pass on
             record): per-query ratio tables, pass_totals, and the
             cold-minus-warm gap deltas. Safe to run any time.

Run: python tools/r19_evidence.py spread [n_sessions]
     python tools/r19_evidence.py passwind BENCH_r18.json BENCH_r17.json
(spread ~3 min per session, default 6 sessions.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import evidence  # noqa: E402

REPO = evidence.REPO
MOVERS = evidence.SPREAD_CELLS
passwind = evidence.passwind
_pass_totals = evidence.pass_totals


def _published(rnd: str) -> dict:
    """Published driver cells for the mover set, loudly guarded."""
    return evidence.published_cells(
        os.path.join(REPO, f"BENCH_{rnd}.json"),
        MOVERS,
        label=f"BENCH_{rnd}.json",
    )


def probe_spread(n_sessions: int = 6) -> None:
    evidence.probe_spread(n_sessions, cells=MOVERS, rounds=("r17", "r18"))


if __name__ == "__main__":
    args = sys.argv[1:]
    cmd = args[0] if args else None
    if cmd == "spread":
        n = int(args[1]) if len(args) > 1 else 6
        if n < 1:
            raise SystemExit(f"n_sessions must be >= 1, got {n}")
        probe_spread(n)
    elif cmd == "passwind":
        if len(args) != 3:
            raise SystemExit(
                "usage: r19_evidence.py passwind <cur.json> <prev.json>"
            )
        passwind(args[1], args[2])
    else:
        raise SystemExit(
            f"unknown subcommand {cmd!r} (expected 'spread' or 'passwind')"
        )
