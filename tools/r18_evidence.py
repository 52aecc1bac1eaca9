"""Round-18 evidence probe — now a thin deprecation shim over
tools/evidence.py (the r18 verdict item 5 consolidation, r19).

``coldspread`` dispositioned the two r17 driver-bench upward cold
movers (pc1_percentiles cold 0.327->0.386 ×1.18, j1_lookup_join cold
0.552->0.637 ×1.15 — both bodies untouched, so any movement is
environmental BY CONSTRUCTION; the probe measured the session-to-
session spread showing the published values against natural cold
variation). The generalized instrument is ``evidence.py spread``
(all three columns, configurable cells); this shim keeps the r18
command line and cell set reproducible:

Run: python tools/r18_evidence.py [coldspread] [n_sessions]
(coldspread ~3 min per session, default 6 sessions.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import evidence  # noqa: E402

REPO = evidence.REPO
MOVERS = ["pc1_percentiles", "j1_lookup_join"]


def _published_cold(rnd: str) -> dict:
    """Published driver cold cells for the r18 mover pair, loudly
    guarded (ADVICE r18 — a missing marker/cell exits with a message
    naming it instead of a bare IndexError)."""
    cells = evidence.published_cells(
        os.path.join(REPO, f"BENCH_{rnd}.json"),
        [("queries_cold", m) for m in MOVERS],
        label=f"BENCH_{rnd}.json",
    )
    return {m: cells[("queries_cold", m)] for m in MOVERS}


def probe_coldspread(n_sessions: int = 6) -> None:
    # the r18 probe compared COLD cells against the published driver
    # values and tracked the movers' WARM cells for context only —
    # the warm cells are front-truncated out of the driver files, so
    # they go in as context_cells (spread-only, no published lookup)
    evidence.probe_spread(
        n_sessions,
        cells=[("queries_cold", m) for m in MOVERS],
        rounds=("r16", "r17"),
        context_cells=[("queries", m) for m in MOVERS],
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
