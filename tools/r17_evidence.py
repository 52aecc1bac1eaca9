"""Round-17 evidence probes — now a thin deprecation shim over
tools/evidence.py (the r18 verdict item 5 consolidation, r19): the
calib / movers / benchsteal instruments became the standing per-round
protocol, so their single implementation lives in tools/evidence.py.
This file re-exports them and keeps the historical CLI so every
SCALE.md command line from r17+ still reproduces:

       ``python tools/r17_evidence.py calib``
       ``python tools/r17_evidence.py movers BENCH_SELF.json BENCH_r16.json``
       ``python tools/r17_evidence.py benchsteal``

See tools/evidence.py for the full instrument documentation (what
each calib cell measures, the tail-recovery model, the integrated-
steal band-read gate).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from evidence import (  # noqa: F401,E402
    _CELL_RE,
    _pyloop,
    _proc32,
    _procstat,
    _sha,
    _sha1t,
    _sha8t,
    _steal_summary,
    bench_cells,
    benchsteal,
    calib,
    movers,
)

if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "calib"
    if cmd == "calib":
        print(json.dumps({"calibration": calib()}))
    elif cmd == "movers":
        if len(sys.argv) != 4:
            # same loud usage guard as the consolidated evidence.py
            # CLI — a missing path must not die with a bare
            # IndexError (ADVICE r19); historical command lines
            # always pass both paths and are unaffected
            raise SystemExit(
                "usage: r17_evidence.py movers <cur.json> <prev.json>"
            )
        out = movers(sys.argv[2], sys.argv[3])
        print(json.dumps(out, indent=1))
        print(f"{len(out)} mover(s) >15%")
    elif cmd == "benchsteal":
        benchsteal()
    else:
        raise SystemExit(f"unknown subcommand {cmd!r}")
