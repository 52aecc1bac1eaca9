"""Round-19 evidence probes, re-runnable (the r10-r18 evidence-tool
pattern): every disposition the round records in SCALE.md is backed by a
probe the judge can re-execute.

  spread   — dispositions the SIX r18 driver-bench movers (the r18
             verdict's own scan, confirmed by `tools/r17_evidence.py
             movers BENCH_r18.json BENCH_r17.json` this round: warm ll3
             ×1.18, cold a1_a2 ×1.21 / a4_a6 ×1.17 / d3 ×1.15 /
             pc1 ×0.83, forced par1 ×1.30). All six bodies are
             untouched since long before r17, so any movement is
             environmental BY CONSTRUCTION; the protocol demands the
             measured session-to-session spread showing both published
             values sit inside natural variation. Method (generalizes
             tools/r18_evidence.py coldspread to ALL THREE columns): N
             fresh `bench.py --pass` subprocesses — the exact code path
             that produced the driver's cells — each reporting its
             warm/cold/forced cells for the six movers; the summary
             prints each spread next to the published r17/r18 driver
             values. par1 is the first FORCED-column mover on record
             (the forced column had no spread data before this probe —
             r18 verdict item 2). Timing probe: run it ALONE (the
             standing bench discipline).

  passwind — the uniform-vs-burst read of the driver's r18 pass-2
             (34.102 s, the windiest driver pass on record — r18
             verdict item 4). Recovers every per-cell column of two
             driver BENCH files via the tested tools/r17_evidence.py
             bench_cells recovery, prints the per-query ratio table
             (cur/prev per column) plus each file's pass_totals, and
             the cold-minus-warm per-cell deltas whose distribution
             separates "every cell inflated ~uniformly" from "a few
             cells absorbed multi-second stalls". Pure file parsing —
             safe to run any time.

Run: python tools/r19_evidence.py spread [n_sessions]
     python tools/r19_evidence.py passwind BENCH_r18.json BENCH_r17.json
(spread ~3 min per session, default 6 sessions.)
"""

import json
import os
import re
import statistics
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from r17_evidence import bench_cells  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the six r18 movers: (bench --pass result column, query key)
MOVERS = [
    ("queries", "ll3_training_corpus_capped"),
    ("queries_cold", "a1_a2_order_counter_deltas"),
    ("queries_cold", "a4_a6_status_transitions"),
    ("queries_cold", "d3_minhash_lsh"),
    ("queries_cold", "pc1_percentiles"),
    ("queries_forced", "par1_paragraph_dedup"),
]


def _published(rnd: str) -> dict:
    """Published driver cells for the mover set, loudly guarded."""
    cells = bench_cells(os.path.join(REPO, f"BENCH_{rnd}.json"))
    out = {}
    for key in MOVERS:
        if key not in cells:
            raise SystemExit(
                f"spread: BENCH_{rnd}.json has no recoverable "
                f"{key[0]}/{key[1]} cell — cannot disposition against "
                "a missing published value"
            )
        out[key] = cells[key]
    return out


def probe_spread(n_sessions: int = 6) -> None:
    published = {rnd: _published(rnd) for rnd in ("r17", "r18")}
    obs: dict = {key: [] for key in MOVERS}
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
            raise SystemExit(f"spread: pass {i} failed rc={out.returncode}")
        res = json.loads(lines[-1][len("BENCH_PASS_RESULT:"):])
        for col, q in MOVERS:
            obs[(col, q)].append(res[col][q])
        print(
            f"SPREAD session {i}: "
            + " ".join(f"{q}[{col}]={res[col][q]}" for col, q in MOVERS)
        )
    for key in MOVERS:
        col, q = key
        vals = obs[key]
        lo, hi = min(vals), max(vals)
        r17v, r18v = published["r17"][key], published["r18"][key]
        inside = lo <= r17v <= hi and lo <= r18v <= hi
        # the strict-inside check can miss by luck of the draw on a
        # fat-tailed distribution; the ×-spread is the context
        print(
            f"SPREAD {q} [{col}]: {n_sessions}-session spread "
            f"[{lo}, {hi}] (×{round(hi / lo, 2)} natural variation); "
            f"published driver r17={r17v} r18={r18v} — "
            f"both inside the observed spread: {inside}"
        )


def _pass_totals(path: str) -> list:
    """Recover pass_totals from a BENCH file (parsed, direct, or tail)."""
    d = json.load(open(path))
    for src in (d, d.get("parsed") or {}):
        if isinstance(src, dict) and "pass_totals" in src:
            return src["pass_totals"]
    hit = re.search(r'"pass_totals": \[([0-9., eE+-]+)\]', d.get("tail") or "")
    if not hit:
        raise SystemExit(f"passwind: {path} has no recoverable pass_totals")
    return [float(v) for v in hit.group(1).split(",")]


def passwind(cur_path: str, prev_path: str) -> None:
    cur, prev = bench_cells(cur_path), bench_cells(prev_path)
    print(
        f"pass_totals: prev={_pass_totals(prev_path)} "
        f"cur={_pass_totals(cur_path)}"
    )
    for col in ("queries", "queries_cold", "queries_forced"):
        rows = []
        for (c, q), v in cur.items():
            if c == col and (c, q) in prev and prev[(c, q)] > 0:
                rows.append((q, prev[(c, q)], v, v / prev[(c, q)]))
        if not rows:
            print(f"{col}: no shared recoverable cells")
            continue
        ratios = [r for _, _, _, r in rows]
        up = sum(1 for r in ratios if r > 1.15)
        down = sum(1 for r in ratios if r < 1 / 1.15)
        print(
            f"{col}: {len(rows)} shared cells, median ratio "
            f"×{round(statistics.median(ratios), 2)}, "
            f">15% movers {up} up / {down} down"
        )
        for q, pv, cv, r in sorted(rows, key=lambda t: -abs(t[3] - 1)):
            if abs(r - 1) > 0.15:
                print(f"  {q}: {pv} -> {cv} (×{round(r, 2)})")
    # burst discriminator: per-query cold-minus-warm absolute deltas.
    # A cold cell is the same query's first run in a fresh JVM; under
    # UNIFORM wind cold-warm grows in proportion everywhere, under
    # BURSTS a few cells absorb multi-second stalls while the rest
    # hold their prev-round gap.
    gaps = []
    for (c, q), v in cur.items():
        if c != "queries_cold":
            continue
        w = cur.get(("queries", q))
        pw, pc = prev.get(("queries", q)), prev.get(("queries_cold", q))
        if None in (w, pw, pc):
            continue
        gaps.append((q, round(pc - pw, 3), round(v - w, 3)))
    if gaps:
        grown = [(q, a, b) for q, a, b in gaps if b - a > 0.3]
        print(
            f"cold-minus-warm gaps ({len(gaps)} cells with all four "
            f"values recoverable): {len(grown)} grew >0.3 s vs prev"
        )
        for q, a, b in sorted(gaps, key=lambda t: -(t[2] - t[1])):
            print(f"  {q}: prev gap {a} s -> cur gap {b} s")


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
