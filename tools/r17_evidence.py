"""Round-17 evidence probes (re-runnable).

Subcommands:

``calib`` — the fixed-work CPU calibration loop the r16 verdict
    (Next round, item 3) requires before any further "slow box day"
    classification: four deterministic, data-independent workloads
    whose wall time depends ONLY on how fast this box is right now,
    never on the repo's code or fixtures. Published numbers are
    min-of-3; ``proc32`` is the cell a shared-VM noisy neighbor
    inflates first (it is the only one that asks for every advertised
    core at once, like the bench's local[32]).

    * ``pyloop``  — single-thread pure-Python arithmetic loop
      (3e7 iterations of integer multiply-accumulate).
    * ``sha1t``   — sha256 over 2 GiB of fixed bytes, one thread.
    * ``sha8t``   — 8 GiB of the same bytes split across 8 threads
      (1 GiB each; sized so every cell is well over 0.5 s — this box
      hashes ~1.4 GB/s/core with hardware sha, so smaller work items
      read in the scheduling-noise regime).
    * ``proc32``  — 16 GiB across 32 PROCESSES (512 MiB each), with
      /proc/stat sampled across the run: the bench runs local[32], so
      contention that only bites at full fan-out (hypervisor steal, a
      noisy neighbor eating cores the 8-thread cell never asks for)
      shows here and nowhere else. Reports wall seconds, steal%, and
      effective busy cores. Processes, not threads: a 32-THREAD sha
      probe saturates at ~8× single-thread regardless of box state —
      each 1 MiB update's GIL-held bookkeeping caps parallel scaling
      (measured this round: 32 threads = 7.6 busy cores, 73% idle) —
      so a threaded cell measures the GIL, not the machine.

    Record the JSON next to the round's bench numbers in SCALE.md; a
    later round re-runs this and compares RATIOS — bench moved ×1.1
    with calibration flat means the engine moved; both moved together
    means the box did.

``movers`` — per-cell mover scan of a bench JSON line (stdin or file
    argument) against the driver's previous-round file, applying the
    r16 protocol scope (warm/cold/forced columns, >15 % threshold).

``benchsteal`` — run ``python bench.py`` with /proc/stat sampled in
    10-s bins for the WHOLE draw and print the bench line plus an
    integrated-contention line (mean/max steal %, mean user %). The
    r17 lesson that makes this the required pairing: a calibration
    bracket samples two instants while a bench draw integrates ~9
    minutes of a bursty box — draw 4 read its worst total between two
    calm brackets. Only steal integrated OVER the draw may be read as
    "the box was flat during this measurement".

Usage: ``python tools/r17_evidence.py calib``
       ``python tools/r17_evidence.py movers BENCH_SELF.json BENCH_r16.json``
       ``python tools/r17_evidence.py benchsteal``
"""

import hashlib
import json
import sys
import threading
import time


def _pyloop() -> float:
    t0 = time.perf_counter()
    acc = 0
    for i in range(30_000_000):
        acc += i * i
    assert acc == 8999999550000005000000
    return time.perf_counter() - t0


_CHUNK = b"\xa5" * (1 << 20)  # 1 MiB of fixed bytes


def _sha(n_mib: int) -> None:
    h = hashlib.sha256()
    for _ in range(n_mib):
        h.update(_CHUNK)


def _sha1t() -> float:
    t0 = time.perf_counter()
    _sha(2048)
    return time.perf_counter() - t0


def _sha8t() -> float:
    t0 = time.perf_counter()
    ts = [threading.Thread(target=_sha, args=(1024,)) for _ in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return time.perf_counter() - t0


def _procstat() -> list:
    return list(map(int, open("/proc/stat").readline().split()[1:]))


_PROC32_CODE = (
    "import hashlib;c=b'\\xa5'*(1<<20);h=hashlib.sha256();"
    "[h.update(c) for _ in range(512)]"
)


def _proc32() -> dict:
    import subprocess

    s0, t0 = _procstat(), time.perf_counter()
    ps = [
        subprocess.Popen([sys.executable, "-c", _PROC32_CODE])
        for _ in range(32)
    ]
    for p in ps:
        p.wait()
    wall = time.perf_counter() - t0
    d = [b - a for a, b in zip(s0, _procstat())]
    tot = sum(d) or 1
    return {
        "wall": round(wall, 3),
        "steal_pct": round(100 * d[7] / tot, 1),
        "busy_cores": round(d[0] / 100 / wall, 1),
    }


def calib() -> dict:
    out = {}
    for name, fn in (("pyloop", _pyloop), ("sha1t", _sha1t), ("sha8t", _sha8t)):
        out[name] = round(min(fn() for _ in range(3)), 3)
    runs = [_proc32() for _ in range(3)]
    best = min(runs, key=lambda r: r["wall"])
    best["steal_pct_max"] = max(r["steal_pct"] for r in runs)
    out["proc32"] = best
    return out


# Value pattern for tail recovery: exponents included — a cell
# serialized as 8e-05 must read as 8e-05, not as "8" (a ~1e5×
# misread that would feed a false mover into the disposition
# protocol; ADVICE r17).
_CELL_RE = r'"([a-z0-9_]+)": ([0-9.]+(?:[eE][+-]?[0-9]+)?)'


def bench_cells(path: str) -> dict:
    """Recover every (column, query) -> seconds cell from a BENCH file.

    Handles all three shapes the protocol meets: a direct bench.py
    payload, a driver file whose `parsed` dict carries the cells, and
    the usual driver shape (`parsed: null`, cells embedded in a
    front-truncated `tail` string). Module-level so the per-round
    probes (tools/r19_evidence.py spread/passwind) reuse the exact
    recovery the movers scan is tested on, not a reimplementation.
    """
    d = json.load(open(path))
    parsed = d.get("parsed")
    if "queries" not in d and isinstance(parsed, dict) and "queries" in parsed:
        # adopt the parsed payload only when it actually carries
        # cells; a parsed dict WITHOUT "queries" must not shadow
        # the tail fallback below (ADVICE r17 — the old
        # unconditional substitution yielded a vacuous 0-cell scan)
        d = parsed
    out = {}
    if "queries" in d:
        for col in ("queries", "queries_cold", "queries_forced"):
            for k, v in (d.get(col) or {}).items():
                if isinstance(v, (int, float)):
                    out[(col, k)] = float(v)
        return out
    # driver-format file: parsed is null, cells live in the (often
    # front-truncated) "tail" output string — recover by section
    # split + regex, like tools/r16_evidence.py. A key cut off by
    # the truncation regexes to a wrong name and drops out of the
    # comparison intersection naturally.
    import re

    tail = d.get("tail") or ""
    if not tail:
        return out
    # Sections are emitted warm -> cold -> forced and the driver
    # only ever truncates the tail from the FRONT. A missing
    # marker therefore means the cut reached past it, and the text
    # before the first PRESENT marker belongs to the section the
    # cut landed in — never silently to the prior column (the
    # cross-column comparison trap; ADVICE r17). Any absent marker
    # is warned loudly so a format change can't pass as 0 movers.
    warm, found_cold, rest = tail.partition('"queries_cold"')
    if found_cold:
        cold, found_forced, forced = rest.partition('"queries_forced"')
        if found_forced:
            sections = [("queries", warm), ("queries_cold", cold),
                        ("queries_forced", forced)]
        else:
            # cold present but forced absent: impossible under
            # front-only truncation — warn and keep the post-cold
            # text as cold rather than inventing a forced section
            print(
                "WARNING: tail lacks \"queries_forced\" marker; "
                "post-cold cells attributed to queries_cold only",
                file=sys.stderr,
            )
            sections = [("queries", warm), ("queries_cold", cold)]
    else:
        cold, found_forced, forced = tail.partition('"queries_forced"')
        if found_forced:
            print(
                "WARNING: tail truncated past \"queries_cold\" "
                "marker; leading cells attributed to queries_cold",
                file=sys.stderr,
            )
            sections = [("queries_cold", cold), ("queries_forced", forced)]
        else:
            print(
                "WARNING: tail lacks both section markers; all "
                "cells attributed to queries_forced (deepest cut)",
                file=sys.stderr,
            )
            sections = [("queries_forced", tail)]
    for col, part in sections:
        for k, v in re.findall(_CELL_RE, part):
            if "_" not in k:
                # non-query scalars that share the line ("value",
                # "sf") — every query key carries an underscore
                continue
            out[(col, k)] = float(v)
    return out


def movers(cur_path: str, prev_path: str, threshold: float = 0.15) -> list:
    cur, prev = bench_cells(cur_path), bench_cells(prev_path)
    flagged = []
    for key in sorted(set(cur) & set(prev)):
        if prev[key] <= 0:
            continue
        ratio = cur[key] / prev[key]
        if abs(ratio - 1.0) > threshold:
            flagged.append(
                {"column": key[0], "query": key[1],
                 "prev": prev[key], "cur": cur[key], "ratio": round(ratio, 2)}
            )
    return flagged


def _steal_summary(bins: list) -> dict:
    """Integrate (steal%, user%, weight) bins into the published line.

    Means are weighted by each bin's total jiffies — with a constant
    core count, jiffies are proportional to bin duration, so the
    residual partial bin appended after process exit contributes
    exactly its share of the draw instead of a full 10-s vote
    (ADVICE r17).

    The max is restricted to bins carrying at least ~1 s of draw time
    (>= 10% of the largest bin's jiffy weight — full bins are 10 s):
    a residual of a few jiffies quantizes steal% so coarsely that a
    single stolen tick reads as a huge spike, and an unweighted max
    would publish that noise as the draw's burst ceiling (ADVICE r18).
    The largest bin always qualifies, so the max never goes empty.
    """
    w = sum(t for _, _, t in bins) or 1
    min_w = max((t for _, _, t in bins), default=0) * 0.1
    return {
        "steal_mean_pct": round(sum(s * t for s, _, t in bins) / w, 1),
        "steal_max_pct": round(
            max((s for s, _, t in bins if t >= min_w), default=0.0), 1
        ),
        "user_mean_pct": round(sum(u * t for _, u, t in bins) / w, 1),
        "bins_10s": len(bins),
    }


def benchsteal(script: str = None) -> None:
    import os
    import subprocess
    import tempfile

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bins = []  # (steal_pct, user_pct, weight_jiffies)
    prev = _procstat()

    def _bin():
        nonlocal prev
        cur = _procstat()
        d = [b - a for a, b in zip(prev, cur)]
        prev = cur
        tot = sum(d)
        if tot > 0:  # zero-jiffy residual (sub-tick exit) carries no info
            bins.append((100 * d[7] / tot, 100 * d[0] / tot, tot))

    # stdout goes to a temp FILE, never a pipe: a pipe nobody drains
    # during a ~9-minute draw deadlocks the child the moment it writes
    # past the OS buffer (~64 KiB) and poll() then never turns
    # non-None (ADVICE r17).
    with tempfile.TemporaryFile(mode="w+") as outf:
        p = subprocess.Popen(
            [sys.executable, script or os.path.join(here, "bench.py")],
            stdout=outf, text=True, cwd=here,
        )
        while True:
            try:
                p.wait(timeout=10)
                break
            except subprocess.TimeoutExpired:
                _bin()
        # the residual partial bin: up to 10 s of the draw's tail is
        # part of "steal integrated OVER the whole draw" (ADVICE r17)
        _bin()
        outf.seek(0)
        sys.stdout.write(outf.read())
    print(json.dumps(_steal_summary(bins)))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "calib"
    if cmd == "calib":
        print(json.dumps({"calibration": calib()}))
    elif cmd == "movers":
        out = movers(sys.argv[2], sys.argv[3])
        print(json.dumps(out, indent=1))
        print(f"{len(out)} mover(s) >15%")
    elif cmd == "benchsteal":
        benchsteal()
    else:
        raise SystemExit(f"unknown subcommand {cmd!r}")
