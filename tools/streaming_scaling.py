"""Streaming ×10 growth evidence (round 15): the SCALE.md streaming
section was qualitative — this measures it. Each st* query is a full
Structured Streaming run (readStream → stateful op → memory sink,
availableNow, fresh query + fresh state per run), timed sf0.1 (100k
events) vs sf1.0 (the scale_sf1 corpus, 1M events — same timestamp range
at 10× density, 10× user keys, so windows stay constant while rows per
window and state keys grow 10×).

Protocol: one session, one untimed warmup per cell (codegen + source
listing), then min-of-3. Each timed run pays the FULL streaming
lifecycle (query start, source listing, state build, sink, stop) — the
honest unit for a catch-up/backfill pass, which is what availableNow is.
Prints one JSON line prefixed STREAMING_SCALING_RESULT.

Run: python tools/streaming_scaling.py [query ...]  (~6 min all cells)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_transform_make_spark import corpus  # noqa: E402
from data_transform_make_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scale_sf1"
)
QUERIES = sys.argv[1:] or [
    "st1_stream_window_agg",
    "st8_stream_hopping_window",
    "st5_stream_session_window",
    "st2_stream_dedup",
    "st3_stream_stateful_counters",
    "st4_stream_stream_join",
    "st6_stream_ingest_routing",
    "st7_stream_static_join",
]


def main() -> None:
    if not os.path.isdir(SF1):
        raise SystemExit(
            f"{SF1} not found — the sf1.0 corpus is regenerated per session: "
            "run `python tools/gen_scale_docs.py` first"
        )
    spark = get_spark("streaming-scaling")
    qs = corpus.queries()

    def run_min3(name, sf_dir):
        def f():
            return qs[name](spark, sf_dir).count()

        f()  # warmup
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            f()
            runs.append(time.perf_counter() - t0)
        return round(min(runs), 3)

    out = {}
    for name in QUERIES:
        t01 = run_min3(name, SF01)
        t1 = run_min3(name, SF1)
        out[name] = {"sf0.1": t01, "sf1.0": t1, "ratio": round(t1 / t01, 2)}
    print("STREAMING_SCALING_RESULT:" + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
