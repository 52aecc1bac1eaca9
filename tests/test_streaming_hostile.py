"""Streaming hostile-arrival wave, per-suite (round 15).

tools/streaming_hostile_sim.py replays a controlled multi-batch arrival
order (one parquet file per micro-batch, mtime-ordered, delivered via
maxFilesPerTrigger=1) through the SHIPPED st1-st8 pipeline bodies:
a duplicate event_id straddling a micro-batch boundary, an entirely
empty batch, an all-dead-letter batch under st6's ingest grid, a
watermark-advancing event followed by late rows beyond the watermark,
and a NULL event-time row. Each result is checked against the
registered DuckDB oracle (complete-mode aggs are arrival-order
invariant; the stream-stream join equals the batch join; the stateful
counters' latest emission equals the batch GROUP BY) or the documented
scenario oracle (st2: exactly-once per event id — the registered oracle
assumes the shipped fixture's unique-id invariant). Since r16 the wave
also restarts each state-store operator (st2/st3/st4/st5) mid-wave on
its checkpoint — stop after batch 1, resume over the remaining files — and
requires the final result to equal both the uninterrupted run and the
oracle; since r17 that restart set includes the shipped production
default streaming_counters_native (st3's fold as a native update-mode
HashAggregate — the one state-store shape the r16 wave left out). This
test keeps the whole wave green so a Spark behavior change in
cross-batch state handling surfaces here, not in production.
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import streaming_hostile_sim  # noqa: E402


def test_streaming_suite_survives_hostile_arrival_order(spark):
    fails = streaming_hostile_sim.run()
    assert not fails, f"streaming hostile-arrival mismatches: {fails}"
