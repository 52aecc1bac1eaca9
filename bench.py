"""Benchmark harness — runs the corpus's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Per-query protocol: one untimed warmup run (pays whole-stage-codegen /
Janino compilation — a fixed few-second cost that is noise at the 100 TB
design point but 50-80% of wall time at sf0.1), then the MIN of five timed
runs to a count() action (results are not collected to the driver — we
measure engine throughput, not IPC). Min, not median: the box is a shared
VM and timings are occasionally inflated several-fold by host neighbors /
JIT recompile storms (observed: the same query 1.8s and 17s across runs of
identical code); the minimum is the standard noise-robust estimator of
achievable steady-state (cf. timeit). ``queries`` holds the steady-state
min seconds; ``queries_cold`` the first-run seconds including compile, so
both signals stay visible.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from data_transform_make_spark import corpus
from data_transform_make_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "i1_ingest_dead_letter",
    "a1_a2_order_counter_deltas",
    "j1_lookup_join",
    "a4_a6_status_transitions",
    "w1_running_total",
    "w2_topk_per_group",
    "w3_sessionize",
    "j2_as_of_join",
    "j3_range_join",
    "q6_filter_agg",
    "pc1_percentiles",
    "d1_exact_dedup",
    "d2_ngram_jaccard",
    "d3_minhash_lsh",
    "n1_topk_cosine",
    "ta1_text_stats",
    "agg1_ordered_collect",
    "ll1_training_corpus",
    # added in round 4 (totals before/after are not directly comparable):
    "dec1_decontamination",
    "ch1_doc_chunks",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")

    # warm the JVM + parquet footers once so timings measure steady-state
    corpus.queries()["p1_status_gate"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    qs = corpus.queries()
    for name in HEADLINE:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        cold[name] = round(time.perf_counter() - t0, 3)
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_cold": cold,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
