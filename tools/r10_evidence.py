"""Round-10 evidence runs (r9 verdict items 3 and 5), ONE process, run ALONE.

1. d1_exact_dedup / n1_topk_cosine same-session interleaved A/B.
   BENCH_r09 showed +45% / +42% cross-session drift on these two keys with
   UNTOUCHED code (r9 changed neither operators/dedup.py:82 nor
   operators/similarity.py:34 paths). Protocol (SCALE.md "Bench protocol" +
   the round-8 same-code-spread datapoint): two independent min-of-5 blocks
   per query, interleaved and separated by a heavy unrelated workload (ll1),
   all in one JVM. If both blocks sit near the r8 numbers (d1 0.218 s,
   n1 0.250 s) and within the documented 32% same-code band of each other,
   the r9 drift is classified shared-VM noise; a reproducible elevation
   would instead be a found regression.

2. w2_topk_per_group scaling shape (the steepest relational row: 2.1x wall
   for 10x rows, SCALE.md r9 table). Measures the shipped two-phase plan vs
   the naive one-phase global-window plan at sf0.1 AND sf1.0 (min-of-3 each,
   count() action), and asserts both plans return identical row counts. The
   verdict's question: is 2.1x just the per-group sort growing with real
   data, and does two-phase still beat one-phase at sf1.0?

Prints one JSON line prefixed R10_EVIDENCE_RESULT:.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_transform_make_spark import corpus  # noqa: E402
from data_transform_make_spark.operators.windows import top_k_per_group  # noqa: E402
from data_transform_make_spark.session import get_spark  # noqa: E402
from data_transform_make_spark.sources.loader import load_table  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scale_sf1"
)


def _min_of(f, n):
    f()  # warmup (codegen compile)
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def _w2_variant(spark, sf_dir, two_phase):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    order = [
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    ]
    return top_k_per_group(li, ["l_returnflag"], order, 5, two_phase=two_phase)


def main() -> None:
    spark = get_spark("r10-evidence")
    qs = corpus.queries()
    qs["p1_status_gate"](spark, SF01).count()  # JVM/session warmup

    out = {"ab": {}, "w2": {}}

    # --- 1. d1/n1 interleaved A/B ---
    def block(tag):
        out["ab"].setdefault("d1_exact_dedup", {})[tag] = _min_of(
            lambda: qs["d1_exact_dedup"](spark, SF01).count(), 5
        )
        out["ab"].setdefault("n1_topk_cosine", {})[tag] = _min_of(
            lambda: qs["n1_topk_cosine"](spark, SF01).count(), 5
        )

    block("A")
    qs["ll1_training_corpus"](spark, SF01).count()  # heavy separator workload
    block("B")

    # --- 2. w2 two-phase vs one-phase, sf0.1 and sf1.0 ---
    for sf_tag, sf_dir in (("sf0.1", SF01), ("sf1.0", SF1)):
        rows_two = _w2_variant(spark, sf_dir, True).count()
        rows_one = _w2_variant(spark, sf_dir, False).count()
        assert rows_two == rows_one, (sf_tag, rows_two, rows_one)
        out["w2"][sf_tag] = {
            "rows": rows_two,
            "two_phase": _min_of(
                lambda: _w2_variant(spark, sf_dir, True).count(), 3
            ),
            "one_phase": _min_of(
                lambda: _w2_variant(spark, sf_dir, False).count(), 3
            ),
        }

    print("R10_EVIDENCE_RESULT:" + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
