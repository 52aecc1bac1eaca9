"""Round-8 evidence runs (r7 verdict #3/#4), ONE process, run ALONE:

1. ll1/ll2/ll3 scaling, sf0.1 (5k docs) -> sf1.0-scale (50k docs, built by
   tools/gen_scale_docs.py as 10 shingle-disjoint isomorphic replicas so
   the workload shape — dup rate, gate keep-rate, skew — is preserved).
   For each query x scale: one untimed warmup, then min-of-3 timed runs to
   a count() action (the bench.py steady-state protocol). The result
   frame's summed `docs` column is printed per scale as workload-shape
   evidence (should be ~10x).

2. d3_minhash_lsh same-session A/B: two independent min-of-3 blocks
   separated by the full ll workload. operators/dedup.py is UNCHANGED
   since r6 (git: last touched in ce2c5f3, pre-r6-bench), so the r7
   +19.7% cross-session drift can only be noise; the same-session spread
   between blocks A and B bounds the same-code variance directly.

Prints one JSON line prefixed SCALING_AB_RESULT:.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_transform_make_spark import corpus  # noqa: E402
from data_transform_make_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scale_sf1")
LL = ["ll1_training_corpus", "ll2_training_corpus_clustered", "ll3_training_corpus_capped"]


def main() -> None:
    spark = get_spark("scaling-ab")
    qs = corpus.queries()
    # JVM/session warmup
    qs["p1_status_gate"](spark, SF01).count()

    def run_min3(name, sf_dir):
        f = lambda: qs[name](spark, sf_dir).count()  # noqa: E731
        f()  # warmup
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            f()
            runs.append(time.perf_counter() - t0)
        return round(min(runs), 3)

    from pyspark.sql import functions as F

    out = {"ll_scaling": {}, "workload_docs": {}, "d3_blocks": {}}

    # d3 block A (before the heavy ll workload)
    out["d3_blocks"]["A"] = run_min3("d3_minhash_lsh", SF01)

    for name in LL:
        t01 = run_min3(name, SF01)
        t1 = run_min3(name, SF1)
        out["ll_scaling"][name] = {
            "sf0.1": t01,
            "sf1.0": t1,
            "ratio": round(t1 / t01, 2),
        }
    for sf_label, sf_dir in (("sf0.1", SF01), ("sf1.0", SF1)):
        row = (
            qs["ll1_training_corpus"](spark, sf_dir)
            .agg(F.sum("n_docs").alias("d"))
            .collect()[0]
        )
        out["workload_docs"][sf_label] = int(row["d"])

    # d3 block B (after): same code, same session
    out["d3_blocks"]["B"] = run_min3("d3_minhash_lsh", SF01)
    a, b = out["d3_blocks"]["A"], out["d3_blocks"]["B"]
    out["d3_blocks"]["spread_pct"] = round(abs(a - b) / min(a, b) * 100, 1)

    print("SCALING_AB_RESULT:" + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
