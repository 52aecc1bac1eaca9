"""Profile bm25_1's sf0.1 -> sf1.0 growth (verdict r9 #4: the 6.2x
outlier in the round-8 scaling table). Decomposes the operator into its
cumulative stages, same session, min-of-3 steady-state per cell after a
warmup — the bench protocol:

  scan+tok : scan documents + tokenize (size(tokens) sum)    [1 pass]
  base     : + the 3 per-term HOF tf counts (the projection) [1 pass]
  stats    : the single-row agg OVER base                    [1 pass]
  full     : bm25_1 as registered (base under stats AND under
             the score map -> base runs TWICE, + broadcast
             crossJoin + TakeOrderedAndProject)              [2 passes]

Expected identity if nothing superlinear hides in the composition:
full ~= stats + base + topk-epsilon. Prints one JSON line prefixed
PROFILE_BM25_RESULT:.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_transform_make_spark import corpus  # noqa: E402
from data_transform_make_spark.functions.text import tokens  # noqa: E402
from data_transform_make_spark.session import get_spark  # noqa: E402
from data_transform_make_spark.sources.loader import load_table  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scale_sf1"
)
TERMS = ["table", "scan", "merge"]


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )


def _base(spark, sf_dir):
    tk = F.coalesce(tokens(F.col("text")), F.array().cast("array<string>"))

    def _eq(term):
        lit = F.lit(term)
        return lambda x: x == lit

    return _docs(spark, sf_dir).select(
        F.col("doc_id"),
        F.size(tk).cast("long").alias("dl"),
        *[
            F.size(F.filter(tk, _eq(t))).cast("long").alias(f"__tf_{i}")
            for i, t in enumerate(TERMS)
        ],
    )


def main() -> None:
    spark = get_spark("profile-bm25")
    qs = corpus.queries()
    qs["p1_status_gate"](spark, SF01).count()  # JVM warmup

    def stage_fns(sf_dir):
        tk = F.coalesce(
            tokens(F.col("text")), F.array().cast("array<string>")
        )
        return {
            "scan_tok": lambda: _docs(spark, sf_dir)
            .select(F.size(tk).alias("dl"))
            .agg(F.sum("dl"))
            .collect(),
            "base": lambda: _base(spark, sf_dir).agg(
                F.sum("dl"), *[F.sum(f"__tf_{i}") for i in range(len(TERMS))]
            ).collect(),
            "stats": lambda: _base(spark, sf_dir)
            .agg(
                F.count(F.lit(1)),
                F.sum("dl"),
                *[
                    F.sum(F.when(F.col(f"__tf_{i}") > 0, F.lit(1)))
                    for i in range(len(TERMS))
                ],
            )
            .collect(),
            "full": lambda: qs["bm25_1_query_ranking"](spark, sf_dir).count(),
        }

    def min3(f):
        f()  # per-cell warmup
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            f()
            runs.append(time.perf_counter() - t0)
        return round(min(runs), 3)

    out = {}
    for label, sf_dir in (("sf0.1", SF01), ("sf1.0", SF1)):
        fns = stage_fns(sf_dir)
        out[label] = {name: min3(f) for name, f in fns.items()}
    for name in out["sf0.1"]:
        out.setdefault("ratio", {})[name] = round(
            out["sf1.0"][name] / out["sf0.1"][name], 2
        )
    print("PROFILE_BM25_RESULT:" + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
