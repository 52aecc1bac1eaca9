"""Round-13 evidence run, ONE process, run ALONE (the r10-r12 model).

Target: the last three ×3+ whole-engine growth cells — ll1 (×3.5),
d1 (×3.3), ll2 (×3.2) in the r12 sf1.0 bench table — plus the ta1/tc1
forced-evaluation cells (×5.3/×5.5), all carrying the same r12
diagnosis: ``documents.parquet`` is ONE row group at BOTH SFs, parquet
splits at row-group boundaries, so every expensive per-doc map stage
that reads it un-spread runs in ONE task while 31 cores idle. The r12
verdict (directives 1 and 3) asks for a same-session forced-evaluation
disposition of each cell: layout artifact, or real plan cost that needs
a shipped ``_spread``.

Three experiments, one session:

1. LAYOUT PROBE — the diagnosis test, and the arm the 100 TB design
   point actually cares about: rewrite documents.parquet as a 32-file
   dataset (what any real corpus looks like — at 100 TB the scan meets
   millions of row groups) and run the UNCHANGED queries on both
   layouts, interleaved, forced evaluation (hash-sum over every output
   column — the r12 count()-pruning lesson), min-of-3, at sf0.1 and
   sf1.0. Output checksums are asserted EQUAL across layouts before any
   timing is read (same values, different physical layout). If a cell's
   10x growth flattens on the multi-split layout with ZERO code change,
   the cell is the layout artifact and nothing ships; a cell that stays
   ×3+ there is a real plan cost.

2. d1 ``_spread`` VARIANT — the shipping candidate, par1-template:
   base d1 vs ``keep_min_by(_spread(docs, doc_id), ...)`` on the
   original one-file layout, outputs asserted identical before timing.
   This prices what shipping a spread would buy locally, to be weighed
   against experiment 1: if the multi-split layout already flattens d1,
   the spread's exchange is pure added cost at scale (the r6 2x2 called
   it the same way at sf0.1: nospread+min_by 2.87 s vs spread 3.69).

3. PUSHDOWN FACT — why no spread-input variant exists for ll1/ll2:
   their expensive map is the quality gate, a FILTER, and Catalyst
   pushes deterministic filters back through RepartitionByExpression —
   asserted here against the optimized plan so the ledger line rests on
   the plan, not on folklore. (The pipelines' genuinely expensive
   PROJECTION — the shingle map — is already behind the internal
   ``_spread`` in ngram_jaccard_pairs; projections do not push down
   through exchanges.)

pu1 (forced x1.7) is NOT probed: it reads lineitem (6 row groups at
sf1.0 — no one-task pathology is possible), and its sf0.1 cell is
Arrow-batch fixed overhead; the ratio is already sub-core-count.

Prints one JSON line prefixed R13_EVIDENCE_RESULT:.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_transform_make_spark import corpus  # noqa: E402
from data_transform_make_spark.functions.expr import optimized_plan  # noqa: E402
from data_transform_make_spark.functions.text import (  # noqa: E402
    doc_fingerprint,
    quality_score,
)
from data_transform_make_spark.operators.dedup import (  # noqa: E402
    _spread,
    keep_min_by,
)
from data_transform_make_spark.session import get_spark  # noqa: E402
from data_transform_make_spark.sources.loader import load_table  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, "scale_sf1")
PROBE = os.path.join(REPO, "tmp_layout_probe")  # gitignored, rebuilt per run

PROBE_QUERIES = [
    "d1_exact_dedup",
    "ll1_training_corpus",
    "ll2_training_corpus_clustered",
    "ta1_text_stats",
    "tc1_line_cleaning",
]
RUNS = 3


def hashsum(df):
    """Forced evaluation + order-independent output checksum in one
    action: decimal sum of xxhash64 over EVERY output column — nothing
    prunable (the r12 lesson), and equal sums across two arms certify
    equal multisets of rows for the timing to stand on."""
    row = df.agg(
        F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    # a NULL sum (decimal overflow under ANSI-off, or a zero-row frame
    # with n>0 impossible) on BOTH arms would make the equal-output
    # assert pass vacuously — refuse loudly instead of certifying a
    # timing on an unverified identity (advice, round 13)
    if row["n"] > 0 and row["h"] is None:
        raise AssertionError(
            "hashsum: checksum is NULL over a non-empty frame (decimal "
            "overflow?) — the cross-arm identity cannot be certified"
        )
    return (str(row["h"]), row["n"])


def build_probe_layout(spark) -> dict:
    """32-file copies of documents.parquet for both SFs under PROBE."""
    dirs = {}
    if os.path.exists(PROBE):
        shutil.rmtree(PROBE)
    for tag, src in (("sf0.1", SF01), ("sf1.0", SF1)):
        dst = os.path.join(PROBE, tag)
        os.makedirs(dst)
        (
            spark.read.parquet(os.path.join(src, "documents.parquet"))
            .repartition(32)
            .write.parquet(os.path.join(dst, "documents.parquet"))
        )
        dirs[tag] = dst
    return dirs


def timed_min(fn) -> float:
    runs = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def main() -> None:
    spark = get_spark("r13-evidence")
    qs = corpus.queries()
    qs["p1_status_gate"](spark, SF01).count()  # JVM + footer warmup

    probe_dirs = build_probe_layout(spark)
    result = {"layout_probe": {}, "d1_spread_ab": {}, "pushdown_fact": None}

    # ---- experiment 1: layout probe --------------------------------
    for name in PROBE_QUERIES:
        cell = {}
        for tag, orig in (("sf0.1", SF01), ("sf1.0", SF1)):
            multi = probe_dirs[tag]

            def run_one(d=orig, n=name):
                return hashsum(qs[n](spark, d))

            def run_multi(d=multi, n=name):
                return hashsum(qs[n](spark, d))

            # identity first (also warms both arms)
            a, b = run_one(), run_multi()
            assert a == b, f"{name}@{tag}: layout changed the OUTPUT {a} vs {b}"
            # interleaved min-of-3 blocks
            one_runs, multi_runs = [], []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                run_one()
                one_runs.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                run_multi()
                multi_runs.append(time.perf_counter() - t0)
            cell[tag] = {
                "one_file": round(min(one_runs), 3),
                "multi_split": round(min(multi_runs), 3),
            }
        cell["ratio_one_file"] = round(
            cell["sf1.0"]["one_file"] / cell["sf0.1"]["one_file"], 2
        )
        cell["ratio_multi_split"] = round(
            cell["sf1.0"]["multi_split"] / cell["sf0.1"]["multi_split"], 2
        )
        result["layout_probe"][name] = cell
        print(f"# probe {name}: {json.dumps(cell)}", file=sys.stderr)

    # ---- experiment 2: d1 spread variant on the original layout ----
    def d1_base(sf_dir):
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        return keep_min_by(
            docs, [doc_fingerprint(F.col("text")).alias("__fp")], ["doc_id"]
        )

    def d1_spread(sf_dir):
        docs = _spread(
            load_table(spark, sf_dir, "documents").select("doc_id", "text"),
            "doc_id",
        )
        return keep_min_by(
            docs, [doc_fingerprint(F.col("text")).alias("__fp")], ["doc_id"]
        )

    for tag, d in (("sf0.1", SF01), ("sf1.0", SF1)):
        a, b = hashsum(d1_base(d)), hashsum(d1_spread(d))
        assert a == b, f"d1 spread variant changed the OUTPUT at {tag}"
        base_runs, spread_runs = [], []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            hashsum(d1_base(d))
            base_runs.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            hashsum(d1_spread(d))
            spread_runs.append(time.perf_counter() - t0)
        result["d1_spread_ab"][tag] = {
            "base": round(min(base_runs), 3),
            "spread": round(min(spread_runs), 3),
        }
    ab = result["d1_spread_ab"]
    ab["ratio_base"] = round(ab["sf1.0"]["base"] / ab["sf0.1"]["base"], 2)
    ab["ratio_spread"] = round(ab["sf1.0"]["spread"] / ab["sf0.1"]["spread"], 2)

    # ---- experiment 3: the quality FILTER pushes through a spread --
    docs = load_table(spark, SF01, "documents")
    spread_then_filter = _spread(docs, "doc_id").filter(
        quality_score("text") >= 0.66
    )
    plan = optimized_plan(spread_then_filter)
    fpos = plan.find("Filter")
    rpos = plan.find("RepartitionByExpression")
    # optimizedPlan prints top-down: the filter sits BELOW the exchange
    # iff its line comes after the repartition's.
    result["pushdown_fact"] = (
        "confirmed: Filter printed below RepartitionByExpression"
        if 0 <= rpos < fpos
        else f"NOT confirmed (fpos={fpos}, rpos={rpos}) — re-read the plan"
    )

    shutil.rmtree(PROBE, ignore_errors=True)
    print("R13_EVIDENCE_RESULT:" + json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
