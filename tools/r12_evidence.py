"""Round-12 evidence run, ONE process, run ALONE (the r10/r11 model).

The round's one plan change: `paragraph_dedup` (par1) gets the d2
fingerprint treatment — the pre-r12 shape shuffled paragraph TEXT twice
(inside the min_by winner struct, then again for the groupBy(id)
reassembly) and was the family's steepest sf0.1→sf1.0 scaler (4.8× for
10× data, SCALE.md r11 table). The r12 shape shuffles (md5, id, pos)
fingerprints at paragraph granularity and moves document text exactly
once, through the doc-id reassembly join.

Protocol per the bench ledger: same-session INTERLEAVED min-of-3 blocks
(old/new alternating), identical outputs asserted BEFORE any timing via
an order-independent checksum over (id, text, n_paras), at sf0.1 and —
when tools/gen_scale_docs.py's corpus exists — sf1.0, so the 10×-data
growth ratio of both shapes is read in one session.

Prints one JSON line prefixed R12_EVIDENCE_RESULT:.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_transform_make_spark.operators.dedup import (  # noqa: E402
    keep_min_by,
    paragraph_dedup,
)
from data_transform_make_spark.session import get_spark  # noqa: E402
from data_transform_make_spark.sources.loader import load_table  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scale_sf1"
)


def _pre_r12_paragraph_dedup(df, id_col, text_col, sep="\n\n"):
    """The pre-r12 shape, verbatim (text-carrying shuffles), as the
    A/B control — kept here only so the evidence run can re-measure it."""
    paras = df.select(
        id_col,
        F.posexplode(
            F.split(F.col(text_col), "\\Q" + sep + "\\E")
        ).alias("pos", "para"),
    ).filter(F.length(F.trim(F.col("para"))) > 0)
    winners = keep_min_by(
        paras, [F.md5(F.col("para")).alias("__ph")], [id_col, "pos"]
    )
    return (
        winners.groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "para"))).alias("__ps")
        )
        .select(
            id_col,
            F.concat_ws(
                sep, F.expr("transform(__ps, x -> x.para)")
            ).alias(text_col),
            F.size("__ps").cast("long").alias("n_paras"),
        )
    )


def _aug(spark, sf_dir):
    """The par1 fixture projection (corpus.py par1_paragraph_dedup):
    planted paragraph breaks + the every-4th-doc boilerplate."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.concat(
            F.regexp_replace(F.col("text"), r"((\S+ ){9}\S+) ", "$1\n\n"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit("\n\ncall now to subscribe to our newsletter today"),
            ).otherwise(F.lit("")),
        ).alias("t"),
    )


def _checksum(out_df):
    """Order-independent (sum of row hashes) + count: identical outputs
    iff both agree, without collecting megabytes of reassembled text."""
    (row,) = out_df.agg(
        F.count("*").alias("n"),
        # decimal sum: ANSI-safe (a long sum of 64-bit hashes overflows)
        F.sum(
            F.xxhash64("doc_id", "t", "n_paras").cast("decimal(38,0)")
        ).alias("h"),
    ).collect()
    return (row["n"], str(row["h"]))


def _min3(f):
    f()  # warmup
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        f()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def main() -> None:
    spark = get_spark("r12-evidence")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for tag, sf_dir in [("sf0.1", SF01), ("sf1.0", SF1)]:
        if not os.path.isdir(sf_dir):
            out[tag] = "absent (run tools/gen_scale_docs.py)"
            continue
        aug = _aug(spark, sf_dir)
        old_df = _pre_r12_paragraph_dedup(aug, "doc_id", "t")
        new_df = paragraph_dedup(aug, "doc_id", "t")
        ck_old, ck_new = _checksum(old_df), _checksum(new_df)
        assert ck_old == ck_new, (tag, ck_old, ck_new)
        # interleaved min-of-3 blocks: old, new, old, new. Timed through
        # the checksum aggregate, which forces FULL evaluation including
        # the reassembled text — count() prunes the final projection,
        # and the two shapes reassemble differently (the first run of
        # this experiment was count()-timed and missed the reassembly
        # serialization that led to the shared-spread fix; see SCALE.md
        # round 12).
        o1 = _min3(lambda: _checksum(old_df))
        n1 = _min3(lambda: _checksum(new_df))
        o2 = _min3(lambda: _checksum(old_df))
        n2 = _min3(lambda: _checksum(new_df))
        out[tag] = {
            "rows": ck_old[0],
            "checksum_match": True,
            "old": min(o1, o2),
            "new": min(n1, n2),
        }
    for tag in ("sf0.1", "sf1.0"):
        if isinstance(out.get(tag), dict):
            out[tag]["speedup"] = round(out[tag]["old"] / out[tag]["new"], 2)
    if isinstance(out.get("sf0.1"), dict) and isinstance(out.get("sf1.0"), dict):
        out["ratio_10x_old"] = round(out["sf1.0"]["old"] / out["sf0.1"]["old"], 2)
        out["ratio_10x_new"] = round(out["sf1.0"]["new"] / out["sf0.1"]["new"], 2)
    print("R12_EVIDENCE_RESULT:" + json.dumps(out))
    spark.stop()


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


# ---------------------------------------------------------------------------
# Experiment 2 (run with: python tools/r12_evidence.py bm25): the tf stage.
# The whole-engine 10x table put bm25_1 at x5.2 — the most expensive
# Column-expression map after the let pass. Its tf stage runs one
# interpreted size(filter(tk, =term)) traversal PER TERM, each building
# a filtered array only to take its length. Candidates, outputs asserted
# identical before timing:
#   A (shipped)  size(filter(tk, eq(t)))           T traversals + T array allocs
#   B            per-term count fold               T traversals, no array allocs
#   C            ONE fused fold, T-counter struct  1 traversal, n struct allocs
# ---------------------------------------------------------------------------

TERMS = ["table", "scan", "merge"]


def _tf_a(tk):
    def _eq(term):
        lit = F.lit(term)
        return lambda x: x == lit

    return [
        F.size(F.filter(tk, _eq(t))).cast("long").alias(f"tf{i}")
        for i, t in enumerate(TERMS)
    ]


def _tf_b(tk):
    def _count(term):
        lit = F.lit(term)
        return F.aggregate(
            tk,
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.when(x == lit, F.lit(1)).otherwise(F.lit(0)).cast("long"),
        )

    return [_count(t).alias(f"tf{i}") for i, t in enumerate(TERMS)]


def _fused_fold(tk):
    init = F.struct(
        *[F.lit(0).cast("long").alias(f"t{i}") for i in range(len(TERMS))]
    )

    def _merge(acc, x):
        return F.struct(
            *[
                (
                    acc[f"t{i}"]
                    + F.when(x == F.lit(t), F.lit(1)).otherwise(F.lit(0)).cast("long")
                ).alias(f"t{i}")
                for i, t in enumerate(TERMS)
            ]
        )

    return F.aggregate(tk, init, _merge)


def _bm25_base(docs, variant):
    from data_transform_make_spark.functions.text import tokens

    tk = F.coalesce(tokens(F.col("text")), F.array().cast("array<string>"))
    if variant == "c":
        # hoisted like the IVF vv column so the fold runs once, not
        # once per extracted counter
        return docs.withColumn("__f", _fused_fold(tk)).select(
            "doc_id",
            F.size(tk).cast("long").alias("dl"),
            *[F.col("__f")[f"t{i}"].alias(f"tf{i}") for i in range(len(TERMS))],
        )
    tfs = _tf_a(tk) if variant == "a" else _tf_b(tk)
    return docs.select("doc_id", F.size(tk).cast("long").alias("dl"), *tfs)


def _bm25_checksum(df):
    (row,) = df.agg(
        F.count("*").alias("n"),
        F.sum(
            F.xxhash64("doc_id", "dl", "tf0", "tf1", "tf2").cast("decimal(38,0)")
        ).alias("h"),
    ).collect()
    return (row["n"], str(row["h"]))


def bm25_main() -> None:
    spark = get_spark("r12-evidence-bm25")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for tag, sf_dir in [("sf0.1", SF01), ("sf1.0", SF1)]:
        if not os.path.isdir(sf_dir):
            out[tag] = "absent"
            continue
        docs = load_table(spark, sf_dir, "documents").filter(
            F.length(F.trim(F.col("text"))) > 0
        )
        dfs = {v: _bm25_base(docs, v) for v in ("a", "b", "c")}
        cks = {v: _bm25_checksum(d) for v, d in dfs.items()}
        assert cks["a"] == cks["b"] == cks["c"], (tag, cks)
        cell = {"rows": cks["a"][0]}
        # interleaved: a b c a b c -> per-variant min of both blocks.
        # NB: time through a hash-sum over EVERY output column, never
        # count() — count() prunes the projection, so a count()-timed
        # run of this experiment measures the scan and nothing else
        # (caught in-round: the first attempt read a=b=c at scan cost).
        for rnd in range(2):
            for v in ("a", "b", "c"):
                t = _min3(lambda d=dfs[v]: _bm25_checksum(d))
                cell[v] = min(cell.get(v, 99.0), t)
        out[tag] = cell
    print("R12_BM25_RESULT:" + json.dumps(out))
    spark.stop()


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "bm25":
    bm25_main()


# ---------------------------------------------------------------------------
# Experiment 3 (run with: python tools/r12_evidence.py spread): bm25_topk
# without vs with _spread on the input. The whole-engine 10x table read
# bm25_1 at x5.2; the layout probe explains it — documents.parquet is a
# single row group at BOTH SFs, so the per-term interpreted tf traversals
# run in ONE task while 31 cores idle. Every other expensive per-doc map
# in the engine (_shingles/simhash/keywords/chunking/quality gate) goes
# through _spread (operators/dedup.py:36) for exactly this reason; bm25
# predates the convention. Outputs are the exact top-20 rows (total
# (score DESC, id) order) — asserted equal before timing.
# ---------------------------------------------------------------------------


def spread_main() -> None:
    from data_transform_make_spark.operators.dedup import _spread
    from data_transform_make_spark.operators.ranking import bm25_topk

    spark = get_spark("r12-evidence-spread")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for tag, sf_dir in [("sf0.1", SF01), ("sf1.0", SF1)]:
        if not os.path.isdir(sf_dir):
            out[tag] = "absent"
            continue
        docs = load_table(spark, sf_dir, "documents").filter(
            F.length(F.trim(F.col("text"))) > 0
        )
        terms = ["table", "scan", "merge"]
        cur = lambda: bm25_topk(docs, "doc_id", "text", terms, k=20)  # noqa: E731
        spr = lambda: bm25_topk(  # noqa: E731
            _spread(docs, "doc_id"), "doc_id", "text", terms, k=20
        )
        rows_cur = [tuple(r) for r in cur().collect()]
        rows_spr = [tuple(r) for r in spr().collect()]
        assert rows_cur == rows_spr, (tag, rows_cur[:2], rows_spr[:2])
        cell = {}
        for rnd in range(2):
            for name, f in (("current", cur), ("spread", spr)):
                t = _min3(lambda f=f: f().count())
                cell[name] = min(cell.get(name, 99.0), t)
        cell["speedup"] = round(cell["current"] / cell["spread"], 2)
        out[tag] = cell
    print("R12_SPREAD_RESULT:" + json.dumps(out))
    spark.stop()


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "spread":
    spread_main()
