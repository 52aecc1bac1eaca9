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
        # interleaved min-of-3 blocks: old, new, old, new
        o1 = _min3(lambda: old_df.count())
        n1 = _min3(lambda: new_df.count())
        o2 = _min3(lambda: old_df.count())
        n2 = _min3(lambda: new_df.count())
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


if __name__ == "__main__":
    main()
