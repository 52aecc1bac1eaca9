"""Sub-stage profiling for the round-20 optimization pass.

Times the component stages of the heavy bench cells (ll-family, d2, d3,
dec1, par1) with the bench session conf at $SPARK_GRAFT_SF_DIR, labelled
via setJobDescription. Each stage is timed to a count()/noop action after
one untimed warm-up of the documents scan. Numbers are for RELATIVE
attribution inside one session, not cross-session comparison.

Usage: python tools/r20_profile.py [ll2|d2|dec1|...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_transform_make_spark.session import get_spark  # noqa: E402
from data_transform_make_spark.sources.loader import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn, n=3):
    spark.sparkContext.setJobDescription(label)
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    print(f"{min(runs):7.3f}  {label}  (runs: {[round(r,3) for r in runs]})")
    spark.sparkContext.setJobDescription(None)
    return min(runs)


spark = get_spark("r20-profile")
which = sys.argv[1] if len(sys.argv) > 1 else "all"

docs = load_table(spark, SF, "documents")
docs.count()  # warm footers/JVM

if which in ("all", "scan"):
    t("scan: documents count", lambda: docs.count())
    t("scan: documents full noop", lambda: docs.write.format("noop").mode("overwrite").save())

if which in ("all", "ll2"):
    from data_transform_make_spark.operators.dedup import (
        _spread,
        ngram_jaccard_pairs,
    )
    from data_transform_make_spark.operators.graph import connected_components
    from data_transform_make_spark.plans.training_corpus import (
        _quality_exact,
        _split_stats,
        SPLIT_TRAIN_CUT,
    )

    def stage_quality():
        ex = _quality_exact(docs, 0.66)
        ex.write.format("noop").mode("overwrite").save()

    t("ll2 s1: quality+exact dedup (noop)", stage_quality)

    exact = _quality_exact(docs, 0.66).persist()
    t("ll2 s1b: materialize exact persist", lambda: exact.count(), n=1)

    def stage_pairs():
        p = ngram_jaccard_pairs(exact, "doc_id", "text", shingle_n=3, threshold=0.2, materialize=True)
        p.count()
        return p

    t("ll2 s2: ngram pairs (eager, from persisted exact)", stage_pairs)
    pairs = ngram_jaccard_pairs(exact, "doc_id", "text", shingle_n=3, threshold=0.2, materialize=True)
    print("   pairs rows:", pairs.count())

    t("ll2 s3: connected components", lambda: connected_components(pairs).count())
    cc = connected_components(pairs)

    def stage_stats():
        drop_ids = cc.filter(F.col("cluster_id") != F.col("id")).select(F.col("id").alias("doc_id"))
        kept = exact.join(drop_ids, "doc_id", "left_anti")
        _split_stats(kept, SPLIT_TRAIN_CUT).count()

    t("ll2 s4: anti-join + split stats", stage_stats)
    exact.unpersist()

if which in ("all", "d2"):
    from data_transform_make_spark.functions.text import shingles
    from data_transform_make_spark.operators.checkpointing import eager_cut
    from data_transform_make_spark.operators.dedup import _spread, ngram_jaccard_pairs

    def d2_proj_cut():
        spread = _spread(docs, "doc_id")
        proj = spread.select(
            F.col("doc_id").alias("__id"),
            F.array_distinct(shingles(F.col("text"), 3)).alias("__arr"),
        )
        eager_cut(proj, None)

    t("d2 s1: shingle projection localCheckpoint", d2_proj_cut)

    spread = _spread(docs, "doc_id")
    proj = eager_cut(
        spread.select(
            F.col("doc_id").alias("__id"),
            F.array_distinct(shingles(F.col("text"), 3)).alias("__arr"),
        ),
        None,
    )

    def d2_rest():
        sh = proj.select("__id", F.explode("__arr").alias("__sh"))
        sizes = proj.select("__id", F.size("__arr").alias("__n"))
        postings = (
            sh.groupBy("__sh")
            .agg(F.sort_array(F.collect_list("__id")).alias("__ids"))
            .filter(F.size("__ids") > 1)
        )
        e1 = postings.select("__ids", F.posexplode("__ids").alias("__ia", "id_a"))
        prs = e1.select(
            "id_a",
            F.explode(F.slice(F.col("__ids"), F.col("__ia") + F.lit(2), F.size("__ids"))).alias("id_b"),
        )
        inter = prs.groupBy("id_a", "id_b").agg(F.count("*").alias("__inter"))
        joined = (
            inter.join(sizes.withColumnRenamed("__id", "id_a").withColumnRenamed("__n", "__na"), "id_a")
            .join(sizes.withColumnRenamed("__id", "id_b").withColumnRenamed("__n", "__nb"), "id_b")
        )
        jac = F.col("__inter").cast("double") / (F.col("__na") + F.col("__nb") - F.col("__inter")).cast("double")
        joined.withColumn("jaccard", jac).filter(F.col("jaccard") >= 0.2).select("id_a", "id_b", "jaccard").count()

    t("d2 s2: index+pairs+joins (from checkpointed proj)", d2_rest)
    t("d2 full (eager)", lambda: ngram_jaccard_pairs(docs, "doc_id", "text", shingle_n=3, threshold=0.2, materialize=True).count())

if which in ("all", "d3"):
    from data_transform_make_spark.operators.dedup import minhash_lsh_pairs, minhash_signatures

    t("d3 s1: signatures only (noop)", lambda: minhash_signatures(docs, "doc_id", "text", 32, 3).write.format("noop").mode("overwrite").save())
    t("d3 full (eager)", lambda: minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=32, bands=8, threshold=0.2, eager=True).count())

if which in ("all", "dec1"):
    from data_transform_make_spark.plans.training_corpus import (
        decontamination_report,
        release_decontamination_cache,
    )

    def dec1_full():
        release_decontamination_cache()
        decontamination_report(docs, "doc_id", "text", shingle_n=3).count()

    t("dec1 full (memo reset)", dec1_full)

if which in ("all", "par1"):
    from data_transform_make_spark.operators.dedup import paragraph_dedup

    aug = docs.select(
        "doc_id",
        F.concat(
            F.regexp_replace(F.col("text"), r"((\S+ ){9}\S+) ", "$1\n\n"),
            F.when(F.col("doc_id") % 4 == 0, F.lit("\n\ncall now to subscribe to our newsletter today")).otherwise(F.lit("")),
        ).alias("t"),
    )
    t("par1 full count", lambda: paragraph_dedup(aug, "doc_id", "t").count())

spark.stop()
