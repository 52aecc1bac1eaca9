"""Scratch-column collision guards (round-13 boundary review).

The class: public operators stamp internal ``__``-prefixed scratch
columns onto CALLER frames with ``withColumn`` and drop them on the way
out. ``withColumn`` silently REPLACES an existing same-named column, so
a caller that already carries one gets silently-wrong logic AND loses
the column from the output — worst in the sinks, where it vanishes from
data written to disk. Every guarded site must refuse loudly
(functions/cols.claim_scratch, analysis-time, no job); these tests pin
each refusal plus one clean-input control per family.
"""

import pytest
from pyspark.sql import functions as F

from data_transform_make_spark.functions.cols import claim_scratch


def test_claim_scratch_names_op_and_columns(spark):
    df = spark.range(3).withColumn("__x", F.lit(1))
    with pytest.raises(ValueError, match=r"my_op.*__x"):
        claim_scratch(df, "my_op", "__x", "__y")
    claim_scratch(df, "my_op", "__y")  # clean name passes silently


def test_top_k_per_group_two_phase_refuses_pid_lrn(spark):
    from data_transform_make_spark.operators.windows import top_k_per_group

    df = spark.range(5).select(
        F.lit("g").alias("g"), F.col("id"), F.lit(0).alias("__pid")
    )
    with pytest.raises(ValueError, match=r"top_k_per_group.*__pid"):
        top_k_per_group(df, ["g"], F.col("id"), 2, two_phase=True)
    # one-phase never touches the scratch names — same frame is fine
    top_k_per_group(df, ["g"], F.col("id"), 2, two_phase=False)
    # rank_in_group is added onto the pass-through frame in BOTH modes
    with pytest.raises(ValueError, match=r"top_k_per_group.*rank_in_group"):
        top_k_per_group(
            df.withColumn("rank_in_group", F.lit(0)),
            ["g"],
            F.col("id"),
            2,
            two_phase=False,
        )


def test_bucketed_range_join_refuses_bucket_on_either_side(spark):
    from data_transform_make_spark.operators.joins import bucketed_range_join

    left = spark.range(3).select(
        F.col("id").cast("double").alias("p"), F.lit(0).alias("__bucket")
    )
    right = spark.range(3).select(
        F.col("id").cast("double").alias("lo"),
        (F.col("id") + 1).cast("double").alias("hi"),
    )
    with pytest.raises(ValueError, match=r"left.*__bucket"):
        bucketed_range_join(left, right, "p", "lo", "hi", 1.0)
    with pytest.raises(ValueError, match=r"right.*__bucket"):
        bucketed_range_join(
            left.drop("__bucket"),
            right.withColumn("__bucket", F.lit(1)),
            "p",
            "lo",
            "hi",
            1.0,
        )


def test_salted_join_and_sum_refuse_salt(spark):
    from data_transform_make_spark.operators.skew import salted_join, salted_sum

    big = spark.range(10).select(
        F.col("id").alias("k"), F.lit(9).alias("__salt")
    )
    small = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match=r"salted_join\(large\).*__salt"):
        salted_join(big, small, "k", hot=[1])
    # empty hot list short-circuits to a plain join — no scratch, no guard
    salted_join(big, small, "k", hot=[])
    with pytest.raises(ValueError, match=r"salted_sum.*__salt"):
        salted_sum(big.withColumn("v", F.lit(1)), ["k"], "v")


def test_similarity_topk_refuse_scratch(spark):
    from data_transform_make_spark.operators.similarity import (
        ivf_topk,
        lsh_bucket_topk,
    )

    vecs = spark.range(4).select(
        F.col("id"),
        F.array(F.col("id").cast("float"), F.lit(1.0).cast("float")).alias(
            "vec"
        ),
        F.lit(0).alias("__bucket"),
    )
    with pytest.raises(ValueError, match=r"lsh_bucket_topk.*__bucket"):
        lsh_bucket_topk(vecs, "vec", [1.0, 0.0], k=2)
    with pytest.raises(ValueError, match=r"ivf_topk.*__vv"):
        ivf_topk(
            vecs.drop("__bucket").withColumn("__vv", F.lit(0.0)),
            "vec",
            [1.0, 0.0],
            k=2,
            n_clusters=2,
            centroids=[[0.0, 1.0], [1.0, 0.0]],
        )


def test_bm25_topk_refuses_tfs(spark):
    # __tfs is bm25's one withColumn-on-caller scratch site; currently
    # overwritten-before-read and never passed through, guarded for
    # uniformity so a widened projection can't reintroduce the class
    # (advice, round 13)
    from data_transform_make_spark.operators.ranking import bm25_topk

    docs = spark.range(3).select(
        F.col("id").alias("doc_id"),
        F.lit("a b c").alias("text"),
        F.lit(0).alias("__tfs"),
    )
    with pytest.raises(ValueError, match=r"bm25_topk.*__tfs"):
        bm25_topk(docs, "doc_id", "text", ["a"], k=2)


def test_stratified_sample_refuses_rn(spark):
    from data_transform_make_spark.plans.training_corpus import (
        stratified_sample,
    )

    docs = spark.range(5).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.lit(7).alias("__rn"),
    )
    with pytest.raises(ValueError, match=r"stratified_sample.*__rn"):
        stratified_sample(docs, 2)


def test_merge_upsert_refuses_tgt_present_and_src_aliases(spark):
    from data_transform_make_spark.sources.sinks import merge_upsert

    target = spark.range(3).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    )
    source = target
    with pytest.raises(ValueError, match=r"merge_upsert.*__tgt_present"):
        merge_upsert(
            target.withColumn("__tgt_present", F.lit(False)), source, ["k"]
        )
    with pytest.raises(ValueError, match=r"merge_upsert.*__src_v"):
        merge_upsert(target.withColumn("__src_v", F.lit(0)), source, ["k"])


def test_write_zordered_refuses_z(spark, tmp_path):
    from data_transform_make_spark.sources.sinks import write_zordered

    df = spark.range(4).select(
        F.col("id").alias("a"), F.col("id").alias("b"), F.lit(0).alias("__z")
    )
    with pytest.raises(ValueError, match=r"write_zordered.*__z"):
        write_zordered(df, str(tmp_path / "z"), ["a", "b"])
    assert not (tmp_path / "z").exists()  # refused BEFORE any write


def test_ingest_refuses_scratch_and_output_names(spark):
    from pyspark.sql import types as T

    from data_transform_make_spark.sources.ingest import ingest_with_reason

    schema = T.StructType([T.StructField("x", T.LongType())])
    raw = spark.createDataFrame(
        [('{"x": 1}', "keepme")], "raw_body string, record string"
    )
    # 'record' is a DOCUMENTED output column, but silently replacing a
    # caller's same-named column is still the silent-loss class
    with pytest.raises(ValueError, match=r"ingest_with_reason.*record"):
        ingest_with_reason(raw, schema)
