"""Proof of the co-located-join technique (SCALE.md 'Global posture'):
two tables bucketed and sorted on the join key join WITHOUT a shuffle —
no Exchange in the physical plan. At 100 TB this is the difference
between re-shuffling both fact tables per join and reading co-located
buckets; bucket the big tables once at write time, join for free after.
"""

import pytest
from pyspark.sql import functions as F

from data_transform_make_spark.sources.loader import load_table


@pytest.fixture()
def bucketed_tables(spark, sf_dir, tmp_path):
    # external tables under tmp_path (warehouse.dir is a static conf and
    # the default would land inside the repo)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    (
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", str(tmp_path / "orders_b"))
        .mode("overwrite").saveAsTable("orders_b")
    )
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", str(tmp_path / "lineitem_b"))
        .mode("overwrite").saveAsTable("lineitem_b")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    ob = spark.table("orders_b")
    lb = spark.table("lineitem_b")
    joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy("o_custkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    # Disable broadcast so the join must pick a shuffle-or-colocated plan.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined.collect()
        from data_transform_make_spark.functions.expr import executed_plan

        plan = executed_plan(joined)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    join_section = plan.split("Aggregate")[0]
    # The join itself reads co-located buckets: no Exchange feeds it.
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_section, join_section

    # Same result as the plain (shuffled) join over the raw tables.
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    want = {
        (r.o_custkey, float(r.qty))
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .collect()
    }
    got = {(r.o_custkey, float(r.qty)) for r in joined.collect()}
    assert got == want
