"""Error bounds for the sketch aggregates (corpus apx1) against exact
values — sketches have no DuckDB oracle, so the tolerance check lives here."""

from pyspark.sql import functions as F

from data_transform_make_spark import corpus
from data_transform_make_spark.sources.loader import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_sketch_aggs_within_tolerance(spark):
    apx = {
        r["o_orderstatus"]: r
        for r in corpus.apx1_sketch_aggs(spark, SF_DIR).collect()
    }
    exact = {
        r["o_orderstatus"]: r
        for r in load_table(spark, SF_DIR, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("customers"),
            F.percentile("o_totalprice", 0.5).alias("median_price"),
        )
        .collect()
    }
    assert set(apx) == set(exact)
    for status, e in exact.items():
        a = apx[status]
        # HLL++ default rsd = 5%; allow 3 sigma
        assert abs(a["apx_customers"] - e["customers"]) <= max(3, 0.15 * e["customers"])
        # t-digest with accuracy 10000 is near-exact at this cardinality
        assert abs(a["apx_median_price"] - e["median_price"]) <= 0.05 * e["median_price"]
