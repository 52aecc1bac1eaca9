"""Golden test for transformToSimpleRecords + combineEmbroideryInfo
(makeRouter.js:40-75) — byte-exact text blob, `|| ""` defaults, casts."""

import pyspark.sql.types as T

from data_transform_make_spark.plans.ingest_shaper import transform_to_simple_records

META_ENTRY = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("scalar", T.StringType()),
        T.StructField("group", T.MapType(T.StringType(), T.StringType())),
    ]
)
ITEM = T.StructType(
    [
        T.StructField("productId", T.StringType()),
        T.StructField("Name", T.StringType()),
        T.StructField("Quantity", T.LongType()),
        T.StructField("Subtotal", T.DoubleType()),
        T.StructField("Total", T.DoubleType()),
        T.StructField("MetaData", T.ArrayType(META_ENTRY)),
    ]
)
SCHEMA = T.StructType([T.StructField("order", T.ArrayType(ITEM))])


def test_transform_to_simple_records(spark):
    meta = [
        ("Color Selection", "Red", None),
        ("Wheel Type", "", None),               # falsy scalar -> "" default
        ("Embroidery Front", None, {"Position": "Front", "Text": "ACME", "Font": "No"}),
        ("Embroidery Back", None, {"Position": "Back", "Thread": "Gold"}),
        ("Not A Group", None, {"Size": "L"}),   # no Position -> excluded
    ]
    rows = [([("P1", "Tote", 2, 10.5, 21.0, meta), ("P2", "Mini", 1, 3.0, 3.0, [])],)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = transform_to_simple_records(df).orderBy("line_no").collect()
    r0, r1 = out

    assert r0.product_id == "P1"
    assert r0.bag_lookup_website == "P1 - Red"
    assert r0.bag_color_website == "Red"
    assert r0.qty_website == "2"
    assert r0.rate_website == 10.5
    assert r0.total_website == 21.0
    assert r0.wheel_option_website == ""  # '' || '' -> ''
    assert r0.logo_website == ""          # missing key -> ''
    # combineEmbroideryInfo: groups in insertion order, 'No' values skipped,
    # blank line between groups, trimmed.
    expected = (
        "Embroidery Front:\n"
        "  Position: Front\n"
        "  Text: ACME\n"
        "\n"
        "Embroidery Back:\n"
        "  Position: Back\n"
        "  Thread: Gold"
    )
    assert r0.order_details_website == expected

    assert r1.product_id == "P2"
    assert r1.bag_color_website == ""
    assert r1.order_details_website == ""
    assert r1.qty_website == "1"
