"""Python UDTF surface test (SURVEY.md §2.9)."""

from pyspark.sql import functions as F

from data_transform_make_spark.functions.udtfs import TokenizeUDTF


def test_tokenize_udtf(spark):
    spark.udtf.register("tokenize", TokenizeUDTF)
    out = spark.sql(
        "SELECT t.* FROM (SELECT 'alpha 42 beta' AS s), LATERAL tokenize(s) t"
    ).collect()
    assert [(r.token, r.position, r.is_numeric) for r in out] == [
        ("alpha", 0, False),
        ("42", 1, True),
        ("beta", 2, False),
    ]
