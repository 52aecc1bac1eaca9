"""The load_table schema memo (r20 optimization) — metadata-only caching.

Pins the two properties that make the memo safe:
  * a memoized load returns the identical schema and identical rows as
    the first (inferring) load — including the events ts normalization;
  * the memo key includes (size, mtime_ns): REWRITING the file with a
    different schema is picked up, never served stale.
"""

import os
import time

import pytest

from data_transform_make_spark.sources import loader


def test_memoized_load_identical(spark, tmp_path):
    p = tmp_path / "t.parquet"
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, s string"
    ).coalesce(1).write.mode("overwrite").parquet(str(p))
    first = loader.load_table(spark, str(tmp_path), "t")
    key = [k for k in loader._SCHEMA_MEMO if k[0].endswith("t.parquet")]
    assert key, "first load must populate the memo"
    second = loader.load_table(spark, str(tmp_path), "t")
    assert second.schema == first.schema
    assert sorted(map(tuple, second.collect())) == sorted(
        map(tuple, first.collect())
    ) == [(1, "a"), (2, "b")]


def test_rewritten_file_reinfers(spark, tmp_path):
    p = tmp_path / "t.parquet"
    spark.createDataFrame([(1,)], "id long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(p))
    a = loader.load_table(spark, str(tmp_path), "t")
    assert [f.name for f in a.schema.fields] == ["id"]
    # rewrite with a DIFFERENT schema; ensure mtime_ns moves even on
    # coarse filesystems
    time.sleep(0.02)
    spark.createDataFrame([(1, "x")], "id long, extra string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(p))
    b = loader.load_table(spark, str(tmp_path), "t")
    assert [f.name for f in b.schema.fields] == ["id", "extra"]
    assert b.collect()[0]["extra"] == "x"


def test_events_ts_normalization_survives_memo(spark):
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.exists(os.path.join(sf, "events.parquet")):
        pytest.skip("fixture dir missing")
    a = loader.load_table(spark, sf, "events")
    b = loader.load_table(spark, sf, "events")  # memo hit
    assert a.schema == b.schema
    assert dict(a.dtypes)["ts"] == "timestamp"
    ra = sorted(map(repr, a.orderBy("event_id").limit(20).collect()))
    rb = sorted(map(repr, b.orderBy("event_id").limit(20).collect()))
    assert ra == rb
