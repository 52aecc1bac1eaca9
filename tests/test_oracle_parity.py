"""Local mirror of the driver's oracle-differential check (SURVEY.md §5.1):
run every corpus query on Spark at sf0.001 AND its DuckDB SQL twin over the
same parquet, compare row count + column names + order-insensitive values.

This is the pre-flight for CORRECTNESS_r{N}.json — if this passes, the
driver's sf0.01 gate should too.
"""

import math

import duckdb
import pytest

from data_transform_make_spark import corpus
from data_transform_make_spark.sources.loader import TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return v


def _rowset(rows):
    # repr-keyed sort: None/mixed types (ROLLUP NULLs) stay comparable
    return sorted((tuple(_norm(v) for v in r) for r in rows), key=repr)


ORACLE_NAMES = sorted(corpus.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, name):
    q = corpus.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(corpus.oracle_sql()[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert spark_cols == duck_cols, f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s, d = _rowset(spark_rows), _rowset(duck_rows)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


NO_ORACLE = sorted(set(corpus.queries()) - set(corpus.oracle_sql()))


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only_queries_run(spark, name):
    df = corpus.queries()[name](spark, SF_DIR)
    assert df.count() >= 0  # runs without error; semantics tested elsewhere


def test_events_ts_independent_of_session_tz_mutation(spark):
    """ADVICE.md regression: the events.ts instants must not shift if a
    caller mutates spark.sql.session.timeZone between load_table and the
    action (the scan now lands LTZ instants directly — no lazy NTZ cast
    resolving against the action-time session TZ)."""
    from data_transform_make_spark.sources.loader import load_table

    df = load_table(spark, SF_DIR, "events")
    baseline = df.selectExpr("min(unix_micros(ts)) AS m").first()["m"]
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        shifted = df.selectExpr("min(unix_micros(ts)) AS m").first()["m"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert shifted == baseline
