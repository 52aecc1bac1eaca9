"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real implementation lives in ``data_transform_make_spark``; this module
only re-exports the registry (data_transform_make_spark/corpus.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_transform_make_spark import corpus


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §3.1 restatement) on sf0.001."""
    return corpus.a1_a2_order_counter_deltas(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return corpus.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL twins for every SQL-expressible query above."""
    return corpus.oracle_sql()
