"""Table loader for the driver-generated Parquet fixtures (TESTDATA.md).

Parquet scans are the engine's default source: columnar, predicate-pushdown,
column-pruned by Catalyst. Loading is lazy — a ``load_table`` is just a scan
node until an action runs, so queries that project 2 columns read 2 columns
(``.explain`` shows ReadSchema), which is the behavior that matters at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..session import pin_session_conf

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy Parquet scan of one fixture table.

    ``events.ts`` normalizes to session-TZ TIMESTAMP regardless of how the
    fixture was written: TIMESTAMP(NANOS) parquet (unsupported natively) is
    read as raw nanos (legacy long mode) and truncated to micros —
    byte-identical to DuckDB's truncating read — while a plain
    ``timestamp[us]`` file (read as TIMESTAMP_NTZ) is cast to TIMESTAMP.
    The session TZ is pinned to UTC, so the NTZ→LTZ cast preserves the
    wall-clock micros and both engines see the same instants; watermarks
    and event-time windows require the LTZ type.
    """
    pin_session_conf(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    from pyspark.sql import functions as F  # local import keeps module load light
    from pyspark.sql import types as T

    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif field.name == "ts" and isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Register fixture tables as temp views so callers can query the
    engine in plain SQL (``spark.sql(...)``) — the same names the DuckDB
    oracle registers, so dialect-common SQL runs verbatim on both engines.
    Pass ``tables`` to register only what the query touches (skips the
    other parquet footer reads on hot paths)."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
