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

    ``events.ts`` normalizes to TIMESTAMP (LTZ — watermarks and event-time
    windows require it) regardless of how the fixture was written:
    TIMESTAMP(NANOS) parquet (unsupported natively) is read as raw nanos
    (legacy long mode) and truncated to micros — byte-identical to DuckDB's
    truncating read — while a plain ``timestamp[us]`` file is read with NTZ
    inference disabled, so the stored micros land directly as LTZ instants
    **at scan time, with no session-TZ dependence**: under the pinned-UTC
    session this is bit-identical to the previous NTZ→LTZ cast, but a
    caller mutating ``spark.sql.session.timeZone`` between load and action
    can no longer shift the instants (the cast path remains only as a
    fallback for frames built before the conf applies).
    """
    pin_session_conf(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
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
