"""Raw-ingest stage: sanitize → parse → dead-letter split (SURVEY.md §2.1).

Re-expresses the reference's Express middleware chain (server.js:11-39) as a
set-oriented DataFrame stage:
  * S2 sanitize: strip NUL bytes + trim         (server.js:25)
  * S3 empty-body default: '' -> '{}'           (server.js:27-30)
  * S4 JSON parse with error channel: permissive ``from_json``; rows that
    fail to parse route to a dead-letter DataFrame — the batch twin of the
    HTTP 400 response (server.js:35-38).

The 5 MB request cap (server.js:11) becomes an explicit length filter routed
to the same dead-letter channel.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_BODY_BYTES = 5 * 1024 * 1024  # server.js:11 express.text limit '5mb'


class IngestResult(NamedTuple):
    parsed: DataFrame  # rows with a valid ``record`` struct column
    dead_letter: DataFrame  # rows rejected (oversize / unparseable) + reason


def sanitize_body(df: DataFrame, body_col: str = "raw_body") -> DataFrame:
    """NUL-strip + trim + empty->'{}' (server.js:25,27-30)."""
    c = F.col(body_col)
    cleaned = F.trim(F.regexp_replace(c, "\\x00", ""))
    defaulted = F.when(F.length(cleaned) == 0, F.lit("{}")).otherwise(cleaned)
    return df.withColumn(body_col, defaulted)


def parse_with_dead_letter(
    df: DataFrame, schema: T.StructType, body_col: str = "raw_body"
) -> IngestResult:
    """Permissive JSON parse; malformed or oversize rows -> dead letter.

    ``from_json`` returns NULL on malformed input (PERMISSIVE), which is the
    error channel: NULL parse on a non-null body = the 400 path. Oversize
    bodies (> 5 MB) are rejected before parsing, mirroring express.text's
    limit. Both legs derive from one cached scan — no double read.
    """
    sanitized = sanitize_body(df, body_col)
    oversize = F.octet_length(F.col(body_col)) > MAX_BODY_BYTES
    parsed_col = F.from_json(F.col(body_col), schema)
    staged = sanitized.withColumn("__oversize", oversize).withColumn("record", parsed_col)
    good = staged.filter(~F.col("__oversize") & F.col("record").isNotNull()).drop("__oversize")
    dead = (
        staged.filter(F.col("__oversize") | F.col("record").isNull())
        .withColumn(
            "reject_reason",
            F.when(F.col("__oversize"), F.lit("payload_too_large")).otherwise(
                F.lit("invalid_json")
            ),
        )
        .drop("record", "__oversize")
    )
    return IngestResult(parsed=good, dead_letter=dead)
