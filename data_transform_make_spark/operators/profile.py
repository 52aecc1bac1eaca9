"""Column profiling / data-quality report (Deequ-style constraint input).

A large-scale ingestion pipeline gates every batch on a profile of the
columns it is about to trust: completeness (null fraction), exact or
approximate distinctness, and value bounds. The reference app has the
same need in miniature — it trusts `Status`, `Inventory Item ID`,
`Quantity` per webhook row (makeRouter.js:34,86-101) and dead-letters
rows that violate them; a profile is the batch-level statement of those
row-level constraints.

Two execution shapes, chosen by ``exact``:

* ``exact=True`` — EXACT distinct counts for any number of columns in
  exactly TWO shuffles, independent of column count: stack the audited
  columns into ``(col_name, val)`` rows (map-only explode of a k-struct
  array), count by ``(col_name, val)`` (map-side combined — a
  low-cardinality status column collapses to ~|distinct| rows per map
  partition before the exchange), then fold the counts per column.
  Never ``count(DISTINCT a), count(DISTINCT b), ...`` in one agg: at k
  distinct-aggregates Catalyst plans an Expand (k× the input rows into
  ONE shuffle); the stacked shape pays the same k× fan-out but combines
  each column's values independently map-side.
* ``exact=False`` — ONE pass: every column's
  ``approx_count_distinct`` (HLL++, mergeable sketch state) sits next to
  its count/min/max in a SINGLE wide aggregate (5k expressions, all
  map-side combined, one scan), and the per-column report rows are an
  explode over the resulting one row — driver-cheap. This is the 100 TB
  default — distinctness is a gate threshold, not an invoice, and the
  sketch's ~2% error is far below any useful threshold; the exact path
  exists because the driver's value-hash oracle needs bit-exact output.

Values are profiled as their ``string`` cast so one report schema covers
heterogeneous columns; min/max are therefore LEXICOGRAPHIC on the cast
(binary/UTF8 collation — identical in Spark and DuckDB). Callers who
need numeric bounds profile the numeric column separately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: list[str], exact: bool = True
) -> DataFrame:
    """One report row per audited column:
    ``(col_name, n_rows, n_nulls, n_distinct, min_val, max_val)``.

    ``n_distinct`` counts non-null distinct values — exact when
    ``exact=True``, HLL++ (±~2%) when ``exact=False``. ``min_val`` /
    ``max_val`` are lexicographic over the string cast, nulls ignored.
    """
    if not cols:
        raise ValueError("profile_columns: need at least one column")
    if len(set(cols)) != len(cols):
        # a duplicated name merges into ONE report row whose counts are
        # silently doubled (both stacked structs share the col_name key)
        dupes = sorted({c for c in cols if cols.count(c) > 1})
        raise ValueError(f"profile_columns: duplicate columns {dupes}")
    if exact:
        stacked = df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("col_name"),
                            F.col(c).cast("string").alias("val"),
                        )
                        for c in cols
                    ]
                )
            ).alias("cv")
        ).select("cv.*")
        counts = stacked.groupBy("col_name", "val").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        report = counts.groupBy("col_name").agg(
            F.sum("cnt").alias("n_rows"),
            F.coalesce(
                F.sum(F.when(F.col("val").isNull(), F.col("cnt"))), F.lit(0)
            ).alias("n_nulls"),
            F.count("val").alias("n_distinct"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
        # contract parity with the approx path: an EMPTY input still
        # yields one row per audited column (n_rows = 0), instead of an
        # empty report that silently loses the "column was audited"
        # signal. The seed is k literal rows joined broadcast — free.
        seed = (
            df.sparkSession.range(1)
            .select(
                F.explode(
                    F.array(*[F.lit(c) for c in cols])
                ).alias("col_name")
            )
        )
        return seed.join(report, "col_name", "left").select(
            "col_name",
            F.coalesce("n_rows", F.lit(0)).cast("long").alias("n_rows"),
            F.coalesce("n_nulls", F.lit(0)).cast("long").alias("n_nulls"),
            F.coalesce("n_distinct", F.lit(0))
            .cast("long")
            .alias("n_distinct"),
            "min_val",
            "max_val",
        )
    # approximate: ONE aggregate computes every column's stats side by
    # side in a single pass (5k aggregate expressions for k columns, all
    # partially combined map-side), yielding ONE wide row; the per-column
    # report rows are then an explode over that single row — driver-cheap,
    # no second scan. (A unionByName of k per-column one-row aggregates
    # reads k times: Catalyst does not fuse scans across union legs.)
    aggs: list = []
    for i, c in enumerate(cols):
        s = F.col(c).cast("string")
        aggs += [
            F.count(F.lit(1)).alias(f"__r{i}"),
            (F.count(F.lit(1)) - F.count(s)).alias(f"__z{i}"),
            F.approx_count_distinct(s).alias(f"__d{i}"),
            F.min(s).alias(f"__mn{i}"),
            F.max(s).alias(f"__mx{i}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"__r{i}").alias("n_rows"),
                F.col(f"__z{i}").alias("n_nulls"),
                F.col(f"__d{i}").alias("n_distinct"),
                F.col(f"__mn{i}").alias("min_val"),
                F.col(f"__mx{i}").alias("max_val"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")
