"""Skew mitigation: salted aggregation and salted joins (the 100 TB
hot-key path; SURVEY.md §4 'parallelism' row, SCALE.md 'Relational core').

AQE's skew-join splitting handles most cases at runtime; these helpers are
the explicit, plan-level mitigation for the pathological ones (a handful of
keys owning a double-digit percentage of the fact table — e.g. a stop-word
shingle, a null-ish default key, one viral document id).

Semantics are identical to the unsalted forms — tests assert equality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.cols import claim_scratch


def salted_sum(
    df: DataFrame, keys: list[str], value_col: str, n_salt: int = 16
) -> DataFrame:
    """groupBy(keys).sum(value) in two stages: partial sums per
    (keys, salt) spread a hot key over ``n_salt`` reducers, then a final
    combine per keys.

    The salt derives from ``spark_partition_id()`` — deterministic within a
    run, no extra column scan, and already aligned with the map-side
    partials. Decomposable aggregates only (sum/count/min/max).
    """
    if n_salt < 1:
        # % 0 is an ANSI error (NULL salt legacy) — refuse at the boundary
        raise ValueError(f"salted_sum: n_salt must be >= 1, got {n_salt!r}")
    claim_scratch(df, "salted_sum", "__salt", "__partial")
    salt = F.spark_partition_id() % n_salt
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.sum(value_col).alias("__partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias(f"sum_{value_col}"))


def hot_keys(df: DataFrame, key: str, min_count: int) -> list:
    """Keys whose row count exceeds ``min_count`` — the candidates worth
    salting. One aggregate over the key column only (column-pruned scan);
    the result must be small (it is, by definition of 'hot')."""
    if min_count < 1:
        # this is one of the engine's two sanctioned .collect() sites,
        # bounded BY min_count: <= 0 collects every distinct key — an
        # unbounded driver transfer at scale, not a lower threshold
        # (review, round 10)
        raise ValueError(f"hot_keys: min_count must be >= 1, got {min_count!r}")
    rows = df.groupBy(key).count().filter(F.col("count") >= min_count).collect()
    return [r[key] for r in rows]


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    hot: list,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join that splits hot keys onto ``n_salt`` reducers.

    Hot-key rows of the large side get a random salt; the small side's
    hot-key rows are replicated once per salt value (explode of a literal
    range — the small side is small by contract). Cold keys take the plain
    join. Result = plain join, partition profile = flat.

    Large-side-preserving modes only (inner/left/left_semi/left_anti): a
    replicated small-side hot row that finds no large-side match would emit
    ``n_salt`` unmatched rows under right/full outer, diverging from the
    unsalted join. Each large-side row carries exactly one salt, so the
    large-preserving modes are exact.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports large-side-preserving modes only, got {how!r}: "
            "right/full outer would duplicate unmatched replicated small-side rows"
        )
    if n_salt < 1:
        # n_salt=0 would explode an EMPTY salt array on the small side —
        # every hot-key row silently vanishes from the join (review,
        # round 8)
        raise ValueError(f"salted_join: n_salt must be >= 1, got {n_salt!r}")
    if not hot:
        return large.join(small, key, how)
    # NULL-safe split: isin yields NULL (not False) for NULL keys, which
    # both filter(is_hot) and filter(~is_hot) drop — a plain left/left_anti
    # join preserves NULL-key rows, so the split must too. NULL keys never
    # equi-join-match anything, so the cold path is exactly right for them.
    # (A None in `hot` also poisons isin to all-NULL — strip it; NULL keys
    # can't be salted usefully anyway, for the same no-match reason.)
    hot = [h for h in hot if h is not None]
    if not hot:
        return large.join(small, key, how)
    claim_scratch(large, "salted_join(large)", "__salt")
    claim_scratch(small, "salted_join(small)", "__salt")
    is_hot = F.coalesce(F.col(key).isin(hot), F.lit(False))

    large_hot = large.filter(is_hot).withColumn(
        "__salt", (F.rand(seed=42) * n_salt).cast("int")
    )
    small_hot = small.filter(is_hot).withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    hot_joined = large_hot.join(small_hot, [key, "__salt"], how).drop("__salt")

    cold_joined = large.filter(~is_hot).join(small.filter(~is_hot), key, how)
    return hot_joined.unionByName(cold_joined)
