"""Vector math over ``array<float>`` embedding columns (SURVEY.md §2.10).

Built-in higher-order functions (``zip_with`` + ``aggregate``) keep the dot
product JVM-side — no Python, no UDF serialization — so brute-force scoring
runs at scan speed and scales linearly with partitions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product. MISMATCHED lengths yield NULL, not a truncated
    product: ``zip_with`` pads the shorter array with NULL, the padded
    product is NULL, and the fold propagates it — so a malformed vector
    can never contribute a silently-wrong partial score (in top-k
    consumers the NULL cosine ranks last; it never outranks a real one).
    """
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    sq = F.aggregate(
        _c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm — and
    NULL, never NaN, when any element is non-finite (review, round 10):
    one NaN element makes dot and norms NaN, and one ±Inf element makes
    the ratio Inf/Inf = NaN. Spark orders NaN ABOVE every double and NaN
    passes every ``>= threshold`` predicate, so a single corrupt
    embedding would otherwise silently win ALL top-k queries
    (brute/LSH/IVF) and pair with everything in the near-dup operators.
    NULL does neither: it sorts last under ``desc`` and fails predicates.
    """
    denom = l2_norm(a) * l2_norm(b)
    sim = dot(a, b) / denom
    return F.when(denom == 0, F.lit(None).cast("double")).otherwise(
        F.when(F.isnan(sim), F.lit(None).cast("double")).otherwise(sim)
    )
