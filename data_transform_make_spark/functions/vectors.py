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
    """Cosine similarity; NULL when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(None).cast("double")).otherwise(dot(a, b) / denom)
