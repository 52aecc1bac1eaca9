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
    NULL, never NaN and never a fabricated finite score, whenever the
    computation is non-finite anywhere (review, rounds 10+11):

    - One NaN element makes dot and norms NaN, and ±Inf paired with
      Inf makes Inf/Inf = NaN. Spark orders NaN ABOVE every double and
      NaN passes every ``>= threshold`` predicate, so a single corrupt
      embedding would otherwise silently win ALL top-k queries
      (brute/LSH/IVF) and pair with everything in the near-dup
      operators (round 10).
    - A non-finite DENOMINATOR with a finite dot dodges the NaN guard:
      an element like 1e200 squares to Inf in the norm fold while the
      dot stays finite, so ``finite/Inf`` scored 0.0 — a *finite*
      number invented from a corrupt input (round 11). Harmless for
      ranking (0.0 never wins), but the contract says NULL, so a
      non-finite ``denom`` (or a ±Inf ratio, the symmetric overflow in
      ``dot``) is now NULL too.

    NULL does none of the bad things: it sorts last under ``desc`` and
    fails every predicate. For finite inputs with a finite ratio the
    result is bit-identical to the pre-guard fold (same accumulation
    order; the guards only ever route to NULL, never rescale).
    """
    inf = F.lit(float("inf"))
    denom = l2_norm(a) * l2_norm(b)
    sim = dot(a, b) / denom
    non_finite = F.isnan(sim) | (denom == inf) | (sim == inf) | (sim == -inf)
    return F.when(denom == 0, F.lit(None).cast("double")).otherwise(
        F.when(non_finite, F.lit(None).cast("double")).otherwise(sim)
    )
