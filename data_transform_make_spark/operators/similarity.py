"""Similarity search over embedding columns (SURVEY.md §2.10).

Two tiers:
  * ``brute_force_topk`` — exact cosine top-k: a map-only score pass plus a
    global top-k (``orderBy + limit`` compiles to TakeOrderedAndProject —
    per-partition heaps, no full sort, no full shuffle). The correct
    baseline, linear in rows.
  * ``lsh_bucket_topk`` — random-hyperplane LSH: deterministic signed
    projections bucket the vectors; only the query's bucket (and optionally
    multi-probe neighbors) is scored. Sub-linear scan at the cost of recall;
    the scale path for 100 TB corpora.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity


def _query_vec_col(query_vec: list[float]):
    return F.array(*[F.lit(float(x)) for x in query_vec])


def brute_force_topk(
    df: DataFrame, vec_col: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact top-k rows by cosine similarity to a literal query vector.

    Adds a ``cosine`` column; returns the k most similar rows, most similar
    first. TakeOrderedAndProject keeps this one pass + driver-side k-merge.
    """
    scored = df.withColumn("cosine", cosine_similarity(F.col(vec_col), _query_vec_col(query_vec)))
    return scored.orderBy(F.col("cosine").desc(), F.col(df.columns[0])).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure python, seeded)."""
    import random

    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / norm for x in v])
    return planes


def hyperplane_bucket(vec_col, planes: list[list[float]]):
    """Bit-pack sign(v·h_i) into a long bucket id — a JVM-side expression."""
    from ..functions.vectors import dot

    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = dot(vec_col, F.array(*[F.lit(x) for x in plane]))
        bit = F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(bit)
    return bucket


def lsh_bucket_topk(
    df: DataFrame,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors whose hyperplane bucket is
    within ``multiprobe_hamming`` bits of the query's bucket.

    At scale, persist the corpus partitioned by bucket (``repartition(
    "bucket").write.partitionBy("bucket")``) so a query prunes partitions at
    the scan — this function expresses the same plan on an unpartitioned df
    (the bucket filter still prunes before any cosine math runs).
    """
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    bucketed = df.withColumn("__bucket", hyperplane_bucket(F.col(vec_col), planes))
    qbits = 0
    for i, plane in enumerate(planes):
        proj = sum(float(a) * b for a, b in zip(query_vec, plane))
        if proj >= 0:
            qbits |= 1 << i
    probe = F.bit_count(F.col("__bucket").bitwiseXOR(F.lit(qbits).cast("long"))) <= multiprobe_hamming
    cand = bucketed.filter(probe)
    scored = cand.withColumn("cosine", cosine_similarity(F.col(vec_col), _query_vec_col(query_vec)))
    return scored.orderBy(F.col("cosine").desc(), F.col(df.columns[0])).limit(k).drop("__bucket")
