"""Similarity search over embedding columns (SURVEY.md §2.10).

Three tiers:
  * ``brute_force_topk`` — exact cosine top-k: a map-only score pass plus a
    global top-k (``orderBy + limit`` compiles to TakeOrderedAndProject —
    per-partition heaps, no full sort, no full shuffle). The correct
    baseline, linear in rows.
  * ``lsh_bucket_topk`` — random-hyperplane LSH: deterministic signed
    projections bucket the vectors; only the query's bucket (and optionally
    multi-probe neighbors) is scored. Sub-linear scan at the cost of recall.
  * ``ivf_topk`` — inverted-file index: KMeans centroids (trained once,
    seeded) partition the corpus into posting lists; a query probes only the
    ``nprobe`` nearest lists. Cluster assignment is a pure JVM argmin
    expression over broadcast centroid literals — no Python in the scan
    path. At 100 TB: train on a sample, write the corpus
    ``partitionBy("ivf_cluster")``, and the probe filter becomes partition
    pruning at the parquet scan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cols import claim_scratch
from ..functions.vectors import cosine_similarity


def _query_vec_col(query_vec: list[float]):
    return F.array(*[F.lit(float(x)) for x in query_vec])


def _check_k(k: int, where: str) -> None:
    # the nprobe/radius/centroid class (round 9): a degenerate k is a
    # silently-empty result masquerading as a cheaper query — refuse it
    # at the boundary across every top-k operator (round 10 sweep)
    if k < 1:
        raise ValueError(f"{where}: k must be >= 1, got {k!r}")


def brute_force_topk(
    df: DataFrame,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    id_col: str | None = None,
) -> DataFrame:
    """Exact top-k rows by cosine similarity to a literal query vector.

    Adds a ``cosine`` column; returns the k most similar rows, most similar
    first. TakeOrderedAndProject keeps this one pass + driver-side k-merge.
    ``id_col`` is the deterministic tie-break for equal cosines (defaults
    to the frame's first column — pass it explicitly when that is not the
    row id).
    """
    _check_k(k, "brute_force_topk")
    scored = df.withColumn("cosine", cosine_similarity(F.col(vec_col), _query_vec_col(query_vec)))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col or df.columns[0])).limit(k)


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
    """Bit-pack sign(v·h_i) into a long bucket id — a JVM-side expression.

    At most 63 planes (review, round 9): Java ``shiftleft`` wraps its
    shift amount mod 64, so bit 64+ would silently ALIAS onto low bits —
    wrong buckets, wrong Hamming distances, near-dup pairs one bit apart
    silently missed (and bit 63 is excluded too: a query-side bucket
    with the sign bit set cannot be injected as a long literal). This
    caps every hyperplane-LSH caller (lsh_bucket_topk,
    dedup.embedding_near_dup_pairs_lsh) at the one central chokepoint.
    """
    if len(planes) > 63:
        raise ValueError(
            f"hyperplane_bucket: at most 63 planes fit a signed long "
            f"bucket, got {len(planes)} (bit 64+ would silently alias "
            "onto low bits)"
        )
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
    id_col: str | None = None,
) -> DataFrame:
    """Approximate top-k: score only vectors whose hyperplane bucket is
    within ``multiprobe_hamming`` bits of the query's bucket.
    ``id_col``: deterministic tie-break column (default: first column).

    At scale, persist the corpus partitioned by bucket (``repartition(
    "bucket").write.partitionBy("bucket")``) so a query prunes partitions at
    the scan — this function expresses the same plan on an unpartitioned df
    (the bucket filter still prunes before any cosine math runs).
    """
    _check_k(k, "lsh_bucket_topk")
    if multiprobe_hamming < 0:
        raise ValueError(
            f"lsh_bucket_topk: multiprobe_hamming must be >= 0, got "
            f"{multiprobe_hamming} (a negative radius matches NO bucket — "
            "silently empty results, not a smaller probe)"
        )
    claim_scratch(df, "lsh_bucket_topk", "__bucket")
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
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col or df.columns[0])).limit(k).drop("__bucket")


def train_ivf_centroids(
    df: DataFrame, vec_col: str, n_clusters: int = 16, seed: int = 42
) -> list[list[float]]:
    """KMeans centroids over the embedding column (spark.ml, seeded).

    At 100 TB train on a bounded sample (``df.sample(...)``) — centroid
    quality converges long before the full corpus is seen; the returned
    centroids are a driver-side list small enough to broadcast as literals.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=n_clusters, seed=seed, initMode="k-means||").fit(feats)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def assign_ivf_cluster(vec_col, centroids: list[list[float]], vv=None):
    """Nearest-centroid id as a JVM expression: per-centroid squared L2
    distance, argmin via array_min over (dist, idx) structs. Codegen'd,
    map-only — the scan path stays Python-free.

    ``vv``: an optional precomputed ``dot(vec, vec)`` COLUMN. The vv term
    is centroid-independent, but HOF folds are interpreted with no
    cross-reference CSE, so inlining it re-runs one full array fold PER
    CENTROID (K extra traversals per row). Callers on a hot path should
    materialize it once (``withColumn("__vv", dot(v, v))``) and pass the
    attribute — bit-identical distances (same expression, evaluated once;
    measured −11% on a 16-centroid assignment over 50k rows, identical
    assignments, SCALE.md round 11). Default ``None`` keeps the
    self-contained single-Column form."""
    from ..functions.vectors import dot

    if not centroids:
        raise ValueError(
            "assign_ivf_cluster: centroids is empty — array_min over zero "
            "candidates is NULL, so every row would silently assign to no "
            "cluster and every probe would return empty"
        )
    if vv is None:
        vv = dot(vec_col, vec_col)

    def sq_dist(c: list[float]):
        cc = F.array(*[F.lit(x) for x in c])
        diff_dot = vv - 2 * dot(vec_col, cc) + sum(x * x for x in c)
        return diff_dot

    scored = F.array(
        *[
            F.struct(sq_dist(c).alias("dist"), F.lit(i).alias("idx"))
            for i, c in enumerate(centroids)
        ]
    )
    return F.array_min(scored)["idx"]


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """Approximate top-k cosine neighbors via an IVF probe.

    Build (once per corpus): centroids + per-row cluster assignment. Query:
    rank centroids by distance to the query driver-side, keep the ``nprobe``
    nearest, score cosine only inside those posting lists. The probe filter
    is a plain ``isin`` predicate — on a corpus written
    ``partitionBy("ivf_cluster")`` it prunes partitions at the scan.
    ``id_col``: deterministic tie-break column (default: first column).
    """
    _check_k(k, "ivf_topk")
    if nprobe < 1:
        raise ValueError(
            f"ivf_topk: nprobe must be >= 1, got {nprobe} (zero posting "
            "lists probed is a silently-empty result, not a cheaper query)"
        )
    if centroids is None:
        centroids = train_ivf_centroids(df, vec_col, n_clusters, seed)

    def q_sq_dist(c: list[float]) -> float:
        return sum((a - b) * (a - b) for a, b in zip(query_vec, c))

    probe = sorted(range(len(centroids)), key=lambda i: q_sq_dist(centroids[i]))[:nprobe]
    from ..functions.vectors import dot

    claim_scratch(df, "ivf_topk", "__vv", "__cluster")
    # materialize dot(v, v) once per row, then assign against the
    # attribute — K fewer interpreted array folds per row (see
    # assign_ivf_cluster's vv parameter)
    assigned = df.withColumn(
        "__vv", dot(F.col(vec_col), F.col(vec_col))
    ).withColumn(
        "__cluster",
        assign_ivf_cluster(F.col(vec_col), centroids, vv=F.col("__vv")),
    )
    cand = assigned.filter(F.col("__cluster").isin(probe))
    scored = cand.withColumn(
        "cosine", cosine_similarity(F.col(vec_col), _query_vec_col(query_vec))
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col or df.columns[0])).limit(k).drop("__cluster", "__vv")
