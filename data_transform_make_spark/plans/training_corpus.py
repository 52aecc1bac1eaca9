"""End-to-end LLM training-corpus pipeline (SURVEY.md §2.10 composed):

    documents
      -> quality gate          (ta3 score, native expressions)
      -> exact dedup           (ta4 fingerprint, first-id-wins)
      -> near-dup removal      (d2 exact n-gram Jaccard pairs, drop id_b)
      -> deterministic split   (sp1 multiplicative hash)
      -> corpus stats          (docs + tokens per split x lang)

Every stage is an already-tested operator; this plan is their composition —
the shape a real data-curation job has. Scale profile: two map-only stages
(quality, split), one shuffle on the fingerprint (exact dedup), the d2
inverted-index pass (SCALE.md §Dedup), one broadcast-able anti-join (the
near-dup drop set is pairs, i.e. tiny relative to the corpus), and one
final small agg. Nothing quadratic, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint, quality_score, token_count
from ..operators.dedup import ngram_jaccard_pairs

SPLIT_MOD = 4294967296  # 2^32
SPLIT_MULT = 2654435761  # Knuth multiplicative hash constant
# 80% cut as an exact integer LITERAL, reused verbatim by the SQL oracles.
# Never derive it with float arithmetic at a call site: Python
# int(0.8 * 2**32) truncates to ...836 while SQL CAST(0.8 * 4294967296 AS
# BIGINT) rounds to ...837 — an off-by-one that silently flips the split of
# any id landing exactly on the boundary.
SPLIT_TRAIN_CUT = 3435973837


def hash_split(id_col, train_cut: int = SPLIT_TRAIN_CUT):
    """Deterministic train/eval assignment by multiplicative hash (sp1)."""
    return F.when(
        (F.col(id_col) * SPLIT_MULT) % SPLIT_MOD < train_cut,
        "train",
    ).otherwise("eval")


def build_training_corpus(
    docs: DataFrame,
    quality_min: float = 0.66,
    near_dup_threshold: float = 0.2,
    train_cut: int = SPLIT_TRAIN_CUT,
) -> DataFrame:
    """Run the full curation pipeline; returns per-(split, lang) stats."""
    quality = docs.filter(quality_score("text") >= quality_min)

    w = Window.partitionBy(doc_fingerprint("text")).orderBy("doc_id")
    exact = (
        quality.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        # the deduped corpus is consumed twice (shingle pairs + the final
        # anti-join); without materialization Spark re-derives the quality
        # regexes and the fingerprint shuffle per consumer (audited: 4
        # scans of documents). persist() collapses that to one pass — the
        # 100 TB equivalent is checkpointing the deduped corpus to Parquet
        # between the dedup and near-dup stages.
        .persist()
    )

    pairs = ngram_jaccard_pairs(
        exact, "doc_id", "text", shingle_n=3, threshold=near_dup_threshold
    )
    drop_ids = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    kept = exact.join(drop_ids, "doc_id", "left_anti")

    return (
        kept.select(
            hash_split("doc_id", train_cut).alias("split"),
            "lang",
            token_count("text").alias("__tok"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__tok").alias("n_tokens"),
        )
    )
