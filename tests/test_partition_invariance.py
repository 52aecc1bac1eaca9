"""Partition-invariance certification: the engine's docstrings claim
"deterministic under any partitioning" for every order-sensitive
operator — first-wins winners, float fold orders, prefix rules, ordered
collects. This runs each such corpus query under several
``spark.sql.shuffle.partitions`` settings (runtime-settable) and
requires the COLLECTED ROW SET to be identical — the same invariant the
driver's value-hash enforces, but exercised across physical plans
instead of across engines."""

import pytest

from data_transform_make_spark import corpus

# Queries whose results would drift under a partition-dependent
# implementation: first-wins dedup winners, min-id winners, float
# expression folds, strict-prefix budget admission, ordered collects,
# per-group top-k, window frames.
SENSITIVE = [
    "p4_first_wins_dedup",
    "d1_exact_dedup",
    "par1_paragraph_dedup",
    "pack1_token_budget",
    "agg1_ordered_collect",
    "w2_topk_per_group",
    "bm25_1_query_ranking",
    "lm1_unigram_freq_score",
    "tf1_keyword_topk",
    "dc1_dedup_clusters",
]


def _rows(spark, name, sf_dir):
    df = corpus.queries()[name](spark, sf_dir)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_is_partition_count_invariant(spark, name, sf_dir):
    baseline = None
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for n in ("1", "7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            got = _rows(spark, name, sf_dir)
            if baseline is None:
                baseline = got
                assert baseline, f"{name}: empty result"
            else:
                assert got == baseline, f"{name}: differs at {n} partitions"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
