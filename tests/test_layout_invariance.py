"""Input-layout invariance certification (round 14).

tests/test_partition_invariance.py varies ``shuffle.partitions``; this
varies the SCAN side — the same fixture rewritten as 32-file datasets
(different file count, different row order within files), which is the
axis the r13/r14 layout probes varied for timing. An order-sensitive
defect that happens to be stable under one file layout (first-wins
winners picked by scan order, float folds accumulating in file order,
prefix-budget admission) drifts here instead of in production. The
collected row set must be IDENTICAL across layouts — the same invariant
the driver's value-hash enforces, exercised across physical input
layouts instead of across engines.
"""

import os

import pytest

from data_transform_make_spark import corpus

# the partition-invariance sensitive set: first-wins winners, min-id
# winners, float folds, prefix budgets, ordered collects, top-k, CC
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


@pytest.fixture(scope="module")
def split_dir(spark, sf_dir, tmp_path_factory):
    """Every fixture table rewritten as a 32-file dataset (round-robin
    repartition scrambles row-to-file assignment AND intra-file order)."""
    dst = str(tmp_path_factory.mktemp("split32"))
    for entry in os.listdir(sf_dir):
        if entry.endswith(".parquet"):
            (
                spark.read.parquet(os.path.join(sf_dir, entry))
                .repartition(32)
                .write.parquet(os.path.join(dst, entry))
            )
    return dst


def _rows(spark, name, d):
    return sorted(tuple(r) for r in corpus.queries()[name](spark, d).collect())


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_is_input_layout_invariant(spark, sf_dir, split_dir, name):
    base = _rows(spark, name, sf_dir)
    assert base, f"{name}: empty result"
    got = _rows(spark, name, split_dir)
    assert got == base, f"{name}: result drifts with the input file layout"
