from .dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    first_wins_dedup,
    keep_min_by,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    paragraph_dedup,
    simhash64,
)
from .diff import snapshot_diff, snapshot_diff_summary
from .graph import connected_components
from .joins import as_of_join, lookup_join, range_join
from .profile import profile_columns
from .ranking import bm25_topk
from .similarity import brute_force_topk, ivf_topk, lsh_bucket_topk
from .windows import sessionize, top_k_per_group

__all__ = [
    "embedding_near_dup_pairs",
    "exact_dedup",
    "first_wins_dedup",
    "keep_min_by",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "paragraph_dedup",
    "simhash64",
    "snapshot_diff",
    "snapshot_diff_summary",
    "connected_components",
    "as_of_join",
    "lookup_join",
    "range_join",
    "profile_columns",
    "bm25_topk",
    "brute_force_topk",
    "ivf_topk",
    "lsh_bucket_topk",
    "sessionize",
    "top_k_per_group",
]
