from .dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    first_wins_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
)
from .joins import as_of_join, lookup_join, range_join
from .similarity import brute_force_topk, lsh_bucket_topk
from .windows import sessionize, top_k_per_group

__all__ = [
    "embedding_near_dup_pairs",
    "exact_dedup",
    "first_wins_dedup",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash64",
    "as_of_join",
    "lookup_join",
    "range_join",
    "brute_force_topk",
    "lsh_bucket_topk",
    "sessionize",
    "top_k_per_group",
]
