from .expr import let
from .js_compat import default_if_falsy, js_parse_int, js_str_falsy, qty_falsy
from .text import (
    clean_lines,
    compression_ratio,
    doc_fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    shingles,
    stopword_ratio,
    token_count,
    tokens,
    word_count,
)
from .vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "let",
    "clean_lines",
    "compression_ratio",
    "default_if_falsy",
    "js_parse_int",
    "js_str_falsy",
    "qty_falsy",
    "doc_fingerprint",
    "lang_id",
    "punct_ratio",
    "quality_score",
    "shingles",
    "stopword_ratio",
    "token_count",
    "tokens",
    "word_count",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
