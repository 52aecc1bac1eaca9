"""Document chunking: fixed-size token windows with overlap (SURVEY.md
§2.10 — the context-window shaping step of an LLM training pipeline:
long documents become ``ceil(n_tokens / stride)`` overlapping chunks,
each at most ``chunk_size`` tokens).

Map-only: tokenization, the start-offset generator (``sequence`` +
``posexplode``) and the ``slice``/``concat_ws`` reassembly are all
codegen'd JVM expressions — no shuffle, no Python, runs at scan speed.
The per-row expansion factor is bounded by n_tokens/stride, and chunk
rows leave the generator already narrow (the token array itself is
never shuffled). At 100 TB this is the cheapest stage of the pipeline;
the input is hash-spread on the doc id first so a handful of giant
input splits cannot pin the map stage to a few tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from .dedup import _spread


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document into overlapping token-window chunks.

    Chunks start at 1-based token offsets 1, 1+stride, 2*stride+1, ...
    while the offset is <= n_tokens; each chunk is the next ``chunk_size``
    tokens (the last chunk is shorter). ``stride < chunk_size`` gives
    ``chunk_size - stride`` tokens of overlap between consecutive chunks.
    Empty/blank documents produce no rows. Returns
    ``(id_col, chunk_idx int, chunk_text, n_tokens)``.
    """
    if stride < 1 or chunk_size < 1:
        raise ValueError("chunk_size and stride must be >= 1")
    toks = tokens(F.col(text_col))
    # <= 0, not == 0: size(NULL array) is -1 under the non-ANSI default,
    # and the otherwise-branch would then evaluate sequence(1, -1, stride)
    # and throw — NULL text must drop rows like empty text does (the
    # DuckDB twin's WHERE len(trim(text)) > 0 drops NULL the same way).
    starts = F.when(
        F.size(toks) <= 0, F.array().cast("array<int>")
    ).otherwise(F.sequence(F.lit(1), F.size(toks), F.lit(stride)))
    # carry the token array through the generator so the trim/lower/regex
    # tokenization runs once per document, not once per emitted chunk
    ex = _spread(df, id_col).select(
        F.col(id_col),
        toks.alias("__toks"),
        F.posexplode(starts).alias("chunk_idx", "__start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start"), chunk_size)
    return ex.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_tokens"),
    )
