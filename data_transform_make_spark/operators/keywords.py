"""Per-document keyword extraction (SURVEY.md §2.10 — the feature side of
a training-data pipeline: per-doc salient terms for routing, domain
mixing, and topic-balance dashboards).

Score: tf/df — term frequency in the document over the term's corpus
document frequency. This keeps the classic tf-idf ORDERING intent (rare
terms with many in-doc occurrences win) while staying bit-exact across
engines: a real ``tf * ln(N/df)`` puts a transcendental in the output and
libm rounding is not guaranteed identical between the JVM and DuckDB; a
ratio of two integers is exact IEEE on both (the corpus header's
"integer-derived double division only" rule). The ranking is totally
ordered (score desc, term asc) so row picks can never diverge.

Scale shape (100 TB): ONE corpus scan — explode + groupBy(doc, term)
shuffle for tf (map-side combined), then df as a count over a
term-partitioned WINDOW on the tf table (one shuffle keyed on the term)
instead of a separate aggregate + self-join, which would re-derive the
whole tf subtree including a second scan (audited: the join shape showed
scans=2); finally one per-doc window for the top-k. Nothing driver-side,
nothing quadratic; the k cap bounds output to k rows per document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from .dedup import _spread


def tfidf_topk_terms(
    docs: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-k terms per document by the exact tf/df score.

    Returns (id_col, term, score, rnk) with rnk in 1..k; ties broken by
    term ascending (total order — cross-engine stable).
    """
    if k < 1:
        # the nprobe/radius class (round 9): top-0 terms is a
        # silently-empty result, not a cheaper query
        raise ValueError(f"tfidf_topk_terms: k must be >= 1, got {k!r}")
    tok = _spread(docs, id_col).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("__tf"))
    w_term = Window.partitionBy("term")
    scored = tf.select(
        F.col(id_col),
        F.col("term"),
        (
            F.col("__tf").cast("double")
            / F.count("*").over(w_term).cast("double")
        ).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        # long, not int: DuckDB's row_number() is BIGINT — the width
        # hazard check_queries flagged on tf1 (r14); values were always
        # equal, the widths now are too
        .select(id_col, "term", "score", F.col("rnk").cast("long").alias("rnk"))
    )


def unigram_rarity_score(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document unigram corpus-frequency score — the transcendental-
    free core of CCNet-style LM quality filtering (documents whose tokens
    are corpus-typical score high; rare-token soup — OCR noise, codes,
    boilerplate IDs — scores low). True unigram perplexity is
    ``exp(-avg ln p(t))``; this keeps the SAME plan shape with the
    monotone-equivalent-in-spirit integer form ``sum(count(t)) /
    (n_tokens * total_tokens)`` (the arithmetic mean of token corpus
    frequencies), because a ``ln`` in the OUTPUT is last-ulp
    engine-dependent (JVM Math.log vs libm) while a ratio of integers is
    exact IEEE on both engines — swap the final projection to
    ``avg(ln(cnt/total))`` on a real deployment if true ppl is wanted.

    Scale shape (100 TB): one vocabulary groupBy over the exploded table
    (map-side combined — a stopword's billions of occurrences partial-
    aggregate per partition; a token-partitioned WINDOW here would have
    NO partial aggregation and concentrate every 'the' occurrence on one
    task, review round 6), then the per-doc pass re-joins tokens to the
    ~|vocab| aggregate keyed on the token (AQE broadcasts it — the probe
    side stays map-only, so hot tokens cannot skew a shuffle); the
    global token total derives from the tiny vocabulary frame and is
    attached by a 1-row broadcast cross join — THE scalable
    global-scalar pattern (whitelisted in the plan audit alongside n1's
    literal query row). Costs one extra corpus traversal vs a window
    form; skew-safety wins at scale. Nothing driver-side.
    Returns ``(id_col, n_tokens, sum_cnt, score)``; docs with no tokens
    are excluded (no tokens -> no frequency evidence). The score divides
    DOUBLE-cast factors — n_tokens * total as int64 overflows at the
    design point (~1e13 corpus tokens x a book-length doc).
    """
    tok = _spread(docs, id_col).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__t")
    )
    vocab = tok.groupBy("__t").agg(F.count("*").alias("__cnt"))
    total = vocab.agg(F.sum("__cnt").cast("long").alias("__total"))
    per_doc = (
        tok.join(vocab, "__t")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("__cnt").alias("sum_cnt"),
        )
    )
    return per_doc.crossJoin(F.broadcast(total)).select(
        F.col(id_col),
        "n_tokens",
        "sum_cnt",
        (
            F.col("sum_cnt").cast("double")
            / (
                F.col("n_tokens").cast("double")
                * F.col("__total").cast("double")
            )
        ).alias("score"),
    )
