"""Snapshot diff: CDC-style classification of two corpus versions.

Every periodically-rebuilt dataset needs the delta between yesterday's
snapshot and today's — which records appeared, vanished, or changed —
both as the audit artifact ("this crawl replaced 3% of the corpus") and
as the input to incremental downstream work (re-embed only `added` +
`changed`). The reference computes exactly this classification per row,
online: its PUT-vs-POST upsert split (makeRouter.js:86-101) decides
added-vs-changed one record at a time; this operator is the same
decision as one set-at-a-time join.

Execution shape (the 100 TB design point):

  * Each side is first projected to ``(id, sha2(content))`` — map-only,
    so the wide content columns never enter the shuffle; the join moves
    ~48 bytes/row regardless of document size.
  * One full-outer hash join on the id — the single unavoidable shuffle.
    Both sides shuffle on the same key, so on a real deployment bucketing
    the snapshots by id at write time makes the diff exchange-free; with
    AQE the join also skew-splits if one id floods (ids are unique per
    side here, so only pathological inputs skew).
  * Status is a null-pattern CASE over the two hash columns — no second
    pass, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F



def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    content_cols: list[str],
) -> DataFrame:
    """Classify every id across two snapshots.

    Output: ``(id, status)`` with status in ``added`` (new only),
    ``removed`` (old only), ``changed`` (both, content hash differs),
    ``unchanged``. Content equality is sha2-256 over the concatenation of
    PER-COLUMN DIGESTS: each column contributes exactly 64 hex chars —
    ``sha2(value)`` or the all-zeros sentinel for NULL — so the encoding
    is injective for ANY byte content. (Separator-joined raw values are
    not: ``concat_ws`` skips NULLs, conflating ``NULL`` with ``''`` and
    letting values shift across columns; and a value CONTAINING the
    separator can realign field boundaries — crawled text routinely
    carries C0 control bytes. Fixed-width digests close both holes; the
    NULL sentinel is distinguishable from every real digest up to a
    2^-256 collision.)

    ``id_col`` must uniquely identify rows WITHIN each snapshot — the
    engine-wide id-join contract. Duplicate ids are a SILENT-corruption
    mode (the paragraph_dedup class, r13): the full-outer join fans out
    m x n rows per duplicated id, so one id contributes several status
    rows and the summary counts inflate quietly; a NULL id never joins,
    so a NULL-id row in each snapshot reports one ``added`` PLUS one
    ``removed`` instead of one ``changed``/``unchanged``. Callers who
    cannot vouch for uniqueness should dedup each side first
    (``keep_min_by`` on the id — one shuffle, explicit winner).
    """
    if not content_cols:
        raise ValueError("snapshot_diff: need at least one content column")

    from pyspark.sql import types as T

    def _enc(df: DataFrame, c: str):
        # per-type injective byte encoding (review, round 9): a plain
        # cast("string") renders array<string> WITHOUT element quoting,
        # so ["1, 2"] and ["1", "2"] both print "[1, 2]" — two different
        # values, one digest, a changed record silently classified
        # unchanged. Nested types go through to_json (escaped, injective
        # for JSON-representable values); binary hashes its raw bytes
        # (the string cast is lossy on non-UTF-8); atomics keep the cast.
        dt = df.schema[c].dataType
        if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
            col = F.to_json(F.col(c))
        elif isinstance(dt, T.BinaryType):
            col = F.col(c)
        else:
            col = F.col(c).cast("string")
        return F.coalesce(F.sha2(col, 256), F.lit("0" * 64))

    def _h(df: DataFrame, alias: str) -> DataFrame:
        return df.select(
            id_col,
            F.sha2(F.concat(*[_enc(df, c) for c in content_cols]), 256).alias(
                alias
            ),
        )

    j = _h(old, "__h_old").join(_h(new, "__h_new"), id_col, "full_outer")
    status = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(id_col, status.alias("status"))


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    content_cols: list[str],
) -> DataFrame:
    """The four-row audit summary: ``(status, n)`` counts."""
    return (
        snapshot_diff(old, new, id_col, content_cols)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )
