"""Zero-cost pipeline metrics via ``DataFrame.observe`` (SURVEY §2.1 S8).

The reference logs per-request processing stats to the console
(server.js:16, makeRouter.js:139,147,163,...) — its only observability.
The engine's equivalent must not cost a second scan: ``df.observe``
attaches aggregate METRICS TO THE PLAN, computed as a by-product of
whatever action the caller already runs — rows in, dead-letter counts,
bytes — and surfaced through a named :class:`~pyspark.sql.Observation`
(batch — :func:`observe_counts`) or, on streaming queries, through the
NAME-based ``df.observe(name, ...)`` form (:func:`observe_streaming`):
Spark rejects ``Observation`` objects on streaming Datasets, and the
streaming metrics instead land in each micro-batch's
``StreamingQueryProgress.observedMetrics``.

Why not ``df.count()`` side-queries: every standalone count re-runs the
lineage — at 100 TB a "how many rows did we drop" dashboard query costs
a full ingest re-scan PER METRIC. Observed metrics ride the one pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observe_counts(
    df: DataFrame, name: str, **metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to a BATCH frame's plan.

    Returns ``(observed_df, observation)`` — run ANY action on the
    returned frame, then read ``observation.get`` (a dict) for the
    metric values; no additional job is launched for them. ``metrics``
    are aggregate Columns (``F.count``, ``F.sum(F.when(...))``, ...),
    keyed by their metric name.

    ``Observation`` objects are rejected by Spark on streaming Datasets
    — use :func:`observe_streaming` there (the name-based variant, whose
    metrics surface per micro-batch instead of per action).
    """
    if df.isStreaming:
        raise TypeError(
            "observe_counts: Observation does not support streaming "
            "Datasets — use observe_streaming(df, name, **metrics) and "
            "read each progress's observedMetrics"
        )
    obs = Observation(name)
    observed = df.observe(obs, *[c.alias(k) for k, c in metrics.items()])
    return observed, obs


def observe_streaming(df: DataFrame, name: str, **metrics: Column) -> DataFrame:
    """The streaming form: attach metrics by NAME — Spark publishes them
    in every micro-batch's ``StreamingQueryProgress.observedMetrics``
    (``query.lastProgress["observedMetrics"][name]``), the per-batch
    request log the reference writes to the console. Batch frames can
    use this form too, but :func:`observe_counts` hands the values back
    directly."""
    return df.observe(name, *[c.alias(k) for k, c in metrics.items()])


def observed_ingest_metrics(tagged: DataFrame) -> tuple[DataFrame, Observation]:
    """The S8 request-log counters for an :func:`..sources.ingest
    .ingest_with_reason` frame: total requests, parsed rows, and each
    dead-letter reason — the engine's version of the reference's
    per-request console log, as plan-attached metrics on the single
    ingest pass.
    """
    r = F.col("reject_reason")
    return observe_counts(
        tagged,
        "ingest",
        n_requests=F.count(F.lit(1)),
        n_parsed=F.count(F.when(r.isNull(), True)),
        n_too_large=F.count(F.when(r == "payload_too_large", True)),
        n_invalid_json=F.count(F.when(r == "invalid_json", True)),
    )
