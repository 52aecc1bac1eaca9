"""Column-namespace guard for operator-internal scratch columns.

Round-13 boundary review (the silently-wrong lens, applied to column
namespaces): several public operators stamp internal ``__``-prefixed
scratch columns onto CALLER-supplied frames with ``withColumn`` and
drop them on the way out. ``withColumn`` REPLACES an existing
same-named column silently, so a caller whose frame already carries
one of those names gets a double corruption, both silent: the
operator's logic reads values the caller never intended as scratch,
and the cleanup ``drop()`` then deletes the caller's column from the
output entirely. The sink variants are the worst case — a column
vanishes from data WRITTEN TO DISK (``write_zordered``'s ``__z``).

:func:`claim_scratch` is the loud alternative, applied at every public
operator that scratches on a caller frame. It is analysis-time only
(``df.columns`` is plan metadata — no job runs), so the guard is free.
Engine-INTERNAL frames (pipeline stages built from the engine's own
projections, e.g. the order-pipeline stages or CC's label frames) are
not guarded: their column space is fully owned by the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def claim_scratch(df: DataFrame, op: str, *names: str) -> None:
    """Refuse ``df`` if it already carries any of the scratch ``names``.

    Raises ``ValueError`` naming the operator and the colliding
    column(s); columns beginning with ``__`` are engine-reserved
    scratch space by convention, and renaming the input column is
    always the caller's cheapest correct move.
    """
    clash = [n for n in names if n in df.columns]
    if clash:
        raise ValueError(
            f"{op}: input already carries column(s) {clash}, which this "
            "operator uses as internal scratch — withColumn would "
            "silently REPLACE the caller's values and the operator's "
            "cleanup drop() would then delete the column from the "
            "output (silent data loss; review, round 13). Rename the "
            "input column(s); the __ prefix is engine-reserved."
        )
