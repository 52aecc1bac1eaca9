"""Version-pin of the eager_cut/connected_components exact-restore branch
(verdict, round 10 item 5).

operators/checkpointing._exact_restore prefers a PRIVATE Scala setter
(``SparkContext.checkpointDir_$eq`` via py4j) because the public
``setCheckpointDir`` treats its argument as a root and mints a fresh UUID
subdir — an inexact restore that drifts one level deeper per cycle. Being
private, a Spark minor-version bump can remove the setter and silently
flip every restore to the fallback, quietly changing restore semantics.
These tests make that flip LOUD: the first asserts the private branch is
the one that runs on the pinned Spark version; the others assert the
memo/restore invariants hold under BOTH branches, so even after a caught
flip the protocol stays correct (merely inexact).
"""

import pyspark
import pytest

from data_transform_make_spark.operators import checkpointing
from data_transform_make_spark.operators.checkpointing import (
    _exact_restore,
    eager_cut,
)


def _clear_memo(sc):
    sc._dtm_checkpoint_root = None
    sc._dtm_checkpoint_set = None


def test_private_setter_branch_is_live_on_pinned_spark(spark, tmp_path):
    """On the Spark version this repo pins (4.x), the private branch must
    be the one that runs AND must restore the already-UUID'd path EXACTLY
    — the property the public fallback cannot provide. If a version bump
    removes `checkpointDir_$eq`, this assertion is the loud signal to
    re-evaluate the restore semantics, not a silent downgrade."""
    sc = spark.sparkContext
    sc.setCheckpointDir(str(tmp_path / "prior_root"))
    exact_prior = sc.getCheckpointDir()  # prior_root/<uuid>
    sc.setCheckpointDir(str(tmp_path / "other_root"))
    assert sc.getCheckpointDir() != exact_prior

    branch = _exact_restore(sc, exact_prior)

    assert branch == "private-setter", (
        f"exact-restore fell back to {branch!r} on Spark "
        f"{pyspark.__version__} — the private checkpointDir_$eq setter "
        "is gone; restores now mint UUID subdirs (inexact). Re-pin."
    )
    # byte-exact restore: the recorded UUID'd path itself, no new subdir
    assert sc.getCheckpointDir() == exact_prior
    _clear_memo(sc)


def test_public_fallback_branch_invariants(spark, tmp_path):
    """Drive the fallback deliberately (an sc facade whose _jsc access
    raises, as it would if the private setter vanished): the branch label
    must say so, the restore must still land inside the requested root
    (correct tree, one UUID level deeper — the documented inexactness)."""
    sc = spark.sparkContext

    class NoPrivateApi:
        """Delegates the public surface, refuses the private one."""

        def __init__(self, real):
            self._real = real

        @property
        def _jsc(self):
            raise AttributeError("private setter removed (simulated bump)")

        def setCheckpointDir(self, d):
            self._real.setCheckpointDir(d)

        def getCheckpointDir(self):
            return self._real.getCheckpointDir()

    root = str(tmp_path / "fallback_root")
    sc.setCheckpointDir(root)
    exact = sc.getCheckpointDir()  # fallback_root/<uuid>

    branch = _exact_restore(NoPrivateApi(sc), exact)

    assert branch == "public-fallback"
    # inexact but correct: a fresh UUID subdir UNDER the recorded path
    restored = sc.getCheckpointDir()
    assert restored != exact and restored.startswith(exact)
    _clear_memo(sc)


def test_eager_cut_memo_and_restore_hold_under_fallback(
    spark, tmp_path, monkeypatch
):
    """The eager_cut exit contract (foreign dir restored, memo cleared,
    checkpoint files under OUR dir) must survive a flip to the fallback
    branch — the protocol stays correct even when the restore is inexact."""
    sc = spark.sparkContext
    foreign = str(tmp_path / "foreign")
    sc.setCheckpointDir(foreign)
    pre = sc.getCheckpointDir()
    _clear_memo(sc)  # entry dir belongs to someone else

    def forced_fallback(sc_, restore_ckpt):
        sc_.setCheckpointDir(restore_ckpt)
        return "public-fallback"

    monkeypatch.setattr(checkpointing, "_exact_restore", forced_fallback)

    ours = str(tmp_path / "ours")
    out = eager_cut(spark.range(5), ours)
    assert out.count() == 5

    import os

    # the cut landed under OUR dir...
    assert any(files for _, _, files in os.walk(ours))
    # ...the foreign dir was restored into its own tree (inexact: one
    # UUID level below the recorded path — never OUR dir, never elsewhere)
    restored = sc.getCheckpointDir()
    assert restored.startswith(pre)
    # ...and the memo was cleared so the next call re-sets
    assert getattr(sc, "_dtm_checkpoint_root", None) is None
    assert getattr(sc, "_dtm_checkpoint_set", None) is None


def test_eager_cut_memo_and_restore_hold_under_private(spark, tmp_path):
    """Same exit contract under the live private branch (the default on
    the pinned version): restore is byte-exact, memo cleared."""
    sc = spark.sparkContext
    foreign = str(tmp_path / "foreign2")
    sc.setCheckpointDir(foreign)
    pre = sc.getCheckpointDir()
    _clear_memo(sc)

    out = eager_cut(spark.range(4), str(tmp_path / "ours2"))
    assert out.count() == 4
    assert sc.getCheckpointDir() == pre
    assert getattr(sc, "_dtm_checkpoint_root", None) is None
    assert getattr(sc, "_dtm_checkpoint_set", None) is None
