"""Dump .explain('formatted') for bench headline queries — or any
explicitly named registered query — to plans/r21/<query>_<suffix>.txt
(optimization-round evidence).

Usage: python tools/r21_plandump.py <suffix: before|after> [query ...]
Default sf dir: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1.
Eager-materializing queries (ll*/d2/d3/dec1/bm25) are rendered through
their ``eager=False`` lazy form where the callable supports it, so the
plan shows the real composed scan/shuffle shape rather than a
post-checkpoint stub (the explain_audit.py convention).

Unlike r20_plandump, explicitly named queries need not be in the bench
headline set (this round touches p4_first_wins_dedup, which is
oracle-checked but not benched).
"""
from __future__ import annotations

import inspect
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from contextlib import redirect_stdout

from data_transform_make_spark import corpus  # noqa: E402
from data_transform_make_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r21",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r21-plandump")
    qs = corpus.queries()
    names = only if only else bench.HEADLINE
    for name in names:
        fn = qs[name]
        kwargs = {}
        if "eager" in inspect.signature(fn).parameters:
            kwargs["eager"] = False
        df = fn(spark, sf_dir, **kwargs)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
