"""Docstring file-reference drift gate (verdict r8 #6): every
`tests/…`/`tools/…`/package `.py` path named in repo source must exist,
with any `:line` anchor inside the file — the round-7 `cr1`-docstring
drift class, now a standing check. The standalone CLI form is
`python tools/check_docrefs.py` (part of the verify workflow)."""

import importlib.util
from pathlib import Path


def test_no_stale_file_references():
    tool = Path(__file__).resolve().parent.parent / "tools" / "check_docrefs.py"
    spec = importlib.util.spec_from_file_location("check_docrefs", tool)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.check() == []
