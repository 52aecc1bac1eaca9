"""Python UDTF surface (SURVEY.md §2.9 'engine UDF surface').

The reference's ``transformToSimpleRecords`` (makeRouter.js:56-75) is a
1-object -> N-rows mapping; the engine's primary implementation is pure
``explode`` + projection (plans/ingest_shaper.py — no UDF at all). This
module provides the *general* table-function escape hatch for shapes that
genuinely cannot be expressed with explode/HOFs: an arrow-unaware,
row-yielding Python UDTF (Spark 3.5+ ``@udtf``).

UDTFs are the slow path (per-row Python). Use a native explode/HOF when the
expansion logic is expressible in expressions; reach for a UDTF only for
imperative per-row expansion logic (parsers, tokenizers with state).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

# ASCII-pinned on purpose: Python str.split()/str.isdigit() are
# Unicode-aware (NBSP splits, '²' is a digit) while the corpus oracle's
# RE2 regexes are ASCII (RE2 \s is [\t\n\f\r ], no \v) — the explicit
# classes keep the UDTF and its SQL twin equivalent on any input, not just
# the ASCII fixture text. Likewise the space-only strip mirrors SQL trim().
_WS = re.compile(r"[ \t\n\r\f]+")
_NUM = re.compile(r"[0-9]+")


@udtf(returnType="token string, position int, is_numeric boolean")
class TokenizeUDTF:
    """Yield (token, position, is_numeric) rows from one text value —
    the minimal 1->N imperative expansion demonstrating the surface."""

    def eval(self, text: str | None):  # noqa: D102
        if text is None:
            return
        # filter empty fragments instead of space-stripping (r14): a
        # space-only strip left re.split to emit a phantom '' token for
        # text edged with tabs/newlines — the tokens() find, mirrored
        # here; the SQL twin applies the same list_filter. Positions
        # number the FILTERED sequence on both sides.
        toks = [t for t in _WS.split(text) if t]
        for i, tok in enumerate(toks):
            yield tok, i, _NUM.fullmatch(tok) is not None
