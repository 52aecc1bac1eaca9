"""Exact-semantics helpers for the reference's JS coercion rules.

The reference (routes/makeRouter.js) leans on two JavaScript behaviors that
Spark's ANSI casts do NOT replicate (SURVEY.md §7.4):

* ``parseInt(x || 0)`` — parses the *leading* integer of an arbitrary string
  (``parseInt("12x") == 12``), yields NaN on no digits
  (makeRouter.js:89,108,117,181,186,191).
* falsiness — ``0``, ``""``, null/undefined, NaN are all falsy; used both to
  skip rows (makeRouter.js:94) and to default values (``|| ""`` at
  makeRouter.js:63,67-72).

Everything here is a pure Column expression — JVM-side, codegen'd, no Python
in the data path — so the helpers cost the same as hand-written SQL at any
scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_LEADING_INT = r"^\s*([+-]?\d+)"


def js_parse_int(col: Column | str) -> Column:
    """``parseInt(col)`` with JS semantics; NULL where JS yields NaN.

    ``regexp_extract`` pulls the leading optionally-signed digit run after
    whitespace; no match -> '' -> NULL (via nullif) -> try_cast stays NULL.
    ANSI-safe: the extracted token is always castable.
    """
    c = F.col(col) if isinstance(col, str) else col
    tok = F.nullif(F.regexp_extract(c.cast("string"), _LEADING_INT, 1), F.lit(""))
    return tok.try_cast("long")


def js_parse_int_or_zero(col: Column | str) -> Column:
    """``parseInt(x || 0)`` — the reference's read-a-counter idiom: missing,
    empty, or unparseable -> 0 (makeRouter.js:108,117,181,186,191)."""
    return F.coalesce(js_parse_int(col), F.lit(0))


def js_str_falsy(col: Column | str) -> Column:
    """True where a string column is JS-falsy: NULL or '' (no trim — JS
    ``if (!s)`` does not trim; makeRouter.js:94 checks the raw value)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNull() | (c == F.lit(""))


def qty_falsy(col: Column | str) -> Column:
    """True where ``!parseInt(qty)`` in JS: no leading digits (NaN) or 0
    (makeRouter.js:89,94)."""
    n = js_parse_int(col)
    return n.isNull() | (n == F.lit(0))


def default_if_falsy(col: Column | str, default: str = "") -> Column:
    """``col || default`` for string columns (makeRouter.js:63,67-72)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(js_str_falsy(c), F.lit(default)).otherwise(c)
