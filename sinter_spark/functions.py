"""The engine's scalar-function surface as reusable Column builders.

Everything here is a pure ``pyspark.sql.functions`` composition
(JVM-side, codegen-fused) — the vectorized re-expression of the
reference's per-value checks (``/root/reference/lib/sinter/
validator.ex:429-512``, ``types.ex:119-191``). Import as::

    from sinter_spark import functions as SF
    df.where(SF.is_uuid("image_id") & SF.within("w", gt=0, lteq=16384))
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .types import UUID_RE_JAVA

# text-analysis functions re-exported at the function surface
from .operators.text import (  # noqa: F401
    fingerprint,
    lang_id,
    punct_ratio,
    stopword_ratio,
    token_count,
    whitespace_token_count,
)
from .operators.similarity import cosine  # noqa: F401


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def is_uuid(col: Column | str) -> Column:
    return _c(col).rlike(UUID_RE_JAVA)


def is_iso_date(col: Column | str) -> Column:
    c = _c(col)
    return c.rlike(r"^\d{4}-\d{2}-\d{2}$") & F.try_to_timestamp(c, F.lit("yyyy-MM-dd")).isNotNull()


def is_iso_datetime(col: Column | str) -> Column:
    # same anchored shape gate as binding.py's datetime check:
    # try_to_timestamp alone accepts date-only strings the reference
    # rejects, and the two surfaces must agree
    from .types import DATETIME_ISO_RE_JAVA

    c = _c(col)
    return c.rlike(DATETIME_ISO_RE_JAVA) & F.try_to_timestamp(
        F.replace(c, F.lit("Z"), F.lit("+00:00"))
    ).isNotNull()


def length_between(col: Column | str, min_length: int | None = None, max_length: int | None = None) -> Column:
    """Codepoint length bounds (String.length semantics,
    validator.ex:681-682)."""
    c = F.length(_c(col))
    out = F.lit(True)
    if min_length is not None:
        out = out & (c >= min_length)
    if max_length is not None:
        out = out & (c <= max_length)
    return out


def within(col: Column | str, *, gt=None, gteq=None, lt=None, lteq=None) -> Column:
    c = _c(col)
    out = F.lit(True)
    if gt is not None:
        out = out & (c > gt)
    if gteq is not None:
        out = out & (c >= gteq)
    if lt is not None:
        out = out & (c < lt)
    if lteq is not None:
        out = out & (c <= lteq)
    return out


def one_of(col: Column | str, choices: list) -> Column:
    return _c(col).isin(list(choices))


def matches(col: Column | str, pattern: str) -> Column:
    return _c(col).rlike(pattern)
