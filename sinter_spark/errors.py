"""Error data structure and violation-row algebra.

Re-expresses the reference's first-class error struct
(``/root/reference/lib/sinter/error.ex:10-18``) and its algebra
(format/group/summarize, ``error.ex:108-291``) in two forms:

* a pure-Python :class:`Error` dataclass for driver-side helpers
  (``validate_value`` etc.), and
* the canonical **violation-row schema** (``VIOLATION_FIELDS`` /
  ``violation_schema``) used by every distributed validation pass —
  shape-identical to ``Error.to_map/1`` (``error.ex:224-237``) plus a
  ``row_key`` column carrying row identity (the distributed analogue of
  the batch index prefix in ``validator.ex:148-181``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Iterable, Mapping, Sequence

#: every error code the engine can emit (union of codes across
#: ``validator.ex:410-512,535-637`` and ``types.ex:119-387``).
ERROR_CODES = frozenset(
    {
        "required",
        "type",
        "coercion",
        "min_length",
        "max_length",
        "min_items",
        "max_items",
        "gt",
        "gteq",
        "lt",
        "lteq",
        "format",
        "choices",
        "literal_mismatch",
        "missing_discriminator",
        "unknown_discriminator",
        "tuple_size",
        "strict",
        "input_format",
        "custom_validation",
        "custom_validation_error",
        "pre_validate_error",
        "post_validation",
        "json_decode",
        # table-level codes added by the distributed engine (SURVEY.md §2.8)
        "unique",
        "referential",
        "drift",
        "decode",
        "psnr",
        "caption_mismatch",
        "phash_mismatch",
        "dim_mismatch",
    }
)


def _normalize_path(path: Any) -> list[str]:
    """Path normalized to a list of strings (``error.ex:49-56`` normalizes
    a bare atom to a one-element list; indices become strings here because
    the Spark column type is ``array<string>``)."""
    if path is None:
        return []
    if isinstance(path, (list, tuple)):
        return [str(p) for p in path]
    return [str(path)]


@dataclass(frozen=True)
class Error:
    """One validation error: ``(path, code, message, context)``.

    Mirrors ``%Sinter.Error{}`` (``error.ex:10-18``).
    """

    path: tuple[str, ...]
    code: str
    message: str
    context: Mapping[str, Any] | None = None

    @staticmethod
    def new(path: Any, code: str, message: str, context: Mapping[str, Any] | None = None) -> "Error":
        return Error(tuple(_normalize_path(path)), str(code), message, context)

    @staticmethod
    def with_context(path: Any, code: str, message: str, context: Mapping[str, Any]) -> "Error":
        return Error.new(path, code, message, context)

    def format(self, *, include_path: bool = True, path_separator: str = ".") -> str:
        """``"a.b.2: message"`` dotted-path rendering with the
        reference's options (``error.ex:108-138``: ``include_path``,
        ``path_separator``)."""
        if not self.path or not include_path:
            return self.message
        return f"{path_separator.join(self.path)}: {self.message}"

    def to_map(self) -> dict[str, Any]:
        """Serializable form (``error.ex:224-237``); context omitted when nil."""
        out: dict[str, Any] = {
            "path": list(self.path),
            "code": self.code,
            "message": self.message,
        }
        if self.context is not None:
            out["context"] = dict(self.context)
        return out


def format_errors(errors: Iterable[Error], **opts) -> str:
    """Newline-joined rendering (``error.ex:146-158`` returns one
    string, not a list); options pass through to :meth:`Error.format`."""
    return "\n".join(e.format(**opts) for e in errors)


def group_by_path(errors: Iterable[Error]) -> dict[tuple[str, ...], list[Error]]:
    out: dict[tuple[str, ...], list[Error]] = {}
    for e in errors:
        out.setdefault(e.path, []).append(e)
    return out


def group_by_code(errors: Iterable[Error]) -> dict[str, list[Error]]:
    out: dict[str, list[Error]] = {}
    for e in errors:
        out.setdefault(e.code, []).append(e)
    return out


def filter_by_code(errors: Iterable[Error], code: str) -> list[Error]:
    return [e for e in errors if e.code == code]


def summarize(errors: Sequence[Error]) -> dict[str, Any]:
    """``{total_errors, error_codes, affected_paths, by_code}`` (``error.ex:281-291``)."""
    by_code: dict[str, int] = {}
    paths: list[tuple[str, ...]] = []
    for e in errors:
        by_code[e.code] = by_code.get(e.code, 0) + 1
        if e.path not in paths:
            paths.append(e.path)
    return {
        "total_errors": len(errors),
        "error_codes": sorted(by_code),
        "affected_paths": [list(p) for p in paths],
        "by_code": by_code,
    }


def to_maps(errors: Iterable[Error]) -> list[dict[str, Any]]:
    return [e.to_map() for e in errors]


def with_llm_context(error: Error, llm_response: Any, prompt: str) -> Error:
    """Attach ``{llm_response, prompt}`` to context (``error.ex:321-335``)."""
    ctx = dict(error.context or {})
    ctx.update({"llm_response": llm_response, "prompt": prompt})
    return Error(error.path, error.code, error.message, ctx)


class ValidationError(Exception):
    """Raised by ``validate!``-style helpers (``error.ex:352-403``).

    Message formats 0/1/N errors the way the reference exception does.
    """

    def __init__(self, errors: Sequence[Error]):
        self.errors = list(errors)
        super().__init__(self._build_message())

    def _build_message(self) -> str:
        # exact reference wording (error.ex:365-383)
        n = len(self.errors)
        if n == 0:
            return "Validation failed"
        if n == 1:
            return f"Validation failed: {self.errors[0].format()}"
        lines = "\n".join(f"  - {e.format()}" for e in self.errors)
        return f"Validation failed with {n} errors:\n{lines}"

    @property
    def message(self) -> str:
        return self._build_message()

    def format(self) -> str:
        """``ValidationError.format/1`` (error.ex:391-403)."""
        return self._build_message()


# ---------------------------------------------------------------------------
# Distributed violation-row schema (the table-level Error.to_map shape)
# ---------------------------------------------------------------------------

#: (name, spark DDL type) — kept as DDL strings so this module imports
#: without a JVM. ``row_key`` carries row identity; the remaining four
#: match ``Error.to_map/1`` (``error.ex:224-237``).
VIOLATION_FIELDS: tuple[tuple[str, str], ...] = (
    ("row_key", "string"),
    ("path", "array<string>"),
    ("code", "string"),
    ("message", "string"),
    ("context", "map<string,string>"),
)

VIOLATION_DDL = ", ".join(f"{n} {t}" for n, t in VIOLATION_FIELDS)

#: per-partition verdict schema (distributed analogue of validate_many's
#: ``{:error, %{index => errors}}`` result, ``validator.ex:148-181``).
VERDICT_DDL = (
    "part_id string, pass boolean, rows bigint, violations bigint, "
    "stats map<string,double>"
)


def violation_schema():
    """The violation-row StructType (imports pyspark lazily)."""
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(VIOLATION_DDL)


def verdict_schema():
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(VERDICT_DDL)
