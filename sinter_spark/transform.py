"""Serialization transform + JSON encode/decode (§2.6).

Re-expresses ``Sinter.Transform`` (``/root/reference/lib/sinter/
transform.ex:38-137``): drop NotGiven/Omit sentinels, apply aliases
(canonical → wire name), ISO-8601 date formatting, recursive descent —
plus ``Sinter.JSON`` (``json.ex:19-67``): encode = transform + dump;
decode = parse + validate. Two grains:

* driver grain: plain dicts (the reference semantics, incl. sentinels —
  absent-vs-nil IS representable here, ``not_given.ex:9-46``);
* table grain: a DataFrame projection (sentinels don't exist per-row in
  a fixed schema — null ≡ omitted, SURVEY.md §7.3) with
  ``to_json``/``from_json`` for wire format.
"""

from __future__ import annotations

import json as _json
from datetime import date, datetime
from typing import Any

from .driver_validate import validate
from .errors import Error
from .schema import Schema


class NotGiven:
    """Sentinel distinguishing omitted from nil (not_given.ex:9-46)."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self) -> str:  # pragma: no cover
        return "NOT_GIVEN"


NOT_GIVEN = NotGiven()


class _Omit:
    """Second sentinel (``NotGiven.omit()``, not_given.ex:30-46) —
    transform-dropped exactly like NOT_GIVEN; exists so callers can
    distinguish 'never given' from 'explicitly omitted' upstream."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self) -> str:  # pragma: no cover
        return "OMIT"


OMIT = _Omit()

_SENTINELS = (NOT_GIVEN, OMIT)


def transform(schema_or_data, data: dict | None = None, *, aliases: dict | None = None, formats: dict | None = None, drop_nil: bool = False, use_aliases: bool = True) -> dict:
    """Two forms, matching the reference and the engine:

    * ``transform(data, aliases=..., formats=..., drop_nil=...)`` —
      the reference's schema-less pipeline (transform.ex:38-137):
      stringify keys, drop NotGiven/omit sentinels recursively, rename
      via ``aliases``, render datetimes per ``formats`` (``"iso8601"``),
      optionally drop nils.
    * ``transform(schema, data)`` — schema-driven serialization (alias
      renames + ISO dates + nested-object recursion).
    """
    if not isinstance(schema_or_data, Schema):
        if data is not None:
            raise TypeError("transform(data, ...) takes options, not a second positional arg")
        return _transform_plain(schema_or_data, aliases or {}, formats or {}, drop_nil)
    return _transform_schema(schema_or_data, data, use_aliases)


def _transform_plain(data: dict, aliases: dict, formats: dict, drop_nil: bool) -> dict:
    def walk(v, fmt: bool):
        # full recursive descent (transform.ex walks the whole tree):
        # dicts recurse, LISTS recurse per element — sentinels inside a
        # list are dropped and nested dicts inside lists are
        # transformed, not passed through to choke json.dumps. Dates
        # inside a list are formatted iff the list's key is
        # formats-named (same rule as the scalar case).
        if isinstance(v, dict):
            return _transform_plain(v, aliases, formats, drop_nil)
        if isinstance(v, (list, tuple)):
            return [walk(e, fmt) for e in v if not any(e is s for s in _SENTINELS)]
        if fmt and isinstance(v, (datetime, date)):
            return v.isoformat()
        return v

    out: dict[str, Any] = {}
    for k, v in data.items():
        if any(v is s for s in _SENTINELS):
            continue
        if drop_nil and v is None:
            continue
        key = str(k)
        if k in aliases or key in aliases:
            key = str(aliases.get(k, aliases.get(key)))
        fmt = k in formats or key in formats
        if fmt and isinstance(v, (datetime, date)):
            v = v.isoformat()
        elif isinstance(v, (dict, list, tuple)):
            v = walk(v, fmt)
        out[key] = v
    return out


def _serialize_typed(t, v, use_aliases: bool):
    """Spec-directed serialization of one value: ISO dates, nested
    objects via their schemas, and FULL descent through composite specs
    — elements of ('array', ('object', s)) get aliases/date formatting
    too (transform.ex does whole-tree descent), with sentinels inside
    lists dropped."""
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(t, tuple) and t:
        tag = t[0]
        if tag == "nullable":
            return v if v is None else _serialize_typed(t[1], v, use_aliases)
        if tag == "object" and isinstance(v, dict):
            return _transform_schema(t[1], v, use_aliases)
        if tag == "array" and isinstance(v, (list, tuple)):
            return [
                _serialize_typed(t[1], e, use_aliases)
                for e in v
                if not any(e is s for s in _SENTINELS)
            ]
        if tag == "map" and isinstance(v, dict):
            return {
                k: _serialize_typed(t[2], e, use_aliases)
                for k, e in v.items()
                if not any(e is s for s in _SENTINELS)
            }
        if tag == "tuple" and isinstance(v, (list, tuple)):
            return [
                _serialize_typed(et, e, use_aliases)
                for et, e in zip(t[1], v)
            ]
    if isinstance(v, (list, tuple)):  # untyped/union lists: dates + sentinels
        return [
            _serialize_typed("any", e, use_aliases)
            for e in v
            if not any(e is s for s in _SENTINELS)
        ]
    return v


def _transform_schema(schema: Schema, data: dict, use_aliases: bool = True) -> dict:
    """Serialize a validated payload: drop sentinels, rename via alias
    (``use_aliases=False`` keeps canonical names, field_alias_test.exs:
    75-113), ISO-format dates, recurse into nested objects and
    composite interiors via :func:`_serialize_typed`
    (transform.ex:38-137)."""
    out: dict[str, Any] = {}
    for name, fd in schema.fields.items():
        if name not in data:
            continue
        v = data[name]
        if any(v is s for s in _SENTINELS):
            continue  # sentinel-drop
        v = _serialize_typed(fd.type, v, use_aliases)
        wire = (fd.alias or name) if use_aliases else name
        out[wire] = v
    # unknown keys pass through untouched (non-strict serialization)
    for k, v in data.items():
        if k not in schema.fields and not any(v is s for s in _SENTINELS):
            out.setdefault(k, v)
    return out


def encode(schema_or_data, data: dict | None = None, *, aliases: dict | None = None, formats: dict | None = None, drop_nil: bool = False, **dump_opts) -> str:
    """transform + JSON dump (json.ex:19-38). Accepts either
    ``encode(schema, data)`` or the reference's schema-less
    ``encode(data, aliases=...)``."""
    if isinstance(schema_or_data, Schema):
        return _json.dumps(_transform_schema(schema_or_data, data), **dump_opts)
    if data is not None:
        raise TypeError("encode(data, ...) takes options, not a second positional arg")
    return _json.dumps(
        _transform_plain(schema_or_data, aliases or {}, formats or {}, drop_nil), **dump_opts
    )


def decode(schema: Schema, payload: str, **validate_opts):
    """parse + validate (json.ex:45-67); parse errors → :json_decode."""
    try:
        data = _json.loads(payload)
    except ValueError as e:
        return False, None, [Error.new([], "json_decode", str(e))]
    return validate(schema, data, **validate_opts)


# -- table grain -------------------------------------------------------------


def transform_df(schema: Schema, df):
    """DataFrame projection applying alias renames + date formatting —
    the distributed transform (one narrow select)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as ST

    dtypes = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for name, fd in schema.fields.items():
        if name not in dtypes:
            continue
        c = F.col(name)
        if isinstance(dtypes[name], ST.DateType):
            c = F.date_format(c, "yyyy-MM-dd")
        elif isinstance(dtypes[name], (ST.TimestampType, ST.TimestampNTZType)):
            c = F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss")
        cols.append(c.alias(fd.alias or name))
    return df.select(*cols)


def encode_df(schema: Schema, df):
    """One JSON string column per row (wire format via to_json)."""
    from pyspark.sql import functions as F

    t = transform_df(schema, df)
    return t.select(F.to_json(F.struct(*t.columns)).alias("json"))
