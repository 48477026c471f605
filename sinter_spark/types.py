"""Type-spec system: primitives, composites, validation, coercion.

Re-expresses the reference type system (``/root/reference/lib/sinter/
types.ex:47-69`` for specs, ``types.ex:119-387`` for validation,
``types.ex:417-581`` for coercion) as:

* a Python *value* representation of type specs (strings / tuples — kept
  as data so schemas stay runtime-first like the reference),
* a mapping to Spark ``DataType``/DDL for table binding,
* a pure-Python recursive interpreter (``validate_value``) used by
  driver-side helpers and by the nested-composite pandas kernel, and
* pure-Python coercion matching the reference's whole-string-parse
  strictness (``types.ex:428-433``: ``Integer.parse`` must consume the
  entire string).

Spec grammar::

    "string" | "integer" | "float" | "boolean" | "atom" | "any"
    | "map" | "null" | "date" | "datetime" | "uuid"
    ("array", spec)                      # per-element, indexed paths
    ("array", spec, {"min_items": n, "max_items": m})
    ("union", [spec, ...])               # first match wins
    ("tuple", [spec, ...])               # fixed size, positional
    ("map", key_spec, value_spec)
    ("nullable", spec)
    ("object", Schema | [field_specs])
    ("literal", value)                   # exact, type-strict match
    ("discriminated_union", discriminator, {value: Schema, ...})
"""

from __future__ import annotations

import re
from datetime import date, datetime
from typing import Any

from .errors import Error

PRIMITIVES = frozenset(
    {
        "string",
        "integer",
        "float",
        "boolean",
        "atom",
        "any",
        "map",
        "null",
        "date",
        "datetime",
        "uuid",
    }
)

UUID_RE = re.compile(
    r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
)
#: Java-regex form usable in Spark ``rlike`` (types.ex:177-185 regex).
UUID_RE_JAVA = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

_INT_RE = re.compile(r"^[+-]?\d+$")
# Elixir Float.parse accepts "42" → 42.0 (digits, optional fraction/exp)
_FLOAT_RE = re.compile(r"^[+-]?\d+(\.\d+)?([eE][+-]?\d+)?$")

# Anchored ISO shapes, shared by driver and Spark binding so the two
# grains agree: Python fromisoformat (3.11+) is laxer than the
# reference (NaiveDateTime.from_iso8601 rejects date-only datetimes
# and compact '20230101' dates), so both engines pre-gate on these.
_DATE_ISO_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_DATETIME_ISO_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:?\d{2})?$"
)
#: Java-regex forms usable in Spark ``rlike``.
DATE_ISO_RE_JAVA = r"^\d{4}-\d{2}-\d{2}$"
DATETIME_ISO_RE_JAVA = r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:?\d{2})?$"


class TypeSpecError(ValueError):
    """Raised for malformed type specs at define time (schema.ex:451-528)."""


def type_name(value: Any) -> str:
    """Human name for error messages (mirrors the reference's type_name)."""
    if value is None:
        return "nil"
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, int):
        return "integer"
    if isinstance(value, float):
        return "float"
    if isinstance(value, str):
        return "string"
    if isinstance(value, (list, tuple)):
        return "list"
    if isinstance(value, dict):
        return "map"
    if isinstance(value, (bytes, bytearray)):
        return "binary"
    return type(value).__name__


def validate_type_spec(spec: Any) -> None:
    """Reject unknown/malformed specs at define time (schema.ex:451-528)."""
    from .schema import Schema  # local to avoid import cycle

    if isinstance(spec, str):
        if spec not in PRIMITIVES:
            raise TypeSpecError(f"unknown type: {spec!r}")
        return
    if isinstance(spec, tuple) and spec:
        tag = spec[0]
        if tag == "array" and len(spec) in (2, 3):
            validate_type_spec(spec[1])
            if len(spec) == 3:
                extra = set(spec[2]) - {"min_items", "max_items"}
                if not isinstance(spec[2], dict) or extra:
                    raise TypeSpecError(f"bad array constraints: {spec[2]!r}")
            return
        if tag == "union" and len(spec) == 2 and isinstance(spec[1], (list, tuple)):
            if not spec[1]:
                raise TypeSpecError("union must have at least one member")
            for s in spec[1]:
                validate_type_spec(s)
            return
        if tag == "tuple" and len(spec) == 2 and isinstance(spec[1], (list, tuple)):
            for s in spec[1]:
                validate_type_spec(s)
            return
        if tag == "map" and len(spec) == 3:
            validate_type_spec(spec[1])
            validate_type_spec(spec[2])
            return
        if tag == "nullable" and len(spec) == 2:
            validate_type_spec(spec[1])
            return
        if tag == "object" and len(spec) == 2:
            if not isinstance(spec[1], Schema):
                raise TypeSpecError("object spec requires a Schema")
            return
        if tag == "literal" and len(spec) == 2:
            return
        if tag == "discriminated_union" and len(spec) == 3:
            disc, variants = spec[1], spec[2]
            if not isinstance(disc, str) or not isinstance(variants, dict) or not variants:
                raise TypeSpecError("discriminated_union requires (name, {value: Schema})")
            for key, vschema in variants.items():
                if not isinstance(vschema, Schema):
                    raise TypeSpecError("discriminated_union variants must be Schemas")
                fd = vschema.fields.get(disc)
                # compile-time check: every variant must define the
                # discriminator as a matching literal (schema.ex:495-566)
                if fd is None:
                    raise TypeSpecError(
                        f"variant {key!r} missing discriminator field {disc!r}"
                    )
                t = fd.type
                if not (
                    isinstance(t, tuple)
                    and t[0] == "literal"
                    and (t[1] == key or str(t[1]) == str(key))
                ):
                    raise TypeSpecError(
                        f"variant {key!r} discriminator must be literal {key!r}"
                    )
            return
    raise TypeSpecError(f"unknown type spec: {spec!r}")


def spark_ddl(spec: Any) -> str:
    """Spark DDL type for a spec (SURVEY.md §1.2 mapping)."""
    if isinstance(spec, str):
        return {
            "string": "string",
            "integer": "bigint",
            "float": "double",
            "boolean": "boolean",
            "atom": "string",
            "any": "string",
            "map": "map<string,string>",
            "null": "string",
            "date": "string",  # value stays a string in the reference (types.ex:147-157)
            "datetime": "string",
            "uuid": "string",
        }[spec]
    tag = spec[0]
    if tag == "array":
        return f"array<{spark_ddl(spec[1])}>"
    if tag == "nullable":
        return spark_ddl(spec[1])
    if tag == "literal":
        return spark_ddl(type_name(spec[1]) if type_name(spec[1]) in PRIMITIVES else "string")
    if tag == "map":
        return f"map<{spark_ddl(spec[1])},{spark_ddl(spec[2])}>"
    if tag == "tuple":
        inner = ", ".join(f"_{i} {spark_ddl(s)}" for i, s in enumerate(spec[1]))
        return f"struct<{inner}>"
    if tag in ("object", "discriminated_union"):
        # struct of union of fields; caller usually binds sub-schema directly
        return "struct<>"
    if tag == "union":
        return spark_ddl(spec[1][0])
    raise TypeSpecError(f"no spark type for {spec!r}")


# ---------------------------------------------------------------------------
# Pure-Python recursive validation (driver-side + pandas-kernel path)
# ---------------------------------------------------------------------------


def validate_value(spec: Any, value: Any, path: tuple = ()) -> tuple[bool, Any, list[Error]]:
    """Validate one value against a spec; returns (ok, value, errors).

    Semantics of ``types.ex:119-387``: strict int-vs-float, literal
    type-strict ``===``, first-match union, per-element array paths.
    """
    from .schema import Schema
    from .driver_validate import validate as _validate_map

    p = list(path)
    if isinstance(spec, str):
        if spec == "any":
            return True, value, []
        if spec == "string":
            if isinstance(value, str):
                return True, value, []
        elif spec == "integer":
            if isinstance(value, int) and not isinstance(value, bool):
                return True, value, []
        elif spec == "float":
            # strict: integer fails float (types.ex:124, validator_test.exs:228-230)
            if isinstance(value, float):
                return True, value, []
        elif spec == "boolean":
            if isinstance(value, bool):
                return True, value, []
        elif spec == "atom":
            # no atom concept in Python: interned-symbol ≙ string (SURVEY §1.2)
            if isinstance(value, str):
                return True, value, []
        elif spec == "map":
            if isinstance(value, dict):
                return True, value, []
        elif spec == "null":
            if value is None:
                return True, value, []
        elif spec == "date":
            if isinstance(value, str):
                try:
                    if _DATE_ISO_RE.match(value):
                        date.fromisoformat(value)
                        return True, value, []
                    raise ValueError(value)
                except ValueError:
                    return False, value, [Error.new(p, "format", "expected ISO8601 date string")]
            return False, value, [
                Error.new(p, "type", f"expected date string, got {type_name(value)}")
            ]
        elif spec == "datetime":
            if isinstance(value, str):
                try:
                    if _DATETIME_ISO_RE.match(value):
                        datetime.fromisoformat(value.replace("Z", "+00:00"))
                        return True, value, []
                    raise ValueError(value)
                except ValueError:
                    return False, value, [
                        Error.new(p, "format", "expected ISO8601 datetime string")
                    ]
            return False, value, [
                Error.new(p, "type", f"expected datetime string, got {type_name(value)}")
            ]
        elif spec == "uuid":
            if isinstance(value, str):
                if UUID_RE.match(value):
                    return True, value, []
                return False, value, [Error.new(p, "format", "expected UUID string")]
            return False, value, [
                Error.new(p, "type", f"expected UUID string, got {type_name(value)}")
            ]
        return False, value, [
            Error.new(p, "type", f"expected {spec}, got {type_name(value)}")
        ]

    tag = spec[0]
    if tag == "literal":
        expected = spec[1]
        # type-strict === (types.ex:132-145; literal 1 ≠ 1.0, types_test.exs:524-528)
        if value == expected and type(value) is type(expected):
            return True, value, []
        return False, value, [
            Error.new(
                p, "literal_mismatch", f"expected literal {expected!r}, got {value!r}"
            )
        ]
    if tag == "nullable":
        if value is None:
            return True, None, []
        return validate_value(spec[1], value, path)
    if tag == "array":
        if not isinstance(value, list):
            return False, value, [
                Error.new(p, "type", f"expected array, got {type_name(value)}")
            ]
        errors: list[Error] = []
        out = []
        for i, item in enumerate(value):
            ok, v, errs = validate_value(spec[1], item, path + (str(i),))
            out.append(v)
            errors.extend(errs)
        if len(spec) == 3 and not errors:
            cons = spec[2]
            n = len(value)
            if "min_items" in cons and n < cons["min_items"]:
                errors.append(
                    Error.new(p, "min_items", f"must contain at least {cons['min_items']} items")
                )
            if "max_items" in cons and n > cons["max_items"]:
                errors.append(
                    Error.new(p, "max_items", f"must contain at most {cons['max_items']} items")
                )
        return (not errors), out, errors
    if tag == "union":
        # first type that validates wins (types.ex:742-749)
        for member in spec[1]:
            ok, v, _ = validate_value(member, value, path)
            if ok:
                return True, v, []
        return False, value, [
            Error.new(p, "type", "value does not match any type in union")
        ]
    if tag == "tuple":
        specs = spec[1]
        if not isinstance(value, (list, tuple)):
            return False, value, [
                Error.new(p, "type", f"expected tuple, got {type_name(value)}")
            ]
        if len(value) != len(specs):
            return False, value, [
                Error.new(
                    p,
                    "tuple_size",
                    f"expected tuple of size {len(specs)}, got {len(value)}",
                )
            ]
        errors = []
        out = []
        for i, (s, item) in enumerate(zip(specs, value)):
            ok, v, errs = validate_value(s, item, path + (str(i),))
            out.append(v)
            errors.extend(errs)
        return (not errors), tuple(out), errors
    if tag == "map":
        if not isinstance(value, dict):
            return False, value, [
                Error.new(p, "type", f"expected map, got {type_name(value)}")
            ]
        kspec, vspec = spec[1], spec[2]
        errors = []
        out = {}
        for k, v in value.items():
            okk, kk, kerrs = validate_value(kspec, k, path + (str(k),))
            okv, vv, verrs = validate_value(vspec, v, path + (str(k),))
            errors.extend(kerrs)
            errors.extend(verrs)
            out[kk if okk else k] = vv if okv else v
        return (not errors), out, errors
    if tag == "object":
        if not isinstance(value, dict):
            return False, value, [
                Error.new(p, "type", f"expected object, got {type_name(value)}")
            ]
        ok, validated, errors = _validate_map(spec[1], value, path=path)
        return ok, validated, errors
    if tag == "discriminated_union":
        disc, variants = spec[1], spec[2]
        if not isinstance(value, dict):
            return False, value, [
                Error.new(
                    p,
                    "type",
                    f"expected map for discriminated union, got {type_name(value)}",
                )
            ]
        if disc not in value or value[disc] is None:
            return False, value, [
                Error.new(
                    p,
                    "missing_discriminator",
                    f"missing discriminator field '{disc}'",
                )
            ]
        dval = value[disc]
        variant = variants.get(dval)
        if variant is None:
            variant = next(
                (vs for key, vs in variants.items() if str(key) == str(dval)), None
            )
        if variant is None:
            return False, value, [
                Error.new(
                    p,
                    "unknown_discriminator",
                    f"unknown discriminator value {dval!r}",
                )
            ]
        ok, validated, errors = _validate_map(variant, value, path=path)
        return ok, validated, errors
    raise TypeSpecError(f"unknown type spec: {spec!r}")


# ---------------------------------------------------------------------------
# Coercion (types.ex:417-581) — opt-in, never raises, whole-string parses
# ---------------------------------------------------------------------------


def coerce_value(spec: Any, value: Any) -> tuple[bool, Any, list[Error]]:
    """Coerce one value; (ok, coerced, errors). Paths are filled by caller."""
    if isinstance(spec, str):
        if spec == "string":
            if isinstance(value, bool):
                return True, "true" if value else "false", []
            if isinstance(value, (int, float, str)):
                return True, value if isinstance(value, str) else _num_to_str(value), []
            return _cerr(value, "string")
        if spec == "integer":
            if isinstance(value, bool):
                return _cerr(value, "integer")
            if isinstance(value, int):
                return True, value, []
            if isinstance(value, str):
                # whole-string parse (types.ex:428-433)
                if _INT_RE.match(value):
                    return True, int(value), []
                return False, value, [
                    Error.new([], "coercion", f"cannot coerce '{value}' to integer")
                ]
            return _cerr(value, "integer")
        if spec == "float":
            if isinstance(value, bool):
                return _cerr(value, "float")
            if isinstance(value, float):
                return True, value, []
            if isinstance(value, int):
                return True, float(value), []
            if isinstance(value, str):
                # Elixir Float.parse requires a decimal point or exponent
                if _FLOAT_RE.match(value):
                    return True, float(value), []
                return False, value, [
                    Error.new([], "coercion", f"cannot coerce '{value}' to float")
                ]
            return _cerr(value, "float")
        if spec == "boolean":
            if value == "true":
                return True, True, []
            if value == "false":
                return True, False, []
            if isinstance(value, bool):
                return True, value, []
            return _cerr(value, "boolean")
        if spec == "atom":
            if isinstance(value, str):
                return True, value, []
            return _cerr(value, "atom")
        if spec == "null":
            if value is None:
                return True, None, []
            return _cerr(value, "null")
        if spec == "date":
            if isinstance(value, date) and not isinstance(value, datetime):
                return True, value.isoformat(), []
            if isinstance(value, str):
                return True, value, []
            return _cerr(value, "date")
        if spec == "datetime":
            if isinstance(value, datetime):
                return True, value.isoformat(), []
            if isinstance(value, str):
                return True, value, []
            return _cerr(value, "datetime")
        if spec == "uuid":
            if isinstance(value, str):
                return True, value, []
            return _cerr(value, "uuid")
        return True, value, []  # any/map: no coercion (types.ex:580)

    tag = spec[0]
    if tag == "nullable":
        if value is None:
            return True, None, []
        return coerce_value(spec[1], value)
    if tag == "array":
        if not isinstance(value, list):
            return True, value, []
        errors: list[Error] = []
        out = []
        for i, item in enumerate(value):
            ok, v, errs = coerce_value(spec[1], item)
            if ok:
                out.append(v)
            else:
                errors.extend(
                    Error.new([str(i)] + list(e.path), e.code, e.message) for e in errs
                )
        if errors:
            return False, value, errors
        return True, out, []
    if tag == "object":
        # Types.coerce({:object, schema}) validates with coerce: true in
        # the reference, so nested string→int coercion succeeds at any
        # depth (e.g. inside arrays/unions/nullable wrappers).
        from .driver_validate import validate as _validate_map

        if not isinstance(value, dict):
            return True, value, []  # let validate_value report the type error
        ok, out, errs = _validate_map(spec[1], value, coerce=True)
        if ok:
            return True, out, []
        return False, value, errs
    if tag == "union":
        for member in spec[1]:
            ok, v, _ = coerce_value(member, value)
            if ok:
                return True, v, []
        return False, value, [
            Error.new([], "coercion", "no type in union could coerce value")
        ]
    return True, value, []


def _num_to_str(v: Any) -> str:
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _cerr(value: Any, target: str) -> tuple[bool, Any, list[Error]]:
    # reference renders via inspect/1: nil → 'nil' (types.ex:437-438)
    shown = "nil" if value is None else repr(value)
    return False, value, [
        Error.new([], "coercion", f"cannot coerce '{shown}' to {target}")
    ]


# ---------------------------------------------------------------------------
# JSON-Schema fragments (types.ex:597-706)
# ---------------------------------------------------------------------------


def to_json_schema(spec: Any) -> dict[str, Any]:
    if isinstance(spec, str):
        base = {
            "string": {"type": "string"},
            "integer": {"type": "integer"},
            "float": {"type": "number"},
            "boolean": {"type": "boolean"},
            # types.ex:609 — atoms serialize as strings, flagged in the description
            "atom": {"type": "string", "description": "Atom value"},
            "any": {},
            # types.ex:611 — open map
            "map": {"type": "object", "additionalProperties": True},
            "null": {"type": "null"},
            "date": {"type": "string", "format": "date"},
            "datetime": {"type": "string", "format": "date-time"},
            "uuid": {"type": "string", "format": "uuid"},
        }[spec]
        return dict(base)
    tag = spec[0]
    if tag == "array":
        out = {"type": "array", "items": to_json_schema(spec[1])}
        if len(spec) == 3:
            if "min_items" in spec[2]:
                out["minItems"] = spec[2]["min_items"]
            if "max_items" in spec[2]:
                out["maxItems"] = spec[2]["max_items"]
        return out
    if tag == "union":
        return {"oneOf": [to_json_schema(s) for s in spec[1]]}
    if tag == "tuple":
        # types.ex:640-647 — fixed-length array: prefixItems + items:false
        return {
            "type": "array",
            "items": False,
            "prefixItems": [to_json_schema(s) for s in spec[1]],
            "minItems": len(spec[1]),
            "maxItems": len(spec[1]),
        }
    if tag == "map":
        # types.ex:649-664 — only string keys are representable; :any values
        # and non-string keys degrade to an open object
        key_t, val_t = spec[1], spec[2]
        if key_t == "string" and val_t != "any":
            return {"type": "object", "additionalProperties": to_json_schema(val_t)}
        return {"type": "object", "additionalProperties": True}
    if tag == "nullable":
        # types.ex:666-673 — anyOf, not oneOf (value may satisfy both branches)
        return {"anyOf": [to_json_schema(spec[1]), {"type": "null"}]}
    if tag == "literal":
        return {"const": spec[1]}
    if tag == "object":
        # types.ex:675-677 — bare marker; JsonSchema.generate expands nesting
        return {"type": "object"}
    if tag == "discriminated_union":
        # types.ex:683-706 — self-contained fragment: variants under $defs
        # keyed by variant key, inline oneOf, discriminator w/ mapping
        from .json_schema import _variant_object_schema, _escape_json_pointer

        disc, variants = spec[1], spec[2]
        resolved = {str(k): _variant_object_schema(v, disc) for k, v in variants.items()}
        return {
            "$defs": dict(resolved),
            "oneOf": list(resolved.values()),
            "discriminator": {
                "propertyName": str(disc),
                "mapping": {k: f"#/$defs/{_escape_json_pointer(k)}" for k in resolved},
            },
        }
    raise TypeSpecError(f"unknown type spec: {spec!r}")
