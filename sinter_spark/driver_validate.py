"""Pure-Python per-map validation pipeline.

The 5-stage pipeline of ``/root/reference/lib/sinter/validator.ex:9-15``
(orchestrated at ``validator.ex:87-105``): pre_validate → normalize →
input-format check → field validation → strict check → post_validate.

This is the *driver-side / kernel-side* engine: it validates plain
Python dicts. It exists for three reasons:

1. the scalar API helpers (``validate_type``/``validate_value``/
   ``validate_many``, ``sinter.ex:106-256``) run on the driver,
2. nested composite columns (objects / discriminated unions / tuples)
   are validated inside Arrow-batch kernels by calling this per element
   on already-deserialized Python values, and
3. it is the executable semantic spec that the vectorized Column-
   predicate binding (``binding.py``) is tested against.

Unlike a fixed-schema table, dicts distinguish *absent key* from
*present nil* — this module keeps the reference's exact semantics
(required fires only on absence, ``validator.ex:226-243``); the table
binding documents null ≡ missing (SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Iterator, Mapping

from .errors import Error, ValidationError
from .schema import CONSTRAINT_KEYS, FieldDef, Schema
from .types import coerce_value, type_name, validate_value


def validate(
    schema: Schema,
    data: Any,
    *,
    coerce: bool = False,
    strict: bool | None = None,
    path: tuple = (),
) -> tuple[bool, dict | None, list[Error]]:
    """Validate one map; returns ``(ok, validated, errors)``."""
    base_path = tuple(str(p) for p in path)

    # 1. pre_validate hook (validator.ex:614-637)
    if schema.config.pre_validate is not None:
        try:
            data = schema.config.pre_validate(data)
        except Exception as e:  # noqa: BLE001 — reference wraps all raises
            return False, None, [
                Error.with_context(
                    base_path,
                    "pre_validate_error",
                    f"pre_validate function raised: {e}",
                    {"exception": type(e).__name__},
                )
            ]

    # 2. normalize input: non-string keys → strings (validator.ex:685-701)
    if isinstance(data, Mapping):
        data = {str(k): v for k, v in data.items()}
    else:
        # 3. input-format check (validator.ex:185-191)
        return False, None, [
            Error.new(base_path, "input_format", f"Expected map, got: {data!r}")
        ]

    # 4. per-field validation (validator.ex:193-243)
    validated: dict[str, Any] = {}
    errors: list[Error] = []
    for name, fd in schema.fields.items():
        fpath = base_path + (name,)
        # alias-aware fetch: alias wins when both present
        # (validator.ex:245-263, field_alias_test.exs:6-72)
        if fd.alias is not None and fd.alias in data:
            present, value = True, data[fd.alias]
        elif name in data:
            present, value = True, data[name]
        else:
            present, value = False, None

        if not present:
            if fd.default is not None:
                # nil default NOT applied (validator_test.exs:180-192)
                validated[name] = fd.default
            elif fd.required:
                errors.append(Error.new(fpath, "required", "field is required"))
            # optional missing → omitted from output (validator.ex:230-232)
            continue

        ok, value_out, ferrs = _validate_field_value(fd, value, fpath, coerce)
        if ok:
            validated[name] = value_out
        else:
            errors.extend(ferrs)

    if errors:
        return False, None, errors

    # 5. strict-mode check (validator.ex:535-565)
    effective_strict = schema.config.strict if strict is None else strict
    if effective_strict:
        known = set(schema.fields) | {f.alias for f in schema.fields.values() if f.alias}
        extra = [k for k in data if k not in known]
        if extra:
            return False, None, [
                Error.new(base_path, "strict", f"unexpected fields: {extra!r}")
            ]

    # 6. post_validate hook (validator.ex:567-612)
    if schema.config.post_validate is not None:
        try:
            result = schema.config.post_validate(validated)
        except Exception as e:  # noqa: BLE001
            return False, None, [
                Error.new(
                    base_path,
                    "post_validation",
                    f"Post-validation function failed: {e}",
                )
            ]
        ok, validated, perrs = _interpret_post_result(result, validated, base_path)
        if not ok:
            return False, None, perrs

    return True, validated, []


def _validate_field_value(
    fd: FieldDef, value: Any, fpath: tuple, coerce: bool
) -> tuple[bool, Any, list[Error]]:
    """coerce? → type → constraints → custom validators
    (order: validator.ex:310-358)."""
    spec = fd.type

    # nullable-wrapped objects recurse like bare objects when the value
    # is present (reference handles {:nullable, {:object, s}} explicitly)
    if (
        isinstance(spec, tuple)
        and spec
        and spec[0] == "nullable"
        and isinstance(spec[1], tuple)
        and spec[1]
        and spec[1][0] == "object"
        and value is not None
    ):
        spec = spec[1]

    # nested object recursion (validator.ex:298-308)
    if isinstance(spec, tuple) and spec and spec[0] == "object":
        if not isinstance(value, Mapping):
            return False, value, [
                Error.new(fpath, "type", f"expected object, got {type_name(value)}")
            ]
        ok, nested, errs = validate(spec[1], value, coerce=coerce, path=fpath)
        if not ok:
            return False, value, errs
        value = nested
    else:
        if coerce:
            cok, value, cerrs = coerce_value(spec, value)
            if not cok:
                return False, value, [
                    Error.new(fpath, e.code, e.message) if not e.path
                    else Error.new(fpath + e.path, e.code, e.message)
                    for e in cerrs
                ]
        ok, value, terrs = validate_value(spec, value, fpath)
        if not ok:
            return False, value, terrs

    # constraints on (possibly coerced) value (validator_test.exs:450-464)
    cerrs = check_constraints(fd.constraints, value, fpath)
    if cerrs:
        return False, value, cerrs

    # custom validators, short-circuit at first error (validator.ex:362-408)
    if fd.validate:
        for fn in fd.validate:
            try:
                result = fn(value)
            except Exception as e:  # noqa: BLE001
                return False, value, [
                    Error.with_context(
                        fpath,
                        "custom_validation_error",
                        f"field validator raised: {e}",
                        {"value": str(value)},
                    )
                ]
            if result is None or result is True:
                continue
            if isinstance(result, tuple) and len(result) == 2:
                tag, payload = result
                if tag == "ok":
                    value = payload
                    continue
                if tag == "error":
                    return False, value, [
                        Error.with_context(
                            fpath, "custom_validation", str(payload), {"value": str(value)}
                        )
                    ]
            return False, value, [
                Error.new(
                    fpath,
                    "custom_validation_error",
                    f"field validator returned invalid format: {result!r}",
                )
            ]
    return True, value, []


def check_constraints(constraints: Mapping[str, Any], value: Any, path: tuple) -> list[Error]:
    """All 10 constraints, independent, incompatible types silently
    skipped (validator.ex:410-512)."""
    errors: list[Error] = []
    is_str = isinstance(value, str)
    is_list = isinstance(value, list)
    is_num = isinstance(value, (int, float)) and not isinstance(value, bool)

    def length_of(v: Any) -> int:
        return len(v)  # Python len on str is codepoints, matching String.length

    for key in CONSTRAINT_KEYS:
        if key not in constraints:
            continue
        t = constraints[key]
        if key == "min_length" and (is_str or is_list):
            if length_of(value) < t:
                errors.append(
                    Error.new(path, "min_length", f"must be at least {t} characters/items long")
                )
        elif key == "max_length" and (is_str or is_list):
            if length_of(value) > t:
                errors.append(
                    Error.new(path, "max_length", f"must be at most {t} characters/items long")
                )
        elif key == "min_items" and is_list:
            if len(value) < t:
                errors.append(Error.new(path, "min_items", f"must contain at least {t} items"))
        elif key == "max_items" and is_list:
            if len(value) > t:
                errors.append(Error.new(path, "max_items", f"must contain at most {t} items"))
        elif key == "gt" and is_num:
            if not value > t:
                errors.append(Error.new(path, "gt", f"must be greater than {t}"))
        elif key == "gteq" and is_num:
            if not value >= t:
                errors.append(
                    Error.new(path, "gteq", f"must be greater than or equal to {t}")
                )
        elif key == "lt" and is_num:
            if not value < t:
                errors.append(Error.new(path, "lt", f"must be less than {t}"))
        elif key == "lteq" and is_num:
            if not value <= t:
                errors.append(Error.new(path, "lteq", f"must be less than or equal to {t}"))
        elif key == "format" and is_str:
            if not constraints["format"].search(value):
                errors.append(Error.new(path, "format", "does not match required format"))
        elif key == "choices":
            allowed = constraints["choices"]
            if value not in allowed:
                errors.append(Error.new(path, "choices", f"must be one of: {list(allowed)!r}"))
    return errors


def _interpret_post_result(result: Any, validated: dict, path: tuple):
    """Post-validate return protocol (validator.ex:575-600)."""
    if isinstance(result, tuple) and len(result) == 2:
        tag, payload = result
        if tag == "ok" and isinstance(payload, dict):
            return True, payload, []
        if tag == "error":
            if isinstance(payload, str):
                return False, validated, [Error.new(path, "post_validation", payload)]
            if isinstance(payload, Error):
                return False, validated, [payload]
            if isinstance(payload, list):
                return False, validated, payload
    if isinstance(result, dict):
        return True, result, []
    return False, validated, [
        Error.new(
            path,
            "post_validation",
            f"Post-validation function returned invalid format: {result!r}",
        )
    ]


# ---------------------------------------------------------------------------
# Batch / stream wrappers (validator.ex:148-181, 673-679)
# ---------------------------------------------------------------------------


def validate_many(
    schema: Schema, data_list: Iterable[Any], **opts
) -> tuple[bool, list[dict] | None, dict[int, list[Error]]]:
    """All-or-nothing batch; errors keyed by index, index prefixed onto
    error paths (validator.ex:148-181)."""
    oks: list[dict] = []
    errs: dict[int, list[Error]] = {}
    for i, item in enumerate(data_list):
        ok, validated, errors = validate(schema, item, path=(i,), **opts)
        if ok:
            oks.append(validated)
        else:
            errs[i] = errors
    if errs:
        return False, None, errs
    return True, oks, {}


def validate_stream(schema: Schema, data_iter: Iterable[Any], **opts) -> Iterator:
    """Lazy constant-memory stream of per-item results (validator.ex:673-679)."""
    for item in data_iter:
        yield validate(schema, item, **opts)


def validate_bang(schema: Schema, data: Any, **opts) -> dict:
    """validate! — raises ValidationError (error.ex:352-403)."""
    ok, validated, errors = validate(schema, data, **opts)
    if not ok:
        raise ValidationError(errors)
    return validated
