"""Top-level API helpers (the ``Sinter`` module surface).

Re-expresses ``/root/reference/lib/sinter.ex``: one-off value helpers
(``sinter.ex:106-191``), heterogeneous batch (``sinter.ex:210-256``),
reusable validators (``sinter.ex:279-319``), schema inference
(``sinter.ex:368-399,470-548``). All funnel through the One True
Pipeline (``sinter.ex:6-10``) in :mod:`driver_validate`.
"""

from __future__ import annotations

from collections import Counter
from typing import Any, Callable, Iterable, Mapping, Sequence

from .driver_validate import validate, validate_many as _validate_many_maps
from .errors import Error
from .schema import Schema

_TEMP = "__temp__"


def _strip_temp(errors: list[Error]) -> list[Error]:
    """Strip the temp field from error paths (sinter.ex:131-139)."""
    out = []
    for e in errors:
        path = tuple(p for p in e.path if p != _TEMP)
        out.append(Error(path, e.code, e.message, e.context))
    return out


def validate_type(type_spec: Any, value: Any, *, coerce: bool = False, **constraints):
    """One-off single-value validation via a temp schema (sinter.ex:106-141)."""
    schema = Schema.define([(_TEMP, type_spec, constraints)])
    ok, validated, errors = validate(schema, {_TEMP: value}, coerce=coerce)
    if ok:
        return True, validated[_TEMP], []
    return False, value, _strip_temp(errors)


def validate_value(name: str, type_spec: Any, value: Any, *, coerce: bool = False, **constraints):
    """Named single-value validation (sinter.ex:166-191)."""
    schema = Schema.define([(name, type_spec, constraints)])
    ok, validated, errors = validate(schema, {name: value}, coerce=coerce)
    if ok:
        return True, validated[name], []
    return False, value, errors


def validate_many_typed(pairs: Sequence[tuple], *, coerce: bool = False):
    """Heterogeneous batch (sinter.ex:210-256). Each entry is one of
    ``(type_spec, value)``, ``(name, type_spec, value)`` or
    ``(name, type_spec, value, constraints_dict)``; per-field
    constraints merge with the global options."""
    results = []
    errs: dict[int, list[Error]] = {}
    for i, pair in enumerate(pairs):
        if len(pair) == 2:
            spec, value = pair
            ok, v, errors = validate_type(spec, value, coerce=coerce)
        elif len(pair) == 3:
            name, spec, value = pair
            ok, v, errors = validate_value(name, spec, value, coerce=coerce)
        elif len(pair) == 4:
            name, spec, value, cons = pair
            ok, v, errors = validate_value(name, spec, value, coerce=coerce, **dict(cons))
        else:
            raise ValueError(f"validate_many pair must have 2-4 elements, got {pair!r}")
        if ok:
            results.append(v)
        else:
            errs[i] = [Error((str(i),) + e.path, e.code, e.message, e.context) for e in errors]
    if errs:
        return False, None, errs
    return True, results, {}


def validator_for(schema_or_spec, *, coerce: bool = False, constraints: Mapping | None = None, **opts) -> Callable[[Any], tuple]:
    """Reusable validator closure (sinter.ex:279-296). Given a Schema,
    validates maps against it; given a type spec (the reference form,
    ``Sinter.validator_for(:integer, gt: 0)``), validates single values
    with the captured constraints."""
    if isinstance(schema_or_spec, Schema):
        def _run_schema(data: Any):
            return validate(schema_or_spec, data, coerce=coerce, **opts)

        return _run_schema

    cons = dict(constraints or {})
    cons.update(opts)

    def _run_value(value: Any):
        return validate_type(schema_or_spec, value, coerce=coerce, **cons)

    return _run_value


def batch_validator_for(schema_or_specs, **opts) -> Callable[[Any], tuple]:
    """Reusable multi-field validator (sinter.ex:298-319). Given the
    reference form — a list of field specs — builds the schema once and
    validates one map per call (errors as a flat list). Given a Schema,
    validates a LIST of maps per call (the distributed-batch extension,
    errors keyed by index)."""
    if isinstance(schema_or_specs, Schema):
        def _run_many(data_list: Iterable[Any]):
            return _validate_many_maps(schema_or_specs, data_list, **opts)

        return _run_many

    schema = Schema.define(schema_or_specs)

    def _run_one(data: Any):
        return validate(schema, data, **opts)

    return _run_one


# ---------------------------------------------------------------------------
# Schema inference (sinter.ex:368-399, 470-548)
# ---------------------------------------------------------------------------


def _infer_type(value: Any) -> Any:
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, int):
        return "integer"
    if isinstance(value, float):
        return "float"
    if isinstance(value, str):
        return "string"
    if isinstance(value, dict):
        return "map"
    if isinstance(value, list):
        elem_types = {repr(_infer_type(v)) for v in value}
        if len(elem_types) == 1 and value:
            return ("array", _infer_type(value[0]))
        return ("array", "any")  # mixed arrays → array of any (sinter.ex:540-546)
    return "any"


def infer_schema(examples: Sequence[Mapping[str, Any]], *, min_occurrence_ratio: float = 0.8) -> Schema:
    """Field discovery across examples: most-common-type vote; required
    iff present in ≥ ratio of examples (sinter.ex:368-399,470-548).
    Raises on empty or non-map examples like the reference."""
    examples = list(examples)
    if not examples:
        raise ValueError("infer_schema requires at least one example")
    if not all(isinstance(ex, Mapping) for ex in examples):
        raise ValueError("infer_schema examples must be maps")
    n = len(examples)
    presence: Counter[str] = Counter()
    type_votes: dict[str, Counter] = {}
    type_values: dict[str, dict[str, Any]] = {}
    for ex in examples:
        for key, value in ex.items():
            key = str(key)
            presence[key] += 1
            t = _infer_type(value)
            type_votes.setdefault(key, Counter())[repr(t)] += 1
            type_values.setdefault(key, {})[repr(t)] = t
    field_specs = []
    for key in presence:
        winner_repr, _ = type_votes[key].most_common(1)[0]
        t = type_values[key][winner_repr]
        required = presence[key] / n >= min_occurrence_ratio
        field_specs.append((key, t, {"required": required}))
    return Schema.define(field_specs)


def infer_schema_from_df(df, *, sample: int = 1000, min_occurrence_ratio: float = 0.8) -> Schema:
    """DataFrame census version: one aggregate pass over a sample computing
    per-column null rates, then map Spark types → specs (SURVEY.md §1.3)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as ST

    sdf = df.limit(sample)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in df.columns:
        aggs.append(F.sum(F.col(c).isNotNull().cast("long")).alias(f"nn_{c}"))
    row = sdf.agg(*aggs).collect()[0]
    n = row["__n"] or 1

    def spec_for(dt) -> Any:
        if isinstance(dt, (ST.ByteType, ST.ShortType, ST.IntegerType, ST.LongType)):
            return "integer"
        if isinstance(dt, (ST.FloatType, ST.DoubleType, ST.DecimalType)):
            return "float"
        if isinstance(dt, ST.BooleanType):
            return "boolean"
        if isinstance(dt, ST.StringType):
            return "string"
        if isinstance(dt, ST.ArrayType):
            return ("array", spec_for(dt.elementType))
        if isinstance(dt, ST.MapType):
            return "map"
        if isinstance(dt, (ST.DateType,)):
            return "date"
        if isinstance(dt, (ST.TimestampType, ST.TimestampNTZType)):
            return "datetime"
        return "any"

    field_specs = []
    for f in df.schema.fields:
        ratio = (row[f"nn_{f.name}"] or 0) / n
        field_specs.append((f.name, spec_for(f.dataType), {"required": ratio >= min_occurrence_ratio}))
    return Schema.define(field_specs)


def _spec_from_json(spec: Any) -> Any:
    """JSON type spec → the tuple form ``Schema.define`` takes:
    lists become tuples recursively; a dict with a ``fields`` key
    becomes a nested object Schema."""
    if isinstance(spec, list):
        return tuple(_spec_from_json(s) for s in spec)
    if isinstance(spec, Mapping) and "fields" in spec:
        return ("object", schema_from_dict(spec))
    return spec


def schema_from_dict(d: Mapping[str, Any]) -> Schema:
    """Build a Schema from a JSON-expressible dict — the serialized
    form the CLI (``python -m sinter_spark validate --schema f.json``)
    reads::

        {"title": "...", "strict": true,
         "fields": [["w", "integer", {"gt": 0}],
                    ["caption", "string", {"min_length": 1}],
                    ["embedding", ["array", "float"], {"min_items": 64}],
                    ["meta", {"fields": [["lang", "string"]]}, {"optional": true}]]}

    Type specs convert lists→tuples recursively; a dict bearing
    ``fields`` nests as an object schema. ``pre_validate`` /
    ``post_validate`` hooks are callables and therefore library-only —
    a hook key in the JSON raises."""
    if "fields" not in d:
        raise ValueError("schema dict needs a 'fields' list")
    for hook in ("pre_validate", "post_validate"):
        if hook in d:
            raise ValueError(f"{hook} is a callable hook — not expressible in JSON; attach it in code")
    specs = []
    for spec in d["fields"]:
        if not isinstance(spec, (list, tuple)) or len(spec) not in (2, 3):
            raise ValueError(f"field spec must be [name, type] or [name, type, opts]: {spec!r}")
        name, ts = spec[0], _spec_from_json(spec[1])
        specs.append((name, ts, spec[2]) if len(spec) == 3 else (name, ts))
    return Schema.define(
        specs,
        title=d.get("title"),
        description=d.get("description"),
        strict=bool(d.get("strict", False)),
    )


def _spec_to_json(spec: Any) -> Any:
    """Inverse of ``_spec_from_json``: tuples → lists, nested Schemas →
    ``{"fields": ...}`` dicts, compiled regexes → their patterns."""
    if isinstance(spec, Schema):
        return _schema_body(spec)
    if isinstance(spec, tuple):
        # ("object", Schema) flattens to the nested-dict form
        if len(spec) == 2 and spec[0] == "object" and isinstance(spec[1], Schema):
            return _schema_body(spec[1])
        return [_spec_to_json(s) for s in spec]
    if isinstance(spec, dict):
        return {k: _spec_to_json(v) for k, v in spec.items()}
    if hasattr(spec, "pattern"):  # compiled regex
        return spec.pattern
    return spec


def _schema_body(schema: Schema) -> dict[str, Any]:
    body: dict[str, Any] = {}
    if schema.config.title:
        body["title"] = schema.config.title
    if schema.config.description:
        body["description"] = schema.config.description
    if schema.config.strict:
        body["strict"] = True
    fields = []
    for fd in schema.fields.values():
        if fd.validate is not None:
            raise ValueError(
                f"field {fd.name!r} carries a callable validator — not expressible "
                "in JSON; strip it or serialize the schema in code"
            )
        opts: dict[str, Any] = {"required": fd.required}
        for k, v in fd.constraints.items():
            opts[k] = v.pattern if hasattr(v, "pattern") else (
                list(v) if isinstance(v, tuple) else v
            )
        if fd.default is not None:
            opts["default"] = fd.default
        if fd.description is not None:
            opts["description"] = fd.description
        if fd.alias is not None:
            opts["alias"] = fd.alias
        if fd.example is not None:
            opts["example"] = fd.example
        fields.append([fd.name, _spec_to_json(fd.type), opts])
    body["fields"] = fields
    return body


def schema_to_dict(schema: Schema) -> dict[str, Any]:
    """Serialize a Schema to the JSON-expressible dict
    :func:`schema_from_dict` reads — the CLI's ``infer`` command writes
    this form so its output feeds ``validate --schema`` directly.
    Round-trip invariant: field names, types, required flags, and
    constraints survive exactly; callable hooks/validators raise."""
    for hook in ("pre_validate", "post_validate"):
        if getattr(schema.config, hook) is not None:
            raise ValueError(f"schema carries a callable {hook} hook — not expressible in JSON")
    return _schema_body(schema)
