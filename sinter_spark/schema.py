"""Runtime-first Schema definition & composition.

Re-expresses ``Sinter.Schema`` (``/root/reference/lib/sinter/
schema.ex:92-100`` struct, ``schema.ex:156-189`` define/2) as a Python
value object: schemas are *data* built at runtime ("Runtime-First
Design", ``sinter.ex:59-60``), compiled on demand into a Spark
``StructType`` plus a list of bound constraint predicates (see
``binding.py``).

``define`` is the One True Way (``schema.ex:5-7``): every other
constructor (merge, infer, object) funnels through it.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field
from typing import Any, Callable, Iterable, Mapping, Sequence

from . import types as T
from .types import TypeSpecError, validate_type_spec

#: the 10 constraint keys (schema.ex:612-628)
CONSTRAINT_KEYS = (
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
)

_OPTION_KEYS = frozenset(
    CONSTRAINT_KEYS
    + (
        "required",
        "optional",
        "default",
        "description",
        "example",
        "validate",
        "alias",
        "dspex_field_type",
    )
)


@dataclass
class FieldDef:
    """Normalized field definition (schema.ex:66-76)."""

    name: str
    type: Any
    required: bool = True
    constraints: dict[str, Any] = dc_field(default_factory=dict)
    description: str | None = None
    example: Any = None
    default: Any = None
    validate: list[Callable] | None = None
    alias: str | None = None
    dspex_field_type: str | None = None

    @property
    def optional(self) -> bool:
        return not self.required


@dataclass
class SchemaConfig:
    """Schema-level config (schema.ex:78-84)."""

    title: str | None = None
    description: str | None = None
    strict: bool = False
    post_validate: Callable | None = None
    pre_validate: Callable | None = None


class Schema:
    """A runtime schema value: ordered fields + config + metadata."""

    def __init__(self, fields: dict[str, FieldDef], config: SchemaConfig, metadata: dict | None = None):
        self.fields = fields
        self.config = config
        self.metadata = metadata or {}

    # -- construction -------------------------------------------------------

    @staticmethod
    def define(
        field_specs: Iterable[tuple],
        *,
        title: str | None = None,
        description: str | None = None,
        strict: bool = False,
        post_validate: Callable | None = None,
        pre_validate: Callable | None = None,
    ) -> "Schema":
        """Normalize ``(name, type_spec, opts?)`` specs → Schema.

        Validates spec legality and option compatibility the way
        ``schema.ex:156-189`` + ``schema.ex:425-540`` do (required/optional
        mutually exclusive; default implies optional; min/max_items migrate
        into the array type spec, ``schema.ex:665-686``).
        """
        # hook options must be callables (schema.ex raises ArgumentError
        # on post_validate: "not_a_function", schema_test.exs:206-215)
        for hook_name, hook in (("post_validate", post_validate), ("pre_validate", pre_validate)):
            if hook is not None and not callable(hook):
                raise ValueError(f"{hook_name} must be callable, got {hook!r}")
        fields: dict[str, FieldDef] = {}
        for spec in field_specs:
            fd = _normalize_field_spec(spec)
            if fd.name in fields:
                raise ValueError(f"duplicate field: {fd.name}")
            fields[fd.name] = fd
        cfg = SchemaConfig(
            title=title,
            description=description,
            strict=bool(strict),
            post_validate=post_validate,
            pre_validate=pre_validate,
        )
        # schema.ex stamps creation metadata surfaced as x-sinter-* keys by
        # JsonSchema.generate (json_schema.ex:720-729)
        from datetime import datetime, timezone

        from . import __version__ as _pkg_version

        meta = {
            "sinter_version": _pkg_version,
            "field_count": len(fields),
            "created_at": datetime.now(timezone.utc).isoformat(),
        }
        return Schema(fields, cfg, meta)

    @staticmethod
    def object(fields_or_schema: Any, **opts) -> tuple:
        """Nested object type spec (schema.ex:788-795)."""
        if isinstance(fields_or_schema, Schema):
            return ("object", fields_or_schema)
        return ("object", Schema.define(fields_or_schema, **opts))

    # -- introspection (schema.ex:279-421,740-778) --------------------------

    def field_names(self) -> list[str]:
        return list(self.fields)

    def required_fields(self) -> list[str]:
        return [n for n, f in self.fields.items() if f.required]

    def optional_fields(self) -> list[str]:
        return [n for n, f in self.fields.items() if not f.required]

    @property
    def strict(self) -> bool:
        return self.config.strict

    def field_aliases(self) -> dict[str, str]:
        return {n: f.alias for n, f in self.fields.items() if f.alias}

    def field_types(self) -> dict[str, Any]:
        return {n: f.type for n, f in self.fields.items()}

    def constraints(self) -> dict[str, dict[str, Any]]:
        return {n: dict(f.constraints) for n, f in self.fields.items()}

    def info(self) -> dict[str, Any]:
        return {
            "title": self.config.title,
            "description": self.config.description,
            "strict": self.config.strict,
            "field_count": len(self.fields),
            "required_fields": self.required_fields(),
            "optional_fields": self.optional_fields(),
        }

    # -- Spark compilation ---------------------------------------------------

    def spark_ddl(self) -> str:
        """DDL string of the expected table shape."""
        parts = []
        for n, f in self.fields.items():
            parts.append(f"{n} {T.spark_ddl(f.type)}")
        return ", ".join(parts)

    def struct_type(self):
        from pyspark.sql.types import _parse_datatype_string

        return _parse_datatype_string(self.spark_ddl())

    def __repr__(self) -> str:  # pragma: no cover
        return f"Schema({list(self.fields)}, strict={self.config.strict})"


def _normalize_field_spec(spec: tuple) -> FieldDef:
    if len(spec) == 2:
        name, type_spec = spec
        opts: Mapping[str, Any] = {}
    elif len(spec) == 3:
        name, type_spec, opts = spec
    else:
        raise ValueError(f"field spec must be (name, type) or (name, type, opts): {spec!r}")
    if not isinstance(name, str) or not name:
        raise ValueError(f"field name must be a non-empty string: {name!r}")
    unknown = set(opts) - _OPTION_KEYS
    if unknown:
        raise ValueError(f"unknown options for field {name!r}: {sorted(unknown)}")
    if "required" in opts and opts.get("optional"):
        # mutually exclusive (schema.ex:535-539)
        raise ValueError(f"field {name!r}: required and optional are mutually exclusive")

    # required resolution (schema.ex:593-610): explicit required wins;
    # optional → false; default present → false; else true.
    if "required" in opts:
        required = bool(opts["required"])
    elif opts.get("optional", False):
        required = False
    elif "default" in opts:
        required = False
    else:
        required = True

    constraints = {k: opts[k] for k in CONSTRAINT_KEYS if k in opts}
    if "format" in constraints and isinstance(constraints["format"], str):
        constraints["format"] = re.compile(constraints["format"])
    if "choices" in constraints and not isinstance(constraints["choices"], (list, tuple)):
        raise ValueError(f"field {name!r}: choices must be a list")
    # constraint VALUE validation (reference: NimbleOptions rejects e.g.
    # min_length: "10" at define time, schema_test.exs:198-204)
    for key in ("min_length", "max_length", "min_items", "max_items"):
        if key in constraints and (isinstance(constraints[key], bool) or not isinstance(constraints[key], int)):
            raise ValueError(f"field {name!r}: {key} must be an integer, got {constraints[key]!r}")
    for key in ("gt", "gteq", "lt", "lteq"):
        if key in constraints and (isinstance(constraints[key], bool) or not isinstance(constraints[key], (int, float))):
            raise ValueError(f"field {name!r}: {key} must be a number, got {constraints[key]!r}")

    # min_items/max_items migrate into array type spec (schema.ex:665-686)
    if isinstance(type_spec, tuple) and type_spec and type_spec[0] == "array":
        items = {k: constraints.pop(k) for k in ("min_items", "max_items") if k in constraints}
        if items:
            base = type_spec[2] if len(type_spec) == 3 else {}
            merged = {**base, **items}
            type_spec = ("array", type_spec[1], merged)

    validate_type_spec(type_spec)

    validators = opts.get("validate")
    if validators is not None and not isinstance(validators, (list, tuple)):
        validators = [validators]

    return FieldDef(
        name=name,
        type=type_spec,
        required=required,
        constraints=constraints,
        description=opts.get("description"),
        example=opts.get("example"),
        default=opts.get("default"),
        validate=list(validators) if validators else None,
        alias=opts.get("alias"),
        dspex_field_type=opts.get("dspex_field_type"),
    )


def merge_schemas(schemas: Sequence[Schema], **opts) -> Schema:
    """Union of fields; later schema wins conflicts; first non-nil
    title/description; **last** strict wins (sinter.ex:432-463,569-591)."""
    if not schemas:
        raise ValueError("merge_schemas requires at least one schema")
    fields: dict[str, FieldDef] = {}
    title = None
    description = None
    for s in schemas:
        for n, f in s.fields.items():
            fields[n] = f  # later wins
        if title is None:
            title = s.config.title
        if description is None:
            description = s.config.description
    strict = schemas[-1].config.strict
    cfg = SchemaConfig(
        title=opts.get("title", title),
        description=opts.get("description", description),
        strict=opts.get("strict", strict),
        # hooks, reference-exact (sinter.ex:584 merge_schema_configs):
        # post_validate = FIRST schema carrying one (find_first_non_nil,
        # forward order — unlike fields, where later wins); pre_validate
        # is NOT merged at all in the reference (absent from the merged
        # config). Explicit opts always win.
        post_validate=opts.get(
            "post_validate",
            next((s.config.post_validate for s in schemas if s.config.post_validate), None),
        ),
        pre_validate=opts.get("pre_validate"),
    )
    # stamp creation metadata exactly as define does (merged schemas
    # must not emit x-sinter-version '0' / missing created_at)
    from datetime import datetime, timezone

    from . import __version__ as _pkg_version

    meta = {
        "sinter_version": _pkg_version,
        "field_count": len(fields),
        "created_at": datetime.now(timezone.utc).isoformat(),
    }
    return Schema(dict(fields), cfg, meta)
