"""JSON Schema generation (driver-side, pure Python).

Port of the observable behavior of ``/root/reference/lib/sinter/
json_schema.ex``: ``generate/2`` (``json_schema.ex:98-138``), constraint
mapping (``json_schema.ex:393-420``), provider variants
(``json_schema.ex:151-155,432-546``; openai/anthropic → draft 7,
``additionalProperties: false``, recursive strictness, format
stripping), and discriminated-union hoisting to ``$defs``
(``json_schema.ex:563-641``). No Spark involvement — this doubles as a
human-readable contract of the expected table shape.
"""

from __future__ import annotations

from typing import Any

from .schema import Schema
from .types import to_json_schema as type_fragment

DRAFT_2020_12 = "https://json-schema.org/draft/2020-12/schema"
DRAFT_7 = "http://json-schema.org/draft-07/schema#"

_CONSTRAINT_MAP = {
    # (constraint, json-schema keyword) — json_schema.ex:393-420
    "min_length": "minLength",
    "max_length": "maxLength",
    "min_items": "minItems",
    "max_items": "maxItems",
    "gt": "exclusiveMinimum",
    "gteq": "minimum",
    "lt": "exclusiveMaximum",
    "lteq": "maximum",
    "choices": "enum",
}


def _field_fragment(fd, provider: str | None) -> dict[str, Any]:
    frag = type_fragment(fd.type)
    for key, kw in _CONSTRAINT_MAP.items():
        if key in fd.constraints:
            v = fd.constraints[key]
            frag[kw] = list(v) if key == "choices" else v
    if "format" in fd.constraints:
        if provider is None:
            frag["pattern"] = fd.constraints["format"].pattern
        # providers strip format/pattern (json_schema.ex:478-504)
    if fd.description:
        frag["description"] = fd.description
    if fd.example is not None:
        frag["examples"] = [fd.example]
    if fd.default is not None:
        frag["default"] = fd.default
    return frag


def generate(schema: Schema, *, provider: str | None = None, strict: bool | None = None) -> dict[str, Any]:
    defs: dict[str, Any] = {}
    out = _generate_object(schema, provider, strict, defs)
    out["$schema"] = DRAFT_7 if provider else DRAFT_2020_12
    if defs:
        out["$defs" if not provider else "definitions"] = defs
    if schema.config.title:
        out["title"] = schema.config.title
    if schema.config.description:
        out["description"] = schema.config.description
    return out


def _generate_object(schema: Schema, provider, strict, defs: dict) -> dict[str, Any]:
    props: dict[str, Any] = {}
    required: list[str] = []
    for name, fd in schema.fields.items():
        t = fd.type
        if isinstance(t, tuple) and t and t[0] == "discriminated_union":
            # hoist variants to $defs + discriminator mapping
            # (json_schema.ex:563-641)
            refs = []
            mapping = {}
            for key, variant in t[2].items():
                def_name = f"{name}_{key}"
                defs[def_name] = _generate_object(variant, provider, strict, defs)
                ref = f"#/{'$defs' if not provider else 'definitions'}/{def_name}"
                refs.append({"$ref": ref})
                mapping[str(key)] = ref
            props[name] = {
                "oneOf": refs,
                "discriminator": {"propertyName": t[1], "mapping": mapping},
            }
        elif isinstance(t, tuple) and t and t[0] == "object":
            props[name] = _generate_object(t[1], provider, strict, defs)
        else:
            props[name] = _field_fragment(fd, provider)
        if fd.required:
            required.append(name)
        if fd.alias:
            props[name]["x-sinter-alias"] = fd.alias
    out: dict[str, Any] = {"type": "object", "properties": props}
    if required:
        out["required"] = required
    effective_strict = schema.config.strict if strict is None else strict
    if effective_strict or provider in ("openai", "anthropic"):
        # providers force additionalProperties: false recursively
        # (json_schema.ex:432-475,527-546)
        out["additionalProperties"] = False
    return out


def for_provider(schema: Schema, provider: str, **opts) -> dict[str, Any]:
    """openai/anthropic variants (json_schema.ex:151-155)."""
    return generate(schema, provider=provider, **opts)


def validate_schema(schema: Schema, **opts) -> tuple[bool, str]:
    """Meta-schema validation of the generated JSON Schema
    (json_schema.ex:176-188 validates via JSV). Uses the ``jsonschema``
    package when present; degrades to a structural self-check otherwise
    (the package is not guaranteed in this container, SURVEY.md §7.0)."""
    doc = generate(schema, **opts)
    try:
        import jsonschema  # type: ignore

        jsonschema.validators.validator_for(doc).check_schema(doc)
        return True, "validated against meta-schema"
    except ImportError:
        required = set(doc.get("required", []))
        props = set(doc.get("properties", {}))
        if not required <= props:
            return False, f"required fields missing from properties: {required - props}"
        return True, "jsonschema package unavailable; structural self-check passed"
    except Exception as e:  # noqa: BLE001
        return False, str(e)
