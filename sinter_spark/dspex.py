"""DSPEx/meta operators (§2.7 tail surface).

Re-expresses ``Sinter.DSPEx`` (``/root/reference/lib/sinter/dspex.ex``):
signature creation (``dspex.ex:44-65``), LLM-output validation with
error context (``dspex.ex:93-109``), failure-pattern mining → relaxed
schema (``dspex.ex:132-158,220-448``), provider bundles
(``dspex.ex:185-216``). The distributed twist: failure mining also
accepts a *violations DataFrame* — ``groupBy(code, path).count()`` over
millions of rows instead of a driver list.
"""

from __future__ import annotations

from typing import Any, Sequence

from .driver_validate import validate
from .errors import Error, with_llm_context
from .json_schema import generate
from .schema import FieldDef, Schema, merge_schemas

_CONSTRAINT_CODES = frozenset(
    {"min_length", "max_length", "min_items", "max_items", "gt", "lt", "gteq", "lteq", "format", "choices"}
)


def create_signature(input_fields: Sequence[tuple], output_fields: Sequence[tuple], **opts) -> Schema:
    """Merge input+output field lists, tagging dspex_field_type
    (dspex.ex:44-65)."""

    def tag(specs, kind):
        out = []
        for spec in specs:
            name, t = spec[0], spec[1]
            o = dict(spec[2]) if len(spec) == 3 else {}
            o["dspex_field_type"] = kind
            out.append((name, t, o))
        return out

    return Schema.define(tag(input_fields, "input") + tag(output_fields, "output"), **opts)


def validate_llm_output(schema: Schema, output: Any, *, prompt: str = "", **opts):
    """Validate + attach LLM context to errors (dspex.ex:93-109)."""
    ok, validated, errors = validate(schema, output, **opts)
    if ok:
        return True, validated, []
    return False, None, [with_llm_context(e, output, prompt) for e in errors]


def prepare_for_llm(schema: Schema, provider: str = "openai") -> dict:
    """JSON schema + provider metadata bundle (dspex.ex:185-216)."""
    return {
        "json_schema": generate(schema, provider=provider),
        "provider": provider,
        "field_count": len(schema.fields),
        "required_fields": schema.required_fields(),
    }


def analyze_failure_patterns(schema: Schema, failures: Sequence[dict]) -> dict:
    """Mine failure examples: frequencies of missing/type/constraint
    errors per field + extra fields in ≥30% of examples
    (dspex.ex:220-300)."""
    missing: dict[str, int] = {}
    type_mm: dict[str, int] = {}
    constraint: dict[str, int] = {}
    for ex in failures:
        ok, _, errors = validate(schema, ex)
        if ok:
            continue
        for e in errors:
            field = e.path[0] if e.path else None
            if field is None:
                continue
            if e.code == "required":
                missing[field] = missing.get(field, 0) + 1
            elif e.code == "type":
                type_mm[field] = type_mm.get(field, 0) + 1
            elif e.code in _CONSTRAINT_CODES:
                constraint[field] = constraint.get(field, 0) + 1
    known = set(schema.fields) | {f.alias for f in schema.fields.values() if f.alias}
    extra_counts: dict[str, int] = {}
    for ex in failures:
        if isinstance(ex, dict):
            for k in ex:
                k = str(k)
                if k not in known:
                    extra_counts[k] = extra_counts.get(k, 0) + 1
    common_extra = [k for k, c in extra_counts.items() if c >= len(failures) * 0.3]
    return {
        "missing_fields": missing,
        "type_mismatches": type_mm,
        "constraint_violations": constraint,
        "common_extra_fields": common_extra,
    }


def analyze_violations_df(violations_df) -> dict:
    """Same mining over a violations DataFrame (distributed grain):
    one groupBy(code, path[0]).count() — works at any row count."""
    from pyspark.sql import functions as F

    rows = (
        violations_df.where(F.size("path") > 0)
        .groupBy(F.col("path")[0].alias("field"), "code")
        .count()
        .collect()
    )
    out = {"missing_fields": {}, "type_mismatches": {}, "constraint_violations": {}}
    for r in rows:
        if r["code"] == "required":
            out["missing_fields"][r["field"]] = r["count"]
        elif r["code"] == "type":
            out["type_mismatches"][r["field"]] = r["count"]
        elif r["code"] in _CONSTRAINT_CODES:
            out["constraint_violations"][r["field"]] = (
                out["constraint_violations"].get(r["field"], 0) + r["count"]
            )
    out["common_extra_fields"] = []
    return out


def optimize_schema_from_failures(
    schema: Schema,
    failures: Sequence[dict] | None = None,
    *,
    patterns: dict | None = None,
    relaxation_strategy: str = "moderate",
    add_missing_fields: bool = True,
):
    """Relax a schema based on failure patterns (dspex.ex:132-158):
    conservative → only add extra fields; moderate → also make
    frequently-missing fields optional; aggressive → also drop
    violated constraints / widen types to any."""
    if patterns is None:
        if not failures:
            return False, None, ["No failure examples provided for optimization"]
        patterns = analyze_failure_patterns(schema, failures)

    suggestions: list[str] = []
    new_fields: list[tuple] = []
    for name, fd in schema.fields.items():
        t = fd.type
        required = fd.required
        cons = dict(fd.constraints)
        if relaxation_strategy in ("moderate", "aggressive") and name in patterns["missing_fields"]:
            required = False
            suggestions.append(f"made '{name}' optional ({patterns['missing_fields'][name]} missing)")
        if relaxation_strategy == "aggressive":
            if name in patterns["constraint_violations"] and cons:
                suggestions.append(f"dropped constraints on '{name}'")
                cons = {}
            if name in patterns["type_mismatches"]:
                suggestions.append(f"widened '{name}' to any")
                t = "any"
        opts: dict[str, Any] = {"required": required, **cons}
        if fd.alias:
            opts["alias"] = fd.alias
        if fd.default is not None:
            opts.pop("required", None)
            opts["default"] = fd.default
        if "format" in opts:
            opts["format"] = opts["format"].pattern
        # relaxation must not silently strip unrelated field metadata:
        # custom validators, docs, and the dspex input/output tag carry
        # over verbatim (only what the strategy names is relaxed)
        if fd.validate:
            opts["validate"] = list(fd.validate)
        if fd.description is not None:
            opts["description"] = fd.description
        if fd.example is not None:
            opts["example"] = fd.example
        if fd.dspex_field_type is not None:
            opts["dspex_field_type"] = fd.dspex_field_type
        new_fields.append((name, t, opts))
    if add_missing_fields:
        for extra in patterns.get("common_extra_fields", []):
            new_fields.append((extra, "any", {"optional": True}))
            suggestions.append(f"added common extra field '{extra}' as optional any")
    relaxed = Schema.define(
        new_fields,
        title=schema.config.title,
        description=schema.config.description,
        strict=schema.config.strict,
    )
    return True, relaxed, suggestions
