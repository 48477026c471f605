"""Port of the reference's discriminated-union JSON-Schema regression
suites (discriminated_union_json_schema_regression_test.exs +
discriminated_union_json_schema_validation_regression_test.exs).

The first pins what variant schemas must PRESERVE (descriptions,
nesting, constraints, aliases, metadata, strictness); the second
cross-validates instances against the generated document with the
``jsonschema`` package (the reference uses JSV) and checks branch
equivalence + mapping resolution. Pure driver-side."""

from __future__ import annotations

import pytest

from sinter_spark import Schema, generate
from sinter_spark.types import to_json_schema, validate_value

jsonschema = pytest.importorskip("jsonschema")


def union_spec(variants, discriminator="type"):
    return ("discriminated_union", discriminator, variants)


def generated_union_root(variants, discriminator="type"):
    return generate(Schema.define([("detail", union_spec(variants, discriminator))]))


def generated_union_schema(variants, discriminator="type"):
    return generated_union_root(variants, discriminator)["properties"]["detail"]


def variant_schema(union_schema, value):
    for v in union_schema["oneOf"]:
        props = v.get("properties", {})
        for disc in ("type", "kind"):
            if props.get(disc, {}).get("const") == value:
                return v
    raise AssertionError(f"missing variant {value!r} in {union_schema!r}")


def is_valid(doc, instance):
    try:
        jsonschema.validate(instance, doc)
        return True
    except jsonschema.ValidationError:
        return False


def validate_generated_union(variants, value, discriminator="type"):
    return is_valid(generated_union_root(variants, discriminator), {"detail": value})


def validate_standalone(schema, value):
    return is_valid(generate(schema), value)


def nested_detail_schema(**extra):
    return Schema.define(
        [
            ("title", "string", {"description": "Nested title"} if extra.get("described") else {}),
            ("description", "string", {"optional": True}),
        ],
        strict=True,
        **({"title": "Nested Detail", "description": "Nested detail schema"} if extra.get("described") else {}),
    )


def nested_variant(described=False):
    opts = {"title": "Nested Variant", "description": "Variant with a nested object", "strict": True} if described else {"strict": True}
    detail_opts = {"description": "Detailed nested payload"} if described else {}
    return Schema.define(
        [
            ("type", ("literal", "nested")),
            ("detail", ("object", nested_detail_schema(described=described)), detail_opts),
        ],
        **opts,
    )


def constrained_variant():
    return Schema.define(
        [
            ("type", ("literal", "constrained")),
            ("email", "string", {"format": r".+@.+", "description": "Notification email"}),
            ("status", "string", {"choices": ["draft", "published"]}),
            ("count", "integer", {"optional": True, "gteq": 1, "lteq": 5}),
            ("tags", ("array", "string"), {"min_items": 1, "max_items": 3}),
        ]
    )


def aliased_variant():
    return Schema.define(
        [
            ("type", ("literal", "aliased")),
            ("account_name", "string", {"alias": "accountName", "min_length": 3}),
        ]
    )


def documented_variant():
    return Schema.define(
        [
            ("type", ("literal", "documented")),
            ("summary", "string", {"example": "Hello world"}),
            ("enabled", "boolean", {"optional": True, "default": True}),
        ]
    )


class TestGenerateRegressions:
    # discriminated_union_json_schema_regression_test.exs:89-159
    def test_preserves_field_descriptions(self):
        desc_variant = Schema.define(
            [
                ("type", ("literal", "desc")),
                ("content", "string", {"description": "Description of the first item"}),
            ]
        )
        v = variant_schema(generated_union_schema({"desc": desc_variant}), "desc")
        assert v["properties"]["content"]["description"] == "Description of the first item"

    def test_preserves_nested_object_properties_and_required(self):
        v = variant_schema(generated_union_schema({"nested": nested_variant()}), "nested")
        detail = v["properties"]["detail"]
        assert detail["type"] == "object"
        assert detail["properties"]["title"]["type"] == "string"
        assert detail["properties"]["description"]["type"] == "string"
        assert detail["required"] == ["title"]

    def test_preserves_nested_metadata(self):
        v = variant_schema(generated_union_schema({"nested": nested_variant(described=True)}), "nested")
        detail = v["properties"]["detail"]
        assert v["title"] == "Nested Variant"
        assert v["description"] == "Variant with a nested object"
        assert detail["title"] == "Nested Detail"
        # field description overrides the nested schema's own description
        assert detail["description"] == "Detailed nested payload"
        assert detail["properties"]["title"]["description"] == "Nested title"

    def test_preserves_constraints(self):
        v = variant_schema(generated_union_schema({"constrained": constrained_variant()}), "constrained")
        p = v["properties"]
        assert p["email"]["pattern"] == ".+@.+"
        assert p["status"]["enum"] == ["draft", "published"]
        assert p["count"]["minimum"] == 1 and p["count"]["maximum"] == 5
        assert p["tags"]["minItems"] == 1 and p["tags"]["maxItems"] == 3

    def test_preserves_aliases(self):
        v = variant_schema(generated_union_schema({"aliased": aliased_variant()}), "aliased")
        assert "accountName" in v["properties"]
        assert "account_name" not in v["properties"]
        assert sorted(v["required"]) == ["accountName", "type"]

    def test_preserves_examples_and_defaults(self):
        v = variant_schema(generated_union_schema({"documented": documented_variant()}), "documented")
        assert v["properties"]["summary"]["examples"] == ["Hello world"]
        assert v["properties"]["enabled"]["default"] is True

    def test_preserves_strictness(self):
        v = variant_schema(generated_union_schema({"nested": nested_variant()}), "nested")
        assert v["additionalProperties"] is False
        assert v["properties"]["detail"]["additionalProperties"] is False

    def test_types_to_json_schema_direct(self):
        # discriminated_union_json_schema_regression_test.exs:161-172
        u = to_json_schema(union_spec({"nested": nested_variant(described=True)}))
        v = variant_schema(u, "nested")
        detail = v["properties"]["detail"]
        assert detail["type"] == "object"
        assert detail["properties"]["title"]["type"] == "string"
        assert detail["title"] == "Nested Detail"
        assert detail["additionalProperties"] is False


class TestValidationRegressions:
    # discriminated_union_json_schema_validation_regression_test.exs:113-207
    def test_missing_nested_required(self):
        bad = {"type": "nested", "detail": {}}
        assert not validate_standalone(nested_variant(), bad)
        assert not validate_generated_union({"nested": nested_variant()}, bad)

    def test_unknown_nested_properties_strict(self):
        bad = {"type": "nested", "detail": {"title": "ok", "extra": 1}}
        assert not validate_standalone(nested_variant(), bad)
        assert not validate_generated_union({"nested": nested_variant()}, bad)

    def test_enum_violations(self):
        bad = {"type": "constrained", "email": "person@example.com", "status": "invalid-status", "tags": ["a"]}
        assert not validate_standalone(constrained_variant(), bad)
        assert not validate_generated_union({"constrained": constrained_variant()}, bad)

    def test_numeric_bounds(self):
        base = {"type": "constrained", "email": "person@example.com", "status": "draft", "tags": ["a"]}
        for count in (0, 9):
            bad = {**base, "count": count}
            assert not validate_standalone(constrained_variant(), bad)
            assert not validate_generated_union({"constrained": constrained_variant()}, bad)
        assert validate_standalone(constrained_variant(), {**base, "count": 3})

    def test_pattern_violations(self):
        bad = {"type": "constrained", "email": "not-an-email", "status": "draft", "tags": ["a"]}
        assert not validate_standalone(constrained_variant(), bad)
        assert not validate_generated_union({"constrained": constrained_variant()}, bad)

    def test_alias_keys_consistent(self):
        ok_payload = {"type": "aliased", "accountName": "valid-name"}
        canonical = {"type": "aliased", "account_name": "valid-name"}
        assert validate_standalone(aliased_variant(), ok_payload)
        assert not validate_standalone(aliased_variant(), canonical)
        assert validate_generated_union({"aliased": aliased_variant()}, ok_payload)
        assert not validate_generated_union({"aliased": aliased_variant()}, canonical)

    def test_length_with_alias(self):
        bad = {"type": "aliased", "accountName": "ab"}
        assert not validate_standalone(aliased_variant(), bad)
        assert not validate_generated_union({"aliased": aliased_variant()}, bad)

    def test_discriminator_required_in_generated_and_runtime(self):
        fallback = Schema.define(
            [("kind", ("literal", "fallback"), {"optional": True}), ("value", "string")]
        )
        variants = {"fallback": fallback}
        ok, _, errs = validate_value(union_spec(variants, "kind"), {"value": "ok"})
        assert not ok
        assert not validate_generated_union(variants, {"value": "ok"}, "kind")


class TestBranchInvariants:
    # discriminated_union_json_schema_validation_regression_test.exs:210-240
    def test_each_branch_matches_standalone(self):
        variants = {
            "nested": nested_variant(),
            "constrained": constrained_variant(),
            "aliased": aliased_variant(),
        }
        union = generated_union_schema(variants)
        for value, schema in variants.items():
            standalone = {
                k: v
                for k, v in generate(schema).items()
                if k not in ("$schema", "x-sinter-version", "x-sinter-field-count", "x-sinter-created-at")
            }
            assert variant_schema(union, value) == standalone

    def test_mapping_resolves_to_concrete_schemas(self):
        variants = {"nested": nested_variant(), "constrained": constrained_variant()}
        root = generated_union_root(variants)
        union = root["properties"]["detail"]
        for value, ref in union["discriminator"]["mapping"].items():
            assert ref.startswith("#/")
            node = root
            for seg in ref[2:].split("/"):
                seg = seg.replace("~1", "/").replace("~0", "~")
                node = node[seg]
            assert node == variant_schema(union, value)
