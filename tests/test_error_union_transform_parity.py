"""Ports of three reference suites (pure driver-side):

* error_test.exs (371 LoC) — Error construction/format/group/summarize,
  LLM context, ValidationError exception protocol
* discriminated_union_test.exs (381 LoC) — compile checks, variant
  dispatch, error codes/paths, arrays of unions, JSON Schema output
* json_transform_test.exs (80 LoC) — sentinel-dropping transform with
  aliases/formats/drop_nil, JSON encode/decode pipelines
"""

from __future__ import annotations

from datetime import datetime

import pytest

from sinter_spark import Schema, ValidationError, validate
from sinter_spark.errors import (
    Error,
    format_errors,
    group_by_path,
    summarize,
    with_llm_context,
)
from sinter_spark.transform import NOT_GIVEN, OMIT, decode, encode, transform
from sinter_spark.types import TypeSpecError, to_json_schema, validate_value


# --- error_test.exs ---------------------------------------------------------


class TestErrorNew:
    # error_test.exs:6-49
    def test_list_path(self):
        e = Error.new(["user", "email"], "format", "invalid email format")
        assert e.path == ("user", "email")
        assert e.code == "format" and e.message == "invalid email format"
        assert e.context is None

    def test_bare_path(self):
        e = Error.new("name", "required", "field is required")
        assert e.path == ("name",)

    def test_with_context(self):
        ctx = {"expected": "string", "actual": "integer", "value": 42}
        e = Error.new(["age"], "type", "expected string", ctx)
        assert e.context == ctx

    def test_normalizes_mixed_path_types(self):
        e = Error.new(["user", "profile", 0, "name"], "required", "field required")
        assert e.path == ("user", "profile", "0", "name")

    def test_with_context_constructor(self):
        # error_test.exs:51-67
        ctx = {"min": 5, "max": 10, "actual": 3}
        e = Error.with_context("count", "range", "value out of range", ctx)
        assert e.path == ("count",) and e.context == ctx


class TestErrorFormat:
    # error_test.exs:70-112
    def test_with_path_default(self):
        e = Error.new(["user", "email"], "format", "invalid email format")
        assert e.format() == "user.email: invalid email format"

    def test_without_path(self):
        e = Error.new(["user", "email"], "format", "invalid email format")
        assert e.format(include_path=False) == "invalid email format"

    def test_custom_separator(self):
        e = Error.new(["user", "profile", "name"], "required", "field is required")
        assert e.format(path_separator=" -> ") == "user -> profile -> name: field is required"

    def test_empty_path(self):
        assert Error.new([], "global", "global error").format() == "global error"

    def test_single_element_path(self):
        assert Error.new("name", "required", "field is required").format() == "name: field is required"

    def test_mixed_path_types(self):
        e = Error.new(["users", 0, "email"], "format", "invalid email")
        assert e.format() == "users.0.email: invalid email"


class TestFormatErrors:
    # error_test.exs:114-142 — returns ONE newline-joined string
    def test_multiple(self):
        errs = [
            Error.new(["name"], "required", "field is required"),
            Error.new(["age"], "type", "expected integer"),
        ]
        assert format_errors(errs) == "name: field is required\nage: expected integer"

    def test_empty(self):
        assert format_errors([]) == ""

    def test_passes_options(self):
        errs = [
            Error.new(["name"], "required", "field is required"),
            Error.new(["age"], "type", "expected integer"),
        ]
        assert format_errors(errs, include_path=False) == "field is required\nexpected integer"


class TestGroupAndSummarize:
    # error_test.exs:144-218
    def test_group_by_path(self):
        errs = [
            Error.new(["user", "name"], "required", "field is required"),
            Error.new(["user", "name"], "min_length", "too short"),
            Error.new(["user", "email"], "format", "invalid format"),
            Error.new(["settings"], "type", "expected map"),
        ]
        grouped = group_by_path(errs)
        assert len(grouped) == 3
        assert len(grouped[("user", "name")]) == 2
        assert {e.code for e in grouped[("user", "name")]} == {"required", "min_length"}
        assert group_by_path([]) == {}

    def test_summarize(self):
        errs = [
            Error.new(["name"], "required", "field is required"),
            Error.new(["age"], "type", "expected integer"),
            Error.new(["email"], "format", "invalid email format"),
            Error.new(["password"], "required", "field is required"),
        ]
        s = summarize(errs)
        assert s["total_errors"] == 4
        assert set(s["error_codes"]) == {"required", "type", "format"}
        for p in (["name"], ["age"], ["email"], ["password"]):
            assert p in s["affected_paths"]
        assert s["by_code"] == {"required": 2, "type": 1, "format": 1}

    def test_summarize_empty_and_single(self):
        s = summarize([])
        assert s["total_errors"] == 0 and s["error_codes"] == [] and s["by_code"] == {}
        s = summarize([Error.new(["name"], "required", "field is required")])
        assert s["total_errors"] == 1 and s["error_codes"] == ["required"]
        assert s["affected_paths"] == [["name"]] and s["by_code"] == {"required": 1}


class TestLLMContext:
    # error_test.exs:220-290
    def test_adds_context(self):
        e = with_llm_context(Error.new(["name"], "required", "field is required"), {"age": 30}, "Generate a user profile")
        assert e.path == ("name",) and e.code == "required"
        assert e.context["llm_response"] == {"age": 30}
        assert e.context["prompt"] == "Generate a user profile"

    def test_preserves_existing_context(self):
        base = Error.with_context(["score"], "range", "value out of range", {"min": 0, "max": 100, "actual": 150})
        e = with_llm_context(base, {"score": 150}, "Generate a score")
        assert e.context["min"] == 0 and e.context["max"] == 100 and e.context["actual"] == 150
        assert e.context["llm_response"] == {"score": 150}

    def test_nil_response(self):
        e = with_llm_context(Error.new(["f"], "type", "type error"), None, "test prompt")
        assert e.context["llm_response"] is None and e.context["prompt"] == "test prompt"

    def test_format_unchanged(self):
        e = with_llm_context(Error.new(["name"], "required", "field is required"), {"x": 1}, "p")
        assert e.format() == "name: field is required"


class TestValidationErrorExceptionProtocol:
    # error_test.exs:292-371
    def test_single_error_message(self):
        exc = ValidationError([Error.new(["name"], "required", "field is required")])
        assert exc.message == "Validation failed: name: field is required"

    def test_multiple_errors_message(self):
        exc = ValidationError(
            [
                Error.new(["name"], "required", "field is required"),
                Error.new(["age"], "type", "expected integer"),
            ]
        )
        assert "Validation failed with 2 errors:" in exc.message
        assert "name: field is required" in exc.message
        assert "age: expected integer" in exc.message

    def test_no_errors_message(self):
        assert ValidationError([]).message == "Validation failed"

    def test_errors_accessor_and_format(self):
        errs = [Error.new(["name"], "required", "field is required")]
        exc = ValidationError(errs)
        assert exc.errors == errs
        assert exc.format() == "Validation failed: name: field is required"

    def test_raise_and_catch(self):
        errs = [Error.new(["name"], "required", "field is required")]
        with pytest.raises(ValidationError) as ei:
            raise ValidationError(errs)
        assert ei.value.errors == errs
        assert "name: field is required" in ei.value.format()


# --- discriminated_union_test.exs -------------------------------------------


def encoded_text_schema():
    return Schema.define([("type", ("literal", "encoded_text")), ("tokens", ("array", "integer"))])


def image_schema():
    return Schema.define(
        [
            ("type", ("literal", "image")),
            ("data", "string"),
            ("format", "string", {"choices": ["png", "jpeg"]}),
        ]
    )


def union_of(variants, disc="type"):
    return ("discriminated_union", disc, variants)


class TestDiscriminatedUnionCompileChecks:
    # discriminated_union_test.exs:36-95 — all raise at define time
    def test_variant_must_define_discriminator(self):
        with pytest.raises((ValueError, TypeSpecError), match="discriminator"):
            Schema.define(
                [("detail", union_of({"broken": Schema.define([("value", "string")])}))]
            )

    def test_discriminator_must_be_literal(self):
        with pytest.raises((ValueError, TypeSpecError), match="literal"):
            Schema.define(
                [
                    (
                        "detail",
                        union_of({"broken": Schema.define([("type", "string"), ("value", "string")])}),
                    )
                ]
            )

    def test_literal_must_match_variant_key(self):
        with pytest.raises((ValueError, TypeSpecError), match="broken"):
            Schema.define(
                [
                    (
                        "detail",
                        union_of(
                            {"broken": Schema.define([("type", ("literal", "other")), ("value", "string")])}
                        ),
                    )
                ]
            )


class TestDiscriminatedUnionValidation:
    # discriminated_union_test.exs:96-260
    def test_valid_variants(self):
        u = union_of({"encoded_text": encoded_text_schema(), "image": image_schema()})
        ok, v, _ = validate_value(u, {"type": "encoded_text", "tokens": [1, 2, 3]})
        assert ok and v["tokens"] == [1, 2, 3]
        ok, v, _ = validate_value(u, {"type": "image", "data": "base64data", "format": "png"})
        assert ok and v["data"] == "base64data"

    def test_unknown_discriminator(self):
        u = union_of({"encoded_text": encoded_text_schema()})
        ok, _, errs = validate_value(u, {"type": "unknown", "foo": "bar"})
        assert not ok and errs[0].code == "unknown_discriminator"
        assert "unknown" in errs[0].message

    def test_missing_discriminator(self):
        u = union_of({"encoded_text": encoded_text_schema()})
        ok, _, errs = validate_value(u, {"tokens": [1, 2, 3]})
        assert not ok and errs[0].code == "missing_discriminator"

    def test_variant_errors_surface(self):
        u = union_of({"encoded_text": encoded_text_schema()})
        ok, _, errs = validate_value(u, {"type": "encoded_text"})
        assert not ok
        assert any("tokens" in e.message or e.code == "required" for e in errs)

    def test_non_map_input(self):
        u = union_of({"encoded_text": encoded_text_schema()})
        ok, _, errs = validate_value(u, "not a map")
        assert not ok and errs[0].code == "type"

    def test_path_preserved(self):
        u = union_of({"image": image_schema()})
        ok, _, errs = validate_value(u, {"type": "image", "data": "b", "format": "gif"}, ("chunk",))
        assert not ok and all("chunk" in e.path for e in errs)

    def test_array_of_unions_as_field(self):
        # discriminated_union_test.exs:263-320
        chunk = union_of({"encoded_text": encoded_text_schema(), "image": image_schema()})
        parent = Schema.define([("chunks", ("array", chunk))])
        ok, v, _ = validate(
            parent,
            {
                "chunks": [
                    {"type": "encoded_text", "tokens": [1, 2]},
                    {"type": "image", "data": "abc", "format": "png"},
                ]
            },
        )
        assert ok and len(v["chunks"]) == 2
        ok, _, errs = validate(
            parent,
            {"chunks": [{"type": "encoded_text", "tokens": [1, 2]}, {"type": "unknown_type"}]},
        )
        assert not ok and any("1" in e.path for e in errs)


class TestDiscriminatedUnionJsonSchema:
    # discriminated_union_test.exs:321-380
    def test_oneof_with_mapping(self):
        u = union_of({"encoded_text": encoded_text_schema(), "image": image_schema()})
        js = to_json_schema(u)
        assert len(js["oneOf"]) == 2
        assert js["discriminator"]["propertyName"] == "type"
        assert isinstance(js["discriminator"]["mapping"], dict)

    def test_variant_schemas_in_oneof(self):
        u = union_of({"text": Schema.define([("type", ("literal", "text")), ("value", "string")])})
        js = to_json_schema(u)
        (variant,) = js["oneOf"]
        assert variant["type"] == "object" and "type" in variant["properties"]

    def test_field_containing_union(self):
        from sinter_spark import generate

        s = Schema.define([("chunk", union_of({"encoded_text": encoded_text_schema()}))])
        js = generate(s)
        assert js["properties"]["chunk"]["oneOf"]
        assert js["properties"]["chunk"]["discriminator"]


# --- json_transform_test.exs ------------------------------------------------


class TestTransform:
    # json_transform_test.exs:6-38
    def test_drops_sentinels_stringifies_keys(self):
        out = transform(
            {
                "a": 1,
                "b": NOT_GIVEN,
                "c": OMIT,
                "d": None,
                "nested": {"keep": "ok", "drop": NOT_GIVEN},
            }
        )
        assert out == {"a": 1, "d": None, "nested": {"keep": "ok"}}

    def test_aliases_and_formats(self):
        out = transform(
            {"snake_key": "value", "timestamp": datetime(2024, 1, 1)},
            aliases={"snake_key": "camelKey"},
            formats={"timestamp": "iso8601"},
        )
        assert out["camelKey"] == "value"
        assert out["timestamp"] == "2024-01-01T00:00:00"

    def test_drop_nil(self):
        assert transform({"a": None, "b": 1}, drop_nil=True) == {"b": 1}


class TestJSON:
    # json_transform_test.exs:40-80
    def test_encode_with_transform_pipeline(self):
        import json

        s = encode({"name": "Alice", "age": 30, "omit_me": OMIT}, aliases={"name": "full_name"})
        assert json.loads(s) == {"full_name": "Alice", "age": 30}

    def test_decode_validates(self):
        schema = Schema.define([("name", "string"), ("age", "integer", {"optional": True})])
        ok, v, _ = decode(schema, '{"name":"Alice","age":30}')
        assert ok and v == {"name": "Alice", "age": 30}

    def test_decode_invalid(self):
        schema = Schema.define([("count", "integer")])
        ok, _, errs = decode(schema, '{"count":"not-a-number"}')
        assert not ok and any(e.code == "type" for e in errs)

    def test_decode_with_coercion(self):
        schema = Schema.define([("count", "integer")])
        ok, v, _ = decode(schema, '{"count":"42"}', coerce=True)
        assert ok and v["count"] == 42


class TestAliasOutputAndValidators:
    # field_alias_test.exs:75-166 + field_validator_test.exs:110-192 tails
    def test_use_aliases_true(self):
        s = Schema.define([("account_name", "string", {"alias": "accountName"})])
        out = transform(s, {"account_name": "Test"}, use_aliases=True)
        assert out == {"accountName": "Test"}

    def test_use_aliases_false(self):
        s = Schema.define([("account_name", "string", {"alias": "accountName"})])
        out = transform(s, {"account_name": "Test"}, use_aliases=False)
        assert out == {"account_name": "Test"}

    def test_field_aliases_map(self):
        # field_alias_test.exs:154-166
        s = Schema.define(
            [("account_name", "string", {"alias": "accountName"}), ("plain", "string")]
        )
        assert s.field_aliases() == {"account_name": "accountName"}

    def test_validator_only_runs_if_present(self):
        # field_validator_test.exs:110-122
        calls = []

        def spy(v):
            calls.append(v)
            return None

        s = Schema.define([("opt", "string", {"optional": True, "validate": [spy]})])
        ok, _, _ = validate(s, {})
        assert ok and calls == []

    def test_validator_runs_on_nil_with_nullable_type(self):
        # field_validator_test.exs:124-142
        calls = []

        def spy(v):
            calls.append(v)
            return None

        s = Schema.define([("n", ("nullable", "string"), {"validate": [spy]})])
        ok, _, _ = validate(s, {"n": None})
        assert ok and calls == [None]

    def test_validator_bare_ok_keeps_value(self):
        # field_validator_test.exs:177-192 — plain success keeps original
        s = Schema.define([("a", "string", {"validate": [lambda v: True]})])
        ok, v, _ = validate(s, {"a": "orig"})
        assert ok and v == {"a": "orig"}
