"""Pure-Python core tests — ports of the reference suites.

Sources: test/sinter/validator_test.exs, types_test.exs, schema_test.exs,
error_test.exs, field_validator_test.exs, pre_validate_test.exs,
field_alias_test.exs (all under /root/reference/test/). Each Elixir
map-under-test becomes a dict; assertions compare (path, code) sets and
validated output, order-insensitively (SURVEY.md §5).
"""

import re

import pytest

from sinter_spark import (
    Error,
    Schema,
    ValidationError,
    filter_by_code,
    group_by_code,
    infer_schema,
    merge_schemas,
    summarize,
    validate,
    validate_bang,
    validate_many,
    validate_stream,
    validate_type,
    validate_value,
    validator_for,
)
from sinter_spark.types import TypeSpecError, coerce_value
from sinter_spark.types import validate_value as tv


def codes(errors):
    return {(e.path, e.code) for e in errors}


def user_schema(**opts):
    # canonical fixture: validator_test.exs:8-17, test_helper.exs:27-31
    return Schema.define(
        [
            ("name", "string", {"required": True, "min_length": 2}),
            ("age", "integer", {"optional": True, "gt": 0, "lt": 150}),
            ("email", "string", {"optional": True, "format": r".+@.+"}),
            ("tags", ("array", "string"), {"optional": True, "max_items": 5}),
        ],
        **opts,
    )


# --- schema definition (schema_test.exs) -----------------------------------


class TestSchemaDefine:
    def test_required_default_true(self):
        s = Schema.define([("a", "string")])
        assert s.fields["a"].required

    def test_optional(self):
        s = Schema.define([("a", "string", {"optional": True})])
        assert not s.fields["a"].required
        assert s.optional_fields() == ["a"]

    def test_default_implies_optional(self):
        # schema.ex:593-610
        s = Schema.define([("a", "integer", {"default": 3})])
        assert not s.fields["a"].required

    def test_required_and_optional_conflict(self):
        with pytest.raises(ValueError):
            Schema.define([("a", "string", {"required": True, "optional": True})])

    def test_unknown_option_rejected(self):
        with pytest.raises(ValueError):
            Schema.define([("a", "string", {"bogus": 1})])

    def test_unknown_type_rejected(self):
        # schema.ex:451-528
        with pytest.raises(TypeSpecError):
            Schema.define([("a", "not_a_type")])

    def test_min_items_migrates_into_array_spec(self):
        # schema.ex:665-686
        s = Schema.define([("a", ("array", "string"), {"min_items": 1, "max_items": 3})])
        assert s.fields["a"].type == ("array", "string", {"min_items": 1, "max_items": 3})
        assert "min_items" not in s.fields["a"].constraints

    def test_introspection(self):
        s = user_schema(title="Users")
        assert s.required_fields() == ["name"]
        assert set(s.optional_fields()) == {"age", "email", "tags"}
        assert s.info()["field_count"] == 4
        assert s.info()["title"] == "Users"

    def test_merge_later_wins_and_last_strict(self):
        # sinter.ex:432-463, sinter_test.exs:750-815
        s1 = Schema.define([("a", "string", {"min_length": 5})], strict=True, title="one")
        s2 = Schema.define([("a", "integer"), ("b", "boolean")], strict=False)
        m = merge_schemas([s1, s2])
        assert m.fields["a"].type == "integer"
        assert set(m.fields) == {"a", "b"}
        assert m.config.strict is False  # last wins
        assert m.config.title == "one"  # first non-nil wins


# --- type system (types_test.exs) -------------------------------------------


class TestTypes:
    def test_strict_int_vs_float(self):
        # types_test.exs:36-59, validator_test.exs:218-230
        ok, _, errs = tv("integer", 3.14)
        assert not ok and errs[0].code == "type"
        ok, _, _ = tv("integer", 42)
        assert ok
        ok, _, errs = tv("float", 42)
        assert not ok and errs[0].code == "type"
        ok, _, _ = tv("float", 3.14)
        assert ok

    def test_boolean_is_not_integer(self):
        ok, _, errs = tv("integer", True)
        assert not ok

    def test_literal_type_strict(self):
        # types_test.exs:506-535: literal 1 ≠ 1.0
        ok, _, _ = tv(("literal", 1), 1)
        assert ok
        ok, _, errs = tv(("literal", 1), 1.0)
        assert not ok and errs[0].code == "literal_mismatch"
        ok, _, _ = tv(("literal", "text"), "text")
        assert ok

    def test_union_first_match_priority(self):
        # types_test.exs:182
        ok, v, _ = tv(("union", ["string", "integer"]), "hi")
        assert ok and v == "hi"
        ok, v, _ = tv(("union", ["string", "integer"]), 5)
        assert ok and v == 5
        ok, _, errs = tv(("union", ["string", "integer"]), 1.5)
        assert not ok and errs[0].code == "type"

    def test_array_indexed_paths(self):
        # types.ex:194-238: error path gets the index
        ok, _, errs = tv(("array", "integer"), [1, "x", 3], ("tags",))
        assert not ok
        assert codes(errs) == {(("tags", "1"), "type")}

    def test_nested_array_paths(self):
        # validator_test.exs:777-794: path [field, i, j]
        ok, _, errs = tv(("array", ("array", "string")), [["a"], ["b", 3]], ("f",))
        assert codes(errs) == {(("f", "1", "1"), "type")}

    def test_array_type_constraints(self):
        # types.ex:710-738
        ok, _, errs = tv(("array", "integer", {"min_items": 2}), [1])
        assert errs[0].code == "min_items"
        ok, _, errs = tv(("array", "integer", {"max_items": 1}), [1, 2])
        assert errs[0].code == "max_items"

    def test_tuple_size_and_positional(self):
        ok, _, errs = tv(("tuple", ["string", "integer"]), ["a", 1])
        assert ok
        ok, _, errs = tv(("tuple", ["string", "integer"]), ["a"])
        assert errs[0].code == "tuple_size"
        ok, _, errs = tv(("tuple", ["string", "integer"]), ["a", "b"], ("t",))
        assert codes(errs) == {(("t", "1"), "type")}

    def test_map_keys_and_values(self):
        ok, _, _ = tv(("map", "string", "integer"), {"a": 1})
        assert ok
        ok, _, errs = tv(("map", "string", "integer"), {"a": "x"})
        assert not ok

    def test_nullable(self):
        ok, v, _ = tv(("nullable", "string"), None)
        assert ok and v is None
        ok, _, errs = tv(("nullable", "string"), 3)
        assert not ok

    def test_date_datetime_uuid(self):
        # types_test.exs:82-110
        assert tv("date", "2024-01-15")[0]
        assert not tv("date", "not-a-date")[0]
        assert tv("date", 123)[2][0].code == "type"
        assert tv("datetime", "2024-01-15T10:30:00Z")[0]
        assert tv("datetime", "2024-01-15T10:30:00")[0]  # naive ok
        assert not tv("datetime", "nope")[0]
        assert tv("uuid", "550e8400-e29b-41d4-a716-446655440000")[0]
        ok, _, errs = tv("uuid", "not-a-uuid")
        assert errs[0].code == "format"

    def test_discriminated_union(self):
        # README.md:153-181, discriminated_union_test.exs:36-319
        text = Schema.define([("type", ("literal", "text")), ("content", "string")])
        image = Schema.define([("type", ("literal", "image")), ("url", "string")])
        spec = ("discriminated_union", "type", {"text": text, "image": image})
        ok, v, _ = tv(spec, {"type": "text", "content": "hi"})
        assert ok and v["content"] == "hi"
        ok, _, errs = tv(spec, {"content": "hi"})
        assert errs[0].code == "missing_discriminator"
        ok, _, errs = tv(spec, {"type": "video"})
        assert errs[0].code == "unknown_discriminator"
        ok, _, errs = tv(spec, "nope")
        assert errs[0].code == "type"

    def test_discriminated_union_compile_check(self):
        # schema.ex:495-566: variant must define discriminator as literal
        bad = Schema.define([("content", "string")])
        with pytest.raises(TypeSpecError):
            Schema.define(
                [("d", ("discriminated_union", "type", {"text": bad}))]
            )


# --- coercion (types.ex:417-581, validator_test.exs:430-464) ---------------


class TestCoercion:
    def test_string_to_integer_whole_string(self):
        assert coerce_value("integer", "42") == (True, 42, [])
        ok, _, errs = coerce_value("integer", "42abc")
        assert not ok and errs[0].code == "coercion"
        ok, _, errs = coerce_value("integer", "3.14")
        assert not ok

    def test_string_to_float(self):
        assert coerce_value("float", "19.99")[1] == 19.99
        assert coerce_value("float", 5) == (True, 5.0, [])  # int→float ok
        assert not coerce_value("float", "abc")[0]

    def test_boolean(self):
        assert coerce_value("boolean", "true") == (True, True, [])
        assert coerce_value("boolean", "false") == (True, False, [])
        assert not coerce_value("boolean", "yes")[0]

    def test_number_to_string(self):
        assert coerce_value("string", 42) == (True, "42", [])
        assert coerce_value("string", True)[1] == "true"

    def test_constraints_after_coercion(self):
        # validator_test.exs:450-464: constraints apply to coerced value
        s = Schema.define([("n", "integer", {"gt": 10})])
        ok, v, _ = validate(s, {"n": "42"}, coerce=True)
        assert ok and v["n"] == 42
        ok, _, errs = validate(s, {"n": "5"}, coerce=True)
        assert codes(errs) == {(("n",), "gt")}

    def test_coercion_error_path(self):
        s = Schema.define([("n", "integer")])
        ok, _, errs = validate(s, {"n": "abc"}, coerce=True)
        assert codes(errs) == {(("n",), "coercion")}


# --- validator pipeline (validator_test.exs) --------------------------------


class TestValidatorPipeline:
    def test_valid_row(self):
        ok, v, errs = validate(user_schema(), {"name": "Alice", "age": 30})
        assert ok and v == {"name": "Alice", "age": 30}

    def test_minimal_row(self):
        ok, v, _ = validate(user_schema(), {"name": "Bo"})
        assert ok and v == {"name": "Bo"}

    def test_missing_required(self):
        ok, _, errs = validate(user_schema(), {"age": 5})
        assert codes(errs) == {(("name",), "required")}
        assert errs[0].message == "field is required"

    def test_each_constraint(self):
        s = Schema.define(
            [
                ("a", "string", {"min_length": 3}),
                ("b", "string", {"max_length": 2}),
                ("c", "integer", {"gteq": 10}),
                ("d", "integer", {"lteq": 10}),
                ("e", "string", {"choices": ["x", "y"]}),
                ("f", ("array", "integer"), {"min_items": 2}),
            ]
        )
        ok, _, errs = validate(
            s, {"a": "ab", "b": "abc", "c": 9, "d": 11, "e": "z", "f": [1]}
        )
        assert codes(errs) == {
            (("a",), "min_length"),
            (("b",), "max_length"),
            (("c",), "gteq"),
            (("d",), "lteq"),
            (("e",), "choices"),
            (("f",), "min_items"),
        }

    def test_unicode_codepoint_length(self):
        # validator.ex:681-682: String.length = codepoints, not bytes
        s = Schema.define([("a", "string", {"min_length": 3, "max_length": 3})])
        ok, _, _ = validate(s, {"a": "héé"})  # 3 codepoints, >3 bytes
        assert ok

    def test_multi_error_accumulation(self):
        # validator_test.exs:842-866: errors accumulated, not short-circuited
        ok, _, errs = validate(
            user_schema(), {"name": "A", "age": -1, "email": "nope"}
        )
        assert codes(errs) == {
            (("name",), "min_length"),
            (("age",), "gt"),
            (("email",), "format"),
        }

    def test_default_applied(self):
        # validator_test.exs:131-193
        s = Schema.define(
            [("name", "string"), ("active", "boolean", {"default": True})]
        )
        ok, v, _ = validate(s, {"name": "x"})
        assert v == {"name": "x", "active": True}

    def test_default_not_overriding_present(self):
        s = Schema.define([("active", "boolean", {"default": True})])
        ok, v, _ = validate(s, {"active": False})
        assert v == {"active": False}

    def test_strict_mode(self):
        # validator_test.exs:500-561
        s = user_schema(strict=True)
        ok, _, errs = validate(s, {"name": "Alice", "extra": 1, "more": 2})
        assert len(errs) == 1 and errs[0].code == "strict"
        assert "extra" in errs[0].message and "more" in errs[0].message
        # option can override schema setting (validator.ex:535-565)
        ok, _, _ = validate(s, {"name": "Alice", "extra": 1}, strict=False)
        assert ok

    def test_non_map_input(self):
        ok, _, errs = validate(user_schema(), [1, 2])
        assert errs[0].code == "input_format"

    def test_alias_resolution(self):
        # field_alias_test.exs:6-72: alias wins when both present; canonical output
        s = Schema.define([("account_name", "string", {"alias": "accountName"})])
        ok, v, _ = validate(s, {"accountName": "x"})
        assert v == {"account_name": "x"}
        ok, v, _ = validate(s, {"accountName": "x", "account_name": "y"})
        assert v == {"account_name": "x"}  # alias takes precedence

    def test_post_validate_protocols(self):
        # validator_test.exs:564-639
        def pw_match(data):
            if data.get("password") != data.get("password_confirmation"):
                return ("error", "passwords do not match")
            return ("ok", data)

        s = Schema.define(
            [("password", "string"), ("password_confirmation", "string")],
            post_validate=pw_match,
        )
        ok, _, _ = validate(s, {"password": "a", "password_confirmation": "a"})
        assert ok
        ok, _, errs = validate(s, {"password": "a", "password_confirmation": "b"})
        assert errs[0].code == "post_validation"
        assert errs[0].message == "passwords do not match"

    def test_post_validate_exception_wrapped(self):
        s = Schema.define([("a", "string")], post_validate=lambda d: 1 / 0)
        ok, _, errs = validate(s, {"a": "x"})
        assert errs[0].code == "post_validation"
        assert "failed" in errs[0].message

    def test_pre_validate_transform_and_error(self):
        # pre_validate_test.exs:6-156
        def derive(data):
            d = dict(data)
            d["full_name"] = f"{d.pop('first', '')} {d.pop('last', '')}"
            return d

        s = Schema.define([("full_name", "string")], pre_validate=derive)
        ok, v, _ = validate(s, {"first": "Ada", "last": "L"})
        assert v == {"full_name": "Ada L"}

        s2 = Schema.define([("a", "string")], pre_validate=lambda d: 1 / 0)
        ok, _, errs = validate(s2, {"a": "x"})
        assert errs[0].code == "pre_validate_error"

    def test_custom_field_validators(self):
        # field_validator_test.exs:6-192
        def upcase(v):
            return ("ok", v.upper())

        def no_admin(v):
            if v == "ADMIN":
                return ("error", "admin is reserved")
            return None

        s = Schema.define([("name", "string", {"validate": [upcase, no_admin]})])
        ok, v, _ = validate(s, {"name": "bob"})
        assert v == {"name": "BOB"}
        ok, _, errs = validate(s, {"name": "admin"})
        assert errs[0].code == "custom_validation"
        assert errs[0].message == "admin is reserved"

    def test_custom_validator_exception_wrapped(self):
        s = Schema.define([("a", "string", {"validate": lambda v: 1 / 0})])
        ok, _, errs = validate(s, {"a": "x"})
        assert errs[0].code == "custom_validation_error"

    def test_validators_run_after_type_and_constraints(self):
        # validator.ex:341-358: type → constraints → custom
        calls = []

        def spy(v):
            calls.append(v)
            return None

        s = Schema.define([("a", "string", {"min_length": 5, "validate": spy})])
        validate(s, {"a": "ab"})
        assert calls == []  # constraint failed, validator never ran

    def test_nested_object_path_prefix(self):
        inner = Schema.define([("email", "string", {"format": r".+@.+"})])
        s = Schema.define([("user", ("object", inner))])
        ok, _, errs = validate(s, {"user": {"email": "bad"}})
        assert codes(errs) == {(("user", "email"), "format")}


# --- batch / stream (validator_test.exs:678-755) ----------------------------


class TestBatchStream:
    def test_validate_many_all_or_nothing(self):
        s = Schema.define([("n", "integer", {"gt": 0})])
        ok, results, errs = validate_many(s, [{"n": 1}, {"n": 2}])
        assert ok and results == [{"n": 1}, {"n": 2}]
        ok, _, errs = validate_many(s, [{"n": 1}, {"n": -5}, {}])
        assert not ok and set(errs) == {1, 2}
        # index prefixed onto error paths (validator.ex:148-181)
        assert errs[1][0].path == ("1", "n")

    def test_validate_stream_lazy(self):
        s = Schema.define([("n", "integer")])
        gen = validate_stream(s, ({"n": i} for i in range(3)))
        results = list(gen)
        assert [r[0] for r in results] == [True, True, True]

    def test_validate_bang(self):
        s = Schema.define([("n", "integer")])
        assert validate_bang(s, {"n": 1}) == {"n": 1}
        with pytest.raises(ValidationError) as ei:
            validate_bang(s, {})
        assert "required" in str(ei.value)


# --- scalar helpers (sinter_test.exs) ---------------------------------------


class TestScalarHelpers:
    def test_validate_type_strips_temp_path(self):
        # sinter.ex:106-141
        ok, v, _ = validate_type("integer", 42)
        assert ok and v == 42
        ok, _, errs = validate_type("integer", "x")
        assert errs[0].path == ()

    def test_validate_type_with_constraints(self):
        ok, _, errs = validate_type("string", "a", min_length=3)
        assert errs[0].code == "min_length"

    def test_validate_value_named(self):
        ok, _, errs = validate_value("age", "integer", -1, gt=0)
        assert errs[0].path == ("age",)

    def test_validator_for_reuse(self):
        run = validator_for(Schema.define([("a", "string")]))
        assert run({"a": "x"})[0]
        assert not run({})[0]


# --- inference (sinter_test.exs:672-747) ------------------------------------


class TestInference:
    def test_infer_types_and_requiredness(self):
        examples = [
            {"name": "a", "age": 1, "tags": ["x"]},
            {"name": "b", "age": 2, "tags": ["y"]},
            {"name": "c", "age": 3},
            {"name": "d", "age": 4, "tags": ["z"]},
            {"name": "e", "age": 5, "tags": ["w"]},
        ]
        s = infer_schema(examples)
        assert s.fields["name"].type == "string"
        assert s.fields["age"].type == "integer"
        assert s.fields["tags"].type == ("array", "string")
        assert s.fields["name"].required
        assert s.fields["tags"].required  # 4/5 = 0.8 ≥ 0.8

    def test_infer_mixed_array_is_any(self):
        s = infer_schema([{"a": [1, "x"]}])
        assert s.fields["a"].type == ("array", "any")


# --- error algebra (error_test.exs) ------------------------------------------


class TestErrors:
    def test_new_normalizes_path(self):
        assert Error.new("name", "required", "m").path == ("name",)
        assert Error.new(["a", 2], "type", "m").path == ("a", "2")

    def test_format(self):
        e = Error.new(["a", "b", 2], "format", "bad")
        assert e.format() == "a.b.2: bad"
        assert Error.new([], "strict", "msg").format() == "msg"

    def test_to_map_shape(self):
        # error.ex:224-237: context omitted when nil
        e = Error.new(["x"], "gt", "must be greater than 0")
        assert e.to_map() == {"path": ["x"], "code": "gt", "message": "must be greater than 0"}
        e2 = Error.with_context(["x"], "gt", "m", {"v": 1})
        assert e2.to_map()["context"] == {"v": 1}

    def test_group_and_summarize(self):
        errs = [
            Error.new(["a"], "required", "m"),
            Error.new(["b"], "required", "m"),
            Error.new(["a"], "gt", "m"),
        ]
        assert set(group_by_code(errs)) == {"required", "gt"}
        assert len(filter_by_code(errs, "required")) == 2
        s = summarize(errs)
        assert s["total_errors"] == 3
        assert s["by_code"] == {"required": 2, "gt": 1}


# --- json schema (json_schema_test.exs essentials) ---------------------------


class TestJsonSchema:
    def test_basic_generation(self):
        from sinter_spark import generate

        s = user_schema(title="User")
        js = generate(s)
        assert js["type"] == "object"
        assert js["required"] == ["name"]
        assert js["properties"]["name"] == {"type": "string", "minLength": 2}
        assert js["properties"]["age"]["exclusiveMinimum"] == 0
        assert js["properties"]["age"]["exclusiveMaximum"] == 150
        assert js["properties"]["email"]["pattern"] == r".+@.+"
        assert js["properties"]["tags"]["maxItems"] == 5

    def test_provider_strips_format_and_closes(self):
        from sinter_spark import for_provider

        js = for_provider(user_schema(), "openai")
        assert js["additionalProperties"] is False
        # regex constraints survive as "pattern" (json_schema.ex:409-413);
        # providers strip only unsupported *format* keywords (:478-504)
        assert js["properties"]["email"]["pattern"] == r".+@.+"
        assert js["$schema"].startswith("http://json-schema.org/draft-07")
        typed = Schema.define([("d", "date"), ("u", "uuid")])
        js2 = for_provider(typed, "openai")
        assert "format" not in js2["properties"]["d"]  # openai: date/time/email
        assert js2["properties"]["u"]["format"] == "uuid"
        js3 = for_provider(typed, "anthropic")
        assert "format" not in js3["properties"]["u"]  # anthropic: uri/uuid
        assert js3["properties"]["d"]["format"] == "date"

    def test_choices_to_enum(self):
        from sinter_spark import generate

        s = Schema.define([("fmt", "string", {"choices": ["raw", "png"]})])
        assert generate(s)["properties"]["fmt"]["enum"] == ["raw", "png"]
