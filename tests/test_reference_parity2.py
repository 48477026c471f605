"""Second wave of reference test-suite ports (validator_test.exs cases
not covered by test_core/test_binding)."""

import pytest
from pyspark.sql import Row

from sinter_spark import Schema, validate, validate_many, validate_stream
from sinter_spark.binding import bind


def codes(errors):
    return {(e.path, e.code) for e in errors}


class TestDefaultsVsRequired:
    def test_defaults_applied_before_required_checks(self):
        # validator_test.exs:170-178
        s = Schema.define([("name", "string", {"required": True, "default": "anonymous"})])
        ok, v, _ = validate(s, {})
        assert ok and v == {"name": "anonymous"}

    def test_defaults_applied_before_required_checks_table(self, spark):
        s = Schema.define([("name", "string", {"required": True, "default": "anonymous"})])
        df = spark.createDataFrame([Row(id="1", name=None)], "id string, name string")
        res = bind(s, df, row_key="id")
        assert res.ok()
        assert res.validated.collect()[0]["name"] == "anonymous"

    def test_provided_values_win_over_defaults(self):
        # validator_test.exs:150-168
        s = Schema.define([("active", "boolean", {"default": True})])
        ok, v, _ = validate(s, {"active": False})
        assert v == {"active": False}

    def test_nil_defaults_not_applied(self):
        # validator_test.exs:180-192
        s = Schema.define(
            [("name", "string"), ("nullable", "string", {"optional": True, "default": None})]
        )
        ok, v, _ = validate(s, {"name": "Test"})
        assert ok and "nullable" not in v


class TestArrayCoercion:
    def test_coerces_array_elements_individually(self):
        # validator_test.exs:479-500
        s = Schema.define([("numbers", ("array", "integer"))])
        ok, v, _ = validate(s, {"numbers": ["1", "2", "3"]}, coerce=True)
        assert ok and v == {"numbers": [1, 2, 3]}
        ok, _, errs = validate(s, {"numbers": ["1", "invalid", "3"]}, coerce=True)
        assert codes(errs) == {(("numbers", "1"), "coercion")}

    def test_array_element_coercion_table(self, spark):
        s = Schema.define([("numbers", ("array", "integer"), {"min_items": 2})])
        df = spark.createDataFrame(
            [Row(id="1", numbers=["1", "2", "3"]),
             Row(id="2", numbers=["1", "invalid", "3"]),
             Row(id="3", numbers=["9"])]
        )
        res = bind(s, df, row_key="id", coerce=True)
        got = {(r["row_key"], tuple(r["path"]), r["code"]) for r in res.violations.collect()}
        assert got == {
            ("2", ("numbers", "1"), "coercion"),
            ("3", ("numbers",), "min_items"),
        }
        ok_row = [r for r in res.validated.collect() if r["id"] == "1"][0] if "id" in res.validated.columns else res.validated.collect()[0]
        assert ok_row["numbers"] == [1, 2, 3]


class TestMiscParity:
    def test_mixed_key_normalization(self):
        # validator_test.exs:59-85 — atom keys normalize to strings;
        # python analogue: non-str keys
        s = Schema.define([("a", "integer"), ("b", "integer")])
        ok, v, _ = validate(s, {"a": 1, ("b"): 2})
        assert ok

    def test_empty_schema_accepts_anything_nonstrict(self):
        # validator_test.exs:798-803
        s = Schema.define([])
        ok, v, _ = validate(s, {"whatever": 1})
        assert ok and v == {}

    def test_deeply_nested_structures(self):
        # validator_test.exs:818-840
        inner3 = Schema.define([("leaf", "string", {"min_length": 3})])
        inner2 = Schema.define([("l3", ("object", inner3))])
        inner1 = Schema.define([("l2", ("object", inner2))])
        s = Schema.define([("l1", ("object", inner1))])
        ok, _, errs = validate(s, {"l1": {"l2": {"l3": {"leaf": "ab"}}}})
        assert codes(errs) == {(("l1", "l2", "l3", "leaf"), "min_length")}

    def test_multiple_constraints_single_field(self):
        # validator_test.exs:410-428
        s = Schema.define([("code", "string", {"min_length": 3, "max_length": 5, "format": r"^[A-Z]+$"})])
        ok, _, errs = validate(s, {"code": "ab"})
        # both min_length and format fail, accumulated
        assert codes(errs) == {(("code",), "min_length"), (("code",), "format")}

    def test_stream_error_handling(self):
        # validator_test.exs:896-933
        s = Schema.define([("n", "integer", {"gt": 0})])
        results = list(validate_stream(s, [{"n": 1}, {"n": -1}, {"n": 2}]))
        assert [r[0] for r in results] == [True, False, True]
        assert results[1][2][0].code == "gt"

    def test_batch_empty_list(self):
        # validator_test.exs:750-756
        s = Schema.define([("n", "integer")])
        ok, results, errs = validate_many(s, [])
        assert ok and results == []

    def test_post_validation_invalid_return(self):
        # validator_test.exs:622-640
        s = Schema.define([("a", "string")], post_validate=lambda d: 42)
        ok, _, errs = validate(s, {"a": "x"})
        assert errs[0].code == "post_validation"
        assert "invalid format" in errs[0].message

    def test_coercion_fails_gracefully(self):
        # validator_test.exs:466-477: no raise, structured error
        s = Schema.define([("n", "integer")])
        ok, _, errs = validate(s, {"n": [1, 2]}, coerce=True)
        assert not ok and errs[0].code == "coercion"


class TestJsonSchemaMeta:
    def test_meta_validation_gate(self):
        # json_schema.ex:176-188 — meta-schema validation when the
        # validator lib is available, graceful skip otherwise
        from sinter_spark.json_schema import validate_schema

        s = Schema.define([("a", "integer", {"gteq": 0})])
        ok, info = validate_schema(s)
        assert ok  # either validated clean or skipped with reason
