"""Port of the /root/reference/test/sinter/types_test.exs tail:
tuple/map/object nesting and literal strictness (types_test.exs:194-264,
506-552) — at BOTH grains: the driver engine (types.validate_value) and
the table binding (binding.bind over struct/map columns)."""

from __future__ import annotations

import pytest

from sinter_spark import Schema
from sinter_spark.binding import bind
from sinter_spark.types import to_json_schema, validate_value


def _codes(errs):
    return [(e.path, e.code) for e in errs]


class TestDriverTupleTypes:
    # types_test.exs:194-230
    def test_valid_tuple(self):
        ok, v, _ = validate_value(("tuple", ["string", "integer"]), ("hello", 42))
        assert ok and tuple(v) == ("hello", 42)

    def test_not_a_tuple(self):
        ok, _, errs = validate_value(("tuple", ["string", "integer"]), "not a tuple")
        assert not ok and errs[0].code == "type"

    def test_wrong_size(self):
        for bad in (("hello",), ("hello", 42, "extra")):
            ok, _, errs = validate_value(("tuple", ["string", "integer"]), bad)
            assert not ok and errs[0].code == "tuple_size"

    def test_element_type_errors_with_paths(self):
        ok, _, errs = validate_value(("tuple", ["string", "integer"]), (42, "hello"))
        assert not ok and len(errs) == 2
        assert (("0",), "type") in _codes(errs)
        assert (("1",), "type") in _codes(errs)

    def test_nested_tuple(self):
        spec = ("tuple", ["string", ("tuple", ["integer", "integer"])])
        ok, v, _ = validate_value(spec, ("valid", (1, 2)))
        assert ok and tuple(v[1]) == (1, 2)
        ok, _, errs = validate_value(spec, ("valid", ("invalid", 42)))
        assert not ok
        assert any(e.path == ("1", "0") and e.code == "type" for e in errs)


class TestDriverMapTypes:
    # types_test.exs:232-247
    def test_valid_map(self):
        ok, v, _ = validate_value(("map", "string", "integer"), {"a": 1, "b": 2})
        assert ok and v == {"a": 1, "b": 2}

    def test_invalid_key_type(self):
        ok, _, errs = validate_value(("map", "integer", "integer"), {"str_key": 1})
        assert not ok and any(e.code == "type" for e in errs)

    def test_invalid_value_type(self):
        ok, _, errs = validate_value(("map", "string", "integer"), {"key": "not_integer"})
        assert not ok and any(e.code == "type" for e in errs)


class TestDriverObjectTypes:
    # types_test.exs:249-263
    def test_nested_object(self):
        inner = Schema.define([("name", "string"), ("age", "integer", {"optional": True})])
        ok, v, _ = validate_value(("object", inner), {"name": "Alice"})
        assert ok and v == {"name": "Alice"}
        ok, _, errs = validate_value(("object", inner), {"age": 30})
        assert not ok and any(e.code == "required" for e in errs)


class TestDriverLiteralTypes:
    # types_test.exs:506-535
    def test_exact_string_match(self):
        ok, v, _ = validate_value(("literal", "sample"), "sample")
        assert ok and v == "sample"

    def test_rejects_non_matching(self):
        ok, _, errs = validate_value(("literal", "sample"), "other")
        assert not ok and errs[0].code == "literal_mismatch"

    def test_exact_integer_match(self):
        ok, v, _ = validate_value(("literal", 42), 42)
        assert ok and v == 42

    def test_type_mismatch_same_representation(self):
        ok, _, errs = validate_value(("literal", "42"), 42)
        assert not ok and errs[0].code == "literal_mismatch"

    def test_meaningful_message(self):
        ok, _, errs = validate_value(("literal", "expected"), "actual")
        assert not ok and "expected" in errs[0].message

    def test_literal_json_schema_const(self):
        # types_test.exs:536-552
        assert to_json_schema(("literal", "sample")) == {"const": "sample"}
        assert to_json_schema(("literal", 42)) == {"const": 42}
        assert to_json_schema(("literal", True)) == {"const": True}


def _viol(res):
    return {(r["row_key"], tuple(r["path"]), r["code"]) for r in res.violations.collect()}


class TestTableGrainTupleTypes:
    """Same semantics over typed struct columns."""

    def test_tuple_size_static(self, spark):
        df = spark.createDataFrame([("1", ("a", 1, "x"))], "id string, pt struct<a:string,b:long,c:string>")
        res = bind(Schema.define([("pt", ("tuple", ["string", "integer"]))]), df, row_key="id")
        assert _viol(res) == {("1", ("pt",), "tuple_size")}

    def test_tuple_element_type_static(self, spark):
        # struct<string,string> vs (string,integer): element 1 mismatch
        df = spark.createDataFrame(
            [("1", ("a", "not-int")), ("2", ("b", "nope"))],
            "id string, pt struct<a:string,b:string>",
        )
        res = bind(Schema.define([("pt", ("tuple", ["string", "integer"]))]), df, row_key="id")
        assert _viol(res) == {
            ("1", ("pt", "1"), "type"),
            ("2", ("pt", "1"), "type"),
        }

    def test_nested_tuple_element_path(self, spark):
        # nested tuple: mismatch surfaces at path (pt, 1, 0)
        df = spark.createDataFrame(
            [("1", ("valid", ("bad", 2)))],
            "id string, pt struct<a:string,b:struct<x:string,y:long>>",
        )
        spec = ("tuple", ["string", ("tuple", ["integer", "integer"])])
        res = bind(Schema.define([("pt", spec)]), df, row_key="id")
        assert _viol(res) == {("1", ("pt", "1", "0"), "type")}

    def test_null_tuple_element_violates(self, spark):
        df = spark.createDataFrame(
            [("1", ("a", None)), ("2", ("b", 5))],
            "id string, pt struct<a:string,b:long>",
        )
        res = bind(Schema.define([("pt", ("tuple", ["string", "integer"]))]), df, row_key="id")
        assert _viol(res) == {("1", ("pt", "1"), "type")}

    def test_runtime_element_check_datetime(self, spark):
        # string-typed element with a datetime spec: runtime regex check
        df = spark.createDataFrame(
            [("1", ("a", "2024-01-01T00:00:00")), ("2", ("b", "not-a-date"))],
            "id string, pt struct<a:string,b:string>",
        )
        res = bind(Schema.define([("pt", ("tuple", ["string", "datetime"]))]), df, row_key="id")
        # ISO8601 failures carry code :format at both grains (types.ex:167)
        assert _viol(res) == {("2", ("pt", "1"), "format")}

    def test_constraints_suppressed_after_tuple_type_failure(self, spark):
        # with-chain short-circuit: a custom validator must not run when
        # an element type check failed
        calls = []

        def never(value):
            calls.append(value)
            return True

        df = spark.createDataFrame(
            [("1", ("a", "bad"))], "id string, pt struct<a:string,b:string>"
        )
        s = Schema.define([("pt", ("tuple", ["string", "integer"]), {"validate": [never]})])
        res = bind(s, df, row_key="id")
        got = _viol(res)
        assert ("1", ("pt", "1"), "type") in got
        assert not any(c == "custom_validation" for _, _, c in got)


class TestTableGrainLiteralStrictness:
    def test_literal_type_strict_across_types(self, spark):
        # literal "42" against an integer column: static mismatch
        df = spark.createDataFrame([("1", 42)], "id string, v long")
        res = bind(Schema.define([("v", ("literal", "42"))]), df, row_key="id")
        assert _viol(res) == {("1", ("v",), "literal_mismatch")}

    def test_literal_integer_match_and_miss(self, spark):
        df = spark.createDataFrame([("1", 42), ("2", 41)], "id string, v long")
        res = bind(Schema.define([("v", ("literal", 42))]), df, row_key="id")
        assert _viol(res) == {("2", ("v",), "literal_mismatch")}


class TestTableGrainMapNesting:
    def test_map_value_runtime_check(self, spark):
        df = spark.createDataFrame(
            [("1", {"a": "2024-01-01"}), ("2", {"b": "junk"})],
            "id string, m map<string,string>",
        )
        res = bind(Schema.define([("m", ("map", "string", "date"))]), df, row_key="id")
        # ISO8601 failures carry code :format at both grains (types.ex:150)
        assert _viol(res) == {("2", ("m", "b"), "format")}

    def test_map_static_value_mismatch(self, spark):
        df = spark.createDataFrame([("1", {"a": 1})], "id string, m map<string,long>")
        res = bind(Schema.define([("m", ("map", "string", "boolean"))]), df, row_key="id")
        assert _viol(res) == {("1", ("m", "a"), "type")}
