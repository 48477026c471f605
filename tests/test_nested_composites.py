"""Nested-composite validation at table grain (regression for two
silent-false-pass defects): nullable-wrapped composites and composite
element specs (array-of-array, array-of-object, map-of-composite) must
validate their interiors, agreeing with the driver grain's verdicts.
"""

from pyspark.sql import Row

from sinter_spark.binding import bind
from sinter_spark.schema import Schema
from sinter_spark.types import validate_value


def _viols(res):
    return sorted(
        (tuple(r["path"]), r["code"]) for r in res.violations.collect()
    )


class TestNullableWrappedComposites:
    def test_nullable_array_elements_checked(self, spark):
        schema = Schema.define([("tags", ("nullable", ("array", "string")), {"required": False})])
        df = spark.createDataFrame(
            [(1, ["ok"]), (2, [None]), (3, None)],
            "row_id bigint, tags array<string>",
        )
        res = bind(schema, df, row_key="row_id")
        got = _viols(res)
        # row 2's null element violates; rows 1 and 3 (null array) pass
        assert got == [(("tags", "0"), "type")]

    def test_nullable_array_wrong_element_column_type(self, spark):
        schema = Schema.define([("nums", ("nullable", ("array", "integer")))])
        df = spark.createDataFrame([(1, ["x"])], "row_id bigint, nums array<string>")
        res = bind(schema, df, row_key="row_id")
        assert _viols(res) == [(("nums", "0"), "type")]

    def test_nullable_object_fields_checked(self, spark):
        inner = Schema.define([("name", "string", {"min_length": 2})])
        schema = Schema.define([("meta", ("nullable", ("object", inner)), {"required": False})])
        df = spark.createDataFrame(
            [Row(row_id=1, meta=Row(name="x")), Row(row_id=2, meta=None)],
            "row_id bigint, meta struct<name string>",
        )
        res = bind(schema, df, row_key="row_id")
        assert _viols(res) == [(("meta", "name"), "min_length")]


class TestCompositeElementSpecs:
    def test_array_of_array_element_types(self, spark):
        schema = Schema.define([("m", ("array", ("array", "integer")))])
        df = spark.createDataFrame(
            [(2, [["a"], ["b", "c"]])], "row_id bigint, m array<array<string>>"
        )
        res = bind(schema, df, row_key="row_id")
        got = _viols(res)
        # driver grain on the same value:
        ok, _, errs = validate_value(("array", ("array", "integer")), [["a"], ["b", "c"]], ("m",))
        assert not ok
        assert {(tuple(e.path), e.code) for e in errs} == set(got)
        assert (("m", "0", "0"), "type") in got

    def test_array_of_object_required_type_constraints(self, spark):
        inner = Schema.define([
            ("name", "string", {"min_length": 2}),
            ("age", "integer", {"gt": 0}),
        ])
        schema = Schema.define([("people", ("array", ("object", inner)))])
        df = spark.createDataFrame(
            [
                Row(row_id=1, people=[
                    Row(name="bob", age=30),     # clean
                    Row(name=None, age=-5),      # required + gt
                    Row(name="x", age=None),     # min_length + required
                ]),
            ],
            "row_id bigint, people array<struct<name string, age bigint>>",
        )
        res = bind(schema, df, row_key="row_id")
        got = _viols(res)
        assert (("people", "1", "name"), "required") in got
        assert (("people", "1", "age"), "gt") in got
        assert (("people", "2", "age"), "required") in got
        assert (("people", "2", "name"), "min_length") in got
        assert all(p[1] != "0" for p, _ in got)  # clean element clean

    def test_map_of_array_values(self, spark):
        schema = Schema.define([("m", ("map", "string", ("array", "integer")))])
        df = spark.createDataFrame(
            [(1, {"good": [1], "bad": [None]})],
            "row_id bigint, m map<string, array<bigint>>",
        )
        res = bind(schema, df, row_key="row_id")
        assert _viols(res) == [(("m", "bad", "0"), "type")]

    def test_tuple_with_array_member(self, spark):
        schema = Schema.define([("t", ("tuple", ["string", ("array", "integer")]))])
        df = spark.createDataFrame(
            [Row(row_id=1, t=Row(c0="ok", c1=[None, 2]))],
            "row_id bigint, t struct<c0 string, c1 array<bigint>>",
        )
        res = bind(schema, df, row_key="row_id")
        got = _viols(res)
        assert (("t", "1", "0"), "type") in got
