"""Spark table-binding tests — the distributed validator pipeline.

Ports the semantics of validator_test.exs onto DataFrames: identical
(path, code) violation rows and identical validated output, compared
order-insensitively (SURVEY.md §5 port plan).
"""

import pytest
from pyspark.sql import Row, functions as F

from sinter_spark import Schema
from sinter_spark.binding import BindError, bind


def viol_set(res):
    return {(r["row_key"], tuple(r["path"]), r["code"]) for r in res.violations.collect()}


def user_schema(**opts):
    return Schema.define(
        [
            ("name", "string", {"required": True, "min_length": 2}),
            ("age", "integer", {"optional": True, "gt": 0, "lt": 150}),
            ("email", "string", {"optional": True, "format": r".+@.+"}),
            ("tags", ("array", "string"), {"optional": True, "max_items": 3}),
        ],
        **opts,
    )


@pytest.fixture(scope="module")
def users(spark):
    rows = [
        Row(id="r1", name="Alice", age=30, email="a@x.io", tags=["a"]),
        Row(id="r2", name="Bo", age=None, email=None, tags=None),     # minimal ok
        Row(id="r3", name=None, age=5, email=None, tags=None),        # required
        Row(id="r4", name="A", age=-1, email="nope", tags=None),      # 3 violations
        Row(id="r5", name="Eve", age=200, email=None, tags=["a", "b", "c", "d"]),
    ]
    return spark.createDataFrame(rows)


class TestBindingPipeline:
    def test_violations_and_validated(self, users):
        res = bind(user_schema(), users, row_key="id")
        assert viol_set(res) == {
            ("r3", ("name",), "required"),
            ("r4", ("name",), "min_length"),
            ("r4", ("age",), "gt"),
            ("r4", ("email",), "format"),
            ("r5", ("age",), "lt"),
            ("r5", ("tags",), "max_items"),
        }
        ok_rows = {r["name"] for r in res.validated.collect()}
        assert ok_rows == {"Alice", "Bo"}

    def test_messages_match_reference(self, users):
        res = bind(user_schema(), users, row_key="id")
        msgs = {(r["code"], r["message"]) for r in res.violations.collect()}
        assert ("required", "field is required") in msgs
        assert ("gt", "must be greater than 0") in msgs
        assert ("min_length", "must be at least 2 characters/items long") in msgs
        assert ("max_items", "must contain at most 3 items") in msgs
        assert ("format", "does not match required format") in msgs

    def test_verdicts_shape(self, users):
        res = bind(user_schema(), users.repartition(2), row_key="id")
        vs = res.verdicts.collect()
        assert sum(v["rows"] for v in vs) == 5
        assert sum(v["violations"] for v in vs) == 6
        assert all(set(v["stats"]) == {"violation_rate"} for v in vs)
        assert not all(v["pass"] for v in vs)

    def test_counts_by_code(self, users):
        res = bind(user_schema(), users, row_key="id")
        counts = {r["code"]: r["count"] for r in res.counts_by_code().collect()}
        assert counts == {
            "required": 1,
            "min_length": 1,
            "gt": 1,
            "lt": 1,
            "format": 1,
            "max_items": 1,
        }

    def test_ok_on_clean_table(self, spark):
        df = spark.createDataFrame([Row(name="Alice"), Row(name="Bob")])
        res = bind(Schema.define([("name", "string")]), df)
        assert res.ok()

    def test_missing_required_column_raises(self, spark):
        df = spark.createDataFrame([Row(other=1)])
        with pytest.raises(BindError):
            bind(Schema.define([("name", "string")]), df)

    def test_missing_optional_column_is_skipped(self, spark):
        df = spark.createDataFrame([Row(name="x")])
        s = Schema.define([("name", "string"), ("age", "integer", {"optional": True})])
        res = bind(s, df)
        assert res.ok()
        assert res.validated.columns == ["name", "age"]

    def test_default_applied_on_null(self, spark):
        # validator_test.exs:131-193: default injected for missing
        df = spark.createDataFrame([Row(name="x", active=None), Row(name="y", active=False)])
        s = Schema.define([("name", "string"), ("active", "boolean", {"default": True})])
        res = bind(s, df)
        assert res.ok()
        got = {r["name"]: r["active"] for r in res.validated.collect()}
        assert got == {"x": True, "y": False}

    def test_type_mismatch_static(self, spark):
        # int column bound to float spec → strict type error per row
        df = spark.createDataFrame([Row(score=1), Row(score=2)])
        res = bind(Schema.define([("score", "float")]), df, row_key="score")
        vs = res.violations.collect()
        assert {v["code"] for v in vs} == {"type"}
        assert vs[0]["message"] == "expected float, got integer"

    def test_strict_mode(self, spark):
        df = spark.createDataFrame([Row(id="a", name="xy", extra=1)])
        res = bind(user_schema(strict=True), df, row_key="id")
        codes = {(tuple(v["path"]), v["code"]) for v in res.violations.collect()}
        assert ((), "strict") in codes
        # option override (validator.ex:535-565)
        res2 = bind(user_schema(strict=True), df, row_key="id", strict=False)
        assert res2.ok()

    def test_alias_resolution(self, spark):
        # field_alias_test.exs: alias wins when both present; canonical output
        df = spark.createDataFrame(
            [Row(id="1", accountName="ali", account_name="can")]
        )
        s = Schema.define([("account_name", "string", {"alias": "accountName"})])
        res = bind(s, df, row_key="id")
        assert res.ok()
        assert res.validated.collect()[0]["account_name"] == "ali"


class TestTypeChecks:
    def test_uuid_format(self, spark):
        df = spark.createDataFrame(
            [Row(id="1", u="550e8400-e29b-41d4-a716-446655440000"), Row(id="2", u="nope")]
        )
        res = bind(Schema.define([("u", "uuid")]), df, row_key="id")
        assert viol_set(res) == {("2", ("u",), "format")}

    def test_date_datetime_parse(self, spark):
        df = spark.createDataFrame(
            [
                Row(id="1", d="2024-01-15", t="2024-01-15T10:30:00Z"),
                Row(id="2", d="2024-13-45", t="2024-01-15T10:30:00"),
                Row(id="3", d="junk", t="junk"),
            ]
        )
        s = Schema.define([("d", "date"), ("t", "datetime")])
        res = bind(s, df, row_key="id")
        assert viol_set(res) == {
            ("2", ("d",), "format"),
            ("3", ("d",), "format"),
            ("3", ("t",), "format"),
        }

    def test_literal(self, spark):
        df = spark.createDataFrame([Row(id="1", v="text"), Row(id="2", v="other")])
        res = bind(Schema.define([("v", ("literal", "text"))]), df, row_key="id")
        assert viol_set(res) == {("2", ("v",), "literal_mismatch")}

    def test_nullable_passes_null(self, spark):
        df = spark.createDataFrame([Row(id="1", v=None), Row(id="2", v="x")],
                                   "id string, v string")
        s = Schema.define([("v", ("nullable", "string"), {"optional": True})])
        res = bind(s, df, row_key="id")
        assert res.ok()

    def test_union_over_string_column(self, spark):
        # string column: union[date, uuid] — first-match semantics
        df = spark.createDataFrame(
            [Row(id="1", v="2024-01-01"),
             Row(id="2", v="550e8400-e29b-41d4-a716-446655440000"),
             Row(id="3", v="neither")]
        )
        s = Schema.define([("v", ("union", ["date", "uuid"]))])
        res = bind(s, df, row_key="id")
        assert viol_set(res) == {("3", ("v",), "type")}

    def test_array_element_paths(self, spark):
        # indexed violation paths without exploding the table
        df = spark.createDataFrame(
            [Row(id="1", us=["550e8400-e29b-41d4-a716-446655440000", "bad", "worse"])]
        )
        s = Schema.define([("us", ("array", "uuid"))])
        res = bind(s, df, row_key="id")
        assert viol_set(res) == {
            ("1", ("us", "1"), "format"),
            ("1", ("us", "2"), "format"),
        }

    def test_array_items_constraints_on_type(self, spark):
        df = spark.createDataFrame([Row(id="1", xs=[1]), Row(id="2", xs=[1, 2, 3])])
        s = Schema.define([("xs", ("array", "integer"), {"min_items": 2, "max_items": 2})])
        res = bind(s, df, row_key="id")
        assert viol_set(res) == {
            ("1", ("xs",), "min_items"),
            ("2", ("xs",), "max_items"),
        }


class TestCoercionTable:
    def test_string_to_int_whole_string(self, spark):
        df = spark.createDataFrame(
            [Row(id="1", n="42"), Row(id="2", n="42abc"), Row(id="3", n="3.14")]
        )
        s = Schema.define([("n", "integer", {"gt": 10})])
        res = bind(s, df, row_key="id", coerce=True)
        assert viol_set(res) == {
            ("2", ("n",), "coercion"),
            ("3", ("n",), "coercion"),
        }
        v = res.validated.collect()[0]
        assert v["n"] == 42

    def test_constraints_after_coercion(self, spark):
        # validator_test.exs:450-464
        df = spark.createDataFrame([Row(id="1", n="5")])
        s = Schema.define([("n", "integer", {"gt": 10})])
        res = bind(s, df, row_key="id", coerce=True)
        assert viol_set(res) == {("1", ("n",), "gt")}

    def test_int_to_float_widening(self, spark):
        df = spark.createDataFrame([Row(id="1", x=5)])
        res = bind(Schema.define([("x", "float", {"gteq": 0.0})]), df, row_key="id", coerce=True)
        assert res.ok()
        assert res.validated.collect()[0]["x"] == 5.0

    def test_boolean_coercion(self, spark):
        df = spark.createDataFrame([Row(id="1", b="true"), Row(id="2", b="yes")])
        res = bind(Schema.define([("b", "boolean")]), df, row_key="id", coerce=True)
        assert viol_set(res) == {("2", ("b",), "coercion")}
        msgs = [r["message"] for r in res.violations.collect()]
        assert msgs == ["cannot coerce 'yes' to boolean"]


class TestHooksTable:
    def test_pre_validate_transform(self, spark):
        # pre_validate_test.exs:46-64 at table grain
        df = spark.createDataFrame([Row(id="1", first="Ada", last="L")])
        s = Schema.define(
            [("full_name", "string")],
            pre_validate=lambda d: d.withColumn(
                "full_name", F.concat_ws(" ", "first", "last")
            ),
        )
        res = bind(s, df, row_key="id")
        assert res.ok()
        assert res.validated.collect()[0]["full_name"] == "Ada L"

    def test_post_validate_cross_field(self, spark):
        # validator_test.exs:564-602 cross-field equality
        df = spark.createDataFrame(
            [Row(id="1", password="a", password_confirmation="a"),
             Row(id="2", password="a", password_confirmation="b")]
        )
        s = Schema.define([("password", "string"), ("password_confirmation", "string")])
        res = bind(
            s, df, row_key="id",
            post_validate=lambda d: (
                F.col("password") == F.col("password_confirmation"),
                "passwords do not match",
            ),
        )
        vs = res.violations.collect()
        assert [(v["row_key"], v["code"], v["message"]) for v in vs] == [
            ("2", "post_validation", "passwords do not match")
        ]

    def test_custom_field_validator_vectorized(self, spark):
        def no_admin(v):
            if v == "admin":
                return ("error", "admin is reserved")
            return None

        df = spark.createDataFrame([Row(id="1", name="bob"), Row(id="2", name="admin")])
        s = Schema.define([("name", "string", {"validate": [no_admin]})])
        res = bind(s, df, row_key="id")
        vs = res.violations.collect()
        assert [(v["row_key"], v["code"], v["message"]) for v in vs] == [
            ("2", "custom_validation", "admin is reserved")
        ]
        assert vs[0]["context"] == {"value": "admin"}

    def test_custom_validator_exception_wrapped(self, spark):
        def boom(v):
            raise RuntimeError("nope")

        df = spark.createDataFrame([Row(id="1", name="x")])
        s = Schema.define([("name", "string", {"validate": [boom]})])
        res = bind(s, df, row_key="id")
        v = res.violations.collect()[0]
        assert v["code"] == "custom_validation_error"
        assert "field validator raised" in v["message"]


class TestComposites:
    def test_nested_object_paths(self, spark):
        inner = Schema.define([("email", "string", {"format": r".+@.+"})])
        df = spark.createDataFrame([Row(id="1", user=Row(email="bad"))])
        s = Schema.define([("user", ("object", inner))])
        res = bind(s, df, row_key="id")
        assert viol_set(res) == {("1", ("user", "email"), "format")}

    def test_discriminated_union(self, spark):
        text = Schema.define(
            [("type", ("literal", "text")), ("content", "string", {"min_length": 1})]
        )
        image = Schema.define(
            [("type", ("literal", "image")), ("url", "string", {"format": r"^https?://"})]
        )
        spec = ("discriminated_union", "type", {"text": text, "image": image})
        df = spark.createDataFrame(
            [
                Row(id="1", msg=Row(type="text", content="hi", url=None)),
                Row(id="2", msg=Row(type="image", content=None, url="ftp://x")),
                Row(id="3", msg=Row(type="video", content=None, url=None)),
                Row(id="4", msg=Row(type=None, content="x", url=None)),
            ]
        )
        s = Schema.define([("msg", spec)])
        res = bind(s, df, row_key="id")
        assert viol_set(res) == {
            ("2", ("msg", "url"), "format"),
            ("3", ("msg",), "unknown_discriminator"),
            ("4", ("msg",), "missing_discriminator"),
        }


class TestRaiseIfInvalid:
    def test_returns_validated_when_clean(self, spark):
        from pyspark.sql import Row

        df = spark.createDataFrame([Row(name="Alice")])
        out = bind(Schema.define([("name", "string")]), df).raise_if_invalid()
        assert out.count() == 1

    def test_raises_with_sample(self, spark):
        from pyspark.sql import Row

        from sinter_spark import ValidationError

        df = spark.createDataFrame([Row(id="1", name=None)], "id string, name string")
        with pytest.raises(ValidationError) as ei:
            bind(Schema.define([("name", "string")]), df, row_key="id").raise_if_invalid()
        assert "required" in str(ei.value)


class TestMapElements:
    def test_map_value_checks_with_key_paths(self, spark):
        # types.ex:274-308: every key and value validated; path gets the key
        df = spark.createDataFrame(
            [Row(id="1", props={"a": "2024-01-15", "b": "junk"})],
            "id string, props map<string,string>",
        )
        s = Schema.define([("props", ("map", "string", "date"))])
        res = bind(s, df, row_key="id")
        got = {(tuple(r["path"]), r["code"]) for r in res.violations.collect()}
        assert got == {(("props", "b"), "format")}

    def test_map_uuid_keys(self, spark):
        df = spark.createDataFrame(
            [Row(id="1", m={"550e8400-e29b-41d4-a716-446655440000": 1, "nope": 2})],
            "id string, m map<string,int>",
        )
        s = Schema.define([("m", ("map", "uuid", "integer"))])
        res = bind(s, df, row_key="id")
        got = {(tuple(r["path"]), r["code"]) for r in res.violations.collect()}
        assert got == {(("m", "nope"), "format")}
