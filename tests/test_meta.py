"""Transform/JSON I/O (§2.6), DSPEx + performance meta operators (§2.7)."""

import pytest

from sinter_spark import Schema
from sinter_spark.dspex import (
    analyze_failure_patterns,
    analyze_violations_df,
    create_signature,
    optimize_schema_from_failures,
    prepare_for_llm,
    validate_llm_output,
)
from sinter_spark.performance import (
    analyze_memory_usage,
    benchmark_validation,
    profile_schema_complexity,
)
from sinter_spark.transform import NOT_GIVEN, decode, encode, transform, transform_df


class TestTransform:
    def test_sentinel_drop_and_alias(self):
        # transform.ex:38-137 + not_given.ex
        s = Schema.define(
            [("account_name", "string", {"alias": "accountName"}), ("age", "integer", {"optional": True})]
        )
        out = transform(s, {"account_name": "x", "age": NOT_GIVEN})
        assert out == {"accountName": "x"}

    def test_encode_decode_roundtrip(self):
        s = Schema.define([("name", "string"), ("age", "integer", {"optional": True})])
        payload = encode(s, {"name": "ada", "age": 36})
        ok, v, _ = decode(s, payload)
        assert ok and v == {"name": "ada", "age": 36}

    def test_decode_parse_error(self):
        s = Schema.define([("name", "string")])
        ok, _, errs = decode(s, "{nope")
        assert not ok and errs[0].code == "json_decode"

    def test_transform_df_alias(self, spark):
        from pyspark.sql import Row

        s = Schema.define([("account_name", "string", {"alias": "accountName"})])
        df = spark.createDataFrame([Row(account_name="x")])
        out = transform_df(s, df)
        assert out.columns == ["accountName"]


class TestDspex:
    def test_create_signature_tags(self):
        s = create_signature([("q", "string")], [("a", "string")])
        assert s.fields["q"].dspex_field_type == "input"
        assert s.fields["a"].dspex_field_type == "output"

    def test_validate_llm_output_context(self):
        s = Schema.define([("a", "integer")])
        ok, _, errs = validate_llm_output(s, {"a": "x"}, prompt="p1")
        assert not ok
        assert errs[0].context["prompt"] == "p1"

    def test_prepare_for_llm(self):
        s = Schema.define([("a", "integer")])
        bundle = prepare_for_llm(s)
        assert bundle["json_schema"]["additionalProperties"] is False
        assert bundle["required_fields"] == ["a"]

    def test_failure_mining_and_relaxation(self):
        s = Schema.define(
            [("name", "string", {"min_length": 5}), ("age", "integer")],
            title="t",
        )
        failures = [
            {"age": 1, "extra": "x"},          # name missing, extra field
            {"name": "ab", "age": 2, "extra": "y"},  # min_length
            {"name": "abcdef", "age": "NaN", "extra": "z"},  # type
        ]
        pats = analyze_failure_patterns(s, failures)
        assert pats["missing_fields"] == {"name": 1}
        assert pats["constraint_violations"] == {"name": 1}
        assert pats["type_mismatches"] == {"age": 1}
        assert pats["common_extra_fields"] == ["extra"]

        ok, relaxed, suggestions = optimize_schema_from_failures(
            s, failures, relaxation_strategy="aggressive"
        )
        assert ok
        assert not relaxed.fields["name"].required          # moderate+: optional
        assert relaxed.fields["name"].constraints == {}     # aggressive: dropped
        assert relaxed.fields["age"].type == "any"          # aggressive: widened
        assert "extra" in relaxed.fields                    # added as optional
        assert suggestions

    def test_empty_failures_error(self):
        s = Schema.define([("a", "integer")])
        ok, _, msg = optimize_schema_from_failures(s, [])
        assert not ok

    def test_analyze_violations_df(self, spark, sf_dir):
        import __spark_entry__ as em
        from sinter_spark.binding import bind

        res = bind(em.events_schema(), spark.read.parquet(f"{sf_dir}/events.parquet"), row_key="event_id")
        pats = analyze_violations_df(res.violations)
        assert pats["constraint_violations"].get("event_type", 0) > 0


class TestPerformance:
    def test_benchmark_shapes(self):
        s = Schema.define(
            [("a", "integer"), ("b", "string", {"min_length": 1}), ("c", "float", {"gteq": 0, "lteq": 100})]
        )
        r = benchmark_validation(s, {"a": 1, "b": "x", "c": 5.0}, warmup=10, iterations=100)
        assert set(r) == {"iterations", "total_time_microseconds", "avg_time_microseconds", "validations_per_second"}
        # reference floor: <100 µs/item on a 3-field schema
        # (test/performance/batch_validation_test.exs:37-39)
        assert r["avg_time_microseconds"] < 100

    def test_memory_shape(self):
        s = Schema.define([("a", "integer")])
        m = analyze_memory_usage(s, {"a": 1}, iterations=50)
        assert "memory_per_validation_bytes" in m

    def test_complexity_profile(self):
        s = Schema.define(
            [("u", "uuid"), ("tags", ("array", "string"), {"max_items": 5}),
             ("x", "string", {"validate": lambda v: None})]
        )
        p = profile_schema_complexity(s)
        assert p["field_scores"]["x"] > p["field_scores"]["u"]
        assert p["recommendations"]
