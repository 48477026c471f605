"""Differential property test: driver grain ≡ table grain.

The pure-Python pipeline (driver_validate) is the executable semantic
spec; the Column-predicate binding (binding.py) must agree with it on
arbitrary inputs. Hypothesis generates random row batches; we compare
per-row violation (path, code) sets across both engines, modulo the
documented divergence (null ≡ missing at table grain, SURVEY.md §7.3 —
so generated rows never use None for required fields with defaults).
"""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sinter_spark import Schema, validate
from sinter_spark.binding import bind
from sinter_spark.sugar import field, use_schema


def diff_schema():
    return Schema.define(
        [
            ("name", "string", {"min_length": 2, "max_length": 8}),
            ("age", "integer", {"optional": True, "gt": 0, "lt": 150}),
            ("score", "float", {"optional": True, "gteq": 0.0, "lteq": 1.0}),
            ("email", "string", {"optional": True, "format": r"^[a-z]+@[a-z]+$"}),
            ("kind", "string", {"optional": True, "choices": ["a", "b", "c"]}),
            ("uid", "uuid", {"optional": True}),
            # array with non-nullable elements: null elements inside a
            # present array must violate at BOTH grains (ADVICE r1)
            ("tags", ("array", "string"), {"optional": True, "max_items": 3}),
            ("opts", ("array", ("nullable", "integer")), {"optional": True}),
        ]
    )


row_strategy = st.fixed_dictionaries(
    {
        "name": st.one_of(st.none(), st.text(min_size=0, max_size=12)),
        "age": st.one_of(st.none(), st.integers(min_value=-5, max_value=200)),
        "score": st.one_of(
            st.none(), st.floats(min_value=-2, max_value=2, allow_nan=False)
        ),
        "email": st.one_of(
            st.none(),
            st.sampled_from(["ok@ok", "bad", "also@good", "", "x@"]),
        ),
        "kind": st.one_of(st.none(), st.sampled_from(["a", "b", "c", "z", ""])),
        "uid": st.one_of(
            st.none(),
            st.sampled_from(
                [
                    "550e8400-e29b-41d4-a716-446655440000",
                    "not-a-uuid",
                    "550E8400-E29B-41D4-A716-446655440000",
                ]
            ),
        ),
        "tags": st.one_of(
            st.none(),
            st.lists(st.one_of(st.none(), st.sampled_from(["x", "yy", ""])), max_size=4),
        ),
        "opts": st.one_of(
            st.none(),
            st.lists(st.one_of(st.none(), st.integers(-3, 3)), max_size=3),
        ),
    }
)


def driver_violations(schema, rows):
    out = set()
    for i, row in enumerate(rows):
        # table grain: null ≡ missing → drop None keys for the driver
        clean = {k: v for k, v in row.items() if v is not None}
        ok, _, errors = validate(schema, clean)
        for e in errors:
            out.add((str(i), e.path, e.code))
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(row_strategy, min_size=1, max_size=25))
def test_driver_and_table_grain_agree(spark, rows):
    schema = diff_schema()
    pdf = pd.DataFrame(rows)
    pdf.insert(0, "__id", [str(i) for i in range(len(rows))])
    df = spark.createDataFrame(
        pdf,
        "__id string, name string, age long, score double, email string, "
        "kind string, uid string, tags array<string>, opts array<long>",
    )
    res = bind(schema, df, row_key="__id")
    table = {
        (r["row_key"], tuple(r["path"]), r["code"]) for r in res.violations.collect()
    }
    driver = driver_violations(schema, rows)
    assert table == driver, f"table-only: {table - driver} | driver-only: {driver - table}"


def test_use_schema_sugar():
    @use_schema
    class UserSchema:
        """User account"""

        name = field("string", min_length=2)
        age = field("integer", optional=True, gt=0)
        __strict__ = True

    assert isinstance(UserSchema, Schema)
    assert UserSchema.config.strict
    assert UserSchema.config.description == "User account"
    assert UserSchema.required_fields() == ["name"]
    ok, _, errs = validate(UserSchema, {"name": "x"})
    assert errs[0].code == "min_length"


def coerce_schema():
    return Schema.define(
        [
            ("sid", "string"),
            ("n", "integer", {"gt": 10, "optional": True}),
            ("f", "float", {"lteq": 1.0, "optional": True}),
            ("flag", "boolean", {"optional": True}),
            ("nums", ("array", "integer"), {"optional": True, "max_items": 3}),
            ("nick", "string", {"optional": True, "alias": "nickName", "min_length": 2}),
            ("lvl", "integer", {"default": 1, "gteq": 0}),
        ]
    )


coerce_row = st.fixed_dictionaries(
    {
        "sid": st.sampled_from(["a", "b", "c"]),
        "n": st.one_of(st.none(), st.sampled_from(["42", "5", "42abc", "3.14", "-7", ""])),
        "f": st.one_of(st.none(), st.sampled_from(["0.5", "2.5", "1", "x", "1e-3"])),
        "flag": st.one_of(st.none(), st.sampled_from(["true", "false", "yes", ""])),
        "nums": st.one_of(
            st.none(),
            st.lists(
                st.one_of(st.none(), st.sampled_from(["1", "2", "bad", "-3", "9.9"])),
                max_size=4,
            ),
        ),
        "nickName": st.one_of(st.none(), st.sampled_from(["zz", "q", "longername", ""])),
        "lvl": st.one_of(st.none(), st.sampled_from(["3", "-2", "nope"])),
    }
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(coerce_row, min_size=1, max_size=20))
def test_coercion_grains_agree(spark, rows):
    """Coercion + arrays + alias + default: both grains, identical
    (row, path, code) violation sets under coerce=True."""
    schema = coerce_schema()
    pdf = pd.DataFrame(rows)
    pdf.insert(0, "__id", [str(i) for i in range(len(rows))])
    df = spark.createDataFrame(
        pdf,
        "__id string, sid string, n string, f string, flag string, "
        "nums array<string>, nickName string, lvl string",
    )
    res = bind(schema, df, row_key="__id", coerce=True)
    table = {
        (r["row_key"], tuple(r["path"]), r["code"]) for r in res.violations.collect()
    }
    driver = set()
    for i, row in enumerate(rows):
        clean = {k: v for k, v in row.items() if v is not None}
        ok, _, errors = validate(schema, clean, coerce=True)
        for e in errors:
            driver.add((str(i), e.path, e.code))
    assert table == driver, f"table-only: {table - driver} | driver-only: {driver - table}"


def composite_schema():
    return Schema.define(
        [
            ("pt", ("tuple", ["string", "integer"]), {"optional": True}),
            ("lit", ("literal", "x"), {"optional": True}),
            ("m", ("map", "string", "integer"), {"optional": True}),
        ]
    )


composite_row = st.fixed_dictionaries(
    {
        "pt": st.one_of(
            st.none(),
            st.tuples(
                st.one_of(st.none(), st.sampled_from(["a", "bb", ""])),
                st.one_of(st.none(), st.integers(-3, 3)),
            ),
        ),
        "lit": st.one_of(st.none(), st.sampled_from(["x", "y", ""])),
        "m": st.one_of(
            st.none(),
            st.dictionaries(
                st.sampled_from(["k1", "k2"]),
                st.one_of(st.none(), st.integers(-2, 2)),
                max_size=2,
            ),
        ),
    }
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(composite_row, min_size=1, max_size=15))
def test_composite_grains_agree(spark, rows):
    """types_test.exs tail at both grains: tuple element types + null
    elements, literal strictness, map value types — identical
    (row, path, code) violation sets."""
    schema = composite_schema()
    data = [(str(i), r["pt"], r["lit"], r["m"]) for i, r in enumerate(rows)]
    df = spark.createDataFrame(
        data, "__id string, pt struct<a:string,b:long>, lit string, m map<string,long>"
    )
    res = bind(schema, df, row_key="__id")
    table = {
        (r["row_key"], tuple(r["path"]), r["code"]) for r in res.violations.collect()
    }
    driver = set()
    for i, row in enumerate(rows):
        clean = {k: v for k, v in row.items() if v is not None}
        ok, _, errors = validate(schema, clean)
        for e in errors:
            driver.add((str(i), e.path, e.code))
    assert table == driver, f"table-only: {table - driver} | driver-only: {driver - table}"


def nested_schema():
    return Schema.define(
        [
            ("aa", ("array", ("array", "integer")), {"optional": True}),
            ("tags", ("nullable", ("array", "string")), {"optional": True}),
            ("mv", ("map", "string", ("array", "integer")), {"optional": True}),
        ]
    )


nested_row = st.fixed_dictionaries(
    {
        "aa": st.one_of(
            st.none(),
            st.lists(
                st.one_of(
                    st.none(),
                    st.lists(st.one_of(st.none(), st.integers(-3, 3)), max_size=3),
                ),
                max_size=3,
            ),
        ),
        "tags": st.one_of(
            st.none(),
            st.lists(st.one_of(st.none(), st.sampled_from(["a", "b"])), max_size=3),
        ),
        "mv": st.one_of(
            st.none(),
            st.dictionaries(
                st.sampled_from(["k1", "k2"]),
                st.one_of(
                    st.none(),
                    st.lists(st.one_of(st.none(), st.integers(-2, 2)), max_size=3),
                ),
                max_size=2,
            ),
        ),
    }
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(nested_row, min_size=1, max_size=12))
def test_nested_composite_grains_agree(spark, rows):
    """Round-2 nested-composite coverage at both grains: array-of-array
    element types, nullable-wrapped arrays, map values holding arrays —
    identical (row, path, code) violation sets on random data."""
    schema = nested_schema()
    data = [(str(i), r["aa"], r["tags"], r["mv"]) for i, r in enumerate(rows)]
    df = spark.createDataFrame(
        data,
        "__id string, aa array<array<bigint>>, tags array<string>, mv map<string,array<bigint>>",
    )
    res = bind(schema, df, row_key="__id")
    table = {
        (r["row_key"], tuple(r["path"]), r["code"]) for r in res.violations.collect()
    }
    driver = set()
    for i, row in enumerate(rows):
        clean = {k: v for k, v in row.items() if v is not None}
        ok, _, errors = validate(schema, clean)
        for e in errors:
            driver.add((str(i), e.path, e.code))
    assert table == driver, f"table-only: {table - driver} | driver-only: {driver - table}"
