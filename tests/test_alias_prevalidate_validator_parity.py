"""Block-by-block ports of the reference's field_alias_test.exs,
pre_validate_test.exs, and field_validator_test.exs tails — the cases
not already covered by test_core/test_binding (driver grain = the
semantic spec; table-grain mirrors where the behavior is observable).
"""

import pytest

from sinter_spark.driver_validate import validate
from sinter_spark.schema import Schema


class TestFieldAliasTail:
    # field_alias_test.exs:"required check works with alias"
    def test_required_satisfied_via_alias_and_missing_both(self):
        s = Schema.define([("account_name", "string", {"alias": "accountName"})])
        ok, out, _ = validate(s, {"accountName": "x"})
        assert ok and out["account_name"] == "x"
        ok2, _, errs = validate(s, {})
        assert not ok2 and errs[0].code == "required"

    # field_alias_test.exs:"alias works with nested objects"
    def test_alias_inside_nested_object(self):
        inner = Schema.define([("full_name", "string", {"alias": "fullName"})])
        s = Schema.define([("user", ("object", inner))])
        ok, out, errs = validate(s, {"user": {"fullName": "ada"}})
        assert ok, errs
        assert out["user"]["full_name"] == "ada"

    # field_alias_test.exs:"fields without alias use canonical name"
    def test_no_alias_canonical_only(self):
        s = Schema.define([("name", "string")])
        ok, out, _ = validate(s, {"name": "x"})
        assert ok and out == {"name": "x"}


class TestPreValidateTail:
    def _schema(self, fn, fields=(("name", "string"),)):
        return Schema.define(list(fields), pre_validate=fn)

    # pre_validate_test.exs:"pre_validate can add fields"
    def test_add_fields(self):
        s = self._schema(lambda d: {**d, "name": d.get("n", "").upper()})
        ok, out, _ = validate(s, {"n": "bob"})
        assert ok and out["name"] == "BOB"

    # pre_validate_test.exs:"pre_validate can remove fields"
    def test_remove_fields(self):
        s = Schema.define(
            [("name", "string")], strict=True,
            pre_validate=lambda d: {k: v for k, v in d.items() if k != "junk"},
        )
        ok, out, errs = validate(s, {"name": "x", "junk": 1})
        assert ok, errs
        assert out == {"name": "x"}

    # pre_validate_test.exs:"pre_validate nil means no transformation"
    def test_none_hook_is_noop(self):
        s = Schema.define([("name", "string")])
        ok, out, _ = validate(s, {"name": "x"})
        assert ok and out == {"name": "x"}

    # pre_validate_test.exs:"pre_validate works with nested schemas"
    def test_nested_schema_hook_runs(self):
        inner = Schema.define(
            [("v", "string")], pre_validate=lambda d: {"v": str(d.get("v", "")).strip()}
        )
        s = Schema.define([("obj", ("object", inner))])
        ok, out, errs = validate(s, {"obj": {"v": "  x  "}})
        assert ok, errs
        assert out["obj"]["v"] == "x"

    # pre_validate_test.exs:"can normalize input keys"
    def test_normalizes_nonstring_keys(self):
        s = Schema.define([("1", "string")])
        ok, out, _ = validate(s, {1: "x"})  # int key → "1"
        assert ok and out["1"] == "x"

    # pre_validate_test.exs:"returning error tuple fails validation"
    def test_error_tuple_return_is_input_format(self):
        s = self._schema(lambda d: ("error", "nope"))
        ok, _, errs = validate(s, {"name": "x"})
        assert not ok and errs[0].code == "input_format"


class TestFieldValidatorTail:
    # field_validator_test.exs:"custom validator runs after type check"
    def test_not_run_when_type_fails(self):
        calls = []

        def v(x):
            calls.append(x)
            return None

        s = Schema.define([("age", "integer", {"validate": [v]})])
        ok, _, errs = validate(s, {"age": "not-int"})
        assert not ok and errs[0].code == "type"
        assert calls == []

    # field_validator_test.exs:"validator can transform value"
    def test_transform_reaches_output(self):
        s = Schema.define([("name", "string", {"validate": [lambda x: ("ok", x.strip())]})])
        ok, out, _ = validate(s, {"name": "  x  "})
        assert ok and out["name"] == "x"

    # field_validator_test.exs:"validator receives value after type coercion"
    def test_receives_coerced_value(self):
        seen = []

        def v(x):
            seen.append(x)
            return None

        s = Schema.define([("age", "integer", {"validate": [v]})])
        ok, _, errs = validate(s, {"age": "42"}, coerce=True)
        assert ok, errs
        assert seen == [42]

    # field_validator_test.exs:"validator error includes field path"
    def test_error_path(self):
        s = Schema.define([("name", "string", {"validate": [lambda x: ("error", "bad")]})])
        ok, _, errs = validate(s, {"name": "x"})
        assert not ok and errs[0].path == ("name",) and errs[0].code == "custom_validation"

    # field_validator_test.exs:"multiple validators can be specified as list"
    def test_multiple_validators_chain(self):
        s = Schema.define(
            [("name", "string", {"validate": [
                lambda x: None,
                lambda x: ("error", "second") if x == "bad" else None,
            ]})]
        )
        ok, _, errs = validate(s, {"name": "bad"})
        assert not ok and errs[0].message == "second"
        ok2, _, _ = validate(s, {"name": "good"})
        assert ok2

    # field_validator_test.exs:"validator only runs if field is present"
    def test_not_run_when_absent(self):
        calls = []
        s = Schema.define(
            [("name", "string", {"required": False, "validate": [lambda x: calls.append(x)]})]
        )
        ok, _, _ = validate(s, {})
        assert ok and calls == []

    # field_validator_test.exs:"validator exception is caught and wrapped"
    def test_exception_wrapped(self):
        def boom(x):
            raise RuntimeError("kapow")

        s = Schema.define([("name", "string", {"validate": [boom]})])
        ok, _, errs = validate(s, {"name": "x"})
        assert not ok and errs[0].code == "custom_validation_error"
        assert "kapow" in errs[0].message

    # field_validator_test.exs:"validators work with array elements"
    def test_validator_sees_whole_array(self):
        seen = []

        def v(x):
            seen.append(list(x))
            return ("error", "too many") if len(x) > 2 else None

        s = Schema.define([("tags", ("array", "string"), {"validate": [v]})])
        ok, _, errs = validate(s, {"tags": ["a", "b", "c"]})
        assert not ok and errs[0].code == "custom_validation"
        assert seen == [["a", "b", "c"]]

    # field_validator_test.exs:"returning just :ok is treated as success"
    def test_bare_true_is_success_with_original_value(self):
        s = Schema.define([("name", "string", {"validate": [lambda x: True]})])
        ok, out, _ = validate(s, {"name": "x"})
        assert ok and out["name"] == "x"

    # field_validator_test.exs:"validator runs on nil if present with nullable type"
    def test_runs_on_none_when_nullable_present(self):
        seen = []

        def v(x):
            seen.append(x)
            return None

        s = Schema.define(
            [("name", ("nullable", "string"), {"required": False, "validate": [v]})]
        )
        ok, _, errs = validate(s, {"name": None})
        assert ok, errs
        assert seen == [None]
