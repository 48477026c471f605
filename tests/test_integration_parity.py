"""Port of /root/reference/test/integration_test.exs (970 LoC).

End-to-end driver-grain workflows: Schema → Validate → JSON Schema,
provider generation, complex type nesting, post_validate business
rules, coercion pipelines, and the (relaxed) performance contracts.
Pure driver-side — no Spark session needed.
"""

from __future__ import annotations

import re
import time

from sinter_spark import Schema, for_provider, generate, validate, validate_many


def _codes(errors):
    return [e.code for e in errors]


class TestUserRegistrationWorkflow:
    # integration_test.exs:7-113
    def _schema(self):
        return Schema.define(
            [
                ("username", "string", {"min_length": 3, "max_length": 20, "format": r"^[a-zA-Z0-9_]+$"}),
                ("email", "string", {"format": r".+@.+\..+"}),
                ("password", "string", {"min_length": 8, "format": r"(?=.*[A-Z])(?=.*[a-z])(?=.*\d)"}),
                ("age", "integer", {"optional": True, "gteq": 13, "lteq": 120}),
                ("interests", ("array", "string"), {"optional": True, "max_items": 10}),
                ("terms_accepted", "boolean", {"choices": [True]}),
            ],
            title="User Registration",
            description="Schema for new user registration",
        )

    def test_valid_registration(self):
        ok, validated, _ = validate(
            self._schema(),
            {
                "username": "alice_123",
                "email": "alice@example.com",
                "password": "SecurePass123",
                "age": 25,
                "interests": ["programming", "music"],
                "terms_accepted": True,
            },
        )
        assert ok
        assert validated["username"] == "alice_123"
        assert validated["age"] == 25
        assert validated["interests"] == ["programming", "music"]
        assert validated["terms_accepted"] is True

    def test_json_schema_for_docs(self):
        js = generate(self._schema())
        assert js["type"] == "object"
        assert js["title"] == "User Registration"
        assert js["description"] == "Schema for new user registration"
        req = js["required"]
        assert {"username", "email", "password", "terms_accepted"} <= set(req)
        assert "age" not in req and "interests" not in req
        u = js["properties"]["username"]
        assert (u["type"], u["minLength"], u["maxLength"], u["pattern"]) == ("string", 3, 20, "^[a-zA-Z0-9_]+$")
        p = js["properties"]["password"]
        assert p["minLength"] == 8 and p["pattern"] == r"(?=.*[A-Z])(?=.*[a-z])(?=.*\d)"
        a = js["properties"]["age"]
        assert (a["type"], a["minimum"], a["maximum"]) == ("integer", 13, 120)
        i = js["properties"]["interests"]
        assert i["type"] == "array" and i["items"]["type"] == "string" and i["maxItems"] == 10
        t = js["properties"]["terms_accepted"]
        assert t["type"] == "boolean" and t["enum"] == [True]

    def test_validation_failures(self):
        ok, _, errors = validate(
            self._schema(),
            {
                "username": "a",  # too short
                "email": "invalid-email",
                "password": "weak",
                "age": 10,
                "interests": [f"interest_{i}" for i in range(15)],
                "terms_accepted": False,
            },
        )
        assert not ok and len(errors) >= 6
        codes = _codes(errors)
        for c in ("min_length", "format", "gteq", "max_items", "choices"):
            assert c in codes, c


class TestEcommerceProductWorkflow:
    # integration_test.exs:115-199
    def _schema(self):
        return Schema.define(
            [
                ("name", "string", {"min_length": 1, "max_length": 100}),
                ("sku", "string", {"format": r"^[A-Z]{2}-\d{4}-[A-Z]{2}$"}),
                ("price", "float", {"gt": 0, "lteq": 10_000.0}),
                ("category", "string", {"choices": ["electronics", "clothing", "books", "home"]}),
                ("tags", ("array", "string"), {"optional": True, "min_items": 1, "max_items": 5}),
                ("specifications", "map", {"optional": True}),
                ("availability", "boolean"),
                ("variants", ("array", "map"), {"optional": True, "max_items": 10}),
            ],
            title="Product Schema",
            strict=True,
        )

    def _valid(self):
        return {
            "name": "Wireless Headphones",
            "sku": "EL-1234-WH",
            "price": 199.99,
            "category": "electronics",
            "tags": ["wireless", "audio", "bluetooth"],
            "specifications": {"battery_life": "20 hours", "weight": "250g", "color": "black"},
            "availability": True,
            "variants": [{"color": "black", "stock": 50}, {"color": "white", "stock": 30}],
        }

    def test_valid_product_and_openai_schema(self):
        ok, validated, _ = validate(self._schema(), self._valid())
        assert ok and validated["sku"] == "EL-1234-WH" and validated["price"] == 199.99
        js = for_provider(self._schema(), "openai")
        assert js["additionalProperties"] is False
        assert js["type"] == "object" and isinstance(js["required"], list)

    def test_strict_rejects_extra_fields(self):
        data = {**self._valid(), "unauthorized_field": "value"}
        ok, _, errors = validate(self._schema(), data)
        assert not ok and len(errors) == 1
        assert errors[0].code == "strict"
        assert "unauthorized_field" in errors[0].message

    def test_constraint_violations(self):
        ok, _, errors = validate(
            self._schema(),
            {
                "name": "",
                "sku": "INVALID-SKU",
                "price": -10.0,
                "category": "invalid_category",
                "tags": [],
                "availability": True,
            },
        )
        assert not ok
        codes = _codes(errors)
        for c in ("min_length", "format", "gt", "choices", "min_items"):
            assert c in codes, c


class TestPostValidateBusinessRules:
    # integration_test.exs:200-301
    def _schema(self):
        def rules(order):
            if order["total_amount"] > 1000.0 and order.get("billing_address") is None:
                return ("error", "Orders over $1000 require billing address")
            if order["total_amount"] > 50.0:
                return ("ok", {**order, "free_shipping": True})
            return ("ok", order)

        return Schema.define(
            [
                ("order_id", "string", {"format": r"^ORD-\d{8}$"}),
                ("customer_email", "string", {"format": r".+@.+"}),
                ("items", ("array", "map"), {"min_items": 1}),
                ("shipping_address", "map"),
                ("billing_address", "map", {"optional": True}),
                ("total_amount", "float", {"gt": 0}),
                ("currency", "string", {"choices": ["USD", "EUR", "GBP"]}),
                ("payment_method", "string", {"choices": ["credit_card", "paypal", "bank_transfer"]}),
            ],
            post_validate=rules,
        )

    def _order(self, **over):
        base = {
            "order_id": "ORD-12345678",
            "customer_email": "customer@example.com",
            "items": [{"product_id": "P001", "quantity": 2, "price": 25.0}],
            "shipping_address": {"street": "123 Main St", "city": "Anytown", "zip": "12345"},
            "total_amount": 50.0,
            "currency": "USD",
            "payment_method": "credit_card",
        }
        base.update(over)
        return base

    def test_exactly_50_no_free_shipping(self):
        ok, validated, _ = validate(self._schema(), self._order())
        assert ok and "free_shipping" not in validated

    def test_over_50_free_shipping(self):
        ok, validated, _ = validate(self._schema(), self._order(total_amount=75.0))
        assert ok and validated["free_shipping"] is True

    def test_expensive_requires_billing(self):
        ok, _, errors = validate(self._schema(), self._order(total_amount=1500.0))
        assert not ok and len(errors) == 1
        assert errors[0].code == "post_validation"
        assert "billing address" in errors[0].message

    def test_expensive_with_billing_passes(self):
        ok, validated, _ = validate(
            self._schema(),
            self._order(total_amount=1500.0, billing_address={"street": "789 Pine St"}),
        )
        assert ok and validated["free_shipping"] is True and isinstance(validated["billing_address"], dict)


class TestProviderWorkflows:
    # integration_test.exs:303-412
    def test_openai_function_calling(self):
        schema = Schema.define(
            [
                ("query", "string", {"description": "Search query"}),
                ("max_results", "integer", {"optional": True, "default": 10, "gteq": 1, "lteq": 100}),
                ("include_metadata", "boolean", {"optional": True, "default": False}),
                ("filters", ("array", "string"), {"optional": True}),
            ],
            title="Search Function",
            description="Performs a search with the given parameters",
        )
        js = for_provider(schema, "openai")
        assert js["type"] == "object" and js["additionalProperties"] is False
        assert "query" in js["required"]
        ok, validated, _ = validate(
            schema,
            {"query": "machine learning tutorials", "max_results": 25, "include_metadata": True, "filters": ["recent", "video"]},
        )
        assert ok and validated["max_results"] == 25
        ok, validated, _ = validate(schema, {"query": "elixir programming"})
        assert ok
        assert validated["max_results"] == 10  # default applied
        assert validated["include_metadata"] is False  # default applied

    def test_anthropic_tool_use(self):
        schema = Schema.define(
            [
                ("action", "string", {"choices": ["create", "update", "delete", "read"]}),
                ("resource_type", "string", {"choices": ["user", "post", "comment"]}),
                ("resource_id", "string", {"optional": True}),
                ("data", "map", {"optional": True}),
                ("options", "map", {"optional": True}),
            ],
            title="Database Tool",
            description="Tool for database operations",
        )
        js = for_provider(schema, "anthropic")
        assert js["type"] == "object" and js["additionalProperties"] is False
        assert "properties" in js
        ok, validated, _ = validate(
            schema,
            {"action": "create", "resource_type": "user", "data": {"name": "John Doe", "email": "john@example.com"}},
        )
        assert ok and validated["action"] == "create" and isinstance(validated["data"], dict)
        ok, validated, _ = validate(
            schema, {"action": "read", "resource_type": "post", "resource_id": "post_123"}
        )
        assert ok and validated["resource_id"] == "post_123"


class TestComplexTypeWorkflows:
    # integration_test.exs:415-481
    def _schema(self):
        return Schema.define(
            [
                ("data_points", ("array", ("tuple", ["string", ("union", ["integer", "float"])]))),
                ("metadata", ("map", "string", ("union", ["string", "integer", "boolean"])), {"optional": True}),
                ("processing_options", ("union", ["string", "map"]), {"optional": True}),
            ]
        )

    def test_nested_tuple_union_map(self):
        data = {
            "data_points": [("temperature", 23.5), ("humidity", 65), ("pressure", 1013.25)],
            "metadata": {"source": "sensor_001", "calibrated": True, "readings_count": 100},
            "processing_options": {"algorithm": "linear_interpolation", "smoothing": True},
        }
        ok, validated, errs = validate(self._schema(), data)
        assert ok, errs
        first = validated["data_points"][0]
        assert tuple(first) == ("temperature", 23.5)
        assert validated["metadata"]["source"] == "sensor_001"
        assert validated["metadata"]["calibrated"] is True
        assert validated["metadata"]["readings_count"] == 100
        # union alternative: plain string
        ok, validated, _ = validate(self._schema(), {**data, "processing_options": "default"})
        assert ok and validated["processing_options"] == "default"

    def test_json_schema_of_complex_types(self):
        js = generate(self._schema())
        dp = js["properties"]["data_points"]
        assert dp["type"] == "array" and dp["items"]["type"] == "array"
        assert dp["items"]["prefixItems"] == [
            {"type": "string"},
            {"oneOf": [{"type": "integer"}, {"type": "number"}]},
        ]
        assert js["properties"]["processing_options"]["oneOf"] == [
            {"type": "string"},
            {"type": "object", "additionalProperties": True},
        ]

    def test_polymorphic_post_validate(self):
        # integration_test.exs:483-581
        def content_rules(message):
            t = message["type"]
            c = message.get("content")
            if t == "text":
                return ("ok", message) if isinstance(c, str) else ("error", "Text messages must have string content")
            if t == "image":
                return ("ok", message) if isinstance(c, dict) and "url" in c else ("error", "Image messages must have content with url")
            if t == "file":
                return ("ok", message) if isinstance(c, dict) and "filename" in c else ("error", "File messages must have content with filename")
            return ("ok", {**message, "system_processed": True})

        schema = Schema.define(
            [
                ("type", "string", {"choices": ["text", "image", "file", "system"]}),
                ("content", ("union", ["string", "map"])),
                ("timestamp", "integer", {"gt": 0}),
                ("metadata", "map", {"optional": True}),
            ],
            post_validate=content_rules,
        )
        ok, v, _ = validate(schema, {"type": "text", "content": "Hello, world!", "timestamp": 1_234_567_890})
        assert ok and v["content"] == "Hello, world!"
        ok, v, _ = validate(
            schema,
            {"type": "image", "content": {"url": "https://example.com/image.jpg", "alt_text": "A beautiful sunset"}, "timestamp": 1},
        )
        assert ok and v["content"]["url"] == "https://example.com/image.jpg"
        ok, v, _ = validate(schema, {"type": "system", "content": "User joined the channel", "timestamp": 1})
        assert ok and v["system_processed"] is True
        ok, _, errors = validate(schema, {"type": "text", "content": {"not": "string"}, "timestamp": 1})
        assert not ok and errors[0].code == "post_validation" and "string content" in errors[0].message
        ok, _, errors = validate(schema, {"type": "image", "content": {"missing": "url"}, "timestamp": 1})
        assert not ok and "url" in errors[0].message


class TestCoercionWorkflows:
    # integration_test.exs:584-663
    def _api_schema(self):
        return Schema.define(
            [
                ("user_id", "integer", {"gt": 0}),
                ("limit", "integer", {"optional": True, "default": 20, "gteq": 1, "lteq": 100}),
                ("offset", "integer", {"optional": True, "default": 0, "gteq": 0}),
                ("sort_ascending", "boolean", {"optional": True, "default": True}),
                ("filters", ("array", "string"), {"optional": True}),
                ("include_metadata", "boolean", {"optional": True, "default": False}),
            ]
        )

    def test_api_input_normalization(self):
        ok, n, errs = validate(
            self._api_schema(),
            {
                "user_id": "12345",
                "limit": "50",
                "offset": "100",
                "sort_ascending": "false",
                "filters": ["active", "verified"],
                "include_metadata": "true",
            },
            coerce=True,
        )
        assert ok, errs
        assert n["user_id"] == 12_345 and n["limit"] == 50 and n["offset"] == 100
        assert n["sort_ascending"] is False and n["include_metadata"] is True
        assert n["filters"] == ["active", "verified"]

    def test_defaults_with_minimal_input(self):
        ok, n, _ = validate(self._api_schema(), {"user_id": "999"}, coerce=True)
        assert ok
        assert (n["user_id"], n["limit"], n["offset"]) == (999, 20, 0)
        assert n["sort_ascending"] is True and n["include_metadata"] is False

    def test_coercion_failure(self):
        ok, _, errors = validate(self._api_schema(), {"user_id": "not_a_number", "limit": "50"}, coerce=True)
        assert not ok and len(errors) == 1
        assert errors[0].code == "coercion" and errors[0].path == ("user_id",)

    def test_constraints_after_coercion(self):
        ok, _, errors = validate(self._api_schema(), {"user_id": "0", "limit": "150"}, coerce=True)
        assert not ok and len(errors) == 2
        assert set(_codes(errors)) == {"gt", "lteq"}

    def test_csv_import_workflow(self):
        # integration_test.exs:665-760
        schema = Schema.define(
            [
                ("name", "string", {"min_length": 1}),
                ("email", "string", {"format": r".+@.+"}),
                ("age", "integer", {"optional": True, "gteq": 0, "lteq": 150}),
                ("is_active", "boolean", {"optional": True, "default": True}),
                ("join_date", "string", {"optional": True, "format": r"^\d{4}-\d{2}-\d{2}$"}),
            ]
        )
        rows = [
            {"name": "Alice Johnson", "email": "alice@example.com", "age": "28", "is_active": "true", "join_date": "2023-01-15"},
            {"name": "Bob Smith", "email": "bob@example.com", "age": "35", "is_active": "false", "join_date": "2023-02-20"},
            {"name": "Charlie Brown", "email": "charlie@example.com"},
        ]
        results = [validate(schema, r, coerce=True) for r in rows]
        assert all(ok for ok, _, _ in results)
        alice = results[0][1]
        assert alice["age"] == 28 and alice["is_active"] is True
        assert results[1][1]["is_active"] is False
        charlie = results[2][1]
        assert charlie["is_active"] is True and "age" not in charlie
        ok, all_validated, _ = validate_many(schema, rows, coerce=True)
        assert ok and len(all_validated) == 3
        ok, _, error_map = validate_many(
            schema,
            [
                {"name": "", "email": "alice@example.com", "age": "28"},
                {"name": "Valid Name", "email": "invalid-email", "age": "200"},
            ],
            coerce=True,
        )
        assert not ok and 0 in error_map and 1 in error_map
        assert any(e.code == "min_length" for e in error_map[0])
        second = _codes(error_map[1])
        assert "format" in second and "lteq" in second


class TestPerformanceContracts:
    # integration_test.exs:763-906 — same contracts, Python-calibrated
    # bounds (reference allows <100ms compile, <1ms/item validate)
    def test_schema_compilation_speed(self):
        t0 = time.perf_counter()
        s = Schema.define([(f"field_{i}", "string", {"optional": True, "min_length": 1}) for i in range(100)])
        elapsed = time.perf_counter() - t0
        assert elapsed < 0.1
        assert len(s.fields) == 100

    def test_validation_speed(self):
        schema = Schema.define(
            [
                ("id", "integer", {"gt": 0}),
                ("name", "string", {"min_length": 1, "max_length": 100}),
                ("email", "string", {"format": r".+@.+"}),
                ("tags", ("array", "string"), {"optional": True, "max_items": 10}),
            ]
        )
        dataset = [
            {"id": i, "name": f"User {i}", "email": f"user{i}@example.com", "tags": ["tag1", "tag2"]}
            for i in range(1, 1001)
        ]
        t0 = time.perf_counter()
        results = [validate(schema, d) for d in dataset]
        elapsed = time.perf_counter() - t0
        assert all(ok for ok, _, _ in results)
        assert elapsed / len(dataset) < 0.001  # <1ms per item, reference contract

    def test_json_schema_generation_speed(self):
        schema = Schema.define(
            [
                ("simple_field", "string"),
                ("array_field", ("array", "string"), {"optional": True}),
                ("union_field", ("union", ["string", "integer", "boolean"]), {"optional": True}),
                ("tuple_field", ("tuple", ["string", "integer", "float"]), {"optional": True}),
                ("map_field", ("map", "string", "integer"), {"optional": True}),
                ("nested_array", ("array", ("array", "string")), {"optional": True}),
                ("complex_union", ("union", ["string", ("array", "integer"), "map"]), {"optional": True}),
            ]
        )
        t0 = time.perf_counter()
        for _ in range(100):
            generate(schema)
        avg = (time.perf_counter() - t0) / 100
        assert avg < 0.001  # <1ms per generation, reference contract

    def test_batch_vs_individual(self):
        schema = Schema.define([("name", "string"), ("value", "integer", {"gt": 0})])
        dataset = [{"name": f"item_{i}", "value": i} for i in range(1, 1001)]
        t0 = time.perf_counter()
        individual = [validate(schema, d) for d in dataset]
        t_ind = time.perf_counter() - t0
        t0 = time.perf_counter()
        ok, batch, _ = validate_many(schema, dataset)
        t_batch = time.perf_counter() - t0
        assert ok and [v for _, v, _ in individual] == batch
        assert t_ind / t_batch >= 0.5  # batch at least half as fast
