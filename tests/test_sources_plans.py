"""Typed sources, function surface, and plan-hygiene assertions."""

import pytest
from pyspark.sql import functions as F

from sinter_spark import Schema
from sinter_spark import functions as SF
from sinter_spark import plans
from sinter_spark.binding import bind
from sinter_spark.sources import read_csv_validated, read_json_validated, read_parquet_validated


class TestSources:
    def test_parquet_validated(self, spark, sf_dir):
        s = Schema.define([("event_id", "integer"), ("value", "float", {"gteq": 0})])
        res = read_parquet_validated(spark, f"{sf_dir}/events.parquet", s, row_key="event_id")
        assert res.ok()

    def test_csv_coerces_stringly_columns(self, spark, tmp_path):
        p = str(tmp_path / "data.csv")
        with open(p, "w") as f:
            f.write("id,n\na,42\nb,oops\n")
        s = Schema.define([("id", "string"), ("n", "integer", {"gt": 10})])
        res = read_csv_validated(spark, p, s, row_key="id")
        got = {(r["row_key"], r["code"]) for r in res.violations.collect()}
        assert got == {("b", "coercion")}
        assert res.validated.collect()[0]["n"] == 42

    def test_json_decode_validate(self, spark, tmp_path):
        p = str(tmp_path / "data.jsonl")
        with open(p, "w") as f:
            f.write('{"name": "ok", "age": 5}\n{"name": "x", "age": -1}\n')
        s = Schema.define([("name", "string", {"min_length": 2}), ("age", "integer", {"gt": 0})])
        res = read_json_validated(spark, p, s, row_key="name")
        got = {(r["row_key"], r["code"]) for r in res.violations.collect()}
        assert got == {("x", "min_length"), ("x", "gt")}


class TestFunctions:
    def test_column_builders(self, spark):
        df = spark.createDataFrame(
            [("550e8400-e29b-41d4-a716-446655440000", "2024-01-15", 5, "a b the c")],
            "u string, d string, n int, t string",
        )
        row = df.select(
            SF.is_uuid("u").alias("uuid_ok"),
            SF.is_iso_date("d").alias("date_ok"),
            SF.within("n", gt=0, lteq=10).alias("n_ok"),
            SF.one_of("u", ["x"]).alias("choice"),
            SF.token_count("t").alias("toks"),
            SF.stopword_ratio("t").alias("sr"),
        ).collect()[0]
        assert row["uuid_ok"] and row["date_ok"] and row["n_ok"] and not row["choice"]
        assert row["toks"] == 4
        assert row["sr"] == 0.5  # "a" and "the" of 4 tokens


class TestPlans:
    def test_describe_plan(self):
        s = Schema.define(
            [
                ("u", "uuid"),
                ("n", "integer", {"gt": 0, "optional": True}),
                ("x", "string", {"validate": lambda v: None}),
            ],
            post_validate=lambda df: (F.lit(True), "m"),
        )
        d = plans.describe_plan(s)
        tiers = {(tuple(e["path"]), e["code"]): e["tier"] for e in d}
        assert tiers[(("u",), "type")] == "parse"
        assert tiers[(("n",), "gt")] == "predicate"
        assert tiers[(("x",), "custom_validation")] == "python-hook"
        assert ((), "post_validation") in tiers

    def test_row_pass_hygiene_on_image_table(self, spark):
        # the no-decode row pass must be shuffle-free and never scan bytes
        from sinter_spark.images import generate_images, image_schema

        path_df = generate_images(spark, 200, seed=9, max_dim=24, partitions=2)
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            path_df.write.parquet(f"{d}/img")
            df = spark.read.parquet(f"{d}/img")
            res = bind(image_schema(include_bytes=False), df, row_key="image_id")
            plans.assert_row_pass_shape(res.flagged)
            assert "bytes" not in plans.scan_columns(res.flagged)
            assert plans.count_exchanges(res.flagged) == 0

    def test_broadcast_detection(self, spark, sf_dir):
        from sinter_spark.operators.referential import orphans

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet").selectExpr("c_custkey as user_id")
        assert plans.uses_broadcast_join(orphans(ev, cust, "user_id"))
