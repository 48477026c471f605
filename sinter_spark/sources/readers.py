"""Source readers returning bound validation results.

Each reader: load with an explicit schema (derived from the sinter
Schema when the format carries none), then bind the constraint plan —
one scan, violations + validated handles out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..binding import TableValidationResult, bind
from ..schema import Schema


def read_parquet_validated(
    spark: SparkSession, path: str, schema: Schema, **bind_opts
) -> TableValidationResult:
    """Parquet carries its own types; bind directly (column pruning +
    predicate pushdown reach the scan)."""
    return bind(schema, spark.read.parquet(path), **bind_opts)


def read_csv_validated(
    spark: SparkSession, path: str, schema: Schema, *, coerce: bool = True, header: bool = True, **bind_opts
) -> TableValidationResult:
    """CSV is stringly-typed: read every column as string and let the
    engine's coercion do the whole-string-strict parsing (types.ex:
    428-433) — parse failures become per-row :coercion violations
    instead of a scan-time crash or silent inferSchema guesses.

    With ``header=True`` columns bind BY NAME: Spark's user-schema CSV
    path is positional (``enforceSchema`` ignores the header row), so a
    file whose column order differs from the schema's field order would
    otherwise be silently misassigned — plausible strings would then
    validate cleanly as the wrong fields. The file's own header names
    the all-string columns; ``bind`` resolves fields and aliases
    against them. Headerless CSVs are positional by definition and
    take the schema's field order."""
    if header:
        df = (
            spark.read.option("header", "true")
            .option("inferSchema", "false")  # every column stays string
            .csv(path)
        )
    else:
        ddl = ", ".join(f"{name} string" for name in schema.fields)
        df = spark.read.schema(ddl).option("header", "false").csv(path)
    return bind(schema, df, coerce=coerce, **bind_opts)


def read_json_validated(
    spark: SparkSession, path: str, schema: Schema, *, coerce: bool = False, **bind_opts
) -> TableValidationResult:
    """JSON-lines with the schema's expected shape (json.ex:45-67
    decode = parse + validate, at table grain)."""
    df = spark.read.schema(schema.spark_ddl()).json(path)
    return bind(schema, df, coerce=coerce, **bind_opts)


def testdata_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
