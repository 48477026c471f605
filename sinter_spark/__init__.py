"""sinter_spark — a PySpark-native schema + constraint validation engine.

A from-scratch re-expression of the semantics of nshkrdotcom/sinter
(runtime-first schema definition / validation, ``/root/reference``) as a
distributed, Arrow-vectorized data-quality engine: schemas are runtime
values that *bind* to DataFrames as Catalyst Column predicates, emitting
per-partition pass/fail verdicts plus exploded violation rows, with
table-level checks (column stats, uniqueness, referential integrity,
distribution drift, payload decode) layered on stock Spark primitives.
"""

from .api import (
    batch_validator_for,
    infer_schema,
    infer_schema_from_df,
    validate_many_typed,
    validate_type,
    validate_value,
    validator_for,
)
from .driver_validate import validate, validate_bang, validate_many, validate_stream
from .errors import (
    ERROR_CODES,
    Error,
    ValidationError,
    filter_by_code,
    format_errors,
    group_by_code,
    group_by_path,
    summarize,
    to_maps,
)
from .json_schema import for_provider, generate
from .schema import FieldDef, Schema, SchemaConfig, merge_schemas

__version__ = "0.1.0"


def __getattr__(name):
    # Spark-dependent surface, loaded lazily so the pure-Python core
    # imports without a JVM: sinter_spark.bind / validate_table
    if name in ("bind", "validate_table", "TableValidationResult", "BindError"):
        from . import binding

        return getattr(binding, name)
    if name in ("get_catalog", "LocalParquetCatalog", "IcebergCatalog", "Table", "Snapshot"):
        from . import catalog

        return getattr(catalog, name)
    raise AttributeError(f"module 'sinter_spark' has no attribute {name!r}")

__all__ = [
    "ERROR_CODES",
    "Error",
    "FieldDef",
    "Schema",
    "SchemaConfig",
    "ValidationError",
    "batch_validator_for",
    "filter_by_code",
    "for_provider",
    "format_errors",
    "generate",
    "group_by_code",
    "group_by_path",
    "infer_schema",
    "infer_schema_from_df",
    "merge_schemas",
    "summarize",
    "to_maps",
    "validate",
    "validate_bang",
    "validate_many",
    "validate_many_typed",
    "validate_stream",
    "validate_type",
    "validate_value",
    "validator_for",
]
