"""Typed sources: read + bind in one step.

The engine's inputs are ordinary Spark sources; these helpers attach
schema binding at read time (compile-once semantics,
``/root/reference/lib/sinter.ex:279-319``) and keep scan options
scale-sane (explicit schemas — never inferSchema in a pipeline).
"""

from .readers import (
    read_csv_validated,
    read_json_validated,
    read_parquet_validated,
    testdata_table,
)

__all__ = [
    "read_csv_validated",
    "read_json_validated",
    "read_parquet_validated",
    "testdata_table",
]
