"""Column-stats pass: null rate, min/max, (approx) distinct.

The table-level generalization of sinter's required/bounds checks
(SURVEY.md §2.8): one aggregate pass over the table computes every
per-column statistic at once. Spark executes this as a partial
(map-side) aggregation per partition merged treewise — the same
two-level merge the north_star describes — with HLL++ sketches behind
``approx_count_distinct``. Column pruning means only the requested
columns are scanned (never ``bytes``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as ST

_NUMERIC = (
    ST.ByteType,
    ST.ShortType,
    ST.IntegerType,
    ST.LongType,
    ST.FloatType,
    ST.DoubleType,
    ST.DecimalType,
)


def column_stats(df: DataFrame, cols: list[str] | None = None, *, approx: bool = True) -> DataFrame:
    """Long-format stats: one row per column, ONE scan + ONE reduce.

    ``approx=True`` uses HLL++ (`approx_count_distinct`, rsd 5%);
    ``approx=False`` uses exact distinct (oracle-comparable, costlier).
    min/max reported as doubles for numeric columns, null otherwise
    (string min/max formatting is engine-specific and breaks oracles).
    """
    if cols is None:
        cols = df.columns
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    # internal aliases are POSITIONAL (nulls__0, …), never derived from
    # the user's column names: a name with spaces/dashes/quotes would
    # break the stack() expression below; column access is backtick-
    # quoted so dots resolve as literal name chars, not struct nesting
    def _c(name: str):
        return F.col("`" + name.replace("`", "``") + "`")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(_c(c).isNull().cast("long")).alias(f"nulls__{i}"))
        if isinstance(dtypes[c], _NUMERIC):
            aggs.append(F.min(_c(c)).cast("double").alias(f"min__{i}"))
            aggs.append(F.max(_c(c)).cast("double").alias(f"max__{i}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"min__{i}"))
            aggs.append(F.lit(None).cast("double").alias(f"max__{i}"))
        if approx:
            aggs.append(F.approx_count_distinct(_c(c)).alias(f"dist__{i}"))
        else:
            aggs.append(F.count_distinct(_c(c)).alias(f"dist__{i}"))
    wide = df.agg(*aggs)

    def _lit(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    # unpivot wide → long with one stack expression (no extra pass)
    stack_args = ", ".join(
        f"{_lit(c)}, nulls__{i}, min__{i}, max__{i}, dist__{i}" for i, c in enumerate(cols)
    )
    return wide.selectExpr(
        "__n as n_rows",
        f"stack({len(cols)}, {stack_args}) as (column, n_nulls, min_value, max_value, n_distinct)",
    ).select(
        "column",
        "n_rows",
        "n_nulls",
        (F.col("n_nulls") / F.col("n_rows")).alias("null_rate"),
        "min_value",
        "max_value",
        "n_distinct",
    )


def stats_map(df: DataFrame, cols: list[str] | None = None) -> dict[str, dict]:
    """Driver-side dict of the same pass (for checkpoint metrics)."""
    return {
        r["column"]: {
            "n_rows": r["n_rows"],
            "null_rate": r["null_rate"],
            "min": r["min_value"],
            "max": r["max_value"],
            "n_distinct": r["n_distinct"],
        }
        for r in column_stats(df, cols).collect()
    }
