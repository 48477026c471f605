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


def _injective_stack_expr(bt: str, dt) -> tuple[str, str]:
    """(group, SQL expr) embedding a column injectively for exact
    distinct counting — the cheapest lossless representation per type.

    Fewer groups = fewer column-pruned source scans, and fixed-width
    values shuffle fewer bytes than strings, so every type that embeds
    exactly in a double or a long goes there; only genuinely variable-
    width types pay the string cast. Injectivity per group:

    * ``double``: float/double themselves (groupBy normalizes NaN and
      -0.0 exactly like ``count_distinct``) plus byte/short/int — every
      int32 is exactly representable in a double (< 2^53), so the r4
      ADVICE collision (distinct longs past 2^53 merging) cannot occur.
    * ``long``: long (identity), boolean, date (epoch days), timestamp
      (``unix_micros`` — a plain long cast would truncate sub-second
      digits and merge distinct instants), and decimals with precision
      ≤ 18 via scale shift (unscaled value fits a long: 10^18 < 2^63).
    * ``string``: everything else atomic (strings, wide decimals,
      NTZ timestamps, …) — the injective fallback.
    """
    if isinstance(dt, (ST.FloatType, ST.DoubleType, ST.ByteType, ST.ShortType, ST.IntegerType)):
        return "double", f"cast({bt} as double)"
    if isinstance(dt, (ST.LongType, ST.BooleanType)):
        return "long", f"cast({bt} as long)"
    if isinstance(dt, ST.DateType):
        return "long", f"cast(datediff({bt}, date'1970-01-01') as long)"
    if isinstance(dt, ST.TimestampType):
        return "long", f"unix_micros({bt})"
    if isinstance(dt, ST.DecimalType) and dt.precision <= 18:
        if dt.scale == 0:
            return "long", f"cast({bt} as long)"
        return "long", f"cast({bt} * {10 ** dt.scale} as long)"
    return "string", f"cast({bt} as string)"


def column_stats(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    approx: bool = True,
    quantiles: tuple[float, ...] | list[float] | None = None,
    quantile_accuracy: int = 10_000,
) -> DataFrame:
    """Long-format stats: one row per column.

    ``quantiles``: optional probabilities (e.g. ``(0.5, 0.95, 0.99)``)
    adding one ``q_<pct>`` double column per probability for numeric
    source columns (null otherwise). They ride the SAME single wide
    aggregate via ``percentile_approx`` — no extra pass, map-side GK
    sketches merged treewise, so a wide table's quantile report costs
    one scan at any scale (drift on quantiles is cheaper than full
    histograms). ``quantile_accuracy`` is the GK sketch bound: with
    accuracy ≥ n the sketch is exact — the element at 1-indexed rank
    ``ceil(p·n)`` of the sorted non-null values, which a SQL oracle
    replicates with a ROW_NUMBER window (see ``quantiles_lineitem``).

    ``approx=True``: HLL++ (`approx_count_distinct`, rsd 5%) riding the
    single distinct-free wide aggregate — ONE scan + ONE reduce.
    ``approx=False``: exact distinct (oracle-comparable). N same-agg
    ``count_distinct``s make Catalyst emit an Expand (every row
    multiplied ×(N+1), then a shuffle keyed on ALL N value columns —
    measured 3× slower than the rewrite at sf0.1 and strictly worse at
    scale), so for atomic column types the exact path instead runs the
    wide agg WITHOUT distincts plus a canonical two-phase distinct over
    a stacked (column, value) long table: map-side partial dedup, one
    shuffle of the per-partition-distinct survivors, count per column.
    Each column stacks under the cheapest INJECTIVE embedding for its
    type (``_injective_stack_expr``): int32-and-below ride the double
    group (exact < 2^53, so the r4 ADVICE collision — {2^53, 2^53+1,
    2^53+2} counting as two — cannot occur), longs/booleans/dates/
    timestamps/narrow decimals the long group, and only variable-width
    types pay a string cast. Fewer groups = fewer column-pruned source
    scans (a float+int table stays ONE scan) and fixed-width shuffle
    rows. Non-atomic (array/map/struct) columns fall back to the
    multi-distinct single agg, where string casts aren't injective.
    min/max reported as doubles for numeric columns, null otherwise
    (string min/max formatting is engine-specific and breaks oracles).
    """
    if cols is None:
        cols = df.columns
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    all_atomic = all(isinstance(dtypes[c], ST.AtomicType) for c in cols)
    exact_long = (not approx) and all_atomic
    # internal aliases are POSITIONAL (nulls__0, …), never derived from
    # the user's column names: a name with spaces/dashes/quotes would
    # break the stack() expression below; column access is backtick-
    # quoted so dots resolve as literal name chars, not struct nesting
    def _c(name: str):
        return F.col("`" + name.replace("`", "``") + "`")

    def _bt(name: str) -> str:
        return "`" + name.replace("`", "``") + "`"

    qs = [float(p) for p in quantiles] if quantiles else []
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(_c(c).isNull().cast("long")).alias(f"nulls__{i}"))
        if isinstance(dtypes[c], _NUMERIC):
            aggs.append(F.min(_c(c)).cast("double").alias(f"min__{i}"))
            aggs.append(F.max(_c(c)).cast("double").alias(f"max__{i}"))
            if qs:
                aggs.append(
                    F.percentile_approx(
                        _c(c).cast("double"), qs, quantile_accuracy
                    ).alias(f"qs__{i}")
                )
        else:
            aggs.append(F.lit(None).cast("double").alias(f"min__{i}"))
            aggs.append(F.lit(None).cast("double").alias(f"max__{i}"))
            if qs:
                aggs.append(F.lit(None).cast("array<double>").alias(f"qs__{i}"))
        if approx:
            aggs.append(F.approx_count_distinct(_c(c)).alias(f"dist__{i}"))
        elif not exact_long:
            aggs.append(F.count_distinct(_c(c)).alias(f"dist__{i}"))
    wide = df.agg(*aggs)

    def _lit(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    # stack scalars, not the sketch arrays: stack() requires bit-equal
    # types per position and the null-literal array differs from the
    # percentile_approx array in containsNull; element extraction is a
    # plain nullable double on both sides
    qcol = "".join(f", qs__{{i}}[{j}]" for j in range(len(qs)))
    qout = "".join(f", __q{j}" for j in range(len(qs)))

    # unpivot wide → long with one stack expression (no extra pass)
    if exact_long:
        stack_args = ", ".join(
            f"{_lit(c)}, nulls__{i}, min__{i}, max__{i}" + qcol.format(i=i)
            for i, c in enumerate(cols)
        )
        base = wide.selectExpr(
            "__n as n_rows",
            f"stack({len(cols)}, {stack_args}) as (column, n_nulls, min_value, max_value{qout})",
        )
        dists = []
        groups: dict[str, list[tuple[str, str]]] = {}
        for c in cols:
            grp, expr = _injective_stack_expr(_bt(c), dtypes[c])
            groups.setdefault(grp, []).append((c, expr))
        for group in groups.values():
            vstack = ", ".join(f"{_lit(c)}, {expr}" for c, expr in group)
            long = df.selectExpr(
                f"stack({len(group)}, {vstack}) as (column, value)"
            ).where(F.col("value").isNotNull())
            dists.append(
                long.groupBy("column", "value")
                .agg(F.lit(1))
                .groupBy("column")
                .agg(F.count(F.lit(1)).alias("n_distinct"))
            )
        dist = dists[0]
        for d in dists[1:]:
            dist = dist.unionByName(d)
        # left join: an all-null column has no long rows but distinct 0
        stacked = base.join(F.broadcast(dist), "column", "left").withColumn(
            "n_distinct", F.coalesce("n_distinct", F.lit(0).cast("long"))
        )
    else:
        stack_args = ", ".join(
            f"{_lit(c)}, nulls__{i}, min__{i}, max__{i}, dist__{i}" + qcol.format(i=i)
            for i, c in enumerate(cols)
        )
        stacked = wide.selectExpr(
            "__n as n_rows",
            f"stack({len(cols)}, {stack_args}) as (column, n_nulls, min_value, max_value, n_distinct{qout})",
        )

    def _qname(p: float) -> str:
        return ("q_%g" % (p * 100)).replace(".", "_")

    return stacked.select(
        "column",
        "n_rows",
        "n_nulls",
        (F.col("n_nulls") / F.col("n_rows")).alias("null_rate"),
        "min_value",
        "max_value",
        "n_distinct",
        *[F.col(f"__q{j}").alias(_qname(p)) for j, p in enumerate(qs)],
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
