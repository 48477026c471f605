"""Constraint-plan introspection & plan-hygiene assertions.

The schema struct is the only "plan" in the reference (SURVEY.md §3);
here the bound plan is a list of Column predicates fused by Catalyst.
These helpers make that plan inspectable (what will be checked, at
which path, by which engine tier) and give tests/ops teeth to assert
the physical properties the 100 TB design depends on: column-pruned
scans, no unexpected shuffles in the row pass, broadcast dimension
joins.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame

from .schema import CONSTRAINT_KEYS, Schema
from .types import PRIMITIVES


def describe_plan(schema: Schema) -> list[dict[str, Any]]:
    """Static description of every check the binding will emit:
    (path, code, tier) where tier ∈ {static, predicate, parse,
    python-hook}. Driver-side only — no Spark session needed."""
    out: list[dict[str, Any]] = []

    def spec_tier(spec: Any) -> str:
        if isinstance(spec, str):
            return "parse" if spec in ("date", "datetime", "uuid") else "static"
        return "predicate"

    for name, fd in schema.fields.items():
        if fd.required and fd.default is None:
            out.append({"path": [name], "code": "required", "tier": "predicate"})
        t = fd.type
        tier = spec_tier(t)
        if not (isinstance(t, str) and t == "any"):
            out.append({"path": [name], "code": "type", "tier": tier})
        for key in CONSTRAINT_KEYS:
            if key in fd.constraints:
                out.append({"path": [name], "code": key, "tier": "predicate"})
        if fd.validate:
            out.append({"path": [name], "code": "custom_validation", "tier": "python-hook"})
    if schema.config.post_validate:
        out.append({"path": [], "code": "post_validation", "tier": "predicate"})
    return out


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Shuffles in the physical plan (each Exchange is a shuffle)."""
    return len(re.findall(r"\bExchange\b", physical_plan(df)))


def scan_columns(df: DataFrame) -> list[str]:
    """Columns the parquet scan actually reads (ReadSchema) — the
    column-pruning check: a validation pass that doesn't decode must
    never list the payload column here."""
    plan = physical_plan(df)
    m = re.search(r"ReadSchema: struct<", plan)
    if not m:
        return []
    # bracket-aware extraction: `struct<([^>]*)>` would truncate at the
    # first '>' of a nested map/array/struct field, hiding every later
    # column — including a forbidden wide payload — from the check
    s, depth, start = plan, 1, m.end()
    i = start
    while i < len(s) and depth:
        if s[i] == "<":
            depth += 1
        elif s[i] == ">":
            depth -= 1
        i += 1
    body = s[start : i - 1]
    cols, level, tok = [], 0, []
    for ch in body:
        if ch == "<":
            level += 1
        elif ch == ">":
            level -= 1
        elif ch == "," and level == 0:
            cols.append("".join(tok))
            tok = []
            continue
        tok.append(ch)
    if tok:
        cols.append("".join(tok))
    return [c.split(":")[0].strip() for c in cols if c.strip()]


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def _parse_bytes(v: str) -> int:
    m = re.match(r"^(\d+)([kmg]?)b?$", str(v).strip().lower())
    if not m:
        return 128 * 1024 * 1024
    mult = {"": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30}[m.group(2)]
    return int(m.group(1)) * mult


def estimated_scan_splits(df: DataFrame) -> int | None:
    """Estimated input-split count of a file-backed scan, from
    file-index stats only (no RDD conversion, no job): Σ ceil(size /
    maxPartitionBytes). None when the plan isn't a plain file scan."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    if len(files) > 256:
        # enough files; treat as wide — and decide BEFORE issuing any
        # per-file getFileStatus RPC (each is ~10-50ms on object stores)
        return None
    spark = df.sparkSession
    max_pb = _parse_bytes(spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    splits = 0
    for f in files:
        try:
            p = jvm.org.apache.hadoop.fs.Path(f)
            size = p.getFileSystem(hconf).getFileStatus(p).getLen()
        except Exception:
            return None
        splits += max(1, -(-size // max_pb))
    return int(splits)


def widen_small_scan(df: DataFrame, *, min_parallelism: int | None = None) -> DataFrame:
    """Repartition a SMALL under-split scan so a compute-heavy
    projection (signature hashing, decode kernels) uses every core.

    At scale this is a no-op: a 100 TB table has orders of magnitude
    more splits than cores, so the split estimate exceeds the target
    and no shuffle is added. It only fires for the few-small-files
    case (e.g. a single-file test table), where the shuffle moves
    kilobytes.

    Non-file plans (in-memory relations, join/agg outputs) have no
    file-index stats; for those the partition count comes from the
    plan's RDD handle — a planning-only conversion (no job), acceptable
    off the file path where there is no cheaper source of truth.

    Streaming DataFrames are returned untouched: ``df.rdd`` raises on
    them and a batch-style repartition is meaningless pre-trigger —
    the no-op keeps the signature builders (minhash/simhash kernels)
    usable on streams."""
    if df.isStreaming:
        return df
    target = min_parallelism or df.sparkSession.sparkContext.defaultParallelism
    splits = estimated_scan_splits(df)
    if splits is None:
        try:
            splits = df.rdd.getNumPartitions()
        except Exception:
            return df
    if splits < max(target // 2, 2):
        # deterministic hash repartition, not round-robin: a keyless
        # repartition(n) first pays a LOCAL SORT of its input
        # (spark.sql.execution.sortBeforeRepartition, on by default
        # since SPARK-23207) — on the single-task scans this helper
        # exists for, that sort runs on one core and can cost more
        # than the widen saves. Hashing the row content is
        # deterministic under task retries by construction (guide
        # §2.5: derive synthetic keys deterministically), needs no
        # sort, and spreads fine for any non-degenerate input. Map
        # columns are not hashable; fall back to round-robin then.
        from pyspark.sql import functions as F, types as ST

        hashable = [
            f.name
            for f in df.schema.fields
            if not isinstance(f.dataType, (ST.MapType, ST.VariantType))
        ]
        if hashable:
            return df.repartition(target, F.xxhash64(*[F.col(c) for c in hashable]))
        return df.repartition(target)
    return df


def assert_row_pass_shape(df: DataFrame, *, forbidden_cols: tuple[str, ...] = ("bytes",)) -> None:
    """Raise if the plan violates row-pass hygiene: any shuffle, or a
    forbidden (wide payload) column in the scan."""
    n = count_exchanges(df)
    if n:
        raise AssertionError(f"row pass contains {n} shuffle(s):\n{physical_plan(df)[:2000]}")
    cols = scan_columns(df)
    bad = [c for c in forbidden_cols if c in cols]
    if bad:
        raise AssertionError(f"row pass scans forbidden column(s) {bad}: ReadSchema={cols}")
