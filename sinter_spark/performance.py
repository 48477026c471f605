"""Performance helpers (§2.7): the metric shapes of
``Sinter.Performance`` (``/root/reference/lib/sinter/performance.ex``).

``benchmark_validation`` reproduces the reference's timed loop
(``performance.ex:39-66``: warmup 100, iterations 1000 →
validations_per_second / avg_time_microseconds) for the driver-grain
validator, and adds a table-grain variant measuring rows/sec of a bound
DataFrame pass (the number BENCH reports).
"""

from __future__ import annotations

import time
import tracemalloc
from typing import Any

from .driver_validate import validate
from .schema import Schema


def benchmark_validation(schema: Schema, sample: dict, *, warmup: int = 100, iterations: int = 1000, **opts) -> dict:
    for _ in range(warmup):
        validate(schema, sample, **opts)
    t0 = time.perf_counter()
    for _ in range(iterations):
        validate(schema, sample, **opts)
    total_us = (time.perf_counter() - t0) * 1e6
    return {
        "iterations": iterations,
        "total_time_microseconds": total_us,
        "avg_time_microseconds": total_us / iterations,
        "validations_per_second": iterations / (total_us / 1e6),
    }


def benchmark_table_validation(schema: Schema, df, *, runs: int = 3, **bind_opts) -> dict:
    """Table grain: rows/sec of a full bound pass (median of runs)."""
    from pyspark.sql import functions as F

    from .binding import bind

    n = df.count()
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        bind(schema, df, **bind_opts).flagged.agg(F.sum(F.size("__errs"))).collect()
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    return {"rows": n, "median_seconds": med, "rows_per_second": n / med, "runs": runs}


def analyze_memory_usage(schema: Schema, sample: dict, *, iterations: int = 100, **opts) -> dict:
    """Python-side analogue of performance.ex:82-107 (tracemalloc delta)."""
    tracemalloc.start()
    base, _ = tracemalloc.get_traced_memory()
    for _ in range(iterations):
        validate(schema, sample, **opts)
    cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    return {
        "iterations": iterations,
        "memory_delta_bytes": cur - base,
        "memory_peak_bytes": peak,
        "memory_per_validation_bytes": max(cur - base, 0) / iterations,
    }


def profile_schema_complexity(schema: Schema) -> dict:
    """Per-field complexity score + recommendations
    (performance.ex:123-147)."""

    def spec_score(spec: Any) -> int:
        if isinstance(spec, str):
            return 2 if spec in ("date", "datetime", "uuid") else 1
        tag = spec[0]
        if tag in ("array", "nullable"):
            return 1 + spec_score(spec[1])
        if tag == "union":
            return 1 + sum(spec_score(s) for s in spec[1])
        if tag == "tuple":
            return 1 + sum(spec_score(s) for s in spec[1])
        if tag == "map":
            return 1 + spec_score(spec[1]) + spec_score(spec[2])
        if tag == "object":
            return 2 + sum(spec_score(f.type) for f in spec[1].fields.values())
        if tag == "discriminated_union":
            return 2 + sum(
                sum(spec_score(f.type) for f in v.fields.values()) for v in spec[2].values()
            )
        return 1

    fields = {}
    for name, fd in schema.fields.items():
        score = spec_score(fd.type) + len(fd.constraints)
        if fd.constraints.get("format") is not None:
            score += 2  # regex is the priciest scalar check
        if fd.validate:
            score += 3  # python hook leaves the JVM
        fields[name] = score
    total = sum(fields.values())
    recs = []
    if any(fd.validate for fd in schema.fields.values()):
        recs.append("custom validators run as Arrow-batched python — keep them off the hot path")
    if total > 50:
        recs.append("consider splitting the schema; constraint plan is wide")
    return {"field_scores": fields, "total_complexity": total, "recommendations": recs}
