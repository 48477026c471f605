"""Scaling-efficiency job: run the full image-suite validation at the
parallelism given by spark-submit's --master and print one JSON line.

Launched by scripts/run_scaling.py via
    spark-submit --master local[N] --py-files sinter_spark.zip scaling.py ...
which is the sandbox stand-in for N vs 4N executors (BASELINE.md: no
real cluster here — same job, same input, two parallelism levels;
efficiency = (rows/s at 4N) / (4 × rows/s at N)).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--warmup-frac", type=float, default=0.05)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("sinter_scaling")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
        # AQE off for this run: its per-stage re-planning costs seconds
        # on sub-second stages at high thread counts (measured 9.4s→1.0s
        # on a 120k-row groupBy at local[32]); on a real cluster with
        # wide shuffles it stays on (see session.get_spark)
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    cores = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(max(cores, 8)))

    from sinter_spark.images import fmt_dim, validate_images_full

    df = spark.read.parquet(args.images)
    n_rows = df.count()

    def run(frame) -> int:
        return validate_images_full(frame, fmt_dim(spark)).violations.count()

    # steady-state: one untimed FULL pass (first full-size pass pays
    # python-worker/JIT/page-cache one-time costs a sample can't cover)
    run(df)
    t0 = time.perf_counter()
    n_viol = run(df)
    dt = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "cores": cores,
                "rows": n_rows,
                "violations": n_viol,
                "seconds": round(dt, 3),
                "rows_per_sec": round(n_rows / dt, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
