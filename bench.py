"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Top-level metric = the north metric (BASELINE.json): validated rows/sec
of the FULL image-suite pass (schema predicates + decode/PSNR/caption
kernel + uniqueness + referential), measured on the deterministic
synthetic image table. ``queries`` carries per-query wall seconds over
the driver testdata. Generation of the image table is input prep and
excluded from timing (cached parquet under /tmp keyed by size/seed).

Contention-proofing (benchlib.py — the round-2 official record
understated the engine 2.3× by timing a neighbor burst): the bench
waits for a quiet window, then every measurement is ≥3 trials, each
with its own hypervisor-steal reading; if even the best trial was
stolen-from above 0.1 cores it re-runs (bounded) after re-waiting for
quiet. The JSON reports best AND median walls, per-trial
(wall, steal) detail, and the steal on each REPORTED trial so an
auditor can see the record measured the engine, not the neighbors.

Usage: python bench.py            (JSON line to stdout)
       python bench.py --images-n 100000 --trials 3
"""

from __future__ import annotations

import argparse
import json
import re
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from benchlib import measure, read_steal, wait_for_quiet

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
    "repetition_docs",
    "decontaminate_docs",
    "langid_docs",
    "minhash_lsh_docs",
    "simhash_docs",
    "winnow_overlap_docs",
    "topk_cosine",
    "batch_topk_cosine",
    "ivf_topk_cosine",
]


def image_table(spark, n: int, seed: int = 42, max_dim: int = 64, mix: str = "default"):
    from sinter_spark.images import write_images
    from sinter_spark.images.synth import DEFAULT_FMT_MIX, JPEG_FMT_MIX, RENDER_VERSION

    fmt_mix = JPEG_FMT_MIX if mix == "jpeg" else DEFAULT_FMT_MIX
    tag = "" if mix == "default" else f"_m{mix}"
    path = f"/tmp/sinter_bench_images_v{RENDER_VERSION}_n{n}_s{seed}_d{max_dim}{tag}.parquet"
    if not os.path.exists(path + "/_SUCCESS"):
        write_images(spark, path, n, seed=seed, max_dim=max_dim, fmt_mix=fmt_mix)
    return spark.read.parquet(path)


def decode_microbench(per_fmt_n: int = 150, dim: int = 48) -> dict:
    """Driver-side single-thread decode throughput per builtin format
    (img/s and MB/s over deterministic synthetic payloads) — makes the
    per-fmt decode cost a recorded number instead of a guess; jpeg was
    the one unmeasured hot loop (VERDICT_r03 #1)."""
    import numpy as np

    from sinter_spark.images import codecs
    from sinter_spark.images.synth import _encode_payload, render_reference

    out = {}
    for fmt in sorted(codecs.DECODERS):
        payloads = [
            _encode_payload(fmt, render_reference(f"bench-{fmt}-{i}", dim, dim))
            for i in range(per_fmt_n)
        ]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for p in payloads:
                codecs.decode(fmt, p)
            best = min(best, time.perf_counter() - t0)
        nb = sum(len(p) for p in payloads)
        out[fmt] = {
            "img_per_sec": round(per_fmt_n / best, 1),
            "mb_per_sec": round(nb / best / 1e6, 2),
            "payload_bytes": nb // per_fmt_n,
        }
    return out


def run_image_suite(spark, df) -> int:
    """Full constraint suite incl. decode PSNR; returns violation count
    (the action that materializes the whole pass)."""
    from sinter_spark.images import fmt_dim, validate_images_full

    res = validate_images_full(df, fmt_dim(spark))
    return res.violations.count()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images-n", type=int, default=int(os.environ.get("SPARK_GRAFT_IMAGES_N", "60000")))
    ap.add_argument("--jpeg-images-n", type=int, default=int(os.environ.get("SPARK_GRAFT_JPEG_IMAGES_N", "60000")))
    ap.add_argument("--skip-images", action="store_true")
    ap.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--steal-cap", type=float, default=0.1,
                    help="re-run a measurement whose best trial saw more avg steal cores than this")
    ap.add_argument("--quiet-load", type=float, default=6.0)
    ap.add_argument("--quiet-timeout", type=float, default=600.0)
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

    load = wait_for_quiet(args.quiet_load, args.quiet_timeout)
    print(f"# quiet window reached (load {load:.1f})", file=sys.stderr)
    steal0, bench_t0 = read_steal(), time.perf_counter()

    per_query: dict[str, float] = {}
    per_query_median: dict[str, float] = {}
    trial_detail: dict[str, list] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        m = measure(
            lambda: fn(spark, sf_dir).count(),
            trials=args.trials,
            steal_cap=args.steal_cap,
            quiet_load=args.quiet_load,
            quiet_timeout=args.quiet_timeout,
        )
        per_query[name] = m["best"]
        per_query_median[name] = m["median"]
        trial_detail[name] = m["trials"]
        total += m["best"]
        print(
            f"# {name}: {m['best']:.3f}s best (steal {m['best_steal']}) / "
            f"{m['median']:.3f}s median ({m['result']} rows; trials {m['trials']})",
            file=sys.stderr,
        )

    result = {
        "metric": "validated_rows_per_sec_full_image_suite",
        "value": 0.0,
        "unit": "rows/sec",
        "queries": per_query,
        "queries_median": per_query_median,
        "sf": sf,
        "headline_total_sec": round(total, 3),
        "cores": str(args.cores),
        "trials": args.trials,
        "trial_detail": trial_detail,
    }

    if not args.skip_images:
        df = image_table(spark, args.images_n)
        n_rows = df.count()
        # steady-state measurement: one warmup pass over a slice spins up
        # python workers / JIT / page cache (cold-start excluded, as a
        # long-running cluster job would be)
        run_image_suite(spark, df.sample(0.05, seed=1))
        m = measure(
            lambda: run_image_suite(spark, df),
            trials=args.trials,
            steal_cap=args.steal_cap,
            quiet_load=args.quiet_load,
            quiet_timeout=args.quiet_timeout,
        )
        result["value"] = round(n_rows / m["best"], 1)
        result["value_median"] = round(n_rows / m["median"], 1)
        result["images_n"] = n_rows
        result["image_suite_sec"] = m["best"]
        result["image_suite_sec_median"] = m["median"]
        result["image_suite_best_steal"] = m["best_steal"]
        result["image_suite_trials"] = m["trials"]
        result["image_violations"] = m["result"]
        print(
            f"# image_suite: {m['best']:.3f}s best (steal {m['best_steal']}) / "
            f"{m['median']:.3f}s median ({n_rows} rows, {m['result']} violations; "
            f"trials {m['trials']})",
            file=sys.stderr,
        )

    if not args.skip_images:
        # jpeg-bearing leg: crawl-realistic mix (raw 45 / jpeg 40 /
        # png 12 / qjpg 3) through the SAME full suite — jpeg decode in
        # the measured path, reported alongside the headline mix
        djm = image_table(spark, args.jpeg_images_n, mix="jpeg")
        n_rows_j = djm.count()
        run_image_suite(spark, djm.sample(0.05, seed=1))
        mj = measure(
            lambda: run_image_suite(spark, djm),
            trials=args.trials,
            steal_cap=args.steal_cap,
            quiet_load=args.quiet_load,
            quiet_timeout=args.quiet_timeout,
        )
        result["value_jpeg_mix"] = round(n_rows_j / mj["best"], 1)
        result["value_jpeg_mix_median"] = round(n_rows_j / mj["median"], 1)
        result["jpeg_mix_images_n"] = n_rows_j
        result["image_suite_jpeg_sec"] = mj["best"]
        result["image_suite_jpeg_trials"] = mj["trials"]
        result["image_suite_jpeg_violations"] = mj["result"]
        print(
            f"# image_suite_jpeg_mix: {mj['best']:.3f}s best (steal {mj['best_steal']}) / "
            f"{mj['median']:.3f}s median ({n_rows_j} rows, {mj['result']} violations; "
            f"trials {mj['trials']})",
            file=sys.stderr,
        )

    result["decode_microbench"] = decode_microbench()
    print(f"# decode_microbench: {result['decode_microbench']}", file=sys.stderr)

    wall = time.perf_counter() - bench_t0
    result["steal_cores"] = round((read_steal() - steal0) / wall, 2)

    # the driver records only a bounded TAIL of stdout (BENCH_r03.json
    # came back "parsed": null because the full JSON outgrew it) — so
    # stdout gets a COMPACT line and the full record goes to a sidecar
    detail_file = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_detail.json")
    with open(detail_file, "w") as f:
        json.dump(result, f, indent=1)
    compact_keys = [
        "metric", "value", "unit", "queries", "sf", "headline_total_sec",
        "cores", "trials", "value_median", "images_n", "image_suite_sec",
        "image_suite_best_steal", "value_jpeg_mix", "jpeg_mix_images_n",
        "image_suite_jpeg_sec", "steal_cores",
    ]
    compact = {k: result[k] for k in compact_keys if k in result}
    compact["decode_img_per_sec"] = {
        fmt: d["img_per_sec"] for fmt, d in result["decode_microbench"].items()
    }
    compact["detail_file"] = "bench_detail.json"
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
