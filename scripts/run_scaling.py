"""Scaling-efficiency driver: spark-submit the image-suite job at N and
4N local cores on IDENTICAL input, compute efficiency, write BENCH.md.

Usage: python scripts/run_scaling.py [--n-small 8] [--images-n 120000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def build_zip() -> str:
    zpath = "/tmp/sinter_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "sinter_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def ensure_images(n: int) -> str:
    sys.path.insert(0, REPO)
    from sinter_spark.images.synth import RENDER_VERSION

    path = f"/tmp/sinter_scaling_images_v{RENDER_VERSION}_n{n}.parquet"
    if not os.path.exists(path + "/_SUCCESS"):
        sys.path.insert(0, REPO)
        from sinter_spark.session import get_spark
        from sinter_spark.images import write_images

        spark = get_spark(app_name="scaling_datagen")
        write_images(spark, path, n, seed=42, max_dim=64)
        spark.stop()
    return path


def run_at(cores: int, zpath: str, images: str) -> dict:
    cmd = [
        SPARK_SUBMIT,
        "--master", f"local[{cores}]",
        "--driver-memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
        "--py-files", zpath,
        os.path.join(REPO, "scaling.py"),
        "--images", images,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from spark-submit at local[{cores}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-small", type=int, default=8)
    ap.add_argument("--images-n", type=int, default=3000000)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()
    n_small, n_big = args.n_small, args.n_small * 4

    zpath = build_zip()
    images = ensure_images(args.images_n)
    # the sandbox host is SHARED (load from neighbor tenants varies by
    # tens of cores minute-to-minute); interleave legs and take each
    # leg's best trial as the least-contended estimate
    smalls, bigs = [], []
    for _ in range(args.trials):
        smalls.append(run_at(n_small, zpath, images))
        bigs.append(run_at(n_big, zpath, images))
    small = min(smalls, key=lambda r: r["seconds"])
    big = min(bigs, key=lambda r: r["seconds"])
    eff = (big["rows_per_sec"] / small["rows_per_sec"]) / (n_big / n_small)
    report = {
        "n_small": n_small,
        "n_big": n_big,
        "small": small,
        "big": big,
        "small_trials": [r["seconds"] for r in smalls],
        "big_trials": [r["seconds"] for r in bigs],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(report, indent=2))

    md = f"""# BENCH — scaling-efficiency evidence (north_rule)

Same job (`scaling.py`: full image-suite validation — schema
predicates + decode/PSNR/caption kernel + uniqueness ×2 + broadcast
referential), same input ({small['rows']:,} rows,
`{images}`), launched via `spark-submit --py-files sinter_spark.zip`
at two parallelism levels (sandbox stand-in for N vs 4N executors —
no real cluster here, see BASELINE.md).

| parallelism | seconds | rows/sec |
|---|---|---|
| local[{n_small}] (N) | {small['seconds']} | {small['rows_per_sec']:,} |
| local[{n_big}] (4N) | {big['seconds']} | {big['rows_per_sec']:,} |

**Scaling efficiency = ({big['rows_per_sec']:,} / {small['rows_per_sec']:,}) / 4 =
{eff:.3f}** (target ≥ 0.8 → {"PASS" if eff >= 0.8 else "FAIL"}).

Per-leg trials (seconds): N={report['small_trials']},
4N={report['big_trials']}; each leg's best trial is used.

Caveats, reported honestly: (1) both runs share one machine, so the
N-core run still enjoys the full memory bandwidth and page cache of the
box — single-box "efficiency" can exceed what a real 4×-executor spread
would show for shuffle-heavy stages, and undercount it for CPU-bound
stages competing for shared caches; (2) the sandbox host is shared with
other tenants (observed load-average swings of 20+ cores with this
repo idle), so legs are interleaved and best-of-{args.trials} is taken
as the least-contended estimate. The dominant stage (decode kernel) is
embarrassingly parallel CPU work, the closest local analogue to adding
executors.

Reproduce: `python scripts/run_scaling.py --n-small {n_small} --images-n {small['rows']}`.
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)
    print(f"wrote BENCH.md (efficiency {eff:.3f})")


if __name__ == "__main__":
    main()
