"""Scaling-efficiency driver: spark-submit the image-suite job at N and
4N local cores on IDENTICAL input, compute efficiency, write BENCH.md.

The sandbox host is SHARED: neighbor tenants keep a load average of
~15-20 on this 32-core box with this repo idle (verified with a pure
multiprocessing numpy benchmark: 8→32 procs scales only ~2.2× while
~18 cores of external load runs — 32 own + 18 foreign threads
oversubscribe 32 cores). So the credible N-vs-4N pair is one where
BOTH legs fit beside the neighbors (default 4 vs 16); a 32-thread leg
measures the neighbors, not the engine. Every trial records the 1-min
load average at start/end and legs are interleaved, best-of-N.

Usage: python scripts/run_scaling.py [--n-small 4] [--images-n 3000000] [--trials 2]
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
        from sinter_spark.session import get_spark
        from sinter_spark.images import write_images

        spark = get_spark(app_name="scaling_datagen")
        write_images(spark, path, n, seed=42, max_dim=64)
        spark.stop()
    return path


def wait_for_quiet(threshold: float = 3.0, timeout: float = 900.0) -> float:
    """Block until the 1-min load average drops below ``threshold``
    (neighbor tenants idle AND the previous leg's load decayed — the
    1-min average lags by ~a minute, so back-to-back legs otherwise
    poison each other's 'load at start'). Returns the load seen."""
    import time

    t0 = time.time()
    load = os.getloadavg()[0]
    while load > threshold and time.time() - t0 < timeout:
        time.sleep(15)
        load = os.getloadavg()[0]
    return load


def run_at(cores: int, zpath: str, images: str) -> dict:
    """One spark-submit leg; samples the load average every 5 s DURING
    the run. max(sample − own cores) lower-bounds foreign load — a
    neighbor spike mid-leg (invisible to a start-only reading) shows up
    in ``external_load_peak`` and marks the leg dirty."""
    import threading
    import time

    load0 = os.getloadavg()[0]
    samples: list[float] = []
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            samples.append(os.getloadavg()[0])
            stop.wait(5.0)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    cmd = [
        SPARK_SUBMIT,
        "--master", f"local[{cores}]",
        "--driver-memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
        "--py-files", zpath,
        os.path.join(REPO, "scaling.py"),
        "--images", images,
    ]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    finally:
        stop.set()
        th.join(timeout=1.0)
    peak_foreign = round(max((s - cores for s in samples), default=0.0), 1)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            r = json.loads(line)
            r["external_load_start"] = round(load0, 1)
            r["external_load_peak"] = max(peak_foreign, 0.0)
            return r
    raise RuntimeError(
        f"no JSON from spark-submit at local[{cores}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def median_trial(trials: list[dict]) -> dict:
    """The trial whose wall time is the median (odd counts: exact
    median; even: lower median — a real trial, not an interpolation)."""
    ordered = sorted(trials, key=lambda r: r["seconds"])
    return ordered[(len(ordered) - 1) // 2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-small", type=int, default=8)
    ap.add_argument("--images-n", type=int, default=3000000)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--quiet-load", type=float, default=3.0, help="wait for 1-min load below this before each leg")
    ap.add_argument("--dirty-load", type=float, default=4.0, help="re-run a leg whose mid-run foreign load peak exceeds this")
    args = ap.parse_args()
    n_small, n_big = args.n_small, args.n_small * 4

    zpath = build_zip()
    images = ensure_images(args.images_n)
    dirty_cap = args.dirty_load

    def clean_leg(cores: int, retries: int = 1) -> dict:
        """Run a leg in a quiet window; re-run once if neighbors spiked
        mid-leg (external_load_peak > cap). The last attempt is kept
        either way, flagged by its recorded peak."""
        for attempt in range(retries + 1):
            wait_for_quiet(args.quiet_load)
            r = run_at(cores, zpath, images)
            if r["external_load_peak"] <= dirty_cap:
                return r
            print(f"# leg local[{cores}] dirty (foreign peak {r['external_load_peak']}), retry {attempt + 1}", flush=True)
        return r

    smalls, bigs = [], []
    for _ in range(args.trials):  # interleaved N,4N,N,4N…: both legs see similar noise
        smalls.append(clean_leg(n_small))
        bigs.append(clean_leg(n_big))
    small = median_trial(smalls)
    big = median_trial(bigs)
    eff = (big["rows_per_sec"] / small["rows_per_sec"]) / (n_big / n_small)
    report = {
        "n_small": n_small,
        "n_big": n_big,
        "small": small,
        "big": big,
        "small_trials": [(r["seconds"], r["external_load_start"], r["external_load_peak"]) for r in smalls],
        "big_trials": [(r["seconds"], r["external_load_start"], r["external_load_peak"]) for r in bigs],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(report, indent=2))

    md = f"""# BENCH — scaling-efficiency evidence (north_rule)

Same job (`scaling.py`: full image-suite validation — schema
predicates + decode/PSNR/caption Arrow kernel + uniqueness ×2 +
broadcast referential), same input ({small['rows']:,} rows,
`{images}`), launched via `spark-submit --py-files sinter_spark.zip`
at two parallelism levels (sandbox stand-in for N vs 4N executors —
no real cluster here, see BASELINE.md).

| parallelism | seconds (median) | rows/sec | external load at start |
|---|---|---|---|
| local[{n_small}] (N) | {small['seconds']} | {small['rows_per_sec']:,} | {small['external_load_start']} |
| local[{n_big}] (4N) | {big['seconds']} | {big['rows_per_sec']:,} | {big['external_load_start']} |

**Scaling efficiency = ({big['rows_per_sec']:,} / {small['rows_per_sec']:,}) / 4 =
{eff:.3f}** (target ≥ 0.8 → {"PASS" if eff >= 0.8 else "FAIL"}).

All trials, interleaved N,4N,N,4N,… (seconds, 1-min load at start,
peak foreign load DURING the leg = max(load − own cores) sampled /5s):
N = {report['small_trials']}; 4N = {report['big_trials']}.
The MEDIAN trial per leg is reported. Each leg waits for a quiet window
(load < {args.quiet_load}) before starting and re-runs once if the
foreign peak exceeded {args.dirty_load} mid-leg.

Methodology notes, reported honestly:

1. **This host is shared.** Neighbor tenants have held load averages of
   ~15–20 on this 32-core box in busy windows (verified round 1 with a
   pure numpy multiprocessing benchmark: 8→32 procs scaled only ~2.2×
   under that load). Trials are interleaved N,4N,N,4N and each records
   the 1-min load average at start so a contended window is visible in
   the table; the reported run should come from a quiet window
   (loads ≲ 2 across all trials).
2. Single-box N-vs-4N shares memory bandwidth and page cache — it can
   over- or under-state what a real 4×-executor spread would show. The
   dominant stage (decode kernel) is embarrassingly parallel CPU work,
   the closest local analogue to adding executors; every other stage is
   a column-pruned scan, a map-side-combined aggregate, or a broadcast
   join — shapes whose cluster scaling is architectural.
3. Each leg runs one untimed full warmup pass (python workers, JIT,
   page cache), then one timed pass.

Reproduce: `python scripts/run_scaling.py --n-small {n_small} --images-n {small['rows']} --trials {args.trials}`.
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)
    print(f"wrote BENCH.md (efficiency {eff:.3f})")


if __name__ == "__main__":
    main()
