"""Scaling-efficiency driver: spark-submit the image-suite job at N and
4N local cores on IDENTICAL input, compute efficiency, write BENCH.md.

The sandbox host is a SHARED VM. Three contention channels, each
handled explicitly:

1. same-VM neighbor load — wait_for_quiet gates each leg; the load
   average is sampled every 5 s DURING the leg and a foreign spike
   re-runs it;
2. hypervisor steal — invisible to the load average; measured from
   /proc/stat across each leg, re-running when the hypervisor stole
   > --steal-cap cores on average;
3. the VM's own scaling ceiling — with zero steal and zero load, a
   pure-CPU burn scales 8→32 at only ~0.72-0.87 (4→16: ~0.99): the
   hypervisor simply does not grant 4× the cycles at 32 vCPUs. The
   ceiling is measured in-session and reported next to the engine's
   number.

Trials are interleaved N,4N,N,4N,…; the BEST (min-wall) trial per leg
is the headline estimator (contention can only slow a trial down), with
the median reported alongside. Multiple core pairs (default 4→16 and
8→32) are measured in one invocation and written to one BENCH.md.

Usage: python scripts/run_scaling.py [--pairs 4,8] [--images-n 3000000] [--trials 3]
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
sys.path.insert(0, REPO)
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

from benchlib import read_steal as _read_steal  # noqa: E402  (shared with bench.py)
from benchlib import wait_for_quiet as _wait_for_quiet  # noqa: E402


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


def ensure_images(n: int, mix: str = "default") -> str:
    sys.path.insert(0, REPO)
    from sinter_spark.images.synth import DEFAULT_FMT_MIX, JPEG_FMT_MIX, RENDER_VERSION

    suffix = "" if mix == "default" else f"_{mix}"
    path = f"/tmp/sinter_scaling_images_v{RENDER_VERSION}{suffix}_n{n}.parquet"
    if not os.path.exists(path + "/_SUCCESS"):
        from sinter_spark.session import get_spark
        from sinter_spark.images import write_images

        spark = get_spark(app_name="scaling_datagen")
        write_images(
            spark, path, n, seed=42, max_dim=64,
            fmt_mix=JPEG_FMT_MIX if mix == "jpeg" else DEFAULT_FMT_MIX,
        )
        spark.stop()
    return path


def wait_for_quiet(
    threshold: float = 3.0, timeout: float = 900.0, steal_cap: float = 0.5
) -> float:
    """Quiet-window gate — shared implementation in benchlib.py (the
    1-min load must decay below ``threshold`` AND a 5 s steal sample
    must stay below ``steal_cap`` cores; steal is invisible to the
    load average). Returns the load seen."""
    return _wait_for_quiet(threshold, timeout, steal_cap)


def run_at(cores: int, zpath: str, images: str) -> dict:
    """One spark-submit leg; samples the load average every 5 s DURING
    the run (max(sample − own cores) lower-bounds foreign same-VM load)
    and measures hypervisor steal across the leg (``steal_cores`` =
    stolen CPU-seconds / wall — the average number of cores the
    hypervisor took away mid-leg)."""
    import threading
    import time

    load0 = os.getloadavg()[0]
    steal0 = _read_steal()
    t_start = time.time()
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
    wall = max(time.time() - t_start, 1e-9)
    steal_cores = round((_read_steal() - steal0) / wall, 2)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            r = json.loads(line)
            r["external_load_start"] = round(load0, 1)
            r["external_load_peak"] = max(peak_foreign, 0.0)
            r["steal_cores"] = steal_cores
            return r
    raise RuntimeError(
        f"no JSON from spark-submit at local[{cores}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def _burn(n: int) -> int:
    x = 0x9E3779B97F4A7C15
    for _ in range(n):
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & ((1 << 64) - 1)
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB & ((1 << 64) - 1)
    return x


def _triad(n: int) -> float:
    """One STREAM-triad-like pass over ~48 MB of float64 per call —
    DRAM-bandwidth-bound, the memory-side complement of _burn."""
    import numpy as np

    m = 2_000_000
    a = np.empty(m)
    b = np.random.default_rng(1).standard_normal(m)
    c = np.random.default_rng(2).standard_normal(m)
    for _ in range(n):
        np.multiply(b, 1.000001, out=a)
        a += c
    return float(a[0])


def memory_ceiling(n_small: int, n_big: int, *, reps: int = 24) -> dict:
    """Memory-bandwidth N-vs-4N scaling ratio: a multiprocessing
    STREAM-triad burn. Data work (parquet scan + Arrow decode) is
    bounded by THIS ceiling where pure-CPU work is not — on a VM whose
    upper vCPUs share memory channels (or SMT siblings), 4× threads do
    not get 4× bandwidth, and no data engine can scale past that."""
    import multiprocessing as mp
    import time

    thr = {}
    for procs in (n_small, n_big):
        with mp.Pool(procs) as p:
            p.map(_triad, [1] * procs)  # warm pool + allocators
            t0 = time.time()
            p.map(_triad, [reps] * procs)
            wall = time.time() - t0
        thr[procs] = procs * reps / wall
    return {
        "ceiling": round(thr[n_big] / thr[n_small] / (n_big / n_small), 3),
        "small_passes_s": round(thr[n_small], 1),
        "big_passes_s": round(thr[n_big], 1),
    }


def hardware_ceiling(n_small: int, n_big: int, *, n_ops: int = 40_000_000) -> dict:
    """Pure-integer-CPU N-vs-4N throughput ratio — the VM's *hardware*
    scaling ceiling for this core pair, measured at run time.

    This box is a VM on an oversubscribed hypervisor: with ZERO steal
    and zero same-VM load, 32 workers deliver only ~0.72-0.87× of 4×
    the 8-worker throughput (measured 2026-08-16), while 4→16 measures
    ~0.99. No engine can scale past what the silicon delivers; the
    engine's efficiency is interpretable relative to this ceiling."""
    import multiprocessing as mp
    import time

    thr = {}
    for procs in (n_small, n_big):
        with mp.Pool(procs) as p:
            p.map(_burn, [1000] * procs)  # warm the pool
            t0 = time.time()
            p.map(_burn, [n_ops] * procs)
            wall = time.time() - t0
        thr[procs] = procs * n_ops / wall
    return {
        "ceiling": round(thr[n_big] / thr[n_small] / (n_big / n_small), 3),
        "small_mops": round(thr[n_small] / 1e6, 1),
        "big_mops": round(thr[n_big] / 1e6, 1),
    }


def median_trial(trials: list[dict]) -> dict:
    """The trial whose wall time is the median (odd counts: exact
    median; even: lower median — a real trial, not an interpolation)."""
    ordered = sorted(trials, key=lambda r: r["seconds"])
    return ordered[(len(ordered) - 1) // 2]


def best_trial(trials: list[dict]) -> dict:
    """The minimum-wall trial — the contention-resistant estimator on
    a shared host: the least-disturbed sample is the closest to what
    the engine does on quiet silicon (same rationale as bench.py's
    best-of-2). Median is reported alongside for transparency."""
    return min(trials, key=lambda r: r["seconds"])


def run_pair(n_small: int, args, zpath: str, images: str) -> dict:
    """Full interleaved-trials measurement of one (N, 4N) core pair."""
    n_big = n_small * 4
    total = os.cpu_count() or 32

    def leg_cap(cores: int) -> float:
        """Per-leg foreign-load tolerance: a small leg on a big box
        does not need the BOX quiet, it needs ``cores`` free cores —
        a local[4] leg on 32 cores runs at full speed under a foreign
        load of 20, while a local[32] leg is disturbed by any foreign
        load at all. Cap = idle cores beyond the leg's own, with a 2×
        headroom margin, floored at --dirty-load."""
        return max(args.dirty_load, total - 2.0 * cores)

    def clean_leg(cores: int, retries: int = 2) -> dict:
        """Run a leg when its own cap is satisfied; re-run if same-VM
        neighbors spiked past the cap mid-leg OR the hypervisor stole
        more than --steal-cap cores on average. The last attempt is
        kept either way, flagged by its recorded peak/steal."""
        cap = leg_cap(cores)
        for attempt in range(retries + 1):
            wait_for_quiet(cap, args.quiet_timeout)
            r = run_at(cores, zpath, images)
            if r["external_load_peak"] <= cap and r["steal_cores"] <= args.steal_cap:
                return r
            print(
                f"# leg local[{cores}] dirty (foreign peak {r['external_load_peak']} "
                f"vs cap {cap}, steal {r['steal_cores']} cores), retry {attempt + 1}",
                flush=True,
            )
        return r

    wait_for_quiet(args.quiet_load, args.quiet_timeout)
    hw = hardware_ceiling(n_small, n_big)
    mem = memory_ceiling(n_small, n_big)
    print(
        f"# hardware ceiling {n_small}->{n_big}: pure-CPU {hw['ceiling']}, "
        f"memory-bandwidth {mem['ceiling']}",
        flush=True,
    )
    smalls, bigs = [], []
    for _ in range(args.trials):  # interleaved N,4N,N,4N…: both legs see similar noise
        smalls.append(clean_leg(n_small))
        bigs.append(clean_leg(n_big))
    small, big = best_trial(smalls), best_trial(bigs)
    small_med, big_med = median_trial(smalls), median_trial(bigs)
    eff = (big["rows_per_sec"] / small["rows_per_sec"]) / 4
    eff_med = (big_med["rows_per_sec"] / small_med["rows_per_sec"]) / 4
    report = {
        "n_small": n_small,
        "n_big": n_big,
        "small": small,
        "big": big,
        "small_trials": [(r["seconds"], r["external_load_peak"], r["steal_cores"]) for r in smalls],
        "big_trials": [(r["seconds"], r["external_load_peak"], r["steal_cores"]) for r in bigs],
        "scaling_efficiency": round(eff, 3),
        "scaling_efficiency_median": round(eff_med, 3),
        "hardware_ceiling": hw,
        "memory_ceiling": mem,
        "efficiency_vs_ceiling": round(eff / hw["ceiling"], 3) if hw["ceiling"] else None,
        # the binding hardware constraint for DATA work is the weaker
        # of the two calibrations (the suite is part CPU, part DRAM)
        "efficiency_vs_binding_ceiling": round(
            eff / min(hw["ceiling"], mem["ceiling"]), 3
        )
        if min(hw["ceiling"], mem["ceiling"])
        else None,
        "target": 0.8,
        "pass": eff >= 0.8,
        "mix": args.mix,
        "images_n": args.images_n,
    }
    print(json.dumps(report, indent=2), flush=True)
    return report


def _pair_md(r: dict, images: str, trials: int) -> str:
    n_small, n_big = r["n_small"], r["n_big"]
    small, big, hw = r["small"], r["big"], r["hardware_ceiling"]
    mem = r.get("memory_ceiling")
    eff = r["scaling_efficiency"]
    mem_md = (
        f"""a STREAM-triad memory-bandwidth burn scales at **{mem['ceiling']}**
(the binding constraint for data work — parquet scan + Arrow decode
move bytes, not just ALU ops); engine efficiency vs the binding
(weaker) ceiling: **{r.get('efficiency_vs_binding_ceiling')}**."""
        if mem
        else ""
    )
    mix_tag = f" — {r['mix']} fmt mix" if r.get("mix", "default") != "default" else ""
    return f"""## local[{n_small}] vs local[{n_big}]{mix_tag}

| parallelism | seconds (best) | rows/sec | foreign load peak | steal cores |
|---|---|---|---|---|
| local[{n_small}] (N) | {small['seconds']} | {small['rows_per_sec']:,} | {small['external_load_peak']} | {small['steal_cores']} |
| local[{n_big}] (4N) | {big['seconds']} | {big['rows_per_sec']:,} | {big['external_load_peak']} | {big['steal_cores']} |

**Scaling efficiency = ({big['rows_per_sec']:,} / {small['rows_per_sec']:,}) / 4 =
{eff:.3f}** (target ≥ 0.8 → {"PASS" if eff >= 0.8 else "FAIL"});
median-trial estimate {r['scaling_efficiency_median']:.3f}.

**Hardware ceilings for this pair, measured in the same session**: a
pure-integer-CPU multiprocessing burn (no memory traffic, no Spark, no
steal) scales local[{n_small}]→local[{n_big}] at
**{hw['ceiling']}** on this VM ({hw['small_mops']} → {hw['big_mops']}
Mops/s) — the hypervisor does not deliver 4× the cycles past the
VM's contended core budget; {mem_md}
Engine efficiency relative to the pure-CPU ceiling: **{r['efficiency_vs_ceiling']}**.

All trials, interleaved N,4N,N,4N,… — each tuple is (seconds,
peak same-VM foreign load during the leg, avg hypervisor steal cores
during the leg from /proc/stat):
N = {r['small_trials']}; 4N = {r['big_trials']}.

Reproduce: `python scripts/run_scaling.py --pairs {n_small} --images-n {small['rows']} --trials {trials} --mix {r.get('mix', 'default')}`.
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", default="4,8", help="comma-separated N values; each pair is N vs 4N")
    ap.add_argument("--images-n", type=int, default=3000000)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--quiet-load", type=float, default=3.0, help="wait for 1-min load below this before each leg")
    ap.add_argument("--quiet-timeout", type=float, default=1800.0, help="max seconds to wait for a quiet window")
    ap.add_argument("--dirty-load", type=float, default=4.0, help="re-run a leg whose mid-run foreign load peak exceeds this")
    ap.add_argument("--steal-cap", type=float, default=1.0, help="re-run a leg whose average hypervisor steal exceeds this many cores")
    ap.add_argument("--mix", choices=("default", "jpeg"), default="default",
                    help="fmt mix for the input table: default (raw/png/qjpg, byte-heavy) or jpeg "
                         "(crawl-realistic jpeg/pjpeg/gif share — entropy decode is ALU-dense per "
                         "byte, so this leg is decoupled from the VM's DRAM-bandwidth ceiling)")
    ap.add_argument("--report", default="scaling_report.json", help="output JSON path (relative to repo root)")
    ap.add_argument("--no-bench", action="store_true", help="skip writing BENCH.md (compose it separately from several reports)")
    args = ap.parse_args()
    pair_ns = [int(x) for x in args.pairs.split(",") if x.strip()]

    zpath = build_zip()
    images = ensure_images(args.images_n, args.mix)

    reports = [run_pair(n, args, zpath, images) for n in pair_ns]
    with open(os.path.join(REPO, args.report), "w") as f:
        json.dump(reports, f, indent=2)
    if args.no_bench:
        print(f"wrote {args.report} ({[r['scaling_efficiency'] for r in reports]})")
        return

    sections = "\n".join(_pair_md(r, images, args.trials) for r in reports)
    md = f"""# BENCH — scaling-efficiency evidence (north_rule)

Same job (`scaling.py`: full image-suite validation — schema
predicates + decode/PSNR/caption Arrow kernel + uniqueness ×2 +
broadcast referential), same input ({reports[0]['small']['rows']:,} rows,
`{images}`), launched via `spark-submit --py-files sinter_spark.zip`
at two parallelism levels per pair (sandbox stand-in for N vs 4N
executors — no real cluster here, see BASELINE.md).

{sections}

Methodology notes, reported honestly:

1. **This host is a shared VM.** Neighbor tenants hold load averages of
   ~15–20 on this 32-core box in busy windows, and the hypervisor
   steals up to ~3 cores (measured from /proc/stat) even when the
   same-VM load is quiet. Each leg (a) starts only in a quiet window
   (load below threshold AND sampled steal < 0.5 cores), (b) records
   the peak foreign load and average steal DURING the leg, and (c) is
   re-run up to twice when either exceeded its cap. Trials are
   interleaved N,4N,N,4N so both legs see similar ambient noise.
2. **Estimator**: the BEST (min-wall) trial per leg, the standard
   contention-resistant choice — a neighbor burst can only slow a
   trial down, never speed it up, so the least-disturbed sample is the
   closest to the engine's true throughput. The median-based estimate
   is reported alongside; per-trial data is in the table above and in
   `scaling_report.json`.
3. Single-box N-vs-4N shares memory bandwidth and page cache — it can
   over- or under-state what a real 4×-executor spread would show. The
   dominant stage (decode kernel) is embarrassingly parallel CPU work,
   the closest local analogue to adding executors; every other stage is
   a column-pruned scan, a map-side-combined aggregate, or a broadcast
   join — shapes whose cluster scaling is architectural.
4. Each leg runs one untimed full warmup pass (python workers, JIT,
   page cache), then one timed pass.
5. The in-session hardware-ceiling calibration bounds what ANY engine
   can show on this VM for a given core pair; the 8→32 pair is
   reported with that ceiling next to it because the VM itself does
   not scale 4× from 8 to 32 vCPUs.
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)
    print(f"wrote BENCH.md ({[r['scaling_efficiency'] for r in reports]})")


if __name__ == "__main__":
    main()
