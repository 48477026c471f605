"""Shared contention-aware measurement machinery for bench.py and
scripts/run_scaling.py.

This sandbox host is a SHARED VM (see BENCH.md methodology): neighbor
tenants hold 1-min load averages of 15-20 and the hypervisor steals up
to ~3 cores in busy windows, so a single trial measures the neighbors
as often as the engine — the official round-2 record understated the
engine 2.3× exactly this way. Every measurement here is therefore:

* gated on a quiet window (load + sampled steal below caps) before the
  first trial;
* ≥3 trials, each with its OWN hypervisor-steal reading from
  /proc/stat (field 8 — steal is invisible to the load average);
* re-run (bounded retries) when even the best trial was contended;
* reported as BEST wall (min — contention only ever slows a trial
  down) AND median, with per-trial (wall, steal) published for audit.
"""

from __future__ import annotations

import os
import time


def read_steal() -> float:
    """Cumulative hypervisor steal seconds from /proc/stat (field 8)."""
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8]) / os.sysconf("SC_CLK_TCK")
    except Exception:
        return 0.0


def wait_for_quiet(
    threshold: float = 3.0, timeout: float = 600.0, steal_cap: float = 0.3
) -> float:
    """Block until the 1-min load average drops below ``threshold`` AND
    a 5 s steal sample stays below ``steal_cap`` cores. Returns the
    load seen (the last observation if the timeout expires — callers
    proceed and the per-trial steal numbers flag the contamination)."""
    t0 = time.time()
    while time.time() - t0 < timeout:
        load = os.getloadavg()[0]
        if load <= threshold:
            s0 = read_steal()
            time.sleep(5)
            if (read_steal() - s0) / 5.0 <= steal_cap:
                return load
        time.sleep(10)
    return os.getloadavg()[0]


def timed_trial(fn):
    """Run ``fn`` once; returns (result, wall_sec, steal_cores) where
    steal_cores = average cores the hypervisor took away mid-trial."""
    s0 = read_steal()
    t0 = time.perf_counter()
    result = fn()
    wall = time.perf_counter() - t0
    steal = (read_steal() - s0) / max(wall, 1e-9)
    return result, wall, steal


def measure(
    fn,
    *,
    trials: int = 3,
    steal_cap: float = 0.1,
    max_extra: int = 3,
    quiet_load: float | None = None,
    quiet_timeout: float = 300.0,
) -> dict:
    """Contention-gated repeated measurement of ``fn``.

    Runs ``trials`` trials; while NO trial is clean (every trial's
    steal exceeds ``steal_cap`` cores), waits for a quiet window and
    runs up to ``max_extra`` more — the goal is at least one clean
    trial to report, matching the fastest-CLEAN-trial selection below.
    Returns::

        {"best": wall, "best_steal": ..., "median": wall,
         "median_steal": ..., "trials": [[wall, steal], ...],
         "result": <fn's return from the best trial>}

    Best is the contention-resistant headline (neighbors can only slow
    a trial down); median is published alongside for transparency.
    """
    runs: list[tuple[float, float, object]] = []  # (wall, steal, result)
    for _ in range(trials):
        result, wall, steal = timed_trial(fn)
        runs.append((wall, steal, result))
    extra = 0
    while min(r[1] for r in runs) > steal_cap and extra < max_extra:
        if quiet_load is not None:
            wait_for_quiet(quiet_load, quiet_timeout, steal_cap=max(steal_cap, 0.2))
        result, wall, steal = timed_trial(fn)
        runs.append((wall, steal, result))
        extra += 1
    by_wall = sorted(runs, key=lambda r: r[0])
    # the REPORTED best is the fastest CLEAN trial when one exists: a
    # min-wall trial that was itself stolen-from is a valid lower bound
    # but not an auditable record — the official number must carry
    # steal ≤ steal_cap (falls back to global min if no trial is clean)
    clean = [r for r in by_wall if r[1] <= steal_cap]
    best = clean[0] if clean else by_wall[0]
    med = by_wall[(len(by_wall) - 1) // 2]
    return {
        "best": round(best[0], 3),
        "best_steal": round(best[1], 2),
        "median": round(med[0], 3),
        "median_steal": round(med[1], 2),
        "trials": [[round(w, 3), round(s, 2)] for w, s, _ in runs],
        "result": best[2],
    }
