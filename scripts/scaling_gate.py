#!/usr/bin/env python
"""Ceiling-gated scaling sweep (VERDICT r4 "Next round" item 1).

The north rule wants >=0.8 throughput scaling efficiency between N and
4N cores.  This sandbox VM has noisy-neighbor phases where NO workload
— not even pure-numpy multiprocessing with zero shuffle and zero
Spark — scales past ~0.6 from 2 to 8 cores (BENCH.md "Round-4 scaling
re-measurement").  Sweeping during such a phase measures the
neighbor, not the engine, so this script automates the clean-window
protocol the last two rounds ran by hand:

1. measure the MACHINE CEILING: fixed pure-numpy work split over 2
   then 8 processes (alternating, min-of-R) — an upper bound on any
   engine's efficiency right now;
2. only if the ceiling reads >= --ceiling-min (default 0.9) run the
   real sweep: ``bench.run_scaling(n=2)`` — the flagship cascade in
   fresh subprocesses at local[2] vs local[8], alternating, min-of-R,
   with a bit-identical-output gate;
3. append the result (with the same-hour ceiling stamped) to BENCH.md.

Exit codes: 0 = sweep recorded, 3 = ceiling too low (retry later),
4 = sweep ran but efficiency < target (also recorded).  Run with
--loop to retry on a schedule until a clean pair lands.
"""

from __future__ import annotations

import argparse
import datetime
import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# ceiling work unit: FP-heavy ops on a 20 MB array — big enough to
# live in RAM not L2 (the regime Spark tasks run in), small enough
# that one task takes ~1.5 s
_ARR_N = 2_500_000
_TASKS = 16  # divisible by both 2 and 8 -> equal per-core shares


def _ceiling_task(seed: int) -> float:
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.standard_normal(_ARR_N)
    s = 0.0
    for _ in range(60):
        a = np.sqrt(np.abs(a * 1.0001 + 0.1)) * np.sign(a)
        s += float(a.sum())
    return s


def measure_ceiling(rounds: int = 2, pair: tuple[int, int] = (2, 8),
                    pin: bool = False) -> dict:
    """Fixed work over N vs 4N processes, alternating, min-of-rounds.

    With ``pin`` the probe process (and, by fork inheritance, its
    workers) is bound to exactly ``cores`` CPUs — the same contract the
    pinned engine sweep runs under, so the ceiling stays an apples-to-
    apples upper bound."""
    lo, hi = pair
    full_mask = os.sched_getaffinity(0)
    walls: dict[int, list[float]] = {lo: [], hi: []}
    for _ in range(rounds):
        for cores in pair:
            if pin:
                os.sched_setaffinity(0, set(range(cores)))
            try:
                # fork, not spawn: workers inherit the loaded numpy, so
                # pool startup is ~ms and the wall measures the WORK — a
                # spawn pool pays 8x python+numpy import at 8 cores and
                # fakes a low ceiling
                with mp.get_context("fork").Pool(cores) as pool:
                    pool.map(_ceiling_task, range(cores))  # warm/page-in
                    t0 = time.monotonic()
                    pool.map(_ceiling_task, range(_TASKS))
                    walls[cores].append(time.monotonic() - t0)
            finally:
                if pin:
                    os.sched_setaffinity(0, full_mask)
    t_lo, t_hi = min(walls[lo]), min(walls[hi])
    return {
        "pair": [lo, hi],
        "wall_lo": round(t_lo, 2),
        "wall_hi": round(t_hi, 2),
        "ceiling": round((t_lo / t_hi) / 4.0, 3),
        "walls": {k: [round(w, 2) for w in v] for k, v in walls.items()},
    }


def append_bench_md(ceil: dict, sweep: dict, passed: bool) -> None:
    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
    lo, hi = (f"local[{c}]" for c in sweep["n_cores"])
    lines = [
        "",
        f"## Scaling run ({stamp}) — ceiling-gated sweep "
        f"(scripts/scaling_gate.py), N={sweep['n_cores'][0]} vs "
        f"4N={sweep['n_cores'][1]}",
        "",
        f"- same-hour machine ceiling (pure numpy, "
        f"{ceil['pair'][0]}->{ceil['pair'][1]} procs): "
        f"**{ceil['ceiling']}** "
        f"({ceil['wall_lo']}s -> {ceil['wall_hi']}s) — gate >= 0.9 passed",
        f"- flagship cascade, identical input; outputs bit-identical: "
        f"{sweep['outputs_identical']} "
        f"(checksum {sweep[lo]['checksum']})",
        f"- {lo}: {sweep[lo]['wall_s']}s min of {sweep[lo]['walls']} "
        f"({sweep['points_per_sec_N']:.0f} rolled-up points/s)",
        f"- {hi}: {sweep[hi]['wall_s']}s min of {sweep[hi]['walls']} "
        f"({sweep['points_per_sec_4N']:.0f} rolled-up points/s, "
        f"{sweep['tokens_per_sec_4N']:.0f} raw token-values/s)",
        f"- speedup {sweep['speedup']:.2f}x over 4x cores -> "
        f"**scaling efficiency {sweep['scaling_efficiency']:.3f}** "
        f"(median-based {sweep['scaling_efficiency_median']:.3f}; "
        f"north-rule target >= 0.8: "
        f"{'MET' if passed else 'not met this window'})",
        f"- noisy flag: {sweep['noisy']}; CPU-pinned (taskset, "
        f"local[N] = exactly N cores): {sweep.get('pinned', False)}",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")


def attempt(ceiling_min: float, eff_min: float, pin: bool = False) -> int:
    # Probe 2->8 first (the historically-reported pair); under external
    # CPU steal a 1->4 sweep needs only 4 free cores, so its ceiling
    # can pass when 2->8 cannot — both are valid N-vs-4N pairs for the
    # north rule, so fall back to 1->4 when only it clears the gate.
    ceil = measure_ceiling(pair=(2, 8), pin=pin)
    print(f"CEILING {json.dumps(ceil)}", flush=True)
    if ceil["ceiling"] < ceiling_min:
        ceil = measure_ceiling(pair=(1, 4), pin=pin)
        print(f"CEILING {json.dumps(ceil)}", flush=True)
    if ceil["ceiling"] < ceiling_min:
        print(f"GATE: ceiling {ceil['ceiling']} < {ceiling_min} — "
              f"machine is contended, not sweeping", flush=True)
        return 3
    if pin:
        os.environ["SPARK_GRAFT_PIN_CPUS"] = "1"
    from bench import run_scaling

    sweep = run_scaling(n=ceil["pair"][0])
    eff = sweep["scaling_efficiency"]
    passed = eff >= eff_min and sweep["outputs_identical"]
    print(f"SWEEP eff={eff:.3f} median="
          f"{sweep['scaling_efficiency_median']:.3f} "
          f"identical={sweep['outputs_identical']} noisy={sweep['noisy']}",
          flush=True)
    append_bench_md(ceil, sweep, passed)
    return 0 if passed else 4


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ceiling-min", type=float, default=0.9)
    ap.add_argument("--eff-min", type=float, default=0.8)
    ap.add_argument("--loop", action="store_true",
                    help="retry until a sweep passes (or --max-attempts)")
    ap.add_argument("--max-attempts", type=int, default=12)
    ap.add_argument("--retry-wait-s", type=int, default=1200)
    ap.add_argument("--pin", action="store_true",
                    help="CPU-pin both the ceiling probe and the sweep "
                         "so local[N] means exactly N cores")
    args = ap.parse_args()
    attempts = 0
    while True:
        attempts += 1
        rc = attempt(args.ceiling_min, args.eff_min, pin=args.pin)
        if rc == 0 or not args.loop or attempts >= args.max_attempts:
            sys.exit(rc)
        wait = args.retry_wait_s if rc == 3 else args.retry_wait_s * 2
        print(f"retrying in {wait}s (attempt {attempts})", flush=True)
        time.sleep(wait)


if __name__ == "__main__":
    main()
