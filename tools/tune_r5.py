#!/usr/bin/env python
"""Round-5 tuning: zero-free (nvfp4p2z) entries for the decode shapes that
run below the layer average with the flag-free kernel (step_budget r5:
wqkv (8,6144,4096) 74.8% of SoL, wo (8,4096,4096) 77.1% vs gateup's
94.9%), plus the big projections and the FP4 lm_head shape so the p2z
serving path gets its own optima instead of riding the pow2 entries.

Each full walk is bounded by --budget seconds (compile-per-candidate,
heuristic-first ordering)."""
import argparse
import sys
import time

sys.path.insert(0, ".")

from petit_kernel_tpu.ops import autotune
from petit_kernel_tpu.ops.solution import ElementB, MatmulType

DECODE_NK = [(6144, 4096), (4096, 4096), (28672, 4096), (4096, 14336)]
HEAD_NK = [(32768, 4096)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--budget", type=float, default=360.0)
    p.add_argument("--ms", default="8,16")
    args = p.parse_args()

    autotune.load_table()
    ms = [int(x) for x in args.ms.split(",")]
    jobs = [(m, n, k) for (n, k) in DECODE_NK + HEAD_NK for m in ms]

    t0 = time.time()
    for i, (m, n, k) in enumerate(jobs):
        sid = autotune.tune_shape(
            m, n, k, ElementB.NVFP4, MatmulType.BF16, verbose=True,
            pow2_scale=True, zero_free=True, full=True,
            time_budget_s=args.budget)
        path = autotune.save_table()
        print(f"# [{i + 1}/{len(jobs)}] m={m} n={n} k={k} zero_free: "
              f"{sid}  (elapsed {time.time() - t0:.0f}s, saved {path})",
              flush=True)
    print("# tune_r5 done", flush=True)


if __name__ == "__main__":
    main()
