#!/usr/bin/env python
"""Round-4 tuning: full-space walks on the decode projections that run
below the layer average (step_budget r4: wqkv (8,6144,4096) 59.5% of
SoL, wo (8,4096,4096) 58.2% vs gateup's 79.5%) plus the FP4 lm_head
shape (8,32768,4096) that --lm-head-fp4 serving hits. pow2 (nvfp4p2)
entries are the serving path; exact NVFP4 alongside.

Each full walk is bounded by --budget seconds (compile-per-candidate,
heuristic-first ordering)."""
import argparse
import sys
import time

sys.path.insert(0, ".")

from petit_kernel_tpu.ops import autotune
from petit_kernel_tpu.ops.solution import ElementB, MatmulType

WEAK_DECODE_NK = [(6144, 4096), (4096, 4096)]
HEAD_NK = [(32768, 4096)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--budget", type=float, default=420.0)
    p.add_argument("--ms", default="8,16")
    args = p.parse_args()

    autotune.load_table()
    ms = [int(x) for x in args.ms.split(",")]
    jobs = [(m, n, k, True) for (n, k) in WEAK_DECODE_NK for m in ms]
    jobs += [(m, n, k, True) for (n, k) in HEAD_NK for m in ms]
    jobs += [(m, n, k, False) for (n, k) in WEAK_DECODE_NK for m in (8,)]

    t0 = time.time()
    for i, (m, n, k, p2) in enumerate(jobs):
        sid = autotune.tune_shape(
            m, n, k, ElementB.NVFP4, MatmulType.BF16, verbose=True,
            pow2_scale=p2, full=True, time_budget_s=args.budget)
        path = autotune.save_table()
        print(f"# [{i + 1}/{len(jobs)}] m={m} n={n} k={k} pow2={p2}: "
              f"{sid}  (elapsed {time.time() - t0:.0f}s, saved {path})",
              flush=True)
    print("# tune_r4 done", flush=True)


if __name__ == "__main__":
    main()
