#!/usr/bin/env python
"""Round-3 tuning sweep: persist v5e table entries for

  1. the quick decode suite (m=16) — refresh NVFP4 winners,
  2. the Llama-70B 8-way TP shard shapes (VERDICT #6: every shape the
     70B TP config hits gets a tuned, oracle-swept entry),
  3. the W4A8 (int8-MXU) prefill shapes (VERDICT #2) under
     MatmulType.INT8.

Each shape is a local search around the heuristic (ops/autotune.py);
winners persist to tuned/<device-kind>.json and are then covered by
tests/test_tuned_sweep.py automatically. Reference analog: running
`bench_matmul --algo tune` over tools/benchmarks/matmul.py's suite and
recording the chosen solution ids.
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

from petit_kernel_tpu.ops import autotune
from petit_kernel_tpu.ops.solution import ElementB, MatmulType

QUICK_NK = [(10240, 8192), (8192, 8192), (8192, 28672)]
SHARD70B_NK = [(1280, 8192), (8192, 1024), (7168, 8192), (8192, 3584)]
# Llama-8B serve projections (what serve_bench / an 8B engine decode hits)
SERVE8B_NK = [(6144, 4096), (4096, 4096), (28672, 4096), (4096, 14336)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--budget", type=float, default=240.0,
                   help="per-shape tuning time budget (s)")
    p.add_argument("--candidates", type=int, default=12)
    p.add_argument("--skip", default="",
                   help="comma list of stages to skip: quick,shard,w4a8")
    args = p.parse_args()
    skip = set(args.skip.split(","))

    autotune.load_table()
    jobs = []
    if "quick" not in skip:
        jobs += [(m, n, k, ElementB.NVFP4, MatmulType.BF16)
                 for (n, k) in QUICK_NK for m in (16,)]
    if "shard" not in skip:
        jobs += [(m, n, k, ElementB.NVFP4, MatmulType.BF16)
                 for (n, k) in SHARD70B_NK for m in (16, 256, 512)]
    if "w4a8" not in skip:
        jobs += [(m, n, k, ElementB.NVFP4, MatmulType.INT8)
                 for (n, k) in QUICK_NK for m in (256, 512)]
    jobs = [j + (False,) for j in jobs]
    if "p2" not in skip:
        # nvfp4p2 (pow2-scale) kernel: the int-exponent scale apply shifts
        # the VPU/DMA balance, so it gets its OWN tuned entries (8-field
        # keys) over the decode-regime shapes: quick suite, the 8B serve
        # projections at bs=8, and the 70B TP shards
        jobs += [(m, n, k, ElementB.NVFP4, MatmulType.BF16, True)
                 for (n, k) in QUICK_NK for m in (16,)]
        jobs += [(m, n, k, ElementB.NVFP4, MatmulType.BF16, True)
                 for (n, k) in SERVE8B_NK for m in (8, 16)]
        jobs += [(m, n, k, ElementB.NVFP4, MatmulType.BF16, True)
                 for (n, k) in SHARD70B_NK for m in (16,)]

    t0 = time.time()
    for i, (m, n, k, eb, mt, p2) in enumerate(jobs):
        sid = autotune.tune_shape(
            m, n, k, eb, mt, verbose=True, pow2_scale=p2,
            max_candidates=args.candidates, time_budget_s=args.budget)
        path = autotune.save_table()   # persist incrementally
        print(f"# [{i + 1}/{len(jobs)}] m={m} n={n} k={k} "
              f"{eb.name}/{mt.name}: {sid}  "
              f"(elapsed {time.time() - t0:.0f}s, saved {path})",
              flush=True)
    print("# tune_r3 done", flush=True)


if __name__ == "__main__":
    main()
