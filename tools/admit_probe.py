#!/usr/bin/env python
"""Burst-admission cost: paged vs contiguous (VERDICT r4 #4 criterion —
paged admission within ~20% of contiguous by a direct measurement).

Times Engine.run() on a burst of --bs same-length prompts with a tiny
decode tail (--new-tokens), so the measurement is dominated by the
admission path: contiguous runs the full-batch fused chunk program,
paged the full-batch masked paged program (both batched since c508bd4 /
the r4 batched-burst work). Prompts reuse one token array so programs
key identically across reps; the first (compile) rep is discarded.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from petit_kernel_tpu.models import llama, serving
from petit_kernel_tpu.ops import autotune


def load_sb():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "sb", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "serve_bench.py"))
    sb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sb)
    return sb


def time_burst(make_engine, prompts, new_tokens, reps):
    eng = make_engine()          # ONE engine: programs warm after rep 0
    ts = []
    for r in range(reps + 1):
        reqs = [serving.Request(uid=r * 1000 + i, tokens=p,
                                max_new_tokens=new_tokens)
                for i, p in enumerate(prompts)]
        t0 = time.perf_counter()
        out = eng.run(reqs)
        # token readback is part of run(); out is host-side already
        assert all(len(v) == new_tokens for v in out.values())
        ts.append(time.perf_counter() - t0)
    return min(ts[1:])  # discard the compile rep


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=8)
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--seq", type=int, default=1024)
    p.add_argument("--prompt", type=int, default=500)
    p.add_argument("--new-tokens", type=int, default=8)
    p.add_argument("--format", default="nvfp4p2z")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    autotune.load_table()
    sb = load_sb()
    cfg = llama.LlamaConfig.llama3_8b(max_seq_len=args.seq,
                                      vocab_size=32768,
                                      num_layers=args.layers)
    rng = np.random.default_rng(0)
    params = sb.build_model(cfg, rng, fmt=args.format)
    prompts = [rng.integers(0, 32768, args.prompt).astype(np.int32)
               for _ in range(args.bs)]

    t_c = time_burst(
        lambda: serving.Engine(params, cfg, max_batch=args.bs,
                               fmt=args.format),
        prompts, args.new_tokens, args.reps)
    t_p = time_burst(
        lambda: serving.PagedEngine(params, cfg, max_batch=args.bs,
                                    fmt=args.format),
        prompts, args.new_tokens, args.reps)
    print(f"# burst bs={args.bs} prompt={args.prompt} "
          f"new={args.new_tokens} fmt={args.format}")
    print(f"# contiguous run(): {t_c * 1e3:8.1f} ms")
    print(f"# paged      run(): {t_p * 1e3:8.1f} ms  "
          f"(paged/contig = {t_p / t_c:.2f}x)")
    import json
    print(json.dumps({"contig_ms": round(t_c * 1e3, 1),
                      "paged_ms": round(t_p * 1e3, 1),
                      "ratio": round(t_p / t_c, 3)}))


if __name__ == "__main__":
    main()
