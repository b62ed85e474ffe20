#!/usr/bin/env python
"""Engine decode-block cost bisection (VERDICT r2 #3 follow-up).

serve_bench --engine measures ~37 ms/token-step while the fori_loop
model-step proxy measures ~13 ms — and the gap persists at
decode_block=128, so it is INSIDE the jitted block program, not host
scheduling. This probe times lax.scan decode blocks that add the
engine's ingredients one at a time:

  fwd      : llama.forward + argmax in a scan (tokens fed back)
  +sample  : sample_next with per-step key split (engine sampling)
  +mask    : + write_mask=active (engine KV-protection path)
  +window  : same but kv_window at the engine's (pos+steps) bucket
             instead of the proxy's fixed 128

All at the serve_bench model scale divided by --layers (cost scales
linearly in layers; 8L compiles ~4x faster on the 1-vCPU host).
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from petit_kernel_tpu.models import llama, serving


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--bs", type=int, default=8)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--format", default="nvfp4p2")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "sb", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "serve_bench.py"))
    sb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sb)

    cfg = llama.LlamaConfig.llama3_8b(max_seq_len=args.seq,
                                      vocab_size=32768,
                                      num_layers=args.layers)
    rng = np.random.default_rng(0)
    params = sb.build_model(cfg, rng, fmt=args.format)
    B, steps, fmt = args.bs, args.steps, args.format

    cache0 = llama.init_cache(cfg, B, jnp.bfloat16)
    toks0 = jnp.asarray(rng.integers(0, cfg.vocab_size, B), jnp.int32)
    pos0 = jnp.full((B,), 16, jnp.int32)
    active = jnp.ones((B,), bool)
    temps = jnp.zeros((B,), jnp.float32)
    key0 = jax.random.PRNGKey(0)

    def mk_block(sample, mask, window):
        @functools.partial(jax.jit, static_argnames=("steps",))
        def block(params, cache, toks, pos, key, steps):
            def body(carry, _):
                cache, toks, pos, key = carry
                kw = dict(kv_window=window)
                if mask:
                    kw["write_mask"] = active
                logits, cache = llama.forward(params, toks[:, None], cfg,
                                              cache, pos[:, None], fmt=fmt,
                                              **kw)
                if sample:
                    key, sub = jax.random.split(key)
                    nxt = serving.sample_next(logits[:, -1], sub, temps, 0)
                else:
                    nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                return (cache, nxt, pos + 1, key), nxt
            (cache, _, _, _), out = jax.lax.scan(
                body, (cache, toks, pos, key), None, length=steps)
            return out, cache
        return block

    w_eng = 128
    while w_eng < 16 + steps + 1:
        w_eng *= 2
    w_eng = min(w_eng, args.seq)

    variants = [
        ("fwd      ", mk_block(False, False, 128)),
        ("+sample  ", mk_block(True, False, 128)),
        ("+mask    ", mk_block(True, True, 128)),
        (f"+window{w_eng:4d}", mk_block(True, True, w_eng)),
    ]

    wbytes = sum(lp[k]["words"].size * 4 + lp[k]["scales"].size * 2
                 for lp in params["layers"]
                 for k in ("wqkv", "wo", "w_gateup", "w_down"))
    wbytes += params["embed"].size * 2
    print(f"# {args.layers}L bs={B} fmt={fmt} steps={steps} "
          f"weights/step={wbytes / 1e9:.2f} GB "
          f"roofline/step={wbytes / 760e9 * 1e3:.2f} ms", flush=True)

    for name, blk in variants:
        # fresh cache per variant (donation-free probe; cache is small)
        def run_once():
            cache = jax.tree.map(jnp.copy, cache0)
            t0 = time.perf_counter()
            out, cache = blk(params, cache, toks0, pos0, key0, steps=steps)
            np.asarray(out)
            return time.perf_counter() - t0
        run_once()          # compile
        run_once()          # discard first post-compile call
        ts = [run_once() for _ in range(args.reps)]
        t = min(ts)
        print(f"# {name}: block={t * 1e3:8.1f} ms  "
              f"per-step={t / steps * 1e3:6.2f} ms  "
              f"({wbytes / (t / steps) / 1e9:5.1f} GB/s weight stream)",
              flush=True)


if __name__ == "__main__":
    main()
