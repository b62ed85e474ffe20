"""Accurate on-chip kernel timing: amortize dispatch overhead by looping
inside one jit (fori_loop with an iteration-dependent A so nothing hoists),
plus a pure HBM-stream kernel to establish the bandwidth ceiling."""
import argparse
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import petit_kernel_tpu as pk
from petit_kernel_tpu.numerics import formats
from petit_kernel_tpu.ops import layout
from petit_kernel_tpu.ops.kernels import fused
from petit_kernel_tpu.ops.solution import SolutionId


def timed(fn, *args, iters=20, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def loop_fused(sid, iters, m, n, k):
    @jax.jit
    def run(a, b, s):
        def body(i, acc):
            ai = a + (i * jnp.int32(0)).astype(a.dtype)  # defeat hoisting
            ai = ai.at[0, 0].add(jnp.bfloat16(1e-8) * i)
            c = fused.fused_mul(ai, b, s, jnp.float32(1.0), sid=sid)
            return acc + c[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    return run


def loop_dense(iters):
    @jax.jit
    def run(a, bd):
        def body(i, acc):
            ai = a.at[0, 0].add(jnp.bfloat16(1e-8) * i)
            c = jnp.dot(ai, bd, preferred_element_type=jnp.float32)
            return acc + c[0, 0]
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    return run


# pure stream: read all words, accumulate a cheap reduction
def _stream_kernel(w_ref, o_ref):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
    w = pltpu.bitcast(w_ref[:], jnp.int32)
    o_ref[:] += jnp.sum(w, axis=0, keepdims=True,
                        dtype=jnp.int32).astype(jnp.float32)[0:1, 0:128]


def stream_words(words, bk8=128, bn=2048):
    kw, n = words.shape
    grid = (kw // bk8, n // bn)
    return pl.pallas_call(
        _stream_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bk8, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(words)


def loop_stream(iters, bk8, bn):
    @jax.jit
    def run(words):
        def body(i, acc):
            wi = words.at[0, 0].add(i.astype(jnp.uint32))
            return acc + stream_words(wi, bk8, bn)[0, 0]
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    return run


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=16)
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--k", type=int, default=8192)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()
    m, n, k, iters = args.m, args.n, args.k, args.iters

    rng = np.random.default_rng(0)
    nib = rng.integers(0, 16, size=(n, k), dtype=np.uint8)
    nib[nib == 8] = 0
    qw = formats.pack_fp4_pairs(nib)
    scales = ((rng.integers(4, 11, size=(n, k // 16), dtype=np.uint8) << 3)
              | rng.integers(0, 8, size=(n, k // 16), dtype=np.uint8))
    words = jnp.asarray(layout.repack_fp4_weights(qw, n, k))
    st = jnp.asarray(layout.process_fp4_scales(scales, n, k, group_size=16))
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    wbytes = words.size * 4 + st.size

    print(f"problem m={m} n={n} k={k}; weight+scale bytes {wbytes/1e6:.1f} MB",
          flush=True)

    t = timed(loop_stream(iters, 128, 2048), words, iters=iters)
    print(f"pure stream       : {t*1e6:8.1f} us  {words.size*4/t/1e9:6.0f} GB/s",
          flush=True)

    bd = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
    t = timed(loop_dense(iters), a, bd, iters=iters)
    print(f"dense bf16        : {t*1e6:8.1f} us  {bd.size*2/t/1e9:6.0f} GB/s  "
          f"{2*m*n*k/t/1e12:5.2f} TF/s", flush=True)

    for blocks in [(16, 512, 512), (16, 1024, 512), (16, 2048, 512),
                   (16, 1024, 1024), (16, 2048, 1024), (16, 4096, 512),
                   (16, 2048, 2048)]:
        sid = SolutionId(*blocks)
        if k % sid.block_k or n % sid.block_n:
            continue
        try:
            t = timed(loop_fused(sid, iters, m, n, k), a, words, st,
                      iters=iters)
        except Exception as e:
            print(f"fused {blocks}: FAIL {type(e).__name__} {str(e)[:160]}",
                  flush=True)
            continue
        print(f"fused {str(blocks):18s}: {t*1e6:8.1f} us  "
              f"{wbytes/t/1e9:6.0f} GB/s  {2*m*n*k/t/1e12:5.2f} TF/s",
              flush=True)


if __name__ == "__main__":
    main()
