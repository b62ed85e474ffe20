#!/usr/bin/env python
"""Benchmark driver: fused NVFP4 dequant+GEMM vs XLA dense-BF16 baseline.

TPU analog of the reference's bench_matmul + matmul.py sweep
(tools/benchmarks/matmul/main.cc:269-325, tools/benchmarks/matmul.py:92-127):
the dense baseline (hipBLASLt there) is XLA's native bf16 jnp.dot here.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
where value = geomean TFLOP/s of the fused kernel over the decode suite and
vs_baseline = geomean(dense_bf16_time / fp4_time) (>1 means faster than
dense, the reference's headline is 1.2-2.2x at small batch).
"""

import argparse
import json
import math
import time

import numpy as np

import jax
import jax.numpy as jnp


def _time_fn(fn, *args, warmup=3, repeat=10):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeat):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeat


# Reference active bench suite: m in {16, 256, 512} x Llama-70B (n, k) pairs
# (tools/benchmarks/matmul.py:92-117). Subset by default to keep driver runs
# fast; --full sweeps everything.
SHAPES_NK = [
    (10240, 8192),
    (8192, 8192),
    (57344, 8192),
    (8192, 28672),
    (28672, 8192),
    (8192, 1024),
]
SHAPES_NK_QUICK = [(10240, 8192), (8192, 8192), (8192, 28672)]


def run(ms, shapes, repeat, tune):
    import petit_kernel_tpu as pk
    from petit_kernel_tpu.numerics import reference as ref
    from petit_kernel_tpu.ops import autotune

    results = []
    for (n, k) in shapes:
        rng = np.random.default_rng(n + k)
        # fabricate a quantized weight (bench parity: matmul_petit.cc:186-214)
        qw = rng.integers(0, 256, size=(n, k // 2), dtype=np.uint8)
        scales = ((rng.integers(4, 11, size=(n, k // 16), dtype=np.uint8) << 3)
                  | rng.integers(0, 8, size=(n, k // 16), dtype=np.uint8))
        gs = np.float32(1.0)
        b = pk.repack_nvfp4(qw, n, k)
        s = pk.process_nvfp4_scales(scales, n, k)
        b_dense = jnp.asarray(
            ref.dequant_nvfp4(qw, scales).T.astype(np.float32),
            jnp.bfloat16)  # (k, n) dense baseline operand
        for m in ms:
            a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)

            if tune:
                sid = autotune.tune_shape(m, n, k)
            else:
                sid = -1

            def fp4_fn(a, b, s):
                return pk.mul_nvfp4_a16(a, b, s, gs, m, n, k,
                                        sid if isinstance(sid, int) else sid.repr())

            dense = jax.jit(lambda a, bd: jnp.dot(
                a, bd, preferred_element_type=jnp.float32).astype(jnp.bfloat16))

            t_fp4 = _time_fn(jax.jit(fp4_fn), a, b, s, repeat=repeat)
            t_dense = _time_fn(dense, a, b_dense, repeat=repeat)
            tflops = 2 * m * n * k / t_fp4 / 1e12
            results.append(dict(m=m, n=n, k=k, t_fp4=t_fp4, t_dense=t_dense,
                                tflops=tflops, speedup=t_dense / t_fp4))
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--full", action="store_true", help="full shape sweep")
    p.add_argument("--tune", action="store_true", help="autotune each shape")
    p.add_argument("--repeat", type=int, default=10)
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args()

    shapes = SHAPES_NK if args.full else SHAPES_NK_QUICK
    ms = (16, 256, 512) if args.full else (16,)
    results = run(ms, shapes, args.repeat, args.tune)

    if args.verbose:
        for r in results:
            print(f"# m={r['m']:4d} n={r['n']:6d} k={r['k']:6d} "
                  f"fp4={r['t_fp4'] * 1e6:9.1f}us dense={r['t_dense'] * 1e6:9.1f}us "
                  f"{r['tflops']:7.2f} TFLOP/s speedup={r['speedup']:.3f}")

    decode = [r for r in results if r["m"] == 16] or results
    geo_tflops = math.exp(sum(math.log(r["tflops"]) for r in decode) / len(decode))
    geo_speedup = math.exp(sum(math.log(r["speedup"]) for r in decode) / len(decode))
    print(json.dumps({
        "metric": "nvfp4_gemm_decode_m16_geomean_tflops",
        "value": round(geo_tflops, 3),
        "unit": "TFLOP/s",
        "vs_baseline": round(geo_speedup, 3),
    }))


if __name__ == "__main__":
    main()
