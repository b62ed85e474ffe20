#!/usr/bin/env python
"""W4A8 mid-m regime measurement (VERDICT r3 #8).

Round 3: W4A8 (int8 MXU) was ~0.9x dense at m=256 — the in-kernel
requant (decode + slab multiply + round + i8 convert) is paid once per
m-block, and below m~384 there are too few blocks to amortize it. The
round-4 weight-cache kernel variant (grid (nn, nm, nk), k-resident int8
VMEM cache) pays it once per WEIGHT block instead.

This tool measures, per m in --ms and per Llama-70B projection shape:
  dense   : XLA bf16 jnp.dot (the hipBLASLt analog)
  nvfp4   : the exact-NVFP4 bf16 kernel (tuned/heuristic resolution)
  w4a8    : plain W4A8 (per-m-block requant, heuristic bm)
  w4a8-wc : weight-cache W4A8 at bm = m/2 (>=2 m-blocks) and bm = m/4
Prints the best W4A8 variant vs dense (target: >= 1.0x at m=256).

Run on the real chip: python tools/w4a8_midm.py
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from petit_kernel_tpu.numerics import reference as rn
from petit_kernel_tpu.ops import autotune, layout as layout_mod
from petit_kernel_tpu.ops import solution as S
from petit_kernel_tpu.ops.kernels import fused
from petit_kernel_tpu.utils import benchlib


def fabricate(rng, k, n):
    kp = layout_mod.padded_k(k, layout_mod.K_PAD)
    words = rng.integers(0, 2 ** 32, size=(kp // 8, n),
                         dtype=np.uint64).astype(np.uint32)
    sraw = ((rng.integers(4, 11, size=(kp // 16, n), dtype=np.uint8) << 3)
            | rng.integers(0, 8, size=(kp // 16, n), dtype=np.uint8))
    import ml_dtypes
    from petit_kernel_tpu.numerics import formats
    scales = formats.e4m3_decode(sraw).astype(ml_dtypes.bfloat16)
    return jnp.asarray(words), jnp.asarray(scales)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ms", default="128,256,384,512")
    p.add_argument("--shapes", default="28672x4096,4096x14336",
                   help="NxK list (Llama-70B gate/up + down projections)")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--n1", type=int, default=8)
    args = p.parse_args()

    autotune.load_table()
    rng = np.random.default_rng(0)
    results = []
    for shp in args.shapes.split(","):
        n, k = map(int, shp.split("x"))
        words, scales = fabricate(rng, k, n)
        wdense = jnp.asarray(
            rng.standard_normal((k, n)).astype(np.float32) / 50,
            jnp.bfloat16)
        gs = jnp.float32(1.0 / 448.0)
        wbytes = words.size * 4 + scales.size * 2
        for m in map(int, args.ms.split(",")):
            a = jnp.asarray(
                rng.standard_normal((m, k)).astype(np.float32) / 8,
                jnp.bfloat16)

            def t_of(call, *xs, hint=wbytes):
                return benchlib.marginal_time(
                    call, *xs, n1=args.n1, reps=args.reps,
                    bytes_hint=hint)

            td = t_of(lambda a_, w_: jnp.dot(
                a_, w_, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16), a, wdense, hint=k * n * 2)

            sid16 = S.choose_default_solution(m, n, k, S.ElementB.NVFP4)
            t16 = t_of(lambda a_, w_, s_: fused.fused_mul(
                a_, w_, s_, gs, sid=sid16), a, words, scales)

            rows = {}
            sid8 = S.choose_default_solution(m, n, k, S.ElementB.NVFP4,
                                             S.MatmulType.INT8)
            import dataclasses
            sid8 = dataclasses.replace(sid8, mfma_type=S.MatmulType.INT8)
            rows[f"w4a8 bm{sid8.block_m}"] = (sid8, None)
            for div in (2, 4):
                bm = max(16, (m // div // 16) * 16)
                if bm >= m:
                    continue
                sw = dataclasses.replace(sid8, block_m=bm,
                                         weight_cache=True)
                if S.is_feasible(sw, m, n, k):
                    rows[f"w4a8-wc bm{bm}"] = (sw, None)
            # serving passes precomputed requant constants (engines add
            # them at init — serving._w4a8_precompute); measure both
            r_t, acol = jax.block_until_ready(
                fused.w4a8_requant_constants(scales))
            best8 = (None, np.inf)
            for name, (sid, _) in list(rows.items()):
                t8 = t_of(lambda a_, w_, s_, r_=r_t, ac=acol, sid=sid:
                          fused.fused_mul_w4a8(a_, w_, s_, gs, sid=sid,
                                               r_t=r_, acol=ac),
                          a, words, scales)
                rows[name] = (sid, t8)
                if t8 < best8[1]:
                    best8 = (name, t8)
            t8_live = t_of(lambda a_, w_, s_: fused.fused_mul_w4a8(
                a_, w_, s_, gs, sid=rows[f"w4a8 bm{sid8.block_m}"][0]),
                a, words, scales)
            rows["w4a8 live-requant"] = (None, t8_live)
            parts = "  ".join(f"{nm}={t * 1e6:7.1f}us"
                              for nm, (_, t) in rows.items())
            print(f"# m={m:4d} n={n} k={k}: dense={td * 1e6:7.1f}us "
                  f"nvfp4={t16 * 1e6:7.1f}us  {parts}  "
                  f"best-w4a8/dense={td / best8[1]:.2f}x "
                  f"({best8[0]})", flush=True)
            results.append({"m": m, "n": n, "k": k,
                            "dense_us": round(td * 1e6, 1),
                            "nvfp4_us": round(t16 * 1e6, 1),
                            "best_w4a8": best8[0],
                            "best_w4a8_us": round(best8[1] * 1e6, 1),
                            "x_dense": round(td / best8[1], 3)})
    import json
    m256 = [r["x_dense"] for r in results if r["m"] == 256]
    print(json.dumps({"metric": "w4a8_midm_x_dense_m256",
                      "value": round(float(np.exp(np.mean(np.log(m256)))),
                                     3) if m256 else None,
                      "unit": "x_dense_bf16",
                      "rows": results}))


if __name__ == "__main__":
    main()
