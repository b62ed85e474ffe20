#!/usr/bin/env python
"""FP8-KV decode-attention probe: flat-vs-headed layout, astype-vs-SWAR.

Measures the real paged_decode_attention at a long-context decode step in
four configurations so the fp8 story is quantified end to end:

  bf16/flat    : round-2 layout (P, ps, Hkv, d) — the contiguous engine's
                 identity-view path
  bf16/headed  : (P, Hkv, ps, d) — the paged engines' layout; should match
                 flat (same dots, leading-axis head slice)
  fp8/flat     : storage-dtype DMA + in-kernel astype upcast — measured 5x
                 slower than bf16 at 4K (docs/DESIGN.md: the Mosaic
                 lane-widening relayout dwarfs the halved DMA)
  fp8/headed   : the SWAR integer upcast (attention._upcast_f8_swar) — the
                 halved KV stream should WIN at long context

KV traffic at ctx: bf16 = 2*ctx*Hkv*d*2 bytes/seq, fp8 half that. The fp8
DMA floor is therefore ~half the bf16 floor (~182 us at the default shape,
tools/attn_probe.py), minus nothing for the SWAR (it rides the VPU budget
the bf16 path doesn't use).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from petit_kernel_tpu.ops.kernels import attention as att
from petit_kernel_tpu.utils import benchlib


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=8)
    p.add_argument("--hkv", type=int, default=8)
    p.add_argument("--g", type=int, default=4)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--ps", type=int, default=256)
    p.add_argument("--ctx", type=int, default=4096)
    p.add_argument("--n1", type=int, default=50)
    args = p.parse_args()

    B, Hkv, G, d, ps = args.bs, args.hkv, args.g, args.d, args.ps
    nb = args.ctx // ps
    pool = B * nb + 8
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((B, Hkv * G, d)), jnp.bfloat16)
    # flat (P, ps, Hkv, d) source; headed is its transpose, fp8 its cast —
    # all four variants attend the same values (up to fp8 quantization)
    k_np = (rng.standard_normal((pool, ps, Hkv, d)) * 0.1).astype(np.float32)
    v_np = (rng.standard_normal((pool, ps, Hkv, d)) * 0.1).astype(np.float32)
    bt = jnp.asarray(rng.permutation(pool)[:B * nb].reshape(B, nb)
                     .astype(np.int32))
    pos = jnp.full((B,), args.ctx - 1, jnp.int32)

    variants = []
    for name, dt in (("bf16", jnp.bfloat16), ("fp8", jnp.float8_e4m3fn)):
        kf = jnp.asarray(k_np, dt)
        vf = jnp.asarray(v_np, dt)
        variants.append((f"{name}/flat  ", kf, vf, False))
        variants.append((f"{name}/headed", kf.transpose(0, 2, 1, 3),
                         vf.transpose(0, 2, 1, 3), True))

    bf16_bytes = B * nb * ps * Hkv * d * 2 * 2
    print(f"# B={B} Hkv={Hkv} G={G} d={d} ps={ps} nb={nb} "
          f"bf16-traffic={bf16_bytes / 1e6:.1f} MB (fp8 half)", flush=True)

    out_ref = None
    for name, kp, vp, headed in variants:
        nbytes = bf16_bytes // (2 if "fp8" in name else 1)

        def call(q2, kp2, vp2):
            return att.paged_decode_attention(
                q2, kp2, vp2, bt, pos, nb=nb, page_size=ps, headed=headed)

        out = np.asarray(call(q, kp, vp), np.float32)
        if out_ref is None:
            out_ref = out
        err = float(np.abs(out - out_ref).max())
        t = benchlib.marginal_time(call, q, kp, vp, n1=args.n1,
                                   bytes_hint=nbytes)
        print(f"# {name}: {t * 1e6:8.1f} us  {nbytes / t / 1e9:6.1f} GB/s "
              f"(KV-dtype stream)  max|delta vs bf16/flat|={err:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
