"""Real-chip smoke for the round-3 kernel paths vs interpret-mode oracles.

Interpret mode does NOT enforce Mosaic's lowering rules (block dims,
relayouts), so every new Pallas path must be driven once on the real chip
before its bench numbers mean anything. Each check compares the device
result against the SAME function in interpret mode (strongest oracle: any
mismatch is a lowering/layout bug, not a numerics question).

Run: python tools/tpu_smoke_r3.py            (on the axon TPU)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import petit_kernel_tpu as pk
from petit_kernel_tpu.numerics import reference as ref
from petit_kernel_tpu.ops.kernels import attention as att

print("device:", jax.devices()[0], flush=True)
FAILS = []


def check(name, got, want, rtol=2e-2, atol=2e-2):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = np.abs(got - want)
    tol = atol + rtol * np.abs(want)
    bad = err > tol
    if bad.any():
        i = np.unravel_index(np.argmax(err - tol), err.shape)
        print(f"FAIL {name}: {bad.sum()}/{bad.size} out of tol; "
              f"worst at {i}: got {got[i]:.4f} want {want[i]:.4f}",
              flush=True)
        FAILS.append(name)
    else:
        print(f"ok   {name}  (max abs err {err.max():.4g})", flush=True)


def gemm_inputs(m, n, k, fmt, seed=0):
    rng = np.random.default_rng(seed)
    qw = rng.integers(0, 256, size=(n, k // 2), dtype=np.uint8)
    if fmt == "mxfp4":
        scales = rng.integers(118, 132, size=(n, k // 32), dtype=np.uint8)
        b = pk.repack_mxfp4(qw, n, k)
        s = pk.process_mxfp4_scales(scales, n, k)
    else:
        hi = rng.integers(4, 11, size=(n, k // 16), dtype=np.uint8) << 3
        lo = (rng.integers(0, 8, size=(n, k // 16), dtype=np.uint8)
              if fmt != "nvfp4p2" else 0)
        scales = (hi | lo).astype(np.uint8)
        b = pk.repack_nvfp4(qw, n, k)
        s = pk.process_nvfp4_scales(scales, n, k)
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    return a, b, s, np.float32(1.25)


def smoke_gemm(mul, fmt, m, n, k):
    a, b, s, gs = gemm_inputs(m, n, k, fmt)
    dev = mul(a, b, s, gs, m, n, k, -1)
    dev = np.asarray(dev)  # value read forces completion over the relay
    want = mul(a, b, s, gs, m, n, k, -1, interpret=True)
    check(f"{mul.__name__} ({m},{n},{k})", dev, want)


# --- 1) nvfp4p2: pow2 E4M3 scales through the int-exponent-add fast path
for shape in [(16, 2048, 2048), (256, 2048, 2048), (16, 7168, 8192)]:
    smoke_gemm(pk.mul_nvfp4p2_a16, "nvfp4p2", *shape)

# --- 2) W4A8: int8-MXU path (both containers)
for shape in [(256, 2048, 2048), (512, 4096, 2048), (16, 2048, 2048)]:
    smoke_gemm(pk.mul_nvfp4_a8, "nvfp4", *shape)
smoke_gemm(pk.mul_mxfp4_a8, "mxfp4", 256, 2048, 2048)

# --- 3) per-slot KV windows in decode attention (ragged pos; clamped
# page index maps are a lowering-sensitive change)
rng = np.random.default_rng(1)
B, H, Hkv, d, ps = 8, 8, 4, 128, 128
S = 1024
pos = np.array([7, 900, 130, 0, 511, 255, 63, 1000], np.int32)
q = jnp.asarray(rng.standard_normal((B, H, d)), jnp.bfloat16)
ck = jnp.asarray(rng.standard_normal((B, S, Hkv, d)), jnp.bfloat16)
cv = jnp.asarray(rng.standard_normal((B, S, Hkv, d)), jnp.bfloat16)
nb = att.pow2_bucket(int(pos.max() + 1 + ps - 1) // ps)
dev = np.asarray(att.decode_attention_contiguous(
    q, ck, cv, jnp.asarray(pos), nb=nb, page_size=ps))
want = att.decode_attention_contiguous(
    q, ck, cv, jnp.asarray(pos), nb=nb, page_size=ps, interpret=True)
check("decode_attention ragged per-slot windows", dev, want)

# --- 4) flash prefill with cache offset (causal-diagonal skip)
T = 128
pos0 = np.array([0, 256, 128, 0, 512, 0, 64, 896], np.int32)
qp = jnp.asarray(rng.standard_normal((B, T, H, d)), jnp.bfloat16)
ns = att.pow2_bucket(-(-int(pos0.max() + T) // 128))
devp = np.asarray(att.flash_prefill_attention(
    qp, ck, cv, jnp.asarray(pos0), ns=ns))
wantp = att.flash_prefill_attention(
    qp, ck, cv, jnp.asarray(pos0), ns=ns, interpret=True)
check("flash_prefill cached-offset diag skip", devp, wantp)

print("\n" + ("SMOKE FAILED: " + ", ".join(FAILS) if FAILS
              else "ALL R3 SMOKES PASSED"), flush=True)
sys.exit(1 if FAILS else 0)
