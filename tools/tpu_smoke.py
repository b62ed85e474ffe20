"""Smoke test on the real TPU chip: correctness vs oracle per block shape.

NOTE: the timing printed here is naive dispatch timing and NOT trustworthy
over the axon relay (see utils/benchlib.py) — use bench.py or
tools/tpu_bench.py for honest numbers; this script is for correctness."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import petit_kernel_tpu as pk
from petit_kernel_tpu.numerics import formats, reference
from petit_kernel_tpu.ops import layout
from petit_kernel_tpu.ops.kernels import fused
from petit_kernel_tpu.ops.solution import SolutionId, ElementB

print("device:", jax.devices()[0], flush=True)

m, n, k = 16, 8192, 8192
rng = np.random.default_rng(0)
a = rng.standard_normal((m, k)).astype(np.float32)
nib = rng.integers(0, 16, size=(n, k), dtype=np.uint8)
nib[nib == 8] = 0
qw = formats.pack_fp4_pairs(nib)
scales = ((rng.integers(4, 11, size=(n, k // 16), dtype=np.uint8) << 3)
          | rng.integers(0, 8, size=(n, k // 16), dtype=np.uint8))
gs = np.float32(1.25)
words = jnp.asarray(layout.repack_fp4_weights(qw, n, k))
st = jnp.asarray(layout.process_fp4_scales(scales, n, k, group_size=16))
a_j = jnp.asarray(a, jnp.bfloat16)

for blocks in [(16, 512, 512), (16, 256, 512), (16, 512, 1024), (16, 1024, 512), (16, 2048, 512), (16, 1024, 1024)]:
    sid = SolutionId(*blocks)
    try:
        t0 = time.perf_counter()
        c = fused.fused_mul(a_j, words, st, jnp.float32(gs), sid=sid)
        c.block_until_ready()
        compile_s = time.perf_counter() - t0
    except Exception as e:
        print(f"blocks {blocks}: FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        continue
    # correctness vs oracle
    a_bf = np.asarray(a_j, np.float32)
    ref = reference.gemm_reference(a_bf, qw, scales, gs, fmt="nvfp4")
    got = np.asarray(c, np.float32)
    err = np.abs(got - ref)
    tol = np.maximum(1e-2, 0.01 * np.abs(ref))
    ok = np.all(err <= tol)
    # timing
    for _ in range(3):
        c = fused.fused_mul(a_j, words, st, jnp.float32(gs), sid=sid)
    c.block_until_ready()
    t0 = time.perf_counter()
    reps = 50
    for _ in range(reps):
        c = fused.fused_mul(a_j, words, st, jnp.float32(gs), sid=sid)
    c.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    tflops = 2 * m * n * k / dt / 1e12
    gbps = (words.size * 4 + st.size) / dt / 1e9
    print(f"blocks {blocks}: ok={ok} maxerr={err.max():.4f} "
          f"compile={compile_s:.1f}s t={dt*1e6:.1f}us {tflops:.2f}TFLOP/s "
          f"weights {gbps:.0f} GB/s", flush=True)

# dense bf16 baseline
bd = jnp.asarray(reference.dequant_nvfp4(qw, scales).T * gs, jnp.bfloat16)
dense = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32
                                     ).astype(jnp.bfloat16))
c = dense(a_j, bd); c.block_until_ready()
t0 = time.perf_counter()
for _ in range(50):
    c = dense(a_j, bd)
c.block_until_ready()
dt = (time.perf_counter() - t0) / 50
print(f"dense bf16 baseline: t={dt*1e6:.1f}us "
      f"{2*m*n*k/dt/1e12:.2f}TFLOP/s {(bd.size*2)/dt/1e9:.0f} GB/s", flush=True)
