#!/usr/bin/env python
"""Decode-attention bottleneck bisection.

The fused decode kernel runs ~390 GB/s against a ~750 GB/s DMA ceiling
(tools/ragged_bench.py). This probe times stripped-down variants of the
same grid/BlockSpec structure to locate the cost:

  dma    : kernel body reduced to one vector read+accumulate per block —
           the pure pipelined-DMA floor for the same traffic
  dots   : per-head QK^T and PV dots, NO softmax (accumulate raw PV)
  full   : the real kernel (ops/kernels/attention.py)

All at B=8, Hkv=8, G=4, d=128, ps=128, ctx=4096 (bf16 KV). Interpreting
the gaps: full-dots = softmax/VPU cost; dots-dma = MXU small-dot cost;
dma vs roofline = pipelining/DMA-granularity cost.
"""
import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from petit_kernel_tpu.ops.kernels import attention as att
from petit_kernel_tpu.utils import benchlib


def _dma_kernel(bt_ref, pos_ref, q_ref, k_ref, v_ref, o_ref, acc_ref,
                *, nb):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # touch every sublane of both blocks once (forces the DMA, ~no compute)
    acc_ref[:] += (k_ref[0].astype(jnp.float32).sum(axis=0)
                   + v_ref[0].astype(jnp.float32).sum(axis=0))

    @pl.when(i == nb - 1)
    def _epi():
        o_ref[0] = acc_ref[:].astype(o_ref.dtype)


def _dots_kernel(bt_ref, pos_ref, q_ref, k_ref, v_ref, o_ref, acc_ref,
                 *, nb, hkv, gp):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    kb, vb = k_ref[0], v_ref[0]
    for h in range(hkv):
        rows = slice(h * gp, (h + 1) * gp)
        q = q_ref[0, h]
        logits = jax.lax.dot_general(
            q, kb[:, h, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[rows] += jnp.dot(logits.astype(jnp.bfloat16), vb[:, h, :],
                                 preferred_element_type=jnp.float32)

    @pl.when(i == nb - 1)
    def _epi():
        o_ref[0] = acc_ref[:].reshape(o_ref.shape[1:]).astype(o_ref.dtype)


def _full2_kernel(bt_ref, pos_ref, q_ref, k_ref, v_ref, o_ref,
                  lg_ref, acc_ref, m_ref, l_ref, *, nb, hkv, gp, sm_scale):
    """Head-batched softmax: per-head logit dots land in one (Hkv*Gp, ps)
    scratch; ALL softmax VPU work then runs as single wide ops; per-head
    PV dots consume the shared p."""
    b = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)

    kb, vb = k_ref[0], v_ref[0]
    for h in range(hkv):
        lg_ref[h * gp:(h + 1) * gp] = jax.lax.dot_general(
            q_ref[0, h], kb[:, h, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    logits = lg_ref[:] * sm_scale
    kv_pos = i * ps_const(logits) + jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, 1)
    logits = jnp.where(kv_pos <= pos_ref[b], logits, -1e30)
    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(logits, -1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, -1, keepdims=True)
    m_ref[:] = m_new
    pb = p.astype(jnp.bfloat16)
    for h in range(hkv):
        rows = slice(h * gp, (h + 1) * gp)
        acc_ref[rows] = acc_ref[rows] * alpha[rows] + jnp.dot(
            pb[rows], vb[:, h, :], preferred_element_type=jnp.float32)

    @pl.when(i == nb - 1)
    def _epi():
        o_ref[0] = (acc_ref[:] / l_ref[:]).reshape(o_ref.shape[1:]).astype(
            o_ref.dtype)


def ps_const(logits):
    return logits.shape[-1]


def build(variant, B, Hkv, Gp, d, ps, nb, pool):
    if variant == "dma":
        kernel = functools.partial(_dma_kernel, nb=nb)
        out_shape = jax.ShapeDtypeStruct((B, Hkv, d), jnp.float32)
        out_spec = pl.BlockSpec((1, Hkv, d), lambda b, i, bt, pos: (b, 0, 0))
        scratch = [pltpu.VMEM((Hkv, d), jnp.float32)]
    elif variant == "full2":
        kernel = functools.partial(_full2_kernel, nb=nb, hkv=Hkv, gp=Gp,
                                   sm_scale=1.0 / np.sqrt(d))
        out_shape = jax.ShapeDtypeStruct((B, Hkv, Gp, d), jnp.bfloat16)
        out_spec = pl.BlockSpec((1, Hkv, Gp, d),
                                lambda b, i, bt, pos: (b, 0, 0, 0))
        scratch = [pltpu.VMEM((Hkv * Gp, ps), jnp.float32),
                   pltpu.VMEM((Hkv * Gp, d), jnp.float32),
                   pltpu.VMEM((Hkv * Gp, 1), jnp.float32),
                   pltpu.VMEM((Hkv * Gp, 1), jnp.float32)]
    else:
        kernel = functools.partial(_dots_kernel, nb=nb, hkv=Hkv, gp=Gp)
        out_shape = jax.ShapeDtypeStruct((B, Hkv, Gp, d), jnp.bfloat16)
        out_spec = pl.BlockSpec((1, Hkv, Gp, d),
                                lambda b, i, bt, pos: (b, 0, 0, 0))
        scratch = [pltpu.VMEM((Hkv * Gp, d), jnp.float32)]

    @jax.jit
    def call(q, kp, vp, bt, pos):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(B, nb),
                in_specs=[
                    pl.BlockSpec((1, Hkv, Gp, d),
                                 lambda b, i, bt, pos: (b, 0, 0, 0)),
                    pl.BlockSpec((1, ps, Hkv, d),
                                 lambda b, i, bt, pos: (bt[b, i], 0, 0, 0)),
                    pl.BlockSpec((1, ps, Hkv, d),
                                 lambda b, i, bt, pos: (bt[b, i], 0, 0, 0)),
                ],
                out_specs=out_spec,
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(bt, pos, q, kp, vp)

    return call


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=8)
    p.add_argument("--hkv", type=int, default=8)
    p.add_argument("--g", type=int, default=4)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--ps", type=int, default=128)
    p.add_argument("--ctx", type=int, default=4096)
    p.add_argument("--n1", type=int, default=50)
    args = p.parse_args()

    B, Hkv, G, d, ps = args.bs, args.hkv, args.g, args.d, args.ps
    Gp = -(-G // 8) * 8
    nb = args.ctx // ps
    pool = B * nb + 8
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((B, Hkv, Gp, d)), jnp.bfloat16)
    kp = jnp.asarray(rng.standard_normal((pool, ps, Hkv, d)) * 0.1,
                     jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((pool, ps, Hkv, d)) * 0.1,
                     jnp.bfloat16)
    bt = jnp.asarray(rng.permutation(pool)[:B * nb].reshape(B, nb)
                     .astype(np.int32))
    pos = jnp.full((B,), args.ctx - 1, jnp.int32)

    kv_bytes = B * nb * ps * Hkv * d * 2 * 2
    print(f"# B={B} Hkv={Hkv} Gp={Gp} d={d} ps={ps} nb={nb} "
          f"traffic={kv_bytes / 1e6:.1f} MB", flush=True)

    for name in ("dma", "dots", "full2"):
        call = build(name, B, Hkv, Gp, d, ps, nb, pool)
        t = benchlib.marginal_time(call, q, kp, vp, bt, pos, n1=args.n1,
                                   bytes_hint=kv_bytes)
        print(f"# {name:5s}: {t * 1e6:8.1f} us  "
              f"{kv_bytes / t / 1e9:6.1f} GB/s", flush=True)

    qf = q.reshape(B, Hkv * Gp, d)[:, :Hkv * G, :].reshape(B, Hkv * G, d)

    def full(q2, kp2, vp2):
        return att.paged_decode_attention(q2, kp2, vp2, bt, pos,
                                          nb=nb, page_size=ps)
    t = benchlib.marginal_time(full, qf, kp, vp, n1=args.n1,
                               bytes_hint=kv_bytes)
    print(f"# full :  {t * 1e6:8.1f} us  {kv_bytes / t / 1e9:6.1f} GB/s",
          flush=True)


if __name__ == "__main__":
    main()
