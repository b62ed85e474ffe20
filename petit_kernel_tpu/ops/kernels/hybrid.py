"""Hybrid FP4 + BF16 fused GEMM: salient columns stay dense.

Beyond-the-reference mode motivated by the measured roofline split: at
decode batch the pure-FP4 kernel is VPU-decode-bound (~350 GB/s effective,
MXU and DMA idle headroom) while the pure-dense GEMM is DMA-bound (~750
GB/s, VPU idle). Splitting the weight columns — a dense-BF16 slice riding
the DMA and an FP4 slice riding the VPU — inside ONE Pallas kernel lets
the per-step pipeline overlap the two resources, landing faster than
either pure kernel at a memory footprint between them (and with better
accuracy than pure FP4: the dense slice keeps the most salient columns
exactly).

Every grid step processes one n-block made of `bnf` FP4 columns and `bnd`
dense columns (the global column split is n_f : n_d = bnf : bnd). The FP4
half is the v5 fused path (q-coded decode + stride-16 scale slabs); the
dense half is four quarter-sliced MXU dots over a bf16 operand stored in
the same quarter-major pi-interleaved k-order as A, so both halves share
the A blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fused


def _hybrid_kernel(a0, a1, a2, a3, w_ref, s0, s1, s2, s3,
                   d0, d1, d2, d3, gs_ref,
                   outf_ref, outd_ref, accf_ref, accd_ref, *, nk: int):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        accf_ref[:] = jnp.zeros_like(accf_ref)
        accd_ref[:] = jnp.zeros_like(accd_ref)

    a_refs = (a0, a1, a2, a3)
    s_refs = (s0, s1, s2, s3)
    d_refs = (d0, d1, d2, d3)
    for j in range(4):
        a = a_refs[j][:]
        # dense half: straight MXU dot (operand pre-permuted to A's k-order)
        accd_ref[:] += jnp.dot(a, d_refs[j][:],
                               preferred_element_type=jnp.float32)
        # FP4 half: v5 decode + scale slab + per-chunk dots
        deq = fused.decode_quarter(w_ref[:], j)
        sc = s_refs[j][:]
        for ch in range(deq.shape[0] // 128):
            b = (deq[ch * 128:(ch + 1) * 128]
                 * fused._chunk_scale_slab(sc, ch))
            accf_ref[:] += jnp.dot(a[:, ch * 128:(ch + 1) * 128], b,
                                   preferred_element_type=jnp.float32)

    @pl.when(kk == nk - 1)
    def _epilogue():
        outf_ref[:] = (accf_ref[:] * gs_ref[0, 0]).astype(outf_ref.dtype)
        outd_ref[:] = accd_ref[:].astype(outd_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_nf",
                                             "block_nd", "block_k",
                                             "interpret", "out_dtype"))
def hybrid_mul(a: jax.Array, words: jax.Array, scales_t: jax.Array,
               global_scale: jax.Array, wd: jax.Array, *,
               block_m: int = 16, block_nf: int = 1536,
               block_nd: int = 512, block_k: int = 1024,
               out_dtype=jnp.bfloat16, interpret: bool = False):
    """(outf (m, nf), outd (m, nd)): the FP4 product x global_scale and the
    dense product, computed in one fused pipeline.

    a        : (m, k) bf16
    words    : (kp/8, nf) uint32 q-coded FP4 columns
    scales_t : (kp/16, nf) bf16 stride-16 scales
    wd       : (kp, nd) bf16 dense columns, rows in A's permuted k-order
               (quarter-major + pi-interleave; see layout.permute_k_for_a)
    Requires nf/block_nf == nd/block_nd (the split ratio is set offline).
    """
    interpret = interpret or jax.default_backend() == "cpu"
    m, k = a.shape
    kw, nf = words.shape
    kp = kw * 8
    kpd, nd = wd.shape
    assert kpd == kp and scales_t.shape == (kp // 16, nf)
    bm, bnf, bnd, bk = block_m, block_nf, block_nd, min(block_k, kp)
    bnf = min(bnf, nf)
    bnd = min(bnd, nd)
    assert nf % bnf == 0 and nd % bnd == 0 and nf // bnf == nd // bnd, (
        "column split ratio must match the block ratio", nf, bnf, nd, bnd)
    assert kp % bk == 0 and bk % 512 == 0

    m_pad = -(-m // bm) * bm
    if m_pad != m or kp != k:
        a = jnp.pad(a, ((0, m_pad - m), (0, kp - k)))
    a = a.reshape(m_pad, kp // 128, 8, 16).swapaxes(2, 3).reshape(m_pad, kp)
    if a.dtype != jnp.bfloat16:
        a = a.astype(jnp.bfloat16)

    nm, nn, nk = m_pad // bm, nf // bnf, kp // bk
    kb4 = bk // 4
    srows = kb4 // 16

    def a_map(j):
        return lambda i, nn_, kk_, j=j: (i, j * nk + kk_)

    def s_map(j):
        return lambda i, nn_, kk_, j=j: (j * nk + kk_, nn_)

    def d_map(j):
        return lambda i, nn_, kk_, j=j: (j * nk + kk_, nn_)

    gs = jnp.asarray(global_scale, jnp.float32).reshape(1, 1)
    outf, outd = pl.pallas_call(
        functools.partial(_hybrid_kernel, nk=nk),
        grid=(nm, nn, nk),
        in_specs=[
            *[pl.BlockSpec((bm, kb4), a_map(j), memory_space=pltpu.VMEM)
              for j in range(4)],
            pl.BlockSpec((bk // 8, bnf), lambda i, nn_, kk_: (kk_, nn_),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec((srows, bnf), s_map(j), memory_space=pltpu.VMEM)
              for j in range(4)],
            *[pl.BlockSpec((kb4, bnd), d_map(j), memory_space=pltpu.VMEM)
              for j in range(4)],
            pl.BlockSpec((1, 1), lambda i, nn_, kk_: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, bnf), lambda i, nn_, kk_: (i, nn_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bnd), lambda i, nn_, kk_: (i, nn_),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((m_pad, nf), out_dtype),
                   jax.ShapeDtypeStruct((m_pad, nd), out_dtype)],
        scratch_shapes=[pltpu.VMEM((bm, bnf), jnp.float32),
                        pltpu.VMEM((bm, bnd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(a, a, a, a, words, scales_t, scales_t, scales_t, scales_t,
      wd, wd, wd, wd, gs)
    return outf[:m], outd[:m]
