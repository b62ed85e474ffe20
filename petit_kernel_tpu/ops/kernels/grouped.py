"""Grouped (per-expert) fused FP4 GEMM: one kernel for all experts.

North-star config 4 ("grouped/batched quantized matmul path for Mixtral
experts"): the capacity-bucketed MoE gives each expert a fixed (cap, k)
activation bucket; instead of launching one fused kernel per expert (E
pipeline spin-ups per MoE block), a single Pallas call runs a 4-D grid
with the expert as the outermost axis over stacked weight/scale/activation
arrays. The per-step body is exactly the v5 fused path. Reference analog:
the strided-batch host loop (tools/benchmarks/matmul/rocm/
matmul_petit.cc:116-132), re-designed as a grid axis instead of a loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fused


def _grouped_kernel(a0, a1, a2, a3, w_ref, s0, s1, s2, s3, gs_ref,
                    out_ref, acc_ref, *, nk: int, int_scale: bool = False,
                    zero_free: bool = False):
    kk = pl.program_id(3)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a_refs = (a0, a1, a2, a3)
    s_refs = (s0, s1, s2, s3)
    for j in range(4):
        a = a_refs[j][0]
        if int_scale:
            # MXFP4 / nvfp4p2(z): power-of-two scales via integer exponent
            # add (fused._int_scale_quarter[_nz]; same preconditions)
            y = fused._extract_quarter(w_ref[0], j)
            if zero_free:
                quarters = fused._int_scale_quarter_nz(y, s_refs[j][0])
            else:
                c = ((y ^ fused._ZXOR) + fused._CADD) & fused._CMASK
                quarters = fused._int_scale_quarter(y, c, s_refs[j][0])
            for ch, b in quarters:
                acc_ref[:] += jnp.dot(a[:, ch * 128:(ch + 1) * 128], b,
                                      preferred_element_type=jnp.float32)
            continue
        deq = fused.decode_quarter(w_ref[0], j)
        sc = s_refs[j][0]
        for ch in range(deq.shape[0] // 128):
            b = (deq[ch * 128:(ch + 1) * 128]
                 * fused._chunk_scale_slab(sc, ch))
            acc_ref[:] += jnp.dot(a[:, ch * 128:(ch + 1) * 128], b,
                                  preferred_element_type=jnp.float32)

    @pl.when(kk == nk - 1)
    def _epilogue():
        out_ref[0] = (acc_ref[:] * gs_ref[0, 0, 0]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "interpret", "out_dtype",
                                             "solution_id", "element_b",
                                             "pow2_scale", "zero_free"))
def grouped_mul(xs: jax.Array, words: jax.Array, scales_t: jax.Array,
                gs: jax.Array, *, block_m: int = 0, block_n: int = 0,
                block_k: int = 0, solution_id: int = -1,
                element_b=None, out_dtype=jnp.bfloat16,
                pow2_scale: bool = False, zero_free: bool = False,
                interpret: bool = False) -> jax.Array:
    """(E, cap, k) @ per-expert dequant((E, kp/8, n), (E, kp/16, n)) * gs[E]
    -> (E, cap, n), one fused kernel with the expert as a grid axis.

    xs rows must already be gathered per expert (capacity buckets); k is
    the logical contraction size (kp = words.shape[1] * 8 covers padding).

    Block shapes resolve through the solution machinery (tuned grouped
    table entry -> dense entry -> heuristic, ops/gemm.py
    resolve_grouped_solution), overridable with an explicit solution_id or
    raw block_m/n/k kwargs.
    """
    from ..solution import ElementB
    interpret = interpret or jax.default_backend() == "cpu"
    E, cap, k = xs.shape
    _, kw, n = words.shape
    kp = kw * 8
    assert words.shape[0] == E and scales_t.shape == (E, kp // 16, n)
    if element_b is None:
        element_b = (ElementB.NVFP4 if kp == k or kp - k < 512
                     else ElementB.MXFP4)
    if not (block_m and block_n and block_k):
        from .. import gemm as gemm_mod
        sid = gemm_mod.resolve_grouped_solution(cap, n, k, element_b,
                                                solution_id=solution_id)
        block_m, block_n, block_k = sid.block_m, sid.block_n, sid.block_k
    bm = min(block_m, max(16, -(-cap // 16) * 16))
    bn = min(block_n, n)
    bk = min(block_k, kp)
    assert kp % bk == 0 and bk % 512 == 0 and n % bn == 0

    cap_pad = -(-cap // bm) * bm
    a = xs
    if cap_pad != cap or kp != k:
        a = jnp.pad(a, ((0, 0), (0, cap_pad - cap), (0, kp - k)))
    a = (a.reshape(E, cap_pad, kp // 128, 8, 16).swapaxes(3, 4)
         .reshape(E, cap_pad, kp))
    if a.dtype != jnp.bfloat16:
        a = a.astype(jnp.bfloat16)

    nm, nn, nk = cap_pad // bm, n // bn, kp // bk
    kb4 = bk // 4
    srows = kb4 // 16

    def a_map(j):
        return lambda e, i, nn_, kk_, j=j: (e, i, j * nk + kk_)

    def s_map(j):
        return lambda e, i, nn_, kk_, j=j: (e, j * nk + kk_, nn_)

    gs2 = jnp.asarray(gs, jnp.float32).reshape(E, 1, 1)
    out = pl.pallas_call(
        functools.partial(
            _grouped_kernel, nk=nk,
            int_scale=(element_b == ElementB.MXFP4 or pow2_scale),
            zero_free=zero_free),
        grid=(E, nm, nn, nk),
        in_specs=[
            *[pl.BlockSpec((1, bm, kb4), a_map(j), memory_space=pltpu.VMEM)
              for j in range(4)],
            pl.BlockSpec((1, bk // 8, bn), lambda e, i, nn_, kk_: (e, kk_, nn_),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec((1, srows, bn), s_map(j), memory_space=pltpu.VMEM)
              for j in range(4)],
            pl.BlockSpec((1, 1, 1), lambda e, i, nn_, kk_: (e, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, bm, bn), lambda e, i, nn_, kk_: (e, i, nn_),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, cap_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(a, a, a, a, words, scales_t, scales_t, scales_t, scales_t, gs2)
    return out[:, :cap]
