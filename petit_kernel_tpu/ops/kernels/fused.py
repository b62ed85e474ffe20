"""Fused FP4-dequant + GEMM Pallas TPU kernels.

TPU-native re-design of the reference hot kernel
(lib/gemm/rocm/quantization/fp4/gemm_fp4_fp16_grid.cuh:441-498 and
warp_schedule_fp16.cuh:154-189): instead of MFMA warp tiles fed by shm
bit-twiddles, a Pallas grid streams packed weight words HBM->VMEM (double
buffered by the Pallas pipeline), a SWAR decode turns each u32 of 8 E2M1
nibbles into bf16 pairs on the VPU, and 128x128 MXU dots consume the
dequantized slabs with an f32 accumulator.

Decode math (per 32-bit lane, two nibbles at bits [3:0] and [19:16]):
    mag  = x & 0x00070007
    nrm  = (mag << 6) + 0x3F003F00      # bf16 bits of 2^(e-1)*(1+m/2), e>=1
    y    = bitcast<bf16>(nrm)           # y in {0.5, 0.75} U [1, 6]
    t    = min(2y - 1, y)               # fixes the two e==0 codes: 0, 0.5
    sf   = bitcast<bf16>(((x<<12) & 0x80008000) | 0x3F803F80)   # +-1.0
    val  = t * sf
This is the TPU equivalent of the reference's branch-free Fp4ToFp16 mask
trick (quantization/dequant.cuh:113-125): all magnitudes decode with one
shared arithmetic path, the e==0 subnormal codes are folded in by the
min() identity (2y-1 < y iff y < 1), and products scale-x-value are exact
in bf16 (4-bit x 2-bit significands).

No "E5M3 x 2^7" scale re-bias is needed (dequant.cuh:20-22 works around GPU
denormal flushing): scales decode to f32 exactly in-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solution import SolutionId, ElementB

_PAIR_MASK = np.uint32(0x000F000F)
_MAG_MASK = np.uint32(0x00070007)
_SGN_MASK = np.uint32(0x80008000)
_NRM_BIAS = np.uint32(0x3F003F00)   # (126 << 7) in both bf16 halves
_ONE_BITS = np.uint32(0x3F803F80)   # +1.0 in both bf16 halves


def decode_quarter(words: jax.Array, j: int) -> jax.Array:
    """Decode quarter j of packed words (R, C) u32 -> (2R, C) bf16 values
    (unscaled). Row 2r = slot j (low half), row 2r+1 = slot j+4 (high half),
    i.e. consecutive k by the layout contract (ops/layout.py).

    Pure-integer SWAR construction of the bf16 bit patterns (exhaustively
    validated against the E2M1 table): on this VPU, bf16 elementwise float
    ops get widened and cost ~3x an int32 op, so the e==0 subnormal codes
    are folded in with an integer mask blend instead of float min() — the
    measured difference is 1.6x kernel throughput.

      magnitudes:  nrm  = (mag << 6) + 0x3F00 per half   (exact for mag>=2)
      e==0 codes:  sub  = m * 0x3F00 (0.0 / 0.5); select via a SWAR mask
                   built from (mag>=2) x 0xFFFF (no cross-half carry)
      sign:        OR'd into bit 15/31
    """
    if j:
        mag = (words >> np.uint32(4 * j)) & _MAG_MASK
        sgn = (words << np.uint32(12 - 4 * j)) & _SGN_MASK
    else:
        mag = words & _MAG_MASK
        sgn = (words << np.uint32(12)) & _SGN_MASK
    nrm = (mag << np.uint32(6)) + _NRM_BIAS
    ge2 = ((mag >> np.uint32(1)) | (mag >> np.uint32(2))) \
        & np.uint32(0x00010001)
    msk = ge2 * np.uint32(0xFFFF)
    sub = (mag & np.uint32(0x00010001)) * np.uint32(0x3F00)
    bits = (sub ^ ((nrm ^ sub) & msk)) | sgn
    return pltpu.bitcast(bits, jnp.bfloat16)


def decode_scales_e4m3(s_u8: jax.Array) -> jax.Array:
    """E4M3 bytes (G, C) -> f32 (exact). Positive-scale invariant is
    validated at process_nvfp4_scales time, so the sign bit is ignored."""
    s = s_u8.astype(jnp.int32)
    man = s & 7
    e = (s >> 3) & 0xF
    norm = pltpu.bitcast(((e + 120) << 23) | (man << 20), jnp.float32)
    sub = man.astype(jnp.float32) * np.float32(2.0 ** -9)
    return jnp.where(e == 0, sub, norm)


def decode_scales_e8m0(s_u8: jax.Array) -> jax.Array:
    """E8M0 bytes (G, C) -> f32: 2^(u8-127). Byte 0 (2^-127) decodes to 0.0
    (f32 subnormal, irrelevant after the bf16 product); 255 is rejected at
    process time."""
    return pltpu.bitcast(s_u8.astype(jnp.int32) << 23, jnp.float32)


def _chunk_scale_slab(sc: jax.Array, chunk: int, group: int) -> jax.Array:
    """(srows, C) step-quarter scales -> the (128, C) broadcast slab for one
    128-row chunk.

    Thanks to the pi-interleave in the weight layout (ops/layout.py), chunk
    rows cycle through their 8/gpc scale groups with period 8, so the
    broadcast is a pltpu.repeat tile copy — no sublane element-broadcast
    relayout, no one-hot expand matmul, no big f32->bf16 cast (those cost
    ~35% of kernel time in earlier designs)."""
    gpc = 128 // group              # scale groups per 128-row chunk
    slab = sc[chunk * gpc:(chunk + 1) * gpc]
    if gpc < 8:                     # MXFP4: pattern is [g0 g0 g1 g1 ...]
        slab = jnp.repeat(slab, 8 // gpc, axis=0)  # tiny array
    return pltpu.repeat(slab, 16, axis=0)          # (128, C)


def _apply_scales(deq: jax.Array, sc_f32: jax.Array, rows_per_group: int,
                  out_dtype=jnp.bfloat16) -> jax.Array:
    """Multiply pi-interleaved (R, C) decoded values by their scales
    ((R/group, C), R % 128 == 0). Used by the standalone dequant kernel;
    the fused kernel fuses this per chunk into its dot loop."""
    r, c = deq.shape
    sc = sc_f32.astype(out_dtype)
    group = rows_per_group
    parts = []
    for ch in range(r // 128):
        sb = _chunk_scale_slab(sc, ch, group)
        parts.append(deq[ch * 128:(ch + 1) * 128] * sb)
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _fused_kernel(a0, a1, a2, a3, w_ref, s_ref, gs_ref,
                  out_ref, acc_ref, *, nk: int, group: int, srows: int,
                  element_b: ElementB, high_precision: bool):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    decode_scales = (decode_scales_e4m3 if element_b == ElementB.NVFP4
                     else decode_scales_e8m0)
    a_refs = (a0, a1, a2, a3)
    for j in range(4):
        deq = decode_quarter(w_ref[:], j)
        # scales stay fully k-resident in VMEM (tiny: k/group rows); slice
        # this quarter+step's rows (8-aligned dynamic sublane slice).
        sc = decode_scales(s_ref[pl.ds((j * nk + kk) * srows, srows), :])
        dt = jnp.float32 if high_precision else jnp.bfloat16
        sc = sc.astype(dt)
        a = a_refs[j][:]
        if high_precision:
            # True-f32 MXU path: without precision=HIGHEST, TPU matmuls
            # (and the Pallas interpreter emulating them) round f32 inputs
            # to bf16. This is the analog of the reference's high-precision
            # mode (dequant.cuh:241-254), at the usual multi-pass cost.
            a = a.astype(jnp.float32)
            deq = deq.astype(jnp.float32)
        # one 128-deep MXU dot per chunk; the chunk's scale slab is a tile
        # copy by construction (pi-interleaved layout)
        for ch in range(deq.shape[0] // 128):
            b = (deq[ch * 128:(ch + 1) * 128]
                 * _chunk_scale_slab(sc, ch, group))
            a_ch = a[:, ch * 128:(ch + 1) * 128]
            if high_precision:
                acc_ref[:] += jnp.dot(a_ch, b,
                                      preferred_element_type=jnp.float32,
                                      precision=jax.lax.Precision.HIGHEST)
            else:
                acc_ref[:] += jnp.dot(a_ch, b,
                                      preferred_element_type=jnp.float32)

    @pl.when(kk == nk - 1)
    def _epilogue():
        out_ref[:] = (acc_ref[:] * gs_ref[0, 0]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sid", "interpret", "out_dtype"))
def fused_mul(a: jax.Array, words: jax.Array, scales_t: jax.Array,
              global_scale: jax.Array, *, sid: SolutionId,
              out_dtype=jnp.bfloat16, interpret: bool = False) -> jax.Array:
    """c[m, n] = (a[m, k] @ dequant(words, scales).[k, n]) * global_scale.

    a        : (m, k) bf16 (f32 when sid.high_precision)
    words    : (k/8, n) uint32 petit-tpu layout (ops/layout.py)
    scales_t : (k/group, n) uint8 raw E4M3 / E8M0 bytes
    global_scale : () or (1,) f32

    m and n are padded to block multiples here (zero weight words decode to
    0.0 so n-padding contributes nothing; padded m rows are sliced off);
    k % sid.block_k == 0 is required and guaranteed by the feasibility
    filter (solution.is_feasible).
    """
    # No Mosaic on CPU: fall back to the interpreter (the virtual-device
    # test/dryrun environment; real runs are on TPU).
    interpret = interpret or jax.default_backend() == "cpu"
    m, k = a.shape
    kw, n = words.shape
    group = sid.group_size
    kp = kw * 8           # repack-padded k (layout.K_PAD / K_PAD_MX)
    assert kp >= k and kp - k < (512 if group == 16 else 1024), (kp, k)
    assert scales_t.shape == (kp // group, n)
    bm, bn, bk = sid.block_m, sid.block_n, sid.block_k
    assert kp % bk == 0, (kp, bk)
    assert bk % 512 == 0, bk  # Mosaic: A quarter block last dim % 128

    m_pad = -(-m // bm) * bm
    n_pad = -(-n // bn) * bn
    if m_pad != m or kp != k:
        # k-padding is safe: the padded weight words are zero nibbles, so
        # they contribute exactly 0 regardless of A's padded values (which
        # are also zeros here).
        a = jnp.pad(a, ((0, m_pad - m), (0, kp - k)))
    # match the layout's pi-interleave of k within each 128-chunk (one XLA
    # transpose, usually fused into A's producer)
    a = a.reshape(m_pad, kp // 128, 8, 16).swapaxes(2, 3).reshape(m_pad, kp)
    if n_pad != n:
        words = jnp.pad(words, ((0, 0), (0, n_pad - n)))
        scales_t = jnp.pad(scales_t, ((0, 0), (0, n_pad - n)))

    nm, nn, nk = m_pad // bm, n_pad // bn, kp // bk
    kb4 = bk // 4         # per-step rows per quarter
    srows = kb4 // group  # scale rows per quarter per step
    sg = kp // group      # total scale rows (fully VMEM-resident per block)

    def a_map(j):
        return lambda i, nn_, kk_, j=j: (i, j * nk + kk_)

    a_specs = [pl.BlockSpec((bm, kb4), a_map(j), memory_space=pltpu.VMEM)
               for j in range(4)]
    w_spec = pl.BlockSpec((bk // 8, bn), lambda i, nn_, kk_: (kk_, nn_),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((sg, bn), lambda i, nn_, kk_: (0, nn_),
                          memory_space=pltpu.VMEM)
    gs_spec = pl.BlockSpec((1, 1), lambda i, nn_, kk_: (0, 0),
                           memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((bm, bn), lambda i, nn_, kk_: (i, nn_),
                            memory_space=pltpu.VMEM)

    gs = jnp.asarray(global_scale, jnp.float32).reshape(1, 1)
    if sid.high_precision:
        a = a.astype(jnp.float32)
    elif a.dtype != jnp.bfloat16:
        a = a.astype(jnp.bfloat16)

    kernel = functools.partial(
        _fused_kernel, nk=nk, group=group, srows=srows,
        element_b=sid.element_b, high_precision=sid.high_precision)

    flops = 2 * m_pad * n_pad * kp
    bytes_accessed = (words.size * 4 + scales_t.size + a.size * a.dtype.itemsize
                      + m_pad * n_pad * 2)
    out = pl.pallas_call(
        kernel,
        grid=(nm, nn, nk),
        in_specs=[*a_specs, w_spec, s_spec, gs_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(a, a, a, a, words, scales_t, gs)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# Standalone dequant kernel: full-matrix B -> bf16 (k, n) from the TPU
# layout. Test/reference path, analog of DequantPetitFp4 / DequantPetitMxFp4
# (quantization_utils.cu:306-727).
# ---------------------------------------------------------------------------

def _dequant_kernel(w_ref, s_ref, out_ref, *, group: int, srows: int,
                    nk: int, element_b: ElementB):
    kk = pl.program_id(0)
    decode_scales = (decode_scales_e4m3 if element_b == ElementB.NVFP4
                     else decode_scales_e8m0)
    for j in range(4):
        deq = decode_quarter(w_ref[:], j)
        sc = decode_scales(s_ref[pl.ds((j * nk + kk) * srows, srows), :])
        out_ref[j] = _apply_scales(deq, sc, group)


@functools.partial(jax.jit, static_argnames=("element_b", "block_k",
                                             "block_n", "interpret"))
def dequant_tpu_layout(words: jax.Array, scales_t: jax.Array, *,
                       element_b: ElementB = ElementB.NVFP4,
                       block_k: int = 2048, block_n: int = 256,
                       interpret: bool = False) -> jax.Array:
    """Dequantize petit-tpu packed weights -> bf16 (k, n), k incl. padding."""
    interpret = interpret or jax.default_backend() == "cpu"
    kw, n = words.shape
    k = kw * 8
    group = 16 if element_b == ElementB.NVFP4 else 32
    bk = min(block_k, k)
    bn = min(block_n, n)
    assert k % bk == 0 and n % bn == 0 and bk % 512 == 0, (k, bk, n, bn)
    nk, nn = k // bk, n // bn
    kb4, srows = bk // 4, bk // 4 // group

    out = pl.pallas_call(
        functools.partial(_dequant_kernel, group=group, srows=srows, nk=nk,
                          element_b=element_b),
        grid=(nk, nn),
        in_specs=[
            pl.BlockSpec((bk // 8, bn), lambda kk_, nn_: (kk_, nn_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k // group, bn), lambda kk_, nn_: (0, nn_),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, kb4, bn), lambda kk_, nn_: (0, kk_, nn_),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, k // 4, n), jnp.bfloat16),
        interpret=interpret,
    )(words, scales_t)
    # (4, k/4, n): quarter j holds k-range [j*k/4, (j+1)*k/4); un-permute
    # the pi-interleave within each 128-row chunk (natural[pi(i)] = row[i],
    # pi its own (16,8)/(8,16)-transpose inverse).
    out = out.reshape(4, k // 4 // 128, 16, 8, n).swapaxes(2, 3)
    return out.reshape(k, n)
