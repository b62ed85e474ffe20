"""Fused FP4-dequant + GEMM Pallas TPU kernels.

TPU-native re-design of the reference hot kernel
(lib/gemm/rocm/quantization/fp4/gemm_fp4_fp16_grid.cuh:441-498 and
warp_schedule_fp16.cuh:154-189): instead of MFMA warp tiles fed by shm
bit-twiddles, a Pallas grid streams packed weight words HBM->VMEM (double
buffered by the Pallas pipeline), a SWAR decode turns each u32 of 8 E2M1
nibbles into bf16 pairs on the VPU, and 128x128 MXU dots consume the
dequantized slabs with an f32 accumulator.

Decode math (v6 single-shift layout; see ops/layout.py for the offline bit
prepositioning). Per quarter j, ONE shift+mask extracts sign AND magnitude
together, then a carry-flagged bias add finishes the bf16:

    y    = (w << {0,3,6}) & 0x81C081C0       # j<3; j=3 is a 3-extract
    z    = y ^ 0x00400040
    c    = (z + 0x01C001C0) & 0x02000200     # bit 9: nonzero flag (t != 1)
    bits = y + (c >> 9) * 0x3F00             # bias add can't carry into sign

Why this works: E2M1's seven nonzero magnitudes are consecutive points of
bf16's exponent/mantissa ramp, 0x3F00 + t*0x40 for t in {0,2..7} — one add
covers them all. The stored zero (t=1, squatting the 0.75 hole in the
ramp) gets NO bias and decodes to the bf16 subnormal 0x0040 = 2^-127:
the VPU flushes subnormal multiply inputs (measured — the analog of the
reference's gfx90a MFMA denormal flush, README.md:33), so the kernel's
scale multiply turns it into an exact 0.0 on hardware. The hazard that
broke the bias-free q<<6 embedding is load-bearing here. In interpret
mode (CPU tests) nothing flushes and zeros decode to ~1e-39 dust —
irrelevant at GEMM test tolerances; bit-exact paths use
decode_quarter_exact. This is the TPU analog of the reference's
branch-free Fp4ToFp16 bit trick plus PetitFormat prepositioning
(quantization/dequant.cuh:113-125, quantization_utils.cu:183-206).
Products value x scale are exact in bf16 (2-bit x 3-bit significands).

Scales arrive as bf16 decoded offline (process_*_scales): no in-kernel
scale decode at all. No "E5M3 x 2^7" re-bias is needed either
(dequant.cuh:20-22 works around GPU denormal flushing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solution import SolutionId, ElementB

_YMASK = np.uint32(0x81C081C0)      # sign | t<<6 per half (post-shift)
_ZXOR = np.uint32(0x00400040)
_CADD = np.uint32(0x01C001C0)
_CMASK = np.uint32(0x02000200)      # carry bit 9: nonzero (t != 1) flag
_NRM_BIAS = np.uint32(0x3F00)       # (126 << 7), multiplied onto the flag


def _extract_quarter(words: jax.Array, j: int) -> jax.Array:
    """v6 single-shift extraction: (R, C) u32 -> sign|t<<6 per half."""
    if j == 0:
        return words & _YMASK
    if j < 3:
        return (words << np.uint32(3 * j)) & _YMASK
    # three-extract quarter (see layout doc: only three disjoint single
    # shifts exist for the {p,p+1,p+2,p+9} payload pattern in 16 bits)
    return (((words >> np.uint32(4)) & np.uint32(0x00C000C0))
            | ((words >> np.uint32(5)) & np.uint32(0x01000100))
            | ((words << np.uint32(1)) & np.uint32(0x80008000)))


def decode_quarter(words: jax.Array, j: int) -> jax.Array:
    """Decode quarter j of v6 packed words (R, C) u32 -> (2R, C) bf16
    values (unscaled). Row 2r = slot j (low half), row 2r+1 = slot j+4 (high
    half), i.e. consecutive k by the layout contract (ops/layout.py).

    Pure-integer SWAR, 7-8 vector ops (exhaustively validated against the
    E2M1 table; module doc has the algebra). STORED ZEROS decode to the
    bf16 subnormal +-2^-127, NOT 0.0 — callers must multiply by a scale
    (any normal bf16, or 0 for padding) on the VPU, whose measured
    subnormal-input flush produces the exact 0. Bit-exact consumers use
    decode_quarter_exact.
    """
    y = _extract_quarter(words, j)
    z = y ^ _ZXOR
    c = (z + _CADD) & _CMASK
    bits = y + (c >> np.uint32(9)) * _NRM_BIAS
    return pltpu.bitcast(bits, jnp.bfloat16)


def decode_quarter_exact(words: jax.Array, j: int) -> jax.Array:
    """decode_quarter with stored zeros forced to exact +0.0 (two extra
    ops): the reference/test path used by the standalone dequant kernel,
    where no downstream multiply exists to flush the subnormal."""
    y = _extract_quarter(words, j)
    z = y ^ _ZXOR
    c = (z + _CADD) & _CMASK
    flag = c >> np.uint32(9)
    bits = (y + flag * _NRM_BIAS) & (flag * np.uint32(0xFFFF))
    return pltpu.bitcast(bits, jnp.bfloat16)


def decode_scales_e4m3(s_u8: jax.Array) -> jax.Array:
    """E4M3 bytes (G, C) -> f32 (exact). No longer used by the kernels —
    process_*_scales now decodes to bf16 offline (ops/layout.py) — but kept
    as the in-kernel reference decode for tools/tpu_bench.py variants.
    Positive-scale invariant is validated at process time, so the sign bit
    is ignored."""
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


def _chunk_scale_slab(sc: jax.Array, chunk: int) -> jax.Array:
    """(srows, C) stride-16 step-quarter scales -> the (128, C) broadcast
    slab for one 128-row chunk.

    Thanks to the pi-interleave in the weight layout (ops/layout.py), chunk
    rows cycle through their 8 stride-16 scale rows with period 8, so the
    broadcast is a pltpu.repeat tile copy — no sublane element-broadcast
    relayout, no one-hot expand matmul, no big f32->bf16 cast (those cost
    ~35% of kernel time in earlier designs). MXFP4's 32-wide groups are
    pre-duplicated to stride 16 offline (a 4->8 row interleave here was a
    measured Mosaic relayout costing ~2x kernel time)."""
    slab = sc[chunk * 8:(chunk + 1) * 8]
    return pltpu.repeat(slab, 16, axis=0)          # (128, C)


def _apply_scales(deq: jax.Array, sc: jax.Array,
                  out_dtype=jnp.bfloat16) -> jax.Array:
    """Multiply pi-interleaved (R, C) decoded values by their stride-16
    scales ((R/16, C), R % 128 == 0). Used by the standalone dequant
    kernel; the fused kernel fuses this per chunk into its dot loop."""
    r, c = deq.shape
    sc = sc.astype(out_dtype)
    parts = []
    for ch in range(r // 128):
        sb = _chunk_scale_slab(sc, ch)
        parts.append(deq[ch * 128:(ch + 1) * 128] * sb)
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _int_scale_quarter(y: jax.Array, c: jax.Array, sc: jax.Array):
    """MXFP4 fast path: apply power-of-two scales by INTEGER exponent
    addition in the SWAR domain (the TPU analog of the reference's E8M0
    exponent splice, quantization/dequant.cuh:196-221), replacing the
    widened bf16 slab multiply (measured: -25 us of VPU time at
    (16,8192,8192) on v5e).

        product_bits = value_bits + scale_bits - 0x3F80   (per half)

    exact because bits(v * 2^p) = bits(v) + p<<7 for normal results.
    Yields (chunk_index, (128, C) bf16 scaled slab) pairs. Preconditions
    (validated/guaranteed offline): scale bytes <= 252 so the add cannot
    carry into the sign bit; byte-0 (zero) scales only occur for all-zero
    weight groups, whose stored-zero values the nonzero mask kills here
    (a sane quantizer never pairs a zero scale with nonzero codes); padded
    columns produce garbage that the host wrapper slices off.
    """
    mask = (c >> np.uint32(9)) * np.uint32(0xFFFF)
    sc32 = pltpu.bitcast(sc, jnp.uint32) - np.uint32(0x00800080)
    for ch in range(y.shape[0] // 64):
        slab32 = pltpu.repeat(sc32[ch * 4:(ch + 1) * 4], 16, axis=0)
        bits = (y[ch * 64:(ch + 1) * 64] + slab32) \
            & mask[ch * 64:(ch + 1) * 64]
        yield ch, pltpu.bitcast(bits, jnp.bfloat16)


def _int_scale_quarter_nz(y: jax.Array, sc: jax.Array):
    """_int_scale_quarter for ZERO-FREE tensors (SolutionId.zero_free,
    "nvfp4p2z"): the quantizer contract guarantees no stored-zero codes,
    so the carry-flag nonzero mask is dropped — the scale apply is ONE
    packed add per chunk. This removes the only pow2-path VPU cost that
    does not hide under the weight DMA (measured round 5: 88.8 -> ~70 us
    at (16,8192,8192), the pure stream+dots floor). Padded k rows decode
    to garbage exactly as in the masked path and are killed by A's zero
    padding; padded n columns are sliced off by the host wrapper."""
    sc32 = pltpu.bitcast(sc, jnp.uint32) - np.uint32(0x00800080)
    for ch in range(y.shape[0] // 64):
        slab32 = pltpu.repeat(sc32[ch * 4:(ch + 1) * 4], 16, axis=0)
        yield ch, pltpu.bitcast(y[ch * 64:(ch + 1) * 64] + slab32,
                                jnp.bfloat16)


def _fused_kernel(a0, a1, a2, a3, w_ref, s0, s1, s2, s3, gs_ref,
                  out_ref, acc_ref, *, nk: int, high_precision: bool,
                  int_scale: bool = False, zero_free: bool = False):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a_refs = (a0, a1, a2, a3)
    s_refs = (s0, s1, s2, s3)
    if int_scale:
        for j in range(4):
            y = _extract_quarter(w_ref[:], j)
            a = a_refs[j][:]
            if zero_free:
                quarters = _int_scale_quarter_nz(y, s_refs[j][:])
            else:
                z = y ^ _ZXOR
                c = (z + _CADD) & _CMASK
                quarters = _int_scale_quarter(y, c, s_refs[j][:])
            for ch, b in quarters:
                acc_ref[:] += jnp.dot(a[:, ch * 128:(ch + 1) * 128], b,
                                      preferred_element_type=jnp.float32)

        @pl.when(kk == nk - 1)
        def _epilogue_int():
            out_ref[:] = (acc_ref[:] * gs_ref[0, 0]).astype(out_ref.dtype)
        return
    for j in range(4):
        deq = decode_quarter(w_ref[:], j)
        # scales arrive bf16 (decoded offline) as four per-quarter blocked
        # inputs, streamed like the weights (k-resident scales OOM scoped
        # VMEM at large k x wide bn: 2 x 7.3 MB at k=28672, bn=4096)
        sc = s_refs[j][:]
        if high_precision:
            sc = sc.astype(jnp.float32)
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
                 * _chunk_scale_slab(sc, ch))
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


def _fused_kernel_wc(a0, a1, a2, a3, w_ref, s0, s1, s2, s3, gs_ref,
                     out_ref, acc_ref, bc_ref, *, nk: int,
                     high_precision: bool, int_scale: bool = False,
                     zero_free: bool = False):
    """Weight-cache variant: grid (nn, nm, nk). At the first m-block of each
    n-block, decode+scale this k-step's weights into the k-resident VMEM
    cache bc_ref (4, kp/4, bn); every m-block's dots read the cache — the
    VPU dequant runs once per weight block instead of ceil(m/bm) times."""
    i = pl.program_id(1)
    kk = pl.program_id(2)
    kb4 = 2 * w_ref.shape[0]  # rows per quarter per step (= bk/4)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s_refs = (s0, s1, s2, s3)

    @pl.when(i == 0)
    def _decode():
        for j in range(4):
            if int_scale:
                y = _extract_quarter(w_ref[:], j)
                if zero_free:
                    quarters = _int_scale_quarter_nz(y, s_refs[j][:])
                else:
                    c = ((y ^ _ZXOR) + _CADD) & _CMASK
                    quarters = _int_scale_quarter(y, c, s_refs[j][:])
                for ch, b in quarters:
                    bc_ref[kk, j, ch * 128:(ch + 1) * 128, :] = b
                continue
            deq = decode_quarter(w_ref[:], j)
            sc = s_refs[j][:]
            for ch in range(deq.shape[0] // 128):
                b = (deq[ch * 128:(ch + 1) * 128]
                     * _chunk_scale_slab(sc, ch))
                # kk indexes the cache's LEADING dim only (pure offset; a
                # dynamic mid-dim slice would cost a Mosaic copy per access)
                bc_ref[kk, j, ch * 128:(ch + 1) * 128, :] = b

    a_refs = (a0, a1, a2, a3)
    for j in range(4):
        a = a_refs[j][:]
        if high_precision:
            a = a.astype(jnp.float32)
        for ch in range(kb4 // 128):
            b = bc_ref[kk, j, ch * 128:(ch + 1) * 128, :]
            a_ch = a[:, ch * 128:(ch + 1) * 128]
            if high_precision:
                # cache holds bf16 dequant products (exact for NVFP4); the
                # high-precision gain here is the f32 A operand
                acc_ref[:] += jnp.dot(a_ch, b.astype(jnp.float32),
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
    words    : (k/8, n) uint32 petit-tpu q-coded layout (ops/layout.py)
    scales_t : (k/16, n) bfloat16 stride-16 scales decoded offline
    global_scale : () or (1,) f32

    m and n are padded to block multiples here (n-padded columns get ZERO
    scales, which kill whatever the zero-padded weight words decode to;
    padded m rows are sliced off); k % sid.block_k == 0 is required and
    guaranteed by the feasibility filter (solution.is_feasible).
    """
    # No Mosaic on CPU: fall back to the interpreter (the virtual-device
    # test/dryrun environment; real runs are on TPU).
    interpret = interpret or jax.default_backend() == "cpu"
    m, k = a.shape
    kw, n = words.shape
    group = sid.group_size
    kp = kw * 8           # repack-padded k (layout.K_PAD / K_PAD_MX)
    assert kp >= k and kp - k < (512 if group == 16 else 1024), (kp, k)
    # processed scales are stride-16 rows for BOTH formats (layout doc)
    assert scales_t.shape == (kp // 16, n)
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
    srows = kb4 // 16     # stride-16 scale rows per quarter per step


    if sid.weight_cache:
        # grid (nn, nm, nk): for each n-block, the first m-block's pass
        # decodes every k-step into the k-resident cache; later m-blocks
        # only run MXU dots (kernel _fused_kernel_wc).
        def a_map(j):
            return lambda nn_, i, kk_, j=j: (i, j * nk + kk_)

        def s_map(j):
            return lambda nn_, i, kk_, j=j: (j * nk + kk_, nn_)

        grid = (nn, nm, nk)
        w_map = lambda nn_, i, kk_: (kk_, nn_)
        gs_map = lambda nn_, i, kk_: (0, 0)
        out_map = lambda nn_, i, kk_: (i, nn_)
        scratch = [pltpu.VMEM((bm, bn), jnp.float32),
                   pltpu.VMEM((nk, 4, kb4, bn), jnp.bfloat16)]
        kernel = functools.partial(
            _fused_kernel_wc, nk=nk,
            high_precision=sid.high_precision,
            int_scale=((sid.element_b == ElementB.MXFP4
                        or sid.pow2_scale)
                       and not sid.high_precision),
            zero_free=sid.zero_free and not sid.high_precision)
        semantics = ("parallel", "arbitrary", "arbitrary")
    else:
        def a_map(j):
            return lambda i, nn_, kk_, j=j: (i, j * nk + kk_)

        def s_map(j):
            return lambda i, nn_, kk_, j=j: (j * nk + kk_, nn_)

        grid = (nm, nn, nk)
        w_map = lambda i, nn_, kk_: (kk_, nn_)
        gs_map = lambda i, nn_, kk_: (0, 0)
        out_map = lambda i, nn_, kk_: (i, nn_)
        scratch = [pltpu.VMEM((bm, bn), jnp.float32)]
        kernel = functools.partial(
            _fused_kernel, nk=nk,
            high_precision=sid.high_precision,
            # MXFP4 power-of-two scales apply as an integer exponent add
            # (_int_scale_quarter); high-precision keeps the f32 mul path
            int_scale=((sid.element_b == ElementB.MXFP4
                        or sid.pow2_scale)
                       and not sid.high_precision),
            zero_free=sid.zero_free and not sid.high_precision)
        semantics = ("parallel", "parallel", "arbitrary")

    a_specs = [pl.BlockSpec((bm, kb4), a_map(j), memory_space=pltpu.VMEM)
               for j in range(4)]
    w_spec = pl.BlockSpec((bk // 8, bn), w_map, memory_space=pltpu.VMEM)
    # scales streamed per quarter+step like the weights (srows rows each)
    s_specs = [pl.BlockSpec((srows, bn), s_map(j), memory_space=pltpu.VMEM)
               for j in range(4)]
    gs_spec = pl.BlockSpec((1, 1), gs_map, memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((bm, bn), out_map, memory_space=pltpu.VMEM)

    gs = jnp.asarray(global_scale, jnp.float32).reshape(1, 1)
    if sid.high_precision:
        a = a.astype(jnp.float32)
    elif a.dtype != jnp.bfloat16:
        a = a.astype(jnp.bfloat16)

    flops = 2 * m_pad * n_pad * kp
    bytes_accessed = (words.size * 4 + scales_t.size * 2
                      + a.size * a.dtype.itemsize
                      + m_pad * n_pad * 2)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[*a_specs, w_spec, *s_specs, gs_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), out_dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(a, a, a, a, words, scales_t, scales_t, scales_t, scales_t, gs)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# W4A8 kernel: FP4 weights requantized in-kernel to int8, int8 activations,
# MXU int8 dots with an int32 accumulator. TPU analog of the reference's
# third mfma type (kMatmulMfmaTypeFp8, gemm.h:63-67; CDNA3 bf8 fast path,
# dequant.cuh:326-363). Opt-in (MatmulType.INT8): per-column weight
# requantization is a different numerics contract than exact group-wise FP4
# dequant — quality-gate before adopting (tools/quality_gate.py).
# ---------------------------------------------------------------------------


def _round_i8_bf16(b):
    """RNE round-to-integer of a bf16 vector IN the bf16 domain, as int8.

    Mosaic cannot legalize math.roundeven on bf16 vectors (probed v5e
    2026-08-20: 'failed to legalize operation math.roundeven'), and the
    f32 `astype` before an f32 round is a pure widening-relayout cost.
    Magic-constant round instead: |b| + 128 lands in [128, 256), where
    the bf16 ulp is exactly 1, so the ADD itself performs the
    round-to-nearest-even onto the integer grid; subtracting 128 is
    exact, and the final int8 convert truncates an already-integral
    value. Requires |b| <= 127, guaranteed by the requant constant
    r = scale * 127 / colmax. Bit-identical to
    lax.round(TO_NEAREST_EVEN) on that domain (pinned in tests)."""
    m = jnp.bfloat16(128.0)
    r = (jnp.abs(b) + m) - m
    return jnp.where(b < 0, -r, r).astype(jnp.int8)


def _fused_kernel_w4a8(a0, a1, a2, a3, w_ref, r0, r1, r2, r3, acol_ref,
                       arow_ref, gs_ref, out_ref, acc_ref, *, nk: int):
    """Per k-step: v6 decode -> multiply by the requant slab r (bf16,
    = scale * 127 / colmax) -> round to int8 -> int8 MXU dot.

    acc is int32; the epilogue applies out = acc * arow ⊗ acol * gs, where
    arow = per-token activation scale (max|a|/127) and acol = per-column
    weight scale (colmax/127)."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a_refs = (a0, a1, a2, a3)
    r_refs = (r0, r1, r2, r3)
    for j in range(4):
        deq = decode_quarter(w_ref[:], j)
        rq = r_refs[j][:]
        a = a_refs[j][:]
        for ch in range(deq.shape[0] // 128):
            # bf16-domain round (magic-constant RNE, _round_i8_bf16):
            # no f32 widening relayout, and no math.roundeven, which
            # Mosaic cannot legalize on bf16 (the bf16 product is
            # itself already RNE-rounded — double rounding sits inside
            # the int8 quantization noise the 3%-tolerance contract
            # allows)
            b = (deq[ch * 128:(ch + 1) * 128]
                 * _chunk_scale_slab(rq, ch))
            # |b| <= 127 by construction of r; stored zeros decode to a
            # subnormal the multiply flushes (or rounds) to 0
            b_i8 = _round_i8_bf16(b)
            a_ch = a[:, ch * 128:(ch + 1) * 128]
            acc_ref[:] += jax.lax.dot_general(
                a_ch, b_i8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

    @pl.when(kk == nk - 1)
    def _epilogue():
        out_ref[:] = (acc_ref[:].astype(jnp.float32)
                      * arow_ref[:] * acol_ref[:]
                      * gs_ref[0, 0]).astype(out_ref.dtype)


def _fused_kernel_w4a8_wc(a0, a1, a2, a3, w_ref, r0, r1, r2, r3, acol_ref,
                          arow_ref, gs_ref, out_ref, acc_ref, bc_ref, *,
                          nk: int):
    """Weight-cache W4A8 variant: grid (nn, nm, nk). The first m-block of
    each n-block decodes + requantizes this k-step's weights into the
    k-resident int8 VMEM cache bc_ref (nk, 4, kb4, bn); later m-blocks run
    int8 MXU dots straight off the cache. This amortizes the in-kernel
    requant (decode, slab multiply, round, int8 convert — the reason W4A8
    lost to dense below m~384, round-3 verdict #8) over ceil(m/bm) blocks
    instead of paying it per block; the int8 cache is half the footprint
    of the bf16 weight cache in _fused_kernel_wc."""
    i = pl.program_id(1)
    kk = pl.program_id(2)
    kb4 = 2 * w_ref.shape[0]

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    r_refs = (r0, r1, r2, r3)

    @pl.when(i == 0)
    def _decode():
        for j in range(4):
            deq = decode_quarter(w_ref[:], j)
            rq = r_refs[j][:]
            for ch in range(kb4 // 128):
                # bf16-domain round, matching _fused_kernel_w4a8 (the two
                # variants are pinned bit-identical in tests)
                b = (deq[ch * 128:(ch + 1) * 128]
                     * _chunk_scale_slab(rq, ch))
                bc_ref[kk, j, ch * 128:(ch + 1) * 128, :] = \
                    _round_i8_bf16(b)

    a_refs = (a0, a1, a2, a3)
    for j in range(4):
        a = a_refs[j][:]
        for ch in range(kb4 // 128):
            acc_ref[:] += jax.lax.dot_general(
                a[:, ch * 128:(ch + 1) * 128],
                bc_ref[kk, j, ch * 128:(ch + 1) * 128, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

    @pl.when(kk == nk - 1)
    def _epilogue():
        out_ref[:] = (acc_ref[:].astype(jnp.float32)
                      * arow_ref[:] * acol_ref[:]
                      * gs_ref[0, 0]).astype(out_ref.dtype)


def w4a8_requant_constants(scales_t: jax.Array):
    """Per-column weight requant constants for the W4A8 kernel:
    colmax = 6 * max(scales_t) per column, r_t = scales_t * 127/colmax
    (bf16), acol = colmax/127 (f32, (1, n)). Computing these per call
    costs an extra ~3x pass over the scale array (read scales, write
    r_t, kernel reads r_t — measured as part of W4A8's mid-m loss,
    round 4); precompute once at load/engine-init time and pass to
    fused_mul_w4a8(r_t=..., acol=...)."""
    s32 = scales_t.astype(jnp.float32)
    colmax = 6.0 * jnp.max(s32, axis=0, keepdims=True)        # (1, n)
    colmax = jnp.where(colmax == 0, 1.0, colmax)
    r_t = (s32 * (127.0 / colmax)).astype(jnp.bfloat16)       # (kp/16, n)
    acol = colmax / 127.0                                     # (1, n)
    return r_t, acol


@functools.partial(jax.jit, static_argnames=("sid", "interpret", "out_dtype"))
def fused_mul_w4a8(a: jax.Array, words: jax.Array, scales_t: jax.Array,
                   global_scale: jax.Array, *, sid: SolutionId,
                   out_dtype=jnp.bfloat16,
                   interpret: bool = False,
                   r_t: jax.Array | None = None,
                   acol: jax.Array | None = None) -> jax.Array:
    """W4A8 path of fused_mul: same (words, scales_t) operands, int8 MXU.

    Host-side pre-passes (XLA, fused into the caller's graph):
      - per-token activation quantization: arow = max|a|/127, a_i8
      - per-column requant constants (w4a8_requant_constants) — pass
        precomputed r_t/acol to skip the per-call scale pass
    """
    interpret = interpret or jax.default_backend() == "cpu"
    m, k = a.shape
    kw, n = words.shape
    group = sid.group_size
    kp = kw * 8
    assert kp >= k and kp - k < (512 if group == 16 else 1024), (kp, k)
    assert scales_t.shape == (kp // 16, n)
    bm, bn, bk = sid.block_m, sid.block_n, sid.block_k
    assert kp % bk == 0 and bk % 512 == 0

    if r_t is None or acol is None:
        r_t, acol = w4a8_requant_constants(scales_t)

    # --- activation-side per-token int8 quantization
    af = a.astype(jnp.float32)
    arow = jnp.max(jnp.abs(af), axis=1, keepdims=True) / 127.0  # (m, 1)
    arow = jnp.where(arow == 0, 1.0, arow)
    a_i8 = jax.lax.round(af / arow,
                         jax.lax.RoundingMethod.TO_NEAREST_EVEN
                         ).astype(jnp.int8)

    m_pad = -(-m // bm) * bm
    n_pad = -(-n // bn) * bn
    if m_pad != m or kp != k:
        a_i8 = jnp.pad(a_i8, ((0, m_pad - m), (0, kp - k)))
        arow = jnp.pad(arow, ((0, m_pad - m), (0, 0)),
                       constant_values=1.0)
    a_i8 = a_i8.reshape(m_pad, kp // 128, 8, 16).swapaxes(2, 3).reshape(
        m_pad, kp)
    if n_pad != n:
        words = jnp.pad(words, ((0, 0), (0, n_pad - n)))
        r_t = jnp.pad(r_t, ((0, 0), (0, n_pad - n)))
        acol = jnp.pad(acol, ((0, 0), (0, n_pad - n)))

    nm, nn, nk = m_pad // bm, n_pad // bn, kp // bk
    kb4 = bk // 4
    srows = kb4 // 16

    if sid.weight_cache:
        # grid (nn, nm, nk): decode+requant once per weight block at the
        # first m-block, int8 dots off the cache for the rest
        def a_map(j):
            return lambda nn_, i, kk_, j=j: (i, j * nk + kk_)

        def s_map(j):
            return lambda nn_, i, kk_, j=j: (j * nk + kk_, nn_)

        grid = (nn, nm, nk)
        w_map = lambda nn_, i, kk_: (kk_, nn_)
        acol_map = lambda nn_, i, kk_: (0, nn_)
        arow_map = lambda nn_, i, kk_: (i, 0)
        gs_map = lambda nn_, i, kk_: (0, 0)
        out_map = lambda nn_, i, kk_: (i, nn_)
        scratch = [pltpu.VMEM((bm, bn), jnp.int32),
                   pltpu.VMEM((nk, 4, kb4, bn), jnp.int8)]
        kernel = functools.partial(_fused_kernel_w4a8_wc, nk=nk)
        semantics = ("parallel", "arbitrary", "arbitrary")
    else:
        def a_map(j):
            return lambda i, nn_, kk_, j=j: (i, j * nk + kk_)

        def s_map(j):
            return lambda i, nn_, kk_, j=j: (j * nk + kk_, nn_)

        grid = (nm, nn, nk)
        w_map = lambda i, nn_, kk_: (kk_, nn_)
        acol_map = lambda i, nn_, kk_: (0, nn_)
        arow_map = lambda i, nn_, kk_: (i, 0)
        gs_map = lambda i, nn_, kk_: (0, 0)
        out_map = lambda i, nn_, kk_: (i, nn_)
        scratch = [pltpu.VMEM((bm, bn), jnp.int32)]
        kernel = functools.partial(_fused_kernel_w4a8, nk=nk)
        semantics = ("parallel", "parallel", "arbitrary")

    a_specs = [pl.BlockSpec((bm, kb4), a_map(j), memory_space=pltpu.VMEM)
               for j in range(4)]
    w_spec = pl.BlockSpec((bk // 8, bn), w_map, memory_space=pltpu.VMEM)
    r_specs = [pl.BlockSpec((srows, bn), s_map(j), memory_space=pltpu.VMEM)
               for j in range(4)]
    acol_spec = pl.BlockSpec((1, bn), acol_map, memory_space=pltpu.VMEM)
    arow_spec = pl.BlockSpec((bm, 1), arow_map, memory_space=pltpu.VMEM)
    gs_spec = pl.BlockSpec((1, 1), gs_map, memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((bm, bn), out_map, memory_space=pltpu.VMEM)

    gs = jnp.asarray(global_scale, jnp.float32).reshape(1, 1)
    flops = 2 * m_pad * n_pad * kp
    bytes_accessed = (words.size * 4 + r_t.size * 2 + a_i8.size
                      + m_pad * n_pad * 2)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[*a_specs, w_spec, *r_specs, acol_spec, arow_spec,
                  gs_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), out_dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(a_i8, a_i8, a_i8, a_i8, words, r_t, r_t, r_t, r_t, acol, arow, gs)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# Standalone dequant kernel: full-matrix B -> bf16 (k, n) from the TPU
# layout. Test/reference path, analog of DequantPetitFp4 / DequantPetitMxFp4
# (quantization_utils.cu:306-727).
# ---------------------------------------------------------------------------

def _dequant_kernel(w_ref, s0, s1, s2, s3, out_ref):
    s_refs = (s0, s1, s2, s3)
    for j in range(4):
        # exact-zero decode: the output is compared bit-for-bit against the
        # host oracle, and interpret mode has no subnormal flush
        deq = decode_quarter_exact(w_ref[:], j)
        out_ref[j] = _apply_scales(deq, s_refs[j][:])


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
    bk = min(block_k, k)
    bn = min(block_n, n)
    assert k % bk == 0 and n % bn == 0 and bk % 512 == 0, (k, bk, n, bn)
    nk, nn = k // bk, n // bn
    kb4, srows = bk // 4, bk // 4 // 16

    def s_map(j):
        return lambda kk_, nn_, j=j: (j * nk + kk_, nn_)

    out = pl.pallas_call(
        functools.partial(_dequant_kernel),
        grid=(nk, nn),
        in_specs=[
            pl.BlockSpec((bk // 8, bn), lambda kk_, nn_: (kk_, nn_),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec((srows, bn), s_map(j), memory_space=pltpu.VMEM)
              for j in range(4)],
        ],
        out_specs=pl.BlockSpec((4, kb4, bn), lambda kk_, nn_: (0, kk_, nn_),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, k // 4, n), jnp.bfloat16),
        interpret=interpret,
    )(words, scales_t, scales_t, scales_t, scales_t)
    # (4, k/4, n): quarter j holds k-range [j*k/4, (j+1)*k/4); un-permute
    # the pi-interleave within each 128-row chunk (natural[pi(i)] = row[i],
    # pi its own (16,8)/(8,16)-transpose inverse).
    out = out.reshape(4, k // 4 // 128, 16, 8, n).swapaxes(2, 3)
    return out.reshape(k, n)
