"""Fused dequant+GEMM Pallas kernel vs host oracle (interpret mode, CPU).

TPU analog of the reference GEMM-vs-hipBLASLt integration tests
(fp4/gemm_fp4_fp16_rocm_test.cc:192-289): the oracle dequantizes B with the
host reference and runs a dense f32 matmul; tolerance |d| < max(1e-2, 1%).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from petit_kernel_tpu.numerics import formats, reference
from petit_kernel_tpu.ops import layout
from petit_kernel_tpu.ops.kernels import fused
from petit_kernel_tpu.ops.solution import SolutionId, ElementB, MatmulType


def make_case(m, n, k, fmt, seed):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((m, k)).astype(np.float32)
    nib = rng.integers(0, 16, size=(n, k), dtype=np.uint8)
    nib[nib == 8] = 0
    qw = formats.pack_fp4_pairs(nib)
    group = 16 if fmt == "nvfp4" else 32
    if fmt == "nvfp4":
        # positive E4M3 around 1.0 (exponents 4..10 => 2^-3..2^3)
        scales = (rng.integers(4, 11, size=(n, k // group), dtype=np.uint8) << 3
                  | rng.integers(0, 8, size=(n, k // group), dtype=np.uint8))
    else:
        scales = rng.integers(120, 135, size=(n, k // group), dtype=np.uint8)
    gs = np.float32(rng.uniform(0.5, 2.0))
    words = layout.repack_fp4_weights(qw, n, k,
                                      pad_to=layout.pad_multiple(group))
    st = layout.process_fp4_scales(scales, n, k, group_size=group)
    return a, qw, scales, gs, words, st


def check(c, a, qw, scales, gs, fmt, rtol=0.01, atol=0.01):
    a_bf = a.astype(jnp.bfloat16).astype(np.float32)
    ref = reference.gemm_reference(a_bf, qw, scales, gs, fmt=fmt)
    c = np.asarray(c, dtype=np.float32)
    np.testing.assert_allclose(c, ref, rtol=rtol, atol=atol)


def test_standalone_dequant_kernel_bit_exact():
    for fmt, eb in [("nvfp4", ElementB.NVFP4), ("mxfp4", ElementB.MXFP4)]:
        _, qw, scales, _, words, st = make_case(1, 32, 512, fmt, seed=5)
        group = 16 if fmt == "nvfp4" else 32
        out = fused.dequant_tpu_layout(
            jnp.asarray(words), jnp.asarray(st), element_b=eb,
            block_k=512 if fmt == "nvfp4" else 1024, block_n=128,
            interpret=True)
        expect = layout.dequant_from_tpu_layout(words, st, 32, 512,
                                                group_size=group)
        # kernel output covers padded k; logical rows must match bit-exactly
        # (bf16 cast of exact products is exact: <= 6 significand bits), and
        # padded rows must be zero
        out = np.asarray(out, np.float32)
        assert np.array_equal(out[:512], expect), fmt
        assert not out[512:].any(), fmt


CASES = [
    # m, n, k, sid blocks (bm, bn, bk)
    (16, 128, 512, (16, 128, 512)),
    (1, 128, 512, (16, 128, 512)),     # m padding
    (16, 192, 1024, (16, 128, 512)),   # n padding (192 -> 256), multi k-step
    (33, 128, 1024, (16, 128, 512)),   # m padding multi-block
    (64, 256, 1024, (32, 256, 1024)),  # multi n-block, single k-step
    (16, 128, 384, (16, 128, 512)),    # k padding (384 -> 512)
]


@pytest.mark.parametrize(("m", "n", "k", "blocks"), CASES)
@pytest.mark.parametrize("fmt", ["nvfp4", "mxfp4"])
def test_fused_gemm_vs_oracle(m, n, k, blocks, fmt):
    eb = ElementB.NVFP4 if fmt == "nvfp4" else ElementB.MXFP4
    sid = SolutionId(*blocks, element_b=eb)
    if (sid.block_k // 4 // sid.group_size) % 8 != 0:
        # MXFP4 needs block_k % 1024 (8-aligned scale slices); retest the
        # same shape at the doubled block
        sid = SolutionId(blocks[0], blocks[1], 2 * blocks[2], element_b=eb)
    a, qw, scales, gs, words, st = make_case(m, n, k, fmt, seed=m * k + n)
    c = fused.fused_mul(
        jnp.asarray(a, jnp.bfloat16), jnp.asarray(words), jnp.asarray(st),
        jnp.float32(gs), sid=sid, interpret=True)
    assert c.shape == (m, n) and c.dtype == jnp.bfloat16
    check(c, a, qw, scales, gs, fmt)


def test_fused_gemm_high_precision():
    sid = SolutionId(16, 128, 512, element_b=ElementB.NVFP4,
                     high_precision=True)
    a, qw, scales, gs, words, st = make_case(16, 128, 512, "nvfp4", seed=9)
    c = fused.fused_mul(
        jnp.asarray(a, jnp.float32), jnp.asarray(words), jnp.asarray(st),
        jnp.float32(gs), sid=sid, out_dtype=jnp.float32, interpret=True)
    # f32 path: compare against f32 oracle (no bf16 rounding of A)
    ref = reference.gemm_reference(a, qw, scales, gs, fmt="nvfp4")
    np.testing.assert_allclose(np.asarray(c), ref, rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("fmt", ["nvfp4", "mxfp4"])
def test_kernel_dequant_exhaustive_values(fmt):
    """Every (FP4 nibble x scale byte) combination decodes bit-exactly
    through repack -> in-kernel decode, vs the closed-form host product.

    Reference analog: ExhaustiveFp4DequantTest / MxFp4DequantTest
    (fp4/quantization_utils_fp4_test.cc:255-394). Products e2m1 x scale are
    exact in bf16 (2 + 3 significand bits), so the comparison is equality.
    """
    group = 16 if fmt == "nvfp4" else 32
    n, k = 128, 32 * group  # 32 scale groups per row
    # every nibble code in every group: k cycles 0..15
    nib = np.tile(np.arange(16, dtype=np.uint8), (n, k // 16))
    nib[nib == 8] = 0
    if fmt == "nvfp4":
        valid = np.array([b for b in range(127) if (b & 0x7F) != 0x7F],
                         dtype=np.uint8)  # positive, non-NaN E4M3
    else:
        # all E8M0 except NaN (255) and 253/254, which process_fp4_scales
        # rejects (the in-kernel exponent add would carry into the sign
        # bit for scale * max|fp4| > bf16 max — round-2 advisor finding)
        valid = np.arange(253, dtype=np.uint8)
    gidx = (np.arange(n)[:, None] * (k // group)
            + np.arange(k // group)[None, :])
    scales = valid[gidx % len(valid)]
    assert len(np.unique(scales)) == len(valid)  # full byte coverage

    words = layout.repack_fp4_weights(
        formats.pack_fp4_pairs(nib), n, k,
        pad_to=layout.pad_multiple(group))
    st = layout.process_fp4_scales(scales, n, k, group_size=group)
    eb = ElementB.NVFP4 if fmt == "nvfp4" else ElementB.MXFP4
    deq = np.asarray(
        fused.dequant_tpu_layout(jnp.asarray(words), jnp.asarray(st),
                                 element_b=eb, interpret=True),
        np.float32)[:k]  # (k, n)

    vals = formats.fp4_decode(nib).astype(np.float64)  # (n, k)
    sc = (formats.e4m3_decode(scales) if fmt == "nvfp4"
          else formats.e8m0_decode(scales)).astype(np.float64)
    want = (vals.reshape(n, -1, group) * sc[:, :, None]).reshape(n, k).T
    # bf16-exact products: round the closed form through bf16
    import ml_dtypes
    want = want.astype(np.float32).astype(ml_dtypes.bfloat16)
    got = deq.astype(ml_dtypes.bfloat16)
    if fmt == "mxfp4":
        # kernel contract: subnormal flush — the E8M0 byte-0 scale (2^-127,
        # a bf16 subnormal operand) acts as zero, and products below the
        # bf16 normal range flush to 0. Only reachable with extreme E8M0
        # scales, never by NVFP4's E4M3 range.
        flush = (np.repeat(sc.T < 2.0 ** -126, group, axis=0)
                 | (np.abs(want.astype(np.float64)) < 2.0 ** -126))
        got = np.where(flush, ml_dtypes.bfloat16(0), got)
        want = np.where(flush, ml_dtypes.bfloat16(0), want)
    assert np.array_equal(got.view(np.uint16), want.view(np.uint16))


@pytest.mark.parametrize(("m", "n", "k", "blocks"), [
    (64, 256, 1024, (16, 128, 512)),   # 4 m-blocks, 2 n-blocks, 2 k-steps
    (33, 128, 512, (16, 128, 512)),    # padded m, odd final block
    (128, 256, 2048, (32, 256, 1024)),
])
@pytest.mark.parametrize("fmt", ["nvfp4", "mxfp4"])
def test_fused_gemm_weight_cache_vs_oracle(m, n, k, blocks, fmt):
    """Weight-cache kernel variant (decode once per weight block, grid
    (nn, nm, nk)) matches the oracle like the plain kernel."""
    eb = ElementB.NVFP4 if fmt == "nvfp4" else ElementB.MXFP4
    bm, bn, bk = blocks
    if (bk // 4 // (16 if fmt == "nvfp4" else 32)) % 8 != 0:
        bk *= 2
    sid = SolutionId(bm, bn, bk, element_b=eb, weight_cache=True)
    assert SolutionId.from_repr(sid.repr()) == sid  # wc bit round-trips
    a, qw, scales, gs, words, st = make_case(m, n, k, fmt, seed=m + n + k)
    c = fused.fused_mul(
        jnp.asarray(a, jnp.bfloat16), jnp.asarray(words), jnp.asarray(st),
        jnp.float32(gs), sid=sid, interpret=True)
    assert c.shape == (m, n)
    check(c, a, qw, scales, gs, fmt)


def test_weight_cache_matches_plain_kernel_bitexact():
    """Same inputs through both kernel structures -> identical bits."""
    m, n, k = 48, 256, 1024
    a, qw, scales, gs, words, st = make_case(m, n, k, "nvfp4", seed=7)
    plain = fused.fused_mul(
        jnp.asarray(a, jnp.bfloat16), jnp.asarray(words), jnp.asarray(st),
        jnp.float32(gs), sid=SolutionId(16, 128, 512), interpret=True)
    wc = fused.fused_mul(
        jnp.asarray(a, jnp.bfloat16), jnp.asarray(words), jnp.asarray(st),
        jnp.float32(gs), sid=SolutionId(16, 128, 512, weight_cache=True),
        interpret=True)
    assert np.array_equal(np.asarray(plain, np.float32),
                          np.asarray(wc, np.float32))
