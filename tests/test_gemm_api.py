"""Differentiable FP4 matmul (custom VJP) vs dense-dequant autodiff oracle."""
import numpy as np
import jax
import jax.numpy as jnp

import pytest

import petit_kernel_tpu as pk
from petit_kernel_tpu.ops import gemm as G
from petit_kernel_tpu.ops import layout as L
from petit_kernel_tpu.ops import solution as S
from petit_kernel_tpu.numerics import reference as refn
from petit_kernel_tpu.utils.testdata import make_gemm_data


def test_mul_fp4_diff_grads_match_dense():
    d = make_gemm_data(8, 128, 512, "nvfp4", seed=3)
    a = jnp.asarray(d.a, jnp.bfloat16)
    b, s = jnp.asarray(d.words), jnp.asarray(d.scales_t)
    gs = jnp.float32(d.global_scale)

    def f(a, gs):
        return jnp.sum(G.mul_fp4_diff("nvfp4", 512, a, b, s, gs)
                       .astype(jnp.float32) ** 2)

    val, (da, dgs) = jax.value_and_grad(f, argnums=(0, 1))(a, gs)

    deq = L.dequant_from_tpu_layout(d.words, d.scales_t, 128, 512,
                                    group_size=16)
    w = jnp.asarray(deq, jnp.bfloat16)

    def f_ref(a, gs):
        y = jnp.dot(a, w, preferred_element_type=jnp.float32) * gs
        return jnp.sum(y.astype(jnp.float32) ** 2)

    val_r, (da_r, dgs_r) = jax.value_and_grad(f_ref, argnums=(0, 1))(a, gs)
    assert np.allclose(float(val), float(val_r), rtol=0.02)
    da = np.asarray(da, np.float32)
    da_r = np.asarray(da_r, np.float32)
    scale = np.abs(da_r).max()
    np.testing.assert_allclose(da / scale, da_r / scale, atol=0.02)
    assert np.allclose(float(dgs), float(dgs_r), rtol=0.05)


@pytest.mark.parametrize("seed", range(6))
def test_mul_fuzz_shapes_vs_oracle(seed):
    """Randomized shapes (ragged m, n % 16, k % 128, both formats, random
    explicit solutions) through the public mul API vs the host oracle —
    guards the padding paths the fixed cases miss."""
    rng = np.random.default_rng(1000 + seed)
    fmt = rng.choice(["nvfp4", "mxfp4"])
    m = int(rng.integers(1, 70))
    n = int(rng.integers(1, 20)) * 16
    k = int(rng.integers(1, 9)) * 128
    d = make_gemm_data(m, n, k, fmt, seed=seed)
    a = jnp.asarray(d.a, jnp.bfloat16)
    mul = pk.mul_nvfp4_a16 if fmt == "nvfp4" else pk.mul_mxfp4_a16

    sols = G.get_fp4_solutions(
        m, n, k, element_b=S.ElementB.NVFP4 if fmt == "nvfp4"
        else S.ElementB.MXFP4)
    sid = int(rng.choice([s for s in sols
                          if not S.SolutionId.from_repr(s).high_precision]
                         or [-1])) if sols and rng.random() < 0.5 else -1

    c = mul(a, jnp.asarray(d.words), jnp.asarray(d.scales_t),
            jnp.float32(d.global_scale), m, n, k, sid, interpret=True)
    assert c.shape == (m, n)
    ref = refn.gemm_reference(np.asarray(a, np.float32), d.qweights,
                              d.scales, d.global_scale, fmt=fmt)
    np.testing.assert_allclose(np.asarray(c, np.float32), ref,
                               rtol=0.01, atol=0.01)
