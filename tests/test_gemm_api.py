"""Differentiable FP4 matmul (custom VJP) vs dense-dequant autodiff oracle."""
import numpy as np
import jax
import jax.numpy as jnp

from petit_kernel_tpu.ops import gemm as G
from petit_kernel_tpu.ops import layout as L
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
