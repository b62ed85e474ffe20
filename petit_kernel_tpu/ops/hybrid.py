"""Hybrid FP4+BF16 quantization: salient columns stay dense.

See ops/kernels/hybrid.py for the kernel-side rationale (overlapping the
DMA-bound dense stream with the VPU-bound FP4 decode). Host side here:
column selection by weight salience, per-part quantize/repack, and the
public mul that stitches the two outputs back into checkpoint column
order.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..numerics import reference as ref_numerics
from . import layout as layout_mod
from .kernels import hybrid as hybrid_kernel


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class HybridMeta:
    """Static split metadata of a hybrid layer. Registered static so a
    params pytree holding hybrid layers can flow through jax.jit — these
    are compile-time block shapes, not data."""
    block_nf: int
    block_nd: int
    size_k: int


def permute_k_for_a(wd: np.ndarray, kp: int) -> np.ndarray:
    """(k, nd) -> (kp, nd) rows reordered to the fused kernel's A order
    (zero-pad to kp, then the pi (8,16)-transpose within each 128-chunk —
    the same transform fused_mul applies to A)."""
    k, nd = wd.shape
    out = np.zeros((kp, nd), wd.dtype)
    out[:k] = wd
    return (out.reshape(kp // 128, 8, 16, nd)
            .swapaxes(1, 2).reshape(kp, nd))


def quantize_hybrid(w_kn: np.ndarray, *, block_nf: int = 1536,
                    block_nd: int = 512, fmt: str = "nvfp4") -> dict:
    """Split a dense (k, n) weight into FP4 columns + salient dense columns.

    The global split ratio equals block_nf : block_nd (one FP4 block and one
    dense block per kernel n-step), so n must be divisible by
    (block_nf + block_nd). Salience = per-column max |w| (outlier columns
    are exactly preserved — the accuracy rationale of AWQ-style methods,
    applied at column granularity so the kernel split stays block-aligned).
    """
    import ml_dtypes

    w = np.asarray(w_kn, np.float32)
    k, n = w.shape
    step = block_nf + block_nd
    assert n % step == 0, (n, step)
    nn = n // step
    nf, nd = nn * block_nf, nn * block_nd

    sal = np.abs(w).max(axis=0)
    dense_idx = np.sort(np.argsort(sal)[-nd:])
    mask = np.ones(n, bool)
    mask[dense_idx] = False
    fp4_idx = np.flatnonzero(mask)
    perm = np.concatenate([fp4_idx, dense_idx])

    quant = (ref_numerics.quantize_nvfp4 if fmt == "nvfp4"
             else ref_numerics.quantize_mxfp4)
    group = 16 if fmt == "nvfp4" else 32
    qw, scales, gs = quant(w[:, fp4_idx].T)      # (nf, k) layout
    words = layout_mod.repack_fp4_weights(
        qw, nf, k, pad_to=layout_mod.pad_multiple(group))
    st = layout_mod.process_fp4_scales(scales, nf, k, group_size=group)
    kp = words.shape[0] * 8
    wd = permute_k_for_a(w[:, dense_idx].astype(ml_dtypes.bfloat16), kp)
    return {
        "words": jnp.asarray(words), "scales": jnp.asarray(st),
        "gs": jnp.float32(gs), "wd": jnp.asarray(wd),
        "inv_perm": jnp.asarray(np.argsort(perm), jnp.int32),
        "meta": HybridMeta(block_nf, block_nd, k),
    }


def mul_hybrid(a: jax.Array, hq: dict, *, block_m: int = 16,
               block_k: int = 1024, interpret: bool = False) -> jax.Array:
    """(m, k) @ hybrid-quantized (k, n) -> (m, n) in original column order."""
    meta = hq["meta"]
    outf, outd = hybrid_kernel.hybrid_mul(
        a, hq["words"], hq["scales"], hq["gs"], hq["wd"],
        block_m=block_m, block_nf=meta.block_nf, block_nd=meta.block_nd,
        block_k=block_k, interpret=interpret)
    return jnp.concatenate([outf, outd], axis=1)[:, hq["inv_perm"]]
