"""Tensor-parallel FP4 inference: Mesh + shard_map over the fused kernels.

The reference has no distributed code — multi-GPU serving is delegated to
SGLang's TP above the library (README.md:3,21; SURVEY.md section 2.3).  On
TPU the equivalent layer is built here, the idiomatic way: a
jax.sharding.Mesh with named axes ("dp", "tp"), Megatron-style
column/row-parallel quantized linears under shard_map, and XLA collectives
(psum / all_gather) riding ICI.

Key layout interaction: the petit-tpu weight layout interleaves k-quarters
globally (ops/layout.py), so row(k)-parallel weights must be repacked
PER SHARD; the packed rows of shard t then occupy block t of axis 0 and a
plain NamedSharding P("tp", None) places them correctly.  Column(n)-parallel
weights repack column-independently, so P(None, "tp") just works.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from ._compat import shard_map

from ..numerics import reference as ref_numerics
from ..ops import layout as layout_mod
from ..ops import gemm as gemm_mod
from ..models import llama


# ---------------------------------------------------------------------------
# Param sharding for the dense model (GSPMD path: training / BF16 baselines)
# ---------------------------------------------------------------------------

def shard_dense_params(params: dict, mesh: Mesh) -> dict:
    """Megatron-style NamedShardings on the dense llama pytree; XLA inserts
    the collectives (all-gather / reduce-scatter over ICI) under jit."""
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    out = {
        "embed": put(params["embed"], P(None, None)),
        "final_norm": put(params["final_norm"], P(None)),
        "lm_head": {"w": put(params["lm_head"]["w"], P(None, "tp"))},
        "layers": [],
    }
    col = P(None, "tp")   # column parallel: shard output features
    row = P("tp", None)   # row parallel: shard input features
    for lp in params["layers"]:
        out["layers"].append({
            "attn_norm": put(lp["attn_norm"], P(None)),
            "mlp_norm": put(lp["mlp_norm"], P(None)),
            "wq": {"w": put(lp["wq"]["w"], col)},
            "wk": {"w": put(lp["wk"]["w"], col)},
            "wv": {"w": put(lp["wv"]["w"], col)},
            "wo": {"w": put(lp["wo"]["w"], row)},
            "w_gate": {"w": put(lp["w_gate"]["w"], col)},
            "w_up": {"w": put(lp["w_up"]["w"], col)},
            "w_down": {"w": put(lp["w_down"]["w"], row)},
        })
    return out


# ---------------------------------------------------------------------------
# FP4 TP quantization: per-shard repack
# ---------------------------------------------------------------------------

def quantize_linear_tp(w_kn: np.ndarray, tp: int, shard: str,
                       fmt: str = "nvfp4") -> dict:
    """Quantize + repack a dense (k, n) weight for tp-way sharding.

    shard="n": column parallel — one global quantize/repack; the layout is
      column-independent so slicing columns later is exact.
    shard="k": row parallel — each k-slice is quantized (shared global
      scale) and repacked separately, then concatenated along packed rows so
      P("tp", None) splits at shard boundaries.
    """
    w = np.asarray(w_kn, np.float32).T  # (n, k)
    n, k = w.shape
    quant = (ref_numerics.quantize_nvfp4 if fmt == "nvfp4"
             else ref_numerics.quantize_mxfp4)
    group = 16 if fmt == "nvfp4" else 32
    if shard == "n":
        qw, scales, gs = quant(w)
        words = layout_mod.repack_fp4_weights(
            qw, n, k, pad_to=layout_mod.pad_multiple(group))
        st = layout_mod.process_fp4_scales(scales, n, k, group_size=group)
        return {"words": jnp.asarray(words), "scales": jnp.asarray(st),
                "gs": jnp.float32(gs)}
    assert shard == "k" and k % tp == 0, (shard, k, tp)
    ks = k // tp
    if fmt == "nvfp4":
        amax = np.abs(w).max()
        gs = np.float32(amax / (6.0 * 448.0)) if amax > 0 else np.float32(1.0)
    else:
        gs = np.float32(1.0)
    words_parts, scale_parts = [], []
    for t in range(tp):
        wt = w[:, t * ks:(t + 1) * ks]
        if fmt == "nvfp4":
            qw, scales, _ = ref_numerics.quantize_nvfp4(wt, global_scale=gs)
        else:
            qw, scales, _ = ref_numerics.quantize_mxfp4(wt)
        words_parts.append(layout_mod.repack_fp4_weights(
            qw, n, ks, pad_to=layout_mod.pad_multiple(group)))
        scale_parts.append(layout_mod.process_fp4_scales(
            scales, n, ks, group_size=group))
    return {"words": jnp.asarray(np.concatenate(words_parts, axis=0)),
            "scales": jnp.asarray(np.concatenate(scale_parts, axis=0)),
            "gs": jnp.float32(gs)}


_COL_KEYS = ("wq", "wk", "wv", "w_gate", "w_up")
_ROW_KEYS = ("wo", "w_down")


def quantize_params_tp(params: dict, cfg: llama.LlamaConfig, mesh: Mesh,
                       fmt: str = "nvfp4") -> dict:
    """Quantize dense llama params for tp-way tensor parallelism and place
    shards on the mesh."""
    tp = mesh.shape["tp"]

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    def put_q(layer: dict, shard: str) -> dict:
        wspec = P(None, "tp") if shard == "n" else P("tp", None)
        return {"words": put(layer["words"], wspec),
                "scales": put(layer["scales"], wspec),
                "gs": layer["gs"]}

    out = {
        "embed": put(params["embed"], P(None, None)),
        "final_norm": put(params["final_norm"], P(None)),
        "lm_head": {"w": put(params["lm_head"]["w"], P(None, "tp"))},
        "layers": [],
    }
    for lp in params["layers"]:
        q = {"attn_norm": put(lp["attn_norm"], P(None)),
             "mlp_norm": put(lp["mlp_norm"], P(None))}
        for name in _COL_KEYS:
            q[name] = put_q(quantize_linear_tp(
                np.asarray(lp[name]["w"], np.float32), tp, "n", fmt), "n")
        for name in _ROW_KEYS:
            q[name] = put_q(quantize_linear_tp(
                np.asarray(lp[name]["w"], np.float32), tp, "k", fmt), "k")
        out["layers"].append(q)
    return out


# ---------------------------------------------------------------------------
# TP forward (device-local Megatron block under shard_map)
# ---------------------------------------------------------------------------

def _local_mul(x: jax.Array, layer: dict, fmt: str) -> jax.Array:
    *lead, k = x.shape
    m = int(np.prod(lead))
    n = layer["words"].shape[1]
    mul = (gemm_mod.mul_nvfp4_a16 if fmt == "nvfp4"
           else gemm_mod.mul_mxfp4_a16)
    y = mul(x.reshape(m, k), layer["words"], layer["scales"], layer["gs"],
            m, n, k, -1)
    return y.reshape(*lead, n)


def make_tp_forward(cfg: llama.LlamaConfig, mesh: Mesh, fmt: str = "nvfp4"):
    """Build a jitted (qparams, tokens) -> logits TP+DP forward.

    Inside shard_map each device runs the fused FP4 kernels on its weight
    shard: attention heads and MLP hidden are column-sharded, wo/w_down are
    row-sharded, one psum per block restores replicated activations — the
    Megatron pattern with XLA collectives over ICI.
    """
    tp = mesh.shape["tp"]
    assert cfg.num_heads % tp == 0 and cfg.num_kv_heads % tp == 0

    def spec_for(path_leaf):
        return path_leaf  # placeholder; specs built explicitly below

    qspec_col = {"words": P(None, "tp"), "scales": P(None, "tp"), "gs": P()}
    qspec_row = {"words": P("tp", None), "scales": P("tp", None), "gs": P()}
    layer_spec = {
        "attn_norm": P(None), "mlp_norm": P(None),
        **{k: qspec_col for k in _COL_KEYS},
        **{k: qspec_row for k in _ROW_KEYS},
    }

    def params_spec(qparams):
        return {
            "embed": P(None, None),
            "final_norm": P(None),
            "lm_head": {"w": P(None, "tp")},
            "layers": [layer_spec for _ in qparams["layers"]],
        }

    def local_forward(qparams, tokens):
        B, T = tokens.shape
        nq, nkv, d = cfg.num_heads // tp, cfg.num_kv_heads // tp, cfg.head_dim
        x = qparams["embed"][tokens]
        pos = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
        mask = jnp.tril(jnp.ones((T, T), bool))[None, None]
        for lp in qparams["layers"]:
            h = llama.rms_norm(x, lp["attn_norm"], cfg.rms_eps)
            q = _local_mul(h, lp["wq"], fmt).reshape(B, T, nq, d)
            k = _local_mul(h, lp["wk"], fmt).reshape(B, T, nkv, d)
            v = _local_mul(h, lp["wv"], fmt).reshape(B, T, nkv, d)
            q = llama.rope(q, pos, cfg.rope_theta)
            k = llama.rope(k, pos, cfg.rope_theta)
            rep = nq // nkv
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
            qf = q.astype(jnp.float32) / np.sqrt(d)
            logits = jnp.einsum("bthd,bshd->bhts", qf, k.astype(jnp.float32))
            logits = jnp.where(mask, logits, -1e30)
            p = jax.nn.softmax(logits, axis=-1)
            o = jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))
            o = o.reshape(B, T, nq * d).astype(x.dtype)
            a = _local_mul(o, lp["wo"], fmt)          # row-parallel partial
            x = x + jax.lax.psum(a, "tp")
            h = llama.rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
            g = _local_mul(h, lp["w_gate"], fmt)
            u = _local_mul(h, lp["w_up"], fmt)
            hh = (jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u)
            dn = _local_mul(hh, lp["w_down"], fmt)    # row-parallel partial
            x = x + jax.lax.psum(dn, "tp")
        x = llama.rms_norm(x, qparams["final_norm"], cfg.rms_eps)
        logits_local = jnp.dot(x, qparams["lm_head"]["w"],
                               preferred_element_type=jnp.float32)
        logits = jax.lax.all_gather(logits_local, "tp", axis=2, tiled=True)
        return logits.astype(jnp.bfloat16)

    def fwd(qparams, tokens):
        fn = shard_map(
            local_forward, mesh=mesh,
            in_specs=(params_spec(qparams), P("dp", None)),
            out_specs=P("dp", None, None),
            check_rep=False,
        )
        return fn(qparams, tokens)

    return jax.jit(fwd)
