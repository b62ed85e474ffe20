"""GPipe-style pipeline parallelism for the Llama stack (Mesh axis "pp").

The reference has no distributed layer; the north star needs the full
parallelism menu over pod slices. This is the TPU-native inference pipeline:
layers are stacked and stage-sharded on "pp", microbatches flow through the
stages with `lax.ppermute` over ICI, and the classic GPipe schedule
(n_micro + n_stages - 1 ticks) is a `lax.fori_loop` — compiler-friendly
static shapes, no host round trips.

Every stage executes its layer scan each tick (inactive ticks compute on
zeros and are masked); that is the standard trade for a single fused jit
program, and the bubble fraction (S-1)/(n_micro+S-1) matches GPipe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from ._compat import shard_map

from ..models import llama


def stack_layers(layers: list) -> dict:
    """List of per-layer param dicts -> one pytree with leading layer axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def place_params_pp(params: dict, mesh: Mesh) -> dict:
    """Stage-shard stacked layers on "pp"; embed/norm/head replicated."""
    stacked = stack_layers(params["layers"])

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return {
        "embed": put(params["embed"], P(None, None)),
        "final_norm": put(params["final_norm"], P(None)),
        "lm_head": jax.tree.map(lambda x: put(x, P(None, None)),
                                params["lm_head"]),
        "layers": jax.tree.map(
            lambda x: put(x, P("pp", *(None,) * (x.ndim - 1))), stacked),
    }


def _layer_forward(x, lp, cfg, pos, mask, fmt, interpret):
    h = llama.rms_norm(x, lp["attn_norm"], cfg.rms_eps)
    a, _ = llama.attention(h, lp, None, pos, cfg, mask,
                           fmt=fmt, interpret=interpret)
    x = x + a
    h = llama.rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
    return x + llama.mlp(h, lp, fmt=fmt, interpret=interpret)


def make_pp_forward(cfg: llama.LlamaConfig, mesh: Mesh, n_micro: int,
                    *, fmt: str = "bf16", interpret: bool = False):
    """Build a jitted pipelined (params_pp, tokens) -> logits forward.

    tokens (B, T) with B % n_micro == 0; microbatches of B/n_micro
    sequences stream through the pp stages.
    """
    S = mesh.shape["pp"]
    assert cfg.num_layers % S == 0

    def local(tokens, embed, stacked_local, final_norm, lm_head_w):
        s = jax.lax.axis_index("pp")
        B, T = tokens.shape
        H = cfg.hidden_size
        mb = B // n_micro
        pos = jnp.broadcast_to(jnp.arange(T)[None, :], (mb, T))
        mask = jnp.tril(jnp.ones((T, T), bool))[None, None]

        # every stage holds the token stream (replicated input) and embeds
        # its own injections — cheaper than shipping stage-0 activations
        h_in = embed[tokens].reshape(n_micro, mb, T, H)

        def run_stage(x):
            def body(h, lp):
                return _layer_forward(h, lp, cfg, pos, mask, fmt,
                                      interpret), None
            h, _ = jax.lax.scan(body, x, stacked_local)
            return h

        def tick(t, carry):
            buf, acc = carry
            m = t - s                       # microbatch index at this stage
            active = jnp.logical_and(m >= 0, m < n_micro)
            m_c = jnp.clip(m, 0, n_micro - 1)
            x_in = jnp.where(s == 0, h_in[m_c], buf)
            y = run_stage(x_in)
            y = jnp.where(active, y, jnp.zeros_like(y))
            is_last = s == S - 1
            acc = jax.lax.dynamic_update_index_in_dim(
                acc, jnp.where(jnp.logical_and(is_last, active), y,
                               acc[m_c]), m_c, 0)
            buf = jax.lax.ppermute(
                y, "pp", [(i, (i + 1) % S) for i in range(S)])
            return buf, acc

        buf0 = jnp.zeros((mb, T, H), h_in.dtype)
        acc0 = jnp.zeros((n_micro, mb, T, H), h_in.dtype)
        _, acc = jax.lax.fori_loop(0, n_micro + S - 1, tick, (buf0, acc0))
        # only the last stage holds real outputs; zero elsewhere -> psum
        acc = jnp.where(s == S - 1, acc, jnp.zeros_like(acc))
        acc = jax.lax.psum(acc, "pp")
        x = llama.rms_norm(acc.reshape(B, T, H), final_norm, cfg.rms_eps)
        return jnp.dot(x, lm_head_w,
                       preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)

    def fwd(params_pp, tokens):
        layer_specs = jax.tree.map(
            lambda x: P("pp", *(None,) * (x.ndim - 1)),
            params_pp["layers"])
        fn = shard_map(
            local, mesh=mesh,
            in_specs=(P(None, None), P(None, None), layer_specs,
                      P(None), P(None, None)),
            out_specs=P(None, None, None),
            check_rep=False)
        return fn(tokens, params_pp["embed"], params_pp["layers"],
                  params_pp["final_norm"], params_pp["lm_head"]["w"])

    return jax.jit(fwd)
