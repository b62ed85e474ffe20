"""Expert parallelism for quantized MoE blocks (Mesh axis "ep").

The reference has no distributed code (SURVEY.md §2.3); this is the
TPU-native expert-parallel layer for the Mixtral-style MoE path
(models/moe.py): the stacked per-expert quantized weights are sharded on
the expert axis, every device routes the full token set but computes only
its local experts' contributions through the fused FP4 kernels, and one
psum over "ep" combines them — the standard EP pattern with XLA
collectives over ICI instead of all-to-all dispatch (capacity-bucketed
gather keeps shapes static, which jit requires).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from ._compat import shard_map

from ..models import moe as moe_mod


def place_experts_ep(experts: dict, router_w, mesh: Mesh) -> tuple:
    """Shard stacked per-expert quantized tensors on the "ep" axis."""
    espec = {"words": P("ep", None, None), "scales": P("ep", None, None),
             "gs": P("ep")}

    def put(tree, spec):
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, spec)

    placed = {name: put(experts[name], espec) for name in experts}
    router = jax.device_put(jnp.asarray(router_w),
                            NamedSharding(mesh, P(None, None)))
    return placed, router


def make_moe_mlp_ep(moe_cfg, mesh: Mesh, *, fmt: str = "mxfp4",
                    interpret: bool = False):
    """Build a jitted expert-parallel MoE block: (x, router_w, experts) ->
    (T, H). x is replicated over "ep"; each shard evaluates its local
    experts with the global routing decision and psums the contributions.

    The per-shard compute reuses models/moe.py's capacity-bucketed expert
    loop with a shifted expert-id base, so EP and the single-device path
    share one implementation (and one set of numerics tests).
    """
    ep = mesh.shape["ep"]
    assert moe_cfg.num_experts % ep == 0
    e_local = moe_cfg.num_experts // ep

    espec = {"words": P("ep", None, None), "scales": P("ep", None, None),
             "gs": P("ep")}

    def local_block(x, router_w, experts):
        # global routing (replicated), local expert evaluation
        shard = jax.lax.axis_index("ep")
        local = moe_mod.moe_mlp_partial(
            x, router_w, experts,
            moe_cfg, expert_base=shard * e_local, num_local=e_local,
            fmt=fmt, interpret=interpret)
        return jax.lax.psum(local, "ep").astype(x.dtype)

    def fwd(x, router_w, experts):
        fn = shard_map(
            local_block, mesh=mesh,
            in_specs=(P(None, None), P(None, None),
                      {name: espec for name in experts}),
            out_specs=P(None, None),
            check_rep=False)
        return fn(x, router_w, experts)

    return jax.jit(fwd)
