"""shard_map version compat: jax >= 0.8 moved it out of experimental and
renamed check_rep -> check_vma."""

from __future__ import annotations

try:
    from jax import shard_map as _shard_map_fn  # jax >= 0.8
    _CHECK_KW = "check_vma"
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map_fn
    _CHECK_KW = "check_rep"


def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
    return _shard_map_fn(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, **{_CHECK_KW: check_rep})
