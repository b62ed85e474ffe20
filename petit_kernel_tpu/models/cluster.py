"""Multi-host data-parallel serving orchestration (the DCN tier).

The reference delegates multi-GPU serving to SGLang's router above the
library (README.md:3,21); the north star (BASELINE.json config 5) requires
continuous batching "across >=2 hosts". TPU-native design per SURVEY.md
§2.3/§5: tensor parallelism rides ICI *inside* a host (parallel/tp.py),
while data parallelism across hosts exchanges only requests and finished
tokens — host-side Python over DCN, never device collectives. So the
cross-host tier is an orchestration problem, not a kernel problem, and
this module is deliberately framework code:

  - ``hybrid_mesh``: the (dp, tp) device mesh with dp as the outermost
    (DCN) axis — ``mesh_utils.create_hybrid_device_mesh`` on real
    multi-host deployments, a plain reshape in single-process simulation.
  - ``replica_meshes`` / ``make_tp_cluster``: partition local devices into
    disjoint per-replica TP meshes (one "host" each in simulation; on real
    multi-host each process builds exactly one replica from its
    ``jax.local_devices()``).
  - ``Cluster``: least-loaded request router over N engine replicas with
    failure detection — a replica whose step raises is marked dead and its
    in-flight requests are replayed from the prompt on the survivors
    (decode state is not migrated; KV caches are device-resident and
    replay is the honest recovery on a slot-based engine).

Determinism: greedy requests produce identical tokens whichever replica
serves them (same params, same program), so routing is free to be purely
load-based.
"""

from __future__ import annotations

from collections import deque
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from . import llama, serving


def hybrid_mesh(dp: int, tp: int, devices=None) -> Mesh:
    """Build the (dp, tp) mesh with dp crossing DCN and tp riding ICI.

    On a real multi-host platform (process_count > 1) this delegates to
    ``mesh_utils.create_hybrid_device_mesh`` — per-host ICI mesh shape
    (1, tp), DCN shape (dp, 1) — which orders devices so the dp axis maps
    to the slow inter-host links and tp stays on intra-host ICI. In
    single-process simulation it reshapes ``devices`` row-major, which
    preserves the same adjacency contract (consecutive devices = one
    host's ICI domain).
    """
    if devices is None:
        devices = jax.devices()
    if jax.process_count() > 1:
        from jax.experimental import mesh_utils
        arr = mesh_utils.create_hybrid_device_mesh(
            (1, tp), (dp, 1), devices=devices)
    else:
        if dp * tp > len(devices):
            raise ValueError(f"dp*tp={dp * tp} > {len(devices)} devices")
        arr = np.array(devices[:dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def replica_meshes(tp: int, n: int, devices=None) -> list[Mesh]:
    """Partition local devices into ``n`` disjoint (dp=1, tp) meshes —
    one per DP replica. In simulation each slice stands for one host's
    ICI domain; on real multi-host each process calls this with n=1 over
    ``jax.local_devices()``."""
    if devices is None:
        devices = jax.devices()
    if n * tp > len(devices):
        raise ValueError(f"need {n * tp} devices, have {len(devices)}")
    return [Mesh(np.array(devices[i * tp:(i + 1) * tp]).reshape(1, tp),
                 ("dp", "tp")) for i in range(n)]


def make_tp_cluster(params, cfg: llama.LlamaConfig, *, dp: int, tp: int,
                    fmt: str = "nvfp4", max_batch: int = 4,
                    devices=None) -> "Cluster":
    """dp TP-engine replicas over disjoint local device slices.

    This is the single-process form of the deployment recipe: on a real
    multi-host slice, each host runs ``dp=1`` of this (its own engine over
    its local ICI mesh) and a front-end process runs the ``Cluster``
    router over RPC stubs; here the replicas are in-process so the router
    logic (admission, balancing, failure replay) is exercised for real
    while DCN is simulated by host memory.
    """
    from .. import parallel as par
    from ..parallel import tp as tp_mod

    replicas = []
    for mesh in replica_meshes(tp, dp, devices):
        qtp = par.quantize_params_tp(params, cfg, mesh, fmt=fmt)
        step = tp_mod.make_tp_step(cfg, mesh, fmt=fmt)
        cache = tp_mod.init_cache_tp(cfg, max_batch, mesh)
        replicas.append(serving.Engine(qtp, cfg, max_batch=max_batch,
                                       forward_fn=step, cache=cache))
    return Cluster(replicas)


class ReplicaFailed(RuntimeError):
    """Raised internally when a replica's step raises; carried in
    ``Cluster.failures`` for observability."""


class Cluster:
    """Least-loaded router + failure replay over engine replicas.

    Engines are ordinary ``serving.Engine`` (or Paged/Spec) instances —
    anything with add_request/has_capacity/step/step_block/finished.
    """

    def __init__(self, replicas: list):
        if not replicas:
            raise ValueError("Cluster needs >= 1 replica")
        self.replicas = list(replicas)
        self.alive = [True] * len(replicas)
        self.pending: deque = deque()
        self.assigned: dict[int, int] = {}      # uid -> replica index
        self._req: dict[int, serving.Request] = {}   # uid -> request
        self.finished: dict[int, list[int]] = {}
        self.failures: list[tuple[int, str]] = []    # (replica, why)
        self.replayed: list[int] = []                # uids replayed

    # -- load accounting ---------------------------------------------------
    def load(self, i: int) -> int:
        eng = self.replicas[i]
        return int(eng.active.sum()) + len(eng._pf)

    def _pick_replica(self) -> Optional[int]:
        best, best_load = None, None
        for i, eng in enumerate(self.replicas):
            if not self.alive[i] or not eng.has_capacity():
                continue
            ld = self.load(i)
            if best_load is None or ld < best_load:
                best, best_load = i, ld
        return best

    # -- request flow ------------------------------------------------------
    def submit(self, requests: list[serving.Request]) -> None:
        for r in requests:
            if r.uid in self._req:
                raise ValueError(f"duplicate uid {r.uid}")
            self._req[r.uid] = r
            self.pending.append(r.uid)

    def _admit(self) -> None:
        while self.pending:
            i = self._pick_replica()
            if i is None:
                return
            uid = self.pending.popleft()
            self.replicas[i].add_request(self._req[uid])
            self.assigned[uid] = i

    def _collect(self, i: int) -> None:
        eng = self.replicas[i]
        for uid in list(eng.finished):
            self.finished[uid] = eng.finished.pop(uid)
            self.assigned.pop(uid, None)

    def _fail(self, i: int, why: str) -> None:
        """Mark replica dead; replay its in-flight requests elsewhere.

        Decode state (KV cache) lives on the dead replica's devices, so
        recovery restarts generation from the prompt — duplicated work,
        surfaced via ``replayed`` so operators can account for it."""
        self.alive[i] = False
        self.failures.append((i, why))
        for uid, rep in list(self.assigned.items()):
            if rep == i:
                del self.assigned[uid]
                self.replayed.append(uid)
                self.pending.appendleft(uid)
        if not any(self.alive):
            raise ReplicaFailed(f"all replicas dead (last: {why})")

    def tick(self, decode_block: int = 1) -> int:
        """One cluster round: admit pending, tick every live replica
        (decode_block > 1 => multi-token blocks per host round-trip),
        collect finishes. Returns outstanding work count."""
        self._admit()
        for i, eng in enumerate(self.replicas):
            if not self.alive[i]:
                continue
            if not (eng.active.any() or eng._pf):
                continue
            try:
                if decode_block > 1 and not eng._pf:
                    eng.step_block(decode_block)
                else:
                    eng.step()
            except Exception as e:  # failure detection: requeue + continue
                self._fail(i, repr(e))
                continue
            self._collect(i)
        return len(self.pending) + len(self.assigned)

    def run(self, requests: list[serving.Request],
            decode_block: int = 1) -> dict[int, list[int]]:
        self.submit(requests)
        while self.tick(decode_block):
            pass
        return dict(self.finished)
