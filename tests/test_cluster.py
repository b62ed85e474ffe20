"""Multi-host DP serving orchestration (models/cluster.py): routing,
balancing, TP replicas over disjoint meshes, and failure replay.

North-star config 5 ("continuous batching across >=2 hosts"): the DCN
tier is host-side request routing over per-host TP engines; here the
"hosts" are disjoint CPU-device slices in one process, which exercises
every router code path (admission, least-loaded choice, failure replay)
for real while DCN transport is simulated by host memory."""

import numpy as np
import jax
import pytest

from petit_kernel_tpu.models import cluster, llama, serving


@pytest.fixture(scope="module")
def setup():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _reqs(n=5, max_new=6):
    return [serving.Request(uid=i, tokens=np.arange(2 + i) % 50,
                            max_new_tokens=max_new) for i in range(n)]


def test_hybrid_mesh_axes():
    m = cluster.hybrid_mesh(2, 4)
    assert m.axis_names == ("dp", "tp")
    assert m.devices.shape == (2, 4)
    # row-major: one row = one simulated host's ICI domain
    ids = [[d.id for d in row] for row in m.devices]
    assert ids == [[0, 1, 2, 3], [4, 5, 6, 7]]
    with pytest.raises(ValueError):
        cluster.hybrid_mesh(4, 4)  # 16 > 8 devices


def test_replica_meshes_disjoint():
    ms = cluster.replica_meshes(2, 3)
    seen = set()
    for m in ms:
        assert m.devices.shape == (1, 2)
        ids = {d.id for d in m.devices.flat}
        assert not (ids & seen)
        seen |= ids


def test_cluster_matches_single_engine(setup):
    """Greedy requests produce identical tokens whether served by one
    engine or routed across two DP replicas."""
    cfg, params = setup
    want = serving.Engine(params, cfg, max_batch=8).run(_reqs())
    cl = cluster.Cluster([serving.Engine(params, cfg, max_batch=2),
                          serving.Engine(params, cfg, max_batch=2)])
    got = cl.run(_reqs())
    assert got == want
    assert not cl.failures and not cl.replayed


def test_cluster_balances_load(setup):
    """With more requests than one replica's capacity, both replicas get
    work (least-loaded admission)."""
    cfg, params = setup
    cl = cluster.Cluster([serving.Engine(params, cfg, max_batch=2),
                          serving.Engine(params, cfg, max_batch=2)])
    cl.submit(_reqs(4))
    cl.tick()
    used = {cl.assigned[u] for u in cl.assigned}
    assert used == {0, 1}
    while cl.tick():
        pass
    assert len(cl.finished) == 4


def test_cluster_decode_block(setup):
    """decode_block > 1 (multi-token per host round-trip) is token-exact
    with per-token routing."""
    cfg, params = setup
    want = serving.Engine(params, cfg, max_batch=8).run(_reqs())
    cl = cluster.Cluster([serving.Engine(params, cfg, max_batch=3),
                          serving.Engine(params, cfg, max_batch=3)])
    assert cl.run(_reqs(), decode_block=4) == want


def test_cluster_replica_failure_replays(setup):
    """A replica that dies mid-decode is detected, its in-flight requests
    are replayed from the prompt on the survivor, and outputs still match
    the single-engine oracle (greedy determinism)."""
    cfg, params = setup
    want = serving.Engine(params, cfg, max_batch=8).run(_reqs(4))

    bad = serving.Engine(params, cfg, max_batch=2)
    ticks = {"n": 0}
    orig_step = bad.step

    def flaky_step():
        ticks["n"] += 1
        if ticks["n"] >= 3:
            raise RuntimeError("injected device loss")
        return orig_step()

    bad.step = flaky_step
    cl = cluster.Cluster([bad, serving.Engine(params, cfg, max_batch=2)])
    got = cl.run(_reqs(4))
    assert got == want
    assert cl.failures and cl.failures[0][0] == 0
    assert cl.replayed  # the dead replica had in-flight work
    assert cl.alive == [False, True]


def test_cluster_all_dead_raises(setup):
    cfg, params = setup
    bad = serving.Engine(params, cfg, max_batch=2)
    bad.step = lambda: (_ for _ in ()).throw(RuntimeError("gone"))
    cl = cluster.Cluster([bad])
    with pytest.raises(cluster.ReplicaFailed):
        cl.run(_reqs(1))


def test_cluster_tp_replicas_match_single(setup):
    """dp=2 DP replicas, each a tp=2 TP engine over its own disjoint
    2-device mesh (the real multi-host shape, simulated): first tokens
    match the single-device engine (same contract as the TP engine test —
    greedy chains may diverge later on quantization-noise ties)."""
    cfg, params = setup
    qparams = llama.quantize_params(params, "nvfp4", fuse=False)
    want = serving.Engine(qparams, cfg, max_batch=8, fmt="nvfp4",
                          interpret=True).run(_reqs(4))
    cl = cluster.make_tp_cluster(params, cfg, dp=2, tp=2, max_batch=2)
    got = cl.run(_reqs(4))
    assert set(got) == set(want)
    for uid in want:
        assert got[uid][:2] == want[uid][:2], (uid, got[uid], want[uid])
