"""Tensor-parallel FP4 forward on a virtual 8-device CPU mesh vs the
single-device path. The multi-chip analog of the reference's (absent)
distributed layer — validates the per-shard repack + Megatron shard_map
design (parallel/tp.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from petit_kernel_tpu.models import llama
from petit_kernel_tpu import parallel as par
from petit_kernel_tpu.ops import gemm as gemm_mod
from petit_kernel_tpu.ops import layout as layout_mod
from petit_kernel_tpu.numerics import reference as refn

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _mesh(dp, tp):
    devs = np.array(jax.devices()[:dp * tp]).reshape(dp, tp)
    return Mesh(devs, ("dp", "tp"))


def test_quantize_linear_tp_kshard_matches_concat():
    """Per-shard k repack must dequantize to the same matrix as slicing the
    dense weight."""
    rng = np.random.default_rng(0)
    k, n, tp = 512, 64, 4
    w = rng.standard_normal((k, n)).astype(np.float32)
    layer = par.quantize_linear_tp(w, tp, "k", "nvfp4")
    ks = k // tp
    ksp = layout_mod.padded_k(ks)
    words = np.asarray(layer["words"])
    scales = np.asarray(layer["scales"])
    gs = float(layer["gs"])
    for t in range(tp):
        wt = words[t * ksp // 8:(t + 1) * ksp // 8]
        st = scales[t * ksp // 16:(t + 1) * ksp // 16]
        deq = layout_mod.dequant_from_tpu_layout(wt, st, n, ks,
                                                 group_size=16) * gs
        ref = w[t * ks:(t + 1) * ks]
        # FP4 quantization error bounded by one scale step
        assert np.abs(deq - ref).max() < np.abs(ref).max() * 0.25


def test_tp_forward_matches_single_device():
    cfg = llama.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=16, num_kv_heads=4, head_dim=32,
        max_seq_len=64)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    mesh = _mesh(2, 4)
    qparams = par.quantize_params_tp(params, cfg, mesh, fmt="nvfp4")
    fwd = par.make_tp_forward(cfg, mesh, fmt="nvfp4")
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0,
                                cfg.vocab_size)
    logits_tp = np.asarray(fwd(qparams, tokens), np.float32)
    assert logits_tp.shape == (4, 8, cfg.vocab_size)

    # single-device oracle: same quantization math, unsharded layers.
    # column layers share quantization exactly; row layers are quantized
    # per k-shard in TP, so compare against a dense model rebuilt from the
    # EXACT TP dequants to isolate sharding correctness from quant noise.
    dparams = {"embed": params["embed"], "final_norm": params["final_norm"],
               "lm_head": params["lm_head"], "layers": []}
    h, q = cfg.hidden_size, cfg.num_heads * cfg.head_dim
    kv, f = cfg.num_kv_heads * cfg.head_dim, cfg.intermediate_size
    dims = {"wq": (h, q), "wk": (h, kv), "wv": (h, kv), "wo": (q, h),
            "w_gate": (h, f), "w_up": (h, f), "w_down": (f, h)}
    for lp, dense_lp in zip(qparams["layers"], params["layers"]):
        d = {"attn_norm": lp["attn_norm"], "mlp_norm": lp["mlp_norm"]}
        for name, (kk, nn) in dims.items():
            layer = lp[name]
            if name in ("wo", "w_down"):
                # row-sharded: per-shard repack, each shard k-padded
                tp = mesh.shape["tp"]
                ks = kk // tp
                ksp = layout_mod.padded_k(ks)
                words = np.asarray(layer["words"])
                scales = np.asarray(layer["scales"])
                parts = [layout_mod.dequant_from_tpu_layout(
                    words[t * ksp // 8:(t + 1) * ksp // 8],
                    scales[t * ksp // 16:(t + 1) * ksp // 16],
                    nn, ks, group_size=16) for t in range(tp)]
                deq = np.concatenate(parts, axis=0)
            else:
                deq = layout_mod.dequant_from_tpu_layout(
                    np.asarray(layer["words"]), np.asarray(layer["scales"]),
                    nn, kk, group_size=16)
            d[name] = {"w": jnp.asarray(deq * float(layer["gs"]),
                                        jnp.bfloat16)}
        dparams["layers"].append(d)
    logits_ref, _ = llama.forward(dparams, tokens, cfg)
    logits_ref = np.asarray(logits_ref, np.float32)
    np.testing.assert_allclose(logits_tp, logits_ref, rtol=0.06, atol=0.06)
    agree = (logits_tp.argmax(-1) == logits_ref.argmax(-1)).mean()
    assert agree >= 0.95, agree


def test_mul_fp4_tp_rs_matches_psum_path():
    """k-sharded fused GEMM with the reduce-scatter epilogue (SURVEY §2.3)
    == the psum epilogue, up to reduction ordering."""
    from petit_kernel_tpu.parallel import tp as tp_mod
    from petit_kernel_tpu.parallel._compat import shard_map

    rng = np.random.default_rng(5)
    m, k, n, tp = 8, 512, 256, 4
    w = rng.standard_normal((k, n)).astype(np.float32) / 8
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    mesh = _mesh(1, tp)
    layer = par.quantize_linear_tp(w, tp, "k", "nvfp4")
    ks = k // tp

    y_rs = tp_mod.mul_fp4_tp_rs(a, layer, mesh, k, fmt="nvfp4")
    assert y_rs.shape == (m, n)

    def local_psum(a_l, words_l, scales_l, gs):
        y = gemm_mod.mul_nvfp4_a16(a_l, words_l, scales_l, gs, m, n, ks, -1)
        return jax.lax.psum(y, "tp")

    y_psum = shard_map(
        local_psum, mesh=mesh,
        in_specs=(P(None, "tp"), P("tp", None), P("tp", None), P()),
        out_specs=P(None, None), check_rep=False)(
            a, layer["words"], layer["scales"], layer["gs"])
    np.testing.assert_allclose(np.asarray(y_rs, np.float32),
                               np.asarray(y_psum, np.float32),
                               rtol=0.02, atol=0.02)


def test_tp_forward_sp_matches_psum_forward():
    """The Megatron-SP forward (token-sharded residual stream,
    reduce-scatter epilogues + all-gather prologues) must agree with the
    plain psum TP forward — same math, different collective structure."""
    cfg = llama.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=16, num_kv_heads=4, head_dim=32,
        max_seq_len=64)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    mesh = _mesh(2, 4)
    qparams = par.quantize_params_tp(params, cfg, mesh, fmt="nvfp4")
    fwd = par.make_tp_forward(cfg, mesh, fmt="nvfp4")
    from petit_kernel_tpu.parallel import tp as tp_mod
    fwd_sp = tp_mod.make_tp_forward_sp(cfg, mesh, fmt="nvfp4")
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0,
                                cfg.vocab_size)
    want = np.asarray(fwd(qparams, tokens), np.float32)
    got = np.asarray(fwd_sp(qparams, tokens), np.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree >= 0.95, agree


def test_dense_param_sharding_train_step():
    """GSPMD path: dense model trains one step under TP+DP shardings."""
    cfg = llama.LlamaConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_layers=1, num_heads=8, num_kv_heads=4, head_dim=16,
        max_seq_len=32)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    mesh = _mesh(2, 4)
    params_sh = par.shard_dense_params(params, mesh)
    tokens = jnp.zeros((4, 16), jnp.int32)

    def loss_fn(p, toks):
        logits, _ = llama.forward(p, toks[:, :-1], cfg)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, toks[:, 1:][..., None], -1)
        return nll.mean()

    with mesh:
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params_sh, tokens)
        jax.block_until_ready(loss)
    assert np.isfinite(float(loss))


def test_moe_expert_parallel_matches_single_device():
    """EP-sharded MoE block == single-device MoE block (8 experts / 4-way
    ep x 2-way dp-unused mesh on the virtual CPU devices)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh
    from petit_kernel_tpu.models import moe
    from petit_kernel_tpu.parallel import ep as ep_mod

    rng = np.random.default_rng(3)
    T, H, F, E = 16, 128, 256, 8
    mcfg = moe.MoEConfig(num_experts=E, top_k=2, capacity_factor=2.0)
    x = jnp.asarray(rng.standard_normal((T, H)), jnp.bfloat16)
    router_w = jnp.asarray(rng.standard_normal((H, E)) * 0.1, jnp.float32)
    experts = {
        "w_gate": moe.quantize_moe_linear(
            rng.standard_normal((E, H, F)) / 8, "mxfp4"),
        "w_up": moe.quantize_moe_linear(
            rng.standard_normal((E, H, F)) / 8, "mxfp4"),
        "w_down": moe.quantize_moe_linear(
            rng.standard_normal((E, F, H)) / 8, "mxfp4"),
    }
    want = moe.moe_mlp(x, router_w, experts, mcfg, fmt="mxfp4",
                       interpret=True)

    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("dp", "ep"))
    placed, router = ep_mod.place_experts_ep(experts, router_w, mesh)
    fwd = ep_mod.make_moe_mlp_ep(mcfg, mesh, fmt="mxfp4", interpret=True)
    got = fwd(x, router, placed)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("fmt", ["bf16", "nvfp4"])
def test_pipeline_parallel_matches_single_device(fmt):
    """GPipe pp=4 forward == unsharded llama.forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh
    from petit_kernel_tpu.models import llama
    from petit_kernel_tpu.parallel import pp as pp_mod

    cfg = llama.LlamaConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_layers=4, num_heads=4, num_kv_heads=2, head_dim=32,
        max_seq_len=32)
    params = llama.init_params(cfg, jax.random.PRNGKey(1))
    if fmt == "nvfp4":
        params = llama.quantize_params(params, "nvfp4")
    tokens = jax.random.randint(jax.random.PRNGKey(2), (4, 8), 0,
                                cfg.vocab_size)
    want, _ = llama.forward(params, tokens, cfg, fmt=fmt, interpret=True)

    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("dp", "pp"))
    params_pp = pp_mod.place_params_pp(params, mesh)
    fwd = pp_mod.make_pp_forward(cfg, mesh, n_micro=2, fmt=fmt,
                                 interpret=True)
    got = fwd(params_pp, tokens)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_pp_decode_matches_single_device():
    """Pipelined DECODE (make_pp_step, stage-local KV caches): greedy
    generation token-for-token equal to single-device greedy_decode —
    PP can now serve, not just run prefill-style forwards (round-2
    verdict item 4/8)."""
    from jax.sharding import Mesh
    from petit_kernel_tpu.parallel import pp as pp_mod

    cfg = llama.LlamaConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_layers=4, num_heads=4, num_kv_heads=2, head_dim=32,
        max_seq_len=32)
    params = llama.init_params(cfg, jax.random.PRNGKey(1))
    B, T0, n_new = 4, 6, 5
    prompt = jax.random.randint(jax.random.PRNGKey(3), (B, T0), 0,
                                cfg.vocab_size)
    want = np.asarray(llama.greedy_decode(params, cfg, prompt, n_new,
                                          fmt="bf16", interpret=True))

    devices = np.array(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devices, ("pp",))
    params_pp = pp_mod.place_params_pp(params, mesh)
    step = pp_mod.make_pp_step(cfg, mesh, n_micro=2, fmt="bf16",
                               interpret=True)
    cache = pp_mod.init_cache_pp(cfg, B, mesh)
    # teacher-force the prompt through the decode step, then generate
    for t in range(T0):
        logits, cache = step(params_pp, cache, prompt[:, t],
                             jnp.full((B,), t, jnp.int32))
    toks = [jnp.argmax(logits, -1).astype(jnp.int32)]
    for t in range(n_new - 1):
        logits, cache = step(params_pp, cache, toks[-1],
                             jnp.full((B,), T0 + t, jnp.int32))
        toks.append(jnp.argmax(logits, -1).astype(jnp.int32))
    got = np.stack([np.asarray(t) for t in toks], axis=1)
    np.testing.assert_array_equal(got, want)


def test_ep_engine_serving_matches_single_device():
    """Continuous batching over expert-parallel MoE: the engine with
    make_ep_step (experts sharded on a 4-way "ep" mesh, attention
    replicated) emits the same tokens as the single-device MoE engine."""
    from jax.sharding import Mesh
    from petit_kernel_tpu.models import moe, serving
    from petit_kernel_tpu.parallel import ep as ep_mod

    cfg = moe.MixtralConfig.tiny()
    params = moe.init_params(cfg, jax.random.PRNGKey(0))
    qparams = moe.quantize_params(params, cfg, fmt="mxfp4")
    reqs = lambda: [serving.Request(uid=i,
                                    tokens=np.arange(3 + i) % 50,
                                    max_new_tokens=5) for i in range(2)]

    fwd = moe.make_engine_forward(cfg, interpret=True)
    want = serving.Engine(qparams, cfg, max_batch=2,
                          forward_fn=fwd).run(reqs())

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("ep",))
    qep = ep_mod.quantize_params_ep(params, cfg, mesh, moe_fmt="mxfp4")
    step = ep_mod.make_ep_step(cfg, mesh, interpret=True)
    eng = serving.Engine(qep, cfg, max_batch=2, forward_fn=step)
    got = eng.run(reqs())
    assert set(got) == set(want)
    for uid in want:
        assert got[uid][:2] == want[uid][:2], (uid, got, want)


def test_quantize_linear_tp_nvfp4p2z_zero_free_shards():
    """k-sharded p2z TP layer: every shard honors the zero-free contract
    (no stored-zero codes) and the sharded fused GEMM matches the host
    oracle on the concatenated dequant."""
    from petit_kernel_tpu.parallel import tp as tp_mod
    from petit_kernel_tpu.numerics import reference as refn

    rng = np.random.default_rng(9)
    m, k, n, tp = 8, 512, 256, 4
    w = rng.standard_normal((k, n)).astype(np.float32) / 8
    w[:32, 3] = 0.0  # zero-heavy column must stay zero-free per shard
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    mesh = _mesh(1, tp)
    layer = par.quantize_linear_tp(w, tp, "k", "nvfp4p2z")
    ks = k // tp

    # zero-free invariant on the LOGICAL region of every shard (padded-k
    # rows legitimately hold zero words; the kernel kills them via zero
    # A-padding + 2^-126 pad scales)
    words = np.asarray(layer["words"])
    rows = words.shape[0] // tp
    for t in range(tp):
        nib = layout_mod.unpack_fp4_weights(
            words[t * rows:(t + 1) * rows], n, ks)
        assert not ((nib == 0) | (nib == 8)).any()

    y = tp_mod.mul_fp4_tp_rs(a, layer, mesh, k, fmt="nvfp4p2z")
    assert y.shape == (m, n)
    # host oracle: dequant each shard, concat, dense matmul
    scales = np.asarray(layer["scales"])
    wrows, srows = words.shape[0] // tp, scales.shape[0] // tp
    deq = np.concatenate(
        [np.asarray(layout_mod.dequant_from_tpu_layout(
            words[t * wrows:(t + 1) * wrows],
            scales[t * srows:(t + 1) * srows],
            n, ks, group_size=16), np.float32)
         for t in range(tp)], axis=0) * float(layer["gs"])
    ref = np.asarray(a, np.float32) @ deq
    np.testing.assert_allclose(np.asarray(y, np.float32), ref,
                               rtol=0.02, atol=0.02)
