"""FP4-vs-BF16 quality gate on a TRAINED model (not random init).

The reference's quality validation is MMLU on Llama-3.3-70B (BF16 82.15 vs
NVFP4 80.79, drop <= 1.4 — README.md:3). No large checkpoint is obtainable
in this environment, so this is the same protocol at the largest scale we
can build deterministically: train a small Llama on a key-value recall
task until it has real skill, then score multiple-choice accuracy through
models/eval.py for BF16 vs each FP4 format. A random-init model scores
~chance for every format (the delta measures nothing); a trained model
makes the delta a real accuracy gate.

Task: associative recall — the context lists fused key-value PAIR tokens,
then a query marker and a key token; the continuation must be that key's
value. Single-hop content addressing: a 2-layer model trains to 100%
held-out accuracy in ~2k steps (the two-hop split-pair variant does not
form its induction circuit at this scale — measured).

Usage: python tools/quality_gate.py [--steps 1500] [--fmt nvfp4,mxfp4]
Prints one JSON line {"bf16": acc, "nvfp4": acc, ..., "delta_max": d}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_KEYS = 16
N_VALS = 16
N_PAIRS = 6
# token map: 0 pad, 1 query marker, keys 2.., values .., pair tokens ..
KEY0 = 2
VAL0 = KEY0 + N_KEYS
PAIR0 = VAL0 + N_VALS
VOCAB = PAIR0 + N_KEYS * N_VALS


def make_batch(rng: np.random.Generator, batch: int):
    """(tokens (B, L), target ids (B,)) — predict the queried value."""
    L = N_PAIRS + 2
    toks = np.zeros((batch, L), np.int32)
    tgt = np.zeros(batch, np.int32)
    for b in range(batch):
        keys = rng.choice(N_KEYS, N_PAIRS, replace=False)
        vals = rng.integers(0, N_VALS, N_PAIRS)
        toks[b, :N_PAIRS] = PAIR0 + keys * N_VALS + vals
        qi = rng.integers(0, N_PAIRS)
        toks[b, N_PAIRS] = 1                      # query marker
        toks[b, N_PAIRS + 1] = KEY0 + keys[qi]
        tgt[b] = VAL0 + vals[qi]
    return toks, tgt


def train(steps: int = 2500, seed: int = 0, lr: float = 2e-3,
          hidden: int = 128):
    """Train the tiny model in f32; returns (cfg, params, final_acc)."""
    import jax
    import jax.numpy as jnp
    from petit_kernel_tpu.models import llama

    cfg = llama.LlamaConfig(
        vocab_size=VOCAB, hidden_size=hidden, intermediate_size=2 * hidden,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=hidden // 4,
        max_seq_len=32)
    params = llama.init_params(cfg, jax.random.PRNGKey(seed),
                               dtype=jnp.float32)

    def loss_fn(p, toks, tgt):
        logits, _ = llama.forward(p, toks, cfg)
        lp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), -1)
        return -jnp.take_along_axis(lp, tgt[:, None], -1).mean()

    # adam + cosine decay, hand-rolled (keeps the tool dependency-light)
    @jax.jit
    def step(p, m, v, t, toks, tgt):
        lr_t = lr * (0.5 * (1 + jnp.cos(jnp.pi * t / steps)) * 0.9 + 0.1)
        loss, g = jax.value_and_grad(loss_fn)(p, toks, tgt)
        m = jax.tree.map(lambda a, b: 0.9 * a + 0.1 * b, m, g)
        v = jax.tree.map(lambda a, b: 0.999 * a + 0.001 * (b * b), v, g)
        mh = jax.tree.map(lambda a: a / (1 - 0.9 ** t), m)
        vh = jax.tree.map(lambda a: a / (1 - 0.999 ** t), v)
        p = jax.tree.map(
            lambda a, b, c: a - lr_t * b / (jnp.sqrt(c) + 1e-8), p, mh, vh)
        return p, m, v, loss

    zeros = jax.tree.map(jnp.zeros_like, params)
    m, v = zeros, jax.tree.map(jnp.zeros_like, params)
    rng = np.random.default_rng(seed + 1)
    import jax.numpy as jnp2
    for t in range(1, steps + 1):
        toks, tgt = make_batch(rng, 96)
        params, m, v, loss = step(params, m, v, jnp2.float32(t),
                                  jnp2.asarray(toks), jnp2.asarray(tgt))
    # held-out accuracy of the trained f32 model
    toks, tgt = make_batch(np.random.default_rng(seed + 2), 256)
    import jax.numpy as jnp3
    logits, _ = llama.forward(params, jnp3.asarray(toks), cfg)
    acc = float((np.asarray(jnp3.argmax(logits[:, -1], -1)) == tgt).mean())
    return cfg, params, acc


def questions(rng: np.random.Generator, n: int):
    """Multiple-choice rows in the eval.py format: 4 value choices, all of
    which appear in the context (so recall, not frequency, decides)."""
    out = []
    while len(out) < n:
        toks, tgt = make_batch(rng, 1)
        ctx = [int(t) for t in toks[0]]
        vals_in_ctx = sorted({VAL0 + (ctx[i] - PAIR0) % N_VALS
                              for i in range(N_PAIRS)})
        if len(vals_in_ctx) < 4:
            continue
        correct = int(tgt[0])
        others = [v for v in vals_in_ctx if v != correct]
        rng.shuffle(others)
        choices = [correct] + others[:3]
        order = rng.permutation(4)
        choices = [choices[i] for i in order]
        out.append({"context": ctx, "choices": [[c] for c in choices],
                    "answer": int(list(order).index(0))})
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--fmts", default="nvfp4,mxfp4")
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--platform", default="cpu",
                    help="cpu (default: interpret-mode gate is CPU work) "
                         "or empty to keep the image default (axon TPU)")
    args = ap.parse_args()

    if args.platform:
        # the image sitecustomize pins jax_platforms via jax.config, which
        # outranks JAX_PLATFORMS — override through config (see conftest)
        import jax
        jax.config.update("jax_platforms", args.platform)

    from petit_kernel_tpu.models import eval as ev, llama

    cfg, params, train_acc = train(args.steps)
    print(f"# trained: held-out next-token acc {train_acc:.3f}",
          file=sys.stderr)
    qs = questions(np.random.default_rng(7), args.n)
    res = {}
    acc_bf16, _ = ev.score_multiple_choice(params, cfg, qs, fmt="bf16")
    res["bf16"] = acc_bf16
    for fmt in args.fmts.split(","):
        qp = llama.quantize_params(params, fmt)
        acc, _ = ev.score_multiple_choice(qp, cfg, qs, fmt=fmt,
                                          interpret=True)
        res[fmt] = acc
    res["delta_max"] = max(res["bf16"] - res[f]
                           for f in args.fmts.split(","))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
