#!/usr/bin/env python
"""Pinpoint WHERE the headed-fp8 kv_append differs from the jnp reference
on hardware (tools/kvapp_probe.py found tokens_equal=True but
cache_equal=False for headed-fp8 only).

Tests the kernel DIRECTLY (no model): a recognizable cache pattern, one
append per position p in a sweep, compare byte-level against the masked
dynamic_update_slice reference, print every mismatching (b, h, s, d0)
coordinate summary. Distinguishes:
  - wrong-position writes (pairing permutation in the u32 splice)
  - clobbered neighbors (RMW of the 8-position block)
  - unvisited-region corruption (aliasing)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from petit_kernel_tpu.ops.kernels.attention import kv_append
from tools.kvapp_probe import jnp_append


def run_case(B, Hkv, S, d, dtype, pos_list, mask=None):
    key = jax.random.PRNGKey(0)
    ck0 = jax.random.normal(key, (B, Hkv, S, d), jnp.float32).astype(dtype)
    cv0 = (jax.random.normal(jax.random.PRNGKey(1), (B, Hkv, S, d),
                             jnp.float32) * 2.0).astype(dtype)
    k_new = jax.random.normal(jax.random.PRNGKey(2), (B, Hkv, d),
                              jnp.bfloat16)
    v_new = jax.random.normal(jax.random.PRNGKey(3), (B, Hkv, d),
                              jnp.bfloat16)

    app = jax.jit(lambda ck, cv, p, m: kv_append(
        ck, cv, k_new, v_new, p, m, headed=True))
    ref = jax.jit(lambda ck, cv, p, m: jnp_append(
        ck, cv, k_new, v_new, p, m, headed=True))

    bad = 0
    for pos0 in pos_list:
        pos = jnp.asarray(np.full(B, pos0, np.int32) + np.arange(B))
        m = (jnp.ones((B,), bool) if mask is None else jnp.asarray(mask))
        ck_k, cv_k = app(jnp.array(ck0), jnp.array(cv0), pos, m)
        ck_j, cv_j = ref(jnp.array(ck0), jnp.array(cv0), pos, m)
        for name, a, b_ in (("K", ck_k, ck_j), ("V", cv_k, cv_j)):
            ab = np.asarray(a).view(np.uint8).reshape(B, Hkv, S, -1)
            bb = np.asarray(b_).view(np.uint8).reshape(B, Hkv, S, -1)
            if np.array_equal(ab, bb):
                continue
            bad += 1
            wh = np.argwhere((ab != bb).any(-1))
            ss = sorted(set((int(b), int(s)) for b, h, s in wh))
            print(f"# pos0={pos0} {name}: {len(wh)} mismatching (b,h,s) "
                  f"rows; (b,s) set={ss[:12]}"
                  f" expect (b, pos0+b)={[ (b, pos0+b) for b in range(B)]}",
                  flush=True)
            b0, h0, s0 = (int(x) for x in wh[0])
            print(f"#   sample row b={b0} h={h0} s={s0}: "
                  f"kernel={ab[b0, h0, s0, :8].tolist()} "
                  f"ref={bb[b0, h0, s0, :8].tolist()}", flush=True)
    return bad


def main():
    cases = [
        ("fp8 d=128 S=256", dict(B=4, Hkv=2, S=256, d=128,
                                 dtype=jnp.float8_e4m3fn,
                                 pos_list=[0, 1, 2, 3, 4, 5, 6, 7,
                                           8, 12, 63, 100, 247])),
        ("fp8 masked", dict(B=4, Hkv=2, S=256, d=128,
                            dtype=jnp.float8_e4m3fn, pos_list=[4, 9],
                            mask=np.array([True, False, True, False]))),
        ("bf16 headed", dict(B=4, Hkv=2, S=256, d=128, dtype=jnp.bfloat16,
                             pos_list=[0, 3, 7, 8, 100])),
    ]
    total = 0
    for name, kw in cases:
        print(f"## case {name}", flush=True)
        total += run_case(**kw)
    print({"kvapp_diff_bad_cases": total})
    sys.exit(0 if total == 0 else 1)


if __name__ == "__main__":
    main()
