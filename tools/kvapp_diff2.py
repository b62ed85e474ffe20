#!/usr/bin/env python
"""One-dispatch hardware localizer for the headed kv_append mismatch.

tools/kvapp_probe.py (r4) found headed-fp8 kv_append produces cache bytes
that differ from the jnp reference on v5e (tokens equal, cache not);
tools/kvapp_diff.py swept positions across ~80 relay dispatches and never
finished a 9-minute window. This version sweeps ALL positions in ONE
kernel call (the position axis is the batch axis: B=16 slots, one probe
position each), reads the caches back once, and does the byte forensics
host-side (arrays are ~0.5 MB).

Hypothesis under test (round 5): the headed cache block is (1,1,8,d) but
the fp8 Mosaic tile is (32,128) sublanes x lanes (bf16: (16,128)), so an
8-row block at a non-tile-aligned S offset is a partial-tile RMW that
interpret mode cannot see. Expected signature if true: mismatches in the
tile-neighbor rows of the written position, not the written row itself.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from petit_kernel_tpu.ops.kernels.attention import kv_append
from tools.kvapp_probe import jnp_append

POS = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 12, 31, 32, 63, 100, 247, 255],
               np.int32)
MASK = np.ones(16, bool)
MASK[5] = False          # one masked row: must keep its cache bytes


def run_case(name, dtype, Hkv=2, S=256, d=128):
    B = len(POS)
    key = jax.random.PRNGKey(0)
    ck0 = jax.random.normal(key, (B, Hkv, S, d), jnp.float32).astype(dtype)
    cv0 = (jax.random.normal(jax.random.PRNGKey(1), (B, Hkv, S, d),
                             jnp.float32) * 2.0).astype(dtype)
    k_new = jax.random.normal(jax.random.PRNGKey(2), (B, Hkv, d),
                              jnp.bfloat16)
    v_new = jax.random.normal(jax.random.PRNGKey(3), (B, Hkv, d),
                              jnp.bfloat16)
    pos = jnp.asarray(POS)
    m = jnp.asarray(MASK)

    app = jax.jit(lambda ck, cv: kv_append(
        ck, cv, k_new, v_new, pos, m, headed=True))
    ref = jax.jit(lambda ck, cv: jnp_append(
        ck, cv, k_new, v_new, pos, m, headed=True))

    ck_k, cv_k = app(jnp.array(ck0), jnp.array(cv0))
    ck_j, cv_j = ref(jnp.array(ck0), jnp.array(cv0))

    c0 = {n: np.asarray(a).view(np.uint8).reshape(B, Hkv, S, -1)
          for n, a in (("K", ck0), ("V", cv0))}
    kk = {n: np.asarray(a).view(np.uint8).reshape(B, Hkv, S, -1)
          for n, a in (("K", ck_k), ("V", cv_k))}
    jj = {n: np.asarray(a).view(np.uint8).reshape(B, Hkv, S, -1)
          for n, a in (("K", ck_j), ("V", cv_j))}

    bad = 0
    for n in ("K", "V"):
        diff = (kk[n] != jj[n]).any(-1)            # (B, Hkv, S)
        if not diff.any():
            print(f"# {name} {n}: kernel == ref bit-exact", flush=True)
            continue
        bad += 1
        for b in range(B):
            rows = sorted(set(int(s) for h, s in np.argwhere(diff[b])))
            if not rows:
                continue
            p = int(POS[b])
            print(f"# {name} {n} slot b={b} pos={p} (blk8 {p//8*8}.."
                  f"{p//8*8+7}, tile32 {p//32*32}..{p//32*32+31}) "
                  f"mask={bool(MASK[b])}: mismatch rows s={rows[:16]}",
                  flush=True)
            s0 = rows[0]
            h0 = int(np.argwhere(diff[b, :, s0])[0])
            print(f"#   b={b} h={h0} s={s0}: kernel="
                  f"{kk[n][b, h0, s0, :8].tolist()} ref="
                  f"{jj[n][b, h0, s0, :8].tolist()} orig="
                  f"{c0[n][b, h0, s0, :8].tolist()}", flush=True)
        # which side changed untouched rows? (untouched = not the written
        # row; masked row b: everything is untouched)
        wrote = np.zeros((B, S), bool)
        for b in range(B):
            if MASK[b]:
                wrote[b, POS[b]] = True
        untouched = ~wrote[:, None, :]
        k_bad = ((kk[n] != c0[n]).any(-1) & untouched).sum()
        j_bad = ((jj[n] != c0[n]).any(-1) & untouched).sum()
        print(f"# {name} {n}: untouched-row corruption kernel={int(k_bad)}"
              f" ref={int(j_bad)} rows", flush=True)
        # did the kernel write the right bytes at the written row?
        w_bad = [(b, int(POS[b])) for b in range(B) if MASK[b]
                 and not np.array_equal(kk[n][b, :, POS[b]],
                                        jj[n][b, :, POS[b]])]
        print(f"# {name} {n}: written-row kernel!=ref at {w_bad}", flush=True)
    return bad


def main():
    bad = 0
    bad += run_case("headed-fp8", jnp.float8_e4m3fn)
    bad += run_case("headed-bf16", jnp.bfloat16)
    print({"kvapp_diff2_bad": bad})
    sys.exit(0 if bad == 0 else 1)


if __name__ == "__main__":
    main()
