"""Honest on-device timing over the axon TPU relay.

Three measured relay hazards shape this protocol (see bench.py history):

1. `jax.block_until_ready` does NOT reliably wait on the axon platform —
   only a device->host value read forces completion, so every timed call
   reads its scalar result back (`float(...)`).
2. Per-program round-trip latency is large and variable (~29 ms floor,
   +-7 ms jitter, occasional multi-second spikes), so kernels are timed
   inside a jitted fori_loop at two iteration counts and the marginal
   cost (T(n2) - T(n1)) / (n2 - n1) is reported, using the MIN over
   repetitions of each (additive positive noise -> min isolates the floor).
3. The loop body chains iterations through the accumulator and perturbs
   the input with a fresh salt per call, so neither XLA nor the relay can
   collapse repeated executions, and the output is consumed via
   sum(abs(.)) so XLA cannot dead-code or slice through the computation.

This is the TPU analog of the reference's wall-clock-around-Execute+sync
timing (tools/benchmarks/matmul/main.cc:244-251), hardened for a remote
relay the reference never had to deal with.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

_SALT = [0]

# Minimum device-time signal (s) between the two loop lengths: must dominate
# the relay's latency jitter (measured ~+-7 ms around a ~29 ms floor).
MIN_SIGNAL = 0.040


def timed_loop(call, *args, debug: bool = False):
    """Build timed(iters) -> wall seconds for `iters` chained calls of
    call(a, *rest) where a is perturbed per iteration."""

    @jax.jit
    def run(iters, salt, a, *rest):
        def body(i, acc):
            a2 = a.at[0, 0].add((salt + (i % 7)).astype(a.dtype))
            c = call(a2, *rest)
            return acc + jnp.sum(jnp.abs(c.astype(jnp.float32)))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    def timed(iters):
        _SALT[0] += 1
        t0 = time.perf_counter()
        v = float(run(iters, jnp.float32(_SALT[0]), *args))  # forces completion
        dt = time.perf_counter() - t0
        if debug:
            print(f"#     run({iters}, salt={_SALT[0]}) = {v:.6g}"
                  f"  [{dt * 1e3:.2f} ms]", flush=True)
        return dt

    return timed


def marginal_time(call, *args, n1: int = 20, n2: int | None = None,
                  reps: int = 4, bytes_hint: float | None = None,
                  debug: bool = False) -> float:
    """Median-free min-floor marginal per-iteration time of call(*args).

    n2 is sized so the extra iterations contribute >= MIN_SIGNAL of device
    time (estimated from bytes_hint at HBM speed-of-light), otherwise the
    signal drowns in relay jitter.
    """
    timed = timed_loop(call, *args, debug=debug)
    timed(n1)  # compile + warm
    timed(n1)  # discard: first post-compile call returns anomalously fast
    if n2 is None:
        est = (bytes_hint or 32e6) / 800e9  # optimistic per-iteration time
        n2 = n1 + min(4000, max(100, int(MIN_SIGNAL / est)))
    tas = [timed(n1) for _ in range(reps)]
    tbs = [timed(n2) for _ in range(reps)]
    if debug:
        print(f"#   T({n1})={[f'{t * 1e3:.1f}' for t in tas]} ms  "
              f"T({n2})={[f'{t * 1e3:.1f}' for t in tbs]} ms", flush=True)
    return max((min(tbs) - min(tas)) / (n2 - n1), 1e-9)
