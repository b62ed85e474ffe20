"""Offline autotuner: enumerate -> time -> persist best solution per shape.

TPU analog of the reference's `bench_matmul --algo tune` flow
(tools/benchmarks/matmul/main.cc:269-325): for each problem shape, time every
feasible kernel config (warmup + repeat, wall clock around a synchronized
call) and keep the fastest.  The reference README "strongly recommends"
offline tuning because kernels are hyperparameter-sensitive (README.md:35);
the same holds for Pallas block shapes per TPU generation.

Unlike the reference (234 precompiled kernels, cheap to enumerate), every
Pallas config costs a Mosaic compile, so the candidate set is pruned around
the heuristic default before timing.

Tables persist as JSON keyed by SolutionId.repr() analog, per TPU generation
(jax.devices()[0].device_kind), under tuned/.
"""

from __future__ import annotations

import json
import math
import os
from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import gemm as gemm_mod
from . import solution as solution_mod
from .kernels import fused
from .solution import SolutionId, ElementB, MatmulType

def _table_dir() -> str:
    """Repo-checkout tuned/ when present, else a per-user cache dir (the
    package may be installed site-wide with a read-only prefix)."""
    repo = os.path.join(os.path.dirname(__file__), "..", "..", "tuned")
    if os.path.isdir(repo) or os.access(os.path.dirname(repo), os.W_OK):
        return repo
    return os.path.join(os.path.expanduser("~"), ".cache",
                        "petit_kernel_tpu", "tuned")


_TABLE_DIR = _table_dir()


def _device_kind() -> str:
    return jax.devices()[0].device_kind.replace(" ", "_")


def table_path(kind: str | None = None) -> str:
    return os.path.join(_TABLE_DIR, f"{kind or _device_kind()}.json")


def candidate_solutions(m: int, n: int, k: int,
                        element_b: ElementB = ElementB.NVFP4,
                        mfma_type: MatmulType = MatmulType.BF16,
                        max_candidates: int = 8) -> list[SolutionId]:
    """Pruned candidate set: the heuristic default plus its block-shape
    neighbors (each Pallas config costs a ~30 s Mosaic compile, so the sweep
    is a local search around the default rather than the reference's cheap
    full enumeration, main.cc:269-325)."""
    base = solution_mod.choose_default_solution(m, n, k, element_b, mfma_type)
    cands: list[SolutionId] = [base]

    def add(bm, bn, bk, wc=False):
        try:
            s = SolutionId(bm, bn, bk, element_b, mfma_type,
                           weight_cache=wc)
        except AssertionError:
            return
        if s not in cands and solution_mod.is_feasible(s, m, n, k):
            cands.append(s)

    bm, bn, bk = base.block_m, base.block_n, base.block_k
    for bn2 in (bn * 2, bn // 2, bn * 4):
        add(bm, bn2, bk)
    for bk2 in (bk * 2, bk // 2):
        add(bm, bn, bk2)
    for bm2 in (bm * 2, bm // 2):
        add(bm2, bn, bk)
    add(bm, bn, bk, wc=True)       # measured: rarely wins, cheap to check
    if mfma_type == MatmulType.INT8:
        # W4A8's weight cache amortizes the in-kernel requant (decode +
        # slab mul + round + i8 convert) — the mid-m regime where plain
        # W4A8 lost to dense (round-3 verdict #8). Needs >= 2 m-blocks,
        # so offer halved block_m shapes too.
        add(bm // 2, bn, bk, wc=True)
        add(bm // 2, bn * 2, bk, wc=True)
    add(bm, bn * 2, bk * 2)
    return cands[:max_candidates]


def time_solution(sid: SolutionId, a, b, s, gs, *, n1=10, reps=3) -> float:
    """Honest per-call time of one solution (marginal-cost protocol — naive
    dispatch timing is unusable over the axon relay, see utils/benchlib)."""
    from ..utils import benchlib

    def call(a2, b2, s2):
        if sid.mfma_type == MatmulType.INT8:     # W4A8 third compute path
            return fused.fused_mul_w4a8(a2, b2, s2, gs, sid=sid)
        return fused.fused_mul(
            a2, b2, s2, gs, sid=sid,
            out_dtype=jnp.float32 if sid.high_precision else jnp.bfloat16)

    bytes_hint = b.size * 4 + s.size + a.size * 2
    try:
        return benchlib.marginal_time(call, a, b, s, n1=n1, reps=reps,
                                      bytes_hint=bytes_hint)
    except Exception:
        return math.inf


def tune_shape(m: int, n: int, k: int,
               element_b: ElementB = ElementB.NVFP4,
               mfma_type: MatmulType = MatmulType.BF16,
               *, verbose: bool = False, update_table: bool = True,
               max_candidates: int = 24, full: bool = False,
               time_budget_s: float | None = None,
               top: int = 5, pow2_scale: bool = False,
               zero_free: bool = False) -> SolutionId:
    """Tune one shape on the current device; returns the fastest SolutionId
    and (by default) records it in the in-memory dispatch table.

    full=True walks the ENTIRE feasible space like the reference's
    `--algo tune` (tools/benchmarks/matmul/main.cc:269-325), printing the
    top-`top` solutions; each config is a Mosaic compile, so an optional
    time_budget_s caps the walk (candidates are ordered heuristic-first so
    a truncated walk still covers the most promising region)."""
    from . import layout as layout_mod
    from ..numerics import formats as _formats

    rng = np.random.default_rng(1234)
    group = 16 if element_b == ElementB.NVFP4 else 32
    kp = layout_mod.padded_k(k, layout_mod.pad_multiple(group))
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    # fabricate buffers at the repack-PADDED k (what fused_mul requires);
    # any random word is safe in the q-coded layout (both zero codes decode
    # to 0 via the kernel's q==1 mask)
    b = jnp.asarray(rng.integers(0, 2 ** 32, size=(kp // 8, n),
                                 dtype=np.uint64).astype(np.uint32))
    if element_b == ElementB.NVFP4:
        s_raw = (rng.integers(4, 11, size=(kp // group, n),
                              dtype=np.uint8) << 3)
        if not pow2_scale:   # nvfp4p2 contract: mantissa bits zero
            s_raw = s_raw | rng.integers(0, 8, size=(kp // group, n),
                                         dtype=np.uint8)
    else:
        s_raw = rng.integers(110, 140, size=(kp // group, n),
                             dtype=np.uint8)
    dec = (_formats.e4m3_decode(s_raw) if element_b == ElementB.NVFP4
           else _formats.e8m0_decode(s_raw))
    if element_b == ElementB.MXFP4:
        dec = np.repeat(dec, 2, axis=0)  # stride-16 rows (layout contract)
    s = jnp.asarray(dec, jnp.bfloat16)
    gs = jnp.float32(1.0)

    if full:
        # full enumeration, heuristic-neighborhood first so a time-budgeted
        # walk starts in the promising region
        local = candidate_solutions(m, n, k, element_b, mfma_type,
                                    max_candidates)
        rest = [sid for sid in solution_mod.get_solutions(
            m, n, k, element_b, mfma_type) if sid not in local]
        cands = local + rest
    else:
        cands = candidate_solutions(m, n, k, element_b, mfma_type,
                                    max_candidates)
    if pow2_scale or zero_free:
        import dataclasses as _dc
        cands = [_dc.replace(sid, pow2_scale=True, zero_free=zero_free)
                 for sid in cands]
    import time as _time
    t0 = _time.perf_counter()
    timed: list[tuple[float, SolutionId]] = []
    for idx, sid in enumerate(cands):
        if (time_budget_s is not None and idx > 0
                and _time.perf_counter() - t0 > time_budget_s):
            if verbose:
                print(f"# tune budget hit after {idx}/{len(cands)} "
                      "candidates")
            break
        t = time_solution(sid, a, b, s, gs)
        timed.append((t, sid))
        if verbose:
            tf = 2 * m * n * k / t / 1e12 if t < math.inf else 0.0
            print(f"#   {sid.block_m:4d}x{sid.block_n:5d}x{sid.block_k:5d}"
                  f"{' wc' if sid.weight_cache else '   '}"
                  f"  {t * 1e6:10.1f} us  {tf:7.2f} TFLOP/s")
    timed.sort(key=lambda ts: ts[0])
    if full and verbose:
        print(f"# top-{top} for m={m} n={n} k={k}:")
        for t, sid in timed[:top]:
            tf = 2 * m * n * k / t / 1e12 if t < math.inf else 0.0
            print(f"#   {tf:7.2f} TFLOP/s  {t * 1e6:9.1f} us  {sid}")
    best, best_t = timed[0][1], timed[0][0]
    assert best is not None
    if update_table:
        key = gemm_mod._table_key(m, n, k, element_b, mfma_type, False,
                                  pow2=pow2_scale, zero_free=zero_free)
        gemm_mod._TUNED_TABLE[key] = best.repr()
    return best


def tune_grouped_shape(E: int, cap: int, n: int, k: int,
                       element_b: ElementB = ElementB.MXFP4,
                       *, verbose: bool = False,
                       update_table: bool = True) -> SolutionId:
    """Tune the grouped (MoE expert) kernel for a per-expert shape
    (cap, n, k) with E experts; records under the grouped table key.
    Candidates reuse the dense block family minus weight_cache (the
    grouped kernel has no cache variant)."""
    from . import layout as layout_mod
    from .kernels import grouped as grouped_mod
    from ..utils import benchlib

    rng = np.random.default_rng(99)
    group = 16 if element_b == ElementB.NVFP4 else 32
    kp = layout_mod.padded_k(k, layout_mod.pad_multiple(group))
    xs = jnp.asarray(rng.standard_normal((E, cap, k)), jnp.bfloat16)
    words = jnp.asarray(rng.integers(0, 2 ** 32, size=(E, kp // 8, n),
                                     dtype=np.uint64).astype(np.uint32))
    st = jnp.asarray(rng.standard_normal((E, kp // 16, n)) * 0.1 + 1.0,
                     jnp.bfloat16)
    gs = jnp.ones((E,), jnp.float32)
    bytes_hint = words.size * 4 + st.size * 2 + xs.size * 2

    cands = [s for s in candidate_solutions(cap, n, k, element_b)
             if not s.weight_cache]
    best, best_t = None, math.inf
    for sid in cands:
        def call(x2, w2, s2):
            return grouped_mod.grouped_mul(x2, w2, s2, gs,
                                           solution_id=sid.repr())
        try:
            t = benchlib.marginal_time(call, xs, words, st, n1=10, reps=3,
                                       bytes_hint=bytes_hint)
        except Exception:
            t = math.inf
        if verbose:
            tf = 2 * E * cap * n * k / t / 1e12 if t < math.inf else 0.0
            print(f"# grouped {sid.block_m:4d}x{sid.block_n:5d}x"
                  f"{sid.block_k:5d}  {t * 1e6:10.1f} us  "
                  f"{tf:7.2f} TFLOP/s")
        if t < best_t:
            best, best_t = sid, t
    assert best is not None
    if update_table:
        key = gemm_mod._table_key(cap, n, k, element_b,
                                  MatmulType.BF16, False, grouped=True)
        gemm_mod._TUNED_TABLE[key] = best.repr()
    return best


def tune_suite(shapes: Sequence[tuple[int, int, int]],
               element_b: ElementB = ElementB.NVFP4,
               *, verbose: bool = False, save: bool = True,
               full: bool = False,
               time_budget_s: float | None = None) -> dict:
    """Tune a suite of (m, n, k) shapes and persist the table."""
    for (m, n, k) in shapes:
        sid = tune_shape(m, n, k, element_b, verbose=verbose, full=full,
                         time_budget_s=time_budget_s)
        if verbose:
            print(f"# best for m={m} n={n} k={k}: {sid}")
    if save:
        save_table()
    return dict(gemm_mod._TUNED_TABLE)


def save_table(kind: str | None = None) -> str:
    os.makedirs(_TABLE_DIR, exist_ok=True)
    path = table_path(kind)
    existing = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    existing.update({",".join(map(str, k)): v
                     for k, v in gemm_mod._TUNED_TABLE.items()})
    with open(path, "w") as f:
        json.dump(existing, f, indent=1, sort_keys=True)
    return path


def load_table(kind: str | None = None) -> bool:
    """Load the persisted table for this device kind into the dispatcher."""
    path = table_path(kind)
    if not os.path.exists(path):
        return False
    with open(path) as f:
        raw = json.load(f)
    table = {}
    # fixed pass order so current 7-field keys always win over legacy
    # 6-field keys that parse to the same tuple (JSON iteration order must
    # not decide which solution dispatches); 8-field keys are the pow2
    # (nvfp4p2) entries, 9-field the zero-free (nvfp4p2z) entries — both
    # distinct tuples by construction
    for want_len in (6, 7, 8, 9):
        for ks, v in raw.items():
            parts = ks.split(",")
            if len(parts) != want_len:
                continue
            # 6-field keys are the legacy (pre-grouped) format: grouped=False
            grouped = parts[6] == "True" if len(parts) > 6 else False
            key = (int(parts[0]), int(parts[1]), int(parts[2]),
                   int(parts[3]), int(parts[4]), parts[5] == "True",
                   grouped)
            if want_len >= 8:
                if parts[7] != "True":
                    continue
                key = key + (True,) * (want_len - 7)
            table[key] = v
    gemm_mod.set_tuned_table(table)
    return True
