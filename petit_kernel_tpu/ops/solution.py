"""Kernel solution space: config encoding, registry, feasibility, heuristic.

TPU analog of the reference's SolutionId 64-bit bitfield + dispatcher +
heuristic chooser (lib/gemm/rocm/quantization/gemm.h:33-105,
fp4/gemm_fp4_fp16_grid.cc:11-34, fp4/algo_chooser.cc:14-132).  Where the
reference enumerates 234 precompiled HIP kernels, here a SolutionId maps to a
parameterization of one Pallas kernel factory; "compilation" happens lazily
per (solution, shape) via jit and is cached by XLA.

The integer `repr` round-trips (SolutionId.from_repr(sid.repr()) == sid) and
is the persisted autotune-table key, like the reference's
SolutionId::Repr()/FromRepr bijection (gemm.h:94-104).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Iterable


class ElementB(enum.IntEnum):
    """Quantized weight format (reference MatmulElementB, gemm.h:56-61)."""
    INT4 = 0       # reserved, not implemented (parity with reference enum)
    NVFP4 = 1
    MXFP4 = 2


class MatmulType(enum.IntEnum):
    """Activation/output dtype class (reference MatmulMfmaType, gemm.h:63-67).

    INT8 is the TPU analog of the reference's third mfma type
    (kMatmulMfmaTypeFp8 + the CDNA3 bf8 fast dequant,
    dequant.cuh:326-363): W4A8 — activations quantized per token to int8,
    FP4 weights requantized in-kernel to int8 with per-column scales, MXU
    int8 dots (measured 347 TOP/s = 1.94x bf16 on v5e). Opt-in numerics
    trade for the compute-bound large-m regime."""
    FP16 = 0
    BF16 = 1
    INT8 = 2


# Block-size quanta. block_m in sublane multiples of 16 (bf16 tile),
# block_n in lane multiples of 128, block_k in multiples of 512 so each
# k-quarter slab (block_k/4) is a Mosaic-legal x128-lane A block (weights
# are repacked with K zero-padded to 512, layout.K_PAD, so any logical k
# with k % 128 == 0 is served).
BLOCK_M_UNIT = 16
BLOCK_N_UNIT = 128
BLOCK_K_UNIT = 512


@dataclasses.dataclass(frozen=True, order=True)
class SolutionId:
    block_m: int
    block_n: int
    block_k: int
    element_b: ElementB = ElementB.NVFP4
    mfma_type: MatmulType = MatmulType.BF16
    high_precision: bool = False
    # Decode each weight block once into a VMEM cache and reuse it for every
    # m-block (grid reordered (nn, nm, nk)): amortizes the VPU dequant at
    # large m, where the plain grid re-decodes weights ceil(m/block_m) times.
    # Costs k_padded * block_n * 2 bytes of VMEM. Analog of the reference's
    # kMatmulFeatures_Grid feature bit (gemm.h:43-49) in spirit: a kernel
    # structure variant selected through the same SolutionId mechanism.
    weight_cache: bool = False
    # NVFP4 tensors quantized with power-of-two E4M3 scales ("nvfp4p2",
    # numerics/reference.quantize_nvfp4_pow2): the kernel applies scales via
    # the integer exponent add (the MXFP4 fast path) instead of the bf16
    # slab multiply — the one VPU cost separating NVFP4 from MXFP4 decode
    # throughput. Only valid for element_b == NVFP4; requires the tensor's
    # processed scales to be exact bf16 powers of two (caller contract —
    # quantize_nvfp4_pow2 guarantees it, arbitrary E4M3 scales do NOT).
    pow2_scale: bool = False
    # Zero-free decode ("nvfp4p2z", numerics/reference.quantize_nvfp4_pow2z):
    # the tensor contract guarantees NO stored-zero codes, so the kernel
    # skips the stored-zero flag/mask pipeline — measured as the only pow2
    # VPU cost that does not hide under the weight DMA (18-19 us of the
    # ~89 us kernel at (16,8192,8192) on v5e, round-5 bisection). Only
    # valid with pow2_scale; tensors quantized any other way produce wrong
    # results wherever a zero code sits.
    zero_free: bool = False

    def __post_init__(self):
        assert self.block_m % BLOCK_M_UNIT == 0 and self.block_m > 0
        assert self.block_n % BLOCK_N_UNIT == 0 and self.block_n > 0
        assert self.block_k % BLOCK_K_UNIT == 0 and self.block_k > 0
        assert not (self.pow2_scale and self.element_b != ElementB.NVFP4), \
            "pow2_scale is an NVFP4-only fast path (MXFP4 is always pow2)"
        assert not (self.zero_free and not (
            self.pow2_scale or self.element_b == ElementB.MXFP4)), \
            "zero_free is an int-scale-path contract (nvfp4p2z / mxfp4z)"

    # 64-bit layout:
    # [zf:1][p2:1][wc:1][m:8][n:10][k:10][element_b:3][mfma:2][hp:1]
    def repr(self) -> int:
        return (int(self.zero_free) << 36 |
                int(self.pow2_scale) << 35 |
                int(self.weight_cache) << 34 |
                (self.block_m // BLOCK_M_UNIT) << 26 |
                (self.block_n // BLOCK_N_UNIT) << 16 |
                (self.block_k // BLOCK_K_UNIT) << 6 |
                int(self.element_b) << 3 |
                int(self.mfma_type) << 1 |
                int(self.high_precision))

    @classmethod
    def from_repr(cls, r: int) -> "SolutionId":
        return cls(
            block_m=((r >> 26) & 0xFF) * BLOCK_M_UNIT,
            block_n=((r >> 16) & 0x3FF) * BLOCK_N_UNIT,
            block_k=((r >> 6) & 0x3FF) * BLOCK_K_UNIT,
            element_b=ElementB((r >> 3) & 0x7),
            mfma_type=MatmulType((r >> 1) & 0x3),
            high_precision=bool(r & 1),
            weight_cache=bool((r >> 34) & 1),
            pow2_scale=bool((r >> 35) & 1),
            zero_free=bool((r >> 36) & 1),
        )

    @property
    def group_size(self) -> int:
        return 16 if self.element_b == ElementB.NVFP4 else 32


@dataclasses.dataclass(frozen=True)
class SolutionHints:
    """Soft preferences threaded through solution resolution, analog of
    PetitSolutionHints (gemm.h:110-117). require_high_precision restricts
    resolution to high-precision solutions (f32 A operand + HIGHEST MXU
    passes) and rejects explicit non-hp solution ids, mirroring the
    reference's precision-flag parity filter (algo_chooser.cc:68-84)."""
    a_type: MatmulType = MatmulType.BF16
    b_type: ElementB = ElementB.NVFP4
    c_type: MatmulType = MatmulType.BF16
    require_high_precision: bool = False


def default_hints(device_kind: str | None = None,
                  b_type: ElementB = ElementB.NVFP4) -> SolutionHints:
    """Arch-aware default hints, analog of the reference's automatic
    high-precision enable on gfx90a (lib/pybind/fp4.cc:24-34): the quirk
    there is MFMA flushing denormal inputs. The TPU VPU has the same hazard
    class (measured: bf16/f32 subnormal multiply inputs flush on v5e), but
    the kernel's decode is designed around it — the q-coded ramp keeps every
    decoded magnitude normal and scale products exact in bf16 — so no known
    TPU generation requires the high-precision path for correctness.
    Unknown/future device kinds keep the fast path too; the hint stays the
    user's escape hatch."""
    del device_kind  # no known TPU generation needs hp for correctness
    return SolutionHints(b_type=b_type)


# The enumerated solution space (analog of gen_solution_list.cc:34-53's 39
# tile combos; ours is the Pallas block-shape family).
_BLOCK_MS = (16, 32, 64, 128, 256, 512)
_BLOCK_NS = (128, 256, 512, 1024, 2048, 4096)
_BLOCK_KS = (512, 1024, 2048, 4096)


def _padded_k(k: int, group_size: int = 16) -> int:
    from . import layout
    return layout.padded_k(k, layout.pad_multiple(group_size))


@dataclasses.dataclass(frozen=True)
class DeviceParams:
    """Per-device-kind constants consumed by feasibility + heuristics, so no
    single generation's measured numbers are load-bearing on another
    (tables in tuned/ are already per-device-kind)."""
    # Scoped-VMEM budget for one grid step incl. double buffering. 16 MiB is
    # MEASURED on v5e (an 18.6 MB scoped allocation is rejected by Mosaic).
    # Other generations keep the conservative measured floor until tuned on
    # real hardware; override via PETIT_TPU_VMEM_BUDGET or set_device_params.
    vmem_budget: int = 16 * 1024 * 1024
    # Preferred decode-regime block_n ladder (widest first). v5e sweep put
    # bn=4096 ~10% ahead of 512 at m=16.
    decode_bns: tuple = (4096, 2048, 1024, 512)
    # Preferred prefill block_n ladder.
    prefill_bns: tuple = (1024, 512, 256, 128)


_DEVICE_PARAMS: dict[str, DeviceParams] = {
    "TPU v5 lite": DeviceParams(),            # v5e, measured
    "TPU v5p": DeviceParams(),                # same floor until measured
    "TPU v4": DeviceParams(),
    "TPU v6 lite": DeviceParams(),
    "cpu": DeviceParams(),                    # interpret-mode tests
}
_params_override: list = [None]


def set_device_params(params: "DeviceParams | None") -> None:
    """Force device params (e.g. after measuring a new generation)."""
    _params_override[0] = params


def device_params(kind: str | None = None) -> DeviceParams:
    if _params_override[0] is not None:
        return _params_override[0]
    if kind is None:
        import os
        env = os.environ.get("PETIT_TPU_VMEM_BUDGET")
        if env:
            return DeviceParams(vmem_budget=int(env))
        try:
            import jax
            kind = jax.devices()[0].device_kind
        except Exception:
            kind = "cpu"
    return _DEVICE_PARAMS.get(kind, DeviceParams())


def vmem_estimate(sid: SolutionId, k: int | None = None) -> int:
    """Rough per-grid-step VMEM bytes incl. Pallas double buffering."""
    bm, bn, bk = sid.block_m, sid.block_n, sid.block_k
    a = bm * (bk // 4) * 2 * 4        # four A k-slices, bf16
    w = (bk // 8) * bn * 4            # packed words, u32
    kp = _padded_k(k, sid.group_size) if k else bk
    # scales (bf16) streamed per quarter+step: 4 blocks of (bk/64, bn)
    s = 4 * (bk // 4 // 16) * bn * 2
    acc = bm * bn * 4                 # f32 accumulator scratch
    out = bm * bn * 2
    deq = (bk // 4) * bn * 2          # decode temporaries (streamed, bf16)
    # weight cache: bf16 slabs for the a16 kernels, int8 for W4A8
    welt = 1 if sid.mfma_type == MatmulType.INT8 else 2
    cache = kp * bn * welt if sid.weight_cache else 0
    return 2 * (a + w + s) + acc + out + deq + cache


def is_feasible(sid: SolutionId, m: int, n: int, k: int) -> bool:
    """Feasibility filter, analog of algo_chooser.cc:68-84 (divisibility and
    dtype checks). M and N are padded by the host wrapper and K is repacked
    with zero-padding to layout.K_PAD, so divisibility is checked against
    the padded K; block_n/block_m are soft-capped to avoid absurd padding."""
    if sid.block_k % BLOCK_K_UNIT != 0:
        return False
    if _padded_k(k, sid.group_size) % sid.block_k != 0:
        return False
    # scale blocks are stride-16 rows for both formats (MXFP4 duplicated
    # offline): per-quarter scale rows = block_k/64, a multiple of 8 for
    # every 512-unit block_k; each quarter covers whole 32-wide MX groups
    # as long as block_k % 128 == 0, guaranteed by the 512 unit.
    assert (sid.block_k // 4 // 16) % 8 == 0
    if sid.block_m > 2 * max(m, BLOCK_M_UNIT):
        return False
    if sid.block_n > 2 * max(n, BLOCK_N_UNIT):
        return False
    # weight_cache only pays when there are >= 2 m-blocks to amortize over
    if sid.weight_cache and m <= sid.block_m:
        return False
    if vmem_estimate(sid, k) > device_params().vmem_budget:
        return False
    return True


def get_solutions(m: int, n: int, k: int,
                  element_b: ElementB = ElementB.NVFP4,
                  mfma_type: MatmulType = MatmulType.BF16,
                  high_precision: bool = False) -> list[SolutionId]:
    """Enumerate feasible solutions for a problem shape (analog of
    GemmGetSolutions, algo_chooser.cc:14-62)."""
    out = []
    for bm in _BLOCK_MS:
        for bn in _BLOCK_NS:
            for bk in _BLOCK_KS:
                for wc in (False, True):
                    sid = SolutionId(bm, bn, bk, element_b, mfma_type,
                                     high_precision, weight_cache=wc)
                    if is_feasible(sid, m, n, k):
                        out.append(sid)
    return out


def choose_default_solution(m: int, n: int, k: int,
                            element_b: ElementB = ElementB.NVFP4,
                            mfma_type: MatmulType = MatmulType.BF16,
                            high_precision: bool = False) -> SolutionId:
    """Heuristic default chooser (analog of ChooseDefaultFp4Fp16Solution,
    algo_chooser.cc:64-132): small m -> snug block_m + deep k to stream
    weights; large m -> fat MXU tiles.

    Checked against the autotuner on the Llama shape suite; the autotuned
    table overrides this when present.
    """
    group = 16 if element_b == ElementB.NVFP4 else 32
    kp = _padded_k(k, group)

    def best_bk(target: int) -> int:
        min_bk = 8 * 4 * 16  # >= 8 stride-16 scale rows per quarter
        for bk in sorted(_BLOCK_KS, reverse=True):
            if bk <= target and kp % bk == 0 and bk >= min_bk:
                return bk
        for bk in sorted(_BLOCK_KS):
            if kp % bk == 0 and bk >= min_bk:
                return bk
        raise ValueError(f"no feasible block_k for k={k}")

    if m <= 32:
        # Decode regime: snug m, wide n blocks (v5e sweep: (16, 4096, 1024)
        # beats (16, 512, 1024) by ~10%), k deep enough to amortize; degrade
        # bn when n or VMEM (k-resident scales) can't support it.
        bm = 16 if m <= 16 else 32
        bk = best_bk(1024)
        for bn in device_params().decode_bns:
            if n % bn == 0 and is_feasible(
                    SolutionId(bm, bn, bk, element_b, mfma_type,
                               high_precision), m, n, k):
                break
        else:
            bn = 512
    else:
        # Prefill/compute-bound: snug m block capped at 512 (fewer m-blocks
        # = fewer redundant weight decodes; measured on v5e: m=512 bm
        # 256->512 is 623->537 us), fat (1024, 1024) n/k tiles (537->454
        # us). For ragged m the block is sized to the m-block count rather
        # than a power of two — m=566 with bm=512 pads to 1024 (45% wasted
        # MXU rows, measured 0.49x of dense); bm=288 pads to 576. The
        # weight_cache kernel variant was measured and does NOT pay here
        # (its VMEM cache write/read cancels the decode savings: 2105 vs
        # 2169 us at m=2048) — it stays available to the autotuner only.
        nm = -(-m // 512)                       # m-block count
        per_block = -(-m // nm)                 # rows per block, snug
        bm = -(-per_block // BLOCK_M_UNIT) * BLOCK_M_UNIT
        bk = best_bk(1024)
        for bn in device_params().prefill_bns:
            if n % bn == 0 and is_feasible(
                    SolutionId(bm, bn, bk, element_b, mfma_type,
                               high_precision), m, n, k):
                break
        else:
            bn = 512
    sid = SolutionId(bm, bn, bk, element_b, mfma_type, high_precision)
    if not is_feasible(sid, m, n, k):
        sols = get_solutions(m, n, k, element_b, mfma_type, high_precision)
        if not sols:
            raise ValueError(f"no feasible solution for m={m} n={n} k={k}")
        sid = sols[0]
    return sid
