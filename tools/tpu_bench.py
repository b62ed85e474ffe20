"""On-chip kernel stage bisection + honest timing.

The axon relay adds large, variable per-program latency, so all timing uses
the marginal-cost protocol: run the same in-jit fori_loop at two iteration
counts and report (T(n2) - T(n1)) / (n2 - n1).

Variants isolate pipeline stages of the fused kernel:
  stream      read packed words only (HBM DMA ceiling)
  decode      + SWAR fp4->bf16 decode of all 4 quarters
  scaled      + scale decode/broadcast multiply
  full        + 4 MXU dots + epilogue (the real kernel)
  dotonly     pre-dequantized bf16 B, same grid, dot only (2x bytes)
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from petit_kernel_tpu.numerics import formats
from petit_kernel_tpu.ops import layout
from petit_kernel_tpu.ops.kernels import fused
from petit_kernel_tpu.ops.solution import SolutionId, ElementB


_SALT = [0]


def marginal_time(make_loop, n1=50, n2=350, reps=4):
    """Min-floor marginal per-iteration time between two loop lengths; robust
    to the relay's large fixed + variable per-program latency.

    Every call gets a fresh salt and reads its scalar result back to host
    (jax.block_until_ready does NOT reliably wait on the axon platform —
    only a device->host value read forces completion; see
    petit_kernel_tpu/utils/benchlib.py). The first post-compile call is
    discarded (it returns anomalously fast)."""
    f1, f2 = make_loop(n1), make_loop(n2)

    def run(f):
        _SALT[0] += 1
        t0 = time.perf_counter()
        float(f(jnp.float32(_SALT[0])))  # value read forces completion
        return time.perf_counter() - t0

    run(f1)  # compile + warm
    run(f2)
    run(f1)  # discard first post-compile call (anomalously fast) ...
    run(f2)  # ... for BOTH loop lengths
    tas = [run(f1) for _ in range(reps)]
    tbs = [run(f2) for _ in range(reps)]
    return max((min(tbs) - min(tas)) / (n2 - n1), 1e-9)


# --------------------------------------------------------------------------
# variant kernels (share grid structure with the fused kernel)
# --------------------------------------------------------------------------

def _variant_kernel(a0, a1, a2, a3, w_ref, s_ref, gs_ref, out_ref,
                    acc_ref, bsc_ref, *, nk, group, srows, stage):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a_refs = (a0, a1, a2, a3)
    if stage == "stream":
        w = pltpu.bitcast(w_ref[:], jnp.int32)
        acc_ref[0:1, :] += jnp.sum(w, axis=0, keepdims=True,
                                   dtype=jnp.int32).astype(jnp.float32)
    elif stage == "bitonly":
        # pipeline + 4 dots + one u32->bf16 bitcast; no int decode at all
        b = pltpu.bitcast(w_ref[:], jnp.bfloat16)
        for j in range(4):
            acc_ref[:] += jnp.dot(a_refs[j][:], b,
                                  preferred_element_type=jnp.float32)
    elif stage == "rawdot":
        # + per-quarter extract and magnitude positioning, no fix/sign/scale
        for j in range(4):
            x = (w_ref[:] >> np.uint32(4 * j)) & np.uint32(0x000F000F)
            nrm = ((x & np.uint32(0x00070007)) << np.uint32(6)) + np.uint32(
                0x3F003F00)
            b = pltpu.bitcast(nrm, jnp.bfloat16)
            acc_ref[:] += jnp.dot(a_refs[j][:], b,
                                  preferred_element_type=jnp.float32)
    elif stage in ("intfix", "bf16fix", "fullint"):
        for j in range(4):
            x = (w_ref[:] >> np.uint32(4 * j)) & np.uint32(0x000F000F)
            mag = x & np.uint32(0x00070007)
            nrm = (mag << np.uint32(6)) + np.uint32(0x3F003F00)
            if stage == "bf16fix":
                y = pltpu.bitcast(nrm, jnp.bfloat16)
                t = jnp.minimum(jnp.bfloat16(2) * y - jnp.bfloat16(1), y)
                sf = pltpu.bitcast(((x << np.uint32(12))
                                    & np.uint32(0x80008000))
                                   | np.uint32(0x3F803F80), jnp.bfloat16)
                b = t * sf
            else:
                ge2 = ((mag >> np.uint32(1)) | (mag >> np.uint32(2))) \
                    & np.uint32(0x00010001)
                msk = ge2 * np.uint32(0xFFFF)
                sub = (mag & np.uint32(0x00010001)) * np.uint32(0x3F00)
                bits = sub ^ ((nrm ^ sub) & msk)
                bits = bits | ((x << np.uint32(12)) & np.uint32(0x80008000))
                b = pltpu.bitcast(bits, jnp.bfloat16)
            if stage == "fullint":
                sc = s_ref[pl.ds((j * nk + kk) * srows, srows),
                           :].astype(jnp.float32)
                g2, c2 = sc.shape
                r2 = g2 * group
                row = jax.lax.broadcasted_iota(jnp.int32, (r2, g2), 0) // group
                col = jax.lax.broadcasted_iota(jnp.int32, (r2, g2), 1)
                sb = jnp.dot((row == col).astype(jnp.float32), sc,
                             preferred_element_type=jnp.float32
                             ).astype(jnp.bfloat16)
                b = b * sb
            acc_ref[:] += jnp.dot(a_refs[j][:], b,
                                  preferred_element_type=jnp.float32)
    elif stage in ("qdot", "qscaled", "qscaledbv"):
        # v4 prototype: offline q-code remap -> decode = (q<<6) + bias | sgn,
        # zero killed by an equality mask (timing-accurate, values only
        # meaningful for timing comparison)
        for j in range(4):
            x = (w_ref[:] >> np.uint32(4 * j)) if j else w_ref[:]
            magq = (x << np.uint32(6)) & np.uint32(0x01C001C0)
            sgn = (x << np.uint32(12)) & np.uint32(0x80008000)
            z = magq ^ np.uint32(0x00400040)
            nzf = (z | (z >> np.uint32(1)) | (z >> np.uint32(2))) \
                & np.uint32(0x00400040)
            bits = (magq + np.uint32(0x3F003F00)) | sgn
            bits = bits & (nzf * np.uint32(0x3FF))
            b = pltpu.bitcast(bits, jnp.bfloat16)
            if stage in ("qscaled", "qscaledbv"):
                sc = s_ref[pl.ds((j * nk + kk) * srows, srows), :]
                r, c = b.shape
                if stage == "qscaledbv":
                    # vreg-aligned broadcast-view multiply: rows cycle
                    # period 8 by the pi-interleave; no materialized slab
                    parts = []
                    for ch in range(r // 128):
                        sc8 = sc[ch * 8:(ch + 1) * 8]
                        bb = b[ch * 128:(ch + 1) * 128].reshape(16, 8, c)
                        parts.append((bb * sc8[None]).reshape(128, c))
                    b = jnp.concatenate(parts, 0) if len(parts) > 1 else parts[0]
                else:
                    b = fused._apply_scales(b, sc, 16)
            acc_ref[:] += jnp.dot(a_refs[j][:], b,
                                  preferred_element_type=jnp.float32)
    elif stage in ("v6intsc_nz", "v6_nz"):
        # ZERO-FREE timing models (round 5): the stored-zero flag/mask
        # pipeline (z, c, mask-mul, and) is 24 of the pow2 path's ~38
        # lane-ops per packed word. These variants decode as if the format
        # had no zero code — values are WRONG wherever a stored zero sits
        # (timing only): v6intsc_nz = pow2 int-exponent scales, no mask;
        # v6_nz = exact path, unconditional bias + bf16 slab multiply.
        for j in range(4):
            if j == 0:
                y = w_ref[:] & np.uint32(0x81C081C0)
            elif j < 3:
                y = (w_ref[:] << np.uint32(3 * j)) & np.uint32(0x81C081C0)
            else:
                y = (((w_ref[:] >> np.uint32(4)) & np.uint32(0x00C000C0))
                     | ((w_ref[:] >> np.uint32(5)) & np.uint32(0x01000100))
                     | ((w_ref[:] << np.uint32(1)) & np.uint32(0x80008000)))
            sc = s_ref[pl.ds((j * nk + kk) * srows, srows), :]
            if stage == "v6intsc_nz":
                # same slab reuse as v6intsc (timing only; sc32 is (4, C))
                sc32 = pltpu.bitcast(sc[0:8], jnp.uint32) \
                    - np.uint32(0x00800080)
                for ch in range(y.shape[0] // 64):
                    slab32 = pltpu.repeat(sc32, 16, axis=0)
                    b2 = pltpu.bitcast(
                        y[ch * 64:(ch + 1) * 64] + slab32, jnp.bfloat16)
                    acc_ref[:] += jnp.dot(
                        a_refs[j][:, ch * 128:(ch + 1) * 128], b2,
                        preferred_element_type=jnp.float32)
            else:
                b = pltpu.bitcast(y + np.uint32(0x3F003F00), jnp.bfloat16)
                for ch in range(b.shape[0] // 128):
                    slab = pltpu.repeat(sc[ch * 8:(ch + 1) * 8], 16, axis=0)
                    b2 = b[ch * 128:(ch + 1) * 128] * slab
                    acc_ref[:] += jnp.dot(
                        a_refs[j][:, ch * 128:(ch + 1) * 128], b2,
                        preferred_element_type=jnp.float32)
    elif stage in ("v6nomul", "v6norep", "v6intsc"):
        # bisect the v6 scale path: nomul = repeat slab but dot unscaled
        # deq (slab consumed cheaply); norep = multiply by an (8,C) const
        # (no repeat); intsc = MXFP4-style integer exponent-add scaling
        for j in range(4):
            if j == 0:
                y = w_ref[:] & np.uint32(0x81C081C0)
            elif j < 3:
                y = (w_ref[:] << np.uint32(3 * j)) & np.uint32(0x81C081C0)
            else:
                y = (((w_ref[:] >> np.uint32(4)) & np.uint32(0x00C000C0))
                     | ((w_ref[:] >> np.uint32(5)) & np.uint32(0x01000100))
                     | ((w_ref[:] << np.uint32(1)) & np.uint32(0x80008000)))
            z = y ^ np.uint32(0x00400040)
            c = (z + np.uint32(0x01C001C0)) & np.uint32(0x02000200)
            sc = s_ref[pl.ds((j * nk + kk) * srows, srows), :]
            if stage == "v6intsc":
                # (y + slab32) & nzmask, slab pre-adjusted at (4,C)
                mask = (c >> np.uint32(9)) * np.uint32(0xFFFF)
                sc32 = pltpu.bitcast(sc[0:8], jnp.uint32) \
                    - np.uint32(0x00800080)
                r32 = y.shape[0]
                for ch in range(r32 // 64):
                    slab32 = pltpu.repeat(sc32, 16, axis=0)
                    bits = ((y[ch * 64:(ch + 1) * 64] + slab32)
                            & mask[ch * 64:(ch + 1) * 64])
                    b2 = pltpu.bitcast(bits, jnp.bfloat16)
                    acc_ref[:] += jnp.dot(
                        a_refs[j][:, ch * 128:(ch + 1) * 128], b2,
                        preferred_element_type=jnp.float32)
                continue
            bias = (c >> np.uint32(9)) * np.uint32(0x3F00)
            b = pltpu.bitcast(y + bias, jnp.bfloat16)
            r = b.shape[0]
            for ch in range(r // 128):
                if stage == "v6nomul":
                    slab = pltpu.repeat(sc[ch * 8:(ch + 1) * 8], 16, axis=0)
                    acc_ref[0:1, :] += jnp.sum(
                        slab.astype(jnp.float32)[0:8], axis=0, keepdims=True)
                    b2 = b[ch * 128:(ch + 1) * 128]
                else:
                    b2 = b[ch * 128:(ch + 1) * 128] * jnp.bfloat16(0.5)
                acc_ref[:] += jnp.dot(
                    a_refs[j][:, ch * 128:(ch + 1) * 128], b2,
                    preferred_element_type=jnp.float32)
    elif stage in ("v6pipe", "v6intscpipe"):
        # Software-pipelined variants (round 5): the nodma bisection shows
        # compute = VPU decode + MXU dots running SERIALLY (v6 102.4 us
        # nodma vs ~66 VPU + ~35 MXU). Reorder so quarter j+1's decode
        # (VPU) is issued before quarter j's dots (MXU) — if Mosaic
        # schedules units async in program order, they overlap.
        def _dec(j, intsc):
            if j == 0:
                y = w_ref[:] & np.uint32(0x81C081C0)
            elif j < 3:
                y = (w_ref[:] << np.uint32(3 * j)) & np.uint32(0x81C081C0)
            else:
                y = (((w_ref[:] >> np.uint32(4)) & np.uint32(0x00C000C0))
                     | ((w_ref[:] >> np.uint32(5)) & np.uint32(0x01000100))
                     | ((w_ref[:] << np.uint32(1))
                        & np.uint32(0x80008000)))
            z = y ^ np.uint32(0x00400040)
            c = (z + np.uint32(0x01C001C0)) & np.uint32(0x02000200)
            sc = s_ref[pl.ds((j * nk + kk) * srows, srows), :]
            out = []
            if intsc:
                mask = (c >> np.uint32(9)) * np.uint32(0xFFFF)
                sc32 = pltpu.bitcast(sc[0:8], jnp.uint32) \
                    - np.uint32(0x00800080)
                for ch in range(y.shape[0] // 64):
                    slab32 = pltpu.repeat(sc32, 16, axis=0)
                    bits = ((y[ch * 64:(ch + 1) * 64] + slab32)
                            & mask[ch * 64:(ch + 1) * 64])
                    out.append(pltpu.bitcast(bits, jnp.bfloat16))
            else:
                bias = (c >> np.uint32(9)) * np.uint32(0x3F00)
                b = pltpu.bitcast(y + bias, jnp.bfloat16)
                for ch in range(b.shape[0] // 128):
                    slab = pltpu.repeat(sc[ch * 8:(ch + 1) * 8], 16,
                                        axis=0)
                    out.append(b[ch * 128:(ch + 1) * 128] * slab)
            return out

        intsc = stage == "v6intscpipe"
        prev = None
        for j in range(4):
            cur = _dec(j, intsc)                      # VPU for quarter j
            if prev is not None:
                jp, chunks = prev
                for ch, b2 in enumerate(chunks):      # MXU for quarter j-1
                    acc_ref[:] += jnp.dot(
                        a_refs[jp][:, ch * 128:(ch + 1) * 128], b2,
                        preferred_element_type=jnp.float32)
            prev = (j, cur)
        jp, chunks = prev
        for ch, b2 in enumerate(chunks):
            acc_ref[:] += jnp.dot(
                a_refs[jp][:, ch * 128:(ch + 1) * 128], b2,
                preferred_element_type=jnp.float32)
    elif stage == "v6m":
        # mask-form exact decode (round 5): unconditional bias add, then
        # the int path's half-mask kills zero halves outright (exact +0.0,
        # no reliance on the multiply's subnormal flush) — tests whether
        # the flag-via-bias form (v6) schedules worse than flag-via-mask
        for j in range(4):
            if j == 0:
                y = w_ref[:] & np.uint32(0x81C081C0)
            elif j < 3:
                y = (w_ref[:] << np.uint32(3 * j)) & np.uint32(0x81C081C0)
            else:
                y = (((w_ref[:] >> np.uint32(4)) & np.uint32(0x00C000C0))
                     | ((w_ref[:] >> np.uint32(5)) & np.uint32(0x01000100))
                     | ((w_ref[:] << np.uint32(1)) & np.uint32(0x80008000)))
            z = y ^ np.uint32(0x00400040)
            c = (z + np.uint32(0x01C001C0)) & np.uint32(0x02000200)
            mask = (c >> np.uint32(9)) * np.uint32(0xFFFF)
            bits = (y + np.uint32(0x3F003F00)) & mask
            b = pltpu.bitcast(bits, jnp.bfloat16)
            sc = s_ref[pl.ds((j * nk + kk) * srows, srows), :]
            for ch in range(b.shape[0] // 128):
                slab = pltpu.repeat(sc[ch * 8:(ch + 1) * 8], 16, axis=0)
                b2 = b[ch * 128:(ch + 1) * 128] * slab
                acc_ref[:] += jnp.dot(
                    a_refs[j][:, ch * 128:(ch + 1) * 128], b2,
                    preferred_element_type=jnp.float32)
    elif stage in ("v6", "v6dot"):
        # v6 single-shift layout op-structure (TIMING ONLY with the current
        # layout — values are wrong without the matching offline repack):
        # per quarter, one shift+and extracts sign+mag together (offline
        # bit prepositioning), and the zero path masks only the BIAS via a
        # carry-flag multiply instead of masking the whole half.
        for j in range(4):
            if j == 0:
                y = w_ref[:] & np.uint32(0x81C081C0)
            elif j < 3:
                y = (w_ref[:] << np.uint32(3 * j)) & np.uint32(0x81C081C0)
            else:
                # odd quarter: mag bits land split; two extracts + or + sign
                y = (((w_ref[:] >> np.uint32(4)) & np.uint32(0x00C000C0))
                     | ((w_ref[:] >> np.uint32(5)) & np.uint32(0x01000100))
                     | ((w_ref[:] << np.uint32(1)) & np.uint32(0x80008000)))
            z = y ^ np.uint32(0x00400040)
            c = (z + np.uint32(0x01C001C0)) & np.uint32(0x02000200)
            bias = (c >> np.uint32(9)) * np.uint32(0x3F00)
            bits = y + bias
            b = pltpu.bitcast(bits, jnp.bfloat16)
            if stage == "v6":
                sc = s_ref[pl.ds((j * nk + kk) * srows, srows), :]
                r = b.shape[0]
                for ch in range(r // 128):
                    slab = pltpu.repeat(sc[ch * 8:(ch + 1) * 8], 16, axis=0)
                    b2 = b[ch * 128:(ch + 1) * 128] * slab
                    acc_ref[:] += jnp.dot(
                        a_refs[j][:, ch * 128:(ch + 1) * 128], b2,
                        preferred_element_type=jnp.float32)
            else:
                acc_ref[:] += jnp.dot(a_refs[j][:], b,
                                      preferred_element_type=jnp.float32)
    elif stage in ("i16dot", "i16full", "i16sep"):
        # 16-bit-lane decode experiment: bitcast the packed words to u16 so
        # each bf16 half is its OWN vector element — no SWAR cross-half
        # hazards, zero handled by one cmp+select instead of the 6-op
        # carry/mask trick. Win iff Mosaic runs packed i16 ops natively.
        wh = pltpu.bitcast(w_ref[:], jnp.uint16)   # (bk/4, bn) halves
        for j in range(4):
            if stage == "i16sep":
                # timing model of a separated sign/mag offline layout where
                # 3 of 4 quarters decode with a single shift+and+add
                # (values wrong without the matching repack; timing only)
                if j < 3:
                    y = ((wh << np.uint16(3 * j)) if j else wh) \
                        & np.uint16(0x81C0)
                    magq = y & np.uint16(0x01C0)
                    bits = y + np.uint16(0x3F00)
                else:
                    x = wh >> np.uint16(12)
                    magq = (x << np.uint16(6)) & np.uint16(0x01C0)
                    bits = (magq + np.uint16(0x3F00)) \
                        | ((x << np.uint16(12)) & np.uint16(0x8000))
            else:
                x = (wh >> np.uint16(4 * j)) if j else wh
                magq = (x << np.uint16(6)) & np.uint16(0x01C0)
                sgn = (x << np.uint16(12)) & np.uint16(0x8000)
                bits = (magq + np.uint16(0x3F00)) | sgn
            bits = jnp.where(magq == np.uint16(0x0040), np.uint16(0), bits)
            b = pltpu.bitcast(bits, jnp.bfloat16)
            if stage == "i16full":
                sc = s_ref[pl.ds((j * nk + kk) * srows, srows), :]
                r = b.shape[0]
                for ch in range(r // 128):
                    slab = pltpu.repeat(sc[ch * 8:(ch + 1) * 8], 16, axis=0)
                    b2 = b[ch * 128:(ch + 1) * 128] * slab
                    acc_ref[:] += jnp.dot(
                        a_refs[j][:, ch * 128:(ch + 1) * 128], b2,
                        preferred_element_type=jnp.float32)
            else:
                acc_ref[:] += jnp.dot(a_refs[j][:], b,
                                      preferred_element_type=jnp.float32)
    elif stage in ("sdecdot", "srepdot", "sconstdot"):
        # bisect the scale path on top of the q-code decode:
        #   sdecdot   + decode_scales only (result consumed cheaply)
        #   srepdot   + repeat slab, mul by UNDECODED const slab (no decode)
        #   sconstdot + full slab mul with a constant scale (no decode)
        for j in range(4):
            x = (w_ref[:] >> np.uint32(4 * j)) if j else w_ref[:]
            magq = (x << np.uint32(6)) & np.uint32(0x01C001C0)
            sgn = (x << np.uint32(12)) & np.uint32(0x80008000)
            z = magq ^ np.uint32(0x00400040)
            nzf = (z | (z >> np.uint32(1)) | (z >> np.uint32(2))) \
                & np.uint32(0x00400040)
            bits = ((magq + np.uint32(0x3F003F00)) | sgn) \
                & (nzf * np.uint32(0x3FF))
            b = pltpu.bitcast(bits, jnp.bfloat16)
            r, c = b.shape
            if stage == "sdecdot":
                sc = s_ref[pl.ds((j * nk + kk) * srows, srows), :]
                # consume sc without slab: fold into acc row 0 (cheap)
                acc_ref[0:1, :] += jnp.sum(sc.astype(jnp.float32), axis=0,
                                           keepdims=True)
            elif stage in ("srepdot", "sconstdot"):
                scu8 = s_ref[pl.ds((j * nk + kk) * srows, srows), :]
                scb = pltpu.bitcast(
                    (scu8[0:8].astype(jnp.int32) << 7) | 0x3F80_0000 - 0x3F80_0000 + 0x3F800000, jnp.float32
                ).astype(jnp.bfloat16) if False else jnp.ones((8, c), jnp.bfloat16)
                for ch in range(r // 128):
                    slab = pltpu.repeat(scb, 16, axis=0)
                    b2 = b[ch * 128:(ch + 1) * 128] * slab
                    acc_ref[:] += jnp.dot(a_refs[j][:, ch * 128:(ch + 1) * 128],
                                          b2,
                                          preferred_element_type=jnp.float32)
                continue
            acc_ref[:] += jnp.dot(a_refs[j][:], b,
                                  preferred_element_type=jnp.float32)
    elif stage in ("qsc", "fullsc"):
        # scale-apply via 16x vreg-aligned (8, C) multiplies written into a
        # VMEM scratch (no pltpu.repeat slab materialization); dot reads the
        # scratch. qsc uses the v4 q-code decode, fullsc the current decode.
        for j in range(4):
            if stage == "qsc":
                x = (w_ref[:] >> np.uint32(4 * j)) if j else w_ref[:]
                magq = (x << np.uint32(6)) & np.uint32(0x01C001C0)
                sgn = (x << np.uint32(12)) & np.uint32(0x80008000)
                z = magq ^ np.uint32(0x00400040)
                nzf = (z | (z >> np.uint32(1)) | (z >> np.uint32(2))) \
                    & np.uint32(0x00400040)
                bits = ((magq + np.uint32(0x3F003F00)) | sgn) \
                    & (nzf * np.uint32(0x3FF))
                deq = pltpu.bitcast(bits, jnp.bfloat16)
            else:
                deq = fused.decode_quarter(w_ref[:], j)
            sc = s_ref[pl.ds((j * nk + kk) * srows, srows), :]
            r, c = deq.shape
            for ch in range(r // 128):
                sc8 = sc[ch * 8:(ch + 1) * 8]
                for i in range(16):
                    r0 = ch * 128 + i * 8
                    bsc_ref[i * 8:(i + 1) * 8, :] = deq[r0:r0 + 8] * sc8
                acc_ref[:] += jnp.dot(a_refs[j][:, ch * 128:(ch + 1) * 128],
                                      bsc_ref[:],
                                      preferred_element_type=jnp.float32)
    elif stage == "fullbv":
        # current decode + broadcast-view scale multiply (no repeat slab)
        for j in range(4):
            deq = fused.decode_quarter(w_ref[:], j)
            sc = s_ref[pl.ds((j * nk + kk) * srows, srows), :]
            r, c = deq.shape
            parts = []
            for ch in range(r // 128):
                sc8 = sc[ch * 8:(ch + 1) * 8]
                bb = deq[ch * 128:(ch + 1) * 128].reshape(16, 8, c)
                parts.append((bb * sc8[None]).reshape(128, c))
            b = jnp.concatenate(parts, 0) if len(parts) > 1 else parts[0]
            acc_ref[:] += jnp.dot(a_refs[j][:], b,
                                  preferred_element_type=jnp.float32)
    elif stage == "fixdot":
        # full decode (incl. m<2 fix + sign) + dots, NO scale apply:
        # full - fixdot isolates the scale decode/broadcast/mul cost
        for j in range(4):
            deq = fused.decode_quarter(w_ref[:], j)
            acc_ref[:] += jnp.dot(a_refs[j][:], deq,
                                  preferred_element_type=jnp.float32)
    else:
        for j in range(4):
            deq = fused.decode_quarter(w_ref[:], j)
            if stage == "decode":
                acc_ref[0:1, :] += jnp.sum(
                    deq.astype(jnp.float32), axis=0, keepdims=True)
                continue
            sc = s_ref[pl.ds((j * nk + kk) * srows, srows), :]
            b = fused._apply_scales(deq, sc)
            if stage == "scaled":
                acc_ref[0:1, :] += jnp.sum(
                    b.astype(jnp.float32), axis=0, keepdims=True)
                continue
            acc_ref[:] += jnp.dot(a_refs[j][:], b,
                                  preferred_element_type=jnp.float32)

    @pl.when(kk == nk - 1)
    def _():
        out_ref[:] = (acc_ref[:] * gs_ref[0, 0]).astype(out_ref.dtype)


def variant_call(stage, sid, m, n, k, nodma=False):
    bm, bn, bk = sid.block_m, sid.block_n, sid.block_k
    nm, nn, nk = max(m // bm, 1), n // bn, k // bk
    kb4, srows = bk // 4, bk // 4 // 16

    def a_map(j):
        return lambda i, nn_, kk_, j=j: (i, j * nk + kk_)

    kern = functools.partial(_variant_kernel, nk=nk, group=16, srows=srows,
                             stage=stage)
    # nodma: weights block resident (constant index map) -> isolates compute
    w_map = ((lambda i, nn_, kk_: (0, 0)) if nodma
             else (lambda i, nn_, kk_: (kk_, nn_)))

    def call(a, w, s, gs):
        return pl.pallas_call(
            kern,
            grid=(nm, nn, nk),
            in_specs=[
                *[pl.BlockSpec((bm, kb4), a_map(j), memory_space=pltpu.VMEM)
                  for j in range(4)],
                pl.BlockSpec((bk // 8, bn), w_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k // 16, bn), lambda i, nn_, kk_: (0, nn_),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, nn_, kk_: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, nn_, kk_: (i, nn_),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((max(m, bm), n), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32),
                            pltpu.VMEM((128, bn), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(a, a, a, a, w, s, gs)
    return call


def _dot_kernel(a_ref, b_ref, gs_ref, out_ref, acc_ref, *, nk):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(kk == nk - 1)
    def _():
        out_ref[:] = (acc_ref[:] * gs_ref[0, 0]).astype(out_ref.dtype)


def dotonly_call(sid, m, n, k):
    bm, bn, bk = sid.block_m, sid.block_n, sid.block_k
    nm, nn, nk = max(m // bm, 1), n // bn, k // bk

    def call(a, bd, gs):
        return pl.pallas_call(
            functools.partial(_dot_kernel, nk=nk),
            grid=(nm, nn, nk),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, nn_, kk_: (i, kk_),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, bn), lambda i, nn_, kk_: (kk_, nn_),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, nn_, kk_: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, nn_, kk_: (i, nn_),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((max(m, bm), n), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(a, bd, gs)
    return call


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=16)
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--k", type=int, default=8192)
    p.add_argument("--blocks", type=str, default="16,1024,1024")
    p.add_argument("--n1", type=int, default=50)
    p.add_argument("--n2", type=int, default=350)
    p.add_argument("--stages", type=str,
                   default="stream,decode,scaled,full,dotonly")
    p.add_argument("--nodma", action="store_true",
                   help="weights block resident (no HBM stream): isolates "
                        "pure compute time to test DMA/compute overlap")
    p.add_argument("--sweep", action="store_true",
                   help="sweep block shapes of the real fused kernel")
    args = p.parse_args()
    m, n, k = args.m, args.n, args.k
    bm, bn, bk = map(int, args.blocks.split(","))
    sid = SolutionId(bm, bn, bk)

    rng = np.random.default_rng(0)
    nib = rng.integers(0, 16, size=(n, k), dtype=np.uint8)
    nib[nib == 8] = 0
    qw = formats.pack_fp4_pairs(nib)
    scales = ((rng.integers(4, 11, size=(n, k // 16), dtype=np.uint8) << 3)
              | rng.integers(0, 8, size=(n, k // 16), dtype=np.uint8))
    words = jnp.asarray(layout.repack_fp4_weights(qw, n, k))
    st = jnp.asarray(layout.process_fp4_scales(scales, n, k, group_size=16))
    a = jnp.asarray(rng.standard_normal((max(m, bm), k)), jnp.bfloat16)
    gs = jnp.asarray(1.0, jnp.float32).reshape(1, 1)
    bd = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
    wbytes = words.size * 4 + st.size

    print(f"m={m} n={n} k={k} blocks=({bm},{bn},{bk}) "
          f"wbytes={wbytes / 1e6:.1f}MB", flush=True)

    def loop_of(call, *call_args):
        def make(iters):
            @jax.jit
            def run(salt):
                def body(i, acc):
                    a2 = call_args[0].at[0, 0].add(
                        (salt + (i % 7)).astype(call_args[0].dtype))
                    c = call(a2, *call_args[1:])
                    return acc + c[0, 0].astype(jnp.float32)
                return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
            return run
        return make

    if args.sweep:
        for blocks in [(16, 512, 512), (16, 1024, 512), (16, 2048, 512),
                       (16, 512, 1024), (16, 1024, 1024), (16, 2048, 1024),
                       (16, 4096, 1024), (16, 1024, 2048), (16, 2048, 2048),
                       (16, 512, 4096), (16, 1024, 4096), (16, 4096, 2048),
                       (16, 8192, 512), (16, 8192, 1024)]:
            s2 = SolutionId(*blocks)
            if k % s2.block_k or n % s2.block_n:
                continue

            def mkcall(s2=s2):
                def call(a2, w, st_, gs_):
                    return fused.fused_mul(a2, w, st_, gs_[0, 0], sid=s2)
                return call
            try:
                t = marginal_time(loop_of(mkcall(), a, words, st, gs),
                                  args.n1, args.n2)
                print(f"full {str(blocks):18s}: {t * 1e6:9.1f} us  "
                      f"{wbytes / t / 1e9:7.1f} GB/s", flush=True)
            except Exception as e:
                print(f"full {blocks}: FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
        return

    for stage in args.stages.split(","):
        try:
            if stage == "dotonly":
                mk = loop_of(dotonly_call(sid, m, n, k), a, bd, gs)
                bytes_ = bd.size * 2
            else:
                mk = loop_of(variant_call(stage, sid, m, n, k,
                                          nodma=args.nodma), a, words,
                             st, gs)
                bytes_ = wbytes
            t = marginal_time(mk, args.n1, args.n2)
            print(f"{stage:8s}: {t * 1e6:9.1f} us  {bytes_ / t / 1e9:7.1f} GB/s"
                  f"  {2 * m * n * k / t / 1e12:6.2f} TF/s(equiv)", flush=True)
        except Exception as e:
            print(f"{stage:8s}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
