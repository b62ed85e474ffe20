"""Fused decode attention (flash-style, paged or contiguous KV).

New-build territory: the reference delegates attention/serving to SGLang
(README.md:21); the north star (BASELINE.json config 5) needs a native TPU
path. The round-1 gather implementation materialized (B, H, T, S) f32
logits and read the FULL max_seq window of KV per step regardless of
sequence length; this kernel fixes both:

  - Online-softmax accumulation over page-sized KV blocks — no (B,H,T,S)
    intermediate, O(G x d) state per (batch, kv-head).
  - The KV pages to read are chosen per grid step from a scalar-prefetched
    block table, so ONLY allocated pages are fetched; callers bound the
    page-block axis by the batch's (bucketed) max length, making decode HBM
    traffic proportional to actual context, not max_seq_len.
  - FP8 (or bf16) KV stays in its storage dtype through the DMA and is
    upcast in VMEM right before the dot — the FP8 bandwidth saving reaches
    the HBM stream.
  - GQA: queries grouped per kv head; one (G, d) @ (d, page) MXU dot per
    page. A contiguous (B, S, h, d) cache is the same kernel with an
    identity block table (see contiguous_block_tables).

TPU-first design notes: the grid is (B, Hkv, nb) with the page axis
sequential (online softmax is a loop-carried reduction); Mosaic requires
the q/o blocks' sublane dim % 8, so the G query-group axis is padded to 8
(padded rows compute garbage attention that is sliced off on the host —
they read real KV, so no NaNs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# fp8(E4M3) -> bf16 SWAR upcast constants (per 16-bit half of a u32 lane)
_F8_PAYLOAD = np.uint32(0x007F007F)   # exp|mantissa bits of even bytes
_F8_SIGN = np.uint32(0x00800080)      # sign bits of even bytes
_F8_EXP = np.uint32(0x00780078)       # exponent field (bits 3..6)
_F8_BIAS = np.uint32(0x3C003C00)      # (127-7) << 7 bias delta per half
_F8_BIT7 = np.uint32(0x00800080)


def _upcast_f8_swar(blk: jax.Array):
    """float8_e4m3fn (Hkv, ps, d) -> two bf16 (Hkv, ps/2, d) arrays with NO
    Mosaic relayout: (even, odd) where even[:, j] is position 2j and
    odd[:, j] is position 2j+1 of the input block.

    The direct `astype(bf16)` of an fp8 block is a lane-widening relayout
    measured at 5x the whole bf16 kernel (docs/DESIGN.md). Instead: bitcast
    the block to u32 (four fp8 positions per lane — positions must be
    second-minor, hence the headed (P, Hkv, ps, d) pool layout), build bf16
    bits for the even and odd bytes in the integer SWAR domain, and bitcast
    each back to bf16 (splitting the position axis in half). e4m3->bf16 is
    exact bit surgery for normals:

        bf16 = sign<<8 | ((b & 0x7F) << 4) + (120 << 7)

    (fp8 bias 7 -> bf16 bias 127). Zeros and subnormals (exp field 0) are
    flushed to +-0 via the same carry-flag trick as the GEMM decode
    (fused.py): max abs error 7*2^-9 ~= 0.0137, below fp8's own
    quantization noise at that magnitude. e4m3fn NaN (0x7F) would decode
    to 480.0 — KV never contains NaN by the write contract.

    Bitcast pairing semantics (u8 rows 4r..4r+3 -> u32 row r bytes 0..3;
    u32 row r -> bf16 rows 2r=low half, 2r+1=high half) verified identical
    in interpret mode and on v5e hardware (2026-08, this repo's probe).
    """
    w = pltpu.bitcast(blk, jnp.uint32)            # (Hkv, ps/4, d)

    def halves(v):
        p = v & _F8_PAYLOAD
        s = (v & _F8_SIGN) << np.uint32(8)
        c = ((p & _F8_EXP) + _F8_EXP) & _F8_BIT7  # bit7/half: exp != 0
        msk = (c >> np.uint32(7)) * np.uint32(0xFFFF)
        bits = (((p << np.uint32(4)) + _F8_BIAS) & msk) | s
        return pltpu.bitcast(bits, jnp.bfloat16)  # (Hkv, ps/2, d)

    return halves(w), halves(w >> np.uint32(8))


def _decode_kernel_headed(bt_ref, pos_ref, q_ref, k_ref, v_ref, o_ref,
                          lg_ref, acc_ref, m_ref, l_ref, *, nb: int,
                          page_size: int, sm_scale: float, hkv: int,
                          gp: int, swar: bool):
    """_decode_kernel over the headed (P, Hkv, ps, d) pool layout.

    bf16 pools: numerically identical to _decode_kernel (same dots, the
    per-head KV slice is leading-axis instead of strided). fp8 pools with
    swar=True ride _upcast_f8_swar: KV positions arrive even/odd-permuted,
    which is free for attention — logits columns permute, the causal mask
    uses the permuted position iota, and p @ V contracts over the permuted
    axis exactly (both K and V use the same permutation).
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    hp = page_size // 2

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(i * page_size <= pos_ref[b])
    def _attend():
        kb, vb = k_ref[0], v_ref[0]                  # (Hkv, ps, d)
        if swar:
            ke, ko = _upcast_f8_swar(kb)
            ve, vo = _upcast_f8_swar(vb)
            for h in range(hkv):
                rows = slice(h * gp, (h + 1) * gp)
                lg_ref[rows, :hp] = jax.lax.dot_general(
                    q_ref[0, h], ke[h], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                lg_ref[rows, hp:] = jax.lax.dot_general(
                    q_ref[0, h], ko[h], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
        else:
            if kb.dtype != jnp.bfloat16:   # rare-shape fp8 fallback
                kb = kb.astype(jnp.bfloat16)
                vb = vb.astype(jnp.bfloat16)
            for h in range(hkv):
                lg_ref[h * gp:(h + 1) * gp] = jax.lax.dot_general(
                    q_ref[0, h], kb[h], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)

        logits = lg_ref[:] * sm_scale                # (Hkv*Gp, ps)
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        if swar:
            # column c: position 2c for c < ps/2, else 2(c-ps/2)+1
            kv_off = jnp.where(col < hp, 2 * col, 2 * col - page_size + 1)
        else:
            kv_off = col
        logits = jnp.where(i * page_size + kv_off <= pos_ref[b],
                           logits, _NEG_INF)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev,
                            jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:] = m_new
        for h in range(hkv):
            rows = slice(h * gp, (h + 1) * gp)
            if swar:
                acc_ref[rows] = (
                    acc_ref[rows] * alpha[rows]
                    + jnp.dot(p[rows, :hp], ve[h].astype(jnp.float32),
                              preferred_element_type=jnp.float32)
                    + jnp.dot(p[rows, hp:], vo[h].astype(jnp.float32),
                              preferred_element_type=jnp.float32))
            else:
                acc_ref[rows] = acc_ref[rows] * alpha[rows] + jnp.dot(
                    p[rows], vb[h].astype(jnp.float32),
                    preferred_element_type=jnp.float32)

    @pl.when(i == nb - 1)
    def _epilogue():
        o_ref[0] = (acc_ref[:] / l_ref[:]).reshape(o_ref.shape[1:]).astype(
            o_ref.dtype)


def _decode_kernel(bt_ref, pos_ref, q_ref, k_ref, v_ref, o_ref,
                   lg_ref, acc_ref, m_ref, l_ref, *, nb: int,
                   page_size: int, sm_scale: float, hkv: int, gp: int):
    # grid (B, nb); the kv-head axis is looped INSIDE the kernel — Mosaic
    # requires the block's last-two dims % (8, 128) or full, so the KV
    # block covers the whole (Hkv, d) tail and each head slices it
    b = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # Per-slot early exit: page blocks beyond THIS sequence's own length
    # are skipped entirely — nb is the batch's bucketed max, so without
    # this every slot pays the longest slot's window in compute; the DMA
    # side is handled by the clamped index map in paged_decode_attention
    # (out-of-range steps re-map the slot's last page, and Pallas skips
    # the copy when the mapped block repeats).
    @pl.when(i * page_size <= pos_ref[b])
    def _attend():
        # FP8 pools: convert the WHOLE block once before the head loop —
        # slicing packed-f8 sub-axes per head costs a Mosaic relayout each
        # (measured 49x on the kernel; one up-front convert is ~5 us)
        kb, vb = k_ref[0], v_ref[0]
        if kb.dtype != jnp.bfloat16:
            kb = kb.astype(jnp.bfloat16)
            vb = vb.astype(jnp.bfloat16)
        # Per-head QK^T dots land in ONE (Hkv*Gp, ps) scratch so all the
        # softmax VPU work below runs as wide single ops. bf16 MXU dots
        # with f32 accumulation (upcasting inputs to f32 costs per-head
        # VPU casts and the multi-pass f32 MXU rate). Head-batching the
        # softmax + bigger KV blocks measured 357 -> 218 us on a
        # B=8/Hkv=8/4096-ctx step, vs a 182 us pipelined-DMA floor
        # (tools/attn_probe.py bisection).
        for h in range(hkv):
            lg_ref[h * gp:(h + 1) * gp] = jax.lax.dot_general(
                q_ref[0, h], kb[:, h, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        logits = lg_ref[:] * sm_scale                     # (Hkv*Gp, ps)
        kv_pos = i * page_size + jax.lax.broadcasted_iota(
            jnp.int32, logits.shape, 1)
        logits = jnp.where(kv_pos <= pos_ref[b], logits, _NEG_INF)
        m_prev = m_ref[:]                                 # (Hkv*Gp, 1)
        m_new = jnp.maximum(m_prev,
                            jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)                       # (Hkv*Gp, ps)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:] = m_new
        pb = p
        for h in range(hkv):
            rows = slice(h * gp, (h + 1) * gp)
            acc_ref[rows] = acc_ref[rows] * alpha[rows] + jnp.dot(
                pb[rows], vb[:, h, :].astype(jnp.float32),
                preferred_element_type=jnp.float32)

    @pl.when(i == nb - 1)
    def _epilogue():
        # l > 0 always: kv position 0 is valid for every pos >= 0
        o_ref[0] = (acc_ref[:] / l_ref[:]).reshape(o_ref.shape[1:]).astype(
            o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("nb", "page_size", "interpret",
                                             "headed"))
def paged_decode_attention(q: jax.Array, k_pages: jax.Array,
                           v_pages: jax.Array, block_tables: jax.Array,
                           pos: jax.Array, *, nb: int, page_size: int,
                           interpret: bool = False,
                           headed: bool = False) -> jax.Array:
    """One-token-per-sequence attention over paged KV.

    q            : (B, H, d)   current-step queries (post-RoPE)
    k_pages      : (P, ps, Hkv, d) page pool (bf16 or float8_e4m3fn), or
                   (P, Hkv, ps, d) with headed=True — the layout the paged
                   engines use, required for the fp8 SWAR upcast (positions
                   must be second-minor for the u8->u32 bitcast pairing,
                   see _upcast_f8_swar)
    v_pages      : same shape/layout as k_pages
    block_tables : (B, max_pages) int32 page ids (>= nb columns)
    pos          : (B,) int32 absolute position of each query
    nb           : page blocks to visit (static) — callers pass the batch
                   max length bucketed, ceil((max(pos)+1)/ps), so HBM
                   traffic tracks actual context
    returns      : (B, H, d) bf16
    """
    interpret = interpret or jax.default_backend() == "cpu"
    B, H, d = q.shape
    if headed:
        P, Hkv, ps, dk = k_pages.shape
    else:
        P, ps, Hkv, dk = k_pages.shape
    assert dk == d and ps == page_size and H % Hkv == 0
    assert block_tables.shape[0] == B and block_tables.shape[1] >= nb
    G = H // Hkv
    Gp = -(-G // 8) * 8  # Mosaic sublane quantum; padded rows sliced off
    qr = q.reshape(B, Hkv, G, d)
    if Gp != G:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))

    sm_scale = 1.0 / np.sqrt(d)
    if headed:
        # SWAR fp8 path needs ps % 4 (u32 pairing) and, on hardware,
        # half-page lane slices % 128; otherwise astype fallback in-kernel
        swar = (k_pages.dtype == jnp.float8_e4m3fn and ps % 4 == 0
                and (interpret or (ps // 2) % 128 == 0))
        kernel = functools.partial(_decode_kernel_headed, nb=nb,
                                   page_size=ps, sm_scale=sm_scale,
                                   hkv=Hkv, gp=Gp, swar=swar)
        kv_spec = lambda b, i, bt, pos: (
            bt[b, jnp.minimum(i, pos[b] // ps)], 0, 0, 0)
        kv_block = (1, Hkv, ps, d)
    else:
        kernel = functools.partial(_decode_kernel, nb=nb, page_size=ps,
                                   sm_scale=sm_scale, hkv=Hkv, gp=Gp)
        kv_spec = lambda b, i, bt, pos: (
            bt[b, jnp.minimum(i, pos[b] // ps)], 0, 0, 0)
        kv_block = (1, ps, Hkv, d)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, nb),
            in_specs=[
                pl.BlockSpec((1, Hkv, Gp, d),
                             lambda b, i, bt, pos: (b, 0, 0, 0)),
                # page index clamped to the slot's own last page: steps
                # beyond its length re-map the same block, and Pallas
                # skips the HBM copy when the mapped block repeats —
                # ragged batches pay per-sequence traffic, not batch-max
                pl.BlockSpec(kv_block, kv_spec),
                pl.BlockSpec(kv_block, kv_spec),
            ],
            out_specs=pl.BlockSpec((1, Hkv, Gp, d),
                                   lambda b, i, bt, pos: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((Hkv * Gp, ps), jnp.float32),
                pltpu.VMEM((Hkv * Gp, d), jnp.float32),
                pltpu.VMEM((Hkv * Gp, 1), jnp.float32),
                pltpu.VMEM((Hkv * Gp, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Gp, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(block_tables.astype(jnp.int32), pos.astype(jnp.int32),
      qr, k_pages, v_pages)
    return out[:, :, :G, :].reshape(B, H, d)


def contiguous_block_tables(batch: int, max_seq: int,
                            page_size: int) -> jax.Array:
    """Identity block table viewing a contiguous (B, S, h, d) cache as a
    pool of B*S/ps pages: cache.reshape(B*S/ps, ps, h, d) rows b*S/ps + i."""
    per = max_seq // page_size
    return (jnp.arange(batch, dtype=jnp.int32)[:, None] * per
            + jnp.arange(per, dtype=jnp.int32)[None, :])


def decode_attention_contiguous(q: jax.Array, ck: jax.Array, cv: jax.Array,
                                pos: jax.Array, *, nb: int,
                                page_size: int = 128,
                                interpret: bool = False) -> jax.Array:
    """paged_decode_attention over a contiguous (B, S, Hkv, d) cache.

    A contiguous cache is an *identity view* as pages, so the kernel block
    size is a free parameter: coarsen it (up to 512, keeping the nb *
    page_size window identical) — fewer, bigger grid steps measured 293 ->
    218 us on a 4096-ctx decode step against a 182 us DMA floor
    (tools/attn_probe.py). Per-slot early exit then operates at the coarser
    granularity, which costs ragged batches nothing when all slots are
    short (the window is bucketed the same) and a bounded overshoot
    (< block) when they are mixed.
    """
    B, S, Hkv, d = ck.shape
    assert S % page_size == 0
    window = nb * page_size
    ps2 = page_size
    while ps2 < 512 and window % (ps2 * 2) == 0 and S % (ps2 * 2) == 0:
        ps2 *= 2
    nb2 = window // ps2
    bt = contiguous_block_tables(B, S, ps2)
    pool = (B * S) // ps2
    return paged_decode_attention(
        q, ck.reshape(pool, ps2, Hkv, d),
        cv.reshape(pool, ps2, Hkv, d), bt, pos,
        nb=nb2, page_size=ps2, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("nb", "page_size", "interpret"))
def decode_attention_contiguous_headed(q: jax.Array, ck: jax.Array,
                                       cv: jax.Array, pos: jax.Array, *,
                                       nb: int, page_size: int = 256,
                                       interpret: bool = False) -> jax.Array:
    """decode_attention_contiguous over a HEADED contiguous (B, Hkv, S, d)
    cache — the fp8 SWAR layout (positions second-minor, so the u8->u32
    bitcast in _upcast_f8_swar pairs KV POSITIONS) with no pool
    indirection: the KV BlockSpec walks the S axis directly, clamped to
    each slot's own length. bf16 caches work too (same dots as the flat
    layout); fp8 caches ride the SWAR upcast instead of the Mosaic
    lane-widening astype relayout measured at 5x the whole bf16 kernel
    (docs/DESIGN.md)."""
    interpret = interpret or jax.default_backend() == "cpu"
    B, H, d = q.shape
    Bk, Hkv, S, dk = ck.shape
    assert dk == d and Bk == B and H % Hkv == 0
    window = nb * page_size
    ps = page_size
    # fp8 SWAR needs (ps/2) % 128 on hardware: lift short-window buckets to
    # a 256 block (the clamped index map keeps DMA at the slot's own
    # length, so the overshoot costs masked compute only, never traffic)
    if ck.dtype == jnp.float8_e4m3fn and not interpret and S % 256 == 0:
        ps = max(ps, 256)
    while ps < 512 and window % (ps * 2) == 0 and S % (ps * 2) == 0:
        ps *= 2
    nb2 = min(max(1, -(-window // ps)), S // ps)
    assert S % ps == 0
    G = H // Hkv
    Gp = -(-G // 8) * 8
    qr = q.reshape(B, Hkv, G, d)
    if Gp != G:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))
    sm_scale = 1.0 / np.sqrt(d)
    swar = (ck.dtype == jnp.float8_e4m3fn and ps % 4 == 0
            and (interpret or (ps // 2) % 128 == 0))
    kernel = functools.partial(_decode_kernel_headed, nb=nb2, page_size=ps,
                               sm_scale=sm_scale, hkv=Hkv, gp=Gp, swar=swar)
    kv_spec = lambda b, i, bt, pos: (b, 0, jnp.minimum(i, pos[b] // ps), 0)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, nb2),
            in_specs=[
                pl.BlockSpec((1, Hkv, Gp, d),
                             lambda b, i, bt, pos: (b, 0, 0, 0)),
                pl.BlockSpec((1, Hkv, ps, d), kv_spec),
                pl.BlockSpec((1, Hkv, ps, d), kv_spec),
            ],
            out_specs=pl.BlockSpec((1, Hkv, Gp, d),
                                   lambda b, i, bt, pos: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((Hkv * Gp, ps), jnp.float32),
                pltpu.VMEM((Hkv * Gp, d), jnp.float32),
                pltpu.VMEM((Hkv * Gp, 1), jnp.float32),
                pltpu.VMEM((Hkv * Gp, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Gp, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(jnp.zeros((1,), jnp.int32), pos.astype(jnp.int32), qr, ck, cv)
    return out[:, :, :G, :].reshape(B, H, d)


def pow2_bucket(n: int, lo: int = 1) -> int:
    """Smallest power of two >= n (>= lo): the compile-count-bounding
    bucket for the static page-block axis (<= log2(max_seq/ps) programs)."""
    b = lo
    while b < n:
        b *= 2
    return b


# ---------------------------------------------------------------------------
# Causal flash prefill: multi-token queries against a contiguous KV buffer
# (the cache during chunked prefill, or the sequence itself when no cache).
# ---------------------------------------------------------------------------


def _prefill_kernel(pos0_ref, q_ref, k_ref, v_ref, o_ref,
                    acc_ref, m_ref, l_ref, *, ns: int, ts: int, tq: int,
                    sm_scale: float, hkv: int, headed: bool = False):
    # grid (B, nt, ns); kv heads looped inside (see _decode_kernel note)
    b = pl.program_id(0)
    ti = pl.program_id(1)
    si = pl.program_id(2)

    @pl.when(si == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # skip blocks strictly above the causal diagonal for every row of this
    # q block (kv start > max query position)
    blk_max_pos = pos0_ref[b] + (ti + 1) * tq - 1

    @pl.when(si * ts <= blk_max_pos)
    def _compute():
        G = q_ref.shape[2]
        d = q_ref.shape[-1]
        kb, vb = k_ref[0], v_ref[0]
        if kb.dtype != jnp.bfloat16:   # see _decode_kernel FP8 note
            kb = kb.astype(jnp.bfloat16)
            vb = vb.astype(jnp.bfloat16)
        for h in range(hkv):
            rows_sl = slice(h * G * tq, (h + 1) * G * tq)
            # bf16 MXU dots, f32 accumulation (see _decode_kernel note)
            q = q_ref[0, h].reshape(G * tq, d)             # bf16
            k = kb[h] if headed else kb[:, h, :]           # (ts, d) bf16
            v = vb[h] if headed else vb[:, h, :]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale  # (G*tq, ts)
            rows = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) % tq
            q_pos = pos0_ref[b] + ti * tq + rows
            kv_pos = si * ts + jax.lax.broadcasted_iota(jnp.int32,
                                                        logits.shape, 1)
            logits = jnp.where(kv_pos <= q_pos, logits, _NEG_INF)
            m_prev = m_ref[rows_sl]
            m_new = jnp.maximum(m_prev, jnp.max(logits, -1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(logits - m_new)
            l_ref[rows_sl] = l_ref[rows_sl] * alpha + jnp.sum(
                p, -1, keepdims=True)
            m_ref[rows_sl] = m_new
            acc_ref[rows_sl] = acc_ref[rows_sl] * alpha + jnp.dot(
                p, v.astype(jnp.float32),
                preferred_element_type=jnp.float32)

    @pl.when(si == ns - 1)
    def _epilogue():
        G = q_ref.shape[2]
        d = q_ref.shape[-1]
        o_ref[0] = (acc_ref[:] / l_ref[:]).reshape(hkv, G, tq, d).astype(
            o_ref.dtype)


def _prefill_kernel_paged(bt_ref, pos0_ref, *rest, **kw):
    """_prefill_kernel with a leading block-table scalar ref (consumed by
    the KV index maps only)."""
    return _prefill_kernel(pos0_ref, *rest, **kw)


@functools.partial(jax.jit, static_argnames=("ns", "block_q", "interpret"))
def flash_prefill_paged(q: jax.Array, k_pages: jax.Array,
                        v_pages: jax.Array, block_tables: jax.Array,
                        pos0: jax.Array, *, ns: int, block_q: int = 128,
                        interpret: bool = False) -> jax.Array:
    """Causal flash prefill over PAGED KV (headed (P, Hkv, ps, d) pool).

    Same online-softmax kernel as flash_prefill_attention, but the KV
    BlockSpec walks the slot's block table instead of a contiguous S axis —
    chunked paged admission streams ceil(window/ps) pages per q block
    instead of gathering the full pool view (the round-3 paged prefill
    materialized a (B, max_pages*ps, Hkv, d) gather AND a fresh pool copy
    per chunk; VERDICT r3 #4). KV block size == page size.

    q    : (B, T, H, d) post-RoPE; query t of row b sits at pos0[b] + t
    ns   : static number of pages to visit (bucket ceil((pos0+T)/ps));
           block-table entries beyond a row's causal limit are clamped to
           its last causally-needed page (the copy is skipped when the
           mapped block repeats, the kernel compute-skips it)
    """
    interpret = interpret or jax.default_backend() == "cpu"
    B, T, H, d = q.shape
    P, Hkv, ps, dk = k_pages.shape
    assert dk == d and H % Hkv == 0
    assert block_tables.shape[0] == B and block_tables.shape[1] >= ns
    G = H // Hkv
    tq = min(block_q, T)
    assert T % tq == 0
    nt = T // tq
    qr = q.transpose(0, 2, 1, 3).reshape(B, Hkv, G, T, d)
    sm_scale = 1.0 / np.sqrt(d)

    kv_spec = lambda b, ti, si, bt, p0: (
        bt[b, jnp.minimum(si, (p0[b] + (ti + 1) * tq - 1) // ps)], 0, 0, 0)
    kernel = functools.partial(_prefill_kernel_paged, ns=ns, ts=ps, tq=tq,
                               sm_scale=sm_scale, hkv=Hkv, headed=True)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, nt, ns),
            in_specs=[
                pl.BlockSpec((1, Hkv, G, tq, d),
                             lambda b, ti, si, bt, p0: (b, 0, 0, ti, 0)),
                pl.BlockSpec((1, Hkv, ps, d), kv_spec),
                pl.BlockSpec((1, Hkv, ps, d), kv_spec),
            ],
            out_specs=pl.BlockSpec((1, Hkv, G, tq, d),
                                   lambda b, ti, si, bt, p0: (b, 0, 0, ti, 0)),
            scratch_shapes=[
                pltpu.VMEM((Hkv * G * tq, d), jnp.float32),
                pltpu.VMEM((Hkv * G * tq, 1), jnp.float32),
                pltpu.VMEM((Hkv * G * tq, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, T, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(block_tables.astype(jnp.int32), pos0.astype(jnp.int32), qr,
      k_pages, v_pages)
    return out.reshape(B, H, T, d).transpose(0, 2, 1, 3)


@functools.partial(jax.jit, static_argnames=("ns", "block_q", "block_s",
                                             "interpret", "headed"))
def flash_prefill_attention(q: jax.Array, ck: jax.Array, cv: jax.Array,
                            pos0: jax.Array, *, ns: int,
                            block_q: int = 128, block_s: int = 128,
                            interpret: bool = False,
                            headed: bool = False) -> jax.Array:
    """Causal multi-token attention, flash-style (no (B,H,T,S) tensor).

    q    : (B, T, H, d) post-RoPE queries; query t's absolute position is
           pos0[b] + t (contiguous chunk — the chunked-prefill contract)
    ck/cv: (B, S, Hkv, d) contiguous KV (bf16 or fp8; the current chunk
           must already be written in), or (B, Hkv, S, d) with headed=True
           (the fp8 SWAR cache layout; fp8 blocks upcast via astype here —
           prefill is compute-bound, decode is where SWAR pays)
    pos0 : (B,) int32 chunk start positions
    ns   : static number of block_s KV blocks to visit (callers bucket
           ceil(max(pos0 + T)/block_s))
    returns (B, T, H, d) bf16.

    Blocks strictly above the causal diagonal are compute-skipped; the
    online-softmax state lives in VMEM scratch across the sequential
    KV-block axis.
    """
    interpret = interpret or jax.default_backend() == "cpu"
    B, T, H, d = q.shape
    if headed:
        _, Hkv, S, dk = ck.shape
    else:
        _, S, Hkv, dk = ck.shape
    assert dk == d and H % Hkv == 0 and S % block_s == 0
    G = H // Hkv
    tq = min(block_q, T)
    assert T % tq == 0
    nt = T // tq
    qr = q.transpose(0, 2, 1, 3).reshape(B, Hkv, G, T, d)
    sm_scale = 1.0 / np.sqrt(d)

    if headed:
        kv_block = (1, Hkv, block_s, d)
        kv_spec = lambda b, ti, si, p0: (
            b, 0, jnp.minimum(si, (p0[b] + (ti + 1) * tq - 1) // block_s), 0)
    else:
        kv_block = (1, block_s, Hkv, d)
        kv_spec = lambda b, ti, si, p0: (
            b, jnp.minimum(si, (p0[b] + (ti + 1) * tq - 1) // block_s), 0, 0)
    kernel = functools.partial(_prefill_kernel, ns=ns, ts=block_s, tq=tq,
                               sm_scale=sm_scale, hkv=Hkv, headed=headed)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nt, ns),
            in_specs=[
                pl.BlockSpec((1, Hkv, G, tq, d),
                             lambda b, ti, si, p0: (b, 0, 0, ti, 0)),
                # clamp the KV block to the causal limit of this q block:
                # above-diagonal steps re-map the same block and Pallas
                # skips the copy (the kernel already compute-skips them)
                pl.BlockSpec(kv_block, kv_spec),
                pl.BlockSpec(kv_block, kv_spec),
            ],
            out_specs=pl.BlockSpec((1, Hkv, G, tq, d),
                                   lambda b, ti, si, p0: (b, 0, 0, ti, 0)),
            scratch_shapes=[
                pltpu.VMEM((Hkv * G * tq, d), jnp.float32),
                pltpu.VMEM((Hkv * G * tq, 1), jnp.float32),
                pltpu.VMEM((Hkv * G * tq, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, T, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(pos0.astype(jnp.int32), qr, ck, cv)
    return out.reshape(B, H, T, d).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# In-place KV append: write one decode step's K/V rows into the cache at
# per-sequence positions WITHOUT rewriting the cache. The jnp path
# (vmap'd dynamic_update_slice, llama.attention) lowers to a whole-cache
# select — measured 24 us/layer at (8, 512, 8, 128) bf16, the decode
# step's largest non-GEMM cost (tools/step_budget.py, round 4). This
# kernel aliases the cache through pallas_call and DMAs only the touched
# (hkv, d) row per sequence: ~2 KB instead of ~17 MB per layer.
# ---------------------------------------------------------------------------

def quantize_kv(x: jax.Array, dtype) -> jax.Array:
    """Cast new K/V values to the cache dtype with the narrowing PINNED at
    x's own dtype.

    Without the barrier, XLA is free to compile the upstream chain
    f32 -> bf16 (model dtype) -> fp8 (cache dtype) as either two RNE
    roundings or one fused f32 -> fp8 convert, and it chooses differently
    per program: round 4's "kv_append hardware mismatch" (tokens equal,
    cache bytes off by 1 ulp) was exactly this — the pallas-append program
    and the jnp dynamic_update_slice program quantized the SAME bf16
    values to different fp8 bytes (localized by tools/kvapp_probe +
    kvapp_diff2 on v5e, 2026-08-20; the u32-splice kernel itself is
    bit-exact). The barrier forces the x-dtype value to be a real program
    point, so every write path stores fp8(bf16(v)) identically. Reference
    bar: on-device bit-exact round-trips
    (quantization/fp4/quantization_utils_fp4_test.cc:103-133)."""
    if x.dtype == dtype:
        return x
    return jax.lax.optimization_barrier(x).astype(dtype)


def _kv_append_kernel(pos_ref, mask_ref, kn_ref, vn_ref, ck_ref, cv_ref,
                      ok_ref, ov_ref):
    b = pl.program_id(0)
    keep = mask_ref[b] != 0
    ok_ref[:] = jnp.where(keep, kn_ref[:].reshape(ok_ref.shape
                                                  ).astype(ok_ref.dtype),
                          ck_ref[:])
    ov_ref[:] = jnp.where(keep, vn_ref[:].reshape(ov_ref.shape
                                                  ).astype(ov_ref.dtype),
                          cv_ref[:])


def _kv_append_kernel_headed(pos_ref, mask_ref, kn_ref, vn_ref, ck_ref,
                             cv_ref, ok_ref, ov_ref, *, epw: int):
    """Headed (B, Hkv, S, d) layout: Mosaic requires the last-two block
    dims be (8k, 128k), so the block spans 8 positions (grid (B, Hkv),
    block (1, 1, 8, d) at S-block pos[b]//8) and the kernel splices the
    new row in the u32 SWAR domain — a narrow-dtype (fp8/bf16) dynamic
    sublane store or select does not lower through Mosaic (probed on v5e
    2026-08-19). epw = cache elements per u32 (4 for fp8, 2 for bf16);
    element s of a u32-packed sublane sits at bits 32/epw * (s % epw)
    (little-endian pairing verified on hardware — see _upcast_f8_swar).
    kn/vn arrive PRE-PACKED as u32 (element bits in the low bits)."""
    b = pl.program_id(0)
    bits = 32 // epw
    keep = mask_ref[b] != 0
    sub = pos_ref[b] % 8
    row = (sub // epw).astype(jnp.uint32)
    shift = (jnp.uint32(bits) * (sub % epw).astype(jnp.uint32))
    elem_mask = jnp.uint32((1 << bits) - 1) << shift

    for new_ref, c_ref, o_ref in ((kn_ref, ck_ref, ok_ref),
                                  (vn_ref, cv_ref, ov_ref)):
        old = pltpu.bitcast(c_ref[:], jnp.uint32)   # (1, 1, 8/epw, d)
        rowmask = jax.lax.broadcasted_iota(
            jnp.uint32, old.shape, 2) == row
        ins = (old & ~elem_mask) | ((new_ref[:] << shift) & elem_mask)
        new = jnp.where(rowmask & keep, ins, old)
        o_ref[:] = pltpu.bitcast(new, o_ref.dtype)


def kv_append(ck: jax.Array, cv: jax.Array, k_new: jax.Array,
              v_new: jax.Array, pos: jax.Array,
              mask: jax.Array | None = None, *, headed: bool = False,
              interpret: bool = False):
    """Append one token's KV per sequence, in place.

    ck/cv  : (B, S, Hkv, d) flat or (B, Hkv, S, d) with headed=True
    k_new  : (B, Hkv, d) new keys (any float dtype; cast to cache dtype)
    v_new  : (B, Hkv, d)
    pos    : (B,) int32 write position per sequence (< S)
    mask   : optional (B,) bool; rows with mask[b]=False keep their cache
             content bit-exactly (the engine's write_mask contract)
    returns (ck, cv) — the SAME buffers, updated (input_output_aliases);
    callers must treat the inputs as consumed (donated under jit).
    """
    B = ck.shape[0]
    if mask is None:
        mask = jnp.ones((B,), jnp.int32)
    if headed:
        _, Hkv, S, d = ck.shape
        assert S % 8 == 0, S
        # Mosaic last-two-dims rule: the cache block spans 8 positions
        # (the one holding pos[b]); the kernel u32-splices pos[b] % 8.
        # New values arrive pre-packed as u32 (low bits), since narrow
        # dtypes can't be dynamically stored or selected in Mosaic.
        epw = 32 // (8 * ck.dtype.itemsize)
        narrow = {1: jnp.uint8, 2: jnp.uint16}[ck.dtype.itemsize]
        blk = (1, 1, 8, d)
        idx = lambda b, h, pos, m: (b, h, pos[b] // 8, 0)
        new_spec = pl.BlockSpec((1, 1, 1, d),
                                lambda b, h, pos, m: (b, h, 0, 0))

        def pack(x):
            return jax.lax.bitcast_convert_type(
                quantize_kv(x, ck.dtype), narrow).astype(jnp.uint32
                                                         ).reshape(
                                                             B, Hkv, 1, d)
        kn = pack(k_new)
        vn = pack(v_new)
        kernel = functools.partial(_kv_append_kernel_headed, epw=epw)
        grid = (B, Hkv)
        semantics = ("arbitrary", "arbitrary")
    else:
        _, S, Hkv, d = ck.shape
        blk = (1, 1, Hkv, d)
        idx = lambda b, pos, m: (b, pos[b], 0, 0)
        new_spec = pl.BlockSpec((1, 1, Hkv, d),
                                lambda b, pos, m: (b, 0, 0, 0))
        kn = quantize_kv(k_new.reshape(B, 1, Hkv, d), ck.dtype)
        vn = quantize_kv(v_new.reshape(B, 1, Hkv, d), cv.dtype)
        kernel = _kv_append_kernel
        grid = (B,)
        semantics = ("arbitrary",)
    cache_spec = pl.BlockSpec(blk, idx)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[new_spec, new_spec, cache_spec, cache_spec],
            out_specs=[cache_spec, cache_spec],
        ),
        out_shape=[jax.ShapeDtypeStruct(ck.shape, ck.dtype),
                   jax.ShapeDtypeStruct(cv.shape, cv.dtype)],
        # args: (pos, mask, kn, vn, ck, cv) -> ck is input 4, cv input 5
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics),
        interpret=interpret,
    )(pos.astype(jnp.int32), mask.astype(jnp.int32), kn, vn, ck, cv)
