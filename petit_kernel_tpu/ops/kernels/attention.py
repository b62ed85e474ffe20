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


@functools.partial(jax.jit, static_argnames=("nb", "page_size", "interpret"))
def paged_decode_attention(q: jax.Array, k_pages: jax.Array,
                           v_pages: jax.Array, block_tables: jax.Array,
                           pos: jax.Array, *, nb: int, page_size: int,
                           interpret: bool = False) -> jax.Array:
    """One-token-per-sequence attention over paged KV.

    q            : (B, H, d)   current-step queries (post-RoPE)
    k_pages      : (P, ps, Hkv, d) page pool (bf16 or float8_e4m3fn)
    v_pages      : (P, ps, Hkv, d)
    block_tables : (B, max_pages) int32 page ids (>= nb columns)
    pos          : (B,) int32 absolute position of each query
    nb           : page blocks to visit (static) — callers pass the batch
                   max length bucketed, ceil((max(pos)+1)/ps), so HBM
                   traffic tracks actual context
    returns      : (B, H, d) bf16
    """
    interpret = interpret or jax.default_backend() == "cpu"
    B, H, d = q.shape
    P, ps, Hkv, dk = k_pages.shape
    assert dk == d and ps == page_size and H % Hkv == 0
    assert block_tables.shape[0] == B and block_tables.shape[1] >= nb
    G = H // Hkv
    Gp = -(-G // 8) * 8  # Mosaic sublane quantum; padded rows sliced off
    qr = q.reshape(B, Hkv, G, d)
    if Gp != G:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))

    sm_scale = 1.0 / np.sqrt(d)
    kernel = functools.partial(_decode_kernel, nb=nb, page_size=ps,
                               sm_scale=sm_scale, hkv=Hkv, gp=Gp)
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
                pl.BlockSpec((1, ps, Hkv, d),
                             lambda b, i, bt, pos: (
                                 bt[b, jnp.minimum(i, pos[b] // ps)],
                                 0, 0, 0)),
                pl.BlockSpec((1, ps, Hkv, d),
                             lambda b, i, bt, pos: (
                                 bt[b, jnp.minimum(i, pos[b] // ps)],
                                 0, 0, 0)),
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
                    sm_scale: float, hkv: int):
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
            k = kb[:, h, :]                                # (ts, d) bf16
            v = vb[:, h, :]
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


@functools.partial(jax.jit, static_argnames=("ns", "block_q", "block_s",
                                             "interpret"))
def flash_prefill_attention(q: jax.Array, ck: jax.Array, cv: jax.Array,
                            pos0: jax.Array, *, ns: int,
                            block_q: int = 128, block_s: int = 128,
                            interpret: bool = False) -> jax.Array:
    """Causal multi-token attention, flash-style (no (B,H,T,S) tensor).

    q    : (B, T, H, d) post-RoPE queries; query t's absolute position is
           pos0[b] + t (contiguous chunk — the chunked-prefill contract)
    ck/cv: (B, S, Hkv, d) contiguous KV (bf16 or fp8; the current chunk
           must already be written in)
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
    _, S, Hkv, dk = ck.shape
    assert dk == d and H % Hkv == 0 and S % block_s == 0
    G = H // Hkv
    tq = min(block_q, T)
    assert T % tq == 0
    nt = T // tq
    qr = q.transpose(0, 2, 1, 3).reshape(B, Hkv, G, T, d)
    sm_scale = 1.0 / np.sqrt(d)

    kernel = functools.partial(_prefill_kernel, ns=ns, ts=block_s, tq=tq,
                               sm_scale=sm_scale, hkv=Hkv)
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
                pl.BlockSpec((1, block_s, Hkv, d),
                             lambda b, ti, si, p0: (
                                 b, jnp.minimum(
                                     si, (p0[b] + (ti + 1) * tq - 1)
                                     // block_s), 0, 0)),
                pl.BlockSpec((1, block_s, Hkv, d),
                             lambda b, ti, si, p0: (
                                 b, jnp.minimum(
                                     si, (p0[b] + (ti + 1) * tq - 1)
                                     // block_s), 0, 0)),
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
