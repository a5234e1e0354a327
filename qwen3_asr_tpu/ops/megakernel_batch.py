"""Batched whole-decode-step megakernel (Pallas, TPU) — the serving path.

One pallas_call advances B sequences by one token each: the int8 weight
stream (the dominant HBM term at B=1) is read ONCE per step and amortized
over the batch, while each sequence's int8 KV prefix streams through a
double-buffered slab ring. Per-step HBM bytes ~= weights + B * live KV —
aggregate throughput scales with B until the KV term dominates.

Structure mirrors ops/megakernel.py (same weight pack, same DMA ring, same
activation-quant math); the differences are [B, ·] activation rows with
per-row quant scales, per-sequence positions/RoPE/masks, a KV slab ring
instead of a single resident cache slab, and a per-row lm-head argmax.
int8 KV only: B bf16 cache slabs would not fit VMEM.

Reference point: the reference engine is strictly single-stream
(qwen3_asr.cpp:216-303); batching is a capability the TPU port adds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qwen3_asr_tpu.config import DecoderConfig
from qwen3_asr_tpu.ops.megakernel import (
    CHUNK_IN,
    KV_BLOCK,
    KVSLOTS,
    LOOKAHEAD,
    NBUF,
    _NEG,
    _int4_group_for,
    _quant_row as _quant_rows,   # per-row scales; shared with the
    _rms_f32,                    # single-seq kernel (bit-identical math)
    _rope_row,
    _schedule,
)

NSLAB = 2  # KV slab ring depth (per stream): seq b+1 streams while b attends

# VMEM budget for the BATCHED kernel's estimator, calibrated separately
# from the single-seq one (ops/megakernel.py::_VMEM_BUDGET): the largest
# batched footprint that demonstrably compiled AND ran on this v5e is the
# B=8 x S=1664 serving workload (92 s clips, 322 launches in the round-3
# device trace) whose estimate below is ~18.27 MB — above the single-seq
# anchor, i.e. the estimator over-counts relative to Mosaic's real
# accounting and the budget constant absorbs that model error per kernel.
# scripts/probe_vmem_limit.py finds the true ceiling; raise once it
# reports.
_VMEM_BUDGET_BATCH = 18_500_000


def mega_batch_max_context(mega: dict, cfg, batch: int = 16) -> int:
    """Largest per-sequence KV length S the batched megakernel fits in
    VMEM at a kernel batch of `batch`: it keeps NSLAB whole [S, DKV] K/V
    slabs (+ [NKV, S] scale slabs) resident — linear in S — plus
    per-sequence VMEM outputs (fresh K/V rows + scales, h_out, x) that
    are linear in B. Callers gate on this and fall back to the vmapped
    XLA step for longer contexts; pass the PER-LAUNCH batch (after the
    <=16-sequence chunking), defaulting to the 16-sequence unroll cap —
    the conservative bound. Mirrors _mega_batch_kernel's scratch/out
    arithmetic; floored to the 128-row lane alignment."""
    from qwen3_asr_tpu.ops.megakernel import _mega_fixed_common

    H = cfg.hidden_size
    NKV = cfg.n_kv_heads
    DKV = NKV * cfg.head_dim
    L = cfg.n_layers
    B = max(1, int(batch))
    fixed = (
        _mega_fixed_common(mega, cfg)     # rings + norms (NBUF-deep)
        + B * (2 * L * 8 * DKV            # fresh K/V outputs [B, L, 8, .]
               + 2 * L * 8 * NKV * 4      # fresh scales
               + H * 4 + H * 2 + 4)       # h_out + x + tok_out per seq
    )
    per_row = NSLAB * 2 * DKV + NSLAB * 2 * NKV * 4  # int8 k+v + f32 scales
    s_max = (_VMEM_BUDGET_BATCH - fixed) // per_row
    return max(0, int(s_max) // 128 * 128)


def mega_batch_stream_max_batch(mega: dict, cfg) -> int:
    """Largest per-launch batch the STREAMED-KV batched kernel fits in
    VMEM. Its KV ring is O(1) in context length (KVSLOTS KV_BLOCK-row
    tiles), so the only B-linear VMEM is the per-sequence outputs (fresh
    K/V rows + scales, h_out, x) — context length never appears. Callers
    chunk long-context batches to this launch size instead of falling to
    the vmapped XLA step."""
    from qwen3_asr_tpu.ops.megakernel import _mega_fixed_common

    H = cfg.hidden_size
    NKV = cfg.n_kv_heads
    DKV = NKV * cfg.head_dim
    L = cfg.n_layers
    fixed = (
        _mega_fixed_common(mega, cfg)
        + KVSLOTS * 2 * KV_BLOCK * DKV        # int8 k+v tile rings
        + KVSLOTS * 2 * NKV * KV_BLOCK * 4    # f32 scale tile rings
    )
    per_seq = (2 * L * 8 * DKV                # fresh K/V outputs
               + 2 * L * 8 * NKV * 4          # fresh scales
               + H * 4 + H * 2 + 4)           # h_out + x + tok_out
    return max(0, int((_VMEM_BUDGET_BATCH - fixed) // per_seq))


def _mega_batch_kernel(
    # inputs
    pos_ref,            # SMEM [B] int32: per-seq cache row / RoPE position
    x_ref,              # VMEM [B, H] bf16: embedded current tokens
    norms,              # VMEM [L, 8, H] f32
    out_norm,           # VMEM [1, H] f32
    qkv_q, wo_q, gu_q, wd_q, head_q,       # ANY (HBM) int8 tile packs
    qkv_s, wo_s, gu_s, wd_s, head_s,       # ANY (HBM) scale packs
    k_in, v_in,         # ANY (HBM) [B, L, S, DKV] int8 caches
    ks_in, vs_in,       # ANY (HBM) [B, L, NKV, S] f32 cache scales
    # outputs
    tok_out,            # VMEM [B, 1] int32 greedy tokens
    h_out,              # VMEM [B, H] f32 (pre-norm hidden, debugging)
    fresh_k, fresh_v,   # VMEM [B, L, 8, DKV] int8 — row 0 per (b, l)
    fresh_ks, fresh_vs,  # VMEM [B, L, 8, NKV] f32
    # scratch
    wbufs,              # VMEM [NBUF, CHUNK_IN, co_max] int8
    sbufs,              # VMEM [NBUF, 8, co_max] f32
    kbuf, vbuf,         # VMEM KV rings: [NSLAB, S, DKV] whole slabs
                        # (resident) or [KVSLOTS, KV_BLOCK, DKV] tiles
                        # (kv_stream)
    ksbuf, vsbuf,       # VMEM scale rings: [NSLAB, NKV, S] (resident) or
                        # [KVSLOTS, NKV, KV_BLOCK] (kv_stream)
    sems, ssems, kv_sems,
    *, cfg: DecoderConfig, S: int, sched, shapes, n_hc, co_h, V, L, B,
    kv_blocks, w4: bool, kv_stream: bool,
):
    H = cfg.hidden_size
    NH, NKV, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    DQ, DKV, FF = NH * D, NKV * D, cfg.intermediate_size
    eps, theta = cfg.rms_norm_eps, cfg.rope_theta
    scale = 1.0 / float(np.sqrt(D))
    group = NH // NKV
    n_sched = len(sched)
    n_kvb = len(kv_blocks)

    hbm = {"qkv": qkv_q, "wo": wo_q, "gu": gu_q, "wd": wd_q}
    hbm_s = {"qkv": qkv_s, "wo": wo_s, "gu": gu_s, "wd": wd_s}

    # ---- weight chunk ring (identical scheme to megakernel.py) ----------
    def chunk_dma(entry, l, slot):
        mat, oi, ii, ci, co = entry
        # int4 mode: the HBM pack holds nibble-packed bytes (half the rows)
        rows, r0 = (ci // 2, ii * CHUNK_IN // 2) if w4 else (ci, ii * CHUNK_IN)
        src = hbm[mat].at[l, oi, pl.ds(r0, rows), :]
        return pltpu.make_async_copy(
            src, wbufs.at[slot, pl.ds(0, rows), pl.ds(0, co)], sems.at[slot])

    def scale_dma(entry, l, slot):
        mat, oi, ii, ci, co = entry
        return pltpu.make_async_copy(
            hbm_s[mat].at[l, oi],
            sbufs.at[slot, :, pl.ds(0, co)], ssems.at[slot])

    def head_dma(hi, slot):
        rows = H // 2 if w4 else H
        return pltpu.make_async_copy(
            head_q.at[hi], wbufs.at[slot, pl.ds(0, rows), pl.ds(0, co_h)],
            sems.at[slot])

    def head_scale_dma(hi, slot):
        return pltpu.make_async_copy(
            head_s.at[hi], sbufs.at[slot, :, pl.ds(0, co_h)],
            ssems.at[slot])

    def start(j, l):
        slot = (l * n_sched + j) % NBUF
        if j < n_sched:
            chunk_dma(sched[j], l, slot).start()
            if sched[j][2] == 0:
                scale_dma(sched[j], l, slot).start()
        else:
            wrapped = j - n_sched

            @pl.when(l + 1 < L)
            def _():
                chunk_dma(sched[wrapped], l + 1, slot).start()
                if sched[wrapped][2] == 0:
                    scale_dma(sched[wrapped], l + 1, slot).start()

            if wrapped < n_hc:
                @pl.when(l + 1 == L)
                def _():
                    head_dma(wrapped, slot).start()
                    head_scale_dma(wrapped, slot).start()

    kv_streams = [(k_in, kbuf, "rows"), (v_in, vbuf, "rows"),
                  (ks_in, ksbuf, "scales"), (vs_in, vsbuf, "scales")]

    if kv_stream:
        # ---- streamed-KV ring (long contexts): per-seq KV_BLOCK tiles
        # fold through an online softmax, VMEM O(1) in S. The KVSLOTS
        # ring splits into two halves by SEQUENCE PARITY: while seq b
        # folds its half, seq b+1's warmup streams into the other half —
        # cross-sequence overlap without cross-sequence slot hazards
        # (the previous user of a half, seq b-1, fully consumed it
        # before seq b's iteration starts in program order).
        KVB = KV_BLOCK
        half = KVSLOTS // 2
        la_kv = half - 1

        def nlive_of(b):
            # blocks holding any live row; clamp like the single-seq ring
            return jnp.minimum((pos_ref[b] + (KVB - 1)) // KVB, S // KVB)

        def kv_copy_s(l, b, which, blk, slot):
            src_hbm, dst_vmem, kind = kv_streams[which]
            if kind == "rows":
                src = src_hbm.at[b, l, pl.ds(blk * KVB, KVB), :]
            else:  # block-major scales [B, L, NB, NKV, KVB]
                src = src_hbm.at[b, l, blk]
            return pltpu.make_async_copy(src, dst_vmem.at[slot],
                                         kv_sems.at[which, slot])

        def kv_start_blk(l, b, blk):
            slot = jax.lax.rem(blk, half) + (b % 2) * half
            for w in range(4):
                kv_copy_s(l, b, w, blk, slot).start()

        def kv_warmup(l, b):
            nl = nlive_of(b)
            for j in range(la_kv):
                @pl.when(j < nl)
                def _():
                    kv_start_blk(l, b, jnp.int32(j))
    else:
        # ---- resident KV slab ring: slot = b % NSLAB per stream --------
        def kv_copy(l, b, which, blk, slot):
            sb, cb = kv_blocks[blk]
            src_hbm, dst_vmem, kind = kv_streams[which]
            if kind == "rows":
                src = src_hbm.at[b, l, pl.ds(sb, cb), :]
                dst = dst_vmem.at[slot, pl.ds(sb, cb), :]
            else:
                src = src_hbm.at[b, l, :, pl.ds(sb, cb)]
                dst = dst_vmem.at[slot, :, pl.ds(sb, cb)]
            return pltpu.make_async_copy(src, dst,
                                         kv_sems.at[which, slot, blk])

        def kv_start(l, b):
            """Issue seq b's four KV streams for layer l (block-gated on
            pos[b]). b is STATIC; l may be dynamic."""
            slot = b % NSLAB
            p = pos_ref[b]
            for blk in range(n_kvb):
                sb, _ = kv_blocks[blk]

                @pl.when(sb < p)
                def _():
                    for w in range(4):
                        kv_copy(l, b, w, blk, slot).start()

        def kv_wait(l, b):
            slot = b % NSLAB
            p = pos_ref[b]
            for blk in range(n_kvb):
                sb, _ = kv_blocks[blk]

                @pl.when(sb < p)
                def _():
                    for w in range(4):
                        kv_copy(l, b, w, blk, slot).wait()

    # ---- warmup ---------------------------------------------------------
    for j in range(min(LOOKAHEAD, n_sched)):
        start(j, 0)
    if kv_stream:
        # only seq 0: seq b+1's warmup is issued at the START of fold b
        # (into the other ring half), giving cross-seq overlap without a
        # third half to track
        kv_warmup(0, 0)
    else:
        # zero the slab rings once: slabs are reused across (l, b) with
        # per-sequence block gating, so any never-copied region must hold
        # finite values (stale rows are masked; garbage could be NaN)
        for s in range(NSLAB):
            kbuf[s] = jnp.zeros((S, DKV), kbuf.dtype)
            vbuf[s] = jnp.zeros((S, DKV), vbuf.dtype)
            ksbuf[s] = jnp.zeros((NKV, S), jnp.float32)
            vsbuf[s] = jnp.zeros((NKV, S), jnp.float32)
        for b in range(min(NSLAB, B)):
            kv_start(0, b)

    def stream_matmul(l, mat, xq, sx, j0):
        """[B, n_in] int8 rows x streamed chunks -> (f32 [B, n_out], j).
        int4 mode mirrors megakernel.py: in-register nibble expand +
        per-INT4_GROUP-row group scales accumulated in f32."""
        n_oc, n_in, co = shapes[mat]
        n_ic = -(-n_in // CHUNK_IN)
        outs = []
        j = j0
        for oi in range(n_oc):
            acc = None
            s_row = None
            s_blk = None
            for ii in range(n_ic):
                entry = sched[j]
                slot = (l * n_sched + j) % NBUF
                chunk_dma(entry, l, slot).wait()
                if ii == 0:
                    scale_dma(entry, l, slot).wait()
                    if w4:
                        s_blk = sbufs[slot, :, :co]
                    else:
                        s_row = sbufs[slot, 0:1, :co]
                start(j + LOOKAHEAD, l)
                ci = entry[3]
                if w4:
                    gsz = _int4_group_for(n_in)
                    assert ci % gsz == 0, (mat, ci, gsz)
                    w8 = pltpu.bitcast(
                        wbufs[slot, :ci // 2, :co], jnp.int4
                    ).astype(jnp.int8)
                    g0 = (ii * CHUNK_IN) // gsz
                    for g in range(ci // gsz):
                        r = g * gsz
                        xs = jax.lax.slice(
                            xq, (0, ii * CHUNK_IN + r),
                            (B, ii * CHUNK_IN + r + gsz))
                        part = jax.lax.dot_general(
                            xs, jax.lax.slice(w8, (r, 0), (r + gsz, co)),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
                        term = part.astype(jnp.float32) * (
                            sx * s_blk[g0 + g:g0 + g + 1, :])
                        acc = term if acc is None else acc + term
                else:
                    xs = jax.lax.slice(xq, (0, ii * CHUNK_IN),
                                       (B, ii * CHUNK_IN + ci))
                    part = jax.lax.dot_general(
                        xs, wbufs[slot, :ci, :co],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    acc = part if acc is None else acc + part
                j += 1
            if not w4:
                acc = acc.astype(jnp.float32) * (sx * s_row)
            outs.append(acc)
        return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0], j

    # ---- layers ---------------------------------------------------------
    def layer(l, x_bf16):
        xf = _rms_f32(x_bf16, norms[l, 0:1, :], eps).astype(jnp.bfloat16)
        xq, sx = _quant_rows(xf.astype(jnp.float32))
        qkv_f32, j = stream_matmul(l, "qkv", xq, sx, 0)
        qkv = qkv_f32.astype(jnp.bfloat16)

        attn_rows = []
        for b in range(B):  # static
            p = pos_ref[b]
            rows = qkv[b].reshape(NH + 2 * NKV, D)
            q_all = _rope_row(
                _rms_f32(rows[:NH, :], norms[l, 2:3, 0:D], eps), p,
                theta) * scale
            k_all = _rope_row(
                _rms_f32(rows[NH:NH + NKV, :], norms[l, 3:4, 0:D], eps),
                p, theta)
            v_all = rows[NH + NKV:, :].astype(jnp.float32)

            if kv_stream:
                # seq b+1's warmup streams into the OTHER ring half while
                # this fold runs
                if b + 1 < B:
                    kv_warmup(l, b + 1)
                nl = nlive_of(b)
                base = (b % 2) * half

                def blk_fold(blk, carry, *, _b=b, _base=base, _nl=nl):
                    m, den, acc = carry      # [NH,1], [NH,1], [NH,D]
                    slot = jax.lax.rem(blk, half) + _base
                    for w in range(4):
                        kv_copy_s(l, _b, w, blk, slot).wait()

                    @pl.when(blk + la_kv < _nl)
                    def _():
                        kv_start_blk(l, _b, blk + la_kv)

                    kblk, vblk = kbuf[slot], vbuf[slot]   # [KVB, DKV]
                    kst, vst = ksbuf[slot], vsbuf[slot]   # [NKV, KVB]
                    col = blk * KVB + jax.lax.broadcasted_iota(
                        jnp.int32, (1, KVB), 1)
                    vmask = col < p
                    ms, dens, accs = [], [], []
                    for h in range(NKV):  # static unroll
                        q = q_all[h * group:(h + 1) * group, :]
                        kc = kblk[:, h * D:(h + 1) * D].astype(jnp.float32)
                        s = jax.lax.dot_general(
                            q, kc, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        s = s * kst[h:h + 1, :]
                        s = jnp.where(vmask, s, _NEG)
                        mh = m[h * group:(h + 1) * group, :]
                        m_new = jnp.maximum(
                            mh, jnp.max(s, axis=1, keepdims=True))
                        corr = jnp.exp(mh - m_new)
                        pr = jnp.exp(s - m_new)           # [group, KVB]
                        den_new = (den[h * group:(h + 1) * group, :] * corr
                                   + jnp.sum(pr, axis=1, keepdims=True))
                        pr = pr * vst[h:h + 1, :]  # V row scales (den uses
                        #                            the unscaled sum)
                        vc = vblk[:, h * D:(h + 1) * D].astype(jnp.float32)
                        o = jax.lax.dot_general(
                            pr, vc, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        accs.append(
                            acc[h * group:(h + 1) * group, :] * corr + o)
                        ms.append(m_new)
                        dens.append(den_new)
                    return (jnp.concatenate(ms, axis=0),
                            jnp.concatenate(dens, axis=0),
                            jnp.concatenate(accs, axis=0))

                m0 = jnp.full((NH, 1), _NEG, jnp.float32)
                den0 = jnp.zeros((NH, 1), jnp.float32)
                acc0 = jnp.zeros((NH, D), jnp.float32)
                m, den, acc = jax.lax.fori_loop(
                    0, nl, blk_fold, (m0, den0, acc0))

                # fresh K/V column folds in last
                heads = []
                for h in range(NKV):
                    q = q_all[h * group:(h + 1) * group, :]
                    s_f = jax.lax.dot_general(
                        q, k_all[h:h + 1, :], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    mh = m[h * group:(h + 1) * group, :]
                    m_f = jnp.maximum(mh, s_f)
                    corr = jnp.exp(mh - m_f)
                    p_f = jnp.exp(s_f - m_f)
                    denom = den[h * group:(h + 1) * group, :] * corr + p_f
                    o = (acc[h * group:(h + 1) * group, :] * corr
                         + p_f * v_all[h:h + 1, :])
                    heads.append(o / denom)
            else:
                kv_wait(l, b)
                slot = b % NSLAB
                col = jax.lax.broadcasted_iota(jnp.int32, (group, S), 1)
                valid = col < p
                heads = []
                for h in range(NKV):
                    q = q_all[h * group:(h + 1) * group, :]
                    kc = kbuf[slot, :, h * D:(h + 1) * D].astype(
                        jnp.float32)
                    s_cache = jax.lax.dot_general(
                        q, kc, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    s_cache = s_cache * ksbuf[slot, h:h + 1, :]
                    s_cache = jnp.where(valid, s_cache, _NEG)
                    k_fresh = k_all[h:h + 1, :]
                    s_fresh = jax.lax.dot_general(
                        q, k_fresh, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    m = jnp.maximum(
                        jnp.max(s_cache, axis=1, keepdims=True), s_fresh)
                    p_cache = jnp.exp(s_cache - m)
                    p_fresh = jnp.exp(s_fresh - m)
                    denom = jnp.sum(p_cache, axis=1, keepdims=True) + p_fresh
                    vc = vbuf[slot, :, h * D:(h + 1) * D].astype(
                        jnp.float32)
                    p_cache = p_cache * vsbuf[slot, h:h + 1, :]
                    o = jax.lax.dot_general(
                        p_cache, vc, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    heads.append((o + p_fresh * v_all[h:h + 1, :]) / denom)

            # fresh rows (quantized like decoder._quantize_kv_rows)
            for rows_f32, out_q, out_s in ((k_all, fresh_k, fresh_ks),
                                           (v_all, fresh_v, fresh_vs)):
                amax = jnp.max(jnp.abs(rows_f32), axis=1, keepdims=True)
                s8 = jnp.maximum(amax / 127.0, 1e-12)
                q8 = jnp.clip(jnp.round(rows_f32 / s8), -127, 127)
                out_q[b, l, 0:1, :] = q8.astype(jnp.int8).reshape(1, DKV)
                out_s[b, l, 0:1, :] = s8.reshape(1, NKV)

            # refill this slab with the next sequence needing it
            if not kv_stream and B > NSLAB:
                nb = b + NSLAB
                if nb < B:
                    kv_start(l, nb)
            attn_rows.append(
                jnp.concatenate(heads, axis=0).reshape(1, DQ))
        # next layer's first stream prefetches during this layer's MLP
        if kv_stream:
            @pl.when(l + 1 < L)
            def _():
                kv_warmup(l + 1, 0)
        else:
            for b in range(min(NSLAB, B)):
                @pl.when(l + 1 < L)
                def _():
                    kv_start(l + 1, b)

        attn = jnp.concatenate(attn_rows, axis=0)  # [B, DQ]
        attn_bf = attn.astype(jnp.bfloat16)
        xq2, sx2 = _quant_rows(attn_bf.astype(jnp.float32))
        wo_f32, j = stream_matmul(l, "wo", xq2, sx2, j)
        h1 = x_bf16 + wo_f32.astype(jnp.bfloat16)

        xn2 = _rms_f32(h1, norms[l, 1:2, :], eps).astype(jnp.bfloat16)
        xq3, sx3 = _quant_rows(xn2.astype(jnp.float32))
        gu_f32, j = stream_matmul(l, "gu", xq3, sx3, j)
        gu = gu_f32.astype(jnp.bfloat16)
        g32 = gu[:, :FF].astype(jnp.float32)
        u32 = gu[:, FF:].astype(jnp.float32)
        act = (g32 * jax.lax.logistic(g32)) * u32
        xq4, sx4 = _quant_rows(act.astype(jnp.bfloat16).astype(jnp.float32))
        wd_f32, j = stream_matmul(l, "wd", xq4, sx4, j)
        assert j == n_sched
        return h1 + wd_f32.astype(jnp.bfloat16)

    x = jax.lax.fori_loop(0, L, layer, x_ref[:], unroll=False)
    h_out[:] = x.astype(jnp.float32)

    # ---- final norm + lm head + per-row argmax --------------------------
    xf = _rms_f32(x, out_norm[0:1, :], eps).astype(jnp.bfloat16)
    xq, sx = _quant_rows(xf.astype(jnp.float32))
    best_val = jnp.full((B, 1), _NEG, jnp.float32)
    best_idx = jnp.zeros((B, 1), jnp.int32)
    for hi in range(n_hc):
        slot = (L * n_sched + hi) % NBUF
        head_dma(hi, slot).wait()
        head_scale_dma(hi, slot).wait()
        if w4:
            s_blk = sbufs[slot, :, :co_h]
        else:
            s_row = sbufs[slot, 0:1, :co_h]
        if hi + LOOKAHEAD < n_hc:
            slot_n = (L * n_sched + hi + LOOKAHEAD) % NBUF
            head_dma(hi + LOOKAHEAD, slot_n).start()
            head_scale_dma(hi + LOOKAHEAD, slot_n).start()
        if w4:
            gsz = _int4_group_for(H)
            w8 = pltpu.bitcast(
                wbufs[slot, :H // 2, :co_h], jnp.int4).astype(jnp.int8)
            logits = None
            for g in range(H // gsz):
                r = g * gsz
                part = jax.lax.dot_general(
                    jax.lax.slice(xq, (0, r), (B, r + gsz)),
                    jax.lax.slice(w8, (r, 0), (r + gsz, co_h)),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                term = part.astype(jnp.float32) * (sx * s_blk[g:g + 1, :])
                logits = term if logits is None else logits + term
        else:
            acc = jax.lax.dot_general(
                xq, wbufs[slot, :H, :co_h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            logits = acc.astype(jnp.float32) * (sx * s_row)   # [B, co_h]
        cols = hi * co_h + jax.lax.broadcasted_iota(
            jnp.int32, (B, co_h), 1)
        logits = jnp.where(cols < V, logits, _NEG)
        m = jnp.max(logits, axis=1, keepdims=True)        # [B, 1]
        idx = jnp.min(jnp.where(logits >= m, cols, jnp.int32(2**30)),
                      axis=1, keepdims=True)
        best_idx = jnp.where(m > best_val, idx.astype(jnp.int32), best_idx)
        best_val = jnp.maximum(m, best_val)
    tok_out[:] = best_idx


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "interpret", "kv_stream"),
    donate_argnames=("k_cache", "v_cache", "k_scale", "v_scale"),
)
def mega_decode_step_batch(
    mega: dict,
    cfg: DecoderConfig,
    x: jax.Array,        # [B, H] bf16 — embedded current tokens
    pos: jax.Array,      # [B] int32 — per-seq cache row / RoPE position
    k_cache: jax.Array,  # [B, L, S, DKV] int8
    v_cache: jax.Array,
    k_scale: jax.Array,  # [B, L, NKV, S] f32 (resident) or block-major
                         # [B, L, S//KV_BLOCK, NKV, KV_BLOCK] (kv_stream)
    v_scale: jax.Array,
    interpret: bool = False,
    kv_stream: bool = False,
):
    """-> (next_tokens [B] int32, k_cache, v_cache, k_scale, v_scale,
    h_dbg [B, H]). Same scatter contract as mega_decode_step_i8, per
    sequence at its own position.

    kv_stream=True: per-seq KV tiles fold through an online softmax on a
    parity-halved KVSLOTS ring — VMEM O(1) in S, so B>8 x 92 s (and any
    long-context batch) keeps the kernel instead of the ~4.8x-slower
    vmapped XLA fallback (VERDICT r3 #2). Needs S % KV_BLOCK == 0 and the
    block-major scale layout (block_kv_scales per sequence)."""
    B, L, S, DKV = k_cache.shape
    NKV = cfg.n_kv_heads
    H = cfg.hidden_size
    if S % 128 and not interpret:
        raise ValueError(f"batched megakernel needs S % 128 == 0 (got {S})")
    if kv_stream:
        if S % KV_BLOCK:
            raise ValueError(
                f"streamed-KV batched megakernel needs S % {KV_BLOCK} == 0 "
                f"(got {S})")
        want = (B, L, S // KV_BLOCK, NKV, KV_BLOCK)
        if k_scale.shape != want or v_scale.shape != want:
            raise ValueError(
                f"kv_stream expects block-major [B, L, NB, NKV, "
                f"{KV_BLOCK}] cache scales, got k={k_scale.shape} "
                f"v={v_scale.shape}")

    w4 = mega["qkv_q"].shape[2] == H // 2  # int4 pack: in/2 byte rows
    shapes = {}
    for mat in ("qkv", "wo", "gu", "wd"):
        q = mega[f"{mat}_q"]
        n_in = q.shape[2] * 2 if w4 else q.shape[2]
        shapes[mat] = (q.shape[1], n_in, q.shape[3])
    sched = tuple(_schedule(shapes))
    n_hc, _, co_h = mega["head_q"].shape
    co_max = max(co_h, *(s[2] for s in shapes.values()))
    ci_max = max(H, *(min(CHUNK_IN, s[1]) for s in shapes.values()))
    buf_rows = ci_max // 2 if w4 else ci_max
    V = min(int(mega["head_s"].shape[0] * co_h), cfg.vocab_size)

    # coarser blocks than the single-seq kernel: 4 streams x B sequences
    # multiply the DMA-issue count, which is scalar-core work
    kv_blk = 2 * KV_BLOCK
    kv_blocks = []
    sb = 0
    while sb < S:
        cb = min(kv_blk, S - sb)
        kv_blocks.append((sb, cb))
        sb += cb
    kv_blocks = tuple(kv_blocks)

    kernel = functools.partial(
        _mega_batch_kernel, cfg=cfg, S=S, sched=sched, shapes=shapes,
        n_hc=n_hc, co_h=co_h, V=V, L=L, B=B, kv_blocks=kv_blocks, w4=w4,
        kv_stream=kv_stream)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    any_ = pl.BlockSpec(memory_space=pl.ANY)

    if kv_stream:
        kv_buf_shape = (KVSLOTS, KV_BLOCK, DKV)
        kv_scale_shape = (KVSLOTS, NKV, KV_BLOCK)
        kv_sem_shape = (4, KVSLOTS)
    else:
        kv_buf_shape = (NSLAB, S, DKV)
        kv_scale_shape = (NSLAB, NKV, S)
        kv_sem_shape = (4, NSLAB, len(kv_blocks))

    tok, h_dbg, fresh_k, fresh_v, fresh_ks, fresh_vs = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pos
            vmem,                                    # x
            vmem, vmem,                              # norms, out_norm
            any_, any_, any_, any_, any_,
            any_, any_, any_, any_, any_,
            any_, any_, any_, any_,                  # caches + scales
        ],
        out_specs=[vmem, vmem, vmem, vmem, vmem, vmem],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, L, 8, DKV), k_cache.dtype),
            jax.ShapeDtypeStruct((B, L, 8, DKV), v_cache.dtype),
            jax.ShapeDtypeStruct((B, L, 8, NKV), jnp.float32),
            jax.ShapeDtypeStruct((B, L, 8, NKV), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NBUF, buf_rows, co_max), jnp.int8),
            pltpu.VMEM((NBUF, 8, co_max), jnp.float32),
            pltpu.VMEM(kv_buf_shape, k_cache.dtype),
            pltpu.VMEM(kv_buf_shape, v_cache.dtype),
            pltpu.VMEM(kv_scale_shape, jnp.float32),
            pltpu.VMEM(kv_scale_shape, jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA(kv_sem_shape),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        jnp.asarray(pos, jnp.int32),
        x.astype(jnp.bfloat16),
        mega["norms"], mega["out_norm"],
        mega["qkv_q"], mega["wo_q"], mega["gu_q"], mega["wd_q"],
        mega["head_q"],
        mega["qkv_s"], mega["wo_s"], mega["gu_s"], mega["wd_s"],
        mega["head_s"],
        k_cache, v_cache, k_scale, v_scale,
    )
    # scatter each sequence's fresh row at its own position
    p = jnp.asarray(pos, jnp.int32)
    z = jnp.int32(0)
    for b in range(k_cache.shape[0]):
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, fresh_k[b:b + 1, :, :1, :], (b, 0, p[b], 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, fresh_v[b:b + 1, :, :1, :], (b, 0, p[b], 0))
        if kv_stream:
            # block-major [B, L, NB, NKV, KVB]: element (p//KVB, :, p%KVB)
            idx = (b, z, p[b] // KV_BLOCK, z, p[b] % KV_BLOCK)
            k_scale = jax.lax.dynamic_update_slice(
                k_scale, fresh_ks[b:b + 1, :, 0, :].reshape(
                    1, L, 1, NKV, 1), idx)
            v_scale = jax.lax.dynamic_update_slice(
                v_scale, fresh_vs[b:b + 1, :, 0, :].reshape(
                    1, L, 1, NKV, 1), idx)
        else:
            k_scale = jax.lax.dynamic_update_slice(
                k_scale, fresh_ks[b:b + 1, :, 0, :, None], (b, 0, 0, p[b]))
            v_scale = jax.lax.dynamic_update_slice(
                v_scale, fresh_vs[b:b + 1, :, 0, :, None], (b, 0, 0, p[b]))
    return tok[:, 0], k_cache, v_cache, k_scale, v_scale, h_dbg
