"""Whole-decode-step megakernel (Pallas, TPU).

ONE pallas_call runs the entire single-token decode step — all L
transformer layers (RMSNorm, int8pc QKV, QK-norm + NEOX RoPE, GQA
attention over the HBM-resident KV cache, output proj, SwiGLU MLP) plus
the final norm, the int8pc lm head, and the greedy argmax. The XLA glue
per generated token shrinks to an embedding-row gather and the EOS test.

Why: the decode step is HBM-bound (~0.6 GB of int8 weights + the KV
prefix per token), but the XLA int8pc path tops out at ~44% of the v5e's
819 GB/s — per-op dispatch gaps between ~30 ops x 28 layers leave the HBM
pipe idle (VERDICT r1, BASELINE.md). Here the whole step is one kernel
whose weight stream is a manually double-buffered DMA ring: while chunk
i is in the MXU, chunks i+1..i+LOOKAHEAD are in flight from HBM, across
layer boundaries and into the lm head. VMEM is ~16 MB, so weights are
streamed in [<=1024, CHUNK_OUT] int8 tiles through NBUF ring slots rather
than pipelined whole layers (a layer is ~15 MB — BlockSpec double
buffering cannot fit it).

Numerics match the XLA int8pc path (ops/q8_matmul.py::pc_matmul) —
activation rows quantize with the same round/clip math and in-chunk
partial dots accumulate in int32, so per-matmul results are bit-identical
modulo the f32 scale multiply order; attention math mirrors
ops/decode_attention.py (f32 throughout, fresh K/V as an extra score
column, reference text_decoder.cpp:533-540 forces f32 attention too).

Reference for the replaced loop: text_decoder.cpp:392-581 (per-token
graph rebuild); this file is its TPU-native opposite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qwen3_asr_tpu.config import DecoderConfig

NBUF = 3          # weight ring slots
LOOKAHEAD = 2     # DMAs in flight ahead of compute (must be < NBUF)
CHUNK_IN = 1024   # max rows per weight chunk (the hidden size)
CHUNK_OUT = 2048  # max cols per weight chunk
_NEG = -0.7 * float(np.finfo(np.float32).max)


# ---------------------------------------------------------------------------
# weight packing
# ---------------------------------------------------------------------------

def _pack_tiles(q: np.ndarray, s: np.ndarray, co: int):
    """int8 [in, out] + scales [out] -> ([out/co, in, co], [out/co, co])
    tile-major so each (oi) tile is one contiguous DMA."""
    n_in, n_out = q.shape
    assert n_out % co == 0, (n_out, co)
    qt = np.ascontiguousarray(
        q.reshape(n_in, n_out // co, co).transpose(1, 0, 2))
    st = np.ascontiguousarray(s.reshape(n_out // co, co))
    return qt, st


def _pack_stack(leaf: dict, co: int):
    """Stacked quantized leaf {i8pc:q [L,in,out], i8pc:s [L,out]} ->
    (tiles [L, out/co, in, co] int8, scales [L, out/co, co] f32)."""
    q = np.asarray(leaf["i8pc:q"])
    s = np.asarray(leaf["i8pc:s"], dtype=np.float32)
    qs, ss = zip(*(_pack_tiles(q[l], s[l], co) for l in range(q.shape[0])))
    return jnp.asarray(np.stack(qs)), jnp.asarray(np.stack(ss))


def pack_megakernel_params(dec_params: dict, cfg: DecoderConfig) -> dict:
    """Build the megakernel weight pack from a FUSED + int8pc decoder tree
    (runtime/params.py::quantize_decoder_params('int8pc') then
    fuse_decoder_params). Returns a dict to stash as dec_params['mega'].
    """
    layers = dec_params["layers"]
    if "wqkv" not in layers or not (
        isinstance(layers["wqkv"], dict) and "i8pc:q" in layers["wqkv"]
    ) or "lm_head_pc" not in dec_params:
        raise ValueError("megakernel needs the fused int8pc layout "
                         "(quantize_decoder_params('int8pc') + "
                         "fuse_decoder_params)")

    H = cfg.hidden_size

    def co_for(n_out):
        # largest divisor of n_out that is <= CHUNK_OUT and lane-aligned
        c = min(CHUNK_OUT, n_out)
        while n_out % c:
            c -= 128
        return c

    pack = {}
    for name, key in (("qkv", "wqkv"), ("wo", "wo"),
                      ("gu", "w_gate_up"), ("wd", "w_down")):
        leaf = layers[key]
        n_out = leaf["i8pc:q"].shape[-1]
        q, s = _pack_stack(leaf, co_for(n_out))
        pack[f"{name}_q"], pack[f"{name}_s"] = q, s

    # lm head: pad the vocab to a chunk multiple; padded columns get zero
    # scale and are masked to -inf before argmax in-kernel
    hq = np.asarray(dec_params["lm_head_pc"]["i8pc:q"])
    hs = np.asarray(dec_params["lm_head_pc"]["i8pc:s"], dtype=np.float32)
    V = hq.shape[1]
    co_h = min(CHUNK_OUT, -(-V // 128) * 128)
    Vp = -(-V // co_h) * co_h
    if Vp != V:
        hq = np.pad(hq, ((0, 0), (0, Vp - V)))
        hs = np.pad(hs, (0, Vp - V))
    hqt, hst = _pack_tiles(hq, hs, co_h)
    pack["head_q"] = jnp.asarray(hqt)
    pack["head_s"] = jnp.asarray(hst)

    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    pack["attn_norm"] = f32(layers["attn_norm"])
    pack["ffn_norm"] = f32(layers["ffn_norm"])
    pack["q_norm"] = f32(layers["q_norm"])
    pack["k_norm"] = f32(layers["k_norm"])
    pack["out_norm"] = f32(dec_params["output_norm"]).reshape(1, H)
    return pack


def has_megakernel(dec_params: dict) -> bool:
    return "mega" in dec_params


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _schedule(shapes: dict) -> list[tuple[str, int, int]]:
    """Static per-layer chunk order: (mat, oi, ii). The in dim splits into
    CHUNK_IN-row slices (int32 partials accumulate exactly)."""
    sched = []
    for mat in ("qkv", "wo", "gu", "wd"):
        n_oc, n_in, co = shapes[mat]
        n_ic = -(-n_in // CHUNK_IN)
        for oi in range(n_oc):
            for ii in range(n_ic):
                ci = min(CHUNK_IN, n_in - ii * CHUNK_IN)
                sched.append((mat, oi, ii, ci, co))
    return sched


def _rms_f32(x, w, eps):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return y * w.astype(jnp.float32)


def _quant_row(xf):
    """f32 [1, n] -> (int8 [1, n], f32 scalar scale) — pc_matmul's math."""
    sx = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def _rope_row(x, pos, theta):
    """NEOX rotary on [rows, D] f32 at integer position `pos`
    (same construction as ops/decode_attention.py)."""
    D = x.shape[-1]
    half = D // 2
    k = jax.lax.broadcasted_iota(jnp.int32, (1, half), 1).astype(jnp.float32)
    inv = jnp.exp(k * (-2.0 * float(np.log(theta)) / D))
    ang = pos.astype(jnp.float32) * inv
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = x[:, :half], x[:, half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=1)


def _mega_kernel(
    # inputs
    pos_ref,            # SMEM [1] int32: cache write row / RoPE position
    x_ref,              # VMEM [1, H] bf16: embedded token
    qkv_s, wo_s, gu_s, wd_s, head_s,       # VMEM scale packs
    attn_norm, ffn_norm, q_norm, k_norm, out_norm,  # VMEM norm packs
    qkv_q, wo_q, gu_q, wd_q, head_q,       # ANY (HBM) int8 tile packs
    k_in, v_in,                            # ANY (HBM) caches [L, S, DKV]
    # outputs
    tok_out,            # VMEM [1, 1] int32
    h_out,              # VMEM [1, H] f32 (pre-norm hidden, for debugging)
    k_out, v_out,       # ANY, aliased to k_in/v_in
    # scratch
    wbufs,              # VMEM [NBUF, CHUNK_IN, co_max] int8
    kbuf, vbuf,         # VMEM [S, DKV] bf16
    krow, vrow,         # VMEM [1, DKV] bf16 (fresh rows to store)
    sems, kv_sems, row_sems,
    *, cfg: DecoderConfig, S: int, sched, shapes, n_hc, co_h, V,
):
    H = cfg.hidden_size
    NH, NKV, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    DQ, DKV, FF = NH * D, NKV * D, cfg.intermediate_size
    eps, theta = cfg.rms_norm_eps, cfg.rope_theta
    scale = 1.0 / float(np.sqrt(D))
    group = NH // NKV
    L = qkv_s.shape[0]
    n_sched = len(sched)
    pos = pos_ref[0]

    hbm = {"qkv": qkv_q, "wo": wo_q, "gu": gu_q, "wd": wd_q}

    # Ring slots are numbered by the GLOBAL chunk position g = l*n_sched + j
    # (continuing into the lm-head stream after the last layer) so the slot
    # sequence stays consistent across layer boundaries even when
    # n_sched % NBUF != 0. `l` is dynamic, so slots are traced values; DMA
    # offsets and dynamic leading-dim indexing handle that.

    def chunk_dma(entry, l, slot):
        mat, oi, ii, ci, co = entry
        src = hbm[mat].at[l, oi, pl.ds(ii * CHUNK_IN, ci), :]
        return pltpu.make_async_copy(
            src, wbufs.at[slot, pl.ds(0, ci), pl.ds(0, co)], sems.at[slot])

    def head_dma(hi, slot):
        return pltpu.make_async_copy(
            head_q.at[hi], wbufs.at[slot, pl.ds(0, H), pl.ds(0, co_h)],
            sems.at[slot])

    def start(j, l):
        """Issue the DMA for layer-local schedule position j (static; may
        run past this layer into layer l+1 or, after the last layer, into
        the lm-head chunk stream). `l` is dynamic."""
        slot = (l * n_sched + j) % NBUF
        if j < n_sched:
            chunk_dma(sched[j], l, slot).start()
        else:
            wrapped = j - n_sched

            @pl.when(l + 1 < L)
            def _():
                chunk_dma(sched[wrapped], l + 1, slot).start()

            if wrapped < n_hc:
                @pl.when(l + 1 == L)
                def _():
                    head_dma(wrapped, slot).start()

    def kv_dma(src, dst, which):
        return pltpu.make_async_copy(src, dst, kv_sems.at[which])

    # ---- warmup: first LOOKAHEAD chunks of layer 0 + layer 0's K/V ------
    for j in range(min(LOOKAHEAD, n_sched)):
        chunk_dma(sched[j], 0, j % NBUF).start()
    kv_dma(k_in.at[0], kbuf, 0).start()
    kv_dma(v_in.at[0], vbuf, 1).start()

    def stream_matmul(l, mat, xq, sx, s_pack, j0):
        """Consume this matmul's chunks from the schedule starting at j0;
        returns (f32 [1, n_out] result, next schedule index). Static
        python loop — the schedule is static per layer."""
        n_oc, n_in, co = shapes[mat]
        n_ic = -(-n_in // CHUNK_IN)
        outs = []
        j = j0
        for oi in range(n_oc):
            acc = None
            for ii in range(n_ic):
                entry = sched[j]
                slot = (l * n_sched + j) % NBUF
                start(j + LOOKAHEAD, l)
                chunk_dma(entry, l, slot).wait()
                ci = entry[3]
                xs = jax.lax.slice(xq, (0, ii * CHUNK_IN),
                                   (1, ii * CHUNK_IN + ci))
                part = jax.lax.dot_general(
                    xs, wbufs[slot, :ci, :co],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc = part if acc is None else acc + part
                j += 1
            outs.append(acc.astype(jnp.float32) * (sx * s_pack[l, oi][None, :]))
        return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0], j

    # ---- layers ----------------------------------------------------------
    def layer(l, x_bf16):
        xf = _rms_f32(x_bf16, attn_norm[l], eps).astype(jnp.bfloat16)
        xq, sx = _quant_row(xf.astype(jnp.float32))
        qkv_f32, j = stream_matmul(l, "qkv", xq, sx, qkv_s, 0)
        qkv = qkv_f32.astype(jnp.bfloat16)  # match the XLA path's cast

        # --- attention over the HBM cache (math = ops/decode_attention.py)
        kv_dma(k_in.at[l], kbuf, 0).wait()
        kv_dma(v_in.at[l], vbuf, 1).wait()

        rows = qkv.reshape(NH + 2 * NKV, D)
        q_all = _rope_row(_rms_f32(rows[:NH, :], q_norm[l], eps),
                          pos, theta) * scale
        k_all = _rope_row(_rms_f32(rows[NH:NH + NKV, :], k_norm[l], eps),
                          pos, theta)
        v_all = rows[NH + NKV:, :].astype(jnp.float32)

        col = jax.lax.broadcasted_iota(jnp.int32, (group, S), 1)
        valid = col < pos
        attn_heads = []
        for h in range(NKV):  # static unroll
            q = q_all[h * group:(h + 1) * group, :]
            kc = kbuf[:, h * D:(h + 1) * D].astype(jnp.float32)
            s_cache = jax.lax.dot_general(
                q, kc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s_cache = jnp.where(valid, s_cache, _NEG)
            k_fresh = k_all[h:h + 1, :]
            s_fresh = jax.lax.dot_general(
                q, k_fresh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = jnp.maximum(jnp.max(s_cache, axis=1, keepdims=True), s_fresh)
            p_cache = jnp.exp(s_cache - m)
            p_fresh = jnp.exp(s_fresh - m)
            denom = jnp.sum(p_cache, axis=1, keepdims=True) + p_fresh
            vc = vbuf[:, h * D:(h + 1) * D].astype(jnp.float32)
            o = jax.lax.dot_general(p_cache, vc, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            attn_heads.append((o + p_fresh * v_all[h:h + 1, :]) / denom)
        attn = jnp.concatenate(attn_heads, axis=0).reshape(1, DQ)

        # store the fresh K/V rows into the HBM cache at row `pos`
        krow[0, :] = k_all.reshape(1, DKV).astype(krow.dtype)[0, :]
        vrow[0, :] = v_all.reshape(1, DKV).astype(vrow.dtype)[0, :]
        kw = pltpu.make_async_copy(
            krow, k_out.at[l, pl.ds(pos, 1), :], row_sems.at[0])
        vw = pltpu.make_async_copy(
            vrow, v_out.at[l, pl.ds(pos, 1), :], row_sems.at[1])
        kw.start()
        vw.start()

        # --- output projection + residual (casts mirror the XLA path:
        # matmul results drop to bf16, residual adds run in bf16)
        attn_bf = attn.astype(jnp.bfloat16)
        xq2, sx2 = _quant_row(attn_bf.astype(jnp.float32))
        wo_f32, j = stream_matmul(l, "wo", xq2, sx2, wo_s, j)
        h1 = x_bf16 + wo_f32.astype(jnp.bfloat16)

        # --- SwiGLU MLP
        xn2 = _rms_f32(h1, ffn_norm[l], eps).astype(jnp.bfloat16)
        xq3, sx3 = _quant_row(xn2.astype(jnp.float32))
        gu_f32, j = stream_matmul(l, "gu", xq3, sx3, gu_s, j)
        gu = gu_f32.astype(jnp.bfloat16)
        act = jax.nn.silu(gu[:, :FF]) * gu[:, FF:]
        xq4, sx4 = _quant_row(act.astype(jnp.float32))
        wd_f32, j = stream_matmul(l, "wd", xq4, sx4, wd_s, j)
        assert j == n_sched

        # next layer's K/V stream starts as early as possible
        @pl.when(l + 1 < L)
        def _():
            kv_dma(k_in.at[l + 1], kbuf, 0).start()
            kv_dma(v_in.at[l + 1], vbuf, 1).start()

        kw.wait()
        vw.wait()
        return h1 + wd_f32.astype(jnp.bfloat16)

    x = jax.lax.fori_loop(0, L, layer, x_ref[:], unroll=False)
    h_out[:] = x.astype(jnp.float32)

    # ---- final norm + lm head + argmax ------------------------------------
    xf = _rms_f32(x, out_norm[0], eps).astype(jnp.bfloat16)
    xq, sx = _quant_row(xf.astype(jnp.float32))
    best_val = jnp.float32(_NEG)
    best_idx = jnp.int32(0)
    # head chunk hi sits at global position L*n_sched + hi (static)
    for hi in range(n_hc):
        if hi + LOOKAHEAD < n_hc:
            head_dma(hi + LOOKAHEAD,
                     (L * n_sched + hi + LOOKAHEAD) % NBUF).start()
        slot = (L * n_sched + hi) % NBUF
        head_dma(hi, slot).wait()
        acc = jax.lax.dot_general(
            xq, wbufs[slot, :H, :co_h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        logits = acc.astype(jnp.float32) * (sx * head_s[hi][None, :])
        cols = hi * co_h + jax.lax.broadcasted_iota(jnp.int32, (1, co_h), 1)
        logits = jnp.where(cols < V, logits, _NEG)
        m = jnp.max(logits)
        # first-match index via iota+min (1-D argmax doesn't lower on TPU)
        idx = jnp.min(jnp.where(logits >= m, cols, jnp.int32(2**30)))
        best_idx = jnp.where(m > best_val, idx.astype(jnp.int32), best_idx)
        best_val = jnp.maximum(m, best_val)
    tok_out[0, 0] = best_idx


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("cfg", "interpret"),
    donate_argnames=("k_cache", "v_cache"),
)
def mega_decode_step(
    mega: dict,
    cfg: DecoderConfig,
    x: jax.Array,        # [1, H] bf16 — embedded current token
    pos: jax.Array,      # scalar int32 — cache row / RoPE position
    k_cache: jax.Array,  # [L, S, DKV] bf16 (flattened heads)
    v_cache: jax.Array,
    interpret: bool = False,
):
    """-> (next_token scalar int32, k_cache, v_cache). Caches are donated
    and updated in place (row `pos`)."""
    L, S, DKV = k_cache.shape
    H = cfg.hidden_size

    shapes = {}
    for mat in ("qkv", "wo", "gu", "wd"):
        q = mega[f"{mat}_q"]  # [L, n_oc, in, co]
        shapes[mat] = (q.shape[1], q.shape[2], q.shape[3])
    sched = tuple(_schedule(shapes))
    n_hc, _, co_h = mega["head_q"].shape
    co_max = max(co_h, *(s[2] for s in shapes.values()))
    ci_max = max(H, *(min(CHUNK_IN, s[1]) for s in shapes.values()))
    V = int(mega["head_s"].shape[0] * co_h)
    # true vocab: padded columns carry zero scale; mask from cfg
    V = min(V, cfg.vocab_size)

    kernel = functools.partial(
        _mega_kernel, cfg=cfg, S=S, sched=sched, shapes=shapes,
        n_hc=n_hc, co_h=co_h, V=V)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    any_ = pl.BlockSpec(memory_space=pl.ANY)

    tok, h_dbg, k_new, v_new = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pos
            vmem,                                    # x
            vmem, vmem, vmem, vmem, vmem,            # scale packs
            vmem, vmem, vmem, vmem, vmem,            # norm packs
            any_, any_, any_, any_, any_,            # weight tile packs
            any_, any_,                              # k/v caches
        ],
        out_specs=[vmem, vmem, any_, any_],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        # inputs: 0 pos, 1 x, 2-6 scales, 7-11 norms, 12-16 weight packs,
        # 17 k_cache, 18 v_cache — caches alias outputs 2/3 (in-place)
        input_output_aliases={17: 2, 18: 3},
        scratch_shapes=[
            pltpu.VMEM((NBUF, ci_max, co_max), jnp.int8),
            pltpu.VMEM((S, DKV), k_cache.dtype),
            pltpu.VMEM((S, DKV), v_cache.dtype),
            pltpu.VMEM((1, DKV), k_cache.dtype),
            pltpu.VMEM((1, DKV), v_cache.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        jnp.asarray(pos, jnp.int32).reshape(1),
        x.astype(jnp.bfloat16),
        mega["qkv_s"], mega["wo_s"], mega["gu_s"], mega["wd_s"],
        mega["head_s"],
        mega["attn_norm"], mega["ffn_norm"], mega["q_norm"], mega["k_norm"],
        mega["out_norm"],
        mega["qkv_q"], mega["wo_q"], mega["gu_q"], mega["wd_q"],
        mega["head_q"],
        k_cache, v_cache,
    )
    return tok[0, 0], k_new, v_new, h_dbg
