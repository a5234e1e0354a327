"""Flash attention (Pallas, TPU): streaming-softmax attention that never
materializes the [T, S] score matrix in HBM.

Replaces the reference's ggml_flash_attn_ext / ggml_soft_max_ext usage
(text_decoder.cpp:538, audio_encoder.cpp:476) for the encoder (bidirectional)
and decoder prefill (causal + dynamic valid length). The XLA einsum path in
ops/attention.py remains the reference implementation and the non-TPU
fallback.

Layout: q [B, n_heads, T, D], k/v [B, n_kv_heads, S, D]. Grid = (B, n_heads,
T/BLOCK_Q); each cell streams S in BLOCK_K chunks with the usual running
(max, sum, acc) rescaling, in float32 (the reference also forces F32
accumulation, text_decoder.cpp:539). The batch axis is a real grid axis with
a per-item valid length read from the scalar-prefetch operand — ONE kernel
launch for the whole batch (serving's batched encoder), not B sequential
launches as pallas-under-vmap would produce.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -0.7 * float(np.finfo(np.float32).max)  # large-negative, NaN-safe


def _flash_kernel(valid_ref, q_ref, k_ref, v_ref, o_ref, *, scale,
                  causal, block_k):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    block_q = q_ref.shape[2]
    D = q_ref.shape[3]
    S = k_ref.shape[2]
    valid = valid_ref[b]

    q = q_ref[0, 0].astype(jnp.float32) * scale         # [Bq, D]
    row_global = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )

    def body(j, carry):
        acc, m, l = carry
        k_blk = k_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # [Bq, Bk]
        col_global = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        mask = col_global < valid
        if causal:
            mask &= col_global <= row_global
        s = jnp.where(mask, s, _NEG)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    n_blocks = S // block_k
    # skip fully-masked K blocks: causal cells never see columns past
    # this q block's last row, and no cell sees columns >= valid — the
    # dynamic trip count halves causal prefill attention (measured
    # 148 -> ~80 us/layer at T=1280) and skips padding for short items
    n_eff = jnp.minimum(
        jnp.int32(n_blocks), jax.lax.div(valid + block_k - 1, block_k))
    if causal:
        last_row = qi * block_q + block_q - 1
        n_eff = jnp.minimum(n_eff, last_row // block_k + 1)
    acc0 = jnp.zeros((block_q, D), jnp.float32)
    m0 = jnp.full((block_q, 1), _NEG, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_eff, body, (acc0, m0, l0))
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit, static_argnames=("causal", "scale", "interpret")
)
def flash_attention_batch(
    q: jax.Array,        # [B, T, n_heads, D]
    k: jax.Array,        # [B, S, n_kv_heads, D]
    v: jax.Array,
    valid_lens,          # [B] int32: item b's keys at index >= valid_lens[b]
    *,                   # are masked
    causal: bool,
    scale: float,
    interpret: bool = False,
) -> jax.Array:          # [B, T, n_heads, D]
    B, T, n_heads, D = q.shape
    _, S, n_kv, _ = k.shape
    group = n_heads // n_kv

    if D < 128:
        # pad the head dim to the 128-lane tile; zero columns don't affect
        # the dot products, and the extra output columns are sliced off
        q = _pad_to(q, 128, 3)
        k = _pad_to(k, 128, 3)
        v = _pad_to(v, 128, 3)
        out = flash_attention_batch(q, k, v, valid_lens, causal=causal,
                                    scale=scale, interpret=interpret)
        return out[..., :D]

    import os

    # defaults measured on chip (92 s prefill, causal T=1280): (256, 512)
    # with the causal/valid block skip; env knobs for geometry A/Bs
    BLOCK_Q = min(int(os.environ.get("QWEN3_FLASH_BQ", "256")), max(8, T))
    bk = int(os.environ.get("QWEN3_FLASH_BK", "512"))
    BLOCK_K = bk if S >= bk else 128

    qh = _pad_to(jnp.transpose(q, (0, 2, 1, 3)), -(-T // BLOCK_Q) * BLOCK_Q, 2)
    kh = _pad_to(jnp.transpose(k, (0, 2, 1, 3)), -(-S // BLOCK_K) * BLOCK_K, 2)
    vh = _pad_to(jnp.transpose(v, (0, 2, 1, 3)), -(-S // BLOCK_K) * BLOCK_K, 2)
    Tp, Sp = qh.shape[2], kh.shape[2]

    grid = (B, n_heads, Tp // BLOCK_Q)
    kernel = functools.partial(
        _flash_kernel, scale=scale, causal=causal, block_k=BLOCK_K
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            # with scalar prefetch, index maps receive the scalar ref as a
            # trailing argument
            in_specs=[
                pl.BlockSpec((1, 1, BLOCK_Q, D),
                             lambda b, h, i, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, Sp, D),
                             lambda b, h, i, *_: (b, h // group, 0, 0)),
                pl.BlockSpec((1, 1, Sp, D),
                             lambda b, h, i, *_: (b, h // group, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, BLOCK_Q, D),
                                   lambda b, h, i, *_: (b, h, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_heads, Tp, D), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * n_heads * Tp * Sp * D,
            bytes_accessed=(B * n_heads * Tp * D * 2 + 2 * B * n_kv * Sp * D)
            * q.dtype.itemsize,
            transcendentals=B * n_heads * Tp * Sp,
        ),
    )(jnp.asarray(valid_lens, jnp.int32).reshape(B), qh, kh, vh)
    return jnp.transpose(out[:, :, :T], (0, 2, 1, 3))


@functools.partial(
    jax.jit, static_argnames=("causal", "scale", "interpret")
)
def flash_attention(
    q: jax.Array,        # [T, n_heads, D]
    k: jax.Array,        # [S, n_kv_heads, D]
    v: jax.Array,
    valid_len,           # scalar int32: keys at index >= valid_len are masked
    *,
    causal: bool,
    scale: float,
    interpret: bool = False,
) -> jax.Array:          # [T, n_heads, D]
    out = flash_attention_batch(
        q[None], k[None], v[None],
        jnp.asarray(valid_len, jnp.int32).reshape(1),
        causal=causal, scale=scale, interpret=interpret,
    )
    return out[0]
