"""Attention ops.

`mha_attention` is the XLA reference implementation used everywhere; the
Pallas flash-attention kernels (ops/pallas_attention.py) are swapped in on
TPU for long sequences. All variants take boolean masks (True = attend) as
kernel-side predicates — no dense additive -inf masks are materialized on
the host, unlike the reference (text_decoder.cpp:636-648 builds an
O(n_kv x n_tokens) F16 mask per forward; forced_aligner.cpp:757-766 builds
an O(n_ctx^2) F32 block-diagonal mask).

Softmax always accumulates in float32, mirroring the reference's
GGML_PREC_F32 flash-attention setting (text_decoder.cpp:539).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mha_attention(
    q: jax.Array,            # [T, n_heads, head_dim]
    k: jax.Array,            # [S, n_kv_heads, head_dim]
    v: jax.Array,            # [S, n_kv_heads, head_dim]
    mask: jax.Array | None,  # [T, S] bool, True = attend; None = full
    scale: float,
) -> jax.Array:              # [T, n_heads, head_dim]
    """Multi-head attention with GQA (n_heads % n_kv_heads == 0)."""
    T, n_heads, head_dim = q.shape
    S, n_kv, _ = k.shape
    group = n_heads // n_kv

    qg = q.reshape(T, n_kv, group, head_dim)
    # scores: [n_kv, group, T, S], accumulated in f32
    scores = jnp.einsum(
        "tkgd,skd->kgts", qg, k, preferred_element_type=jnp.float32
    )
    scores = scores * jnp.float32(scale)
    if mask is not None:
        scores = jnp.where(mask[None, None, :, :], scores, jnp.float32(-jnp.inf))
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "kgts,skd->tkgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(T, n_heads, head_dim).astype(q.dtype)


def causal_mask(T: int, S: int, offset, valid_len) -> jax.Array:
    """[T, S] bool: row t attends to s iff s <= offset + t and s < valid_len.

    `offset` = number of already-cached positions before this block;
    `valid_len` = total number of real (non-padding) cache rows.
    """
    rows = jnp.arange(T)[:, None]
    cols = jnp.arange(S)[None, :]
    return (cols <= offset + rows) & (cols < valid_len)


def block_diagonal_attention(
    q: jax.Array,   # [T, n_heads, head_dim]
    k: jax.Array,
    v: jax.Array,
    window: int,
    scale: float,
    n_valid=None,   # dynamic scalar: keys at pos >= n_valid are padding
) -> jax.Array:
    """Block-diagonal windowed attention computed structurally.

    Positions only attend within their `window`-sized segment (segment id =
    pos // window, equivalent to the reference's cu_seqlens mask,
    forced_aligner.cpp:742-766), so instead of masking an O(T^2) score
    matrix we pad T to a multiple of `window`, reshape to
    [n_windows, window, ...] and run attention batched over windows:
    O(T * window) compute and memory. Tail padding rows are masked locally;
    `n_valid` (bucketed path) masks right-padding inside the last real
    window the same way.
    """
    T, n_heads, head_dim = q.shape
    n_win = -(-T // window)
    pad = n_win * window - T

    def split(x):
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        return x.reshape(n_win, window, x.shape[1], head_dim)

    qw, kw, vw = split(q), split(k), split(v)
    scores = jnp.einsum(
        "wthd,wshd->whts", qw, kw, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    if pad > 0 or n_valid is not None:
        # mask padding columns (tail-window zero rows and, in the bucketed
        # path, everything past the dynamic valid length); padding rows are
        # discarded anyway, but keep their softmax finite via the diagonal
        bound = jnp.int32(T) if n_valid is None else jnp.asarray(n_valid)
        pos = jnp.arange(n_win * window).reshape(n_win, window)
        valid = pos < bound                              # [n_win, window]
        scores = jnp.where(valid[:, None, None, :], scores, -jnp.inf)
        eye = jnp.eye(window, dtype=bool)
        scores = jnp.where(eye[None, None, :, :], jnp.maximum(scores, -1e30), scores)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "whts,wshd->wthd", probs.astype(v.dtype), vw,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(n_win * window, n_heads, head_dim)[:T].astype(q.dtype)


def block_diagonal_mask(n_ctx: int, window: int) -> jax.Array:
    """[n_ctx, n_ctx] bool: attend within windows of `window` positions.

    Equivalent to the reference's cu_seqlens block-diagonal mask
    (forced_aligner.cpp:742-766): full windows then a remainder segment,
    i.e. segment id = position // window.
    """
    seg = jnp.arange(n_ctx) // window
    return seg[:, None] == seg[None, :]
