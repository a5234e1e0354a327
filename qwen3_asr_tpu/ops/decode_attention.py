"""Fused single-token decode attention (Pallas, TPU).

One kernel per layer replaces the decode step's ~15 XLA ops (per-head
QK-RMSNorm, NEOX RoPE, masked scores over the KV cache, softmax, the
weighted sum, and the fresh-KV bookkeeping):

  in : qkv [1, (n_heads + 2*n_kv) * D]  — the attention projection's raw
       output, laid out q_all | k_all | v_all
       k_cache/v_cache [S, n_kv, D], offset (valid cache rows), pos
  out: attn [1, n_heads*D], k_new/v_new [1, n_kv, D] (roped/normed rows for
       the caller to write into the cache)

Single-program kernel with a statically unrolled loop over KV heads — TPU
grid steps execute sequentially on the one core anyway, and static head
offsets sidestep Mosaic's dynamic-sublane alignment restrictions. Caches
arrive flattened [S, n_kv*D] (a free reshape) so per-head slices are
128-aligned lane slices. The fresh K/V pair participates as one extra score
column — it is not yet in the cache; same one-softmax semantics as
models/decoder.py::_cached_attention.

Numerics: all attention math in f32 (matches the reference's forced F32
flash-attention precision, text_decoder.cpp:539); RoPE cos/sin computed
in-kernel from the position scalar.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -0.7 * float(np.finfo(np.float32).max)


def _rms(v, w, eps):
    vf = v.astype(jnp.float32)
    y = vf * jax.lax.rsqrt(jnp.mean(vf * vf, axis=-1, keepdims=True) + eps)
    return y * w.astype(jnp.float32)


def _rope_row(x, pos, theta):
    """NEOX rotary on [rows, D] f32 at integer position `pos`."""
    D = x.shape[-1]
    half = D // 2
    k = jax.lax.broadcasted_iota(jnp.int32, (1, half), 1).astype(jnp.float32)
    inv = jnp.exp(k * (-2.0 * float(np.log(theta)) / D))
    ang = pos.astype(jnp.float32) * inv                     # [1, half]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = x[:, :half], x[:, half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=1)


def _decode_attn_kernel_q(scalars_ref, qkv_ref, kc_ref, vc_ref, ks_ref,
                          vs_ref, qn_ref, kn_ref, o_ref, kout_ref, vout_ref,
                          **kw):
    _decode_attn_body(scalars_ref, qkv_ref, kc_ref, vc_ref, qn_ref, kn_ref,
                      o_ref, kout_ref, vout_ref, ks_ref=ks_ref,
                      vs_ref=vs_ref, **kw)


def _decode_attn_kernel(scalars_ref, qkv_ref, kc_ref, vc_ref,
                        qn_ref, kn_ref, o_ref, kout_ref, vout_ref, **kw):
    _decode_attn_body(scalars_ref, qkv_ref, kc_ref, vc_ref, qn_ref, kn_ref,
                      o_ref, kout_ref, vout_ref, **kw)


def _decode_attn_body(scalars_ref, qkv_ref, kc_ref, vc_ref,
                      qn_ref, kn_ref, o_ref, kout_ref, vout_ref, *,
                      group, n_heads, n_kv, head_dim, eps, theta, scale,
                      ks_ref=None, vs_ref=None):
    offset = scalars_ref[0]
    pos = scalars_ref[1]
    S = kc_ref.shape[0]
    D = head_dim

    # all heads' norms + rope in one vectorized pass over the 2-D rows
    q_all = _rope_row(_rms(qkv_ref[:n_heads, :], qn_ref[0], eps),
                      pos, theta) * scale                    # [n_heads, D]
    k_all = _rope_row(_rms(qkv_ref[n_heads:n_heads + n_kv, :], kn_ref[0],
                           eps), pos, theta)                 # [n_kv, D]
    v_all = qkv_ref[n_heads + n_kv:, :].astype(jnp.float32)  # [n_kv, D]

    col = jax.lax.broadcasted_iota(jnp.int32, (group, S), 1)
    valid = col < offset
    for h in range(n_kv):                                    # static unroll
        q = q_all[h * group:(h + 1) * group, :]              # [group, D]
        k_fresh = k_all[h:h + 1, :]
        v_fresh = v_all[h:h + 1, :]

        kc = kc_ref[:, h * D:(h + 1) * D].astype(jnp.float32)   # [S, D]
        if ks_ref is not None:  # int8 cache: per-(row, head) scales
            kc = kc * ks_ref[:, h:h + 1]
        s_cache = jax.lax.dot_general(q, kc, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        s_cache = jnp.where(valid, s_cache, _NEG)
        s_fresh = jax.lax.dot_general(q, k_fresh, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)

        m = jnp.maximum(jnp.max(s_cache, axis=1, keepdims=True), s_fresh)
        p_cache = jnp.exp(s_cache - m)                       # [group, S]
        p_fresh = jnp.exp(s_fresh - m)                       # [group, 1]
        l = jnp.sum(p_cache, axis=1, keepdims=True) + p_fresh
        vc = vc_ref[:, h * D:(h + 1) * D].astype(jnp.float32)
        if vs_ref is not None:
            vc = vc * vs_ref[:, h:h + 1]
        out = jax.lax.dot_general(p_cache, vc, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        out = (out + p_fresh * v_fresh) / l                  # [group, D]

        o_ref[h * group:(h + 1) * group, :] = out.astype(o_ref.dtype)
        kout_ref[h:h + 1, :] = k_fresh.astype(kout_ref.dtype)
        vout_ref[h:h + 1, :] = v_fresh.astype(vout_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "n_kv", "head_dim", "eps", "theta", "scale",
                     "interpret"),
)
def decode_attention(
    qkv: jax.Array,        # [1, (n_heads + 2*n_kv) * D]
    k_cache: jax.Array,    # [S, n_kv, D] float — or int8 with k_scale set
    v_cache: jax.Array,
    q_norm: jax.Array,     # [D]
    k_norm: jax.Array,     # [D]
    offset,                # scalar int32: valid cache rows
    pos,                   # scalar int32: RoPE position of the fresh token
    *,
    n_heads: int, n_kv: int, head_dim: int,
    eps: float, theta: float, scale: float,
    k_scale: jax.Array | None = None,   # [S, n_kv] f32 (int8 cache rows)
    v_scale: jax.Array | None = None,
    interpret: bool = False,
):
    """-> (attn [1, n_heads*D] f32, k_new [1, n_kv, D] f32,
    v_new [1, n_kv, D] f32 — the caller stores them in the cache's
    format)."""
    S = k_cache.shape[0]
    D = head_dim
    group = n_heads // n_kv
    quant = k_scale is not None

    kw = dict(group=group, n_heads=n_heads, n_kv=n_kv,
              head_dim=D, eps=eps, theta=theta, scale=scale)
    kernel = (functools.partial(_decode_attn_kernel_q, **kw) if quant
              else functools.partial(_decode_attn_kernel, **kw))
    scalars = jnp.stack([jnp.asarray(offset, jnp.int32),
                         jnp.asarray(pos, jnp.int32)])

    cache_specs = [
        pl.BlockSpec((S, n_kv * D), lambda *_: (0, 0)),
        pl.BlockSpec((S, n_kv * D), lambda *_: (0, 0)),
    ]
    cache_args = [k_cache.reshape(S, n_kv * D), v_cache.reshape(S, n_kv * D)]
    if quant:
        cache_specs += [pl.BlockSpec((S, n_kv), lambda *_: (0, 0)),
                        pl.BlockSpec((S, n_kv), lambda *_: (0, 0))]
        cache_args += [k_scale.astype(jnp.float32),
                       v_scale.astype(jnp.float32)]

    attn, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((n_heads + 2 * n_kv, D), lambda *_: (0, 0)),
                *cache_specs,
                pl.BlockSpec((1, D), lambda *_: (0, 0)),
                pl.BlockSpec((1, D), lambda *_: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((n_heads, D), lambda *_: (0, 0)),
                pl.BlockSpec((n_kv, D), lambda *_: (0, 0)),
                pl.BlockSpec((n_kv, D), lambda *_: (0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_heads, D), jnp.float32),
            jax.ShapeDtypeStruct((n_kv, D), jnp.float32),
            jax.ShapeDtypeStruct((n_kv, D), jnp.float32),
        ],
        interpret=interpret,
    )(scalars, qkv.reshape(n_heads + 2 * n_kv, D), *cache_args,
      q_norm.reshape(1, -1), k_norm.reshape(1, -1))
    return (attn.reshape(1, n_heads * D), k_new.reshape(1, n_kv, D),
            v_new.reshape(1, n_kv, D))
