"""Fused decode-attention kernel vs the step-by-step decode math."""

import jax.numpy as jnp
import numpy as np

from qwen3_asr_tpu.models.decoder import _cached_attention, rms_norm, rope_neox
from qwen3_asr_tpu.ops.decode_attention import decode_attention


def test_decode_attention_matches_reference(rng):
    n_heads, n_kv, D, S = 4, 2, 128, 96
    group = n_heads // n_kv
    eps, theta, scale = 1e-6, 1e4, 1.0 / np.sqrt(D)
    pos = 57  # cache rows [0, 57) are valid

    qkv = rng.standard_normal((1, (n_heads + 2 * n_kv) * D)).astype(np.float32)
    k_cache = rng.standard_normal((S, n_kv, D)).astype(np.float32)
    v_cache = rng.standard_normal((S, n_kv, D)).astype(np.float32)
    qn = rng.standard_normal(D).astype(np.float32)
    kn = rng.standard_normal(D).astype(np.float32)

    # reference: the decoder body's step-by-step path
    dq = n_heads * D
    dkv = n_kv * D
    q = jnp.asarray(qkv[:, :dq]).reshape(1, n_heads, D)
    k = jnp.asarray(qkv[:, dq:dq + dkv]).reshape(1, n_kv, D)
    v = jnp.asarray(qkv[:, dq + dkv:]).reshape(1, n_kv, D)
    positions = jnp.asarray([pos], jnp.int32)
    q = rope_neox(rms_norm(q, jnp.asarray(qn), eps), positions, theta)
    k = rope_neox(rms_norm(k, jnp.asarray(kn), eps), positions, theta)
    cache_mask = jnp.arange(S) < pos
    block_mask = jnp.ones((1, 1), bool)
    ref_attn = _cached_attention(
        q, jnp.asarray(k_cache), jnp.asarray(v_cache), k, v,
        cache_mask, block_mask, scale,
    ).reshape(1, n_heads * D)

    attn, k_new, v_new = decode_attention(
        jnp.asarray(qkv), jnp.asarray(k_cache), jnp.asarray(v_cache),
        jnp.asarray(qn), jnp.asarray(kn), jnp.int32(pos), jnp.int32(pos),
        n_heads=n_heads, n_kv=n_kv, head_dim=D,
        eps=eps, theta=theta, scale=scale, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(attn), np.asarray(ref_attn),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(k_new), np.asarray(k), atol=2e-5)
    np.testing.assert_allclose(np.asarray(v_new), np.asarray(v), atol=0)
